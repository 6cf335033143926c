"""Rules-JSON -> wiki-page renderer: the exact inverse of the
``wiki_etl`` pipeline (S3-S7 + the speed-cell grammar).

Why an unparser: no snapshot of the live wiki page ships with the
reference repo (the parser fetches it from the MediaWiki API at run
time, ``parser/main.py:23-29``), so the strongest offline differential
for the ETL is render -> re-parse: render the reference's published
distribution JSON (242 countries / 1,206 rules / 172 road types) into
a wiki-shaped HTML page, run the full ``etl_from_wiki`` over it as a
canned API response, and require the output to equal the input
bit-for-bit (tests/test_etl_differential.py). Every grammar
production, the rowspan-free table scan, vehicle-column rewriting,
country-name resolution, and the validation warnings are pinned in one
pass — if any parser rule drifted from the reference semantics, the
round-trip would not reproduce the reference's own dataset.

The renderer is also the write path a rules-editing workflow needs
(tags -> wiki cell text), so it lives in sources/, not tests/.

Inverse mapping notes (all verified by the differential):

- conditional values split on top-level '; ' into ``val @ (terms)``
  segments; terms split on ' AND ' (no date interval can contain
  ' AND '); each term renders via the inverse of
  ``wiki_etl._parse_restriction``.
- weight qualifiers render in the "pre" position (``current 2t``);
  non-tonne units keep their stored suffix (``10000lb``).
- date/time intervals are stored verbatim by the parser, so they
  render verbatim.
- vehicle columns: ``maxspeed:<v>[:...]`` keys strip the vehicle back
  out; a bare ``<v>: no`` key renders as the access-``X`` in that
  vehicle's column (inverse of parse_utils.py:131-135).
"""

from __future__ import annotations

import html as _html
import json
import re

from osm_legal_default_speeds_spark.sources.iso3166 import (
    COUNTRY_ALPHA2,
    SUBDIVISIONS,
)
from osm_legal_default_speeds_spark.sources.wiki_etl import (
    NAME_OVERRIDES,
    parse_speeds,
)

_SIMPLE_CONDS = {"articulated", "trailer", "caravan", "wet", "empty",
                 "agricultural"}
_WEIGHT_PRE = {
    "emptyweight": "empty",
    "weightcapacity": "capacity",
    "trailerweight": "trailer",
    "weight": "current",
}
_WEIGHT_RE = re.compile(
    r"^(weightrating|weight|emptyweight|weightcapacity|trailerweight)"
    r">(\d+(?:\.\d+)?)(?: (st|lt|lb))?$"
)
_LENGTH_RE = re.compile(r"^length>(\d+)(?: (ft))?$")
_COUNT_RE = re.compile(r"^(seats|axles|trailers|wheels)>=(\d+)$")


class RenderError(ValueError):
    pass


def _split_top_semi(v: str) -> list[str]:
    """Split a stored conditional value on '; ' outside parentheses."""
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(v):
        ch = v[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0 and v.startswith("; ", i):
            parts.append("".join(cur))
            cur = []
            i += 2
            continue
        cur.append(ch)
        i += 1
    parts.append("".join(cur))
    return parts


def _split_top_pipe(v: str) -> list[str]:
    """Split a lanes value on '|' outside parentheses — the parser's
    paren-aware splitter (wiki_etl._split_top), NOT a lenient copy:
    one splitting semantics for the round-trip pair means malformed
    (unbalanced-paren) stored values fail identically on both sides
    instead of rendering differently than they re-parse."""
    from osm_legal_default_speeds_spark.sources.wiki_etl import _split_top

    return _split_top(v, "|")


def render_term(term: str) -> str:
    """OSM conditional term -> wiki restriction text (inverse of
    ``wiki_etl._parse_restriction``)."""
    if term in _SIMPLE_CONDS:
        return term
    m = _WEIGHT_RE.match(term)
    if m:
        key, num, unit = m.group(1), m.group(2), m.group(3) or "t"
        if key == "weightrating":
            return f"{num}{unit}"
        return f"{_WEIGHT_PRE[key]} {num}{unit}"
    m = _LENGTH_RE.match(term)
    if m:
        return f"{m.group(1)}{m.group(2) or 'm'}"
    m = _COUNT_RE.match(term)
    if m:
        return f"{m.group(2)} {m.group(1)}"
    # date/time intervals are stored verbatim
    return term


def _render_conditional(value: str, prefix: str = "") -> list[str]:
    """'v1 @ (a AND b); v2 @ (c)' -> ['v1 (a, b)', 'v2 (c)']."""
    parts = []
    for seg in _split_top_semi(value):
        m = re.match(r"^(.*?) @ \((.*)\)$", seg, re.DOTALL)
        if not m:
            raise RenderError(f"unrenderable conditional segment {seg!r}")
        terms = ", ".join(render_term(t) for t in m.group(2).split(" AND "))
        parts.append(f"{prefix}{m.group(1)} ({terms})")
    return parts


def render_cells(tags: dict[str, str]) -> dict[str, str]:
    """One rule's OSM tag dict -> {column name: wiki cell text}
    (column '(default)' plus one per vehicle). Raises RenderError on a
    tag shape the wiki grammar cannot express."""
    by_col: dict[str, dict[str, str]] = {}
    for key, value in tags.items():
        col = "(default)"
        base = key
        if key.startswith("maxspeed:"):
            head = key.split(":")[1]
            if head not in ("conditional", "advisory", "lanes"):
                col = head
                base = key.replace(f"maxspeed:{head}", "maxspeed", 1)
        elif key not in ("maxspeed", "minspeed", "access") and (
            not key.startswith(("minspeed", "maxspeed"))
        ):
            # bare vehicle access key ('tricycle': 'no')
            col, base = key, "access"
        by_col.setdefault(col, {})[base] = value

    cells: dict[str, str] = {}
    for col, t in by_col.items():
        parts: list[str] = []
        # duplicate wiki parts concatenate into one tag value with
        # '; ' (wiki_etl.parse_speeds put()), so every stored value —
        # plain or conditional — splits back into one part per
        # '; '-segment (paren-aware: date intervals embed '; ')
        if "maxspeed" in t:
            parts.extend(_split_top_semi(t["maxspeed"]))
        if "maxspeed:conditional" in t:
            parts.extend(_render_conditional(t["maxspeed:conditional"]))
        if "minspeed" in t:
            parts.extend(
                f"min: {v}" for v in _split_top_semi(t["minspeed"])
            )
        if "minspeed:conditional" in t:
            parts.extend(
                _render_conditional(t["minspeed:conditional"], "min: ")
            )
        if "maxspeed:advisory" in t:
            parts.extend(
                f"advisory: {v}"
                for v in _split_top_semi(t["maxspeed:advisory"])
            )
        if "maxspeed:advisory:conditional" in t:
            parts.extend(
                _render_conditional(
                    t["maxspeed:advisory:conditional"], "advisory: "
                )
            )
        if "maxspeed:lanes" in t:
            # one part per duplicated lanes tag; within a part, a lane
            # may itself be conditional ('80 @ (wet)|60')
            for seg in _split_top_semi(t["maxspeed:lanes"]):
                lanes = []
                for lane in _split_top_pipe(seg):
                    if " @ (" in lane:
                        lanes.extend(_render_conditional(lane))
                    else:
                        lanes.append(lane)
                parts.append("|".join(lanes))
        if "access" in t:
            if set(_split_top_semi(t["access"])) != {"no"}:
                raise RenderError(f"unrenderable access {t['access']!r}")
            parts.extend("X" for _ in _split_top_semi(t["access"]))
        known = {
            "maxspeed", "maxspeed:conditional", "minspeed",
            "minspeed:conditional", "maxspeed:advisory",
            "maxspeed:advisory:conditional", "maxspeed:lanes", "access",
        }
        unknown = set(t) - known
        if unknown:
            raise RenderError(f"unrenderable keys {sorted(unknown)}")
        cells[col] = ", ".join(parts)
    return cells


def verify_cells(tags: dict[str, str], cells: dict[str, str]) -> None:
    """Re-parse the rendered cells (with the vehicle rewrite) and
    require exact equality with the source tags."""
    got: dict[str, str] = {}
    for vehicle, text in cells.items():
        parsed = parse_speeds(text)
        for key, value in parsed.items():
            if vehicle != "(default)":
                key = key.replace("maxspeed", "maxspeed:" + vehicle, 1)
                key = key.replace("access", vehicle)
            got[key] = value
    if got != tags:
        raise RenderError(f"round-trip mismatch: {got} != {tags}")


def code_display_names() -> dict[str, str]:
    """ISO code -> a display name ``resolve_country_code`` maps back to
    the same code (overrides first, then subdivision and country
    tables)."""
    out: dict[str, str] = {}
    for name, code in NAME_OVERRIDES.items():
        out.setdefault(code, name)
    country_name = {}
    for name, cc in COUNTRY_ALPHA2.items():
        country_name.setdefault(cc, name)
    for (cc, sub), code in SUBDIVISIONS.items():
        if code not in out and cc in country_name:
            out.setdefault(code, f"{country_name[cc]}:{sub}")
    for cc, name in country_name.items():
        out.setdefault(cc, name)
    return out


def _td(text: str) -> str:
    return f"<td>{_html.escape(text)}</td>"


def render_speed_table(
    rules_by_cc: dict[str, list], names: dict[str, str] | None = None
) -> str:
    """speedLimitsByCountryCode -> the wiki speed table (table 0)."""
    names = names or code_display_names()
    # render each rule's cells ONCE: the vehicle-column discovery pass
    # and the row pass share the rendered dicts (rendering is the
    # dominant per-rule cost over the 1,206-rule dataset)
    rendered = [
        (cc, rule, render_cells(rule.get("tags", {})))
        for cc in sorted(rules_by_cc)
        for rule in rules_by_cc[cc]
    ]
    vehicles = sorted(
        {col for _, _, cells in rendered for col in cells if col != "(default)"}
    )
    cols = ["(default)"] + vehicles
    head = "<tr>" + "".join(
        f"<th>{_html.escape(c)}</th>" for c in ["Country", "Road type"] + cols
    ) + "</tr>"
    rows = [head]
    for cc, rule, cells in rendered:
        tds = [_td(names[cc]), _td(rule.get("name", ""))]
        tds += [_td(cells.get(c, "")) for c in cols]
        rows.append("<tr>" + "".join(tds) + "</tr>")
    return "<table>" + "\n".join(rows) + "</table>"


def render_road_types_table(road_types: dict[str, dict[str, str]]) -> str:
    """roadTypesByName -> the wiki road-types table (table 1)."""
    head = (
        "<tr><th>Road type</th><th>Filter</th><th>Fuzzy filter</th>"
        "<th>Relation filter</th></tr>"
    )
    rows = [head]
    for name, f in road_types.items():
        rows.append(
            "<tr>"
            + _td(name)
            + _td(f.get("filter", ""))
            + _td(f.get("fuzzyFilter", ""))
            + _td(f.get("relationFilter", ""))
            + "</tr>"
        )
    return "<table>" + "\n".join(rows) + "</table>"


def render_wiki_page(dataset: dict) -> str:
    """Full wiki-shaped HTML page: speed table first, road-types table
    second (the layout contract ``etl_from_wiki`` reads)."""
    return (
        "<div>"
        + render_speed_table(dataset["speedLimitsByCountryCode"])
        + "\n"
        + render_road_types_table(dataset["roadTypesByName"])
        + "</div>"
    )


def canned_api_response(html: str, revid: str = "0") -> str:
    """Wrap rendered HTML as a MediaWiki parse-API JSON payload, the
    shape ``fetch_wiki_page`` consumes (incl. via file:// URLs)."""
    return json.dumps({"parse": {"text": {"*": html}, "revid": revid}})
