"""Wiki-table -> rules-JSON ETL (SURVEY.md §2.1 S3-S7, §3.4).

From-scratch, stdlib-only reimplementation of the reference's Python
parser behavior (reference: ``parser/parsers/parse_utils.py``,
``parser/parsers/osm_restrictions.py``, ``parser/parsers/
speed_grammar.ebnf``, ``parser/main.py:20-44``): the container has no
bs4/lark/pycountry, so the HTML scan uses ``html.parser`` and the
speed-cell grammar is a hand-rolled recursive-descent parser covering
the reference EBNF. The output JSON shape is the engine's input
contract (README.md:55-79 of the reference).

Operator map:

- S3 ``TableGrid``       — rowspan/colspan cell carry-over so each
                           ``<tr>`` reads as a flat row
                           (``parse_utils.py:15-47``)
- S4 ``parse_road_types_table`` — wiki table 2 -> road-type filters
                           (``parse_utils.py:54-77``)
- S5 ``parse_speed_table``      — wiki table 1 -> ordered per-country
                           rules, per-vehicle columns folded into
                           ``maxspeed:<vehicle>`` keys
                           (``parse_utils.py:80-146``)
- S6 ``resolve_country_code``   — display name -> ISO code; injectable
                           mapping instead of pycountry
                           (``parse_utils.py:149-191``)
- S7 ``build_rules_dataset``    — sorted-key JSON assembly
                           (``main.py:31-44``)
- speed-cell grammar ``parse_speeds`` — cell string -> OSM tag dict
                           (``speed_grammar.ebnf:1-86``,
                           ``osm_restrictions.py:4-111``)

- S2 ``fetch_wiki_page`` / ``etl_from_wiki`` — MediaWiki parse-API
                           fetch (stdlib urllib; ``file://`` canned-
                           response path for offline tests)
                           (``main.py:15-29``)
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser


class EtlParseError(ValueError):
    pass


# ===========================================================================
# Speed-cell grammar (recursive descent; EBNF: speed_grammar.ebnf)
# ===========================================================================

_CONDITIONALS = {"articulated", "trailer", "caravan", "wet", "empty", "agricultural"}
_WEIGHT_QUALIFIERS = {
    "empty": "emptyweight",
    "capacity": "weightcapacity",
    "trailer": "trailerweight",
    "current": "weight",
}
_WEIGHT_UNITS = {"t", "st", "lt", "lb"}
_LENGTH_UNITS = {"m", "ft"}
_COUNT_KEYS = {"seats": "seats", "axles": "axles",
               "trailers": "trailers", "wheels": "wheels"}
_WEEKDAYS = {"Mo", "Tu", "We", "Th", "Fr", "Sa", "Su", "PH", "SH"}
_MONTHS = {"Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"}
_EVENTS = {"sunset", "sunrise", "dusk", "dawn"}
_TIME_RE = re.compile(r"^[0-9][0-9]:[0-9][0-9]$")
_WEIGHT_RE = re.compile(r"^(\d+(?:\.\d+)?)(t|st|lt|lb)$")
_LENGTH_RE = re.compile(r"^(\d+)(m|ft)$")
_COUNT_RE = re.compile(r"^\d+$")


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside parentheses; unbalanced parens error."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise EtlParseError(f"unbalanced parens in {s!r}")
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if depth != 0:
        raise EtlParseError(f"unbalanced parens in {s!r}")
    parts.append("".join(cur))
    return parts


def _weight_suffix(unit: str) -> str:
    return "" if unit == "t" else f" {unit}"


def _length_suffix(unit: str) -> str:
    return "" if unit == "m" else f" {unit}"


def _parse_weight_restriction(words: list[str]) -> str | None:
    """weight_rating / qualified_weight_pre / qualified_weight_post."""
    if len(words) == 1:
        m = _WEIGHT_RE.match(words[0])
        if m:
            return f"weightrating>{m.group(1)}{_weight_suffix(m.group(2))}"
        return None
    if len(words) == 2:
        a, b = words
        m = _WEIGHT_RE.match(b)
        if a in _WEIGHT_QUALIFIERS and m:  # qualified pre: "current 2t"
            return f"{_WEIGHT_QUALIFIERS[a]}>{m.group(1)}{_weight_suffix(m.group(2))}"
        m = _WEIGHT_RE.match(a)
        if m and b in _WEIGHT_QUALIFIERS:  # qualified post: "2t current"
            return f"{_WEIGHT_QUALIFIERS[b]}>{m.group(1)}{_weight_suffix(m.group(2))}"
    return None


def _parse_time(tok: str) -> str | None:
    """time: TIME | EVENT | (event_with_offset)."""
    if _TIME_RE.match(tok) or tok in _EVENTS:
        return tok
    if tok.startswith("(") and tok.endswith(")"):
        inner = tok[1:-1]
        for op in ("+", "-"):
            if op in inner:
                ev, off = inner.split(op, 1)
                if ev in _EVENTS and _TIME_RE.match(off):
                    return f"({ev}{op}{off})"
        return None
    return None


def _parse_time_span(tok: str) -> str | None:
    """time_span: time '-' time (dash split outside parens)."""
    parts = _split_top(tok, "-")
    if len(parts) != 2:
        return None
    a, b = _parse_time(parts[0]), _parse_time(parts[1])
    if a is None or b is None:
        return None
    return f"{a}-{b}"


def _parse_weekday_span(tok: str) -> str | None:
    """weekday_span: Wd-Wd | weekday_list (comma of spans) | Wd."""
    items = tok.split(",")
    out = []
    for item in items:
        if item in _WEEKDAYS:
            out.append(item)
        elif "-" in item:
            a, b = item.split("-", 1)
            if a in _WEEKDAYS and b in _WEEKDAYS:
                out.append(f"{a}-{b}")
            else:
                return None
        else:
            return None
    return ",".join(out)


def _parse_month_span(tok: str) -> str | None:
    if "-" not in tok:
        return None
    a, b = tok.split("-", 1)
    if a in _MONTHS and b in _MONTHS:
        return f"{a}-{b}"
    return None


# %ignore-WS parity (speed_grammar.ebnf): the reference LEXES, so
# whitespace around a span's punctuation tokens is insignificant —
# 'Mo-Fr, Sa' is the same weekday_list as 'Mo-Fr,Sa' and
# '08:00 - 10:00' the same time_span as '08:00-10:00'. This port
# word-splits instead, using remaining spaces as SPAN separators, so
# punctuation-adjacent whitespace must be collapsed first or a routine
# wiki edit adding a space after a comma silently changes (or fails)
# the parse.
_WS_AROUND_PUNCT_RE = re.compile(r"\s*([\-+,])\s*")


def _parse_date_interval(part: str) -> str | None:
    """date_interval: [month_span] [weekday_span] [time_span] [off] —
    at least one of the three spans present, in that order."""
    part = _WS_AROUND_PUNCT_RE.sub(r"\1", part)
    part = re.sub(r"\(\s+", "(", part)
    part = re.sub(r"\s+\)", ")", part)
    words = part.split()
    if not words:
        return None
    out = []
    i = 0
    for span_parse in (_parse_month_span, _parse_weekday_span, _parse_time_span):
        if i < len(words):
            span = span_parse(words[i])
            if span is not None:
                out.append(span)
                i += 1
    if i < len(words) and words[i] == "off":
        out.append("off")
        i += 1
    if i != len(words) or not out or out == ["off"]:
        return None
    return " ".join(out)


def _parse_date_intervals(tok: str) -> str | None:
    parts = [p.strip() for p in tok.split(";")]
    out = []
    for p in parts:
        iv = _parse_date_interval(p)
        if iv is None:
            return None
        out.append(iv)
    return "; ".join(out)


_NUM_UNIT_GAP_RE = re.compile(r"(\d(?:\.\d+)?)\s+(t|st|lt|lb|m|ft)\b")


def _parse_restriction(tok: str) -> str:
    """One restriction -> OSM conditional term (osm_restrictions.py
    visitor semantics). The reference Lark grammar ignores whitespace
    (speed_grammar.ebnf ``%ignore WS``), so '3.5 t' and '10 m' are the
    same tokens as '3.5t'/'10m' — join number+unit word pairs before
    matching."""
    tok = _NUM_UNIT_GAP_RE.sub(r"\1\2", tok.strip())
    words = tok.split()
    w = _parse_weight_restriction(words)
    if w is not None:
        return w
    if tok in _CONDITIONALS:
        return tok
    if len(words) == 1:
        m = _LENGTH_RE.match(words[0])
        if m:
            return f"length>{m.group(1)}{_length_suffix(m.group(2))}"
    if len(words) == 2 and _COUNT_RE.match(words[0]) and words[1] in _COUNT_KEYS:
        return f"{_COUNT_KEYS[words[1]]}>={words[0]}"
    d = _parse_date_intervals(tok)
    if d is not None:
        return d
    raise EtlParseError(f"invalid restriction {tok!r}")


def _parse_speed_value(tok: str) -> str:
    tok = tok.strip()
    if tok == "walk":
        return "walk"
    m = re.match(r"^(\d+)\s*mph$", tok)
    if m:
        return f"{m.group(1)} mph"
    if _COUNT_RE.match(tok):
        return tok
    raise EtlParseError(f"invalid speed value {tok!r}")


def _parse_single_speed(tok: str) -> tuple[str, str]:
    """single_speed_def -> (tag, value); restrictions fold into a
    ':conditional' key with ' AND '-joined terms."""
    tok = tok.strip()
    tag = "maxspeed"
    if tok.startswith("advisory:"):
        tag, tok = "maxspeed:advisory", tok[len("advisory:"):].strip()
    elif tok.startswith("min:"):
        tag, tok = "minspeed", tok[len("min:"):].strip()

    m = re.match(r"^([^()]*?)\s*\((.*)\)$", tok)
    if m:
        value = _parse_speed_value(m.group(1))
        # a whole date_intervals restriction may itself contain ',' and
        # ';' (weekday lists, interval lists) — try it first, only then
        # treat commas as restriction separators
        whole = _parse_date_intervals(m.group(2))
        if whole is not None:
            terms = [whole]
        else:
            terms = [_parse_restriction(r) for r in _split_top(m.group(2), ",")]
        return f"{tag}:conditional", f"{value} @ ({' AND '.join(terms)})"
    if "(" in tok or ")" in tok:
        raise EtlParseError(f"unbalanced parens in {tok!r}")
    return tag, _parse_speed_value(tok)


def parse_speeds(s: str) -> dict[str, str]:
    """Speed-cell string -> OSM tag dict. Duplicate keys concatenate
    with '; ' (osm_restrictions.py:100-111). Raises EtlParseError on
    junk (the reference raises from the Lark parser)."""
    result: dict[str, str] = {}

    def put(k: str, v: str) -> None:
        result[k] = f"{result[k]}; {v}" if k in result else v

    for part in _split_top(s, ","):
        part = part.strip()
        if not part:
            raise EtlParseError("empty speed definition")
        if part == "X":
            put("access", "no")
            continue
        lanes = _split_top(part, "|")
        if len(lanes) > 1:
            put(
                "maxspeed:lanes",
                "|".join(_parse_single_speed(lane)[1] for lane in lanes),
            )
            continue
        tag, v = _parse_single_speed(part)
        put(tag, v)
    return result


# ===========================================================================
# S3: HTML table scan with rowspan/colspan resolution
# ===========================================================================

class TableGrid:
    """Resolves rowspan/colspan carry-over so each row reads as a flat
    list of logical cells (reference TableRowHelper semantics,
    parse_utils.py:15-47): cells spanning rows stay addressable at
    their column index for the following rows."""

    def __init__(self) -> None:
        self._cache: dict[int, tuple[int, "Cell"]] = {}

    def set_cells(self, cells: list["Cell"]) -> None:
        for k in list(self._cache):
            remaining, value = self._cache[k]
            if remaining == 1:
                del self._cache[k]
            else:
                self._cache[k] = (remaining - 1, value)
        col = 0
        for cell in cells:
            while col in self._cache:
                col += 1
            for _ in range(cell.colspan):
                self._cache[col] = (cell.rowspan, cell)
                col += 1

    def get(self, idx: int) -> "Cell":
        return self._cache[idx][1]

    def has(self, idx: int) -> bool:
        return idx in self._cache


class Cell:
    __slots__ = ("tag", "rowspan", "colspan", "chunks")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.rowspan = int(attrs.get("rowspan", 1) or 1)
        self.colspan = int(attrs.get("colspan", 1) or 1)
        self.chunks: list[str] = []

    def text(self) -> str:
        """Whitespace-normalized visible text (sup/img content was
        dropped at parse time — the reference decomposes those tags)."""
        return " ".join("".join(self.chunks).split())


class _TableHTMLParser(HTMLParser):
    """Minimal table extractor: tables -> rows -> cells. Content under
    'uninteresting' tags (sup, img — footnote markers etc.,
    parse_utils.py:50-51) is dropped.

    Open tables form a STACK so a table nested inside a ``<td>`` (the
    real wiki page carries infobox/legend tables outside the two
    content tables) parses as its own entry without corrupting the
    host: the host's earlier AND later rows survive, and the nested
    cell text stays out of the host cell. ``tables`` order is document
    order of the ``<table>`` START tags — host before its nested
    tables — matching the reference's ``soup.find_all('table')``
    ordering (parse_utils.py) that the tables[0]/tables[1] layout
    contract indexes into."""

    # Non-void wrappers whose TEXT content must be skipped. img is NOT
    # here: it is an HTML void element, so html.parser never emits an
    # end tag for a bare '<img ...>' (modern MediaWiki markup) — depth-
    # tracking it would leave _skip_depth stuck > 0 after the first
    # flag icon and silently drop every later cell's text. An <img>
    # can contain no text, so there is nothing to skip; XHTML '<img/>'
    # arrives as startendtag and both handlers below no-op on it.
    UNINTERESTING = {"sup", "script", "style"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[Cell]]] = []
        # innermost open table last: {rows, row, cell}; rows aliases
        # the entry already reserved in self.tables (document order)
        self._stack: list[dict] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag in self.UNINTERESTING:
            self._skip_depth += 1
            return
        if tag == "table":
            self.tables.append([])
            self._stack.append(
                {"rows": self.tables[-1], "row": None, "cell": None}
            )
            return
        if not self._stack:
            return
        t = self._stack[-1]
        if tag == "tr":
            t["row"] = []
            t["cell"] = None
        elif tag in ("td", "th") and t["row"] is not None:
            t["cell"] = Cell(tag, a)
            t["row"].append(t["cell"])
        elif tag == "br" and t["cell"] is not None:
            t["cell"].chunks.append(" ")

    def handle_endtag(self, tag):
        if tag in self.UNINTERESTING:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if not self._stack:
            return
        t = self._stack[-1]
        if tag == "table":
            self._stack.pop()
        elif tag == "tr":
            if t["row"] is not None:
                t["rows"].append(t["row"])
            t["row"] = None
            t["cell"] = None
        elif tag in ("td", "th"):
            t["cell"] = None

    def handle_data(self, data):
        if self._stack and self._skip_depth == 0:
            cell = self._stack[-1]["cell"]
            if cell is not None:
                cell.chunks.append(data)


def parse_tables(html: str) -> list[list[list[Cell]]]:
    p = _TableHTMLParser()
    p.feed(html)
    return p.tables


# ===========================================================================
# S4 / S5: road-types table and ordered speed table
# ===========================================================================

def parse_road_types_table(table: list[list[Cell]]) -> dict[str, dict[str, str]]:
    """Wiki table 2 -> {road type name: {filter, fuzzyFilter,
    relationFilter}} (keys omitted when the cell is empty);
    reference parse_utils.py:54-77."""
    grid = TableGrid()
    result: dict[str, dict[str, str]] = {}
    for row in table:
        tds = [c for c in row if c.tag == "td"]
        grid.set_cells(tds)
        if not tds:
            continue
        name = grid.get(0).text()
        entry: dict[str, str] = {}
        for idx, key in ((1, "filter"), (2, "fuzzyFilter"), (3, "relationFilter")):
            if grid.has(idx):
                v = grid.get(idx).text()
                if v:
                    entry[key] = v
        result[name] = entry
    return result


def parse_speed_table(
    table: list[list[Cell]],
    parse_speeds_func=parse_speeds,
    resolve_country=None,
) -> dict:
    """Wiki table 1 -> {'speedLimitsByCountryCode': {cc: [rule, ...]},
    'warnings': [...]} preserving wiki row order (order is match
    priority — SURVEY.md C1). Vehicle-specific columns rewrite
    ``maxspeed`` -> ``maxspeed:<vehicle>`` and ``access`` ->
    ``<vehicle>``; the '(default)' column keeps bare keys
    (parse_utils.py:80-146, vehicle rewrite :131-135)."""
    resolve = resolve_country or resolve_country_code
    grid = TableGrid()
    column_names: list[str] = []
    result: dict[str, list] = {}
    warnings: list[str] = []

    for row in table:
        ths = [c for c in row if c.tag == "th"]
        if ths:
            if not column_names:
                for th in ths:
                    for _ in range(th.colspan):
                        column_names.append(th.text())
            else:
                # partial second header row overrides by position
                for i, th in enumerate(ths):
                    t = th.text()
                    if t:
                        for j in range(th.colspan):
                            if i + j < len(column_names):
                                column_names[i + j] = t

        tds = [c for c in row if c.tag == "td"]
        grid.set_cells(tds)
        if not tds:
            continue
        country = grid.get(0).text()
        cc = resolve(country)
        if not cc:
            warnings.append(f"{country}: Unknown country / subdivision")
            continue
        road_type = grid.get(1).text()

        road_tags: dict[str, str] = {}
        for col in range(2, len(column_names)):
            if not grid.has(col):
                continue
            speeds = grid.get(col).text()
            if not speeds:
                continue
            vehicle = column_names[col]
            try:
                parsed = parse_speeds_func(speeds)
            except Exception:
                parsed = {}
                warnings.append(
                    f"{country}: Unable to parse '{vehicle}' for '{road_type}'"
                )
            for key, value in parsed.items():
                if vehicle != "(default)":
                    key = key.replace("maxspeed", "maxspeed:" + vehicle, 1)
                    key = key.replace("access", vehicle)
                road_tags[key] = value

        rule: dict = {"tags": road_tags}
        if road_type:
            rule["name"] = road_type
        result.setdefault(cc, []).append(rule)

    return {"speedLimitsByCountryCode": result, "warnings": warnings}


# ===========================================================================
# S6: country / subdivision code resolution (injectable — no pycountry)
# ===========================================================================

# Display-name overrides where the general lookup disagrees with the
# wiki's naming (same factual mapping the reference pins,
# parse_utils.py:171-191).
NAME_OVERRIDES: dict[str, str] = {
    "Brunei": "BN",
    "Belgium:Brussels-Capital Region": "BE-BRU",
    "Belgium:Flanders": "BE-VLG",
    "Belgium:Wallonia": "BE-WAL",
    "Democratic Republic of the Congo": "CD",
    "Kosovo": "XK",
    "Micronesia": "FM",
    "Micronesia:Kosrae": "FM-KSA",
    "Micronesia:Pohnpei": "FM-PNI",
    "Micronesia:Chuuk": "FM-TRK",
    "Micronesia:Yap": "FM-YAP",
    "Netherlands:Bonaire": "NL-BQ1",
    "Netherlands:Saba": "NL-BQ2",
    "Netherlands:Sint Eustatius": "NL-BQ3",
    "Palestine": "PS",
    "Pitcairn Islands": "PN",
    "Russia": "RU",
    "Turkey": "TR",
    "United Kingdom:Scotland": "GB-SCT",
}

# Built-in ISO 3166-1/-2 name tables (public data, pycountry
# replacement; extend or replace via the `countries`/`subdivisions`
# parameters). ~230 country names + every subdivision family the
# reference dataset uses (US/CA/AU/DE/GB/BE/FM/NL-BQ/BS).
from osm_legal_default_speeds_spark.sources.iso3166 import (  # noqa: E402
    COUNTRY_ALPHA2,
    SUBDIVISIONS,
)


def resolve_country_code(
    name: str,
    overrides: dict[str, str] | None = None,
    countries: dict[str, str] | None = None,
    subdivisions: dict[tuple[str, str], str] | None = None,
) -> str | None:
    """'Country' or 'Country:Subdivision' display name -> ISO 3166-1/-2
    code; None when unknown (caller records a warning)."""
    overrides = NAME_OVERRIDES if overrides is None else overrides
    countries = COUNTRY_ALPHA2 if countries is None else countries
    subdivisions = SUBDIVISIONS if subdivisions is None else subdivisions
    if name in overrides:
        return overrides[name]
    parts = name.split(":")
    cc = countries.get(parts[0].strip())
    if cc is None:
        return None
    if len(parts) > 1:
        return subdivisions.get((cc, parts[1].strip()))
    return cc


# ===========================================================================
# Validation warnings (parse_utils.py:194-216) + S7 JSON assembly
# ===========================================================================

_PLACEHOLDER_RE = re.compile(r"\{(.*?)\}")


def validate_road_types(road_types: dict[str, dict[str, str]]) -> list[str]:
    warnings = []
    for road_type, filters in road_types.items():
        for key in ("filter", "fuzzyFilter", "relationFilter"):
            if key in filters:
                for m in _PLACEHOLDER_RE.finditer(filters[key]):
                    if m.group(1) not in road_types:
                        warnings.append(
                            f"{road_type}: Unable to map '{m.group(1)}'"
                        )
    return warnings


def validate_road_types_in_speed_table(
    speeds_by_country_code: dict[str, list], road_types: dict
) -> list[str]:
    warnings = []
    for cc, rules in speeds_by_country_code.items():
        for rule in rules:
            if "name" in rule and rule["name"] not in road_types:
                warnings.append(f"{cc}: Unable to map '{rule['name']}'")
    return warnings


def build_rules_dataset(
    speeds_html_table: list[list[Cell]],
    road_types_html_table: list[list[Cell]],
    meta: dict[str, str] | None = None,
    resolve_country=None,
) -> dict:
    """Full ETL assembly (main.py:31-44): parse both tables, collect
    validation warnings, return the dataset dict in the engine's input
    shape. Serialize with ``to_json`` for the sorted-keys file."""
    road_types = parse_road_types_table(road_types_html_table)
    speeds = parse_speed_table(
        speeds_html_table, resolve_country=resolve_country
    )
    warnings = (
        speeds["warnings"]
        + validate_road_types(road_types)
        + validate_road_types_in_speed_table(
            speeds["speedLimitsByCountryCode"], road_types
        )
    )
    return {
        "meta": meta or {},
        "roadTypesByName": road_types,
        "speedLimitsByCountryCode": speeds["speedLimitsByCountryCode"],
        "warnings": warnings,
    }


def to_json(dataset: dict) -> str:
    return json.dumps(dataset, sort_keys=True, indent=2)


# ===========================================================================
# S2: wiki page fetch (MediaWiki parse API)
# ===========================================================================

WIKI_URL = "https://wiki.openstreetmap.org/wiki/"
WIKI_API_URL = "https://wiki.openstreetmap.org/w/api.php"
WIKI_PAGE = "Default_speed_limits"


def fetch_wiki_page(
    page: str = WIKI_PAGE,
    api_url: str = WIKI_API_URL,
    timeout: float = 60.0,
) -> tuple[str, str]:
    """S2: fetch a page's rendered HTML through the public MediaWiki
    parse API (reference ``parser/main.py:23-29``), stdlib urllib only
    (no ``requests`` in this environment). Returns ``(html,
    revision_id)`` with the reference's no-break-space cleanup applied.

    ``api_url`` may be a ``file://`` URL pointing at a canned API JSON
    response — the offline test path (query parameters are omitted for
    file URLs); production use is the real API endpoint. Network access
    is a deployment concern: the monthly ETL job is the only caller, so
    failures raise to the scheduler rather than being retried here."""
    import urllib.parse
    import urllib.request

    if api_url.startswith("file:"):
        url = api_url
    else:
        q = urllib.parse.urlencode(
            {"action": "parse", "page": page, "format": "json"}
        )
        url = f"{api_url}?{q}"
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        payload = json.loads(resp.read().decode("utf-8"))
    parsed = payload["parse"]
    # mediawiki's UI editor sometimes inserts no-break spaces; the
    # reference strips the entity form pre-parse (main.py:26) — strip
    # the literal character too, since charref decoding order differs
    # between parsers
    html = parsed["text"]["*"].replace("&#160;", " ").replace(" ", " ")
    return html, str(parsed["revid"])


def etl_from_wiki(
    page: str = WIKI_PAGE,
    api_url: str = WIKI_API_URL,
    resolve_country=None,
    timestamp: str | None = None,
) -> dict:
    """End-to-end S2->S7: fetch -> table scan -> parse both tables ->
    dataset dict (reference ``main.py:23-44``). The wiki layout
    contract: table 0 is the speed table, table 1 the road-types
    table. ``timestamp`` overrides the generated-at stamp (pass a
    fixed value for reproducible output; defaults to now-UTC like the
    reference)."""
    import datetime

    html, revid = fetch_wiki_page(page, api_url)
    tables = parse_tables(html)
    if len(tables) < 2:
        raise EtlParseError(
            f"expected >=2 tables on {page!r}, found {len(tables)}"
        )
    if timestamp is None:
        timestamp = (
            datetime.datetime.now(datetime.timezone.utc)
            .replace(microsecond=0)
            .isoformat()
        )
    meta = {
        "source": WIKI_URL + page,
        "revisionId": revid,
        "timestamp": timestamp,
        "license": "Creative Commons Attribution-ShareAlike 2.0 license",
        "licenseUrl": "https://wiki.openstreetmap.org/wiki/Wiki_content_license",
    }
    return build_rules_dataset(
        tables[0], tables[1], meta=meta, resolve_country=resolve_country
    )
