"""Hypothesis property: the wiki renderer inverts the speed-cell
grammar on the WHOLE grammar, not just the shapes the shipped dataset
uses. Strategy: generate random cell texts from the grammar's
productions, parse them to tags (the fixpoint representation), then
require render -> re-parse (with a random vehicle-column rewrite) to
reproduce the tags exactly — `verify_cells` raises on any drift.
Complements tests/test_etl_differential.py (fixed real dataset) with
randomized coverage of conditionals, qualified weights, units, counts,
date intervals, lanes (incl. conditional lanes), advisory/min forms,
and access-X."""

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from osm_legal_default_speeds_spark.sources.wiki_etl import parse_speeds
from osm_legal_default_speeds_spark.sources.wiki_render import (
    render_cells,
    verify_cells,
)

_speed = st.one_of(
    st.integers(5, 130).map(str),
    st.integers(5, 80).map(lambda n: f"{n} mph"),
    st.just("walk"),
)

_weight_num = st.one_of(
    st.integers(1, 40).map(str),
    st.tuples(st.integers(1, 40), st.integers(1, 99)).map(
        lambda t: f"{t[0]}.{t[1]:02d}"
    ),
)
_weight = st.tuples(
    _weight_num, st.sampled_from(["t", "st", "lt", "lb"])
).map(lambda t: f"{t[0]}{t[1]}")

_restriction = st.one_of(
    st.sampled_from(
        ["trailer", "articulated", "caravan", "wet", "empty", "agricultural"]
    ),
    _weight,  # weight rating
    st.tuples(
        st.sampled_from(["empty", "capacity", "trailer", "current"]), _weight
    ).map(lambda t: f"{t[0]} {t[1]}"),  # qualified pre
    st.tuples(
        st.integers(1, 99), st.sampled_from(["m", "ft"])
    ).map(lambda t: f"{t[0]}{t[1]}"),  # length
    st.tuples(
        st.integers(1, 60),
        st.sampled_from(["seats", "axles", "trailers", "wheels"]),
    ).map(lambda t: f"{t[0]} {t[1]}"),  # counts
    st.sampled_from(
        [
            "22:00-06:00",
            "Mo-Fr 08:00-16:00",
            "Sep-Jun Mo-Fr 07:30-16:00",
            "sunset-sunrise",
            "(sunset+00:30)-(sunrise-00:30)",
            "Nov-Mar",
            "Mo-Fr 06:00-19:00; Sa 10:00-14:00",
        ]
    ),  # date intervals (incl. a multi-part one)
)

_single = st.one_of(
    _speed,
    st.tuples(_speed, st.lists(_restriction, min_size=1, max_size=3)).map(
        lambda t: f"{t[0]} ({', '.join(t[1])})"
    ),
)

_part = st.one_of(
    _single,
    _single.map(lambda s: f"min: {s}"),
    _single.map(lambda s: f"advisory: {s}"),
    st.just("X"),
    st.lists(_single, min_size=2, max_size=3).map("|".join),  # lanes
)

_cell = st.lists(_part, min_size=1, max_size=3).map(", ".join)

_vehicle = st.sampled_from(
    ["(default)", "hgv", "bus", "goods", "motorcycle", "tricycle"]
)


@settings(max_examples=300, deadline=None)
@given(cell=_cell, vehicle=_vehicle)
def test_render_inverts_grammar(cell, vehicle):
    try:
        parsed = parse_speeds(cell)
    except Exception:
        # a generated combination the grammar rejects (e.g. a
        # multi-part date interval followed by another restriction is
        # ambiguous) — out of scope: the renderer only ever sees tags
        # the parser produced
        return
    tags = {}
    for key, value in parsed.items():
        if vehicle != "(default)":
            key = key.replace("maxspeed", "maxspeed:" + vehicle, 1)
            key = key.replace("access", vehicle)
        tags[key] = value
    # raises RenderError on any round-trip drift
    verify_cells(tags, render_cells(tags))
