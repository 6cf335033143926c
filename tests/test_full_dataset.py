"""Full-dataset differential checks: compile the real
legal_default_speeds.json (172 road types, 242 countries, 1206 rules)
and pin the README's documented examples (README.md:84-242)."""

import os

import pytest

from osm_legal_default_speeds_spark import Certitude, LegalDefaultSpeedsEngine
from osm_legal_default_speeds_spark.sources.rules_json import (
    REFERENCE_DATASET_PATH,
    load_rules_json,
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_DATASET_PATH),
    reason="reference dataset not available",
)


@pytest.fixture(scope="module")
def engine():
    meta, road_types, speed_limits, warnings = load_rules_json(REFERENCE_DATASET_PATH)
    assert len(road_types) == 172
    assert len(speed_limits) == 242
    assert sum(len(v) for v in speed_limits.values()) >= 1000
    return LegalDefaultSpeedsEngine(road_types, speed_limits)


def test_dk_motorway_readme_example(engine):
    result = engine.get_speed_limits("DK", {"highway": "motorway"})
    assert result is not None
    assert result.road_type_name == "motorway"
    assert result.certitude == Certitude.EXACT
    assert result.tags == {
        "maxspeed": "130",
        "maxspeed:bus:conditional": "80 @ (weightrating>3.5)",
        "maxspeed:coach": "100",
        "maxspeed:conditional": "80 @ (trailer); 80 @ (weightrating>3.5)",
        "maxspeed:hgv": "80",
        "minspeed": "50",
    }


def test_us_nd_interstate_relation_readme_example(engine):
    result = engine.get_speed_limits(
        "US-ND",
        {"lanes": "2", "oneway": "yes"},
        [{"type": "route", "route": "road", "network": "US:I"}],
    )
    assert result is not None
    assert (
        result.road_type_name
        == "US interstate highway with 2 or more lanes in each direction"
    )
    assert result.tags == {"maxspeed": "75 mph"}
    assert result.certitude == Certitude.EXACT


def test_every_country_has_consistent_scan_order(engine):
    rs = engine.ruleset
    for cc, rules in rs.speed_limits_by_country.items():
        scan = rs.scan_order_by_country[cc]
        assert len(set(scan)) == len(scan)
        for i in scan:
            assert rules[i].name is not None


def test_fallback_everywhere_gives_result_or_none(engine):
    hits = 0
    for cc in engine.ruleset.speed_limits_by_country:
        r = engine.get_speed_limits(cc, {"highway": "tertiary"})
        if r is not None:
            hits += 1
            assert r.certitude in Certitude.ALL
    # 238 of 242 countries ship a fallback rule
    assert hits >= 230


def test_relevant_keys_on_full_dataset(engine):
    assert engine.is_relevant_tag_key("highway")
    assert engine.is_relevant_tag_key("maxspeed")
    assert not engine.is_relevant_tag_key("opening_hours")
