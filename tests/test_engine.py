"""Ported from LegalDefaultSpeedsTest.kt:8-465 — the end-to-end
integration fixture ("ZA") covering cascade precedence, two-pass scan
order, placeholder recursion, relation matching, replacer overrides,
subdivision fallback, speed capping, implicit maxspeed, circular
placeholders, and relevant keys."""

import pytest

from osm_legal_default_speeds_spark import (
    Certitude,
    LegalDefaultSpeedsEngine,
    Result,
    RoadTypeDef,
    RoadTypeFilterDef,
)


def road(name=None, tags=None):
    return RoadTypeDef(name, tags or {})


def filters(filter=None, fuzzy_filter=None, relation_filter=None):
    return RoadTypeFilterDef(filter, fuzzy_filter, relation_filter)


@pytest.fixture(scope="module")
def za():
    return LegalDefaultSpeedsEngine(
        {
            "living street": filters("highway=living_street"),
            "alley": filters("{urban} and alley=yes"),
            "urban": filters("lit=yes", "highway=residential"),
            "urban state road": filters("{urban} and {state road}"),
            "rural": filters(None, "sidewalk=no"),
            "dual carriageway": filters("dual_carriageway=yes"),
            "motorway": filters("highway=motorway"),
            "state road": filters(None, None, "type=route and ref~ZA.*"),
            "rural state road": filters("{rural} and {state road}"),
            "road in construction": filters("~construction|proposed~yes"),
            "imaginary road": filters("~imagination:.*"),
        },
        {
            "ZA": [
                road("road in construction", {"maxspeed": "0"}),
                road("living street", {"maxspeed": "10"}),
                road("alley", {"maxspeed": "5"}),
                road("urban state road", {"maxspeed": "60"}),
                road("urban", {"maxspeed": "50"}),
                road(None, {"maxspeed": "100"}),  # default rule
                road("rural", {"maxspeed": "100"}),
                road("dual carriageway", {"maxspeed": "110"}),
                road("rural state road", {"maxspeed": "115"}),
                road("motorway", {"maxspeed": "120"}),
                road("imaginary road", {"maxspeed": "999"}),
            ]
        },
    )


def test_fails_on_syntax_exception_in_filter():
    for kwargs in (
        {"filter": "and and"},
        {"relation_filter": "and and"},
        {"fuzzy_filter": "and and"},
    ):
        with pytest.raises(ValueError):
            LegalDefaultSpeedsEngine(
                {"urban": filters(**kwargs)},
                {"FR": [road("urban", {"maxspeed": "50"})]},
            )


def test_no_tags_match():
    engine = LegalDefaultSpeedsEngine(
        {"urban": filters("lit=yes")},
        {"SD": [road("urban", {"maxspeed": "60"})]},
    )
    assert engine.get_speed_limits("SD", {"lit": "no"}) is None


def test_unknown_country(za):
    assert za.get_speed_limits("GY", {"lit": "yes"}) is None


def test_fallback_when_no_tags_match(za):
    assert za.get_speed_limits("ZA", {"lit": "no"}) == Result(
        None, {"maxspeed": "100"}, Certitude.FALLBACK
    )


def test_simple_match(za):
    assert za.get_speed_limits("ZA", {"lit": "yes"}) == Result(
        "urban", {"maxspeed": "50"}, Certitude.EXACT
    )


def test_from_maxspeed_match(za):
    assert za.get_speed_limits("ZA", {"maxspeed": "110"}) == Result(
        "dual carriageway", {}, Certitude.FROM_MAX_SPEED
    )


def test_fuzzy_match(za):
    assert za.get_speed_limits("ZA", {"highway": "residential"}) == Result(
        "urban", {"maxspeed": "50"}, Certitude.FUZZY
    )


def test_fallback_to_country_if_subdivision_unknown(za):
    assert za.get_speed_limits("ZA-NC", {"lit": "yes"}) == Result(
        "urban", {"maxspeed": "50"}, Certitude.EXACT
    )


def test_fallback_to_country_if_subdivision_unknown_from_maxspeed(za):
    assert za.get_speed_limits("ZA-NC", {"maxspeed": "50"}) == Result(
        "urban", {}, Certitude.FROM_MAX_SPEED
    )


def test_prefer_matches_further_down_the_list(za):
    assert za.get_speed_limits(
        "ZA", {"highway": "motorway", "lit": "yes", "dual_carriageway": "yes"}
    ) == Result("motorway", {"maxspeed": "120"}, Certitude.EXACT)
    assert za.get_speed_limits(
        "ZA", {"lit": "yes", "dual_carriageway": "yes"}
    ) == Result("dual carriageway", {"maxspeed": "110"}, Certitude.EXACT)


def test_prefer_matches_further_at_the_top_of_the_list_otherwise(za):
    assert za.get_speed_limits(
        "ZA", {"highway": "living_street", "lit": "yes"}
    ) == Result("living street", {"maxspeed": "10"}, Certitude.EXACT)


def test_prefer_exact_over_fuzzy_rules(za):
    assert za.get_speed_limits("ZA", {"lit": "yes", "sidewalk": "no"}) == Result(
        "urban", {"maxspeed": "50"}, Certitude.EXACT
    )


def test_prefer_exact_over_from_maxspeed_rules(za):
    assert za.get_speed_limits(
        "ZA", {"lit": "yes", "sidewalk": "no", "maxspeed": "110"}
    ) == Result("urban", {}, Certitude.EXACT)


def test_prefer_from_maxspeed_over_fuzzy_rules(za):
    assert za.get_speed_limits("ZA", {"sidewalk": "no", "maxspeed": "110"}) == Result(
        "dual carriageway", {}, Certitude.FROM_MAX_SPEED
    )


def test_exact_match_with_placeholder(za):
    assert za.get_speed_limits("ZA", {"lit": "yes", "alley": "yes"}) == Result(
        "alley", {"maxspeed": "5"}, Certitude.EXACT
    )


def test_fuzzy_match_with_placeholder(za):
    assert za.get_speed_limits(
        "ZA", {"highway": "residential", "alley": "yes"}
    ) == Result("alley", {"maxspeed": "5"}, Certitude.FUZZY)


def test_find_contained_in_relation_with_additional_fuzzy_rule(za):
    assert za.get_speed_limits(
        "ZA",
        {"sidewalk": "no"},
        [
            {"type": "route", "ref": "Bus 1234"},
            {"type": "route", "ref": "ZA 2"},
        ],
    ) == Result("rural state road", {"maxspeed": "115"}, Certitude.FUZZY)


def test_find_contained_in_relation_with_additional_exact_rule(za):
    assert za.get_speed_limits(
        "ZA", {"lit": "yes"}, [{"type": "route", "ref": "ZA 2"}]
    ) == Result("urban state road", {"maxspeed": "60"}, Certitude.EXACT)


def test_replacing_urban(za):
    assert za.get_speed_limits(
        "ZA", {}, replacer_fn=lambda name, ev: True if name == "urban" else ev()
    ) == Result("urban", {"maxspeed": "50"}, Certitude.EXACT)


def test_replacing_urban_via_overrides_column(za):
    assert za.get_speed_limits("ZA", {}, overrides={"urban": True}) == Result(
        "urban", {"maxspeed": "50"}, Certitude.EXACT
    )


def test_replacing_urban_combined_with_other_filter(za):
    assert za.get_speed_limits(
        "ZA",
        {"alley": "yes"},
        replacer_fn=lambda name, ev: True if name == "urban" else ev(),
    ) == Result("alley", {"maxspeed": "5"}, Certitude.EXACT)


def test_replacing_urban_combined_with_fuzzy_filter(za):
    assert za.get_speed_limits(
        "ZA",
        {"highway": "residential"},
        replacer_fn=lambda name, ev: True if name == "state road" else ev(),
    ) == Result("urban state road", {"maxspeed": "60"}, Certitude.FUZZY)


def _tags_of(rule_tags, input_tags=None):
    engine = LegalDefaultSpeedsEngine({}, {"AB": [road(tags=rule_tags)]})
    result = engine.get_speed_limits("AB", input_tags or {})
    assert result is not None
    return result.tags


def test_removes_subtags_with_higher_speeds():
    assert _tags_of(
        {"maxspeed": "60", "maxspeed:hgv": "80", "maxspeed:mofa": "50"}
    ) == {"maxspeed": "60", "maxspeed:mofa": "50"}


def test_removes_subtags_with_higher_mph_speeds():
    assert _tags_of(
        {"maxspeed": "35 mph", "maxspeed:hgv": "40 mph", "maxspeed:mofa": "10 mph"}
    ) == {"maxspeed": "35 mph", "maxspeed:mofa": "10 mph"}


def test_removes_conditionals_with_higher_speeds():
    assert _tags_of(
        {"maxspeed": "60", "maxspeed:conditional": "80 @ (something); 50 @ (something else)"}
    ) == {"maxspeed": "60", "maxspeed:conditional": "50 @ (something else)"}


def test_removes_conditionals_with_higher_mph_speeds():
    assert _tags_of(
        {
            "maxspeed": "35 mph",
            "maxspeed:conditional": "35 mph @ (something); 20 mph @ (something else)",
        }
    ) == {"maxspeed": "35 mph", "maxspeed:conditional": "20 mph @ (something else)"}


def test_removes_all_conditionals_if_all_higher():
    assert _tags_of(
        {"maxspeed": "60", "maxspeed:conditional": "80 @ (something); 60 @ (something else)"}
    ) == {"maxspeed": "60"}


def test_removes_all_conditionals_if_all_higher_mph():
    assert _tags_of(
        {
            "maxspeed": "20 mph",
            "maxspeed:conditional": "40 mph @ (something); 30 mph @ (something else)",
        }
    ) == {"maxspeed": "20 mph"}


def test_removes_conditionals_of_subtags_with_higher_speeds_than_default():
    assert _tags_of(
        {"maxspeed": "60", "maxspeed:hgv:conditional": "80 @ (something); 50 @ (something else)"}
    ) == {"maxspeed": "60", "maxspeed:hgv:conditional": "50 @ (something else)"}


def test_removes_conditionals_of_subtags_with_higher_speeds():
    assert _tags_of(
        {
            "maxspeed:hgv": "60",
            "maxspeed:hgv:conditional": "80 @ (something); 50 @ (something else)",
        }
    ) == {"maxspeed:hgv": "60", "maxspeed:hgv:conditional": "50 @ (something else)"}


def test_removes_conditionals_of_subtags_with_higher_mph_speeds():
    assert _tags_of(
        {
            "maxspeed:hgv": "30 mph",
            "maxspeed:hgv:conditional": "40 mph @ (something); 20 mph @ (something else)",
        }
    ) == {"maxspeed:hgv": "30 mph", "maxspeed:hgv:conditional": "20 mph @ (something else)"}


def test_removes_all_conditionals_of_subtags_if_all_higher():
    assert _tags_of(
        {
            "maxspeed:hgv": "60",
            "maxspeed:hgv:conditional": "80 @ (something); 60 @ (something else)",
        }
    ) == {"maxspeed:hgv": "60"}


def test_removes_all_conditionals_of_subtags_if_all_higher_mph():
    assert _tags_of(
        {
            "maxspeed:hgv": "10 mph",
            "maxspeed:hgv:conditional": "40 mph @ (something); 30 mph @ (something else)",
        }
    ) == {"maxspeed:hgv": "10 mph"}


def test_removes_subtags_with_higher_speeds_when_lower_speed_is_specified():
    assert _tags_of(
        {"maxspeed": "100", "maxspeed:hgv": "80", "maxspeed:mofa": "50"},
        {"maxspeed": "80"},
    ) == {"maxspeed:mofa": "50"}
    assert _tags_of(
        {"maxspeed": "100", "maxspeed:hgv": "80"},
        {"maxspeed": "80", "maxspeed:hgv": "50"},
    ) == {}


def test_removes_tags_already_present_in_input_tags():
    assert _tags_of(
        {"maxspeed": "100", "maxspeed:hgv": "80", "maxspeed:mofa": "50"},
        {"maxspeed": "100", "maxspeed:mofa": "50"},
    ) == {"maxspeed:hgv": "80"}


def test_replaces_maxspeed_type_tag_in_maxspeed_tag():
    assert _tags_of({"maxspeed": "100"}, {"maxspeed": "RO:urban"}) == {"maxspeed": "100"}


def test_fails_for_obvious_circular_placeholder():
    with pytest.raises(ValueError):
        LegalDefaultSpeedsEngine({"rural": filters("{rural}")}, {})


def test_fails_for_circular_placeholder():
    with pytest.raises(ValueError):
        LegalDefaultSpeedsEngine(
            {"urban": filters("{lit}"), "lit": filters("{urban}")}, {}
        )


def test_fails_for_deeply_nested_circular_placeholder():
    with pytest.raises(ValueError):
        LegalDefaultSpeedsEngine(
            {
                "urban": filters("{lit}", "{sidewalk}"),
                "lit": filters("lit=yes"),
                "sidewalk": filters("sidewalk=yes", "{something else}"),
                "something else": filters("{urban}"),
            },
            {},
        )


def test_relevant_tags(za):
    for key in ("highway", "sidewalk", "ref", "proposed", "imagination:1"):
        assert za.is_relevant_tag_key(key)


def test_non_relevant_tags(za):
    for key in ("opening_hours", "urban", "{urban}", "not:imagination"):
        assert not za.is_relevant_tag_key(key)
