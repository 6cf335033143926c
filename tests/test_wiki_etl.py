"""Wiki ETL (SURVEY.md S3-S7): speed-cell grammar goldens (behavioral
parity with the reference's parser/test_speed_parser.py corpus),
rowspan/colspan table resolution, ordered speed-table parse with
vehicle-column rewrite, country resolution, validators."""

import pytest

from osm_legal_default_speeds_spark.sources.wiki_etl import (
    EtlParseError,
    build_rules_dataset,
    parse_road_types_table,
    parse_speed_table,
    parse_speeds,
    parse_tables,
    resolve_country_code,
    to_json,
    validate_road_types,
    validate_road_types_in_speed_table,
)

# ---------------------------------------------------------------- grammar

GOLDENS = [
    ("40", {"maxspeed": "40"}),
    ("40 mph", {"maxspeed": "40 mph"}),
    ("walk", {"maxspeed": "walk"}),
    # lanes
    ("80|60", {"maxspeed:lanes": "80|60"}),
    ("80|60|40", {"maxspeed:lanes": "80|60|40"}),
    # conditionals
    ("40 mph (2t trailer)", {"maxspeed:conditional": "40 mph @ (trailerweight>2)"}),
    ("40 mph (0.75t trailer)", {"maxspeed:conditional": "40 mph @ (trailerweight>0.75)"}),
    ("40 mph (2st trailer)", {"maxspeed:conditional": "40 mph @ (trailerweight>2 st)"}),
    ("40 mph (articulated)", {"maxspeed:conditional": "40 mph @ (articulated)"}),
    ("40 mph (trailer)", {"maxspeed:conditional": "40 mph @ (trailer)"}),
    ("40 mph (caravan)", {"maxspeed:conditional": "40 mph @ (caravan)"}),
    ("40 mph (wet)", {"maxspeed:conditional": "40 mph @ (wet)"}),
    ("40 mph (empty)", {"maxspeed:conditional": "40 mph @ (empty)"}),
    ("40 mph (6 axles)", {"maxspeed:conditional": "40 mph @ (axles>=6)"}),
    ("40 mph (12 seats)", {"maxspeed:conditional": "40 mph @ (seats>=12)"}),
    ("40 mph (2 trailers)", {"maxspeed:conditional": "40 mph @ (trailers>=2)"}),
    ("40 mph (2t)", {"maxspeed:conditional": "40 mph @ (weightrating>2)"}),
    ("40 mph (2.5t)", {"maxspeed:conditional": "40 mph @ (weightrating>2.5)"}),
    ("40 (current 2t)", {"maxspeed:conditional": "40 @ (weight>2)"}),
    ("40 (2t current)", {"maxspeed:conditional": "40 @ (weight>2)"}),
    ("40 (empty 2t)", {"maxspeed:conditional": "40 @ (emptyweight>2)"}),
    ("40 (2t empty)", {"maxspeed:conditional": "40 @ (emptyweight>2)"}),
    ("40 (capacity 2t)", {"maxspeed:conditional": "40 @ (weightcapacity>2)"}),
    ("40 (2t capacity)", {"maxspeed:conditional": "40 @ (weightcapacity>2)"}),
    ("40 mph (2000lb)", {"maxspeed:conditional": "40 mph @ (weightrating>2000 lb)"}),
    ("40 mph (2st)", {"maxspeed:conditional": "40 mph @ (weightrating>2 st)"}),
    ("40 mph (2.5st)", {"maxspeed:conditional": "40 mph @ (weightrating>2.5 st)"}),
    ("40 mph (current 2st)", {"maxspeed:conditional": "40 mph @ (weight>2 st)"}),
    ("40 mph (2st current)", {"maxspeed:conditional": "40 mph @ (weight>2 st)"}),
    ("40 mph (10m)", {"maxspeed:conditional": "40 mph @ (length>10)"}),
    ("40 mph (10ft)", {"maxspeed:conditional": "40 mph @ (length>10 ft)"}),
    # speed + conditionals
    (
        "60mph, 40 mph (2t)",
        {"maxspeed": "60 mph", "maxspeed:conditional": "40 mph @ (weightrating>2)"},
    ),
    # multiple restrictions on one conditional
    (
        "40 mph (2t, articulated)",
        {"maxspeed:conditional": "40 mph @ (weightrating>2 AND articulated)"},
    ),
    # multiple conditionals merge with '; '
    (
        "60mph, 40 mph (2t), 20mph (6 axles)",
        {
            "maxspeed": "60 mph",
            "maxspeed:conditional": "40 mph @ (weightrating>2); 20 mph @ (axles>=6)",
        },
    ),
    # time intervals
    ("40 mph (sunset-sunrise)", {"maxspeed:conditional": "40 mph @ (sunset-sunrise)"}),
    (
        "40 mph ((sunset+01:30)-(sunrise-01:30))",
        {"maxspeed:conditional": "40 mph @ ((sunset+01:30)-(sunrise-01:30))"},
    ),
    ("40 (Sep-Jun)", {"maxspeed:conditional": "40 @ (Sep-Jun)"}),
    ("40 (Sep-Jun Mo-Fr)", {"maxspeed:conditional": "40 @ (Sep-Jun Mo-Fr)"}),
    (
        "40 (Sep-Jun Mo-Fr 08:00-16:00)",
        {"maxspeed:conditional": "40 @ (Sep-Jun Mo-Fr 08:00-16:00)"},
    ),
    ("40 (08:00-16:00)", {"maxspeed:conditional": "40 @ (08:00-16:00)"}),
    ("40 (Mo-Fr)", {"maxspeed:conditional": "40 @ (Mo-Fr)"}),
    (
        "30 (Mo-Fr 08:00-17:00; PH,SH off)",
        {"maxspeed:conditional": "30 @ (Mo-Fr 08:00-17:00; PH,SH off)"},
    ),
    (
        "30 (Oct-May Sa,Su off)",
        {"maxspeed:conditional": "30 @ (Oct-May Sa,Su off)"},
    ),
    # advisory / min / prohibited
    ("advisory: 130", {"maxspeed:advisory": "130"}),
    ("min: 50", {"minspeed": "50"}),
    ("X", {"access": "no"}),
    # whitespace-separated number+unit (Lark ignores WS upstream)
    ("40 mph (3.5 t)", {"maxspeed:conditional": "40 mph @ (weightrating>3.5)"}),
    ("40 (10 m)", {"maxspeed:conditional": "40 @ (length>10)"}),
    ("40 (current 2 t)", {"maxspeed:conditional": "40 @ (weight>2)"}),
    ("40 (2 lt)", {"maxspeed:conditional": "40 @ (weightrating>2 lt)"}),
    # whitespace around span punctuation is insignificant (Lark
    # %ignore WS): a wiki edit adding spaces must parse identically
    ("100 (Mo-Fr, Sa 08:00-10:00)",
     {"maxspeed:conditional": "100 @ (Mo-Fr,Sa 08:00-10:00)"}),
    ("100 (Mo-Fr,Sa 08:00-10:00)",
     {"maxspeed:conditional": "100 @ (Mo-Fr,Sa 08:00-10:00)"}),
    ("100 (08:00 - 10:00)",
     {"maxspeed:conditional": "100 @ (08:00-10:00)"}),
    ("60 (Jan - Feb Mo - Fr off), 80",
     {"maxspeed:conditional": "60 @ (Jan-Feb Mo-Fr off)",
      "maxspeed": "80"}),
    ("30 ((sunset - 01:00)-(sunrise + 01:00))",
     {"maxspeed:conditional": "30 @ ((sunset-01:00)-(sunrise+01:00))"}),
    # junk
    ("junk", None),
    ("40 mph ((2t)", None),
    ("40 mph (2t))", None),
    ("40 mph (2u))", None),
]


@pytest.mark.parametrize("data,expected", GOLDENS)
def test_parse_speeds_goldens(data, expected):
    if expected is None:
        with pytest.raises(EtlParseError):
            parse_speeds(data)
    else:
        assert parse_speeds(data) == expected


# ----------------------------------------------------- rowspan / colspan

ROAD_TYPES_HTML = """
<table>
 <tr><th>Road type</th><th>Filter</th><th>Fuzzy filter</th><th>Relation filter</th></tr>
 <tr><td rowspan="2">motorway</td><td>highway=motorway</td><td></td><td></td></tr>
 <tr><td>highway=trunk and motorroad=yes</td><td></td><td></td></tr>
 <tr><td>urban<sup>[1]</sup></td><td>lit=yes</td><td>highway=residential</td><td></td></tr>
 <tr><td>state road</td><td></td><td></td><td colspan="1">network~".*"</td></tr>
</table>
"""


def test_parse_road_types_rowspan_and_junk_tags():
    table = parse_tables(ROAD_TYPES_HTML)[0]
    got = parse_road_types_table(table)
    # rowspan carry-over: second row re-reads 'motorway' at col 0 and
    # its filter cell lands at col 1 (last write wins per name)
    assert got["motorway"] == {"filter": "highway=trunk and motorroad=yes"}
    # <sup> footnote stripped from the name
    assert got["urban"] == {"filter": "lit=yes", "fuzzyFilter": "highway=residential"}
    assert got["state road"] == {"relationFilter": 'network~".*"'}


SPEEDS_HTML = """
<table>
 <tr><th>Country</th><th>Road type</th><th>(default)</th><th colspan="2">hgv</th></tr>
 <tr><th></th><th></th><th></th><th>hgv</th><th>bus</th></tr>
 <tr><td rowspan="2">Germany</td><td>motorway</td><td></td><td>80</td><td>80</td></tr>
 <tr><td></td><td>100, 50 (wet)</td><td>80</td><td>60 mph</td></tr>
 <tr><td>Atlantis</td><td>urban</td><td>50</td><td></td><td></td></tr>
 <tr><td>United States:North Dakota</td><td>rural</td><td>65 mph</td><td>nonsense()</td><td></td></tr>
</table>
"""


def test_parse_speed_table_order_vehicles_warnings():
    table = parse_tables(SPEEDS_HTML)[0]
    out = parse_speed_table(table)
    by_cc = out["speedLimitsByCountryCode"]

    de = by_cc["DE"]
    # wiki row order preserved (match priority)
    assert de[0] == {"name": "motorway", "tags": {"maxspeed:hgv": "80", "maxspeed:bus": "80"}}
    # rowspan country carry; fallback row has no name; vehicle rewrite
    # only outside '(default)'; second header row renamed col 4 to bus
    assert de[1]["tags"] == {
        "maxspeed": "100",
        "maxspeed:conditional": "50 @ (wet)",
        "maxspeed:hgv": "80",
        "maxspeed:bus": "60 mph",
    }
    assert "name" not in de[1]

    # subdivision resolution
    assert by_cc["US-ND"][0]["name"] == "rural"
    assert by_cc["US-ND"][0]["tags"] == {"maxspeed": "65 mph"}

    assert "Atlantis: Unknown country / subdivision" in out["warnings"]
    assert any("Unable to parse 'hgv' for 'rural'" in w for w in out["warnings"])


# ------------------------------------------------------ country + valid

def test_resolve_country_code():
    assert resolve_country_code("Germany") == "DE"
    assert resolve_country_code("Russia") == "RU"  # override
    assert resolve_country_code("Belgium:Flanders") == "BE-VLG"
    assert resolve_country_code("United States:North Dakota") == "US-ND"
    assert resolve_country_code("United States:Nowhere") is None
    assert resolve_country_code("Atlantis") is None
    # full ISO table entries (no pycountry in the container)
    assert resolve_country_code("Bahamas:New Providence") == "BS-NP"
    assert resolve_country_code("Micronesia:Chuuk") == "FM-TRK"
    assert resolve_country_code("Netherlands:Saba") == "NL-BQ2"
    assert resolve_country_code("Canada:Prince Edward Island") == "CA-PE"
    assert resolve_country_code("Australia:Queensland") == "AU-QLD"
    assert resolve_country_code("United Kingdom:Scotland") == "GB-SCT"
    assert resolve_country_code("Côte d'Ivoire") == "CI"
    assert resolve_country_code("Kosovo") == "XK"  # override (user-assigned)


@pytest.mark.parametrize(
    "data,expected",
    [
        ({"alley": {"filter": "highway=service"}}, []),
        ({"alley": {"filter": "{service}"}}, ["alley: Unable to map 'service'"]),
        (
            {"urban": {"filter": "{lit}"}, "lit": {"filter": "lit=yes"}},
            [],
        ),
        (
            {"urban": {"filter": "{lit} or {residential}"}, "lit": {"filter": "lit=yes"}},
            ["urban: Unable to map 'residential'"],
        ),
        (
            {"urban": {"filter": "{lit}"}, "rural": {"filter": "!{lit}"}},
            ["urban: Unable to map 'lit'", "rural: Unable to map 'lit'"],
        ),
    ],
)
def test_validate_road_types(data, expected):
    assert validate_road_types(data) == expected


@pytest.mark.parametrize(
    "speeds,road_types,expected",
    [
        ({"AA": [{}]}, {}, []),
        ({"AA": [{"name": "rural"}]}, {"rural": {"filter": "lit=no"}}, []),
        ({"AA": [{"name": "rural"}]}, {}, ["AA: Unable to map 'rural'"]),
        (
            {"AA": [{"name": "rural"}], "AB": [{"name": "urban"}]},
            {"rural": {"filter": "lit=no"}},
            ["AB: Unable to map 'urban'"],
        ),
    ],
)
def test_validate_names_in_speed_table(speeds, road_types, expected):
    assert validate_road_types_in_speed_table(speeds, road_types) == expected


# ------------------------------------------------- end-to-end + engine

def test_build_dataset_feeds_the_engine():
    """ETL output is directly consumable by the rule compiler + engine
    (the ETL's JSON shape IS the engine input contract)."""
    speeds = parse_tables(SPEEDS_HTML)[0]
    road_types = parse_tables(ROAD_TYPES_HTML)[0]
    ds = build_rules_dataset(speeds, road_types, meta={"source": "test"})
    assert set(ds) == {"meta", "roadTypesByName", "speedLimitsByCountryCode", "warnings"}
    s = to_json(ds)
    assert s.index('"meta"') < s.index('"roadTypesByName"')  # sorted keys

    from osm_legal_default_speeds_spark.plans.reference_engine import (
        LegalDefaultSpeedsEngine,
    )
    from osm_legal_default_speeds_spark.plans.rules_compiler import compile_ruleset
    from osm_legal_default_speeds_spark.plans.rules_model import (
        RoadTypeDef,
        RoadTypeFilterDef,
    )

    rt = {
        name: RoadTypeFilterDef(
            f.get("filter"), f.get("fuzzyFilter"), f.get("relationFilter")
        )
        for name, f in ds["roadTypesByName"].items()
    }
    rules = {
        cc: [RoadTypeDef(r.get("name"), r["tags"]) for r in lst]
        for cc, lst in ds["speedLimitsByCountryCode"].items()
    }
    engine = LegalDefaultSpeedsEngine(ruleset=compile_ruleset(rt, rules))
    # the rowspan'd second wiki row overwrote motorway's filter with
    # the trunk+motorroad form — query tags that match it
    res = engine.get_speed_limits("DE", {"highway": "trunk", "motorroad": "yes"})
    assert res is not None
    assert res.road_type_name == "motorway"
    assert res.tags["maxspeed:hgv"] == "80"


def test_fetch_and_etl_from_canned_api_response(tmp_path):
    """S2 end-to-end against a file:// canned MediaWiki API response:
    fetch -> no-break-space cleanup -> table scan -> full dataset with
    the reference's meta shape (main.py:23-44)."""
    import json as _json

    from osm_legal_default_speeds_spark.sources.wiki_etl import (
        etl_from_wiki,
        fetch_wiki_page,
    )

    # speed table first, road-types table second (wiki page layout);
    # include the &#160; junk the reference strips pre-parse
    html = SPEEDS_HTML.replace("Germany", "Germany&#160;") + ROAD_TYPES_HTML
    canned = {"parse": {"text": {"*": html}, "revid": 123456}}
    api = tmp_path / "api.json"
    api.write_text(_json.dumps(canned), encoding="utf-8")
    api_url = api.as_uri()

    got_html, revid = fetch_wiki_page(api_url=api_url)
    assert revid == "123456"
    assert "&#160;" not in got_html and " " not in got_html

    ds = etl_from_wiki(api_url=api_url, timestamp="2026-08-17T00:00:00+00:00")
    assert ds["meta"]["revisionId"] == "123456"
    assert ds["meta"]["source"].endswith("Default_speed_limits")
    assert ds["meta"]["timestamp"] == "2026-08-17T00:00:00+00:00"
    # the nbsp-polluted country cell still resolves ('Germany ' -> DE)
    assert "DE" in ds["speedLimitsByCountryCode"]
    assert ds["roadTypesByName"]["urban"]["filter"] == "lit=yes"


def test_iso3166_table_covers_all_alpha2_codes():
    """The name table must reach every ISO 3166-1 alpha-2 code, so a
    future wiki row naming ANY country resolves instead of warning
    (the reference resolves via pycountry, which is complete —
    parser/parsers/parse_utils.py:149-169). The full-dataset
    differential separately pins that resolution stays 242/242 exact
    on the names the page actually uses."""
    from osm_legal_default_speeds_spark.sources.iso3166 import (
        COUNTRY_ALPHA2,
    )

    all_alpha2 = set(
        "AD AE AF AG AI AL AM AO AQ AR AS AT AU AW AX AZ BA BB BD BE "
        "BF BG BH BI BJ BL BM BN BO BQ BR BS BT BV BW BY BZ CA CC CD "
        "CF CG CH CI CK CL CM CN CO CR CU CV CW CX CY CZ DE DJ DK DM "
        "DO DZ EC EE EG EH ER ES ET FI FJ FK FM FO FR GA GB GD GE GF "
        "GG GH GI GL GM GN GP GQ GR GS GT GU GW GY HK HM HN HR HT HU "
        "ID IE IL IM IN IO IQ IR IS IT JE JM JO JP KE KG KH KI KM KN "
        "KP KR KW KY KZ LA LB LC LI LK LR LS LT LU LV LY MA MC MD ME "
        "MF MG MH MK ML MM MN MO MP MQ MR MS MT MU MV MW MX MY MZ NA "
        "NC NE NF NG NI NL NO NP NR NU NZ OM PA PE PF PG PH PK PL PM "
        "PN PR PS PT PW PY QA RE RO RS RU RW SA SB SC SD SE SG SH SI "
        "SJ SK SL SM SN SO SR SS ST SV SX SY SZ TC TD TF TG TH TJ TK "
        "TL TM TN TO TR TT TV TW TZ UA UG UM US UY UZ VA VC VE VG VI "
        "VN VU WF WS YE YT ZA ZM ZW".split()
    )
    assert len(all_alpha2) == 249
    have = set(COUNTRY_ALPHA2.values())
    assert not (all_alpha2 - have), f"missing: {sorted(all_alpha2 - have)}"
    assert not (have - all_alpha2), f"bogus: {sorted(have - all_alpha2)}"


def test_parse_tables_survives_nested_table():
    """A table nested inside a <td> (the real wiki page carries
    infobox/legend tables around the two content tables) must parse as
    its own entry WITHOUT corrupting the host table: the host keeps
    its rows before AND after the nesting row, the nested cell text
    stays out of the host cell, and table order is document order of
    the <table> start tags (host first) — the same ordering
    soup.find_all('table') gives the reference parser."""
    html = (
        "<table>"
        "<tr><td>before</td></tr>"
        "<tr><td>host"
        "<table><tr><td>inner A</td></tr><tr><td>inner B</td></tr></table>"
        "</td><td>beside</td></tr>"
        "<tr><td>after</td></tr>"
        "</table>"
        "<table><tr><td>second top-level</td></tr></table>"
    )
    tables = parse_tables(html)
    assert len(tables) == 3
    host, inner, second = tables
    assert [[c.text() for c in row] for row in host] == [
        ["before"],
        ["host", "beside"],
        ["after"],
    ]
    assert [[c.text() for c in row] for row in inner] == [
        ["inner A"],
        ["inner B"],
    ]
    assert [[c.text() for c in row] for row in second] == [
        ["second top-level"]
    ]


def test_parse_tables_bare_void_img_does_not_swallow_cells():
    """HTML5 void <img> tags without a self-closing slash (what real
    MediaWiki emits for flag icons) never get an end-tag callback from
    html.parser: depth-tracking them left the skip counter stuck > 0
    and every subsequent cell parsed empty. <sup> text must still be
    skipped, and XHTML '<img/>' must stay harmless."""
    html = """
<table>
 <tr><th>Country</th><th>Rule</th></tr>
 <tr><td><img src="flag_de.png">Germany</td><td>100</td></tr>
 <tr><td><img src="flag_fr.png">France</td><td>80</td></tr>
 <tr><td><img src="x.png"/>Italy<sup>[1]</sup></td><td>90</td></tr>
</table>
"""
    table = parse_tables(html)[0]
    got = [["".join(c.chunks).strip() for c in row] for row in table]
    assert got == [
        ["Country", "Rule"],
        ["Germany", "100"],
        ["France", "80"],
        ["Italy", "90"],
    ]
