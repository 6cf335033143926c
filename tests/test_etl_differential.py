"""Full-dataset ETL differential: render the reference's published
distribution JSON (242 countries / 1,206 rules / 172 road types) into
a wiki-shaped page, run the COMPLETE S2->S7 pipeline
(``etl_from_wiki`` over a canned file:// API response), and require
the output to reproduce the reference dataset exactly.

This is the strongest offline pin on the table scan (S3), both table
parsers (S4/S5), the full speed-cell grammar, country resolution (S6),
and the validation warnings — any semantic drift from the reference
parser would break the reproduction of its own published output.

Explained residuals (not failures): warnings of kind 'Unknown country'
and 'Unable to parse' are NOT reproducible from the JSON — they
describe wiki rows the reference parser itself dropped, whose content
never reached the dataset. The reproducible warning family ('Unable to
map', derived from the dataset's own names) must match exactly.
"""

import json
import os

import pytest

REF_JSON = "/root/reference/demo/distribution/legal_default_speeds.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_JSON), reason="reference dataset missing"
)


@pytest.fixture(scope="module")
def ref():
    with open(REF_JSON, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def etl_output(ref, tmp_path_factory):
    from osm_legal_default_speeds_spark.sources.wiki_etl import etl_from_wiki
    from osm_legal_default_speeds_spark.sources.wiki_render import (
        canned_api_response,
        render_wiki_page,
    )

    html = render_wiki_page(ref)
    canned = tmp_path_factory.mktemp("wiki") / "api.json"
    canned.write_text(
        canned_api_response(html, revid="9999"), encoding="utf-8"
    )
    return etl_from_wiki(
        api_url=canned.as_uri(), timestamp="2026-01-01T00:00:00+00:00"
    )


def test_all_countries_rule_exact(ref, etl_output):
    got = etl_output["speedLimitsByCountryCode"]
    want = ref["speedLimitsByCountryCode"]
    assert sorted(got) == sorted(want)
    mismatched = [cc for cc in want if got[cc] != want[cc]]
    # threshold: 100% country-exact agreement — the renderer verifies
    # per-rule round-trips, so any residual here would be a table-scan
    # or column-routing bug worth failing on
    assert mismatched == [], f"countries differing: {mismatched[:10]}"


def test_road_types_exact(ref, etl_output):
    assert etl_output["roadTypesByName"] == ref["roadTypesByName"]


def test_reproducible_warnings_match(ref, etl_output):
    reproducible = sorted(
        w for w in ref["warnings"] if "Unable to map" in w
    )
    got = sorted(w for w in etl_output["warnings"] if "Unable to map" in w)
    assert got == reproducible
    # and the non-reproducible families are the ONLY thing we dropped
    residual = [w for w in ref["warnings"] if "Unable to map" not in w]
    assert all(
        "Unknown country" in w or "Unable to parse" in w for w in residual
    )
    # the rendered page contains no junk rows, so no parse warnings
    assert not [
        w for w in etl_output["warnings"] if "Unable to map" not in w
    ]


def test_zero_unknown_countries_on_full_dataset(etl_output):
    """ISO table coverage: every display name the renderer emits (one
    per dataset code, incl. every subdivision family) resolves — no
    'Unknown country' warnings on the full 242-code page."""
    assert not [
        w for w in etl_output["warnings"] if "Unknown country" in w
    ]
