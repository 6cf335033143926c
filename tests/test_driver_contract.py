"""Replicates the driver's verify loop: every queries() entry at
sf0.01 must match its oracle_sql() twin in DuckDB — row count, schema
column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata missing"
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_to_set(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract (non-SQL-expressible op): must run and
        # produce a stable, non-empty result
        rows = q(spark, SF_DIR).collect()
        assert len(rows) > 0
        return

    sdf = q(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = _duck()
    # Type audit BEFORE value compare: a DECIMAL/HUGEINT oracle column
    # passes the Python value compare silently (Decimal('220.0') ==
    # 220.0 is True) but serializes differently in the external
    # driver's hash — exactly the r03 pack_sequences red row. Fail
    # loudly here so every oracle stays explicitly typed.
    rel = con.sql(sql)
    loose = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "DECIMAL" in str(t).upper() or "HUGEINT" in str(t).upper()
    ]
    assert not loose, (
        f"{name}: oracle columns must be explicitly typed "
        f"(DECIMAL/HUGEINT serialize version-sensitively): {loose}"
    )
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    s = _rows_to_set([tuple(r) for r in spark_rows], spark_cols)
    d = _rows_to_set(duck_rows, duck_cols)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


def test_driver_window_composition():
    """The correctness driver checks only the FIRST 50 queries()
    entries (insertion order). Pin the round-4 rotation: every
    operator family that had no driver row through round 3 (ANN,
    streaming, image codecs, round-3 spatial) must sit inside the
    window, so a registry edit cannot silently rotate it back out."""
    keys = list(entry_mod.queries())
    window = set(keys[:50])
    must_be_inside = {
        "pack_sequences",  # the r03 red row, fixed in round 4
        "ann_ivf_topk",
        # cascade_incremental replaced the rows-only ann_pq_topk slot:
        # a value-hash row over the incremental-inference path beats a
        # rows-only row the pytest contract already covers
        "cascade_incremental",
        "semantic_dedup",
        "events_rollup_streaming", "events_dedup_streaming",
        "events_tile_rollup_streaming",
        "event_asof_join", "window_attribution", "cms_counts",
        "image_verify", "image_features", "image_resize",
        "image_patches", "image_phash_near_dup", "curate_images",
        "audio_features", "video_frame_sample",
        "snap_segments", "tile_smooth",
        "polygon_overlay", "simplify_lines", "within_pairs_m",
        "segment_intersections", "vector_tiles", "clip_segments",
        "geohash_encode", "vector_tiles_clipped", "tile_build_e2e",
        # round-4 operators (first driver rows due in r04)
        "image_patch_containment", "image_verify_streaming",
        "quadkey_encode", "tile_hotspots",
        # late-round-4 operators, admitted by rotating out six
        # twice-green (r01+r02) entries: ann_topk, ann_lsh_topk,
        # embedding_near_dup, events_rollup, image_meta, knn_indexed
        "image_shard_assign", "multimodal_dup_classes",
        "image_caption_conflicts", "spatial_split",
        "geo_quota_sample", "aspect_buckets",
        # youngest round-4 operators, admitted by rotating out the
        # r02+r03-green engine twins and the rows-only IVF numpy twin
        "trajectory_stats", "speeding_legs", "tiles_incremental",
    }
    missing = sorted(must_be_inside - window)
    assert not missing, f"rotated out of the driver window: {missing}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {
        "road_id",
        "region_code",
        "tile_id",
        "road_type_name",
        "certitude",
        "result_tags",
    }
    # every row got a jurisdiction (PIP or kNN fallback)
    assert all(r["region_code"] is not None for r in rows)
