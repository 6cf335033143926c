"""Streaming tile maintenance: a changeset file stream keeps the
persistent tile table bit-identical to a full re-encode of whatever
corpus the applied diffs imply — including every INTERMEDIATE version
(lineage), and across a stream restart (checkpoint replay skips
committed versions; new diffs keep applying)."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.operators.spatial import (
    encode_vector_tiles,
)
from osm_legal_default_speeds_spark.streaming.tile_maintenance import (
    current_version,
    read_current_tiles,
    streaming_tile_maintenance,
)

RES = 6
SCHEMA = "seg_id long, lon0 double, lat0 double, lon1 double, lat1 double"


def _corpus(version: int) -> list[tuple]:
    """Deterministic corpus per version: v1 = base; each later version
    removes the sid % 7 == v stripe, adds a fresh sid range, and moves
    the sid % 5 == v stripe by a whole tile."""
    segs = {}
    for i in range(60):
        lon = -40.0 + (i * 37 % 80)
        lat = -30.0 + (i * 23 % 60)
        segs[i] = (i, lon, lat, lon + (i % 9 - 4) * 1.3, lat + (i % 7 - 3) * 0.8)
    for v in range(2, version + 1):
        for i in list(segs):
            if i % 7 == v:
                del segs[i]
            elif i in segs and i % 5 == v:
                s = segs[i]
                segs[i] = (i, s[1] + 4.0, s[2] - 3.0, s[3] + 4.0, s[4] - 3.0)
        for i in range(100 * v, 100 * v + 5):
            lon = -35.0 + (i % 70)
            lat = -25.0 + (i % 50)
            segs[i] = (i, lon, lat, lon + 2.0, lat + 1.0)
    return sorted(segs.values())


def _changeset(old: list[tuple], new: list[tuple]) -> list[tuple]:
    og = {s[0]: s for s in old}
    ng = {s[0]: s for s in new}
    rows = []
    for i, s in og.items():
        if ng.get(i) != s:
            rows.append(s + ("remove",))
    for i, s in ng.items():
        if og.get(i) != s:
            rows.append(s + ("upsert",))
    return rows


def _stage_changesets(spark, tmp_path, versions: range) -> str:
    """One single-parquet-file changeset per version step, mtime-ordered
    so the file stream batches them in sequence."""
    src = str(tmp_path / "changesets")
    os.makedirs(src, exist_ok=True)
    for v in versions:
        old = _corpus(v - 1) if v > 1 else []
        rows = _changeset(old, _corpus(v))
        d = str(tmp_path / f"cs_build_{v}")
        spark.createDataFrame(rows, SCHEMA + ", op string").coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        [part] = glob.glob(f"{d}/part-*.parquet")
        dst = f"{src}/f{v:03d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + v, 1_700_000_000 + v))
    return src


def _tiles_map(df):
    return {
        r["tile_id"]: (r["n_features"], r["byte_len"], bytes(r["tile_blob"]))
        for r in df.collect()
    }


def _full_build(spark, version: int):
    corpus = spark.createDataFrame(_corpus(version), SCHEMA)
    return _tiles_map(encode_vector_tiles(corpus, RES, clip=True))


def test_streaming_maintenance_matches_full_rebuild_per_version(
    spark, tmp_path
):
    src = _stage_changesets(spark, tmp_path, range(1, 4))
    store = str(tmp_path / "store")
    q = streaming_tile_maintenance(
        spark, src, str(tmp_path / "ck"), store, RES, clip=True
    )
    q.awaitTermination()
    assert current_version(store) == 2  # batch ids 0, 1, 2
    # final state == full rebuild of the final corpus, bit for bit
    assert _tiles_map(read_current_tiles(spark, store)) == _full_build(
        spark, 3
    )
    # lineage: every intermediate version is the full rebuild of ITS
    # corpus — a serving layer can pin any historical version
    for batch_id, version in ((0, 1), (1, 2)):
        got = _tiles_map(spark.read.parquet(f"{store}/v{batch_id}"))
        assert got == _full_build(spark, version), batch_id


def test_streaming_maintenance_restart_and_replay(spark, tmp_path):
    src = _stage_changesets(spark, tmp_path, range(1, 3))
    store = str(tmp_path / "store")
    ck = str(tmp_path / "ck")
    q = streaming_tile_maintenance(spark, src, ck, store, RES, clip=True)
    q.awaitTermination()
    assert current_version(store) == 1

    # restart with no new input: checkpoint replays nothing, the
    # committed pointer is untouched
    q = streaming_tile_maintenance(spark, src, ck, store, RES, clip=True)
    q.awaitTermination()
    assert current_version(store) == 1
    assert _tiles_map(read_current_tiles(spark, store)) == _full_build(
        spark, 2
    )

    # a new diff file lands; the restarted stream applies exactly it
    for v in range(3, 4):
        old = _corpus(v - 1)
        rows = _changeset(old, _corpus(v))
        d = str(tmp_path / f"cs_late_{v}")
        spark.createDataFrame(rows, SCHEMA + ", op string").coalesce(
            1
        ).write.mode("overwrite").parquet(d)
        [part] = glob.glob(f"{d}/part-*.parquet")
        dst = f"{src}/f{v:03d}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (1_700_000_000 + v, 1_700_000_000 + v))
    q = streaming_tile_maintenance(spark, src, ck, store, RES, clip=True)
    q.awaitTermination()
    assert current_version(store) == 2
    assert _tiles_map(read_current_tiles(spark, store)) == _full_build(
        spark, 3
    )


def test_changeset_fixture_exercises_all_kinds(spark):
    """The evolution really contains removes, adds, and moves at every
    step (guards the fixture against silently degenerating)."""
    for v in (2, 3):
        rows = _changeset(_corpus(v - 1), _corpus(v))
        rm = {r[0] for r in rows if r[-1] == "remove"}
        up = {r[0] for r in rows if r[-1] == "upsert"}
        assert rm - up and up - rm and rm & up, v
