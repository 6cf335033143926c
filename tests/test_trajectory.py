"""Trajectory operators: leg construction, rollup determinism, and
jurisdiction-aware speeding semantics (operators/trajectory.py).

The cross-engine value contract (integer-only surfaces, identical
haversine expression) is pinned by the registry-wide driver-contract
test; these tests pin the SEMANTICS the oracle can't distinguish:
tie-break pairing, zero-duration legs, partition invariance of the
integer rollup, and the boundary/limit edge rules.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.operators.spatial import RectBoundary
from osm_legal_default_speeds_spark.operators.trajectory import (
    speeding_legs,
    trajectory_legs,
    trajectory_stats,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def pings(spark):
    # user 1: a 3-ping walk with a duplicate timestamp on the last leg
    # (ids 12/13 tie on ts -> id order pairs them deterministically);
    # user 2: a single ping (no legs).
    rows = [
        (10, 1, _ts("2024-01-01T00:00:00"), 10.0, 50.0),
        (11, 1, _ts("2024-01-01T01:00:00"), 11.0, 50.0),
        (13, 1, _ts("2024-01-01T02:00:00"), 11.0, 51.0),
        (12, 1, _ts("2024-01-01T02:00:00"), 12.0, 51.0),
        (20, 2, _ts("2024-01-01T00:00:00"), 0.0, 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )


def test_legs_pairing_and_zero_duration(pings):
    legs = trajectory_legs(pings).orderBy("id1").collect()
    # 3 legs for user 1, none for user 2
    assert [(r.id0, r.id1) for r in legs] == [(10, 11), (11, 12), (12, 13)]
    by_pair = {(r.id0, r.id1): r for r in legs}
    # ts tie on (12, 13): id tiebreak orders 12 before 13, dt == 0,
    # speed NULL (never infinity), distance still real (1 degree lon)
    tie = by_pair[(12, 13)]
    assert tie.dt_us == 0 and tie.speed_kmh is None and tie.dist_m > 0
    # 1 degree of longitude at lat 50 is ~71.7 km; over an hour
    leg1 = by_pair[(10, 11)]
    assert leg1.dt_us == 3_600_000_000
    assert 70_000 < leg1.dist_m < 73_000
    assert 70 < leg1.speed_kmh < 73


def test_stats_partition_invariance(pings):
    """The rollup sums per-leg floored INTEGER meters, so any
    repartitioning of the input yields bit-identical rows (a double
    sum would depend on merge order)."""
    a = {r.user: r.asDict() for r in trajectory_stats(pings).collect()}
    b = {
        r.user: r.asDict()
        for r in trajectory_stats(pings.repartition(7, "event_id")).collect()
    }
    assert a == b
    assert a[1]["n_legs"] == 3
    # zero-duration leg contributes distance but no speed sample
    assert a[1]["total_m"] > 140_000
    assert a[1]["max_kmh_floor"] >= 70
    assert 2 not in a  # single ping -> no legs -> no row


def test_speeding_legs_limit_and_boundary_rules(spark):
    bounds = [RectBoundary("AA", 0.0, 0.0, 10.0, 10.0, priority=1)]
    limits = {"AA": 80}
    rows = [
        # fast leg ending inside AA (~79 km in 30 min = ~158 km/h)
        (1, 1, _ts("2024-01-01T00:00:00"), 5.0, 4.0),
        (2, 1, _ts("2024-01-01T00:30:00"), 5.0, 4.714),
        # slow leg ending inside AA (~7.9 km in 1 h)
        (3, 2, _ts("2024-01-01T00:00:00"), 5.0, 4.0),
        (4, 2, _ts("2024-01-01T01:00:00"), 5.0, 4.0714),
        # fast leg ending OUTSIDE every boundary -> no verdict
        (5, 3, _ts("2024-01-01T00:00:00"), 50.0, 40.0),
        (6, 3, _ts("2024-01-01T00:30:00"), 50.0, 40.714),
    ]
    pings = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )
    out = speeding_legs(pings, bounds, limits).collect()
    assert [(r.user, r.id0, r.id1, r.region_code, r.limit_kmh) for r in out] == [
        (1, 1, 2, "AA", 80)
    ]
    assert 150 <= out[0].speed_kmh_floor <= 165


def test_speeding_subdivision_priority(spark):
    """A leg ending inside a higher-priority subdivision rectangle gets
    the subdivision's limit, mirroring the engine's min-priority PIP."""
    bounds = [
        RectBoundary("US", 0.0, 0.0, 30.0, 30.0, priority=2),
        RectBoundary("US-ND", 10.0, 10.0, 20.0, 20.0, priority=1),
    ]
    limits = {"US": 50, "US-ND": 200}
    rows = [
        # ~111 km in 1 h ending at (15, 15): inside US-ND (limit 200,
        # not speeding) even though the US rectangle (limit 50) also
        # contains it
        (1, 1, _ts("2024-01-01T00:00:00"), 15.0, 14.0),
        (2, 1, _ts("2024-01-01T01:00:00"), 15.0, 15.0),
        # same speed ending at (25, 25): US only -> speeding
        (3, 2, _ts("2024-01-01T00:00:00"), 25.0, 24.0),
        (4, 2, _ts("2024-01-01T01:00:00"), 25.0, 25.0),
    ]
    pings = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    )
    out = speeding_legs(pings, bounds, limits).collect()
    assert [(r.user, r.region_code, r.limit_kmh) for r in out] == [(2, "US", 50)]


def test_legs_single_exchange(pings):
    """Window + same-key groupBy plan shape: exactly ONE row-bearing
    exchange (the user-key shuffle); the stats aggregation reuses the
    window's partitioning instead of adding a second."""
    plan = trajectory_stats(pings)._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = [
        ln for ln in plan.splitlines() if re.search(r"Exchange hashpartitioning", ln)
    ]
    assert len(exchanges) == 1, plan


def test_streaming_speeding_matches_batch(spark, tmp_path):
    """Streaming legs pair across MICRO-BATCH boundaries (one file per
    trigger) and must equal the batch speeding verdicts bit-exactly:
    the stateful kernel only pairs; haversine/speed/PIP run in the
    same shared Column pipeline in both modes."""
    import os

    from osm_legal_default_speeds_spark.streaming.trajectory_stream import (
        streaming_speeding_legs,
    )

    bounds = [
        RectBoundary("AA", 0.0, 0.0, 10.0, 10.0, priority=2),
        RectBoundary("AA-X", 4.0, 4.0, 6.0, 6.0, priority=1),
    ]
    limits = {"AA": 80, "AA-X": 300}
    schema = "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    # user 1 speeds in AA, crosses into the permissive AA-X subdivision,
    # then slows; user 2 stays slow. The (2 -> 3) and (3 -> 4) legs
    # straddle the file boundary, so they exist ONLY if state carries.
    batch_a = [
        (1, 1, _ts("2024-01-01T00:00:00"), 2.0, 1.0),
        (2, 1, _ts("2024-01-01T00:30:00"), 2.0, 1.8),   # ~178 km/h in AA
        (3, 2, _ts("2024-01-01T00:00:00"), 8.0, 8.0),
    ]
    batch_b = [
        (4, 1, _ts("2024-01-01T01:00:00"), 5.0, 4.5),   # fast, ends in AA-X (limit 300)
        (5, 1, _ts("2024-01-01T02:00:00"), 5.0, 5.5),   # ~111 km/h, AA-X: not speeding
        (6, 2, _ts("2024-01-01T01:00:00"), 8.0, 8.05),  # ~5.6 km/h: not speeding
        (7, 2, _ts("2024-01-01T02:00:00"), 8.0, 9.0),   # ~105 km/h in AA: speeding
    ]
    all_pings = spark.createDataFrame(batch_a + batch_b, schema)
    expected = sorted(
        (r.user, r.id0, r.id1, r.region_code, r.limit_kmh, r.speed_kmh_floor)
        for r in speeding_legs(all_pings, bounds, limits).collect()
    )
    keys = [(u, a, b, rc, lk) for (u, a, b, rc, lk, _) in expected]
    # a CROSS-FILE leg (2 -> 4) must be among the batch verdicts so the
    # streaming equality below proves state carry-over, plus an
    # in-batch verdict for user 2
    assert (1, 2, 4, "AA-X", 300) in keys
    assert (2, 6, 7, "AA", 80) in keys

    src = str(tmp_path / "pings")
    os.makedirs(src)
    for i, data in enumerate([batch_a, batch_b]):
        (
            spark.createDataFrame(data, schema)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{src}_stage{i}")
        )
    import glob
    import shutil

    import time

    now = time.time()
    for i, f in enumerate(
        sorted(glob.glob(f"{src}_stage*/part-*.parquet"))
    ):
        dst = f"{src}/f{i}.parquet"
        shutil.copy(f, dst)
        # the file source drains oldest-mtime first; pin explicit
        # mtimes so micro-batch order == event-time order (the
        # operator's documented ordering contract)
        os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))

    got_df = streaming_speeding_legs(
        spark,
        src,
        str(tmp_path / "ckpt"),
        bounds,
        limits,
        sink_table="t_stream_speeding",
        max_files_per_trigger=1,
    )
    got = sorted(
        (r.user, r.id0, r.id1, r.region_code, r.limit_kmh, r.speed_kmh_floor)
        for r in got_df.collect()
    )
    assert got == expected and len(got) >= 2


def test_null_id_predecessor_still_produces_leg(spark):
    """A ping whose PREDECESSOR carries a NULL event_id must still
    produce its leg (the partition-start sentinel is a lag marker, not
    lag(id)): coordinates and timestamps are the data, the id is
    bookkeeping."""
    from osm_legal_default_speeds_spark.operators.trajectory import (
        trajectory_legs,
        trajectory_stats,
    )

    rows = [
        (None, 9, _ts("2024-01-01T00:00:00"), 10.0, 50.0),
        (91, 9, _ts("2024-01-01T01:00:00"), 11.0, 50.0),
        (92, 9, _ts("2024-01-01T02:00:00"), 12.0, 50.0),
    ]
    pings = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp_ntz, lon double, lat double",
    )
    legs = trajectory_legs(pings).collect()
    assert len(legs) == 2  # NULL-id ping -> 91, then 91 -> 92
    assert {(r["id0"], r["id1"]) for r in legs} == {(None, 91), (91, 92)}
    assert trajectory_stats(pings).collect()[0]["n_legs"] == 2


def test_ts_tie_with_null_id_orders_identically_cross_engine(spark):
    """Window order is pinned NULLS FIRST on both engines: Spark's ASC
    default is nulls-first but DuckDB's is nulls-last, so a same-user
    same-ts tie between a NULL and a non-NULL event_id would pair legs
    differently if either side used its default. The NULL-id ping must
    sort FIRST (Spark semantics, now explicit in the oracle too)."""
    import duckdb
    import pandas as pd

    from osm_legal_default_speeds_spark.operators.trajectory import (
        trajectory_legs,
    )

    rows = [
        ("u1", None, 1_000_000, 10.0, 50.0),
        ("u1", 5, 1_000_000, 11.0, 50.0),   # ts tie with the NULL id
        ("u1", 7, 2_000_000, 12.0, 50.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts long, lon double, lat double"
    )
    legs = trajectory_legs(
        df, user_col="user_id", ts_col="ts", lon_col="lon",
        lat_col="lat", id_col="event_id",
    ).select("id0", "id1").collect()
    got = sorted(
        ((r["id0"], r["id1"]) for r in legs),
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert got == [(None, 5), (5, 7)]

    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "ts", "lon", "lat"])
    con = duckdb.connect()
    con.register("pings", pdf)
    oracle = con.execute("""
        SELECT id0, id1 FROM (
          SELECT lag(event_id) OVER w AS id0, event_id AS id1,
                 lag(1) OVER w AS has_prev
          FROM pings
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
        ) WHERE has_prev IS NOT NULL
    """).fetchall()
    assert sorted(oracle, key=lambda t: (t[0] is not None, t[0] or 0)) == [
        (None, 5), (5, 7),
    ]


def test_streaming_null_id_ping_matches_batch(spark, tmp_path):
    """A NULL event_id ping must flow through the STREAMING kernel too
    (a bigint column with nulls reaches the pandas kernel as float64
    NaN — the old int() cast crashed the task) and sort NULLS FIRST on
    a ts tie, exactly like the batch window's pinned order."""
    import glob
    import os
    import shutil
    import time

    from osm_legal_default_speeds_spark.streaming.trajectory_stream import (
        streaming_speeding_legs,
    )

    bounds = [RectBoundary("AA", 0.0, 0.0, 10.0, 10.0, priority=1)]
    limits = {"AA": 80}
    schema = "event_id long, user_id long, ts timestamp_ntz, lon double, lat double"
    batch_a = [
        (None, 1, _ts("2024-01-01T00:00:00"), 2.0, 1.0),   # null id...
        (2, 1, _ts("2024-01-01T00:00:00"), 2.0, 1.2),      # ...ts TIE
    ]
    batch_b = [
        (3, 1, _ts("2024-01-01T01:00:00"), 2.0, 2.5),      # fast leg
    ]
    all_pings = spark.createDataFrame(batch_a + batch_b, schema)
    key = lambda t: tuple((v is not None, v or 0) for v in t)  # noqa: E731
    expected = sorted(
        (
            (r.user, r.id0, r.id1, r.region_code, r.limit_kmh, r.speed_kmh_floor)
            for r in speeding_legs(all_pings, bounds, limits).collect()
        ),
        key=key,
    )
    # the null-id ping sorts FIRST on the tie, so the legs are
    # (None -> 2) [zero-duration: speed NULL, filtered from verdicts]
    # and (2 -> 3) [the speeding one]. Nulls-LAST ordering would
    # instead pair (2 -> None), (None -> 3) and the verdict would read
    # (None, 3) — so the exact (2, 3) id pair pins the order.
    assert [(a, b) for (_, a, b, *_r) in expected] == [(2, 3)]

    src = str(tmp_path / "pings")
    os.makedirs(src)
    for i, data in enumerate([batch_a, batch_b]):
        (
            spark.createDataFrame(data, schema)
            .coalesce(1).write.mode("overwrite")
            .parquet(f"{src}_stage{i}")
        )
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{src}_stage*/part-*.parquet"))):
        dst = f"{src}/f{i}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (now - 600 + i * 60, now - 600 + i * 60))

    got_df = streaming_speeding_legs(
        spark, src, str(tmp_path / "ckpt"), bounds, limits,
        sink_table="t_stream_nullid", max_files_per_trigger=1,
    )
    got = sorted(
        (
            (r.user, r.id0, r.id1, r.region_code, r.limit_kmh, r.speed_kmh_floor)
            for r in got_df.collect()
        ),
        key=key,
    )
    assert got == expected
