"""segment_cells / rasterize_segments / tile_pyramid tests: an
independent Python twin of the midpoint-cut supercover, geometric
invariants, and plan-shape pins."""

import math

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.operators.spatial import (
    grid_cell,
    grid_parent,
    rasterize_segments,
    segment_cells,
    tile_pyramid,
)


def _supercover_py(x0, y0, x1, y1, nx, ny):
    """Independent reference: identical midpoint-cut contract, plain
    Python floats (same IEEE ops, different code path)."""
    dx, dy = x1 - x0, y1 - y0
    ts = {0.0, 1.0}
    for a0, d in ((x0, dx), (y0, dy)):
        if d != 0:
            lo, hi = min(a0, a0 + d), max(a0, a0 + d)
            for k in range(math.ceil(lo), math.floor(hi) + 1):
                t = (k - a0) / d
                if 0 < t < 1:
                    ts.add(t)
    cuts = sorted(ts)
    out = []
    for a, b in zip(cuts, cuts[1:]):
        m = (a + b) / 2.0
        cx = min(max(math.floor(x0 + m * dx), 0), nx - 1)
        cy = min(max(math.floor(y0 + m * dy), 0), ny - 1)
        if (cx, cy) not in out:
            out.append((cx, cy))
    return out


SEGS = [
    (0, 0.2, 0.2, 5.7, 3.4),     # generic diagonal
    (1, 1.5, 2.5, 1.5, 2.5),     # degenerate point
    (2, 0.5, 0.5, 7.5, 0.5),     # horizontal
    (3, 3.5, 0.2, 3.5, 6.9),     # vertical
    (4, 0.0, 0.0, 4.0, 4.0),     # corner-exact diagonal (45 deg)
    (5, 2.0, 3.0, 6.0, 5.0),     # integer endpoints
    (6, 6.9, 5.9, 0.1, 0.1),     # reversed direction
    (7, 0.9, 0.1, 1.1, 6.8),     # steep
    (8, -2.0, -1.0, 9.5, 8.5),   # out-of-grid endpoints (clamped)
    (9, 3.25, 3.75, 3.8, 3.1),   # within one cell
]


def test_segment_cells_matches_python_twin(spark):
    nx = ny = 8
    df = spark.createDataFrame(
        SEGS, "seg_id long, x0 double, y0 double, x1 double, y1 double"
    )
    got = df.select(
        "seg_id",
        segment_cells(
            F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), nx, ny
        ).alias("cells"),
    ).collect()
    for r in got:
        want = _supercover_py(*SEGS[r.seg_id][1:], nx, ny)
        assert [(c.cx, c.cy) for c in r.cells] == want, r.seg_id


def test_segment_cells_invariants(spark):
    nx = ny = 8
    df = spark.createDataFrame(
        SEGS, "seg_id long, x0 double, y0 double, x1 double, y1 double"
    )
    rows = df.select(
        "seg_id", "x0", "y0", "x1", "y1",
        segment_cells(
            F.col("x0"), F.col("y0"), F.col("x1"), F.col("y1"), nx, ny
        ).alias("cells"),
    ).collect()
    clamp = lambda v, hi: min(max(math.floor(v), 0), hi - 1)
    for r in rows:
        cells = [(c.cx, c.cy) for c in r.cells]
        assert cells, r.seg_id
        # endpoint cells: exact when the endpoint is interior to a
        # cell; an endpoint ON a grid line/corner (or clamped from
        # outside the grid) legitimately stops in the adjacent cell —
        # the supercover contract is "cells the OPEN segment's
        # interior enters"
        for want, got in (
            ((clamp(r.x0, nx), clamp(r.y0, ny)), cells[0]),
            ((clamp(r.x1, nx), clamp(r.y1, ny)), cells[-1]),
        ):
            assert max(abs(want[0] - got[0]), abs(want[1] - got[1])) <= 1, (
                r.seg_id, want, got,
            )
        in_grid = all(0 <= v < 8 for v in (r.x0, r.y0, r.x1, r.y1))
        if in_grid:
            # traversal is connected: consecutive cells king-adjacent
            # (edge steps normally, diagonal only at corner-exact cuts)
            for (ax, ay), (bx, by) in zip(cells, cells[1:]):
                assert max(abs(ax - bx), abs(ay - by)) == 1, (r.seg_id, cells)
        assert len(set(cells)) == len(cells)


def test_rasterize_segments_no_shuffle(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 3.0, 2.0)],
        "seg_id long, lon0 double, lat0 double, lon1 double, lat1 double",
    )
    out = rasterize_segments(df, 5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() > 0


def test_tile_pyramid_level_consistency(spark):
    pts = [
        (float(((i * 73) % 360) - 180) + 0.01, float(((i * 37) % 170) - 85) + 0.01)
        for i in range(500)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    pyr = tile_pyramid(df, "lon", "lat", 3, 6)
    rows = pyr.collect()
    by_res = {}
    for r in rows:
        by_res.setdefault(r.res, {})[r.cell] = r.n_rows
    # every level partitions the input
    for res in range(3, 7):
        assert sum(by_res[res].values()) == len(pts)
    # children sum to their parent at every level step
    for res in range(4, 7):
        parents = {}
        rolled = (
            spark.createDataFrame(
                [(c, n) for c, n in by_res[res].items()], "cell long, n long"
            )
            .groupBy(grid_parent(F.col("cell"), res).alias("p"))
            .agg(F.sum("n").alias("n"))
            .collect()
        )
        for r in rolled:
            parents[r.p] = r.n
        assert parents == by_res[res - 1]


def test_tile_pyramid_single_exchange(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    plan = (
        tile_pyramid(df, "lon", "lat", 3, 6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1


def test_tile_pyramid_rejects_bad_range(spark):
    df = spark.createDataFrame([(0.0, 0.0)], "lon double, lat double")
    with pytest.raises(ValueError):
        tile_pyramid(df, "lon", "lat", 6, 3)
