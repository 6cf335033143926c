#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>, "rows": {...}}

Headline set = the flagship spatial+inference pipeline (full real rule
dataset, 242 countries / 1206 rules, broadcast) plus one query per
operator family that dominates cost at scale. Each query is forced to
execute with a count()-style action that cannot be optimized away
(noop write for wide results).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F


def make_spark(app: str = "bench", cpus: str | None = None) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _run(df) -> int:
    """Force full execution; return row count."""
    return df.count()


def bench_queries(spark: SparkSession, sf_dir: str) -> tuple[dict, dict]:
    from osm_legal_default_speeds_spark.operators.inference import infer_speed_limits
    from osm_legal_default_speeds_spark.operators.spatial import (
        assign_tiles,
        knn_region_column,
        pip_region_column,
        tile_rollup,
    )
    from osm_legal_default_speeds_spark.plans.driver_queries import (
        _roads_df,
        synth_boundaries,
    )
    from osm_legal_default_speeds_spark.plans.rules_compiler import compile_ruleset
    from osm_legal_default_speeds_spark.sources.rules_json import (
        REFERENCE_DATASET_PATH,
        load_rules_json,
    )

    _, road_types, speed_limits, _ = load_rules_json(REFERENCE_DATASET_PATH)
    full_rules = compile_ruleset(road_types, speed_limits)
    boundaries = synth_boundaries()

    def q_inference_full(spark, sf_dir):
        """Broadcast-rules cascade over the full real dataset; roads get
        real country codes spread across all 242 rule countries."""
        roads = _roads_df(spark, sf_dir)
        ccs = sorted(speed_limits.keys())
        cc = F.element_at(
            F.array(*[F.lit(c) for c in ccs]),
            (F.col("road_id") % len(ccs) + 1).cast("int"),
        )
        roads = roads.withColumn("country_code", cc)
        out = infer_speed_limits(roads, full_rules)
        return out.select(
            "road_id", F.col("speed_limit.certitude").alias("certitude")
        )

    def q_spatial_pipeline(spark, sf_dir):
        """Grid encode -> PIP -> kNN fallback -> tile assignment."""
        roads = _roads_df(spark, sf_dir).select("road_id", "lon", "lat")
        lon, lat = F.col("lon"), F.col("lat")
        region = F.coalesce(
            pip_region_column(boundaries, lon, lat),
            knn_region_column(boundaries, lon, lat),
        )
        return assign_tiles(roads.withColumn("region_code", region), tile_res=7)

    def q_tile_rollup(spark, sf_dir):
        roads = _roads_df(spark, sf_dir).select("road_id", "lon", "lat")
        return tile_rollup(assign_tiles(roads, tile_res=7), salt_buckets=16)

    def q_flagship(spark, sf_dir):
        """End-to-end: spatial jurisdiction + inference + tiling."""
        roads = _roads_df(spark, sf_dir)
        lon, lat = F.col("lon"), F.col("lat")
        region = F.coalesce(
            pip_region_column(boundaries, lon, lat),
            knn_region_column(boundaries, lon, lat),
        )
        roads = assign_tiles(roads.withColumn("region_code", region), tile_res=7)
        out = infer_speed_limits(
            roads, full_rules, country_col="region_code"
        )
        return out.select(
            "road_id",
            "region_code",
            "tile_id",
            F.col("speed_limit.certitude").alias("certitude"),
        )

    queries = {
        "inference_full_rules": q_inference_full,
        "spatial_pipeline": q_spatial_pipeline,
        "tile_rollup": q_tile_rollup,
        "flagship_e2e": q_flagship,
    }
    # graft/training-data operators (import lazily so bench works even
    # if a module is mid-build)
    try:
        from osm_legal_default_speeds_spark.plans.driver_queries import QUERIES

        for name in (
            "dedup_minhash",
            "dedup_exact",
            "ann_topk",
            "text_quality",
            "image_pipeline",
        ):
            if name in QUERIES:
                queries[name] = QUERIES[name]
    except Exception:
        pass

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        rows[name] = _run(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings, rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = make_spark()
    try:
        # warm the JVM/Arrow path once so timings measure steady state
        spark.range(1000).select(F.sum("id")).collect()
        timings, rows = bench_queries(spark, sf_dir)
    finally:
        spark.stop()
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total wall-clock of headline queries (spatial join + "
                "full-ruleset inference + tiling + training-data ops)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
