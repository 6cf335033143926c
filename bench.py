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
    """Force full execution of EVERY column; return row count.

    ``count()`` is wrong here: Catalyst prunes all columns a count
    doesn't need, so a projection-shaped query (e.g. the inference
    cascade, which adds columns but filters nothing) would be optimized
    down to scanning row ids and the expensive operator would never
    run. The noop sink materializes the full rows without writing; the
    row count rides along as an observation (single execution)."""
    from pyspark.sql import Observation

    obs = Observation()
    df.observe(obs, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()
    return obs.get["n"]


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

    def _real_cc_roads(spark, sf_dir):
        roads = _roads_df(spark, sf_dir)
        ccs = sorted(speed_limits.keys())
        cc = F.element_at(
            F.array(*[F.lit(c) for c in ccs]),
            (F.col("road_id") % len(ccs) + 1).cast("int"),
        )
        return roads.withColumn("country_code", cc)

    def q_inference_full(spark, sf_dir):
        """Broadcast-rules cascade over the full real dataset; roads get
        real country codes spread across all 242 rule countries."""
        out = infer_speed_limits(_real_cc_roads(spark, sf_dir), full_rules)
        return out.select(
            "road_id", F.col("speed_limit.certitude").alias("certitude")
        )

    def q_inference_dedup(spark, sf_dir):
        """Same cascade via the distinct -> infer -> join-back plan:
        Python/Arrow cost is O(distinct combos), not O(rows)."""
        out = infer_speed_limits(
            _real_cc_roads(spark, sf_dir), full_rules, dedup_inputs=True
        )
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
        "inference_dedup_plan": q_inference_dedup,
        "spatial_pipeline": q_spatial_pipeline,
        "tile_rollup": q_tile_rollup,
        "flagship_e2e": q_flagship,
    }
    # graft/training-data operators (import lazily so bench works even
    # if a module is mid-build)
    try:
        from osm_legal_default_speeds_spark.plans.driver_queries import QUERIES

        for name in (
            "exact_dedup",
            "ann_topk",
            "text_quality",
            "image_verify",
        ):
            if name in QUERIES:
                queries[name] = QUERIES[name]

        # production-mode MinHash (JVM xxhash64 signatures); the driver
        # contract's twin uses portable md5-string mode for the DuckDB
        # oracle, which is not the path we'd run at 100 TB
        from osm_legal_default_speeds_spark.operators.dedup import (
            minhash_dedup_pairs,
        )
        from osm_legal_default_speeds_spark.plans.trainingdata_queries import (
            _docs_near_aug,
        )

        def q_minhash_prod(spark, sf_dir):
            return minhash_dedup_pairs(
                _docs_near_aug(spark, sf_dir),
                num_hashes=64, num_bands=16, threshold=0.5, portable=False,
            )

        queries["minhash_near_dup"] = q_minhash_prod
    except Exception:
        pass

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        rows[name] = _run(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)
    return timings, rows


def scaling_job(spark: SparkSession, sf_dir: str, replicate: int) -> int:
    """The flagship spatial+inference pipeline over the roads input
    replicated ``replicate``x (row ids re-keyed so the work is genuinely
    per-row) — a CPU-bound fixed-size workload for the strong-scaling
    (N vs 4N cores) measurement demanded by BASELINE.json."""
    from osm_legal_default_speeds_spark.operators.inference import infer_speed_limits
    from osm_legal_default_speeds_spark.operators.spatial import (
        assign_tiles,
        knn_region_column,
        pip_region_column,
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

    roads = _roads_df(spark, sf_dir)
    rep = spark.range(replicate).select(F.col("id").alias("rep"))
    ncores = spark.sparkContext.defaultParallelism
    roads = (
        roads.crossJoin(rep)
        .withColumn("road_id", F.col("road_id") * replicate + F.col("rep"))
        .drop("rep")
        .withColumn(
            "lon", ((F.col("lon") + F.col("road_id") % 360) + 180.0) % 360.0 - 180.0
        )
        # the driver parquet is a single file: without an explicit
        # repartition both configs would be capped at the scan's few
        # input splits and the scaling measurement would be meaningless
        .repartition(ncores * 3)
    )
    lon, lat = F.col("lon"), F.col("lat")
    region = F.coalesce(
        pip_region_column(boundaries, lon, lat),
        knn_region_column(boundaries, lon, lat),
    )
    roads = assign_tiles(roads.withColumn("region_code", region), tile_res=7)
    out = infer_speed_limits(roads, full_rules, country_col="region_code")
    sel = out.select(
        "road_id", "region_code", "tile_id",
        F.col("speed_limit.certitude").alias("certitude"),
    )
    return _run(sel)


def run_scaling(sf_dir: str) -> None:
    """Run the fixed-size scaling job at local[8] and local[32] in
    clean subprocess JVMs; print one JSON line with throughput at both
    plus scaling efficiency, and write BENCH/BASELINE.md."""
    import subprocess

    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ)
        env.update(
            SPARK_GRAFT_SF_DIR=sf_dir,
            SPARK_GRAFT_CPUS=cpus,
            SPARK_GRAFT_REPLICATE=str(replicate),
        )
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-worker"],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)

    t8, t32 = results["8"]["wall_s"], results["32"]["wall_s"]
    rows = results["32"]["rows"]
    thr8, thr32 = rows / t8, rows / t32
    eff = (thr32 / thr8) / 4.0
    summary = {
        "metric": "strong-scaling efficiency local[8] -> local[32] "
        "(proxy for N -> 4N executors)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "rows": rows,
        "wall_s": {"local8": round(t8, 2), "local32": round(t32, 2)},
        "rows_per_sec": {"local8": round(thr8), "local32": round(thr32)},
        "sf_dir": sf_dir,
        "replicate": replicate,
    }
    print(json.dumps(summary))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH/BASELINE — measured numbers\n\n"
            "Strong-scaling measurement per BASELINE.json (sandbox proxy: no\n"
            "real cluster, so the same fixed-size job runs at `local[8]` and\n"
            "`local[32]` — N vs 4N cores — on the same input; scaling\n"
            "efficiency = (throughput_32 / throughput_8) / 4).\n\n"
            "Workload: flagship pipeline (grid encode -> PIP jurisdiction ->\n"
            "kNN fallback -> tile assignment -> full-ruleset [242 countries /\n"
            "1206 rules, broadcast] speed-limit inference cascade), input\n"
            f"roads replicated x{replicate}.\n\n"
            "| config | rows | wall s | rows/sec |\n"
            "|---|---|---|---|\n"
            f"| local[8] | {rows} | {t8:.2f} | {thr8:,.0f} |\n"
            f"| local[32] | {rows} | {t32:.2f} | {thr32:,.0f} |\n\n"
            f"**Scaling efficiency (8 -> 32 cores): {eff:.3f}**"
            f" (target >= 0.8)\n\n"
            f"Input: `{sf_dir}`. Reference publishes no numbers (SURVEY.md\n"
            "§6); these are the authoritative measured baselines.\n"
        )


def scaling_worker() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "8"))
    spark = make_spark(app="bench-scaling")
    try:
        spark.range(1000).select(F.sum("id")).collect()  # JVM warm-up
        t0 = time.perf_counter()
        n = scaling_job(spark, sf_dir, replicate)
        wall = time.perf_counter() - t0
    finally:
        spark.stop()
    print(json.dumps({"rows": n, "wall_s": wall}))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling-worker" in sys.argv:
        return scaling_worker()
    if "--scaling" in sys.argv:
        return run_scaling(sf_dir)
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
