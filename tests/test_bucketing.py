"""Bucketed-table co-located joins: writing both sides bucketed+sorted
on the join key lets Spark plan a sort-merge join with NO exchange on
either side — the pattern that replaces the per-query shuffle for
repeated big-big joins at 100 TB (e.g. payload re-attach by image_id
after wide metadata ops, SURVEY.md §7.3 hard-part 6)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver testdata missing"
)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from osm_legal_default_speeds_spark.plans.driver_queries import _roads_df

    roads = _roads_df(spark, SF_DIR)
    meta = roads.select("road_id", "lon", "lat")
    tags = roads.select("road_id", "tags")

    for name, df in (("bt_meta", meta), ("bt_tags", tags)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "road_id")
            .sortBy("road_id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )

    # disable auto-broadcast: these fixtures are tiny, but the pattern
    # under test is the big-big join where broadcast is impossible
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_meta").join(spark.table("bt_tags"), "road_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # co-located buckets: the join must not shuffle either side
        assert "Exchange hashpartitioning" not in plan, plan

        # and it still returns every row exactly once
        assert joined.count() == meta.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    for name in ("bt_meta", "bt_tags"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
