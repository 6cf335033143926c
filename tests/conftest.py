import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("osm-legal-default-speeds-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fall back from whole-stage codegen when the fused method would
        # exceed the JIT's 8000-bytecode compile limit (huge fused spans
        # execute in the bytecode interpreter, ~5x slower); split
        # per-expression codegen JITs fine — see plans/native_cascade.py
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # throughput collector: JDK17's default G1 measurably slows the
        # allocation-heavy codegen pipelines (see BENCH/BASELINE.md);
        # honored here because this process launches the JVM itself
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .getOrCreate()
    )
    yield spark
    spark.stop()
