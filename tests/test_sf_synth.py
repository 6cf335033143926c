"""Pins for the sf1 fixture synthesizer (plans/sf_synth.py): the
salted replication must scale ROWS by the copy count without changing
per-row work or collapsing the copies onto each other — otherwise the
exponents measured over the synthetic decade would not mean what
BENCH/BASELINE.md claims."""

import os

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.plans.sf_synth import (
    _COPY_OFFSET,
    synthesize_sf,
)

SRC = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SRC), reason="driver testdata missing"
)


@pytest.fixture(scope="module")
def synth_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth") / "sf0.003")
    return synthesize_sf(spark, SRC, out, copies=3)


def test_row_counts_scale_by_copies(spark, synth_dir):
    for t in ("orders", "documents", "embeddings"):
        src_n = spark.read.parquet(f"{SRC}/{t}.parquet").count()
        out_n = spark.read.parquet(f"{synth_dir}/{t}.parquet").count()
        assert out_n == 3 * src_n, t
    # non-replicated tables ride along via symlink
    assert spark.read.parquet(f"{synth_dir}/region.parquet").count() == \
        spark.read.parquet(f"{SRC}/region.parquet").count()


def test_ids_are_disjoint_across_copies(spark, synth_dir):
    for t, key in (
        ("orders", "o_orderkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        df = spark.read.parquet(f"{synth_dir}/{t}.parquet")
        assert df.select(key).distinct().count() == df.count(), t


def test_documents_token_count_preserved_and_copies_disjoint(
    spark, synth_dir
):
    """The per-copy rewrite renames tokens (same count per doc — the
    per-row tokenize work is scale-invariant) and makes copies share NO
    tokens (shared-gram groups grow in number, not size)."""
    d = spark.read.parquet(f"{synth_dir}/documents.parquet")
    toks = F.size(F.split(F.col("text"), " "))
    copy = (F.col("doc_id") / _COPY_OFFSET).cast("int")
    base = d.withColumn("c", copy).withColumn("n", toks)
    per_doc = base.groupBy(F.pmod(F.col("doc_id"), _COPY_OFFSET).alias("k")) \
        .agg(F.count_distinct("n").alias("variants"))
    assert per_doc.where("variants > 1").count() == 0
    vocab = base.select(
        "c", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    shared = (
        vocab.groupBy("tok")
        .agg(F.count_distinct("c").alias("ncopies"))
        .where("ncopies > 1")
    )
    assert shared.count() == 0


def test_embeddings_copies_shifted_not_stacked(spark, synth_dir):
    e = spark.read.parquet(f"{synth_dir}/embeddings.parquet")
    base = e.where(F.col("vec_id") == 0).head().embedding
    c1 = e.where(F.col("vec_id") == _COPY_OFFSET).head().embedding
    c2 = e.where(F.col("vec_id") == 2 * _COPY_OFFSET).head().embedding
    diffs1 = [j for j, (a, b) in enumerate(zip(base, c1)) if a != b]
    diffs2 = [j for j, (a, b) in enumerate(zip(base, c2)) if a != b]
    assert diffs1 == [1 % len(base)]
    assert diffs2 == [2 % len(base)]
    assert abs(c1[diffs1[0]] - base[diffs1[0]] - 0.5) < 1e-6
    assert abs(c2[diffs2[0]] - base[diffs2[0]] - 1.0) < 1e-6


def test_synthesis_is_idempotent(spark, synth_dir):
    marker = os.path.join(synth_dir, "_SYNTH_COMPLETE")
    before = os.path.getmtime(marker)
    assert synthesize_sf(spark, SRC, synth_dir, copies=3) == synth_dir
    assert os.path.getmtime(marker) == before


def test_oversized_source_keys_are_rejected(spark, tmp_path):
    """Keys at or above the copy offset would silently collide across
    copies; the synthesizer must refuse instead."""
    fake = tmp_path / "fake_src"
    fake.mkdir()
    for t in ("documents", "embeddings"):
        os.symlink(f"{SRC}/{t}.parquet", fake / f"{t}.parquet")
    spark.createDataFrame(
        [(2_000_000, 1, "O", 1.0)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double",
    ).write.parquet(str(fake / "orders.parquet"))
    with pytest.raises(ValueError, match="copy offset"):
        synthesize_sf(spark, str(fake), str(tmp_path / "out"), copies=2)


def test_rebuild_repoints_symlinks_to_new_src(spark, tmp_path):
    """A marker-mismatch rebuild must re-create the non-replicated
    symlinks against the NEW src_dir: a surviving link from the
    previous generation would silently mix two fixture generations in
    one synth dir (and a broken link would crash os.symlink with
    FileExistsError while os.path.exists claims it's absent)."""
    import shutil

    src_a = tmp_path / "src_a"
    src_b = tmp_path / "src_b"
    for d in (src_a, src_b):
        d.mkdir()
        for t in ("documents", "embeddings", "orders"):
            os.symlink(f"{SRC}/{t}.parquet", d / f"{t}.parquet")
    # distinct non-replicated table per generation
    spark.createDataFrame([(1, "A")], "r_regionkey long, r_name string") \
        .write.parquet(str(src_a / "region.parquet"))
    spark.createDataFrame([(2, "B")], "r_regionkey long, r_name string") \
        .write.parquet(str(src_b / "region.parquet"))

    out = str(tmp_path / "out")
    synthesize_sf(spark, str(src_a), out, copies=2)
    assert spark.read.parquet(f"{out}/region.parquet").collect()[0][1] == "A"

    # same out dir, different src -> marker mismatch -> full rebuild
    synthesize_sf(spark, str(src_b), out, copies=2)
    link = os.path.join(out, "region.parquet")
    assert os.path.islink(link)
    assert os.readlink(link) == str(src_b / "region.parquet")
    assert spark.read.parquet(f"{out}/region.parquet").collect()[0][1] == "B"

    # broken link survives a deleted previous src: rebuild still works
    shutil.rmtree(src_b / "region.parquet")
    synthesize_sf(spark, str(src_a), out, copies=2)
    assert spark.read.parquet(f"{out}/region.parquet").collect()[0][1] == "A"
