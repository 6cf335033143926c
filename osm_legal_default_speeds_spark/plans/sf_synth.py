"""Deterministic sf1 synthesis: a 10x replication of the sf0.1 fixture
tables that extends the rows-scaling ladder one decade past the largest
driver-generated scale factor (TESTDATA.md stops at sf0.1), with no
external data.

Each copy is SALTED so replication does not create a pathological
distribution the real tables don't have:

- ``orders``: key offset per copy. Every geometry fixture derives
  lon/lat and tag mixes arithmetically from ``o_orderkey``
  (driver_queries._roads_df), so offset keys yield NEW deterministic
  positions with the same spatial spread — not 10 stacked copies of
  the same map.
- ``documents``: every whitespace-delimited token gets a per-copy
  suffix (``$1q{i}`` regexp rewrite). Token COUNT is unchanged (the
  per-doc work of tokenize/shingle pipelines stays constant per row),
  within-copy duplicate structure is preserved exactly (the rewrite is
  a bijective token renaming), and cross-copy shingles are disjoint —
  so the shared-gram groups of cross_doc_spans grow in NUMBER, not in
  SIZE, exactly how a 10x-bigger real corpus behaves.
- ``embeddings``: id offset per copy plus a copy-dependent shift on
  one coordinate (dimension ``copy % d``), moving each copy into its
  own cosine region — cluster populations grow with corpus size
  instead of every copy collapsing onto the sf0.1 points.

Remaining tables are symlinked from the source directory: the scaling
queries (bench.SF_SCALING_QUERIES) read only orders / documents /
embeddings, and a symlink keeps any incidental lookup working.

Copy 0 is the identity, so sf1 strictly contains sf0.1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# distinct id namespaces per copy; far above sf0.1 key ranges (orders
# max 149,999) and the fixture augmentations (+10000 vec_id dups,
# +100000 near-dup doc_ids) so no synthetic id collides with either
_COPY_OFFSET = 1_000_000

REPLICATED = ("orders", "documents", "embeddings")


def _orders_copy(o: DataFrame, i: int) -> DataFrame:
    return o.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * _COPY_OFFSET)
    )


def _documents_copy(d: DataFrame, i: int) -> DataFrame:
    if i == 0:
        return d
    # stage the rewritten text as a COLUMN before taking its length:
    # Catalyst does not CSE duplicated subtrees, so an inline reuse
    # would run the full-document \S+ regexp twice per row — the
    # dominant cost of synthesis across all salted copies
    text = F.regexp_replace(F.col("text"), r"(\S+)", f"$1q{i}")
    return (
        d.withColumn("__text", text)
        .select(
            (F.col("doc_id") + F.lit(i * _COPY_OFFSET)).alias("doc_id"),
            F.col("__text").alias("text"),
            "lang",
            "source",
            F.length(F.col("__text")).alias("n_chars"),
        )
    )


def _embeddings_copy(e: DataFrame, i: int, dim: int) -> DataFrame:
    if i == 0:
        return e
    j = i % dim
    vec = F.transform(
        F.col("embedding"),
        lambda x, k: F.when(k == F.lit(j), x + F.lit(float(i) * 0.5))
        .otherwise(x)
        .cast("float"),
    )
    return e.select(
        (F.col("vec_id") + F.lit(i * _COPY_OFFSET)).alias("vec_id"),
        vec.alias("embedding"),
        "label",
    )


def _marker_line(copies: int, src_dir: str) -> str:
    """Completeness-marker content: the request (copies, src) plus a
    fingerprint of the replicated source files (size + mtime), so a
    regenerated fixture invalidates stale synth output."""
    parts = []
    for table in sorted(REPLICATED):
        path = os.path.join(src_dir, f"{table}.parquet")
        try:
            st = os.stat(path)
            parts.append(f"{table}:{st.st_size}:{int(st.st_mtime)}")
        except OSError:
            parts.append(f"{table}:missing")
    return f"copies={copies} src={src_dir} fp={','.join(parts)}"


def synthesize_sf(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    copies: int = 10,
    force: bool = False,
) -> str:
    """Materialize the replicated scale directory (idempotent: reuses
    an existing complete output unless ``force``). Returns ``out_dir``.
    The directory name should end in the target scale factor (e.g.
    ``.../sf1``) so bench.run_sf_scaling can parse it."""
    marker = os.path.join(out_dir, "_SYNTH_COMPLETE")
    if os.path.exists(marker):
        # reuse ONLY when the marker records the same request: a
        # leftover /tmp directory built from an older fixture
        # generation or a different copy count must rebuild, not
        # silently feed a scaling exponent
        with open(marker) as fh:
            recorded = fh.read().strip()
        if recorded == _marker_line(copies, src_dir) and not force:
            return out_dir
        # drop the stale/mismatched marker FIRST: a crash mid-rebuild
        # must not leave a completeness claim over partially
        # rewritten tables
        os.remove(marker)
    os.makedirs(out_dir, exist_ok=True)

    o = spark.read.parquet(f"{src_dir}/orders.parquet")
    d = spark.read.parquet(f"{src_dir}/documents.parquet")
    e = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    dim = len(e.select("embedding").head()[0])
    # copy namespaces must not collide: the offset bounds EVERY
    # replicated table's key range (true for every driver-generated
    # scale; a larger source needs a larger offset, not silent id
    # collisions that merge shingle/cluster structure across copies)
    for table, df, k in (
        ("orders", o, "o_orderkey"),
        ("documents", d, "doc_id"),
        ("embeddings", e, "vec_id"),
    ):
        max_key = df.agg(F.max(k)).head()[0]
        if max_key >= _COPY_OFFSET:
            raise ValueError(
                f"{table}.{k} reaches {max_key} >= copy offset "
                f"{_COPY_OFFSET}; raise _COPY_OFFSET before "
                f"replicating this source"
            )

    builders = {
        "orders": lambda i: _orders_copy(o, i),
        "documents": lambda i: _documents_copy(d, i),
        "embeddings": lambda i: _embeddings_copy(e, i, dim),
    }
    for table, build in builders.items():
        full = build(0)
        for i in range(1, copies):
            full = full.unionByName(build(i))
        full.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )

    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".parquet"):
            continue
        if name.rsplit(".", 1)[0] in REPLICATED:
            continue
        dst = os.path.join(out_dir, name)
        # lexists + remove, not an exists guard: after a marker
        # mismatch this is a REBUILD — a surviving symlink still points
        # at the PREVIOUS src_dir (silently mixing two fixture
        # generations), and a broken one (old src deleted) would make
        # os.symlink raise FileExistsError while os.path.exists says
        # there is nothing there
        if os.path.lexists(dst):
            os.remove(dst)
        os.symlink(os.path.join(src_dir, name), dst)

    with open(marker, "w") as fh:
        fh.write(_marker_line(copies, src_dir) + "\n")
    return out_dir
