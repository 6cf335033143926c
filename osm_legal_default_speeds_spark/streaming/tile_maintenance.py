"""Streaming tile maintenance: continuous segment-changeset ingestion
keeping a persistent vector-tile table current — the Structured
Streaming twin of ``operators/spatial.py::rebuild_changed_tiles`` and
the production shape for continuous OSM-diff ingestion (minutely diffs
arrive as changesets; the planet tile table must never be re-encoded).

Architecture (all public Structured Streaming mechanics; the store is
the LSM/snapshot pattern of Iceberg/Delta commit logs, hand-rolled over
plain parquet + atomic pointer files):

- the changeset arrives as a parquet file stream of rows
  ``(seg_id, lon0, lat0, lon1, lat1, op)`` with op in
  ('remove', 'upsert') — a moved segment ships BOTH rows (its old
  geometry under 'remove', new under 'upsert'), exactly what
  ``segment_changeset`` emits;
- ``foreachBatch`` computes each micro-batch's DELTA with
  ``rebuild_changed_tiles_delta`` (dirty tiles only; the corpus-sized
  table is scanned, never shuffled) and commits an immutable version
  directory ``v{batch_id}`` holding ONLY ``delta/`` (the rebuilt tile
  rows) and ``dirty/`` (the touched tile-id set — its ids absent from
  the delta are tombstones for emptied tiles), plus an atomically
  renamed ``CURRENT`` pointer. A commit writes O(|changeset|) rows —
  the full-table-per-version scheme this replaces re-WROTE the whole
  corpus each batch, which at 10^12 tiles makes the write, not the
  compute, the bottleneck;
- readers reconstruct any version by folding the delta chain onto the
  newest base snapshot at or below it:
  ``state = (state anti-join dirty_v) union delta_v`` — each dirty set
  is changeset-sized and broadcast, so the base is scanned ONCE with
  no shuffle regardless of chain length;
- ``compact_tile_store`` bounds the chain: it materializes the current
  state into ``base-{v}`` and atomically advances the ``BASE`` pointer
  (the streaming writer can also do this itself every
  ``compact_every`` commits). ``expire_tile_versions`` then reclaims
  version/base directories the latest base has superseded — split from
  compaction because retained deltas ARE the lineage (time travel to
  any un-expired version stays available);
- exactly-once across crashes: the streaming checkpoint replays an
  uncommitted batch with the SAME batch_id; the writer detects an
  already-committed version (CURRENT >= batch_id) and skips — a
  version directory is never half-visible because the pointer rename
  is atomic and happens last. A half-written ``base-*`` directory
  without its pointer advance is simply ignored and overwritten by the
  next compaction;
- SINGLE WRITER by contract: one streaming query or one batch job
  commits at a time. The pointer rename is atomic, but there is no
  cross-process commit lock — the dense-version guard in
  ``commit_changeset`` rejects stale ids from a lagging writer, yet
  two writers racing on the SAME next id could interleave. Readers
  are unaffected either way (they only follow committed pointers).

At 10^12-tile scale each micro-batch costs O(|changeset| + features in
dirty tiles) compute AND write; the table itself is only ever read
(broadcast-probed). Compaction is the one full-table write and runs at
an operator-chosen cadence, not per diff.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from osm_legal_default_speeds_spark.operators.spatial import (
    rebuild_changed_tiles_delta,
)

CHANGESET_SCHEMA = (
    "seg_id long, lon0 double, lat0 double, lon1 double, lat1 double, "
    "op string"
)
_TILES_SCHEMA = (
    "tile_id long, n_features int, byte_len int, tile_blob binary"
)


def read_changeset_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File stream of changeset rows; one file per micro-batch by
    default so every diff commits its own tile-table version."""
    return (
        spark.readStream.schema(CHANGESET_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(src_dir)
    )


def _read_pointer(store_dir: str, name: str) -> int | None:
    ptr = os.path.join(store_dir, name)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def _write_pointer(store_dir: str, name: str, value: int) -> None:
    tmp = os.path.join(store_dir, f".{name}.{value}.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(value))
    os.replace(tmp, os.path.join(store_dir, name))  # atomic


def current_version(store_dir: str) -> int | None:
    """The committed version (batch id), or None before first commit."""
    return _read_pointer(store_dir, "CURRENT")


def base_version(store_dir: str) -> int | None:
    """The latest compacted base snapshot's version, or None if the
    store has never been compacted (reconstruction starts empty)."""
    return _read_pointer(store_dir, "BASE")


def _empty_tiles(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], _TILES_SCHEMA)


def read_tiles_at(
    spark: SparkSession, store_dir: str, version: int
) -> DataFrame:
    """Time travel: the tile table as of committed ``version`` —
    the newest un-expired base at or below it, with the delta chain
    folded on top. Each fold step is a broadcast anti-join on the
    changeset-sized dirty set plus a union of the delta rows: the
    base is scanned once, shuffle-free, for any chain length."""
    committed = current_version(store_dir)
    if committed is None or version > committed:
        raise ValueError(
            f"version {version} has not been committed "
            f"(CURRENT is {committed})"
        )
    b = base_version(store_dir)
    if b is not None and b <= version:
        cur = spark.read.parquet(os.path.join(store_dir, f"base-{b}"))
        lo = b + 1
    else:
        # no base at or below the asked version: the full delta chain
        # from v0 is required. Batch ids are dense, so a missing v0
        # means expire_tile_versions reclaimed the chain — refuse
        # rather than silently reconstruct an empty/partial table.
        if version >= 0 and not os.path.isdir(
            os.path.join(store_dir, "v0")
        ):
            raise ValueError(
                f"version {version} predates the latest base snapshot "
                f"({b}) and its delta chain has been expired — only "
                f"versions >= {b} remain reconstructible"
            )
        cur = _empty_tiles(spark)
        lo = 0
    for v in range(lo, version + 1):
        vdir = os.path.join(store_dir, f"v{v}")
        if not os.path.isdir(os.path.join(vdir, "dirty")):
            # batch ids are dense and expiry only reclaims below the
            # base, so a committed version without delta/dirty tables
            # is a store written by the pre-delta format (full table
            # directly under v{n}) or external damage — refuse loudly
            raise ValueError(
                f"{vdir} is not a delta-format version (no dirty/ "
                f"table): the store was written by an older "
                f"full-table-per-version release or has been modified "
                f"externally; re-ingest into a fresh store directory"
            )
        dirty = F.broadcast(
            spark.read.parquet(os.path.join(vdir, "dirty"))
        )
        delta = spark.read.parquet(os.path.join(vdir, "delta"))
        cur = cur.join(dirty, "tile_id", "left_anti").unionByName(delta)
    return cur


def read_current_tiles(spark: SparkSession, store_dir: str) -> DataFrame:
    """The committed tile table (empty with the right schema before the
    first commit) — what a serving layer reads between commits."""
    v = current_version(store_dir)
    if v is None:
        return _empty_tiles(spark)
    return read_tiles_at(spark, store_dir, v)


def compact_tile_store(spark: SparkSession, store_dir: str) -> int | None:
    """Materialize the current delta chain into a new base snapshot
    ``base-{CURRENT}`` and advance the ``BASE`` pointer (atomic, last).
    Returns the new base version, or None on an empty store. Readers
    of any version >= the new base now fold a chain of length 0 from
    it; older versions keep reconstructing from the previous base until
    :func:`expire_tile_versions` reclaims it. Idempotent: re-compacting
    with no commit since the last compaction is a no-op (it must be —
    writing base-{v} FROM base-{v} would be a self-overwrite, which
    Spark rejects)."""
    v = current_version(store_dir)
    if v is None:
        return None
    if base_version(store_dir) == v:
        return v  # already compacted at CURRENT; nothing to fold
    out = read_current_tiles(spark, store_dir)
    out.write.mode("overwrite").parquet(
        os.path.join(store_dir, f"base-{v}")
    )
    _write_pointer(store_dir, "BASE", v)
    return v


def expire_tile_versions(store_dir: str) -> list[str]:
    """Reclaim storage the latest base snapshot supersedes: delta
    version dirs at or below BASE and older base dirs. Split from
    compaction because retained deltas are the time-travel lineage —
    run this only when history before the base is no longer needed.
    Returns the removed directory names."""
    b = base_version(store_dir)
    if b is None:
        return []
    removed = []
    for name in sorted(os.listdir(store_dir)):
        m = re.fullmatch(r"v(\d+)", name)
        if m and int(m.group(1)) <= b:
            removed.append(name)
        m = re.fullmatch(r"base-(\d+)", name)
        if m and int(m.group(1)) < b:
            removed.append(name)
    for name in removed:
        shutil.rmtree(os.path.join(store_dir, name))
    return removed


def _apply_changeset_delta(
    tiles: DataFrame,
    batch: DataFrame,
    res: int,
    clip: bool,
    broadcast_dirty: bool,
) -> tuple[DataFrame, DataFrame]:
    geom = ["seg_id", "lon0", "lat0", "lon1", "lat1"]
    removed = batch.where(F.col("op") == "remove").select(*geom)
    upserted = batch.where(F.col("op") == "upsert").select(*geom)
    return rebuild_changed_tiles_delta(
        tiles, removed, upserted, res, clip=clip,
        broadcast_dirty=broadcast_dirty,
    )


def commit_changeset(
    spark: SparkSession,
    store_dir: str,
    batch: DataFrame,
    batch_id: int,
    res: int,
    clip: bool = True,
    compact_every: int | None = 16,
    broadcast_dirty: bool = True,
) -> bool:
    """Apply one changeset batch to the store as version ``batch_id``
    — the commit unit `streaming_tile_maintenance` runs per
    micro-batch, exposed for BATCH ingestion (a daily-diff cron job
    needs the same store without a streaming query). Returns False if
    ``batch_id`` is already committed (idempotent replay), True after
    committing. ``batch`` carries the changeset schema
    (:data:`CHANGESET_SCHEMA`). Version ids must be dense and
    ascending — pass ``current_version(store_dir) + 1`` (or 0 for a
    fresh store)."""
    os.makedirs(store_dir, exist_ok=True)
    committed = current_version(store_dir)
    if committed is not None and committed >= batch_id:
        return False
    if batch_id != (0 if committed is None else committed + 1):
        raise ValueError(
            f"batch_id {batch_id} breaks the dense version sequence "
            f"(CURRENT is {committed}) — readers rely on density to "
            f"fold and to detect expiry"
        )
    tiles = read_current_tiles(spark, store_dir)
    rebuilt, dirty = _apply_changeset_delta(
        tiles, batch, res, clip, broadcast_dirty
    )
    vdir = os.path.join(store_dir, f"v{batch_id}")
    # delta first (reads the old chain), then the (materialized)
    # dirty set; the version becomes visible only via the pointer
    rebuilt.write.mode("overwrite").parquet(os.path.join(vdir, "delta"))
    dirty.write.mode("overwrite").parquet(os.path.join(vdir, "dirty"))
    _write_pointer(store_dir, "CURRENT", batch_id)
    if compact_every and (batch_id + 1) % compact_every == 0:
        compact_tile_store(spark, store_dir)
    return True


def streaming_tile_maintenance(
    spark: SparkSession,
    changeset_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    res: int,
    clip: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
    compact_every: int | None = 16,
    broadcast_dirty: bool = True,
):
    """Start the maintenance stream; returns the StreamingQuery (caller
    awaits/stops). ``read_current_tiles(spark, store_dir)`` serves the
    latest committed version at any point, including mid-stream.

    ``compact_every`` (default 16): every Nth commit also materializes
    a base snapshot, bounding the reconstruction chain every reader
    (including the NEXT commit's own rebuild) folds — without it the
    chain grows one broadcast-anti-join fold per commit forever
    (cumulative O(N^2) re-reads and an ever-deepening plan), so pass
    None only for short bounded runs that compact manually. Expiry
    stays manual (:func:`expire_tile_versions`) so lineage retention
    is an operator policy, not a side effect of ingestion.

    ``broadcast_dirty``: forwarded to
    :func:`rebuild_changed_tiles_delta`. Pass False when micro-batches
    are BULK (the initial base import of a whole corpus arriving as
    one changeset, a re-import wave): the dirty tile set is then
    corpus-sized and must shuffle-join rather than broadcast."""
    os.makedirs(store_dir, exist_ok=True)

    def _commit(batch: DataFrame, batch_id: int) -> None:
        commit_changeset(
            spark, store_dir, batch, batch_id, res, clip=clip,
            compact_every=compact_every, broadcast_dirty=broadcast_dirty,
        )

    stream = read_changeset_stream(spark, changeset_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()
