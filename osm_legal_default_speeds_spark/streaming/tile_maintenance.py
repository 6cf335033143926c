"""Streaming tile maintenance: continuous segment-changeset ingestion
keeping a persistent vector-tile table current — the Structured
Streaming twin of ``operators/spatial.py::rebuild_changed_tiles`` and
the production shape for continuous OSM-diff ingestion (minutely diffs
arrive as changesets; the planet tile table must never be re-encoded).

Architecture (all public Structured Streaming mechanics):

- the changeset arrives as a parquet file stream of rows
  ``(seg_id, lon0, lat0, lon1, lat1, op)`` with op in
  ('remove', 'upsert') — a moved segment ships BOTH rows (its old
  geometry under 'remove', new under 'upsert'), exactly what
  ``segment_changeset`` emits;
- ``foreachBatch`` applies each micro-batch's changeset to the current
  tile-table version with ``rebuild_changed_tiles`` (dirty tiles only;
  the corpus-sized table is scanned, never shuffled) and commits a NEW
  immutable version directory ``v{batch_id}`` plus an atomically
  renamed ``CURRENT`` pointer — the same versioned-manifest pattern as
  ``plans/checkpointed_job.py``;
- exactly-once across crashes: the streaming checkpoint replays an
  uncommitted batch with the SAME batch_id; the writer detects an
  already-committed version (CURRENT >= batch_id) and skips — a
  version directory is never half-visible because the pointer rename
  is atomic and happens last. Old versions remain on disk as lineage.

At 10^12-tile scale each micro-batch costs O(|changeset| + features in
dirty tiles); the table itself is only ever read (broadcast-probed) and
appended as a new version — no full rewrite, no shuffle of tile rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from osm_legal_default_speeds_spark.operators.spatial import (
    rebuild_changed_tiles,
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


def current_version(store_dir: str) -> int | None:
    """The committed version (batch id), or None before first commit."""
    ptr = os.path.join(store_dir, "CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as fh:
        return int(fh.read().strip())


def read_current_tiles(spark: SparkSession, store_dir: str) -> DataFrame:
    """The committed tile table (empty with the right schema before the
    first commit) — what a serving layer reads between commits."""
    v = current_version(store_dir)
    if v is None:
        return spark.createDataFrame([], _TILES_SCHEMA)
    return spark.read.parquet(os.path.join(store_dir, f"v{v}"))


def _apply_changeset(
    tiles: DataFrame, batch: DataFrame, res: int, clip: bool
) -> DataFrame:
    geom = ["seg_id", "lon0", "lat0", "lon1", "lat1"]
    removed = batch.where(F.col("op") == "remove").select(*geom)
    upserted = batch.where(F.col("op") == "upsert").select(*geom)
    return rebuild_changed_tiles(tiles, removed, upserted, res, clip=clip)


def streaming_tile_maintenance(
    spark: SparkSession,
    changeset_dir: str,
    checkpoint_dir: str,
    store_dir: str,
    res: int,
    clip: bool = True,
    available_now: bool = True,
    max_files_per_trigger: int = 1,
):
    """Start the maintenance stream; returns the StreamingQuery (caller
    awaits/stops). ``read_current_tiles(spark, store_dir)`` serves the
    latest committed version at any point, including mid-stream."""
    os.makedirs(store_dir, exist_ok=True)

    def _commit(batch: DataFrame, batch_id: int) -> None:
        committed = current_version(store_dir)
        if committed is not None and committed >= batch_id:
            return  # checkpoint replay of an already-committed batch
        tiles = read_current_tiles(spark, store_dir)
        out = _apply_changeset(tiles, batch, res, clip)
        vdir = os.path.join(store_dir, f"v{batch_id}")
        out.write.mode("overwrite").parquet(vdir)
        tmp = os.path.join(store_dir, f".CURRENT.{batch_id}.tmp")
        with open(tmp, "w") as fh:
            fh.write(str(batch_id))
        os.replace(tmp, os.path.join(store_dir, "CURRENT"))  # atomic

    stream = read_changeset_stream(spark, changeset_dir, max_files_per_trigger)
    writer = stream.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="0 seconds")
    return writer.start()
