"""Temporal join operators Spark lacks as built-ins, expressed as
compositions of DataFrame ops so Catalyst keeps planning them:

- ``asof_join``: for every left row, attach the payload of the most
  recent right row with ``right_ts <= left_ts`` for the same key
  (DuckDB ``ASOF LEFT JOIN`` semantics, which is also the oracle).
  Implemented as ONE shuffle: union both sides tagged, hash-partition
  by key, sort within partition by (ts, side), and take a running
  ``last(payload, ignorenulls)`` — a linear streaming pass, never a
  per-row range probe.

- ``windowed_range_join``: for every left row, aggregate the right
  rows with ``right_ts in [left_ts - window, left_ts)`` for the same
  key (attribution windows, feature lookback). Implemented as a BAND
  JOIN: both sides are bucketed to ``floor(ts / window)``; a right row
  in the lookback window of a left row can only sit in the left row's
  bucket or the one before, so the left side is exploded to exactly
  two probe buckets and the join is a plain equi-join on
  (key, bucket) with the residual range predicate applied after — a
  2x fan-out instead of the O(|L| x |R|) per-key cross product a raw
  inequality join plans as.

Scale notes (100 TB):

- asof_join shuffles each side ONCE on the key for the window (the
  right side additionally pays a narrow (key, ts) exchange for its
  tie-break dedupe, whose output is at most one row per (key, ts));
  the window is a running aggregate (no buffering beyond the frame's
  single struct).
  Per-key history must be co-located, so the window cannot be salted;
  key skew is bounded by events-per-entity. For a pathological hot key
  the public escape hatch is range-splitting time into chunks and
  carrying the last payload across chunk boundaries (two passes); not
  needed at our key cardinalities.
- windowed_range_join's equi-join is AQE-skew-splittable (no window
  function involved), and the residual predicate runs post-join on
  co-partitioned data. Shuffle volume: 2x left + 1x right, keyed rows
  only.

Both operators REQUIRE timestamps already converted to epoch
MICROSECOND longs (``unix_micros`` / DuckDB ``epoch_us``) by the
caller, so ordering and bucket arithmetic are integer-exact and
engine-portable — they do not convert anything themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_list(x) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts_us",
    right_ts: str = "ts_us",
    payload: list[str] | None = None,
    tie_break: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Most-recent-prior join: left rows keep all their columns and
    gain ``{prefix}{right_ts}`` + ``{prefix}{c}`` for each payload
    column, from the right row with the greatest ``right_ts <=
    left_ts`` per key (NULLs when no prior right row exists — LEFT
    semantics).

    ``tie_break``: right rows are first deduplicated to one per
    (key, right_ts) by keeping the row with the maximum ``tie_break``
    value (required — without it, equal-timestamp right rows would
    make the result nondeterministic). Ties between a left and right
    row at the SAME timestamp match (``>=``), like DuckDB ASOF.

    NULL timestamps follow DuckDB ASOF: a comparison with NULL is
    never true, so NULL-``right_ts`` rows can match nothing (they are
    dropped up front — under Spark's NULLS-FIRST window sort they
    would otherwise rank as "earliest prior" and match EVERY left
    row), and NULL-``left_ts`` rows come back with NULL asof columns.

    NULL keys follow the same rule: ASOF's equality prefix
    (``l.k = r.k``) never matches a NULL, so NULL-key right rows are
    dropped up front too — the window formulation would otherwise
    group them WITH NULL-key left rows (partitionBy, unlike a join
    condition, puts all NULLs in one partition) and hand those left
    rows a phantom match the declared DuckDB semantics (and any plain
    Spark join) would never produce. NULL-key left rows still pass
    through with NULL asof columns — LEFT semantics.
    """
    keys = _as_list(on)
    payload = payload or []
    if tie_break is None:
        raise ValueError("asof_join requires an explicit tie_break column")
    reserved = {"__ts", "__side", "__p", "__m", f"{prefix}{right_ts}"}
    reserved.update(f"{prefix}{c}" for c in payload)
    clash = reserved.intersection(left.columns)
    if clash:
        # withColumn would silently overwrite internal names, and an
        # output-name collision (prefix+right_ts or prefix+payload)
        # would emit two columns with one name — AMBIGUOUS_REFERENCE
        # downstream, or the wrong column under sort-by-name hashing
        raise ValueError(
            f"left columns {sorted(clash)} collide with asof_join's "
            f"internal/output names; rename them or change prefix="
        )

    # 1 shuffle: dedupe right per (key, ts) via max(struct(tie, ...)).
    # Struct comparison is lexicographic by field order, so tie_break
    # leads and the payload rides along with the winning row.
    packed = F.max(
        F.struct(F.col(tie_break), *[F.col(c) for c in payload])
    ).alias("__p")
    right_keep = F.col(right_ts).isNotNull()
    for k in keys:
        right_keep = right_keep & F.col(k).isNotNull()
    r = (
        right.where(right_keep)
        .groupBy(*keys, F.col(right_ts).alias("__ts"))
        .agg(packed)
        .withColumn("__side", F.lit(0))
    )

    l = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort BEFORE left rows at an equal timestamp, so the
    # running last-non-null includes same-instant right rows (>=).
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
        .withColumn(
            f"{prefix}{right_ts}",
            F.max(F.when(F.col("__side") == 0, F.col("__ts"))).over(w),
        )
        .filter(F.col("__side") == 1)
    )
    out = matched.select(
        *left.columns,
        F.col(f"{prefix}{right_ts}"),
        *[
            F.col("__m").getField(c).alias(f"{prefix}{c}")
            for c in payload
        ],
    )
    return out


def windowed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    window_us: int,
    aggs: list[Column],
    left_keep: list[str] | None = None,
) -> DataFrame:
    """Band join + aggregate: for each left row (identified by ALL its
    ``left_keep`` columns, default every left column), apply ``aggs``
    over right rows of the same key with
    ``left_ts - window_us <= right_ts < left_ts``.

    ``left_keep`` MUST uniquely identify left rows (include a row id):
    two left rows sharing every ``left_keep`` value land in ONE output
    group whose aggregates pool BOTH rows' matched right rows — a
    right row in both windows is counted twice, which is neither
    per-left-row semantics nor a deduplicated union.

    INNER semantics: left rows with zero right rows in the window are
    absent from the output (re-attach with a left join + coalesce when
    zero-rows matter; keeping them inside would force a second
    pass-through union).

    Timestamps must already be epoch-microsecond longs.
    """
    if window_us <= 0:
        # floor(ts / 0) is NULL under non-ANSI Spark: both probe
        # buckets go NULL, the equi-join matches nothing, and the
        # operator returns an empty frame indistinguishable from
        # "no events in window"
        raise ValueError(f"window_us must be positive, got {window_us}")
    keys = _as_list(on)
    left_keep = list(left_keep) if left_keep is not None else left.columns
    clash = {"__b"}.intersection(left.columns).union(
        {"__b"}.intersection(right.columns)
    )
    if clash:
        # withColumn would silently overwrite the caller's column with
        # the probe bucket, splitting every left row's aggregates
        # across two output groups — the same failure class asof_join
        # rejects loudly
        raise ValueError(
            "column '__b' collides with windowed_range_join's internal "
            "probe-bucket name; rename it"
        )

    bucket_l = F.floor(F.col(left_ts) / F.lit(window_us))
    # A right row in [left_ts - W, left_ts) has bucket in
    # {bucket(left) - 1, bucket(left)}: explode left to 2 probes.
    probes = left.withColumn(
        "__b", F.explode(F.array(bucket_l - 1, bucket_l))
    )
    r = right.withColumn(
        "__b", F.floor(F.col(right_ts) / F.lit(window_us))
    )
    cond = [probes[k] == r[k] for k in keys] + [
        probes["__b"] == r["__b"],
        r[right_ts] < probes[left_ts],
        r[right_ts] >= probes[left_ts] - F.lit(window_us),
    ]
    joined = probes.join(r, cond, "inner")
    return joined.groupBy(*[probes[c] for c in left_keep]).agg(*aggs)
