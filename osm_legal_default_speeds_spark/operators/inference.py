"""Distributed speed-limit inference (the reference's ``getSpeedLimits``
as a whole-DataFrame transformation).

Physical design (SURVEY.md §2.4, §2.6):

- The compiled rule set (~1.2k rules after driver-side compilation) is
  a Spark **broadcast variable** — the fact table never shuffles for the
  rule match, which keeps the operator skew-immune and embarrassingly
  parallel at 10^12-row scale.
- Per-partition evaluation happens in one **Arrow-batched pandas UDF**
  whose kernel is the pure-Python reference engine
  (``plans.reference_engine``) — the deliberately-UDF component where
  bit-for-bit fidelity to the reference string semantics beats
  native-expression purity (match cascade C2-C5, relation EXISTS C6,
  replacer overrides C7, result assembly R1-R4).
- The **relevant-key pruning** projection (F16,
  ``LegalDefaultSpeeds.kt:241-247``) is a native ``map_filter``
  expression: Catalyst prunes top-level columns but cannot prune inside
  a MapType, so we narrow the map before it crosses the Arrow boundary
  (or any shuffle/cache).
"""

from __future__ import annotations

import uuid
import warnings
import weakref

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

from osm_legal_default_speeds_spark.plans.reference_engine import (
    LegalDefaultSpeedsEngine,
)
from osm_legal_default_speeds_spark.plans.rules_compiler import CompiledRuleSet

RESULT_SCHEMA = StructType(
    [
        StructField("road_type_name", StringType()),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("certitude", StringType()),
    ]
)

_RELATIONS_TYPE = "array<map<string,string>>"
_OVERRIDES_TYPE = "map<string,boolean>"
_MISS = object()

# Worker-global inference caches, keyed by broadcast id: pyspark
# workers are long-lived (spark.python.worker.reuse), so results and
# the deserialized engine survive across Arrow batches AND tasks —
# at scale each worker sees thousands of batches drawn from the same
# skewed distribution of (country, relevant-tags) combinations.
_WORKER_MEMO_CAP = 1_000_000
_worker_memo: dict = {}
_worker_engines: dict = {}

# Driver-side broadcast cache: one Broadcast + cache token per LIVE
# (ruleset, SparkContext) pair, so repeated operator applications over
# the same compiled rules (streaming micro-batches, per-tile loops)
# reuse one broadcast and keep hitting the worker-global engine/memo
# caches above instead of re-shipping the ruleset and re-keying the
# memo every call. Keyed by id() (dataclass CompiledRuleSet is
# unhashable); the weakref callback evicts the entry — and with it the
# Broadcast handle — when the ruleset is garbage-collected, and a dead
# or replaced SparkContext forces a fresh broadcast.
_bc_cache: dict = {}


def _ruleset_broadcast(spark, ruleset: CompiledRuleSet):
    """-> (Broadcast[CompiledRuleSet], stable cache token)."""
    sc = spark.sparkContext
    key = id(ruleset)
    ent = _bc_cache.get(key)
    if ent is not None and ent[0]() is ruleset and ent[1]() is sc:
        return ent[2], ent[3]
    bc = sc.broadcast(ruleset)
    bc_id = uuid.uuid4().hex
    _bc_cache[key] = (
        weakref.ref(ruleset, lambda _: _bc_cache.pop(key, None)),
        weakref.ref(sc),
        bc,
        bc_id,
    )
    return bc, bc_id


def prune_relevant_tags(ruleset: CompiledRuleSet, tags_col: Column | str) -> Column:
    """Native map-internal column pruning: keep only tag keys any rule
    filter can reference. Runs JVM-side (whole-stage codegen), shrinking
    the payload before shuffles and the Arrow transfer.

    Warns when ``maxspeed`` itself is not a relevant key: pruning would
    then drop the input maxspeed, silently disabling the FromMaxSpeed
    cascade stage (C3) and R1 input-echo subtraction. Real rule sets
    always filter on maxspeed, so this never fires in production."""
    if not ruleset.is_relevant_tag_key("maxspeed"):
        warnings.warn(
            "prune_relevant_tags: 'maxspeed' is not a relevant key in "
            "this rule set, so pruning drops the input maxspeed and "
            "disables the FromMaxSpeed stage / R1 input-echo semantics",
            stacklevel=2,
        )
    tags = F.col(tags_col) if isinstance(tags_col, str) else tags_col

    def keep(k: Column, v: Column) -> Column:
        return is_relevant_tag_key_col(ruleset, k)

    return F.map_filter(tags, keep)


def infer_speed_limits(
    df: DataFrame,
    ruleset: CompiledRuleSet,
    country_col: str = "country_code",
    tags_col: str = "tags",
    relations_col: str | None = None,
    overrides_col: str | None = None,
    result_col: str = "speed_limit",
    prune_keys: bool = False,
    dedup_inputs: bool = False,
) -> DataFrame:
    """Append a ``result_col`` struct column
    (road_type_name, tags, certitude) — null when no rule matched
    (mirrors the reference returning null, LegalDefaultSpeeds.kt:159,183).

    ``relations_col``: optional array<map<string,string>> column with the
    tags of relations the road belongs to (C6).
    ``overrides_col``: optional map<string,boolean> column forcing named
    road-type predicates per row (the columnar replacerFn, C7) — e.g. an
    ``is_urban`` signal from a spatial layer.
    ``prune_keys``: pre-narrow the tag map with the relevant-key
    projection before the Arrow transfer. Sound because result assembly
    only reads ``maxspeed``-family keys — but those ARE relevant keys in
    any real dataset; enable only if your rule set references maxspeed
    (``prune_relevant_tags`` warns at runtime when it does not) or you
    don't need R1 input-echo semantics.
    ``dedup_inputs``: evaluate the (pure) cascade once per distinct
    (country, canonical tags [, relations, overrides]) combination and
    join results back, instead of once per row. At 10^12-row scale the
    distinct-combination cardinality is orders of magnitude below the
    row count, so the Python/Arrow cost collapses to the distinct set;
    the cost is one dropDuplicates + one equi-join shuffle on narrow
    key columns (AQE picks broadcast when the distinct set is small).
    Results are identical by purity of the cascade.
    """
    if dedup_inputs:
        return _infer_dedup(
            df, ruleset, country_col, tags_col, relations_col,
            overrides_col, result_col, prune_keys,
        )
    spark = df.sparkSession
    bc, bc_id = _ruleset_broadcast(spark, ruleset)

    tags_expr: Column = F.col(tags_col)
    if prune_keys:
        # R1/R2 read input 'maxspeed' and subtract *all* non-implicit
        # input keys; pruning is only transparent if the result struct
        # is what the caller consumes (it is: pruned keys can't appear
        # in rule output tags either unless the rule emits them, and
        # rule-emitted keys are never pruned from rule tags). The one
        # observable difference: input keys absent from the relevant
        # set are not subtracted from rule output tags - impossible,
        # as rule output keys that matter (maxspeed*) are relevant in
        # any rule set that also filters on them. Keep opt-in.
        tags_expr = prune_relevant_tags(ruleset, tags_expr)

    rels_expr: Column = (
        F.col(relations_col)
        if relations_col is not None
        else F.lit(None).cast(_RELATIONS_TYPE)
    )
    ovr_expr: Column = (
        F.col(overrides_col)
        if overrides_col is not None
        else F.lit(None).cast(_OVERRIDES_TYPE)
    )

    # bc_id namespaces the worker-global caches (PySpark Broadcast
    # exposes no stable id): batches/tasks — and, via _bc_cache,
    # repeated operator calls over the same live ruleset — share it;
    # distinct rulesets never collide
    @F.pandas_udf(RESULT_SCHEMA)
    def _match_rules(
        cc: pd.Series, tags: pd.Series, rels: pd.Series, ovr: pd.Series
    ) -> pd.DataFrame:
        engine = _worker_engines.get(bc_id)
        if engine is None:
            engine = LegalDefaultSpeedsEngine(ruleset=bc.value)
            _worker_engines.clear()  # one live ruleset per worker is typical
            _worker_engines[bc_id] = engine
        get = engine.get_speed_limits
        n = len(cc)
        names: list = [None] * n
        out_tags: list = [None] * n
        certs: list = [None] * n
        cc_l, tags_l, rels_l, ovr_l = (
            cc.tolist(),
            tags.tolist(),
            rels.tolist(),
            ovr.tolist(),
        )
        # Worker-global memo: real road data repeats the same
        # (country, relevant-tags) combination across huge numbers of
        # rows, and get_speed_limits is a pure function of its inputs —
        # distinct-combination cardinality, not row count, pays the
        # Python cost. (The engine itself runs ~30k rows/s/core; at
        # 10^12 rows only the memoized shape survives.)
        memo = _worker_memo
        if len(memo) > _WORKER_MEMO_CAP:
            memo.clear()
        for i in range(n):
            country = cc_l[i]
            if country is None:
                continue
            t = tags_l[i] or {}
            r = rels_l[i]
            # drop null ELEMENTS (array<map> elements are nullable):
            # the native cascade's exists() evaluates a null relation
            # to null -> coalesced false, i.e. it never matches — an
            # unfiltered None here would crash the memo key's
            # m.items() and HasKey's `key in None`
            relations = (
                [m for m in r if m is not None]
                if r is not None and len(r)
                else ()
            )
            o = ovr_l[i]
            key = (
                bc_id,
                country,
                tuple(sorted(t.items())),
                tuple(tuple(sorted(m.items())) for m in relations),
                tuple(sorted(o.items())) if o else None,
            )
            hit = memo.get(key, _MISS)
            if hit is _MISS:
                hit = get(country, t, relations, overrides=o)
                memo[key] = hit
            if hit is not None:
                names[i] = hit.road_type_name
                out_tags[i] = hit.tags
                certs[i] = hit.certitude
        return pd.DataFrame(
            {"road_type_name": names, "tags": out_tags, "certitude": certs}
        )

    out = df.withColumn(
        result_col, _match_rules(F.col(country_col), tags_expr, rels_expr, ovr_expr)
    )
    # _match_rules returns a struct with all-null fields for misses;
    # normalize to a null struct so `result IS NULL` means "no match"
    # like the reference's null return.
    return out.withColumn(
        result_col,
        F.when(F.col(f"{result_col}.certitude").isNotNull(), F.col(result_col)),
    )


def _canonical_map_key(col: Column) -> Column:
    """Deterministic digest of a map column: sorted entry array ->
    JSON -> md5. Equal dicts (any storage order) get equal keys."""
    entries = F.array_sort(
        F.map_entries(F.coalesce(col, F.create_map().cast("map<string,string>")))
    )
    return F.md5(F.to_json(entries))


def _infer_dedup(
    df: DataFrame,
    ruleset: CompiledRuleSet,
    country_col: str,
    tags_col: str,
    relations_col: str | None,
    overrides_col: str | None,
    result_col: str,
    prune_keys: bool,
    broadcast_results: bool = True,
    infer_fn=None,
) -> DataFrame:
    """distinct -> infer -> join-back plan (see infer_speed_limits).

    ``broadcast_results``: broadcast the (distinct-combination ->
    result) side of the join-back. Distinct tag-combination cardinality
    is orders of magnitude below row count, so this is almost always
    right — without it Spark sorts the full fact side for a sort-merge
    join (the UDF output has no size statistics), which spills and
    anti-scales. Disable only if distinct combos approach driver
    memory.

    Rejected alternative (measured): shuffle-hash join-back hoping
    ReuseExchange would dedup the canonicalization between the
    distinct branch and the fact side. It cannot fire —
    ``dropDuplicates`` puts a map-side partial aggregate BELOW its
    exchange, so the two exchanges' children differ — and the forced
    shuffle of the fact side measured ~20% slower than the broadcast
    join-back at sf0.1. The canonicalization is therefore computed on
    both branches by design; it is pure map-side codegen and cheaper
    than shuffling the corpus."""
    key_col = "__infer_key"
    work_tags = tags_col
    keyed = df
    if prune_keys:
        work_tags = "__pruned_tags"
        keyed = keyed.withColumn(
            work_tags, prune_relevant_tags(ruleset, F.col(tags_col))
        )

    key = _canonical_map_key(F.col(work_tags))
    if relations_col is not None:
        rel_canon = F.transform(
            F.coalesce(
                F.col(relations_col), F.array().cast(_RELATIONS_TYPE)
            ),
            lambda m: F.array_sort(F.map_entries(m)),
        )
        key = F.md5(F.concat(key, F.to_json(rel_canon)))
    if overrides_col is not None:
        ovr_canon = F.array_sort(
            F.map_entries(
                F.coalesce(F.col(overrides_col), F.create_map().cast(_OVERRIDES_TYPE))
            )
        )
        key = F.md5(F.concat(key, F.to_json(ovr_canon)))
    keyed = keyed.withColumn(key_col, key)

    sel = [country_col, key_col, work_tags]
    if relations_col is not None:
        sel.append(relations_col)
    if overrides_col is not None:
        sel.append(overrides_col)
    distinct = keyed.select(*sel).dropDuplicates([country_col, key_col])

    # the per-distinct-combination kernel is pluggable: the Arrow UDF
    # engine by default, or the all-native Column cascade
    # (plans.native_cascade passes infer_speed_limits_native here)
    kernel = infer_fn or infer_speed_limits
    inferred = kernel(
        distinct,
        ruleset,
        country_col=country_col,
        tags_col=work_tags,
        relations_col=relations_col,
        overrides_col=overrides_col,
        result_col=result_col,
    ).select(country_col, key_col, result_col)
    if broadcast_results:
        inferred = F.broadcast(inferred)

    # replace a pre-existing result_col in place (same contract as the
    # non-dedup Arrow path's withColumn and the native cascade's
    # explicit keep-list) — joining it back alongside the original
    # would select the same name twice (AMBIGUOUS_REFERENCE downstream)
    if result_col in keyed.columns:
        keyed = keyed.drop(result_col)
    out = keyed.join(inferred, [country_col, key_col], "left")
    drop = [key_col] + ([work_tags] if prune_keys else [])
    return out.drop(*drop)


def is_relevant_tag_key_col(ruleset: CompiledRuleSet, key_col: Column | str) -> Column:
    """Native boolean Column equivalent of isRelevantTagKey
    (LegalDefaultSpeeds.kt:246-247)."""
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    strings = sorted(ruleset.relevant_key_strings)
    cond = k.isin(*strings) if strings else F.lit(False)
    regex = ruleset.combined_key_regex()
    if regex is not None:
        cond = cond | k.rlike(regex)
    return cond
