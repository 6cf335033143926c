"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language ID, token counting, document fingerprinting.

Everything is native ``pyspark.sql.functions`` Column algebra — string
splits, higher-order array functions, regexes — so the whole layer is
SQL-portable for the DuckDB differential oracle.

Scale design: higher-order array functions evaluate *interpreted*
(outside whole-stage codegen) and Catalyst does not common-subexpression
-eliminate duplicated subtrees, so composing many metrics directly over
``tokens(text)`` re-tokenizes the document once per metric. Every
operator therefore has a ``*_from_tokens`` core that consumes a
prepared token-array Column, and ``with_text_features`` stages the
token / word-hash arrays once per row in a separate projection
(CollapseProject keeps non-cheap expressions that are referenced more
than once in their own project, so the arrays are computed once). All
operators are narrow per-row projections — zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword anchors for the n-gram/stopword language-ID
# heuristic. Deliberately small + literal so the oracle SQL can embed
# the identical lists.
LANG_STOPWORDS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ein", "mit"],
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "los", "y", "de", "que", "un"],
    "fr": ["le", "la", "les", "et", "de", "que", "un"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3"],
}

# word-ish / number / other-symbol tokens — the BPE-ish pre-tokenizer
BPE_TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(text), " ")


def word_hashes(t: Column, hex_chars: int = 15) -> Column:
    """Per-token numeric hashes (md5 hex prefix -> long): the shared
    input of rolling_hash and simhash. Engine-portable, unlike
    murmur/xxhash."""
    return F.transform(
        t, lambda w: F.conv(F.substring(F.md5(w), 1, hex_chars), 16, 10).cast("long")
    )


# ---------------------------------------------------------------------------
# Token-array cores
# ---------------------------------------------------------------------------

def token_count_from_tokens(t: Column) -> Column:
    return F.size(t)


def distinct_ratio_from_tokens(t: Column) -> Column:
    """Unique-token fraction — near 0 for degenerate repeated text."""
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def stopword_hits_from_tokens(t: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(t, lambda w: w.isin(*words)))


def stopword_ratio_from_tokens(t: Column, lang: str = "en") -> Column:
    return stopword_hits_from_tokens(t, lang).cast("double") / F.size(t)


def mean_word_len_from_tokens(t: Column) -> Column:
    total = F.aggregate(t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return total.cast("double") / F.size(t)


def quality_score_from_tokens(t: Column, lang: str = "en") -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence
    (natural language), lexical diversity, and sane word lengths.
    Deliberately simple arithmetic so the oracle can replicate it."""
    sw = F.least(stopword_ratio_from_tokens(t, lang) * 4.0, F.lit(1.0))
    dr = distinct_ratio_from_tokens(t)
    wl = mean_word_len_from_tokens(t)
    len_ok = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (sw + dr + len_ok) / F.lit(3.0)


def lang_id_from_tokens(t: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    wins; ties break lexicographically (deterministic); zero hits
    everywhere -> 'und' (undetermined)."""
    scored = F.array(
        *[
            F.struct(
                (-stopword_hits_from_tokens(t, lang)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.array_min(scored)
    return F.when(best.getField("neg_hits") < 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint_from_tokens(t: Column) -> Column:
    """Bag-of-words document fingerprint: md5 of the sorted distinct
    token set — canonical-form hash invariant to word order and
    repetition (the classic dedup fingerprint)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(t)), " "))


def rolling_hash_from_hashes(
    wh: Column, base: int = 31, mod: int = 1_000_000_007
) -> Column:
    """Polynomial rolling hash over token hashes — an order-sensitive
    counterpart to ``fingerprint`` (distinguishes permutations). Native
    left-to-right fold. ``wh`` must be ``word_hashes(t, hex_chars=8)``."""
    if mod < 2:
        # x % 0 is NULL under non-ANSI Spark (every fingerprint silently
        # NULL); mod=1 hashes everything to 0
        raise ValueError(f"rolling-hash mod must be >= 2, got {mod}")
    return F.aggregate(
        wh, F.lit(0).cast("long"), lambda acc, h: (acc * base + h) % mod
    )


def simhash_from_hashes(wh: Column, bits: int = 16) -> Column:
    """SimHash fingerprint: per bit position k, the sign of sum(+-1)
    across token hashes decides bit k. ``wh`` must be
    ``word_hashes(t, hex_chars=15)`` — computed ONCE by the caller (the
    16 per-bit folds all reference it)."""
    def bit_balance(k: int) -> Column:
        # NB: PySpark derives HOF arity from the lambda's parameter
        # count — extra default args would become lambda variables.
        return F.aggregate(
            wh,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, k).bitwiseAND(F.lit(1)) * 2 - 1,
        )

    out = F.lit(0).cast("long")
    for k in range(bits):
        out = out + F.when(bit_balance(k) > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return out


# ---------------------------------------------------------------------------
# Text-column wrappers (one-shot convenience; for multi-metric
# projections use with_text_features so tokenization happens once)
# ---------------------------------------------------------------------------

def token_count(text: Column) -> Column:
    return token_count_from_tokens(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs, digit runs, single
    symbols) — the standard proxy for LLM token budgeting."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_REGEX), 0))


def distinct_ratio(text: Column) -> Column:
    return distinct_ratio_from_tokens(tokens(text))


def stopword_hits(text: Column, lang: str) -> Column:
    return stopword_hits_from_tokens(tokens(text), lang)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_ratio_from_tokens(tokens(text), lang)


def mean_word_len(text: Column) -> Column:
    return mean_word_len_from_tokens(tokens(text))


def quality_score(text: Column, lang: str = "en") -> Column:
    return quality_score_from_tokens(tokens(text), lang)


def lang_id(text: Column) -> Column:
    return lang_id_from_tokens(tokens(text))


def fingerprint(text: Column) -> Column:
    return fingerprint_from_tokens(tokens(text))


def rolling_hash(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    return rolling_hash_from_hashes(word_hashes(tokens(text), 8), base, mod)


def simhash(text: Column, bits: int = 16) -> Column:
    return simhash_from_hashes(word_hashes(tokens(text), 15), bits)


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def with_text_features_python(
    df: DataFrame, text_col: str = "text", lang: str = "en", bits: int = 16
) -> DataFrame:
    """Independent Arrow-batched Python implementation producing the
    IDENTICAL columns (bit-for-bit: same md5-based hashes, same
    double-division order) as ``with_text_features`` — the
    differential twin that pins the Column algebra.

    Measured at 500k docs on 32 cores: the staged Column path runs
    ~123k docs/s vs ~52k docs/s for this kernel — Spark's (even
    interpreted) JVM expressions beat per-word Python hashlib calls
    once shared arrays are staged, so ``with_text_features`` IS the
    production path; this twin exists for correctness evidence."""
    import hashlib
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    bpe_re = _re.compile(BPE_TOKEN_REGEX)
    stop_sets = {lg: set(ws) for lg, ws in LANG_STOPWORDS.items()}
    langs = sorted(LANG_STOPWORDS)
    md5 = hashlib.md5
    mod = 1_000_000_007

    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [
            "n_tokens int",
            "n_bpe_tokens int",
            "distinct_ratio double",
            f"stopword_ratio_{lang} double",
            "lang_pred string",
            "quality double",
            "fingerprint string",
            "rolling_hash long",
            "simhash long",
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].tolist()
            n = len(texts)
            cols: dict[str, list] = {k: [None] * n for k in (
                "n_tokens", "n_bpe_tokens", "distinct_ratio",
                f"stopword_ratio_{lang}", "lang_pred", "quality",
                "fingerprint", "rolling_hash", "simhash",
            )}
            for i, text in enumerate(texts):
                if text is None:
                    # match the Column path on null text: the numeric
                    # ratio/hash columns are null, but lang_pred falls
                    # through the CASE to its 'und' otherwise-branch
                    # and every simhash bit term's otherwise(0)
                    # contributes 0 — so those two are NOT null
                    cols["lang_pred"][i] = "und"
                    cols["simhash"][i] = 0
                    continue
                low = text.lower()
                t = low.split(" ")
                nt = len(t)
                distinct = set(t)
                dr = float(len(distinct)) / nt
                hits = {
                    lg: sum(1 for w in t if w in stop_sets[lg])
                    for lg in langs
                }
                sr = float(hits[lang]) / nt
                wl = float(sum(len(w) for w in t)) / nt
                sw = min(sr * 4.0, 1.0)
                len_ok = 1.0 if 2.0 <= wl <= 12.0 else 0.0
                # tie-break lexicographically smallest among max hits
                mx = max(hits.values())
                pred = "und" if mx == 0 else min(
                    lg for lg in langs if hits[lg] == mx
                )
                # word hashes once; reused by rolling hash + simhash
                digests = [md5(w.encode()).hexdigest() for w in t]
                rh = 0
                for d in digests:
                    rh = (rh * 31 + int(d[:8], 16)) % mod
                balances = [0] * bits
                for d in digests:
                    h = int(d[:15], 16)
                    for k in range(bits):
                        balances[k] += ((h >> k) & 1) * 2 - 1
                sh = 0
                for k in range(bits):
                    if balances[k] > 0:
                        sh |= 1 << k
                cols["n_tokens"][i] = nt
                cols["n_bpe_tokens"][i] = len(bpe_re.findall(low))
                cols["distinct_ratio"][i] = dr
                cols[f"stopword_ratio_{lang}"][i] = sr
                cols["lang_pred"][i] = pred
                cols["quality"][i] = (sw + dr + len_ok) / 3.0
                cols["fingerprint"][i] = md5(
                    " ".join(sorted(distinct)).encode()
                ).hexdigest()
                cols["rolling_hash"][i] = rh
                cols["simhash"][i] = sh
            out = pdf.copy()
            for k, v in cols.items():
                out[k] = v
            # nullable ints (null text rows stay None, like the Column path)
            out["n_tokens"] = out["n_tokens"].astype("Int32")
            out["n_bpe_tokens"] = out["n_bpe_tokens"].astype("Int32")
            yield out

    return df.mapInPandas(kernel, out_schema)


def with_text_features(
    df: DataFrame, text_col: str = "text", lang: str = "en", bits: int = 16
) -> DataFrame:
    """All text metrics in one pass: stages the token and word-hash
    arrays in their own projections (computed once per row, shared by
    every metric), then projects the full feature set."""
    t = F.col("__tokens")
    staged = (
        df.withColumn("__tokens", tokens(F.col(text_col)))
        .withColumn("__wh8", word_hashes(t, 8))
        .withColumn("__wh15", word_hashes(t, 15))
    )
    out = staged.select(
        "*",
        token_count_from_tokens(t).alias("n_tokens"),
        bpe_token_count(F.col(text_col)).alias("n_bpe_tokens"),
        distinct_ratio_from_tokens(t).alias("distinct_ratio"),
        stopword_ratio_from_tokens(t, lang).alias(f"stopword_ratio_{lang}"),
        lang_id_from_tokens(t).alias("lang_pred"),
        quality_score_from_tokens(t, lang).alias("quality"),
        fingerprint_from_tokens(t).alias("fingerprint"),
        rolling_hash_from_hashes(F.col("__wh8")).alias("rolling_hash"),
        simhash_from_hashes(F.col("__wh15"), bits).alias("simhash"),
    )
    return out.drop("__tokens", "__wh8", "__wh15")


# ---------------------------------------------------------------------------
# Corpus-level vocabulary statistics (heavy hitters, TF-IDF)
# ---------------------------------------------------------------------------

def top_tokens(
    df: DataFrame,
    text_col: str = "text",
    k: int = 10,
    group_col: str | None = None,
) -> DataFrame:
    """Per-group heavy hitters over the whitespace vocabulary — the
    vocabulary-building / corpus-inspection step of training-data
    pipelines (token frequency tables, contamination tells, boilerplate
    detection). Rank is deterministic: count desc, token asc.

    Output: [group_col,] token, cnt, rank (1-based, rank <= k).

    Scale shape (100 TB): explode -> groupBy(group, token) COUNT gets a
    map-side partial aggregate (the shuffle carries one row per
    distinct (group, token) per map task, not per occurrence); the
    top-k then reuses ``topk_per_query``'s two-stage partial pattern,
    so no global per-group sort and no single-reducer hot group ever
    materializes. Zipf guarantees the count agg's reduce side is small.
    """
    from osm_legal_default_speeds_spark.operators.similarity import (
        topk_per_query,
    )

    gcols = [group_col] if group_col else []
    exploded = df.select(
        *gcols, F.explode(tokens(F.col(text_col))).alias("token")
    )
    counted = exploded.groupBy(*gcols, "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    if not group_col:
        counted = counted.withColumn("__g", F.lit(0))
        gkey = "__g"
    else:
        gkey = group_col
    ranked = topk_per_query(
        counted, k, query_id_col=gkey, id_col="token", sim_col="cnt"
    )
    out = ranked.select(
        *gcols, "token", F.col("cnt").cast("long").alias("cnt"),
        F.col("rank"),
    )
    return out


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    The idf factor is the LINEAR inverse document frequency N/df (not
    log): multiplication and division are correctly-rounded IEEE
    doubles, so the Spark and DuckDB twins are bit-identical — a log
    idf would differ in the last ulp between JVM StrictMath and libm
    and break hash equality. The top-k ORDER is identical under any
    monotone idf transform, so the standard log variant ranks the same
    terms. Ties: score desc, token asc.

    Output: id_col, token, score (tf * N / df, double), rank.

    Scale shape: two shuffles (tf groupBy keyed by (doc, token), df
    groupBy keyed by token — both map-side combined), one shuffle
    equi-join on token (vocabulary x doc-term frame; AQE handles the
    Zipf-head skew — hot tokens are exactly the high-df ones whose
    score collapses), then the two-stage partial top-k per doc. The
    corpus size N is computed once and joined as a broadcast scalar,
    not collected through the driver at plan time. The raw tf is not
    carried through the top-k (recovering it would re-shuffle the
    doc-term frame for a join-back); a caller needing it can divide
    score by N/df.
    """
    from osm_legal_default_speeds_spark.operators.similarity import (
        topk_per_query,
    )

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    tf = tok.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    n = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "token",
            "tf",
            (
                F.col("tf").cast("double")
                * (F.col("__n").cast("double") / F.col("df").cast("double"))
            ).alias("score"),
        )
    )
    ranked = topk_per_query(
        scored, k, query_id_col=id_col, id_col="token", sim_col="score"
    )
    return ranked.select(id_col, "token", "score", "rank")


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 3,
) -> DataFrame:
    """Per-document repetition signals (the Gopher-style quality
    filters for boilerplate / degenerate generation):

    - ``dup_ngram_ratio``: fraction of word ``ngram_n``-grams that are
      repeats of an earlier gram in the same doc (0 = all distinct).
      Pure per-row array algebra over the shingle array.
    - ``top_token_frac``: frequency of the single most common token
      over the token count (Gopher's "fraction of most frequent word").

    Scale shape: one shuffle. The per-row n-gram ratio rides the
    exploded token frame as one extra double per (doc, token) partial
    row — cheaper than a second join of a per-row projection back onto
    the aggregate. groupBy(doc, token) is map-side combined; the final
    per-doc agg is tiny. Both ratios are single IEEE divisions —
    bit-identical in the DuckDB twin."""
    from osm_legal_default_speeds_spark.operators.dedup import (
        shingles_from_tokens,
    )

    # two staged levels: the token array feeds the shingle transform
    # (inlined it would re-tokenize once per shingle, O(tokens^2)/doc)
    # and the shingle array is referenced three times by the ratio (no
    # HOF CSE — see shingles_from_tokens / CLAUDE.md)
    sh = F.col("__sh")
    dup_ratio = (
        (F.size(sh) - F.size(F.array_distinct(sh))).cast("double")
        / F.size(sh).cast("double")
    )
    exploded = (
        df.withColumn("__t", tokens(F.col(text_col)))
        .withColumn("__sh", shingles_from_tokens(F.col("__t"), ngram_n))
        .select(
            F.col(id_col),
            dup_ratio.alias("__dr"),
            F.explode(F.col("__t")).alias("token"),
        )
    )
    counted = exploded.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("__cnt"), F.first("__dr").alias("__dr")
    )
    return counted.groupBy(id_col).agg(
        F.first("__dr").alias("dup_ngram_ratio"),
        (
            F.max("__cnt").cast("double")
            / F.sum("__cnt").cast("double")
        ).alias("top_token_frac"),
    )
