"""Text-analysis operators for training-data pipelines: tokenization,
quality scoring, language ID, token counting, document fingerprinting.

Everything is native ``pyspark.sql.functions`` Column algebra — string
splits, higher-order array functions, regexes — so the whole layer stays
inside whole-stage codegen (no Python in the hot path) and is
SQL-portable for the DuckDB differential oracle.

Scale notes: all operators are narrow (per-row) projections — zero
shuffles; they compose with the dedup/similarity layers which do the
wide work on these compact derived columns instead of raw text.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

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


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokens (letter runs, digit runs, single
    symbols) — the standard proxy for LLM token budgeting."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_TOKEN_REGEX), 0))


def distinct_ratio(text: Column) -> Column:
    """Unique-token fraction — near 0 for degenerate repeated text."""
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def stopword_hits(text: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    t = tokens(text)
    return F.size(F.filter(t, lambda w: w.isin(*words)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_hits(text, lang).cast("double") / token_count(text)


def mean_word_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return total.cast("double") / F.size(t)


def quality_score(text: Column, lang: str = "en") -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence
    (natural language), lexical diversity, and sane word lengths.
    Deliberately simple arithmetic so the oracle can replicate it."""
    sw = F.least(stopword_ratio(text, lang) * 4.0, F.lit(1.0))
    dr = distinct_ratio(text)
    wl = mean_word_len(text)
    len_ok = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (sw + dr + len_ok) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Heuristic language ID: the language with the most stopword hits
    wins; ties break lexicographically (deterministic); zero hits
    everywhere -> 'und' (undetermined)."""
    scored = F.array(
        *[
            F.struct(
                (-stopword_hits(text, lang)).alias("neg_hits"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(LANG_STOPWORDS)
        ]
    )
    best = F.array_min(scored)
    return F.when(best.getField("neg_hits") < 0, best.getField("lang")).otherwise(
        F.lit("und")
    )


def fingerprint(text: Column) -> Column:
    """Bag-of-words document fingerprint: md5 of the sorted distinct
    token set — canonical-form hash invariant to word order and
    repetition (the classic dedup fingerprint)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(text))), " ")
    return F.md5(canon)


def rolling_hash(text: Column, base: int = 31, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over token md5-prefixes — an
    order-sensitive counterpart to ``fingerprint`` (distinguishes
    permutations). Native left-to-right fold."""
    t = tokens(text)
    word_h = F.transform(
        t, lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        word_h,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * base + h) % mod,
    )


def simhash(text: Column, bits: int = 16) -> Column:
    """SimHash fingerprint over whitespace tokens: per bit position k,
    the sign of sum(+-1) across token hashes decides bit k. Token hash =
    first 15 hex chars of md5 (engine-portable, unlike murmur/xxhash).
    Native expressions only — the token-hash array is computed once and
    folded per bit."""
    t = tokens(text)
    word_h = F.transform(
        t, lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10).cast("long")
    )
    def bit_balance(k: int) -> Column:
        # NB: PySpark derives HOF arity from the lambda's parameter
        # count — extra default args would become lambda variables.
        return F.aggregate(
            word_h,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.shiftright(h, k).bitwiseAND(F.lit(1)) * 2 - 1,
        )

    out = F.lit(0).cast("long")
    for k in range(bits):
        out = out + F.when(bit_balance(k) > 0, F.lit(1 << k)).otherwise(F.lit(0))
    return out


def hamming_distance(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
