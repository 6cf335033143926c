"""Corpus-preparation transforms: context-window chunking and PII
redaction — the two row-shaping passes an LLM training pipeline runs
after dedup/quality filtering and before packing.

Both operators are MAP-SIDE ONLY (no shuffle, no Python workers):
chunking is an explode over a per-row start-offset array computed with
native array functions; redaction is a chain of `regexp_replace` /
`regexp_count` expressions that stay inside whole-stage codegen. At
100 TB both scale linearly with input bytes and preserve the input
partitioning — the natural place for them is directly above the
parquet scan, where Catalyst prunes every column except the id and the
text.

Engine-portability (the DuckDB oracle twins compute the identical
result):

- Tokenization is a LITERAL single-space split with empties kept
  (`F.split(text, " ", -1)` == DuckDB `string_split(text, ' ')`),
  unlike the analysis tokenizer in operators.textops which lowercases —
  chunk text must round-trip verbatim.
- Window starts are `{0, stride, 2*stride, ...}` kept while the
  PREVIOUS window has not yet covered the end (`s == 0 OR
  s - stride + chunk_len < n_tokens`): the standard overlap-chunking
  loop "emit, then advance by stride until the window reaches the
  end", expressed as one `filter(sequence(...))` per row. The final
  chunk may be shorter than chunk_len (never empty); a document
  shorter than chunk_len yields exactly one chunk.
- Redaction regexes avoid constructs where Java's leftmost-first
  backtracking and RE2's leftmost-longest matching could disagree: no
  alternation of same-start prefixes, only greedy counted classes, so
  both engines select the identical spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    chunk_len: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into overlapping windows of
    ``chunk_len`` tokens advancing by ``stride`` (stride < chunk_len
    gives the classic training-context overlap; stride == chunk_len
    gives disjoint chunks).

    Output: (id_col, chunk_idx, start, n_tok, chunk_text) — one row
    per window, ``chunk_idx = start / stride``. Deterministic in the
    input row alone, so reruns and repartitions produce the same
    chunks.
    """
    if chunk_len <= 0 or stride <= 0:
        raise ValueError("chunk_len and stride must be positive")
    t = F.split(F.col(text_col), " ", -1)
    n = F.size(t)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == F.lit(0))
        | (s - F.lit(stride) + F.lit(chunk_len) < n),
    )
    chunk = F.slice(F.col("__t"), F.col("start") + 1, chunk_len)
    return df.select(
        id_col, t.alias("__t"), F.explode(starts).alias("start")
    ).select(
        id_col,
        (F.col("start") / F.lit(stride)).cast("long").alias("chunk_idx"),
        "start",
        F.size(chunk).alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Deliberately narrow, dialect-portable patterns (see module docstring).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}\b"

_PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ips", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
)


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Append per-category PII match counts plus ``out_col`` with all
    matches replaced by typed placeholders (<EMAIL>, <IP>, <PHONE>).

    Counts are measured on the ORIGINAL text; replacement applies the
    rules in a fixed order (emails first — an address must not be
    half-eaten by the IP rule before it is counted). Pure codegen
    expressions; the regex NFAs compile once per task, not per row.
    """
    text = F.col(text_col)
    out = df
    for count_name, pattern, _ in _PII_RULES:
        out = out.withColumn(
            count_name, F.regexp_count(text, F.lit(pattern))
        )
    clean = text
    for _, pattern, placeholder in _PII_RULES:
        clean = F.regexp_replace(clean, pattern, placeholder)
    return out.withColumn(out_col, clean)
