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
    if stride > chunk_len:
        # gapped windows silently drop the tokens between chunks (and
        # possibly a document's tail) from the training data — refuse
        # rather than degrade, like the LSH banding guards
        raise ValueError(
            f"stride ({stride}) > chunk_len ({chunk_len}) would leave "
            f"tokens covered by no chunk"
        )
    # stage the split array and its size as COLUMNS before anything
    # references them: Catalyst does not CSE duplicated subtrees and
    # the filter lambda below evaluates its predicate per sequence
    # element — an inlined size(split(text)) there costs O(tokens) per
    # candidate start, turning the linear pass quadratic on long docs
    # (CollapseProject keeps the staging because the aliases are
    # referenced more than once and are not cheap)
    t = F.split(F.col(text_col), " ", -1)
    staged = df.select(id_col, t.alias("__t")).select(
        id_col, "__t", F.size("__t").alias("__n")
    )
    n = F.col("__n")
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(stride)),
        lambda s: (s == F.lit(0))
        | (s - F.lit(stride) + F.lit(chunk_len) < n),
    )
    chunk = F.slice(F.col("__t"), F.col("start") + 1, chunk_len)
    return staged.select(
        id_col, "__t", F.explode(starts).alias("start")
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


# ---------------------------------------------------------------------------
# Line-level cleaning (C4-style) and cross-corpus boilerplate removal
# ---------------------------------------------------------------------------

_TERMINALS = (".", "!", "?", '"')


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    min_words: int = 3,
    deny_substrings: tuple[str, ...] = ("{", "javascript", "lorem ipsum"),
) -> DataFrame:
    """C4-style line filtering inside each document: keep only lines
    that (a) end in terminal punctuation (. ! ? \"), (b) have at least
    ``min_words`` space-separated NON-EMPTY words (consecutive spaces
    don't mint words), and (c) contain none of the
    lowercase ``deny_substrings``. Appends ``out_col`` (kept lines
    re-joined with newlines) plus ``n_lines_kept`` / ``n_lines_dropped``.

    Map-side only: one split + one array filter per row, no shuffle,
    no Python. The per-line predicate avoids regex entirely (terminal
    check is a last-character IN, word count a split length) so the
    DuckDB twin is trivially identical. CRLF newlines are normalized
    to LF before splitting (a literal replace — without it every line
    of a CRLF document ends in \\r and fails the terminal-punctuation
    check, dropping the whole corpus); lines are NOT trimmed of other
    whitespace — C4 drops a line with trailing spaces after the
    period, and so does this."""
    lines = F.split(
        F.replace(F.col(text_col), F.lit("\r\n"), F.lit("\n")), "\n", -1
    )

    def keep(line):
        last = F.substring(line, -1, 1)
        cond = last.isin(*_TERMINALS)
        # count non-empty tokens: a bare split-length counts the ''
        # tokens consecutive spaces produce, letting space-padded
        # lines defeat the min_words contract
        words = F.filter(
            F.split(line, " ", -1), lambda w: w != F.lit("")
        )
        cond = cond & (F.size(words) >= F.lit(min_words))
        low = F.lower(line)
        for s in deny_substrings:
            cond = cond & ~low.contains(F.lit(s))
        return cond

    # stage the split and the interpreted kept-filter as columns: the
    # three outputs below reference them 2-3x each, and Catalyst does
    # not CSE duplicated subtrees — inlined, the per-line deny-scan
    # filter would run three times per row (CLAUDE.md)
    staged = df.withColumn("__cl_lines", lines).withColumn(
        "__cl_kept", F.filter(F.col("__cl_lines"), keep)
    )
    kept, lns = F.col("__cl_kept"), F.col("__cl_lines")
    return (
        staged.withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn("n_lines_kept", F.size(kept).cast("long"))
        .withColumn(
            "n_lines_dropped", (F.size(lns) - F.size(kept)).cast("long")
        )
        .drop("__cl_lines", "__cl_kept")
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    out_col: str = "clean_text",
) -> DataFrame:
    """Remove every line that occurs in >= ``min_docs`` DISTINCT
    documents (the CCNet/RefinedWeb boilerplate pass: navigation bars,
    cookie banners, license footers repeat across pages; prose does
    not). EMPTY lines are never boilerplate: any multi-paragraph
    corpus has blank separator lines in >= min_docs documents, and
    treating them as common would strip every paragraph break
    corpus-wide — the reference passes exclude empty/short lines from
    the candidate set for exactly this reason. CRLF newlines are
    normalized to LF before splitting (same as :func:`clean_lines` —
    without it the same banner hashes differently in CRLF vs LF
    documents and neither copy reaches ``min_docs``). Appends
    ``out_col`` with surviving lines re-joined in original order, plus
    ``n_lines_dropped``.

    Plan: ONE aggregation shuffle finds the boilerplate set — lines
    explode to md5 hashes (16-byte keys, never full line text, cross
    the exchange; map-side partial combine collapses per-partition
    repeats), `count(DISTINCT doc)` >= min_docs. That set is by
    construction the corpus' shared boilerplate — small at any scale
    (it grows with the number of distinct templates, not with rows) —
    so it broadcasts as ONE array column and reconstruction is a
    map-side array filter over the original rows: line order is
    preserved for free because the doc row is never taken apart. The
    O(|boilerplate|) membership probe per line is an interpreted HOF
    scan; swap the probe array for a broadcast-join against exploded
    lines if a corpus ever yields a boilerplate set too large to probe
    — at that point the corpus is mostly template and line dedup is
    the wrong tool anyway."""
    lines = F.split(
        F.replace(F.col(text_col), F.lit("\r\n"), F.lit("\n")), "\n", -1
    )
    common = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(lines).alias("__line"),
        )
        .where(F.col("__line") != "")  # see docstring: blank != common
        .groupBy(F.md5(F.col("__line")).alias("__h"))
        .agg(F.count_distinct(F.col("__id")).alias("__n"))
        .where(F.col("__n") >= F.lit(min_docs))
        .groupBy()
        .agg(F.sort_array(F.collect_list("__h")).alias("__common"))
    )
    # stage the split and the kept-filter as columns after the join:
    # out_col and n_lines_dropped each reference kept, and the
    # O(lines x |boilerplate|) membership probe is the pass's dominant
    # cost — inlined (no CSE for interpreted HOFs, CLAUDE.md) it would
    # run twice per row
    out = (
        df.crossJoin(F.broadcast(common))
        .withColumn("__dl_lines", lines)
        .withColumn(
            "__dl_kept",
            F.filter(
                F.col("__dl_lines"),
                lambda line: ~F.array_contains(
                    F.col("__common"), F.md5(line)
                ),
            ),
        )
    )
    kept, lns = F.col("__dl_kept"), F.col("__dl_lines")
    return (
        out.withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn(
            "n_lines_dropped",
            (F.size(lns) - F.size(kept)).cast("long"),
        )
        .drop("__common", "__dl_lines", "__dl_kept")
    )
