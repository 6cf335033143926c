"""chunk_documents / pii_redact unit tests (pure-Python expectations
computed inline — the DuckDB twins live in the driver contract)."""

import pytest
from pyspark.sql import functions as F

from osm_legal_default_speeds_spark.operators.corpusprep import (
    chunk_documents,
    pii_redact,
)


def _chunks_py(text: str, L: int, S: int):
    """The contract loop: emit [s, s+L), advance by S, stop once a
    window has reached the end."""
    t = text.split(" ")
    out = []
    s = 0
    while True:
        out.append((s // S, s, t[s : s + L]))
        if s + L >= len(t):
            break
        s += S
    return out


@pytest.mark.parametrize(
    "text,L,S",
    [
        ("a b c d e f g h i j", 4, 2),   # overlap
        ("a b c d e f g h i j", 3, 3),   # disjoint
        ("a b c d e f g", 4, 2),         # short tail window
        ("a b", 5, 2),                   # doc shorter than window
        ("solo", 2, 1),                  # single token
        ("", 3, 2),                      # empty text -> [''] one chunk
        ("x  y", 2, 1),                  # double space -> empty token kept
    ],
)
def test_chunk_matches_reference_loop(spark, text, L, S):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r.chunk_idx, r.start, r.n_tok, r.chunk_text)
        for r in chunk_documents(df, L, S).orderBy("start").collect()
    ]
    want = [(i, s, len(c), " ".join(c)) for i, s, c in _chunks_py(text, L, S)]
    assert got == want


def test_chunk_covers_every_token_once_when_disjoint(spark):
    n, L = 101, 7
    text = " ".join(f"t{i}" for i in range(n))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, L, L).orderBy("start").collect()
    rebuilt = " ".join(r.chunk_text for r in rows)
    assert rebuilt == text
    assert [r.n_tok for r in rows[:-1]] == [L] * (len(rows) - 1)
    assert rows[-1].n_tok == n - L * (len(rows) - 1)


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, 0, 1)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, -2)


def test_pii_redact_counts_and_replaces(spark):
    rows = [
        (1, "mail bob.smith+x@sub.example.org now"),
        (2, "hosts 10.0.0.1 and 192.168.255.254 up"),
        (3, "call +4512345678 today"),
        (4, "a@b.co or c_d%e@f-g.io; ip 1.2.3.4; tel +123456789012345"),
        (5, "nothing here: version 1.2, a@b (no tld), +123 too short"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (1, 0, 0)
    assert got[1].clean_text == "mail <EMAIL> now"
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 2, 0)
    assert got[2].clean_text == "hosts <IP> and <IP> up"
    assert got[3].clean_text == "call <PHONE> today"
    assert (got[4].n_emails, got[4].n_ips, got[4].n_phones) == (2, 1, 1)
    assert got[4].clean_text == "<EMAIL> or <EMAIL>; ip <IP>; tel <PHONE>"
    assert (got[5].n_emails, got[5].n_ips, got[5].n_phones) == (0, 0, 0)
    assert got[5].clean_text == rows[4][1]
    assert got[6].clean_text is None and got[6].n_emails is None


def test_pii_email_not_eaten_by_ip_rule(spark):
    # digits+dots inside an address must redact as ONE email, not an IP
    df = spark.createDataFrame(
        [(1, "x 1.2.3.4u@example.com y")], "doc_id long, text string"
    )
    r = pii_redact(df).collect()[0]
    assert r.clean_text == "x <EMAIL> y"
    assert (r.n_emails, r.n_ips) == (1, 0)


def test_chunk_plan_is_map_side_only(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = chunk_documents(df, 2, 1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# clean_lines / dedup_lines
# ---------------------------------------------------------------------------


def test_clean_lines_rules(spark):
    doc = "\n".join(
        [
            "this line is a keeper.",          # kept
            "no terminal punctuation here",    # dropped: no . ! ? "
            "too short.",                      # dropped: < 3 words
            "shouting is fine too!",           # kept
            'quoted lines also count."',       # kept
            "contains { a brace in it.",       # dropped: deny substring
            "click here for JavaScript magic.",  # dropped: case-folded deny
            "Lorem Ipsum dolor sit amet.",     # dropped: deny
            "is this a question?",             # kept
        ]
    )
    from osm_legal_default_speeds_spark.operators.corpusprep import clean_lines

    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = clean_lines(df).collect()[0]
    assert r.clean_text == "\n".join(
        [
            "this line is a keeper.",
            "shouting is fine too!",
            'quoted lines also count."',
            "is this a question?",
        ]
    )
    assert (r.n_lines_kept, r.n_lines_dropped) == (4, 5)


def test_clean_lines_empty_and_all_dropped(spark):
    from osm_legal_default_speeds_spark.operators.corpusprep import clean_lines

    df = spark.createDataFrame(
        [(1, ""), (2, "nope\nstill nope")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in clean_lines(df).collect()}
    # empty text splits to [''], which fails every rule
    assert got[1].clean_text == "" and got[1].n_lines_dropped == 1
    assert got[2].clean_text == "" and got[2].n_lines_kept == 0


def test_clean_lines_is_map_side_only(spark):
    from osm_legal_default_speeds_spark.operators.corpusprep import clean_lines

    df = spark.createDataFrame([(1, "a b c.")], "doc_id long, text string")
    plan = clean_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_lines_removes_boilerplate_preserves_order(spark):
    footer = "all rights reserved."
    rows = [
        (1, f"alpha unique one.\n{footer}\nbeta unique one."),
        (2, f"{footer}\nalpha unique two."),
        (3, f"gamma unique three.\n{footer}"),
        (4, "delta has no footer at all."),
    ]
    from osm_legal_default_speeds_spark.operators.corpusprep import dedup_lines

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_docs=3).collect()}
    assert got[1].clean_text == "alpha unique one.\nbeta unique one."
    assert got[2].clean_text == "alpha unique two."
    assert got[3].clean_text == "gamma unique three."
    assert got[4].clean_text == rows[3][1]
    assert [got[i].n_lines_dropped for i in (1, 2, 3, 4)] == [1, 1, 1, 0]


def test_dedup_lines_counts_distinct_docs_not_occurrences(spark):
    # a line repeated 5x inside ONE doc is not boilerplate
    rep = "repeat me."
    rows = [(1, "\n".join([rep] * 5)), (2, "other text here.")]
    from osm_legal_default_speeds_spark.operators.corpusprep import dedup_lines

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert got[1].clean_text == "\n".join([rep] * 5)
    assert got[1].n_lines_dropped == 0


def test_dedup_lines_no_common_lines_is_identity(spark):
    rows = [(1, "one of a kind."), (2, "also unique.")]
    from osm_legal_default_speeds_spark.operators.corpusprep import dedup_lines

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert got[1].clean_text == rows[0][1]
    assert got[2].clean_text == rows[1][1]


def test_chunk_rejects_gapped_stride(spark):
    # stride > chunk_len leaves tokens covered by no chunk — refused
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, 3, 5)


def test_clean_lines_crlf_normalized(spark):
    # CRLF documents: without the literal CRLF->LF replace every line
    # would end in \r and fail the terminal-punctuation check
    from osm_legal_default_speeds_spark.operators.corpusprep import clean_lines

    doc = "good sentence number one.\r\nno punctuation line\r\ngood two more here!"
    df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    r = clean_lines(df).collect()[0]
    assert r.clean_text == "good sentence number one.\ngood two more here!"
    assert (r.n_lines_kept, r.n_lines_dropped) == (2, 1)


def test_dedup_lines_keeps_empty_lines(spark):
    # blank paragraph separators appear in every multi-paragraph doc;
    # they are never boilerplate and must survive
    from osm_legal_default_speeds_spark.operators.corpusprep import dedup_lines

    rows = [
        (1, "first para one.\n\nsecond para one."),
        (2, "first para two.\n\nsecond para two."),
        (3, "first para three.\n\nsecond para three."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dedup_lines(df, min_docs=3).collect()}
    for i, (_, text) in enumerate(rows, start=1):
        assert got[i].clean_text == text
        assert got[i].n_lines_dropped == 0
