"""Property-based differential tests (hypothesis): randomly generated
filter expressions and tag maps must evaluate identically through

1. the pure-Python AST evaluator (pinned by the ported Kotlin corpus),
2. the native Column compiler (JVM/codegen path), and
3. the pure-Python engine vs the Spark inference operator (sampled).

The generator produces syntactically valid expressions by
construction (keys/values from small alphabets incl. regex-meta and
unit forms, arbitrary and/or/not nesting), so this explores corners
the hand-written corpus can't enumerate — anchored-fullmatch regexes,
absent-key semantics of every negated atom, unit-compare null
propagation, precedence.
"""

import pytest
from hypothesis import given, settings, strategies as st

from osm_legal_default_speeds_spark.functions.tagfilter_parser import (
    parse_tag_filter,
)

KEYS = ["highway", "lit", "maxspeed", "x", "name:en"]
# "residential\n" pins the \A/\z anchoring: Java's $ matches before a
# final line terminator, so a ^$-anchored rlike accepts the trailing-
# newline value that re.fullmatch (and the reference's matchEntire)
# reject — the differential must cover it or the engines drift
VALUES = [
    "yes", "no", "residential", "30 mph", "50", "a b", "3.5t", "",
    "residential\n",
]
REGEXES = ["yes|no", "res.*", ".*way", "[a-z]+", "3.*"]
NUMBERS = ["3", "3.5", "3.5st", "48.3", "30mph"]


def quoted(s: str) -> str:
    return '"' + s.replace('"', '\\"') + '"'


atom_st = st.one_of(
    st.sampled_from(KEYS).map(lambda k: quoted(k)),
    st.sampled_from(KEYS).map(lambda k: "!" + quoted(k)),
    st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)).map(
        lambda kv: f"{quoted(kv[0])} = {quoted(kv[1])}"
    ),
    st.tuples(st.sampled_from(KEYS), st.sampled_from(VALUES)).map(
        lambda kv: f"{quoted(kv[0])} != {quoted(kv[1])}"
    ),
    st.sampled_from(REGEXES).map(lambda r: f"~{quoted(r)}"),
    st.sampled_from(REGEXES).map(lambda r: f"!~{quoted(r)}"),
    st.tuples(st.sampled_from(KEYS), st.sampled_from(REGEXES)).map(
        lambda kv: f"{quoted(kv[0])} ~ {quoted(kv[1])}"
    ),
    st.tuples(st.sampled_from(KEYS), st.sampled_from(REGEXES)).map(
        lambda kv: f"{quoted(kv[0])} !~ {quoted(kv[1])}"
    ),
    st.tuples(st.sampled_from(REGEXES), st.sampled_from(REGEXES)).map(
        lambda kv: f"~{quoted(kv[0])} ~ {quoted(kv[1])}"
    ),
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["<", ">", "<=", ">="]),
        st.sampled_from(NUMBERS),
    ).map(lambda t: f"{quoted(t[0])} {t[1]} {t[2]}"),  # operand is an unquoted word (reference :194)
)


def expr_st(depth: int = 3):
    if depth == 0:
        return atom_st
    sub = expr_st(depth - 1)
    return st.one_of(
        atom_st,
        st.tuples(sub, sub).map(lambda t: f"({t[0]} and {t[1]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} or {t[1]})"),
        st.tuples(sub, sub, sub).map(
            lambda t: f"{t[0]} or {t[1]} and {t[2]}"
        ),
        sub.map(lambda e: f"!({e})"),
    )


tags_st = st.dictionaries(
    st.sampled_from(KEYS), st.sampled_from(VALUES), max_size=4
)


@given(expr=expr_st(), tags=tags_st)
@settings(max_examples=300, deadline=None)
def test_parser_is_total_and_pure(expr, tags):
    """Every generated expression parses; evaluation is deterministic
    and boolean."""
    ast = parse_tag_filter(expr)
    r1 = ast.matches(tags, lambda n: False)
    r2 = ast.matches(tags, lambda n: False)
    assert r1 is r2 and isinstance(r1, bool)


@pytest.fixture(scope="module")
def _spark(spark):
    return spark


def test_native_compiler_differential_random(spark):
    """Bulk differential: N random (expr, tags) pairs evaluated through
    the native Column path in ONE DataFrame pass vs the AST evaluator.
    (Driving Spark per-hypothesis-example would be minutes per case;
    sampling via hypothesis' generator machinery, executing in bulk.)"""
    import random

    from pyspark.sql import Row
    from pyspark.sql.types import MapType, StringType, StructField, StructType

    from osm_legal_default_speeds_spark.functions.sql_exprs import (
        filter_to_column,
    )

    rng = random.Random(1234)

    def sample_expr(depth=2):
        choice = rng.randrange(5)
        if depth == 0 or choice == 0:
            k = rng.choice(KEYS)
            form = rng.randrange(7)
            if form == 0:
                return quoted(k)
            if form == 1:
                return "!" + quoted(k)
            if form == 2:
                return f"{quoted(k)} = {quoted(rng.choice(VALUES))}"
            if form == 3:
                return f"{quoted(k)} != {quoted(rng.choice(VALUES))}"
            if form == 4:
                return f"{quoted(k)} ~ {quoted(rng.choice(REGEXES))}"
            if form == 5:
                return f"{quoted(k)} !~ {quoted(rng.choice(REGEXES))}"
            op = rng.choice(["<", ">", "<=", ">="])
            return f"{quoted(k)} {op} {rng.choice(NUMBERS)}"
        a, b = sample_expr(depth - 1), sample_expr(depth - 1)
        if choice == 1:
            return f"({a} and {b})"
        if choice == 2:
            return f"({a} or {b})"
        if choice == 3:
            return f"!({a})"
        return f"{a} or {b} and {sample_expr(depth - 1)}"

    def sample_tags():
        return {
            k: rng.choice(VALUES)
            for k in rng.sample(KEYS, rng.randrange(0, 4))
        }

    exprs = [sample_expr() for _ in range(40)]
    tag_maps = [sample_tags() for _ in range(30)]

    schema = StructType(
        [
            StructField("case_id", StringType()),
            StructField("tags", MapType(StringType(), StringType())),
        ]
    )
    df = spark.createDataFrame(
        [Row(case_id=str(i), tags=t) for i, t in enumerate(tag_maps)], schema
    )
    cols = [
        filter_to_column(e, "tags").alias(f"f{j}") for j, e in enumerate(exprs)
    ]
    got = {r["case_id"]: r for r in df.select("case_id", *cols).collect()}
    for i, tags in enumerate(tag_maps):
        for j, e in enumerate(exprs):
            expected = parse_tag_filter(e).matches(tags, lambda n: False)
            actual = got[str(i)][f"f{j}"]
            assert actual == expected, f"expr={e!r} tags={tags!r}"


def test_native_cascade_differential_random_rulesets(spark):
    """Randomized rule sets (placeholder DAGs, fuzzy/relation filters,
    null-separator scan orders) x random inputs: the all-native Column
    cascade must equal the pure-Python engine on every case. Bulk: one
    Spark pass per rule set."""
    import random

    from pyspark.sql import Row

    from osm_legal_default_speeds_spark import (
        LegalDefaultSpeedsEngine,
        RoadTypeDef,
        RoadTypeFilterDef,
        compile_ruleset,
    )
    from osm_legal_default_speeds_spark.plans.native_cascade import (
        infer_speed_limits_native,
    )
    from tests.test_spark_inference import INPUT_SCHEMA

    rng = random.Random(77)

    def sample_atom():
        k = rng.choice(KEYS)
        form = rng.randrange(6)
        if form == 0:
            return quoted(k)
        if form == 1:
            return "!" + quoted(k)
        if form == 2:
            return f"{quoted(k)} = {quoted(rng.choice(VALUES))}"
        if form == 3:
            return f"{quoted(k)} ~ {quoted(rng.choice(REGEXES))}"
        if form == 4:
            op = rng.choice(["<", ">", "<=", ">="])
            return f"{quoted(k)} {op} {rng.choice(NUMBERS)}"
        return f"{quoted(k)} != {quoted(rng.choice(VALUES))}"

    def sample_filter(prior_names):
        parts = [sample_atom()]
        if prior_names and rng.random() < 0.5:
            ref = rng.choice(prior_names)
            parts.append(
                "!{%s}" % ref if rng.random() < 0.3 else "{%s}" % ref
            )
        if rng.random() < 0.4:
            parts.append(sample_atom())
        op = " and " if rng.random() < 0.5 else " or "
        return op.join(parts)

    def sample_ruleset():
        names = [f"rt{i}" for i in range(rng.randrange(3, 8))]
        road_types = {}
        for i, n in enumerate(names):
            prior = names[:i]  # DAG by construction
            road_types[n] = RoadTypeFilterDef(
                sample_filter(prior) if rng.random() < 0.9 else None,
                sample_filter(prior) if rng.random() < 0.4 else None,
                "type=route and ref~ZA.*" if rng.random() < 0.3 else None,
            )
        rules = {}
        for cc in ["AA", "BB"]:
            n_rules = rng.randrange(1, 7)
            lst = []
            for j in range(n_rules):
                if rng.random() < 0.25 and not any(
                    r.name is None for r in lst
                ):
                    lst.append(
                        RoadTypeDef(None, {"maxspeed": str(40 + 10 * j)})
                    )
                else:
                    tags = {"maxspeed": str(30 + 10 * j)}
                    if rng.random() < 0.4:
                        tags["maxspeed:hgv"] = str(20 + 10 * j)
                    if rng.random() < 0.3:
                        tags["maxspeed:conditional"] = (
                            f"{70 + 10 * j} @ (wet); {10 + 10 * j} @ (snow)"
                        )
                    if rng.random() < 0.2:
                        tags["maxspeed:hgv:conditional"] = (
                            f"{60 + 10 * j} @ (x); {5 + 10 * j} @ (y)"
                        )
                    lst.append(RoadTypeDef(rng.choice(names), tags))
            rules[cc] = lst
        return compile_ruleset(road_types, rules)

    def sample_case():
        cc = rng.choice(["AA", "BB", "AA-XX", "ZZ", None])
        tags = {
            k: rng.choice(VALUES + ["50", "30 mph", "RO:urban"])
            for k in rng.sample(KEYS, rng.randrange(0, 4))
        }
        if rng.random() < 0.3:
            tags["maxspeed"] = rng.choice(
                ["50", "30 mph", "RO:urban", "none", "60"]
            )
        if rng.random() < 0.15:
            tags["maxspeed:hgv"] = rng.choice(["40", "20 mph"])
        rels = (
            [{"type": "route", "ref": rng.choice(["ZA 1", "Bus 9"])}]
            if rng.random() < 0.3
            else []
        )
        ovr = (
            {f"rt{rng.randrange(3)}": rng.random() < 0.5}
            if rng.random() < 0.2
            else None
        )
        return (cc, tags, rels, ovr)

    for trial in range(4):
        ruleset = sample_ruleset()
        engine = LegalDefaultSpeedsEngine(ruleset=ruleset)
        cases = [sample_case() for _ in range(40)]
        rows = [
            Row(road_id=f"r{i}", country_code=cc, tags=t,
                relations_tags=rel, overrides=o)
            for i, (cc, t, rel, o) in enumerate(cases)
        ]
        df = spark.createDataFrame(rows, INPUT_SCHEMA)
        out = infer_speed_limits_native(
            df, ruleset, relations_col="relations_tags",
            overrides_col="overrides",
        )
        got = {r["road_id"]: r["speed_limit"] for r in out.collect()}
        for i, (cc, t, rel, o) in enumerate(cases):
            exp = (
                engine.get_speed_limits(cc, t, rel, overrides=o)
                if cc is not None
                else None
            )
            g = got[f"r{i}"]
            if exp is None:
                assert g is None, (trial, i, cc, t, g)
            else:
                assert g is not None, (trial, i, cc, t, exp)
                assert (
                    g.road_type_name, g.tags, g.certitude
                ) == (exp.road_type_name, exp.tags, exp.certitude), (
                    trial, i, cc, t, rel, o
                )
