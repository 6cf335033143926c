"""Ported from BooleanExpressionBuilderTest.kt and
BooleanExpressionTest.kt — normalization goldens ("(a*b)+c" -> "a*b+c")
and evaluator truth tables, via the same single-char mini-grammar the
reference tests use (TestBooleanExpressionParser.kt)."""

import pytest

from osm_legal_default_speeds_spark.functions.tagfilter_ast import Chain
from osm_legal_default_speeds_spark.functions.tagfilter_builder import (
    BooleanExpressionBuilder,
    BuilderError,
)


class _Value:
    """Matcher over a string 'obj' (TestBooleanExpressionValue.kt)."""

    def __init__(self, value):
        self.value = value

    def matches(self, obj):
        return obj == self.value

    def __str__(self):
        return self.value


def parse(text):
    builder = BooleanExpressionBuilder()
    i = 0
    while i < len(text):
        c = text[i]
        if c == "!" and i + 1 < len(text) and text[i + 1].isupper():
            builder.add_not_placeholder(text[i + 1])
            i += 2
            continue
        if c.isupper():
            builder.add_placeholder(c)
        elif c == "*":
            builder.add_and()
        elif c == "+":
            builder.add_or()
        elif c == "(":
            builder.add_open_bracket()
        elif c == ")":
            builder.add_close_bracket()
        else:
            builder.add_value(_Value(c))
        i += 1
    return builder.build()


def check(input_str, expected=None):
    tree = parse(input_str)
    rendered = str(tree).replace(" and ", "*").replace(" or ", "+")
    assert rendered == (expected if expected is not None else input_str)


GOLDENS = [
    ("a", None), ("a*b", None), ("a+b", None),
    ("a*b*c", None), ("a+b+c", None), ("a*b+c", None), ("a+b*c", None),
    ("a+b*c+d", None), ("a*b+c*d", None),
    ("(a)", "a"),
    ("(a*b)", "a*b"), ("(a+b)", "a+b"), ("((a*b))", "a*b"), ("((a+b))", "a+b"),
    ("(a+b)*c", None), ("a*(b+c)", None), ("a*(b+c)*d", None),
    ("(a*b)+c", "a*b+c"), ("(a*b)*c", "a*b*c"), ("(a+b)+c", "a+b+c"),
    ("a+(b*c)", "a+b*c"), ("a*(b*c)", "a*b*c"), ("a+(b+c)", "a+b+c"),
    ("(a*b+c)", "a*b+c"), ("(a+b*c)", "a+b*c"), ("(((a+b*c)))", "a+b*c"),
    ("a+(b+(c+(d)))", "a+b+c+d"), ("a*(b*(c*(d)))", "a*b*c*d"),
    ("a*(b+(c*(d)))", "a*(b+c*d)"), ("a+(b*(c+(d)))", "a+b*(c+d)"),
    ("(((a)+b)+c)+d", "a+b+c+d"), ("(((a)*b)*c)*d", "a*b*c*d"),
    ("(((a)+b)*c)+d", "(a+b)*c+d"), ("(((a)*b)+c)*d", "(a*b+c)*d"),
    ("(a+b*c)*d", "(a+b*c)*d"),
    ("(a+b*c)*d*(e+f*g)*h", "(a+b*c)*d*(e+f*g)*h"),
    ("((a*b)*c)*d*(e*f)", "a*b*c*d*e*f"),
    ("(a+b*(c+d)+e)*f", "(a+b*(c+d)+e)*f"),
]


@pytest.mark.parametrize("input_str,expected", GOLDENS)
def test_builder_goldens(input_str, expected):
    check(input_str, expected)


@pytest.mark.parametrize(
    "bad", ["a+b)", "(a+b))", "((b+c)*a)+d)", "(a+b", "((a+b)", "((a*(b+c))"]
)
def test_unbalanced_brackets(bad):
    with pytest.raises(BuilderError):
        parse(bad)


# --- evaluator truth tables (BooleanExpressionTest.kt) ---

def evaluate(text, placeholder_eval=None):
    expr = parse(text)
    return expr.matches("1", placeholder_eval or (lambda name: False))


def test_match_leaf():
    assert evaluate("1")
    assert not evaluate("0")


def test_match_or():
    assert evaluate("1+1")
    assert evaluate("1+0")
    assert evaluate("0+1")
    assert not evaluate("0+0")
    assert evaluate("0+0+1")


def test_match_and():
    assert evaluate("1*1")
    assert not evaluate("1*0")
    assert not evaluate("0*1")
    assert not evaluate("0*0")
    assert evaluate("1*1*1")
    assert not evaluate("1*1*0")


def test_match_and_in_or():
    assert evaluate("(1*0)+1")
    assert not evaluate("(1*0)+0")
    assert evaluate("(1*1)+0")
    assert evaluate("(1*1)+1")


def test_match_or_in_and():
    assert evaluate("(1+0)*1")
    assert not evaluate("(1+0)*0")
    assert not evaluate("(0+0)*0")
    assert not evaluate("(0+0)*1")


def test_placeholder():
    assert evaluate("A", lambda n: n == "A")
    assert not evaluate("A", lambda n: n == "B")
    assert not evaluate("!A", lambda n: n == "A")
    assert evaluate("!A", lambda n: n == "B")


def test_placeholder_or():
    assert evaluate("A+B", lambda n: n == "A")
    assert evaluate("A+B", lambda n: n == "B")
    assert not evaluate("A+B", lambda n: n == "C")


def test_placeholder_and():
    assert evaluate("A*B", lambda n: n in ("A", "B"))
    assert not evaluate("A*B", lambda n: n == "A")
    assert not evaluate("A*B", lambda n: n == "B")


def test_list_placeholders():
    assert list(parse("A+B").get_placeholders()) == ["A", "B"]
    assert list(parse("A+B+C").get_placeholders()) == ["A", "B", "C"]
    assert list(parse("A*(B+A)*C").get_placeholders()) == ["A", "B", "A", "C"]


def test_list_items():
    def items(text):
        expr = parse(text)
        assert isinstance(expr, Chain)
        return [str(i) for i in expr.get_items()]

    assert items("1+2") == ["1", "2"]
    assert items("1*2") == ["1", "2"]
    assert items("1*(2+3)") == ["1", "2", "3"]
    assert items("(1*2)+3") == ["1", "2", "3"]
