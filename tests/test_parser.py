"""Ported from TagFilterExpressionParserTest.kt:1-504 — the full
filter-DSL grammar corpus: operators, precedence, quoting/escaping,
whitespace, reserved words, failure modes, placeholders, units."""

import pytest

from osm_legal_default_speeds_spark.functions.tagfilter_parser import (
    ParseError,
    parse_tag_filter,
)


def matches(tags, expr, evaluate=None):
    assert parse_tag_filter(expr).matches(tags, evaluate or (lambda n: False))


def not_matches(tags, expr, evaluate=None):
    assert not parse_tag_filter(expr).matches(tags, evaluate or (lambda n: False))


def should_fail(expr):
    with pytest.raises(ParseError):
        parse_tag_filter(expr)


def keys(*ks):
    return {k: str(i) for i, k in enumerate(ks)}


def test_fail_if_no_space_after_or_before_and_or():
    should_fail("shop andfail")
    should_fail("'shop'and fail")


def test_fail_on_unknown_like_operator():
    should_fail("~speed > 3")


def test_fail_on_no_number_for_comparison():
    should_fail("speed > walk")


def test_fail_if_tag_key_is_like_reserved_word():
    should_fail("or = yes")
    should_fail("and = yes")


def test_tag_key_like_reserved_word_in_quotes_is_ok():
    tags = {"with": "with"}
    matches(tags, "'with'")
    matches(tags, "'with'='with'")


def test_quotes_are_optional():
    tags = {"shop": "yes"}
    matches(tags, "shop")
    matches(tags, "'shop'")
    matches(tags, '"shop"')


def test_quoting_empty_string():
    matches({"shop": ""}, "shop = ''")


def test_escaping_quotes():
    matches({'shop"': "yes"}, '"shop\\""')
    matches({"shop'": "yes"}, "'shop\\''")
    matches({"shop": 'yes"'}, 'shop = "yes\\""')
    matches({"shop": "yes'"}, "shop = 'yes\\''")
    matches({"sh'op": "yes'"}, "sh\\'op = yes\\'")


def test_unquoted_tag_may_start_with_reserved_word():
    matches({"withdrawn": "with"}, "withdrawn = with")
    matches({"orchard": "or"}, "orchard = or")
    matches({"android": "and"}, "android = and")


def test_tag_key_with_quotation_marks_is_ok():
    matches({"highway = residential or bla": "yes"}, '"highway = residential or bla"')


def test_tag_value_with_quotation_marks_is_ok():
    matches({"highway": "residential or bla"}, 'highway = "residential or bla"')


def test_fail_if_quotation_marks_not_closed():
    should_fail('nodes with "highway = residential or bla')
    should_fail('nodes with highway = "residential or bla')


def test_whitespaces_around_tag_key_do_not_matter():
    tags = {"shop": "yes"}
    matches(tags, "shop")
    matches(tags, " \t\n\t\n shop \t\n\t\n ")
    matches(tags, " \t\n\t\n ( \t\n\t\n shop \t\n\t\n ) \t\n\t\n ")


def test_whitespaces_around_tag_value_do_not_matter():
    tags = {"shop": "yes"}
    matches(tags, "shop=yes")
    matches(tags, "shop \t\n\t\n = \t\n\t\n yes \t\n\t\n ")
    matches(tags, " \t\n\t\n ( \t\n\t\n shop \t\n\t\n = \t\n\t\n yes \t\n\t\n ) \t\n\t\n ")


def test_whitespaces_in_tag_do_matter():
    tags = {" \t\n\t\n shop \t\n\t\n ": " \t\n\t\n yes \t\n\t\n "}
    matches(tags, '" \t\n\t\n shop \t\n\t\n " = " \t\n\t\n yes \t\n\t\n "')


def test_fail_on_dangling_operators():
    should_fail("nodes with highway=")
    should_fail("nodes with highway and")
    should_fail("nodes with highway or ")
    should_fail("shop = yes '")
    should_fail('shop = yes "')
    should_fail("shop = yes and !")
    should_fail("shop = yes and ~")


def test_fail_on_bracket_imbalance():
    should_fail("nodes with (highway")
    should_fail("nodes with (highway = service and (service = alley)")
    should_fail("nodes with highway)")
    should_fail("nodes with (highway = service))")


def test_whitespaces_do_not_matter_for_brackets():
    tags = {"shop": "yes", "fee": "yes"}
    matches(tags, "shop and((fee=yes))")
    matches(tags, "shop and \t\n\t\n ( \t\n\t\n ( \n\t\n\t fee=yes \n\t\n\t ))")


def test_fail_on_unknown_thing_after_tag():
    should_fail("nodes with highway what is this")


def test_fail_if_neither_number_nor_unit_for_comparison():
    should_fail("nodes with width > x")
    should_fail("nodes with width >=x ")
    should_fail("nodes with width < x")
    should_fail("nodes with width <=x")


def test_quotes_for_comparisons_are_not_allowed():
    should_fail("nodes with width >  '3'")
    should_fail("nodes with width >= '3'")
    should_fail("nodes with width < '3'")
    should_fail("nodes with width <= '3'")


def test_tag_negation_not_combinable_with_operator():
    should_fail("nodes with !highway=residential")
    should_fail("nodes with !highway!=residential")
    should_fail("nodes with !highway~residential")
    should_fail("nodes with !highway!~residential")


def test_empty_key_and_value():
    matches({"": ""}, "'' = ''")


def test_not_key_operator():
    matches({}, "!shop")
    matches({}, "!  shop")
    not_matches({"shop": "yes"}, "!shop")


def test_not_key_like_operator():
    matches({}, "!~...")
    matches({}, "!~  ...")
    not_matches({"abc": "yes"}, "!~...")


def test_key_like_operator():
    matches({"abc": "yes"}, "~...")
    matches({"abc": "yes"}, "~   ...")
    not_matches({"ab": "yes"}, "~   ...")


def test_tag_like_operator():
    matches({"abc": "yes"}, "~...~...")
    matches({"abc": "yes"}, "~  ...  ~  ...")
    not_matches({"abc": "ye"}, "~  ...  ~  ...")
    not_matches({"ab": "yes"}, "~  ...  ~  ...")


def test_key_operator():
    matches({"shop": "yes"}, "shop")
    not_matches({"snop": "yes"}, "shop")


def test_has_tag_operator():
    matches({"lit": "yes"}, "lit = yes")
    matches({"lit": "yes"}, "lit=yes")
    matches({"lit": "yes"}, "lit   =   yes")
    not_matches({"lit": "yesnt"}, "lit = yes")


def test_not_has_tag_operator():
    matches({"lit": "no"}, "lit != yes")
    matches({"lit": "no"}, "lit!=yes")
    matches({"lit": "no"}, "lit   !=   yes")
    not_matches({"lit": "yes"}, "lit   !=   yes")


def test_has_tag_value_like_operator():
    matches({"lit": "yes"}, "lit ~ ...")
    matches({"lit": "yes"}, "lit~...")
    matches({"lit": "yes"}, "lit   ~   ...")
    not_matches({"lit": "ye"}, "lit   ~   ...")


def test_not_has_tag_value_like_operator():
    matches({"lit": "ye"}, "lit !~ ...")
    matches({"lit": "ye"}, "lit!~...")
    matches({"lit": "ye"}, "lit   !~   ...")
    not_matches({"lit": "yes"}, "lit   !~   ...")


def test_greater_than():
    matches({"width": "5"}, "width > 3")
    matches({"width": "5"}, "width>3.0")
    matches({"width": "5"}, "width   >   3")
    not_matches({"width": "3"}, "width   >   3")
    matches({"width": "0.4"}, "width>0.3")
    matches({"width": ".4"}, "width>.3")
    not_matches({"width": ".3"}, "width>.3")


def test_greater_or_equal():
    matches({"width": "3"}, "width >= 3")
    matches({"width": "3"}, "width>=3.0")
    matches({"width": "3"}, "width   >=   3")
    not_matches({"width": "2"}, "width   >=   3")
    matches({"width": "0.3"}, "width>=0.3")
    matches({"width": ".3"}, "width>=.3")
    not_matches({"width": ".2"}, "width>=.3")


def test_less_than():
    matches({"width": "2"}, "width < 3")
    matches({"width": "2"}, "width<3.0")
    matches({"width": "2"}, "width   <   3")
    not_matches({"width": "3"}, "width   <   3")
    matches({"width": "0.2"}, "width<0.3")
    matches({"width": ".2"}, "width<.3")
    not_matches({"width": ".3"}, "width<.3")


def test_less_or_equal():
    matches({"width": "3"}, "width <= 3")
    matches({"width": "3"}, "width<=3.0")
    matches({"width": "3"}, "width   <=   3")
    not_matches({"width": "4"}, "width   <=   3")
    matches({"width": "0.3"}, "width<=0.3")
    matches({"width": ".3"}, "width<=.3")
    not_matches({"width": ".4"}, "width<=.3")


def test_comparisons_work_with_units():
    matches({"maxspeed": "30.1 mph"}, "maxspeed > 30mph")
    matches({"maxspeed": "48.3"}, "maxspeed > 30mph")
    matches({"maxspeed": "48.3 km/h"}, "maxspeed > 30mph")
    not_matches({"maxspeed": "30.0 mph"}, "maxspeed > 30mph")
    not_matches({"maxspeed": "48.2"}, "maxspeed > 30mph")
    not_matches({"maxspeed": "48.2 km/h"}, "maxspeed > 30mph")


def test_comparisons_work_with_extra_special_units():
    matches({"maxwidth": "4 ft 7 in"}, "maxwidth > 4'6\"")
    matches({"maxwidth": "4'7\""}, "maxwidth > 4'6\"")
    matches({"maxwidth": "1.4 m"}, "maxwidth > 4'6\"")
    matches({"maxwidth": "1.4m"}, "maxwidth > 4'6\"")
    matches({"maxwidth": "1.4"}, "maxwidth > 4'6\"")
    not_matches({"maxwidth": "4'6\""}, "maxwidth > 4'6\"")
    not_matches({"maxwidth": "1.3"}, "maxwidth > 4'6\"")


def test_and():
    expr = "a and b"
    matches(keys("a", "b"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b"), expr)


def test_two_and():
    expr = "a and b and c"
    matches(keys("a", "b", "c"), expr)
    not_matches(keys("a", "b"), expr)
    not_matches(keys("a", "c"), expr)
    not_matches(keys("b", "c"), expr)


def test_or():
    expr = "a or b"
    matches(keys("b"), expr)
    matches(keys("a"), expr)
    not_matches(keys(), expr)


def test_two_or():
    expr = "a or b or c"
    matches(keys("c"), expr)
    matches(keys("b"), expr)
    matches(keys("a"), expr)
    not_matches(keys(), expr)


def test_or_as_first_child_in_and():
    expr = "(a or b) and c"
    matches(keys("c", "a"), expr)
    matches(keys("c", "b"), expr)
    not_matches(keys("b"), expr)
    not_matches(keys("a"), expr)


def test_or_as_last_child_in_and():
    expr = "c and (a or b)"
    matches(keys("c", "a"), expr)
    matches(keys("c", "b"), expr)
    not_matches(keys("b"), expr)
    not_matches(keys("a"), expr)


def test_or_in_the_middle_of_and():
    expr = "c and (a or b) and d"
    matches(keys("c", "d", "a"), expr)
    matches(keys("c", "d", "b"), expr)
    not_matches(keys("b"), expr)
    not_matches(keys("a"), expr)


def test_and_as_first_child_in_or():
    expr = "a and b or c"
    matches(keys("a", "b"), expr)
    matches(keys("c"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b"), expr)


def test_and_as_last_child_in_or():
    expr = "c or a and b"
    matches(keys("a", "b"), expr)
    matches(keys("c"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b"), expr)


def test_and_in_the_middle_of_or():
    expr = "c or a and b or d"
    matches(keys("a", "b"), expr)
    matches(keys("c"), expr)
    matches(keys("d"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b"), expr)


def test_and_in_or_in_and():
    expr = "a and (b and c or d)"
    matches(keys("a", "d"), expr)
    matches(keys("a", "b", "c"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b", "c"), expr)
    not_matches(keys("d"), expr)


def test_and_in_or_in_and_in_or():
    expr = "a or (b and (c or (d and e)))"
    matches(keys("a"), expr)
    matches(keys("b", "c"), expr)
    matches(keys("b", "d", "e"), expr)
    not_matches(keys(), expr)
    not_matches(keys("b"), expr)
    not_matches(keys("c"), expr)
    not_matches(keys("b", "d"), expr)
    not_matches(keys("b", "e"), expr)


def test_and_in_bracket_followed_by_another_and():
    expr = "(a or (b and c)) and d"
    matches(keys("a", "d"), expr)
    matches(keys("b", "c", "d"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("d"), expr)
    not_matches(keys("b", "c"), expr)


def test_not_with_leaf():
    expr = "!(a)"
    matches(keys("b"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("a", "b"), expr)


def test_not_without_braces():
    should_fail("ways with !highway = residential or access = yes")


def test_not_and_with_space():
    expr = "! (a and b)"
    matches(keys("a"), expr)
    matches(keys("b"), expr)
    matches(keys("b", "c"), expr)
    matches(keys("c"), expr)
    not_matches(keys("a", "b", "c"), expr)


def test_not_and():
    expr = "!(a and b)"
    matches(keys("a"), expr)
    matches(keys("b"), expr)
    matches(keys("b", "c"), expr)
    matches(keys("c"), expr)
    not_matches(keys("a", "b", "c"), expr)


def test_not_or():
    expr = "!(a or b)"
    matches(keys("c"), expr)
    matches(keys("c", "d", "e"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("b"), expr)
    not_matches(keys("b", "c"), expr)
    not_matches(keys("a", "c"), expr)
    not_matches(keys("a", "b", "c"), expr)


def test_nested_not():
    expr = "!(!(a))"
    matches(keys("a"), expr)
    matches(keys("a", "b"), expr)
    not_matches(keys("b"), expr)


def test_nested_not_with_or():
    expr = "!(!(a and b) or c)"  # == a and b and !(c)
    matches(keys("a", "b"), expr)
    matches(keys("a", "b", "d"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("c"), expr)
    not_matches(keys("b", "c"), expr)
    not_matches(keys("a", "b", "c"), expr)
    not_matches(keys("a", "b", "c", "d"), expr)


def test_nested_not_with_or_and_switched_operands():
    expr = "!(c or !(a and b))"  # == a and b and !(c)
    matches(keys("a", "b"), expr)
    matches(keys("a", "b", "d"), expr)
    not_matches(keys("a"), expr)
    not_matches(keys("c"), expr)
    not_matches(keys("b", "c"), expr)
    not_matches(keys("a", "b", "c"), expr)
    not_matches(keys("a", "b", "c", "d"), expr)


def test_brackets_are_not_dissolved_illegally():
    expr = "a or (b or c) and !d"
    matches(keys("a"), expr)
    matches(keys("a", "d"), expr)
    matches(keys("b"), expr)
    matches(keys("c"), expr)
    not_matches(keys("c", "d"), expr)
    not_matches(keys("b", "d"), expr)
    matches(keys("a", "c", "d"), expr)


def test_fail_on_placeholder_not_closed():
    should_fail("{my placeholder")


def test_placeholders():
    matches(keys(), "{placeholder}", lambda n: n == "placeholder")
    not_matches(keys(), "{placeholder}", lambda n: n == "placeholder2")
    matches(keys(), "{stuff $§%&\"'()or}", lambda n: n == "stuff $§%&\"'()or")
    matches(keys("a"), "{placeholder} and a", lambda n: n == "placeholder")
    not_matches(keys(), "{placeholder} and a", lambda n: n == "placeholder")


def test_list_placeholders():
    from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
        iter_placeholder_names,
    )

    def placeholders(expr):
        parsed = parse_tag_filter(expr)
        from osm_legal_default_speeds_spark.functions.tagfilter_ast import Chain

        if isinstance(parsed, Chain):
            return list(parsed.get_placeholders())
        return [n for n in iter_placeholder_names(parsed)]

    assert placeholders("a") == []
    assert placeholders("{a}") == ["a"]
    assert placeholders("{a} and {b}") == ["a", "b"]


def test_unicode_whitespace_is_not_a_token_separator():
    """The reference's Regex("\\\\s") runs on the JVM, where \\s is
    ASCII-only — a non-breaking space (U+00A0) is part of the KEY, not
    a separator. Python's Unicode \\s would lex 'a\\u00a0and\\u00a0b' as
    three tokens (the expression `a and b`) instead of one key."""
    matches(keys("a\u00a0and\u00a0b"), "a\u00a0and\u00a0b")
    not_matches(keys("a", "b"), "a\u00a0and\u00a0b")
    # ASCII whitespace still separates, as before
    matches(keys("a", "b"), "a and b")
