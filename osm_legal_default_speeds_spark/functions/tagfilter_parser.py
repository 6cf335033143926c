"""Tag-filter DSL parser: filter string -> BooleanExpression AST.

Reimplements the grammar and error behavior of
``tagfilter/TagFilterExpressionParser.kt:49-309`` (cheatsheet at
``:14-47``) on top of a small cursor lexer
(``tagfilter/StringWithCursor.kt``):

  ``shop`` / ``!shop`` / ``shop = car`` / ``shop != car`` /
  ``~shop|craft`` / ``!~shop|craft`` / ``shop ~ car|boat`` /
  ``shop !~ car|boat`` / ``~kregex ~ vregex`` /
  ``foo < 3.3ft`` (and <=, >, >=, with units) /
  ``{placeholder}`` / ``!{placeholder}`` /
  ``and`` / ``or`` (and binds tighter) / brackets / ``!( ... )`` /
  single or double quoting with backslash escapes.

Comparison literals are unit-normalized at parse time
(``TagFilterExpressionParser.kt:194``) — the constant-folding the
reference applies and Catalyst can't (the literal arrives as data).
"""

from __future__ import annotations

import re

from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
    BooleanExpression,
    HasKey,
    HasKeyLike,
    HasTag,
    HasTagGreaterOrEqualThan,
    HasTagGreaterThan,
    HasTagLessOrEqualThan,
    HasTagLessThan,
    HasTagLike,
    HasTagValueLike,
    NotHasKey,
    NotHasKeyLike,
    NotHasTag,
    NotHasTagValueLike,
    TagFilter,
)
from osm_legal_default_speeds_spark.functions.tagfilter_builder import (
    BooleanExpressionBuilder,
    BuilderError,
)
from osm_legal_default_speeds_spark.functions.units import parse_number_with_unit


class ParseError(ValueError):
    def __init__(self, message: str, error_offset: int):
        super().__init__(f"At position {error_offset}: {message}")
        self.error_offset = error_offset


_OR = "or"
_AND = "and"
_RESERVED_WORDS = (_OR, _AND)
_QUOTATION_MARKS = ('"', "'")

# table-driven atom dispatch: binary operator -> AST node. String-valued
# operators take a quotable word on the right; numeric ones take a
# unit-normalizable number (folded to canonical units at parse time,
# TagFilterExpressionParser.kt:194).
_KEY_VALUE_ATOMS: dict[str, type] = {
    "=": HasTag,
    "!=": NotHasTag,
    "~": HasTagValueLike,
    "!~": NotHasTagValueLike,
}
_COMPARISON_ATOMS: dict[str, type] = {
    ">": HasTagGreaterThan,
    ">=": HasTagGreaterOrEqualThan,
    "<": HasTagLessThan,
    "<=": HasTagLessOrEqualThan,
}
# all operators, longest first so ">=" never lexes as ">" + "="
_OPERATORS = tuple(
    sorted([*_KEY_VALUE_ATOMS, *_COMPARISON_ATOMS], key=len, reverse=True)
)

_ESCAPED_QUOTE_RE = re.compile(r"\\(['\"])")
# The reference's Regex("\\s") runs on the JVM, where \s is the ASCII
# class [ \t\n\x0b\f\r] — Python's \s is Unicode-aware and would also
# treat U+00A0/U+2028/... as token separators, parsing a DIFFERENT AST
# for keys containing such characters (and diverging from the native
# Column engine, whose rlike is JVM regex). Spell the JVM class out.
_JVM_WS = r"[ \t\n\x0b\f\r]"
_WHITESPACE_RE = re.compile(_JVM_WS)
_WHITESPACES_RE = re.compile(f"{_JVM_WS}*")
_NOT_WITH_WS_AND_OPENING_BRACE_RE = re.compile(rf"!{_JVM_WS}*\(")


class _Cursor:
    """Step-by-step string cursor (StringWithCursor.kt:7-108)."""

    __slots__ = ("s", "pos")

    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def is_at_end(self, offs: int = 0) -> bool:
        return self.pos + offs >= len(self.s)

    def next_is(self, token: str) -> bool:
        return self.s.startswith(token, self.pos)

    def next_is_and_advance(self, token: str) -> bool:
        if self.next_is(token):
            self.pos += len(token)
            return True
        return False

    def next_matches(self, regex: re.Pattern):
        return regex.match(self.s, self.pos)

    def next_matches_and_advance(self, regex: re.Pattern):
        m = regex.match(self.s, self.pos)
        if m:
            self.pos = m.end()
        return m

    def find_next(self, token: str, offs: int = 0) -> int:
        idx = self.s.find(token, self.pos + offs)
        return len(self.s) - self.pos if idx == -1 else idx - self.pos

    def find_next_re(self, regex: re.Pattern, offs: int = 0) -> int:
        m = regex.search(self.s, self.pos + offs)
        return len(self.s) - self.pos if m is None else m.start() - self.pos

    def advance(self) -> str:
        c = self.s[self.pos]
        self.pos += 1
        return c

    def advance_by(self, n: int) -> str:
        end = min(len(self.s), self.pos + n)
        result = self.s[self.pos : end]
        self.pos = end
        return result

    def retreat_by(self, n: int):
        self.pos = max(0, self.pos - n)

    def char_at(self, index: int) -> str | None:
        return self.s[index] if index < len(self.s) else None


def parse_tag_filter(s: str) -> BooleanExpression:
    """Parse a filter string; raises ParseError on bad syntax
    (TagFilterExpressionParser.kt:88-137)."""
    cursor = _Cursor(s)
    builder = BooleanExpressionBuilder()
    first = True

    while True:
        # if it has no bracket, there must be at least one whitespace
        if not _parse_brackets_and_spaces(cursor, "(", builder) and not first:
            raise ParseError("Expected a whitespace or bracket before the tag", cursor.pos)
        first = False

        if cursor.next_matches(_NOT_WITH_WS_AND_OPENING_BRACE_RE):
            cursor.advance_by(1)  # consume "!"
            builder.add_not()
            continue  # "!(" can be nested

        if cursor.next_is_and_advance("!{"):
            builder.add_not_placeholder(_parse_placeholder(cursor))
        elif cursor.next_is_and_advance("{"):
            builder.add_placeholder(_parse_placeholder(cursor))
        else:
            builder.add_value(_parse_tag(cursor))

        separated = _parse_brackets_and_spaces(cursor, ")", builder)

        if cursor.is_at_end():
            break

        if not separated:
            raise ParseError("Expected a whitespace or bracket after the tag", cursor.pos)

        if cursor.next_is_and_advance(_OR):
            builder.add_or()
        elif cursor.next_is_and_advance(_AND):
            builder.add_and()
        else:
            raise ParseError(f"Expected end of string, '{_AND}' or '{_OR}'", cursor.pos)

    try:
        expr = builder.build()
    except BuilderError as e:
        raise ParseError(str(e), cursor.pos) from e
    if expr is None:
        raise ParseError("Empty expression", cursor.pos)
    return expr


def _parse_brackets_and_spaces(cursor: _Cursor, bracket: str, builder) -> bool:
    initial = cursor.pos
    while True:
        loop_start = cursor.pos
        _expect_any_number_of_spaces(cursor)
        if cursor.next_is_and_advance(bracket):
            try:
                if bracket == "(":
                    builder.add_open_bracket()
                else:
                    builder.add_close_bracket()
            except BuilderError as e:
                raise ParseError(str(e), cursor.pos) from e
        if loop_start >= cursor.pos:
            break
    _expect_any_number_of_spaces(cursor)
    return initial < cursor.pos


def _parse_tag(cursor: _Cursor) -> TagFilter:
    if cursor.next_is_and_advance("!"):
        if cursor.next_is_and_advance("~"):
            _expect_any_number_of_spaces(cursor)
            return NotHasKeyLike(_parse_key(cursor))
        _expect_any_number_of_spaces(cursor)
        return NotHasKey(_parse_key(cursor))

    if cursor.next_is_and_advance("~"):
        _expect_any_number_of_spaces(cursor)
        key = _parse_key(cursor)
        operator = _parse_operator_with_surrounding_spaces(cursor)
        if operator is None:
            return HasKeyLike(key)
        if operator == "~":
            return HasTagLike(key, _parse_quotable_word(cursor))
        raise ParseError(
            f"Unexpected operator '{operator}': The key prefix operator '~' "
            "must be used together with the binary operator '~'",
            cursor.pos,
        )

    key = _parse_key(cursor)
    operator = _parse_operator_with_surrounding_spaces(cursor)
    if operator is None:
        return HasKey(key)

    atom = _KEY_VALUE_ATOMS.get(operator)
    if atom is not None:
        return atom(key, _parse_quotable_word(cursor))

    atom = _COMPARISON_ATOMS.get(operator)
    if atom is not None:
        value = parse_number_with_unit(_parse_word(cursor))
        if value is None:
            raise ParseError(
                "Expected a number (e.g. 3.5) or a number with a known unit (e.g. 3.5st)",
                cursor.pos,
            )
        return atom(key, value)

    raise ParseError(f"Unknown operator '{operator}'", cursor.pos)


def _parse_key(cursor: _Cursor) -> str:
    reserved = _next_is_reserved_word(cursor)
    if reserved is not None:
        raise ParseError(
            f"A key cannot be named like the reserved word '{reserved}', "
            "surround it with quotation marks",
            cursor.pos,
        )
    length = _find_key_length(cursor)
    if length == 0:
        raise ParseError("Missing key (dangling prefix operator)", cursor.pos)
    return _strip_and_unescape_quotes(cursor.advance_by(length))


def _parse_operator_with_surrounding_spaces(cursor: _Cursor) -> str | None:
    spaces = _expect_any_number_of_spaces(cursor)
    result = None
    for op in _OPERATORS:
        if cursor.next_is_and_advance(op):
            result = op
            break
    if result is None:
        cursor.retreat_by(spaces)
        return None
    _expect_any_number_of_spaces(cursor)
    return result


def _parse_placeholder(cursor: _Cursor) -> str:
    length = cursor.find_next("}")
    if cursor.is_at_end(length):
        raise ParseError("Missing closing bracket '}' for placeholder", cursor.pos + length)
    result = cursor.advance_by(length)
    cursor.advance()  # consume "}"
    return result


def _parse_quotable_word(cursor: _Cursor) -> str:
    length = _find_quotable_word_length(cursor)
    if length == 0:
        raise ParseError("Missing value (dangling operator)", cursor.pos)
    return _strip_and_unescape_quotes(cursor.advance_by(length))


def _parse_word(cursor: _Cursor) -> str:
    length = _find_word_length(cursor)
    if length == 0:
        raise ParseError("Missing value (dangling operator)", cursor.pos)
    return cursor.advance_by(length)


def _expect_any_number_of_spaces(cursor: _Cursor) -> int:
    m = cursor.next_matches_and_advance(_WHITESPACES_RE)
    return len(m.group(0)) if m else 0


def _next_is_reserved_word(cursor: _Cursor) -> str | None:
    word_length = _find_word_length(cursor)
    for w in _RESERVED_WORDS:
        if cursor.next_is(w) and word_length == len(w):
            return w
    return None


def _find_key_length(cursor: _Cursor) -> int:
    length = _find_quotation_length(cursor)
    if length is not None:
        return length
    length = _find_word_length(cursor)
    for op in _OPERATORS:
        op_len = cursor.find_next(op)
        if op_len < length:
            length = op_len
    return length


def _find_word_length(cursor: _Cursor) -> int:
    return min(cursor.find_next_re(_WHITESPACE_RE), cursor.find_next(")"))


def _find_quotable_word_length(cursor: _Cursor) -> int:
    length = _find_quotation_length(cursor)
    return length if length is not None else _find_word_length(cursor)


def _find_quotation_length(cursor: _Cursor) -> int | None:
    for quot in _QUOTATION_MARKS:
        if cursor.next_is(quot):
            length = 0
            while True:
                length = cursor.find_next(quot, 1 + length)
                if cursor.is_at_end(length):
                    raise ParseError("Did not close quotation marks", cursor.pos - 1)
                # ignore escaped quotes
                if cursor.char_at(cursor.pos + length - 1) == "\\":
                    continue
                # +1 to include the closing quotation mark
                return length + 1
    return None


def _strip_and_unescape_quotes(s: str) -> str:
    trimmed = s[1:-1] if s.startswith(("'", '"')) else s
    return _ESCAPED_QUOTE_RE.sub(lambda m: m.group(1), trimmed)
