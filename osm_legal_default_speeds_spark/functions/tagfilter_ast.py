"""Boolean-expression IR for the tag-filter DSL.

Reimplements the semantics of the reference IR
(``tagfilter/BooleanExpression.kt:3-148`` and
``tagfilter/filters/TagFilter.kt:6-102``): 13 predicate atoms over a
``dict[str, str]`` tag map, combinators ``AllOf``/``AnyOf``/``Not``,
and ``Placeholder``/``NotPlaceholder`` nodes that defer to an external
``evaluate(name)`` callback (cross-rule references; inlined at compile
time by ``plans.rules_compiler`` for the distributed path).

All nodes are plain picklable classes so a compiled rule set can be
shipped to executors inside a Spark broadcast variable.

Numeric comparisons deliberately run in float32: the reference stores
both the literal and the parsed tag value as Kotlin ``Float``
(``TagFilterExpressionParser.kt:194``, ``filters/TagFilter.kt:95-102``),
and bit-for-bit agreement on boundary values requires the same rounding.

Regex matching is *full-string* (Kotlin ``Regex.matches``,
``filters/RegexOrSet.kt:22``) — the single most correctness-critical
divergence from Spark's substring-searching ``rlike``.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Union

import numpy as np

from osm_legal_default_speeds_spark.functions.units import parse_number_with_unit

Tags = dict  # dict[str, str]
EvalFn = Callable[[str], bool]


# --------------------------------------------------------------------------
# RegexOrSet — alternation-only patterns rewritten to set membership
# (filters/RegexOrSet.kt:5-27). The detector char class is copied
# verbatim including its `+-=` range, to classify patterns exactly as
# the reference does.
# --------------------------------------------------------------------------

_ANY_REGEX_STUFF_EXCEPT_PIPE = re.compile(r"[.\[\]{}()<>*+-=!?^$]")


class RegexOrSet:
    __slots__ = ("pattern", "is_set", "members", "_regex")

    def __init__(self, pattern: str):
        self.pattern = pattern
        if not _ANY_REGEX_STUFF_EXCEPT_PIPE.search(pattern):
            self.is_set = True
            self.members = frozenset(pattern.split("|"))
            self._regex = None
        else:
            self.is_set = False
            self.members = None
            self._regex = re.compile(pattern)

    def matches(self, s: str) -> bool:
        if self.is_set:
            return s in self.members
        return self._regex.fullmatch(s) is not None

    def __reduce__(self):
        return (RegexOrSet, (self.pattern,))

    def __repr__(self):
        return f"RegexOrSet({self.pattern!r})"


# --------------------------------------------------------------------------
# Relevant keys (filters/RelevantKey.kt:3-7) — used for the map_filter
# key-pruning projection (LegalDefaultSpeeds.kt:94-113,246-247).
# --------------------------------------------------------------------------

class RelevantKeyString:
    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key

    def __eq__(self, other):
        return isinstance(other, RelevantKeyString) and other.key == self.key

    def __hash__(self):
        return hash(("k", self.key))


class RelevantKeyRegex:
    __slots__ = ("regex",)

    def __init__(self, regex: RegexOrSet):
        self.regex = regex

    def __eq__(self, other):
        return isinstance(other, RelevantKeyRegex) and other.regex.pattern == self.regex.pattern

    def __hash__(self):
        return hash(("r", self.regex.pattern))


RelevantKey = Union[RelevantKeyString, RelevantKeyRegex]


# --------------------------------------------------------------------------
# Predicate atoms (filters/TagFilter.kt:12-102)
# --------------------------------------------------------------------------

class TagFilter:
    """Base predicate atom over a tag map."""

    def matches(self, tags: Tags) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def relevant_key(self) -> RelevantKey:  # pragma: no cover - abstract
        raise NotImplementedError


class HasKey(TagFilter):
    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key

    def matches(self, tags: Tags) -> bool:
        return self.key in tags

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return self.key


class NotHasKey(TagFilter):
    __slots__ = ("key",)

    def __init__(self, key: str):
        self.key = key

    def matches(self, tags: Tags) -> bool:
        return self.key not in tags

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return "!" + self.key


class HasTag(TagFilter):
    __slots__ = ("key", "value")

    def __init__(self, key: str, value: str):
        self.key = key
        self.value = value

    def matches(self, tags: Tags) -> bool:
        return tags.get(self.key) == self.value

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return f"{self.key} = {self.value}"


class NotHasTag(TagFilter):
    """True also when the key is absent (filters/TagFilter.kt:30-34)."""

    __slots__ = ("key", "value")

    def __init__(self, key: str, value: str):
        self.key = key
        self.value = value

    def matches(self, tags: Tags) -> bool:
        return tags.get(self.key) != self.value

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return f"{self.key} != {self.value}"


class HasKeyLike(TagFilter):
    __slots__ = ("key", "regex")

    def __init__(self, key: str):
        self.key = key
        self.regex = RegexOrSet(key)

    def matches(self, tags: Tags) -> bool:
        r = self.regex
        return any(r.matches(k) for k in tags)

    def relevant_key(self):
        return RelevantKeyRegex(self.regex)

    def __str__(self):
        return "~" + self.key


class NotHasKeyLike(TagFilter):
    __slots__ = ("key", "regex")

    def __init__(self, key: str):
        self.key = key
        self.regex = RegexOrSet(key)

    def matches(self, tags: Tags) -> bool:
        r = self.regex
        return not any(r.matches(k) for k in tags)

    def relevant_key(self):
        return RelevantKeyRegex(self.regex)

    def __str__(self):
        return "!~" + self.key


class HasTagValueLike(TagFilter):
    """Absent key -> False (filters/TagFilter.kt:52-58)."""

    __slots__ = ("key", "value", "regex")

    def __init__(self, key: str, value: str):
        self.key = key
        self.value = value
        self.regex = RegexOrSet(value)

    def matches(self, tags: Tags) -> bool:
        v = tags.get(self.key)
        return self.regex.matches(v) if v is not None else False

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return f"{self.key} ~ {self.value}"


class NotHasTagValueLike(TagFilter):
    """Absent key -> True (filters/TagFilter.kt:60-66)."""

    __slots__ = ("key", "value", "regex")

    def __init__(self, key: str, value: str):
        self.key = key
        self.value = value
        self.regex = RegexOrSet(value)

    def matches(self, tags: Tags) -> bool:
        v = tags.get(self.key)
        return (not self.regex.matches(v)) if v is not None else True

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return f"{self.key} !~ {self.value}"


class HasTagLike(TagFilter):
    """Any entry whose key AND value both fullmatch
    (filters/TagFilter.kt:68-76)."""

    __slots__ = ("key", "value", "key_regex", "value_regex")

    def __init__(self, key: str, value: str):
        self.key = key
        self.value = value
        self.key_regex = RegexOrSet(key)
        self.value_regex = RegexOrSet(value)

    def matches(self, tags: Tags) -> bool:
        # v is not None: map<string,string> VALUES are nullable in
        # Spark and arrive as None in the Arrow batch; the set path
        # (`None in members`) and the native column path (null ->
        # coalesced false) both degrade to no-match, but
        # re.fullmatch(None) would raise — mirror the None guard
        # HasTagValueLike already has (TagFilter.kt:52-66)
        kr, vr = self.key_regex, self.value_regex
        return any(
            v is not None and kr.matches(k) and vr.matches(v)
            for k, v in tags.items()
        )

    def relevant_key(self):
        return RelevantKeyRegex(self.key_regex)

    def __str__(self):
        return f"~{self.key} ~ {self.value}"


def _fmt_float(v: float) -> str:
    """Render like Kotlin Float.toString for test goldens (3.5 -> '3.5',
    120 -> '120.0', 48.28032 -> '48.28032')."""
    f = np.float32(v)
    s = np.format_float_positional(f, unique=True)
    if s.endswith("."):
        s += "0"
    return s


class _CompareTagValue(TagFilter):
    """Unit-normalized float32 comparison; unparsable/absent -> False
    (filters/TagFilter.kt:95-102)."""

    __slots__ = ("key", "value")
    op = "?"

    def __init__(self, key: str, value: float):
        self.key = key
        self.value = float(np.float32(value))

    def compare(self, tag_value: float) -> bool:  # pragma: no cover - abstract
        raise NotImplementedError

    def matches(self, tags: Tags) -> bool:
        v = tags.get(self.key)
        if v is None:
            return False
        parsed = parse_number_with_unit(v)
        if parsed is None:
            return False
        return self.compare(float(np.float32(parsed)))

    def relevant_key(self):
        return RelevantKeyString(self.key)

    def __str__(self):
        return f"{self.key} {self.op} {_fmt_float(self.value)}"


class HasTagLessThan(_CompareTagValue):
    op = "<"

    def compare(self, tag_value):
        return tag_value < self.value


class HasTagGreaterThan(_CompareTagValue):
    op = ">"

    def compare(self, tag_value):
        return tag_value > self.value


class HasTagLessOrEqualThan(_CompareTagValue):
    op = "<="

    def compare(self, tag_value):
        return tag_value <= self.value


class HasTagGreaterOrEqualThan(_CompareTagValue):
    op = ">="

    def compare(self, tag_value):
        return tag_value >= self.value


# --------------------------------------------------------------------------
# Boolean combinators (BooleanExpression.kt:105-144)
# --------------------------------------------------------------------------

class BooleanExpression:
    parent: "Chain | None" = None

    def matches(self, tags: Tags, evaluate: EvalFn) -> bool:  # pragma: no cover
        raise NotImplementedError


class Leaf(BooleanExpression):
    def __init__(self, value: TagFilter):
        self.parent = None
        self.value = value

    def matches(self, tags, evaluate):
        return self.value.matches(tags)

    def __str__(self):
        return str(self.value)


class Placeholder(BooleanExpression):
    def __init__(self, value: str):
        self.parent = None
        self.value = value

    def matches(self, tags, evaluate):
        return evaluate(self.value)

    def __str__(self):
        return "{%s}" % self.value


class NotPlaceholder(BooleanExpression):
    def __init__(self, value: str):
        self.parent = None
        self.value = value

    def matches(self, tags, evaluate):
        return not evaluate(self.value)

    def __str__(self):
        return "!{%s}" % self.value


class Chain(BooleanExpression):
    def __init__(self):
        self.parent = None
        self.nodes: list[BooleanExpression] = []

    @property
    def children(self) -> list[BooleanExpression]:
        return list(self.nodes)

    def add_child(self, child: BooleanExpression):
        child.parent = self
        self.nodes.append(child)

    def remove_child(self, child: BooleanExpression):
        self.nodes.remove(child)
        child.parent = None

    def replace_child(self, replace: BooleanExpression, with_: BooleanExpression):
        for i, child in enumerate(self.nodes):
            if child is replace:
                self.nodes[i] = with_
                with_.parent = self
                return

    def flatten(self):
        """Remove superfluous bracket depth and merge same-operator
        chains (BooleanExpression.kt:48-82)."""
        self._remove_empty_nodes()
        self._merge_nodes_with_same_operator()

    def _remove_empty_nodes(self):
        i = 0
        while i < len(self.nodes):
            child = self.nodes[i]
            if isinstance(child, Chain) and not isinstance(child, Not) and len(child.nodes) == 1:
                only = child.nodes[0]
                self.nodes[i] = only
                only.parent = self
                # re-check the replaced node
                continue
            if isinstance(child, Chain):
                child._remove_empty_nodes()
            i += 1

    def _merge_nodes_with_same_operator(self):
        i = 0
        while i < len(self.nodes):
            child = self.nodes[i]
            if isinstance(child, Chain) and not isinstance(child, Not):
                child._merge_nodes_with_same_operator()
                if type(child) is type(self):
                    repl = child.children
                    self.nodes[i : i + 1] = repl
                    for r in repl:
                        r.parent = self
                    i += len(repl)
                    continue
            i += 1

    def get_placeholders(self) -> Iterator[str]:
        # Only positive Placeholder nodes, like the reference
        # (BooleanExpression.kt:84-92) — the constructor-time cycle
        # check is pinned to this behavior.
        for node in self.nodes:
            if isinstance(node, Chain):
                yield from node.get_placeholders()
            elif isinstance(node, Placeholder):
                yield node.value

    def get_all_placeholder_names(self) -> Iterator[str]:
        """Both {x} and !{x} — used by the compiler's cycle check and
        inliner."""
        for node in self.nodes:
            if isinstance(node, Chain):
                yield from node.get_all_placeholder_names()
            elif isinstance(node, (Placeholder, NotPlaceholder)):
                yield node.value

    def get_items(self) -> Iterator[TagFilter]:
        for node in self.nodes:
            if isinstance(node, Chain):
                yield from node.get_items()
            elif isinstance(node, Leaf):
                yield node.value


class AllOf(Chain):
    def matches(self, tags, evaluate):
        return all(n.matches(tags, evaluate) for n in self.nodes)

    def __str__(self):
        return " and ".join(
            f"({n})" if isinstance(n, AnyOf) else str(n) for n in self.nodes
        )


class AnyOf(Chain):
    def matches(self, tags, evaluate):
        return any(n.matches(tags, evaluate) for n in self.nodes)

    def __str__(self):
        return " or ".join(str(n) for n in self.nodes)


class Not(Chain):
    def add_child(self, child):
        if self.nodes:
            raise ValueError("Adding a second child to '!' (NOT) operator is not allowed")
        super().add_child(child)

    def matches(self, tags, evaluate):
        return not self.nodes[0].matches(tags, evaluate)

    def __str__(self):
        return f"!({self.nodes[0] if self.nodes else ''})"


def iter_placeholder_names(expr: BooleanExpression) -> Iterator[str]:
    if isinstance(expr, Chain):
        yield from expr.get_all_placeholder_names()
    elif isinstance(expr, (Placeholder, NotPlaceholder)):
        yield expr.value


def iter_items(expr: BooleanExpression) -> Iterator[TagFilter]:
    if isinstance(expr, Chain):
        yield from expr.get_items()
    elif isinstance(expr, Leaf):
        yield expr.value


def relevant_keys_of(expr: BooleanExpression) -> set:
    return {item.relevant_key() for item in iter_items(expr)}
