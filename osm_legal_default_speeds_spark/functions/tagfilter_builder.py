"""Incremental boolean-expression builder.

Reimplements the tree-restructuring algorithm of
``tagfilter/BooleanExpressionBuilder.kt:4-120``: ``and`` binds tighter
than ``or``; brackets open a fresh subtree; ``addAnd``/``addOr`` splice
the last child into a new chain node. The resulting tree is flattened
(superfluous brackets removed, same-operator chains merged) on
``build()``. Golden behavior pinned by the ported
``BooleanExpressionBuilderTest`` corpus.
"""

from __future__ import annotations

from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
    AllOf,
    AnyOf,
    BooleanExpression,
    Chain,
    Leaf,
    Not,
    NotPlaceholder,
    Placeholder,
    TagFilter,
)


class BuilderError(ValueError):
    """Equivalent of the IllegalStateException raised by the reference
    builder (unbalanced brackets etc.)."""


class BracketHelper(Chain):
    def matches(self, tags, evaluate):  # pragma: no cover - never evaluated
        raise BuilderError("Bracket cannot match")


class BooleanExpressionBuilder:
    def __init__(self):
        self._node: Chain = BracketHelper()
        self._bracket_count = 0

    def build(self) -> BooleanExpression | None:
        if self._bracket_count > 0:
            raise BuilderError("Closed one bracket too little")

        node = self._node
        while node.parent is not None:
            node = node.parent

        node.flatten()

        if len(node.nodes) == 0:
            return None
        if len(node.nodes) == 1:
            first = node.nodes[0]
            node.remove_child(first)
            return first

        _ensure_no_bracket_nodes(node)
        return node

    def add_open_bracket(self):
        group = BracketHelper()
        self._node.add_child(group)
        self._node = group
        self._bracket_count += 1

    def add_close_bracket(self):
        self._bracket_count -= 1
        if self._bracket_count < 0:
            raise BuilderError("Closed one bracket too much")

        while not isinstance(self._node, BracketHelper):
            self._node = self._node.parent
        self._node = self._node.parent

        if isinstance(self._node, Not):
            self._node = self._node.parent

    def add_value(self, value: TagFilter):
        self._node.add_child(Leaf(value))

    def add_placeholder(self, name: str):
        self._node.add_child(Placeholder(name))

    def add_not_placeholder(self, name: str):
        self._node.add_child(NotPlaceholder(name))

    def add_and(self):
        if not isinstance(self._node, AllOf):
            last = self._node.nodes[-1]
            all_of = AllOf()
            self._node.replace_child(last, all_of)
            all_of.add_child(last)
            self._node = all_of

    def add_or(self):
        node = self._node
        if isinstance(node, AllOf):
            parent = node.parent
            if isinstance(parent, AnyOf):
                self._node = parent
            else:
                if parent is not None:
                    parent.remove_child(node)
                any_of = AnyOf()
                any_of.add_child(node)
                if parent is not None:
                    parent.add_child(any_of)
                self._node = any_of
        elif isinstance(node, BracketHelper):
            last = node.nodes[-1]
            any_of = AnyOf()
            node.replace_child(last, any_of)
            any_of.add_child(last)
            self._node = any_of

    def add_not(self):
        not_node = Not()
        self._node.add_child(not_node)
        self._node = not_node


def _ensure_no_bracket_nodes(node: Chain):
    if isinstance(node, BracketHelper):
        raise BuilderError("BooleanExpression still contains a Bracket node!")
    for child in node.nodes:
        if isinstance(child, Chain):
            _ensure_no_bracket_nodes(child)
