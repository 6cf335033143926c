"""Driver-side rule compiler.

Performs eagerly, once, on the driver what the reference does in its
constructor (``LegalDefaultSpeeds.kt:25-113``) — then the compiled,
picklable result is shipped to executors in a single Spark broadcast:

1. parse each road type's up-to-3 filter strings into ASTs, wrapping
   syntax errors with the road-type name (``LegalDefaultSpeeds.kt:29-52``),
2. reject circular placeholders via transitive closure
   (``LegalDefaultSpeeds.kt:62-92``),
3. derive the relevant-key set for map-key pruning
   (``LegalDefaultSpeeds.kt:94-113``),
4. precompute the match-priority scan order per country — the
   reference's two-pass / null-separator scan
   (``LegalDefaultSpeeds.kt:186-205``) encoded as a static index list so
   "first match" becomes "min(priority) among matches" in any engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
    BooleanExpression,
    RelevantKeyRegex,
    RelevantKeyString,
    iter_placeholder_names,
    relevant_keys_of,
)
from osm_legal_default_speeds_spark.functions.tagfilter_parser import (
    ParseError,
    parse_tag_filter,
)
from osm_legal_default_speeds_spark.plans.rules_model import RoadTypeDef, RoadTypeFilterDef


@dataclass
class CompiledRoadTypeFilter:
    filter: BooleanExpression | None
    fuzzy_filter: BooleanExpression | None
    relation_filter: BooleanExpression | None


@dataclass
class CompiledRuleSet:
    """Picklable compiled rule tables, broadcast to executors."""

    road_type_filters: dict  # name -> CompiledRoadTypeFilter
    speed_limits_by_country: dict  # cc -> list[RoadTypeDef] (original order)
    # cc -> list[int]: rule indices in match-priority order (C1)
    scan_order_by_country: dict
    # cc -> int | None: index of the fallback (first name==None) row
    fallback_index_by_country: dict
    relevant_key_strings: frozenset = field(default_factory=frozenset)
    relevant_key_regexes: tuple = ()  # tuple[RegexOrSet with real regexes]

    # ---- relevant-key pruning (LegalDefaultSpeeds.kt:246-247) ----
    def is_relevant_tag_key(self, key: str) -> bool:
        if key in self.relevant_key_strings:
            return True
        return any(r.matches(key) for r in self.relevant_key_regexes)

    def combined_key_regex(self) -> str | None:
        """One anchored alternation of all relevant-key regexes, for a
        native ``map_filter``/``rlike`` pruning expression. None if the
        rule set has no regex keys."""
        if not self.relevant_key_regexes:
            return None
        # \A/\z, not ^/$ — Java's $ matches before a final newline, so
        # ^$-anchoring would keep keys the Python is_relevant_tag_key
        # (re.fullmatch) drops (see functions.sql_exprs._anchored)
        return (
            "\\A(?:"
            + "|".join(f"(?:{r.pattern})" for r in self.relevant_key_regexes)
            + ")\\z"
        )


def _scan_order(rules: Sequence[RoadTypeDef]) -> list[int]:
    """Static priority order encoding the two-pass scan
    (LegalDefaultSpeeds.kt:194-204): first bottom-up from the end
    stopping at the last null-named row, then top-down from the start
    stopping at the first null-named row. Rows between two null rows are
    unreachable and excluded."""
    n = len(rules)
    order: list[int] = []
    # pass a: reversed, break at first null encountered from the end
    for i in range(n - 1, -1, -1):
        if rules[i].name is None:
            break
        order.append(i)
    else:
        # no null row: the reversed pass already covered every rule and
        # the forward pass can never find anything new
        return order
    # pass b: forward, break at first null row
    for i in range(n):
        if rules[i].name is None:
            break
        order.append(i)
    return order


def compile_ruleset(
    road_types_by_name: Mapping[str, RoadTypeFilterDef],
    speed_limits_by_country_code: Mapping[str, Sequence[RoadTypeDef]],
) -> CompiledRuleSet:
    road_type_filters: dict[str, CompiledRoadTypeFilter] = {}
    for road_name, ftr in road_types_by_name.items():
        parsed = []
        for label, s in (
            ("filter", ftr.filter),
            ("fuzzyFilter", ftr.fuzzy_filter),
            ("relationFilter", ftr.relation_filter),
        ):
            if s is None:
                parsed.append(None)
                continue
            try:
                parsed.append(parse_tag_filter(s))
            except ParseError as e:
                raise ValueError(
                    f'Invalid road type {label} for "{road_name}"'
                ) from e
        road_type_filters[road_name] = CompiledRoadTypeFilter(*parsed)

    _check_for_circular_placeholders(road_type_filters)
    key_strings, key_regexes = _calculate_relevant_keys(road_type_filters)

    speed_limits = {
        cc: [
            r if isinstance(r, RoadTypeDef) else RoadTypeDef(r[0], r[1])
            for r in rules
        ]
        for cc, rules in speed_limits_by_country_code.items()
    }
    scan_order = {cc: _scan_order(rules) for cc, rules in speed_limits.items()}
    fallback_index = {
        cc: next((i for i, r in enumerate(rules) if r.name is None), None)
        for cc, rules in speed_limits.items()
    }

    return CompiledRuleSet(
        road_type_filters=road_type_filters,
        speed_limits_by_country=speed_limits,
        scan_order_by_country=scan_order,
        fallback_index_by_country=fallback_index,
        relevant_key_strings=frozenset(key_strings),
        relevant_key_regexes=tuple(key_regexes),
    )


def _placeholders_of(cf: CompiledRoadTypeFilter) -> set[str]:
    """Positive {x} placeholders only, matching the reference's
    getPlaceholders (BooleanExpression.kt:84-92)."""
    from osm_legal_default_speeds_spark.functions.tagfilter_ast import (
        Chain,
        Placeholder,
    )

    names: set[str] = set()
    for expr in (cf.filter, cf.fuzzy_filter, cf.relation_filter):
        if expr is None:
            continue
        if isinstance(expr, Chain):
            names.update(expr.get_placeholders())
        elif isinstance(expr, Placeholder):
            names.add(expr.value)
    return names


def _check_for_circular_placeholders(road_type_filters: dict) -> None:
    """Transitive-closure cycle rejection (LegalDefaultSpeeds.kt:62-92)."""
    placeholders_by_road = {
        name: _placeholders_of(cf) for name, cf in road_type_filters.items()
    }
    for road_name, placeholders in placeholders_by_road.items():
        collected = set(placeholders)
        to_expand = set(placeholders)
        while to_expand:
            expanded: set[str] = set()
            for p in to_expand:
                expanded.update(placeholders_by_road.get(p, ()))
            expanded -= collected
            collected |= expanded
            to_expand = expanded
        if road_name in collected:
            raise ValueError(
                f'A road type filter for "{road_name}" contains circular placeholders'
            )


def _calculate_relevant_keys(road_type_filters: dict):
    """Union of keys/regexes referenced by any filter
    (LegalDefaultSpeeds.kt:94-113); set-form regexes contribute their
    members as plain strings."""
    relevant = set()
    for cf in road_type_filters.values():
        for expr in (cf.filter, cf.fuzzy_filter, cf.relation_filter):
            if expr is not None:
                relevant |= relevant_keys_of(expr)
    strings: set[str] = set()
    regexes = []
    seen_patterns: set[str] = set()
    for rk in relevant:
        if isinstance(rk, RelevantKeyString):
            strings.add(rk.key)
        elif isinstance(rk, RelevantKeyRegex):
            if rk.regex.is_set:
                strings.update(rk.regex.members)
            elif rk.regex.pattern not in seen_patterns:
                seen_patterns.add(rk.regex.pattern)
                regexes.append(rk.regex)
    return strings, regexes


def all_placeholder_names(cf: CompiledRoadTypeFilter) -> set[str]:
    """Both {x} and !{x} — for the native-expression inliner."""
    names: set[str] = set()
    for expr in (cf.filter, cf.fuzzy_filter, cf.relation_filter):
        if expr is not None:
            names.update(iter_placeholder_names(expr))
    return names
