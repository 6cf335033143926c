"""Data model for rule tables and query results.

Mirrors the reference's four abstractions (``LegalDefaultSpeeds.kt``):

- ``RoadTypeFilterDef`` — up to three filter-DSL strings per road type
  (``LegalDefaultSpeeds.kt:17-21``),
- ``RoadTypeDef`` — one ordered per-country rule row: optional name +
  output tags; ``name is None`` marks the fallback/default row which
  also acts as the scan separator (``LegalDefaultSpeeds.kt:12-15,179``),
- ``Result`` — (road_type_name, additional tags, certitude)
  (``LegalDefaultSpeeds.kt:118-129``),
- ``Certitude`` — Exact | FromMaxSpeed | Fuzzy | Fallback
  (``LegalDefaultSpeeds.kt:307-318``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Certitude:
    EXACT = "Exact"
    FROM_MAX_SPEED = "FromMaxSpeed"
    FUZZY = "Fuzzy"
    FALLBACK = "Fallback"

    ALL = (EXACT, FROM_MAX_SPEED, FUZZY, FALLBACK)


@dataclass(frozen=True)
class RoadTypeFilterDef:
    filter: str | None = None
    fuzzy_filter: str | None = None
    relation_filter: str | None = None


@dataclass(frozen=True)
class RoadTypeDef:
    name: str | None = None
    tags: dict = field(default_factory=dict)


@dataclass(frozen=True)
class Result:
    road_type_name: str | None
    tags: dict
    certitude: str
