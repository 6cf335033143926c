"""Unit-normalizing number parsing.

Reimplements the semantics of the reference's
``NumberWithUnitParser.kt:3-50`` (``withOptionalUnitToDoubleOrNull``):
a tag value like ``"30 mph"`` normalizes to km/h, ``"5'8\""`` to
meters, ``"2st"`` to tonnes; an unknown unit or a non-numeric string
yields ``None``. Canonical units are km/h (speed), m (length) and
t (weight).

Used in three places:
- parse-time constant folding of comparison literals
  (``TagFilterExpressionParser.kt:194``),
- runtime comparison atoms F10-F12 (``filters/TagFilter.kt:95-102``),
- result assembly speed capping / implicit-maxspeed detection
  (``LegalDefaultSpeeds.kt:253-304``).

Also exports ``parse_number_with_unit_series`` (pandas-vectorized, the
hot path inside Arrow UDF batches) and the unit-factor table consumed
by the native Spark Column compiler in ``functions.sql_exprs``.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Factors to the canonical unit per dimension: km/h, meters, tonnes.
# Mirrors NumberWithUnitParser.kt:30-50 bit-for-bit (the doubles must
# match so comparisons agree with the reference).
UNIT_FACTORS: dict[str, float] = {
    # speed -> km/h
    "km/h": 1.0,
    "kph": 1.0,
    "mph": 1.609344,
    # width/length/height -> meters
    "m": 1.0,
    "mm": 0.001,
    "cm": 0.01,
    "km": 1000.0,
    "ft": 0.3048,
    "'": 0.3048,
    "in": 0.0254,
    '"': 0.0254,
    "yd": 0.9144,
    "yds": 0.9144,
    # weight -> tonnes
    "t": 1.0,
    "kg": 0.001,
    "st": 0.90718474,  # short tons
    "lt": 1.0160469,  # long tons
    "lb": 0.00045359237,
    "lbs": 0.00045359237,
    "cwt": 0.05080234544,  # imperial (=long) hundredweight
}

# NumberWithUnitParser.kt:27-28. The reference's \s runs on the JVM,
# where it is the ASCII class [ \t\n\x0b\f\r]; Python's Unicode \s
# would additionally accept U+00A0 etc., diverging BOTH from the
# reference and from the native Column twin (sql_exprs, whose rlike is
# JVM regex) — so the JVM class is spelled out.
_JVM_WS = r"[ \t\n\x0b\f\r]"
_FEET_INCH_RE = re.compile(
    rf"([0-9]+){_JVM_WS}*(?:'|ft){_JVM_WS}*([0-9]+){_JVM_WS}*(?:\"|in)"
)
_WITH_UNIT_RE = re.compile(rf"([0-9]+|[0-9]*\.[0-9]+){_JVM_WS}*([a-z/'\"]+)")

# Plain-number grammar accepted by Java's Double.parseDouble for inputs
# that already passed the first-char-is-digit-or-dot guard (no sign, no
# hex, no underscores in practice for OSM values; leading/trailing
# whitespace is trimmed by parseDouble). fullmatch-anchored.
# KNOWN (intentional) narrowings vs the full parseDouble grammar, kept
# so the Python scalar, the vectorized path, and the native Column twin
# (sql_exprs, Spark cast) all agree with EACH OTHER: hex-float literals
# ("0x1p3" -> 8.0 in Kotlin, None here — Spark's cast can't parse them
# either) and [\x00-\x20] control-char padding ("30\x1f" -> 30.0 in
# Kotlin via trim, None here — _JVM_WS covers only the 6 \s chars).
# Both shapes are absent from real OSM maxspeed values.
_PLAIN_NUMBER_RE = re.compile(
    rf"{_JVM_WS}*([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?{_JVM_WS}*"
)
# The vectorized fast path's re-check. NO leading-whitespace allowance:
# the scalar's first-char-is-digit-or-dot guard rejects " 30" before
# parseDouble ever trims it (NumberWithUnitParser.kt:5-6), so the bulk
# pd.to_numeric conversion — which happily coerces " 30" — must be
# re-screened against the guard, not just the parseDouble grammar.
_PLAIN_NUMBER_STRICT_RE = re.compile(
    rf"([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?{_JVM_WS}*"
)


def parse_number_with_unit(value: str | None) -> float | None:
    """``"30 mph"`` -> 48.28032, ``"60"`` -> 60.0, junk -> None."""
    if not value:
        return None
    first = value[0]
    if not ("0" <= first <= "9") and first != ".":
        return None
    last = value[-1]
    if not last.isalpha() and last not in "\"'":
        # bare number (NumberWithUnitParser.kt:7)
        if _PLAIN_NUMBER_RE.fullmatch(value):
            try:
                return float(value)
            except ValueError:
                return None
        return None

    m = _WITH_UNIT_RE.fullmatch(value)
    if m:
        try:
            v = float(m.group(1))
        except ValueError:
            return None
        factor = UNIT_FACTORS.get(m.group(2))
        if factor is None:
            return None
        return v * factor

    m = _FEET_INCH_RE.fullmatch(value)
    if m:
        return int(m.group(1)) * UNIT_FACTORS["ft"] + int(m.group(2)) * UNIT_FACTORS["in"]

    return None


def parse_number_with_unit_series(values: pd.Series) -> pd.Series:
    """Vectorized ``parse_number_with_unit`` over a pandas Series of
    strings (nullable). Fast path: values that are plain numbers are
    bulk-converted with ``pd.to_numeric``; only the residue (values with
    unit suffixes, a tiny fraction of OSM maxspeed values) falls back to
    the scalar parser per element.
    """
    s = values.astype("object")
    out = pd.to_numeric(s, errors="coerce")
    # pd.to_numeric is more lenient than Java parseDouble (signs,
    # whitespace-only, UNICODE whitespace like U+00A0); re-check every
    # converted value against the full parseDouble-shaped grammar —
    # rejects fall into the residue, where the scalar parser (the
    # single source of truth) re-decides them.
    converted = out.notna()
    if converted.any():
        bad = ~s[converted].str.fullmatch(
            _PLAIN_NUMBER_STRICT_RE.pattern
        ).astype(bool)
        if bad.any():
            out[bad[bad].index] = np.nan
    residue = out.isna() & s.notna()
    if residue.any():
        # astype: map yields None for rejects; assigning object-dtype
        # Nones into the float64 result is deprecated in pandas
        out[residue] = (
            s[residue].map(parse_number_with_unit).astype("float64")
        )
    return out.astype("float64")
