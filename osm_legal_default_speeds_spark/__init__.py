"""PySpark-native spatial rule-inference engine.

A from-scratch reimplementation of the query & data-processing
capabilities of westnordost/osm-legal-default-speeds (reference at
/root/reference, snapshot 2024-10-08), re-expressed Spark-first:

- ``functions``  — tag-filter expression DSL (parser -> AST), unit
  normalization, and native Spark Column compilation of filters.
- ``plans``      — driver-side rule compiler (placeholder inlining,
  cycle check, match-priority precomputation, relevant-key set) and a
  pure-Python reference-semantics engine used as the in-UDF kernel and
  as the differential-test oracle.
- ``operators``  — distributed operators: broadcast rule-match cascade,
  result assembly, spatial grid index / PIP / kNN / tiling, dedup,
  similarity search, text analysis, image payload plumbing.
- ``sources``    — dataset loaders (rules JSON) and deterministic
  synthetic fixture generators (images, geo, boundaries).
- ``streaming``  — structured-streaming wrappers of the inference op.

Reference semantics citations use file:line into /root/reference.
"""

from osm_legal_default_speeds_spark.plans.rules_model import (  # noqa: F401
    Certitude,
    Result,
    RoadTypeDef,
    RoadTypeFilterDef,
)
from osm_legal_default_speeds_spark.plans.rules_compiler import (  # noqa: F401
    CompiledRuleSet,
    compile_ruleset,
)
from osm_legal_default_speeds_spark.plans.reference_engine import (  # noqa: F401
    LegalDefaultSpeedsEngine,
)

__version__ = "0.1.0"
