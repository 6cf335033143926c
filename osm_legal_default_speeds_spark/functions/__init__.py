"""Scalar functions and the tag-filter expression DSL."""

from osm_legal_default_speeds_spark.functions.units import (  # noqa: F401
    parse_number_with_unit,
)
from osm_legal_default_speeds_spark.functions.tagfilter_parser import (  # noqa: F401
    ParseError,
    parse_tag_filter,
)
