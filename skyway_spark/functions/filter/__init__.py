"""Filter languages (OSMFilter DSL + CEL subset) compiled to Columns.

Reference semantics: /root/reference/src/filter/ — but where the
reference interprets a tree per element (row-at-a-time), we compile
each filter program ONCE to pure Catalyst Column expressions, so the
whole filter runs inside whole-stage codegen with predicate pushdown.
"""

from skyway_spark.functions.filter.osmfilter_parser import parse_osmfilter
from skyway_spark.functions.filter.osmfilter_compile import compile_osmfilter, apply_osmfilter
from skyway_spark.functions.filter.cel import compile_cel, apply_cel
from skyway_spark.functions.filter.autodetect import create_filter, apply_filters

__all__ = [
    "parse_osmfilter",
    "compile_osmfilter",
    "apply_osmfilter",
    "compile_cel",
    "apply_cel",
    "create_filter",
    "apply_filters",
]
