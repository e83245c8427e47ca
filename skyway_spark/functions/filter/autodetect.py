"""Filter language auto-detection + sequential chaining.

Mirrors create_filter (src/filter/mod.rs:18-28): try OSMFilter parse,
fall back to CEL compile, else raise. Multiple filters chain
sequentially, each seeing the previous filter's tag mutations
(src/main.rs:162-171) — here a simple ``df.transform`` composition,
which Catalyst fuses into one narrow stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from skyway_spark.functions.filter.cel import CelCompileError, compile_cel
from skyway_spark.functions.filter.osmfilter_compile import compile_osmfilter
from skyway_spark.functions.filter.osmfilter_parser import OsmFilterParseError, parse_osmfilter


def create_filter(text: str):
    """Returns a compiled filter object with ``.apply(df) -> df``."""
    try:
        return compile_osmfilter(parse_osmfilter(text))
    except OsmFilterParseError:
        pass
    try:
        return compile_cel(text)
    except CelCompileError as e:
        raise ValueError(f"filter is neither valid OSMFilter nor CEL: {e}") from e


def apply_filters(df: DataFrame, filter_texts: list[str]) -> DataFrame:
    for text in filter_texts:
        df = create_filter(text).apply(df)
    return df
