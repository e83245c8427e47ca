"""Exact statistical aggregates beyond SUM/COUNT.

Spark's var_pop/stddev run Welford-style float accumulation whose
result depends on partition order — unusable under a bit-exact
cross-engine gate. These aggregates keep the MOMENTS in int64
(order-independent) and derive mean/variance from them with a PINNED
sequence of IEEE double operations: +, -, *, / are correctly rounded
by the standard, so identical inputs + identical op order = identical
doubles on any engine — which floor() then pins to an integer.

Scale shape: one map-side-combined groupBy; three int64 sums per
group. At 10^12 rows raw second moments can exceed int64 — the
docstring contract bounds |x| so n*x^2 fits (token counts, lengths,
ratings all qualify); past that, swap the sums to DECIMAL(38,0), same
plan.

No reference counterpart (skyway has no aggregation; SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def group_moments(
    df: DataFrame,
    group_col: str,
    value: Column,
    mean_scale: int = 1000,
    var_scale: int = 1_000_000,
) -> DataFrame:
    """(group, n, sum_x, sum_x2, mean_milli, var_micro) with ``value``
    an integer-valued Column (cast to long inside).

    mean_milli = floor(sum_x / n * mean_scale);
    var_micro  = floor((sum_x2/n - (sum_x/n)^2) * var_scale);
    both via the pinned double op order mirrored by the SQL oracle
    (floor, not a cast: DuckDB's DOUBLE->BIGINT cast ROUNDS while
    Spark's truncates — floor agrees everywhere).
    """
    x = value.cast("long")
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sum_x"),
        F.sum(x * x).alias("sum_x2"),
    )
    m = F.col("sum_x").cast("double") / F.col("n").cast("double")
    var = F.col("sum_x2").cast("double") / F.col("n").cast("double") - m * m
    return g.select(
        "grp",
        "n",
        "sum_x",
        "sum_x2",
        F.floor(m * float(mean_scale)).alias("mean_milli"),
        F.floor(var * float(var_scale)).alias("var_micro"),
    )
