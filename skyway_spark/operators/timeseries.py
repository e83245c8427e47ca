"""Time-series resampling: regular-grid gap fill + forward fill.

No reference counterpart (skyway never parses timestamps —
src/elements.rs:37 keeps them as opaque strings; SURVEY.md §2.4) —
this is a training-pipeline operator over the events stream.

Scale shape: one shuffle aggregates raw events to (key, bucket); the
dense grid is generated per key with JVM-side sequence()+explode from
the per-key min/max bucket (computed from the AGGREGATE rows, never
re-scanning raw events), and the grid joins back to the aggregate on
(key, bucket). Forward fill is a window last(ignorenulls) over the
grid — rows per key bounded by the time span, not the event rate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hourly_gap_fill(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    cents_col=None,
) -> DataFrame:
    """Dense hourly series per key between that key's first and last
    event hour: n_events (0 on gap hours) and ffill_cents (the last
    seen hour-sum of integer cents, carried forward across gaps).

    cents_col defaults to floor(value*100) — integer money so sums
    are cross-engine exact.
    """
    cents = cents_col if cents_col is not None else F.floor(F.col("value") * 100)
    hour = F.date_trunc("hour", F.col(ts_col))
    agg = events.groupBy(F.col(key), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents.cast("long")).alias("cents"),
    )
    spans = agg.groupBy(key).agg(
        F.min("hour").alias("__h0"), F.max("hour").alias("__h1")
    )
    grid = spans.select(
        F.col(key),
        F.explode(
            F.sequence(F.col("__h0"), F.col("__h1"), F.expr("interval 1 hour"))
        ).alias("hour"),
    )
    dense = grid.join(agg, [key, "hour"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        F.col(key),
        F.col("hour"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last(F.col("cents"), ignorenulls=True).over(w).alias("ffill_cents"),
    )
