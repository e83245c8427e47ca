"""Emerging hot-spot classification: category ladder on the driver
fixture + partition/conservation invariants."""

from __future__ import annotations

import __spark_entry__ as e


def test_categories_partition_hot_cells(spark):
    sf = "/root/testdata/sf0.001"
    out = e.q_emerging_hotspots(spark, sf).collect()
    cats = {r.category for r in out}
    assert cats <= {"new", "persistent", "intensifying", "diminishing", "sporadic"}
    # census covers exactly the ever-hot cells
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf}/events.parquet")
    cx = (((F.col("user_id") * 7919) % 17000) / F.lit(e.EHS_RES)).cast("long")
    cy = (((F.col("event_id") * 104729) % 36000) / F.lit(e.EHS_RES)).cast("long")
    wk = (
        F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").cast("long")
        / F.lit(e.EHS_DAYS)
    ).cast("long")
    counts = (
        ev.select(cx.alias("cx"), cy.alias("cy"), wk.alias("w"))
        .groupBy("cx", "cy", "w")
        .count()
    )
    n_hot_cells = (
        counts.where(F.col("count") >= e.EHS_THR)
        .select("cx", "cy")
        .distinct()
        .count()
    )
    assert sum(r.n_cells for r in out) == n_hot_cells
