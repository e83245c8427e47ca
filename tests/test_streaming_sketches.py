"""Streaming sketch maintenance == batch sketch, exactly.

HLL registers (max-combine) and CMS counters (sum-combine) are
mergeable aggregations, so running the SAME operator over a stream of
arriving shards must produce bit-identical sketch state to one batch
pass — the property that lets 100 TB pipelines keep per-day sketches
incrementally fresh without re-scanning history."""

from __future__ import annotations

from pyspark.sql import functions as F

from skyway_spark.operators.sketches import (
    cms_estimate,
    cms_sketch,
    hll_distinct,
    hll_estimate,
    hll_sketch,
)
from skyway_spark.streaming.events import run_bounded_complete

EV_DDL = "user_id long, cell long"


def _two_chunk_stream(spark, tmp_path, rows, ddl, split):
    in_dir = str(tmp_path / "sk_in")
    spark.createDataFrame(rows[:split], ddl).coalesce(1).write.mode(
        "overwrite"
    ).parquet(in_dir)
    spark.createDataFrame(rows[split:], ddl).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    return spark.readStream.schema(ddl).parquet(in_dir)


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    rows = [(int(u), int(u) % 3) for u in range(1, 200)] + [(7, 0), (7, 1)]
    stream = _two_chunk_stream(spark, tmp_path, rows, EV_DDL, split=120)
    run_bounded_complete(hll_sketch(stream, "cell", "user_id", m=16), "hll_regs")
    got = {
        (r.grp, r.bucket): r.rho
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    batch = spark.createDataFrame(rows, EV_DDL)
    want = {
        (r.grp, r.bucket): r.rho
        for r in hll_sketch(batch, "cell", "user_id", m=16).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_hll_estimates_equal_batch(spark, tmp_path):
    rows = [(int(u * 13 + 1), int(u) % 2) for u in range(400)]
    stream = _two_chunk_stream(spark, tmp_path, rows, EV_DDL, split=150)
    run_bounded_complete(hll_sketch(stream, "cell", "user_id", m=16), "hll_regs2")
    regs = spark.sql("SELECT * FROM hll_regs2")
    got = {r.grp: r.est for r in hll_estimate(regs, m=16).collect()}
    batch = spark.createDataFrame(rows, EV_DDL)
    want = {r.grp: r.est for r in hll_distinct(batch, "cell", "user_id", m=16).collect()}
    assert got == want


def test_streaming_cms_counters_equal_batch(spark, tmp_path):
    ddl = "doc_id long, text string"
    rows = [(i, f"alpha beta gamma token{i % 5}") for i in range(60)]
    stream = _two_chunk_stream(spark, tmp_path, rows, ddl, split=25)
    run_bounded_complete(cms_sketch(stream, w=256), "cms_counters")
    sk_stream = spark.sql("SELECT * FROM cms_counters")
    got = {(r.row, r.bucket): r.n for r in sk_stream.collect()}
    batch = spark.createDataFrame(rows, ddl)
    want = {(r.row, r.bucket): r.n for r in cms_sketch(batch, w=256).collect()}
    assert got == want and len(want) > 0
    # point queries through the streamed sketch match the batch path
    terms = spark.createDataFrame([("alpha",), ("token0",)], "term string")
    est_s = {r.term: r.cms_n for r in cms_estimate(terms, sk_stream, w=256).collect()}
    est_b = {
        r.term: r.cms_n
        for r in cms_estimate(terms, batch.sparkSession.createDataFrame(
            want.items() and [(k[0], k[1], v) for k, v in want.items()],
            "row int, bucket long, n long",
        ), w=256).collect()
    }
    assert est_s == est_b and est_s["alpha"] >= 60


# ---------------------------------------------------------------------------
# streaming CDC upsert (copy-on-write snapshot versions)
# ---------------------------------------------------------------------------


def test_streaming_cdc_equals_batch_apply(spark, tmp_path):
    from skyway_spark.operators.cdc import apply_changelog
    from skyway_spark.streaming.events import (
        apply_changelog_stream,
        latest_snapshot_version,
        read_snapshot,
    )

    root = str(tmp_path / "snap")
    spark.createDataFrame(
        [(k, f"v{k}") for k in range(10)], "k long, v string"
    ).write.mode("overwrite").parquet(root + "/v0")

    ch_ddl = "k long, seq long, op string, v string"
    ch_dir = str(tmp_path / "changes")
    # two files -> two micro-batches (maxFilesPerTrigger=1); keys are
    # disjoint across files so batch order cannot matter
    f1 = [(1, 1, "U", "a1"), (1, 2, "U", "a2"), (2, 3, "D", "x")]
    f2 = [(5, 4, "D", "x"), (20, 5, "U", "new"), (6, 6, "U", "b6")]
    spark.createDataFrame(f1, ch_ddl).coalesce(1).write.mode("overwrite").parquet(ch_dir)
    spark.createDataFrame(f2, ch_ddl).coalesce(1).write.mode("append").parquet(ch_dir)

    stream = (
        spark.readStream.schema(ch_ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(ch_dir)
    )
    q = apply_changelog_stream(stream, root, ["k"], str(tmp_path / "cdc_ck"))
    q.awaitTermination()

    assert latest_snapshot_version(spark, root) == 2  # one version per batch
    got = {(r.k, r.v) for r in read_snapshot(spark, root).collect()}
    batch = apply_changelog(
        spark.read.parquet(root + "/v0"),
        spark.createDataFrame(f1 + f2, ch_ddl),
        ["k"],
    )
    want = {(r.k, r.v) for r in batch.collect()}
    assert got == want
    assert (1, "a2") in got and (20, "new") in got
    assert not any(k in (2, 5) for k, _ in got)
