"""Round-3 continuation operators: Moran's I, n-gram containment,
cross-corpus LM scoring, snapshot diffing (batch + checkpoint
incremental read), adaptive quadtree tiles, left-outer stream join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from skyway_spark.operators import dedup, spatialstats, textstats, tiles
from skyway_spark.operators.cdc import snapshot_diff


# ---------------------------------------------------------------------------
# Moran's I
# ---------------------------------------------------------------------------


def _morans_brute(cells: list[tuple[int, int, int]]) -> tuple:
    n = len(cells)
    s = sum(x for _, _, x in cells)
    z = {(cx, cy): n * x - s for cx, cy, x in cells}
    num = 0
    w = 0
    for (cx, cy), zi in z.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (cx + dx, cy + dy)
            if nb in z:
                num += zi * z[nb]
                w += 1
    den = sum(v * v for v in z.values())
    return n, w, num, den


@pytest.mark.parametrize(
    "grid",
    [
        # clustered: two hot blocks -> positive autocorrelation
        [(0, 0, 9), (0, 1, 8), (1, 0, 7), (5, 5, 1), (5, 6, 1), (6, 5, 2)],
        # checkerboard-ish: alternating highs/lows -> negative
        [(0, 0, 9), (0, 1, 1), (0, 2, 9), (1, 0, 1), (1, 1, 9), (1, 2, 1)],
    ],
)
def test_morans_i_matches_bruteforce(spark, grid):
    df = spark.createDataFrame(
        [Row(cx=a, cy=b, x=c) for a, b, c in grid]
    )
    got = spatialstats.morans_i(df).first()
    n, w, num, den = _morans_brute(grid)
    assert (got.n_cells, got.w_pairs, got.num_z, got.den_z) == (n, w, num, den)
    assert got.morans_i == pytest.approx((n * num) / (w * den))


def test_morans_i_sign_for_clustered_vs_checker(spark):
    hot = [(x, y, 50) for x in range(3) for y in range(3)] + [
        (x + 10, y, 1) for x in range(3) for y in range(3)
    ]
    checker = [(x, y, 50 if (x + y) % 2 == 0 else 1) for x in range(4) for y in range(4)]
    i_hot = spatialstats.morans_i(spark.createDataFrame(
        [Row(cx=a, cy=b, x=c) for a, b, c in hot])).first().morans_i
    i_chk = spatialstats.morans_i(spark.createDataFrame(
        [Row(cx=a, cy=b, x=c) for a, b, c in checker])).first().morans_i
    assert i_hot > 0 > i_chk


# ---------------------------------------------------------------------------
# containment pairs
# ---------------------------------------------------------------------------


def test_containment_catches_embedded_doc(spark):
    short = "alpha beta gamma delta epsilon zeta"
    long = "intro words here " + short + " trailing content words again end"
    other = "completely different text with no overlap at all whatsoever"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=short), Row(doc_id=2, text=long), Row(doc_id=3, text=other)]
    )
    pairs = dedup.ngram_containment_pairs(docs, threshold_pct=80).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    p = pairs[0]
    # every shingle of the short doc except the boundary-crossing ones
    # is contained in the long doc
    assert p.inter * 100 >= 80 * min(p.size_a, p.size_b)
    assert p.size_a < p.size_b


def test_containment_jaccard_would_miss_it(spark):
    # the same pair scores low on Jaccard (union-diluted) — the reason
    # containment exists as a separate operator
    short = "alpha beta gamma delta epsilon zeta"
    long = (
        "intro words here " + short + " plus a very long tail of extra filler "
        "tokens that keep growing the union set far beyond the short doc size"
    )
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=short, n_chars=len(short)),
         Row(doc_id=2, text=long, n_chars=len(long))]
    )
    pairs = dedup.ngram_containment_pairs(docs, threshold_pct=80).collect()
    assert len(pairs) == 1
    jac = dedup.ngram_jaccard_pairs(docs, bucket_col="n_chars", threshold=0.0).collect()
    assert jac == []  # different n_chars buckets -> jaccard path pairs nothing


# ---------------------------------------------------------------------------
# cross-corpus LM scoring
# ---------------------------------------------------------------------------


def test_lm_cross_score_oov_and_quantization(spark):
    train = spark.createDataFrame(
        [Row(doc_id=1, text="the cat sat"), Row(doc_id=2, text="the cat ran")]
    )
    cand = spark.createDataFrame(
        [Row(doc_id=10, text="the cat sat"), Row(doc_id=11, text="a dog barked")]
    )
    rows = {r.doc_id: r for r in textstats.lm_cross_score(train, cand).collect()}
    seen = rows[10]
    # "the cat": c2=2, c1(the)=2 -> q=2^20; "cat sat": c2=1, c1(cat)=2 -> 2^19
    assert (seen.n_bigrams, seen.n_oov) == (2, 0)
    assert seen.lm_q == ((1 << 20) + (1 << 19)) // 2
    oov = rows[11]
    assert (oov.n_bigrams, oov.n_oov, oov.lm_q) == (2, 2, 0)


# ---------------------------------------------------------------------------
# snapshot diff + checkpoint incremental read
# ---------------------------------------------------------------------------


def test_snapshot_diff_classifies_iud(spark):
    old = spark.createDataFrame(
        [(1, 10, None), (2, 20, "x"), (3, 30, "y")], "k long, v long, w string"
    )
    new = spark.createDataFrame(
        [(2, 21, "x"), (3, 30, "y"), (4, 40, None)], "k long, v long, w string"
    )
    got = {r.k: r for r in snapshot_diff(old, new, ["k"], ["v", "w"]).collect()}
    assert set(got) == {1, 2, 4}  # k=3 unchanged -> dropped
    assert got[1].op == "D" and got[1].old_v == 10 and got[1].new_v is None
    assert got[2].op == "U" and (got[2].old_v, got[2].new_v) == (20, 21)
    assert got[4].op == "I" and got[4].new_v == 40
    # null-safe compare: w None == None must not flag an update
    both_null = snapshot_diff(
        spark.createDataFrame([(1, 1, None)], "k long, v long, w string"),
        spark.createDataFrame([(1, 1, None)], "k long, v long, w string"),
        ["k"], ["v", "w"],
    ).collect()
    assert both_null == []


def test_checkpoint_read_changes(spark, tmp_path):
    from skyway_spark.plans.checkpoint import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ck"))
    df1 = spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)])
    cm.stage(spark, "t", "v1", lambda: df1)
    df2 = spark.createDataFrame([Row(k=2, v=25), Row(k=3, v=30)])
    cm.stage(spark, "t", "v2", lambda: df2)
    snaps = cm.snapshots("t")
    assert len(snaps) >= 2
    ch = {
        r.k: r
        for r in cm.read_changes(
            spark, "t", snaps[-2]["id"], snaps[-1]["id"], ["k"], ["v"]
        ).collect()
    }
    assert ch[1].op == "D" and ch[2].op == "U" and ch[3].op == "I"


# ---------------------------------------------------------------------------
# adaptive tiles
# ---------------------------------------------------------------------------


def test_adaptive_tiles_partition_properties(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        ((F.col("user_id") * 7919) % 17000 / 100.0 - 85.0).alias("lat"),
        ((F.col("event_id") * 104729) % 36000 / 100.0 - 180.0).alias("lon"),
    )
    out = tiles.adaptive_tiles(pts, base_z=3, max_z=5, threshold=10).collect()
    # exact coverage: every point lands in exactly one leaf
    assert sum(r.n_points for r in out) == pts.count()
    # budget respected except at the floor level
    for r in out:
        assert r.n_points <= 10 or r.z == 5
    # leaves are disjoint: no leaf is an ancestor of another
    cells = {(r.z, r.x, r.y) for r in out}
    for z, x, y in cells:
        zz, xx, yy = z, x, y
        while zz > 3:
            zz, xx, yy = zz - 1, xx // 2, yy // 2
            assert (zz, xx, yy) not in cells
    # skew actually triggered refinement
    assert {r.z for r in out} == {3, 4, 5}


def test_adaptive_tiles_base_equals_max(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(50)
    pts = ev.select(
        ((F.col("user_id") * 7919) % 17000 / 100.0 - 85.0).alias("lat"),
        ((F.col("event_id") * 104729) % 36000 / 100.0 - 180.0).alias("lon"),
    )
    out = tiles.adaptive_tiles(pts, base_z=4, max_z=4, threshold=1).collect()
    assert sum(r.n_points for r in out) == 50
    assert all(r.z == 4 for r in out)


# ---------------------------------------------------------------------------
# left-outer stream-stream join
# ---------------------------------------------------------------------------


def test_stream_stream_left_outer_join_parity(spark, tmp_path):
    """Null-padded unmatched views appear once the watermark passes;
    for events older than max_ts - (watermark + within), streaming
    left-outer == batch left join."""
    from skyway_spark.streaming.events import (
        join_streams_interval,
        read_events_stream,
        run_bounded,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    in_dir = str(tmp_path / "lsj_in")
    # one file -> one data microbatch: no row is late vs the watermark,
    # so every unmatched view must surface as a null-padded row in the
    # final no-data batch (the eviction semantics under test)
    ev.coalesce(1).write.parquet(in_dir)
    views_s = read_events_stream(spark, in_dir).where(F.col("event_type") == "view")
    clicks_s = read_events_stream(spark, in_dir).where(F.col("event_type") == "click")
    joined = join_streams_interval(views_s, clicks_s, how="left_outer")
    out_dir = str(tmp_path / "lsj_out")
    run_bounded(joined, str(tmp_path / "lsj_ck"), out_dir)
    got_df = spark.read.parquet(out_dir)

    # the GLOBAL watermark is the min across both input streams — the
    # clicks stream ends hours before the views stream, so eviction is
    # bounded by the click-side max, not the overall max
    max_ts = min(
        ev.where(F.col("event_type") == t).agg(F.max("ts")).first()[0]
        for t in ("view", "click")
    )
    cutoff = max_ts - dt.timedelta(hours=3, minutes=5)  # watermark 2h + within 1h, strict margin
    got = {
        (r["user_id"], r["l_id"], r["r_id"])
        for r in got_df.where(F.col("l_ts") <= F.lit(cutoff)).collect()
    }
    v = ev.where((F.col("event_type") == "view") & (F.col("ts") <= F.lit(cutoff))).select(
        "user_id", F.col("ts").alias("l_ts"), F.col("event_id").alias("l_id")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("u2"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
    )
    want = {
        (r["user_id"], r["l_id"], r["r_id"])
        for r in v.join(
            c,
            (F.col("user_id") == F.col("u2"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("interval 1 hour")),
            "left",
        ).collect()
    }
    assert got == want and want
    # the outer rows are the point: some views must be null-padded
    assert any(r_id is None for _, _, r_id in got)
