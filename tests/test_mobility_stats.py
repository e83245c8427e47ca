"""Hot-mask percolation, radius of gyration, jump-size buckets:
hand fixtures + reference math."""

from __future__ import annotations

from skyway_spark.operators.graph import connected_components


def test_percolation_components_with_singletons(spark):
    # L-shaped cluster {(0,0),(1,0),(1,1)} + singleton (5,5)
    hot = [(0, 0), (1, 0), (1, 1), (5, 5)]
    v = lambda c: c[0] * 1000 + c[1]
    edges = []
    s = set(hot)
    for cx, cy in hot:
        for nb in ((cx + 1, cy), (cx, cy + 1)):
            if nb in s:
                edges.append((v((cx, cy)), v(nb)))
        edges.append((v((cx, cy)), v((cx, cy))))  # self-loop registers node
    df = spark.createDataFrame(edges, "v long, w long")
    cc = connected_components(df, src="v", dst="w").collect()
    comps = {}
    for r in cc:
        comps.setdefault(r.component, set()).add(r.node)
    sizes = sorted(len(m) for m in comps.values())
    assert sizes == [1, 3]


def test_radius_gyration_hand(spark):
    import __spark_entry__ as e

    # directly exercise the cleared-integer identity on a small frame
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [(1, 0, 0), (1, 4, 0), (1, 0, 4), (1, 4, 4)], "user_id long, x long, y long"
    )
    mom = pts.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x") + F.col("y") * F.col("y")).alias("sq"),
    ).collect()[0]
    num = mom.n * mom.sq - mom.sx**2 - mom.sy**2
    # centroid (2,2); each point at squared distance 8 -> rg2 = 8
    assert num / mom.n**2 == 8.0


def test_jump_sizes_buckets(spark, sf_dir="/root/testdata/sf0.001"):
    import __spark_entry__ as e

    out = e.q_jump_sizes(spark, sf_dir).collect()
    assert len(out) >= 1
    for r in out:
        if r.bucket == -1:
            assert r.min_d == 0 and r.max_d == 0
        elif r.bucket < 16:
            assert r.min_d >= (1 << r.bucket)
            assert r.max_d < (1 << (r.bucket + 1))
    # buckets partition the jumps: totals equal the number of moves
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_moves = ev.count() - ev.select("user_id").distinct().count()
    assert sum(r.n_jumps for r in out) == n_moves
