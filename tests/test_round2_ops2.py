"""Round-2 batch 2: sequence packing, source rebalancing, triangle
stats, grid heatmap — each against a hand-computed / Python mirror."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from skyway_spark.functions import cells
from skyway_spark.operators.cluster import grid_heatmap
from skyway_spark.operators.graph import triangle_stats
from skyway_spark.operators.packing import pack_sequences
from skyway_spark.operators.sampling import BUCKETS, rebalance_sources

# --------------------------- packing --------------------------------


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_sequences_hand_computed(spark):
    texts = ["a b c", "d", "e f", "g h i j", "k"]  # lens 3 1 2 4 1
    out = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(_docs(spark, texts), seq_len=4, block_size=2).collect()
    }
    # concat order = doc_id order; starts: 0, 3, 4, 6, 10
    assert [out[i]["start_offset"] for i in range(5)] == [0, 3, 4, 6, 10]
    assert [out[i]["seq_id"] for i in range(5)] == [0, 0, 1, 1, 2]
    assert [out[i]["seq_offset"] for i in range(5)] == [0, 3, 0, 2, 2]
    assert [out[i]["n_tokens"] for i in range(5)] == [3, 1, 2, 4, 1]


def test_pack_sequences_block_size_invariant(spark):
    texts = [" ".join(["w"] * (1 + (i * 7) % 13)) for i in range(60)]
    df = _docs(spark, texts)
    a = sorted(map(tuple, pack_sequences(df, 16, block_size=1).collect()))
    b = sorted(map(tuple, pack_sequences(df, 16, block_size=7).collect()))
    c = sorted(map(tuple, pack_sequences(df, 16, block_size=1024).collect()))
    assert a == b == c


def test_pack_sequences_sparse_noncontiguous_ids(spark):
    # gaps in doc_id must not create phantom offsets
    df = spark.createDataFrame(
        [(3, "a b"), (90, "c"), (4000, "d e f")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["start_offset"] for r in pack_sequences(df, 4, block_size=64).collect()}
    assert got == {3: 0, 90: 2, 4000: 3}


# -------------------------- rebalancing ------------------------------


def test_rebalance_whitelist_and_scale(spark):
    rows = [(i, "en") for i in range(400)] + \
           [(i + 1000, "de") for i in range(100)] + \
           [(i + 2000, "zh") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = rebalance_sources(df, {"en": 0.5, "de": 0.5}, strata_col="lang")
    got = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    # scale = min(400/.5, 100/.5) = 200 -> de kept whole (cut=BUCKETS),
    # en kept at rate 100/400 = 0.25 (cut = 250000)
    assert "zh" not in got  # not whitelisted -> dropped
    assert got["de"] == 100
    # deterministic-hash keep at cut 250000: mirror the exact formula
    cut = int((0.5 * 200.0) / 400.0 * BUCKETS)
    kept = sum(
        1 for i in range(400)
        if ((i % 2147483647) * 1103515245 + 12345) % 2147483647 % BUCKETS < cut
    )
    assert got["en"] == kept


def test_rebalance_deterministic_under_repartition(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    t = {"en": 0.5, "de": 0.3, "fr": 0.2}
    a = sorted(r["doc_id"] for r in rebalance_sources(df, t, strata_col="lang").collect())
    b = sorted(
        r["doc_id"]
        for r in rebalance_sources(df.repartition(13, "lang"), t, strata_col="lang").collect()
    )
    assert a == b and len(a) > 0


# --------------------------- triangles -------------------------------


def test_triangle_stats_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) + pendant 5, plus noise the
    # canonicalizer must absorb: duplicates, reversed edges, self-loop
    edges = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5)]
    noisy = edges + [(b, a) for a, b in edges] + [(2, 1), (3, 3)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row["n_nodes"] == 5
    assert row["n_edges"] == 7
    assert row["max_degree"] == 4  # node 4: {1,2,3,5}
    assert row["n_triangles"] == 4


def test_triangle_stats_triangle_free(spark):
    # star graph: wedges everywhere, zero closures
    df = spark.createDataFrame([(0, i) for i in range(1, 9)], "src long, dst long")
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 0 and row["max_degree"] == 8


# ---------------------------- heatmap --------------------------------


def test_grid_heatmap_interior_point_kernel(spark):
    # one point far from the grid border: full 3x3 binomial mass
    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    res = 5
    got = {r["cell"]: r["density"] for r in grid_heatmap(df, res=res).collect()}
    cx = cells.cell_x_py(cells.pack_cell_py(32, 16, res))  # lon 0 -> x=32
    assert len(got) == 9
    w1 = {-1: 0.25, 0: 0.5, 1: 0.25}
    for (dx, dy) in itertools.product((-1, 0, 1), repeat=2):
        cell = cells.pack_cell_py(32 + dx, 16 + dy, res)
        assert got[cell] == w1[dx] * w1[dy]
    assert abs(sum(got.values()) - 1.0) < 1e-12
    assert cx == 32  # fixture sanity


def test_grid_heatmap_border_mass_lost(spark):
    # point in the corner cell (0,0): out-of-grid taps are dropped
    df = spark.createDataFrame([(89.9, -179.9)], "lat double, lon double")
    got = {r["cell"]: r["density"] for r in grid_heatmap(df, res=5).collect()}
    assert len(got) == 4  # only the in-grid 2x2 quadrant survives
    assert sum(got.values()) == (0.5 + 0.25) * (0.5 + 0.25)
