"""Knox space-time statistic, quadrat VMR, rendezvous sharding:
brute-force references and the consistent-placement invariant."""

from __future__ import annotations

from itertools import combinations

from skyway_spark.operators.partitioner import rendezvous_shards
from skyway_spark.operators.spatialstats import knox_statistic, quadrat_dispersion

PRIME = 2147483647


def _ref_knox(rows, tau):
    n_s = n_t = n_st = 0
    for (i1, t1, x1, y1), (i2, t2, x2, y2) in combinations(rows, 2):
        s = max(abs(x1 - x2), abs(y1 - y2)) <= 1
        t = abs(t1 - t2) <= tau
        n_s += s
        n_t += t
        n_st += s and t
    return n_s, n_t, n_st


def test_knox_brute_force(spark):
    rows = [
        (i, (i * 37) % 100, (i * 7) % 5, (i * 3) % 4) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "event_id long, t_us long, cx long, cy long")
    r = knox_statistic(df, tau_us=10).collect()[0]
    n_s, n_t, n_st = _ref_knox(rows, 10)
    assert (r.n_events, r.n_pairs) == (40, 780)
    assert (r.n_s, r.n_t, r.n_st) == (n_s, n_t, n_st)
    assert r.expected_st == n_s * n_t / 780


def test_knox_boundary_dt_exactly_tau(spark):
    # dt == tau must count; dt == tau+1 must not; across-bucket pair
    rows = [(1, 0, 0, 0), (2, 10, 50, 50), (3, 21, 90, 90)]
    df = spark.createDataFrame(rows, "event_id long, t_us long, cx long, cy long")
    r = knox_statistic(df, tau_us=10).collect()[0]
    assert r.n_t == 1  # only (1,2); (2,3) dt=11 > tau
    assert r.n_s == 0


def test_knox_negative_timestamps_floor_bucketing(spark):
    # pre-epoch timestamps: cast-truncation would give bucket 0 width
    # ~2*tau and over-count; floor bucketing must match brute force
    rows = [
        (i, t, (i * 7) % 5, (i * 3) % 4)
        for i, t in enumerate([-25, -15, -11, -10, -1, 0, 1, 9, 10, 21])
    ]
    df = spark.createDataFrame(rows, "event_id long, t_us long, cx long, cy long")
    r = knox_statistic(df, tau_us=10).collect()[0]
    n_s, n_t, n_st = _ref_knox(rows, 10)
    assert (r.n_s, r.n_t, r.n_st) == (n_s, n_t, n_st)


def test_quadrat_dispersion_uniform_vs_clustered(spark):
    # one point per quadrat on a 4-quadrat grid: VMR = 0 (fully even)
    even = spark.createDataFrame(
        [(x, y) for x in range(2) for y in range(2)], "cx long, cy long"
    )
    r = quadrat_dispersion(even, n_quadrats=4).collect()[0]
    assert (r.n_points, r.n_occupied, r.sum_sq) == (4, 4, 4)
    assert r.vmr_num == 4 * 4 - 16 and r.vmr == 0.0
    # all 4 points in one quadrat of 4: clustered, VMR = (4*16-16)/(4*3)
    clus = spark.createDataFrame([(0, 0)] * 4, "cx long, cy long")
    r = quadrat_dispersion(clus, n_quadrats=4).collect()[0]
    assert (r.vmr_num, r.vmr_den) == (48, 12)
    assert r.vmr == 4.0


def _score(doc, s):
    # id reduced mod P before the LCG multiply (int64-safe on all engines)
    return (((doc % PRIME) * 131 + s * 7919) % PRIME * 1103515245 + 12345) % PRIME


def _ref_shard(doc, n):
    return max(range(n), key=lambda s: (_score(doc, s), -s))


def test_rendezvous_only_new_shard_receives(spark):
    ids = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    out = {r.shard: r for r in rendezvous_shards(ids, 8, 9).collect()}
    # invariant: movers land ONLY on the new shard
    for s, r in out.items():
        if s < 8:
            assert r.n_moved_in == 0
    assert out[8].n_moved_in == out[8].n_after_here
    assert sum(r.n_before_here for r in out.values()) == 500
    assert sum(r.n_after_here for r in out.values()) == 500
    # agreement with the scalar reference on both configs
    import collections

    exp_after = collections.Counter(_ref_shard(i, 9) for i in range(500))
    for s, r in out.items():
        assert r.n_after_here == exp_after[s]


def test_rendezvous_large_ids_no_overflow(spark):
    # ids above ~6.4e10 overflowed int64 in the unreduced hash form;
    # the reduced form must agree with the big-int scalar reference
    ids = [10**11 + i * 10**13 for i in range(40)]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = {r.shard: r.n_after_here for r in rendezvous_shards(df, 4, 7).collect()}
    import collections

    exp = collections.Counter(_ref_shard(i, 7) for i in ids)
    for s, n in exp.items():
        assert out.get(s, 0) == n


def test_rendezvous_same_n_no_moves(spark):
    ids = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = rendezvous_shards(ids, 5, 5).collect()
    assert all(r.n_moved_in == 0 for r in out)
