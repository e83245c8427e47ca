"""MinHash calibration histogram: identical pair has zero error;
disjoint pair estimate error equals the signature collision rate;
buckets honor the integer formula."""

from __future__ import annotations

from skyway_spark.operators.dedup import minhash_error_histogram


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_type string, text_a string, text_b string"
    )


def test_identical_pair_zero_error(spark):
    t = "alpha beta gamma delta epsilon zeta eta theta"
    out = minhash_error_histogram(_pairs(spark, [("id", t, t)])).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.pair_type, r.err_bucket, r.n_pairs, r.max_err_pp) == ("id", 0, 1, 0)


def test_buckets_and_counts(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [("near", a, "ZZ " + a[3:])] * 3 + [("id", a, a)] * 2
    out = minhash_error_histogram(_pairs(spark, rows)).collect()
    got = {(r.pair_type, r.err_bucket): (r.n_pairs, r.max_err_pp) for r in out}
    assert got[("id", 0)][0] == 2
    assert sum(n for n, _ in got.values()) == 5
    for (_, b), (_, mx) in got.items():
        assert b * 5 <= mx < (b + 1) * 5
