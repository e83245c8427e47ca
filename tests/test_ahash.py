"""aHash multimodal near-dup (operators/multimodal.ahash64 +
hamming_near_dup_pairs): integer hash vs a pure-python reference, and
band-join candidate generation proven complete against brute force —
the pigeonhole guarantee the docstring claims."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skyway_spark.operators.multimodal import (
    _ahash_int,
    ahash64,
    hamming_near_dup_pairs,
)


def _ref_ahash(payload: bytes, dim: int = 64) -> int:
    buckets = [0] * dim
    for i, byte in enumerate(payload):
        buckets[i % dim] += byte
    buckets = [b % 256 for b in buckets]
    total = sum(buckets)
    h = 0
    for k in range(dim):
        if buckets[k] * dim > total:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


@pytest.mark.parametrize(
    "payload",
    [b"", b"a", b"hello world", bytes(range(256)) * 3, b"\xff" * 130, b"x" * 64],
)
def test_ahash_int_matches_reference(payload):
    assert _ahash_int(payload) == _ref_ahash(payload)


def test_ahash_constant_payload_is_zero():
    # uniform buckets: no bucket strictly exceeds the mean
    assert _ahash_int(b"q" * 640) == 0


def _media(spark, rows):
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_ahash64_dataframe_and_null_payload(spark):
    rows = [(1, b"hello world"), (2, None), (3, b"")]
    got = {r.media_id: r.ahash for r in ahash64(_media(spark, rows)).collect()}
    assert got == {1: _ref_ahash(b"hello world"), 2: 0, 3: 0}


def test_hamming_pairs_complete_vs_bruteforce(spark):
    # hashes engineered to straddle band boundaries: mutations in one
    # band, spread across bands, and beyond the radius
    mask = (1 << 64) - 1
    base = _ref_ahash(bytes(range(200))) & mask
    hs = [
        (0, base),
        (1, base ^ 0b11),                 # 2 bits, same band
        (2, base ^ (1 << 5) ^ (1 << 40)), # 2 bits, two bands
        (3, base ^ (1 << 63)),            # sign bit flip, 1 bit
        (4, base ^ 0b1111),               # 4 bits -> outside r=3
        (5, (~base) & mask),              # full inversion, far away
    ]
    hs = [(i, (h & mask) - (1 << 64) if h & (1 << 63) else h & mask) for i, h in hs]
    df = spark.createDataFrame(hs, "media_id long, ahash long")
    for r in (0, 1, 3):
        got = {
            (x.id_a, x.id_b): x.hamming
            for x in hamming_near_dup_pairs(df, max_hamming=r).collect()
        }
        want = {}
        for i, a in hs:
            for j, b in hs:
                if i < j:
                    d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                    if d <= r:
                        want[(i, j)] = d
        assert got == want, f"r={r}"


def test_hamming_pairs_never_all_pairs_plan(spark):
    # candidate generation must be an equi-join (SortMerge/Hash), not a
    # cartesian/broadcast-nested-loop
    df = _media(spark, [(i, bytes([i % 256]) * (i + 1)) for i in range(20)])
    plan = (
        hamming_near_dup_pairs(ahash64(df), max_hamming=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
