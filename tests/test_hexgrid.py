"""Hex grid (functions/hexgrid): cube-round invariant (q+r+s == 0),
round-trip stability (a cell's own rounded center re-encodes to
itself), disk sizes 1+3k(k+1), hex distance axioms, and a pure-python
reference parity sweep."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from skyway_spark.functions.hexgrid import (
    FP,
    SQRT3_FP,
    disk_offsets,
    hex_disk,
    hex_distance,
    hex_encode,
    hex_pack,
    hex_q,
    hex_qr,
    hex_r,
)

SIZE = 2_500_000


def _ref_qr(x, y, s=SIZE):
    def fd(a, b):
        return a // b  # python floor div == the pmod construction

    s3 = 3 * s
    qs = fd(SQRT3_FP * x - FP * y, s3)
    rs = fd(2 * FP * y, s3)
    ss = -qs - rs
    h = FP // 2
    qr, rr, sr = fd(qs + h, FP), fd(rs + h, FP), fd(ss + h, FP)
    if qr + rr + sr != 0:
        dq, dr, ds = abs(qs - qr * FP), abs(rs - rr * FP), abs(ss - sr * FP)
        if dq >= dr and dq >= ds:
            qr = -rr - sr
        elif dr >= ds:
            rr = -qr - sr
        else:
            sr = -qr - rr
    return qr, rr


def test_matches_python_reference_sweep(spark):
    pts = [
        (i, (i * 104729) % 36000 * 10000 - 180000000,
         (i * 7919) % 17000 * 10000 - 85000000)
        for i in range(500)
    ]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    q, r = hex_qr(F.col("x"), F.col("y"), SIZE)
    got = {row.i: (row.q, row.r) for row in df.select("i", q.alias("q"), r.alias("r")).collect()}
    for i, x, y in pts:
        assert got[i] == _ref_qr(x, y), (i, x, y)


def test_sqrt3_constant():
    assert SQRT3_FP == round(math.sqrt(3) * FP)


def test_disk_offsets_sizes():
    for k in range(5):
        assert len(disk_offsets(k)) == 1 + 3 * k * (k + 1)


def test_disk_and_distance_agree(spark):
    # every cell in disk(k) is at hex distance <= k, and ring k is hit
    df = spark.range(1).select(
        hex_encode(F.lit(12_345_678), F.lit(-7_654_321), SIZE).alias("c")
    )
    k = 3
    rows = (
        df.select("c", F.explode(hex_disk(F.col("c"), k)).alias("nb"))
        .select(
            hex_distance(
                hex_q(F.col("c")), hex_r(F.col("c")),
                hex_q(F.col("nb")), hex_r(F.col("nb")),
            ).alias("d")
        )
        .collect()
    )
    ds = [r.d for r in rows]
    assert len(ds) == 1 + 3 * k * (k + 1)
    assert max(ds) == k and min(ds) == 0
    assert ds.count(k) == 6 * k  # outer ring size


def test_pack_roundtrip(spark):
    rows = spark.createDataFrame(
        [(q, r) for q in (-40, 0, 37) for r in (-11, 0, 23)], "q long, r long"
    ).select(
        "q", "r",
        hex_q(hex_pack(F.col("q"), F.col("r"))).alias("q2"),
        hex_r(hex_pack(F.col("q"), F.col("r"))).alias("r2"),
    )
    assert all(x.q == x.q2 and x.r == x.r2 for x in rows.collect())


def test_neighbor_continuity(spark):
    # moving one hex size east changes the cell by at most distance 1
    pts = [(i, i * 1_000_000, 4_000_000) for i in range(40)]
    df = spark.createDataFrame(pts, "i long, x long, y long")
    q, r = hex_qr(F.col("x"), F.col("y"), SIZE)
    seq = [
        (row.q, row.r)
        for row in df.select("i", q.alias("q"), r.alias("r")).orderBy("i").collect()
    ]
    for (q1, r1), (q2, r2) in zip(seq, seq[1:]):
        d = (abs(q1 - q2) + abs(r1 - r2) + abs(q1 + r1 - q2 - r2)) // 2
        assert d <= 1
