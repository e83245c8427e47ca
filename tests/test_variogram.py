"""variogram_hex (operators/spatialstats): the moment-pairing closed
form vs literal point-pair brute force on a small set."""

from __future__ import annotations

from skyway_spark.functions.hexgrid import FP, SQRT3_FP


def _ref_qr(x, y, s):
    s3 = 3 * s
    qs = (SQRT3_FP * x - FP * y) // s3
    rs = (2 * FP * y) // s3
    ss = -qs - rs
    h = FP // 2
    qr, rr, sr = (qs + h) // FP, (rs + h) // FP, (ss + h) // FP
    if qr + rr + sr != 0:
        dq, dr, ds = abs(qs - qr * FP), abs(rs - rr * FP), abs(ss - sr * FP)
        if dq >= dr and dq >= ds:
            qr = -rr - sr
        elif dr >= ds:
            rr = -qr - sr
    return qr, rr


def test_matches_pointwise_bruteforce(spark):
    from skyway_spark.operators.spatialstats import variogram_hex

    size = 1_000_000
    pts = [
        (i, (i * 37) % 11 * 400_000, (i * 53) % 13 * 350_000, (i * 7) % 90)
        for i in range(80)
    ]
    df = spark.createDataFrame(pts, "event_id long, x long, y long, v_q long")
    got = {
        r.band: (r.n_pairs, r.ssd)
        for r in variogram_hex(df, size_u=size, max_band=3).collect()
    }
    # brute force over literal point pairs
    cells = {i: _ref_qr(x, y, size) for i, x, y, _ in pts}
    vals = {i: v for i, _, _, v in pts}
    want = {}
    ids = [p[0] for p in pts]
    for ii in range(len(ids)):
        for jj in range(ii + 1, len(ids)):
            a, b = ids[ii], ids[jj]
            (q1, r1), (q2, r2) = cells[a], cells[b]
            d = (abs(q1 - q2) + abs(r1 - r2) + abs(q1 + r1 - q2 - r2)) // 2
            if d > 3:
                continue
            n, s = want.get(d, (0, 0))
            want[d] = (n + 1, s + (vals[a] - vals[b]) ** 2)
    assert {b: v for b, v in got.items() if v[0] > 0} == want
