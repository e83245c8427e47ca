"""Property-based tests (hypothesis) for the round-3-continuation
pure-math operators: the DDA line walk, next-fit bin packing, and the
engine-exact z-score inequality — each against an independent python
mirror over randomized inputs.  Spark evaluates ONCE per property on
the full example batch (collected via a single createDataFrame), so
the suite stays fast."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from skyway_spark.operators import tiles
from skyway_spark.operators.packing import next_fit_bins
from skyway_spark.operators.stats import running_zscore_flags

COORD = st.integers(min_value=-40, max_value=40)
SEGS = st.lists(
    st.tuples(COORD, COORD, COORD, COORD), min_size=1, max_size=8, unique=True
)


def _walk(ax, ay, bx, by):
    adx, ady = abs(bx - ax), abs(by - ay)
    s1 = max(max(adx, ady), 1)
    sx = (bx > ax) - (bx < ax)
    sy = (by > ay) - (by < ay)
    return [
        (ax + sx * ((2 * k * adx + s1) // (2 * s1)),
         ay + sy * ((2 * k * ady + s1) // (2 * s1)))
        for k in range(max(adx, ady) + 1)
    ]


@settings(max_examples=20, deadline=None)
@given(SEGS)
def test_dda_walk_property(spark, segs):
    from collections import Counter

    df = spark.createDataFrame(segs, "ax long, ay long, bx long, by long")
    got = {(r.x, r.y): r.n_segs for r in tiles.rasterize_segments(df).collect()}
    want = Counter()
    for ax, ay, bx, by in segs:
        w = _walk(ax, ay, bx, by)
        # invariants: endpoints included, 8-connected, no revisits
        assert w[0] == (ax, ay) and w[-1] == (bx, by)
        assert len(set(w)) == len(w)
        for (x1, y1), (x2, y2) in zip(w, w[1:]):
            assert max(abs(x2 - x1), abs(y2 - y1)) == 1
        want.update(w)
    assert got == dict(want)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=12),
    st.integers(min_value=1, max_value=30),
)
def test_next_fit_bins_property(spark, sizes, cap):
    items = spark.createDataFrame(
        list(enumerate(sizes)), "item long, n_points long"
    )
    out = sorted(
        next_fit_bins(items, capacity=cap, order_cols=["n_points", "item"]).collect(),
        key=lambda r: (r.n_points, r.item),
    )
    run = 0
    for r in out:
        assert r.running_start == run and r.bin == run // cap
        run += r.n_points


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=6,
        max_size=20,
    )
)
def test_running_zscore_property(spark, values):
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, "x", float(v), "{}")
        for i, v in enumerate(values)
    ]
    ddl = ("event_id long, ts timestamp, user_id long, event_type string, "
           "value double, props string")
    got = {
        r.point_id
        for r in running_zscore_flags(
            spark.createDataFrame(rows, ddl)
        ).collect()
    }
    # python mirror with exact Fractions for the z^2 > 9 test
    want = set()
    n = s = ssq = 0
    for i, v in enumerate(values):
        vq = math.floor(float(v) * 100)
        if n >= 5:
            var_n2 = n * ssq - s * s
            if Fraction((vq * n - s) ** 2) > 9 * Fraction(var_n2):
                want.add(i)
        n, s, ssq = n + 1, s + vq, ssq + vq * vq
    assert got == want
