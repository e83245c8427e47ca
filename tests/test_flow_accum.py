"""D8 flow accumulation (operators/spatialstats.flow_accumulation):
hand-built grids vs a tiny reference implementation, pit detection,
long-chain doubling correctness, and the acc conservation identity."""

from __future__ import annotations

from skyway_spark.operators.spatialstats import flow_accumulation

OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def _ref(cells):
    """cells: {(cx, cy): elev} -> {(cx, cy): (acc, is_pit)}."""
    flow = {}
    for (cx, cy), e0 in cells.items():
        best = None
        for dx, dy in OFFS:
            n = (cx + dx, cy + dy)
            if n in cells and cells[n] < e0:
                key = (cells[n], dx, dy)
                if best is None or key < best[0]:
                    best = (key, n)
        if best is not None:
            flow[(cx, cy)] = best[1]
    acc = {c: 0 for c in cells}
    for c in cells:
        cur = c
        while cur in flow:
            cur = flow[cur]
            acc[cur] += 1
    return {c: (acc[c], c not in flow) for c in cells}


def _run(spark, cells):
    df = spark.createDataFrame(
        [(cx, cy, e) for (cx, cy), e in cells.items()],
        "cx long, cy long, elev long",
    )
    out = flow_accumulation(df).collect()
    return {(r.cx, r.cy): (r.acc, r.is_pit) for r in out}


def test_single_chain(spark):
    # strictly descending 1-D chain: acc counts all upstream cells
    cells = {(i, 0): 100 - i for i in range(10)}
    got = _run(spark, cells)
    assert got == _ref(cells)
    assert got[(9, 0)] == (9, True)  # bottom of the chain: pit, all 9 above
    assert got[(0, 0)] == (0, False)  # ridge top


def test_long_chain_exercises_doubling(spark):
    # length 70 > 2^6: forces 7 doubling rounds, counts must stay exact
    cells = {(i, 0): 1000 - i for i in range(70)}
    got = _run(spark, cells)
    assert got[(69, 0)] == (69, True)
    assert all(got[(i, 0)][0] == i for i in range(70))


def test_two_basins_and_tiebreak(spark):
    # V-shape: two slopes draining to the valley cell in the middle
    cells = {(i, 0): abs(i - 3) * 10 + 1 for i in range(7)}
    cells[(3, 0)] = 0  # valley pit
    got = _run(spark, cells)
    assert got == _ref(cells)
    assert got[(3, 0)] == (6, True)


def test_plateau_isolated_cells_are_pits(spark):
    # equal elevations never flow (strictly-lower rule)
    cells = {(0, 0): 5, (1, 0): 5, (10, 10): 7}
    got = _run(spark, cells)
    assert all(v == (0, True) for v in got.values())


def test_random_grid_matches_reference_and_conserves(spark):
    cells = {
        (x, y): (x * 7919 + y * 104729) % 97 + 3 * x + 2 * y
        for x in range(8)
        for y in range(6)
    }
    got = _run(spark, cells)
    ref = _ref(cells)
    assert got == ref
    # conservation: sum of pit accumulations + #pits == total cells
    pits = [c for c, (_, p) in got.items() if p]
    assert sum(got[c][0] for c in pits) + len(pits) == len(cells)
