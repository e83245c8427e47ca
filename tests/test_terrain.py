"""Watershed basins + slope/aspect (operators/spatialstats): reference
interpreters over hand grids, basin conservation, pointer-jumping depth,
octant boundary conventions."""

from __future__ import annotations

from collections import Counter

from skyway_spark.operators.spatialstats import slope_aspect, watershed_basins

OFFS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)]


def _flow(cells):
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
    return flow


def _ref_basins(cells):
    flow = _flow(cells)
    sizes = Counter()
    for c in cells:
        cur = c
        while cur in flow:
            cur = flow[cur]
        sizes[cur] += 1
    return {b: (cells[b], n) for b, n in sizes.items()}


def _cells_df(spark, cells):
    return spark.createDataFrame(
        [(cx, cy, e) for (cx, cy), e in cells.items()],
        "cx long, cy long, elev long",
    )


def test_watershed_two_basins(spark):
    # W-shape: two valleys at x=2 and x=8 split the ridge at x=5
    cells = {(x, 0): min(abs(x - 2), abs(x - 8)) * 10 + x for x in range(11)}
    got = {
        (r.basin_x, r.basin_y): (r.basin_elev, r.n_cells)
        for r in watershed_basins(_cells_df(spark, cells)).collect()
    }
    assert got == _ref_basins(cells)
    assert len(got) == 2
    assert sum(n for _, n in got.values()) == len(cells)


def test_watershed_long_path_pointer_jumping(spark):
    # 80-cell descending chain: one basin, jump depth ~log2(80)
    cells = {(i, 3): 500 - i for i in range(80)}
    got = watershed_basins(_cells_df(spark, cells)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.basin_x, r.basin_y, r.n_cells) == (79, 3, 80)


def test_watershed_random_grid(spark):
    cells = {
        (x, y): (x * 7919 + y * 104729) % 97 + 3 * x + 2 * y
        for x in range(7)
        for y in range(5)
    }
    got = {
        (r.basin_x, r.basin_y): (r.basin_elev, r.n_cells)
        for r in watershed_basins(_cells_df(spark, cells)).collect()
    }
    assert got == _ref_basins(cells)


def _ref_slope(cells):
    out = Counter()
    for (cx, cy), _ in cells.items():
        nb = [(cx + 1, cy), (cx - 1, cy), (cx, cy + 1), (cx, cy - 1)]
        if not all(n in cells for n in nb):
            continue
        dzdx = cells[(cx + 1, cy)] - cells[(cx - 1, cy)]
        dzdy = cells[(cx, cy + 1)] - cells[(cx, cy - 1)]
        g2 = dzdx * dzdx + dzdy * dzdy
        ax, ay = -dzdx, -dzdy
        if g2 == 0:
            octant = -1
        else:
            o = 0
            if ay < 0:
                ax, ay, o = -ax, -ay, 4
            if ax < 0:
                ax, ay, o = ay, -ax, o + 2
            octant = o + (1 if ax < ay else 0)
        sc = 0 if g2 == 0 else 1 if g2 < 25 else 2 if g2 < 100 else 3 if g2 < 400 else 4
        n, s = out.get((octant, sc), (0, 0))
        out[(octant, sc)] = (n + 1, s + g2)
    return dict(out)


def test_slope_aspect_plane(spark):
    # pure east-tilted plane: descent due WEST = the 180-degree ray,
    # which belongs to the LOWER octant (3) per the house convention;
    # g2 = 100 sits on the class-3 boundary (buckets are half-open)
    cells = {(x, y): 5 * x for x in range(6) for y in range(6)}
    got = {
        (r.octant, r.slope_class): (r.n_cells, r.sum_g2)
        for r in slope_aspect(_cells_df(spark, cells)).collect()
    }
    assert got == _ref_slope(cells)
    assert list(got) == [(3, 3)]
    assert got[(3, 3)] == (16, 1600)


def test_slope_aspect_flat_and_bowl(spark):
    flat = {(x, y): 7 for x in range(4) for y in range(4)}
    got = {
        (r.octant, r.slope_class): (r.n_cells, r.sum_g2)
        for r in slope_aspect(_cells_df(spark, flat)).collect()
    }
    assert got == {(-1, 0): (4, 0)}
    bowl = {(x, y): (x - 3) ** 2 + (y - 3) ** 2 for x in range(7) for y in range(7)}
    got = {
        (r.octant, r.slope_class): (r.n_cells, r.sum_g2)
        for r in slope_aspect(_cells_df(spark, bowl)).collect()
    }
    assert got == _ref_slope(bowl)
    # a symmetric bowl's descent directions cover all 8 octants + flat center
    assert set(o for o, _ in got) == {-1, 0, 1, 2, 3, 4, 5, 6, 7}


def test_slope_aspect_random(spark):
    cells = {
        (x, y): (x * 131 + y * 104729) % 53
        for x in range(9)
        for y in range(7)
    }
    got = {
        (r.octant, r.slope_class): (r.n_cells, r.sum_g2)
        for r in slope_aspect(_cells_df(spark, cells)).collect()
    }
    assert got == _ref_slope(cells)
