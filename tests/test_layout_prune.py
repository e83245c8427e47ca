"""Physical space-filling-curve layout -> manifest file pruning
(VERDICT r3 item 8, the loop closed for real files):

1. write the event points through plans/checkpoint.stage(layout_by=...)
   — hilbert_key range buckets, partitionBy on the bucket, Iceberg-style
   per-file min/max lat/lon stats in the JSON manifest;
2. plan a bbox scan from the manifest stats alone (read_pruned) and
   check it reads only the predicted bucket directories;
3. confirm the prediction matches the relational q_layout_prune query
   (which the driver gate checks against an exact DuckDB oracle);
4. confirm zero rows are lost vs the unpruned scan (stats pruning is a
   superset guarantee), and that most files are in fact skipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entry
from skyway_spark.functions import cells
from skyway_spark.plans.checkpoint import CheckpointManager

SF = "/root/testdata/sf0.001"


def test_checkpoint_layout_write_prunes_files(spark, tmp_path):
    pts = entry._event_points(spark, SF)
    n_all = pts.count()
    order = entry.HILBERT_ORDER
    mgr = CheckpointManager(str(tmp_path))
    layout = {
        "key": cells.hilbert_key(F.col("lat"), F.col("lon"), order),
        "buckets": entry.LAYOUT_FILES,
        "key_max": 1 << (2 * order),
        "stats": ["lat", "lon"],
    }
    out = mgr.stage(spark, "pts", "fp1", lambda: pts, layout_by=layout)
    assert out.count() == n_all
    assert set(out.columns) == set(pts.columns)  # bucket col not leaked

    lat_lo, lat_hi, lon_lo, lon_hi = entry.LAYOUT_BBOX
    pruned, scanned, total = mgr.read_pruned(
        spark, "pts", {"lat": (lat_lo, lat_hi), "lon": (lon_lo, lon_hi)}
    )

    # manifest prediction matches the oracle-checked relational query
    pred = {r["layout"]: r for r in entry.q_layout_prune(spark, SF).collect()}
    assert total == pred["hilbert"]["files_total"]
    assert len(scanned) == pred["hilbert"]["files_scanned"]
    assert pruned.count() == pred["hilbert"]["rows_scanned"]

    # superset guarantee: pruned scan + exact predicate loses nothing
    cond = (
        (F.col("lat") >= lat_lo) & (F.col("lat") <= lat_hi)
        & (F.col("lon") >= lon_lo) & (F.col("lon") <= lon_hi)
    )
    assert pruned.where(cond).count() == out.where(cond).count()

    # the point of the layout: a small bbox touches few hilbert files
    assert len(scanned) * 8 <= total, (scanned, total)

    # resume path returns the same schema (no bucket column)
    resumed = mgr.stage(spark, "pts", "fp1", lambda: 1 / 0, layout_by=layout)
    assert set(resumed.columns) == set(pts.columns)
    assert resumed.count() == n_all
    assert mgr.results[-1].resumed


def test_flagship_serving_path_layout_prune(spark, tmp_path):
    """r5 stretch (VERDICT r4 item 8): the 32x file-prune microbenchmark
    closed onto the FLAGSHIP SERVING PATH — checkpoint the pipeline's
    tile-assigned hit table with a hilbert(lat, lon) clustered layout +
    per-file tile_x/tile_y stats, then serve a tile-bbox query from the
    manifest alone and pin that the physical scan touches only the kept
    bucket directories."""
    import os

    from skyway_spark.functions.filter import apply_cel
    from skyway_spark.operators import tiles
    from skyway_spark.operators.extract import extract_geo_entities
    from skyway_spark.operators.pip import point_in_polygon
    from skyway_spark.sources.generate import generate_pages, generate_polygons

    pages = generate_pages(spark, 100_000, partitions=8)
    ents = extract_geo_entities(pages)
    kept = apply_cel(ents, 'tags["amenity"] != "bench"')
    hits = point_in_polygon(
        kept.select("id", "lat", "lon"), generate_polygons(spark), res=6
    )
    serving = tiles.assign_tiles(hits, 10)

    order = entry.HILBERT_ORDER
    mgr = CheckpointManager(str(tmp_path))
    layout = {
        "key": cells.hilbert_key(F.col("lat"), F.col("lon"), order),
        "buckets": entry.LAYOUT_FILES,
        "key_max": 1 << (2 * order),
        "stats": ["tile_x", "tile_y"],
    }
    out = mgr.stage(spark, "serving", "fp1", lambda: serving, layout_by=layout)
    n_all = out.count()
    assert n_all > 0

    # serving query: the 3x3 tile window around NYC (hot city 0) at z=10
    ctx, cty = (
        spark.range(1)
        .select(*cells.tile_xy(F.lit(40.7128), F.lit(-74.0060), 10))
        .collect()[0]
    )
    ranges = {"tile_x": (ctx - 1, ctx + 1), "tile_y": (cty - 1, cty + 1)}
    pruned, scanned, total = mgr.read_pruned(spark, "serving", ranges)
    cond = (
        (F.col("tile_x") >= ctx - 1) & (F.col("tile_x") <= ctx + 1)
        & (F.col("tile_y") >= cty - 1) & (F.col("tile_y") <= cty + 1)
    )
    want = out.where(cond)
    got = pruned.where(cond)
    assert got.count() == want.count() > 0
    # exact result parity, not just counts
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # the layout pays: a city window reads a small fraction of the files
    assert len(scanned) * 4 <= total, (scanned, total)

    # plan-pinned: every physical input file lies inside a kept bucket dir
    kept_dirs = {f"__file_bucket={b}" + os.sep for b in scanned}
    for f in got.inputFiles():
        assert any(d in f for d in kept_dirs), f
