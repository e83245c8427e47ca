"""Scaling-efficiency evidence (north_rule: >= 0.8 from N to 4N).

Runs the SAME flagship pipeline on identical input at local[8] and
local[32] in separate JVMs, reports throughput at both + efficiency
(= (thr_32 / thr_8) / 4), and task-skew evidence for the salted vs
unsalted cell join. Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python tools/bench_scaling.py [pages_n]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, __REPO__)
from pyspark.sql import functions as F
from skyway_spark.plans.session import get_spark
from skyway_spark.functions.filter import apply_cel
from skyway_spark.functions import cells
from skyway_spark.operators import salt, tiles
from skyway_spark.operators.extract import extract_geo_entities
from skyway_spark.operators.pip import point_in_polygon
from skyway_spark.sources.generate import generate_polygons

cpus = __CPUS__
pages_dir = __PAGES_DIR__
spark = get_spark("scaling-%d" % cpus, cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_dir)
n = pages.count()

def pipeline():
    ents = extract_geo_entities(pages)
    kept = apply_cel(ents, 'tags["amenity"] != "bench"')
    polys = generate_polygons(spark)
    hits = point_in_polygon(kept.select("id", "lat", "lon"), polys, res=6)
    return tiles.assign_tiles(hits, 10).groupBy("polygon_id", "tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n")).count()

pipeline()  # warm-up: codegen + python workers
walls = []
for _ in range(3):
    t0 = time.monotonic(); tiles_n = pipeline(); walls.append(time.monotonic() - t0)
wall = sorted(walls)[1]  # median of 3

# skew evidence: per-cell counts of the extracted entities with and
# without salting (max/mean partition-key concentration)
ents = extract_geo_entities(pages).select(
    "id", cells.cell_encode(F.col("lat"), F.col("lon"), 6).alias("cell"))
counts = ents.groupBy("cell").count()
stats = counts.agg(F.max("count").alias("mx"), F.avg("count").alias("mean")).first()
hot = salt.hot_cells(ents, "cell")
salted = salt.salt_fact(ents, hot, 8, "cell", "id").groupBy("cell", "__salt").count()
sstats = salted.agg(F.max("count").alias("mx")).first()
print("RESULT " + json.dumps({
    "cpus": cpus, "pages": n, "wall_sec": round(wall, 3), "walls": [round(w, 3) for w in walls],
    "docs_per_sec": round(n / wall, 1), "tiles": tiles_n,
    "max_cell_rows": stats["mx"], "mean_cell_rows": round(stats["mean"], 2),
    "max_salted_key_rows": sstats["mx"],
}))
spark.stop()
"""


def run_child(cpus: int, pages_dir: str) -> dict:
    code = (
        _CHILD.replace("__REPO__", repr(str(REPO)))
        .replace("__CPUS__", str(cpus))
        .replace("__PAGES_DIR__", repr(pages_dir))
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=3000
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT ") :])
    raise RuntimeError(f"child local[{cpus}] failed:\n{out.stdout[-2000:]}\n{out.stderr[-3000:]}")


def main() -> None:
    pages_n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    import tempfile

    tmp = tempfile.mkdtemp(prefix="scaling_pages_")
    pages_dir = tmp + "/pages"
    # generate once in its own session so both children just scan parquet
    gen = subprocess.run(
        [
            sys.executable,
            "-c",
            (
                f"import sys; sys.path.insert(0, {str(REPO)!r});\n"
                "from skyway_spark.plans.session import get_spark\n"
                "from skyway_spark.sources.generate import generate_pages\n"
                f"spark = get_spark('gen', cpus=32)\n"
                f"generate_pages(spark, {pages_n}).write.mode('overwrite').parquet({pages_dir!r})\n"
                "spark.stop()"
            ),
        ],
        capture_output=True,
        text=True,
        timeout=900,
    )
    if gen.returncode != 0:
        raise RuntimeError(gen.stderr[-3000:])

    r8 = run_child(8, pages_dir)
    r32 = run_child(32, pages_dir)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    report = {
        "pages": pages_n,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report))

    md = f"""# BENCH — scaling + skew evidence

Same flagship pipeline (pages parquet scan -> geo-entity extraction ->
CEL filter -> cell-bucketed point-in-polygon -> slippy-tile rollup) on
IDENTICAL input ({pages_n:,} pages, pre-materialized parquet), run in
separate JVMs at two parallelism levels (sandbox stand-in for N vs 4N
executors, per driver instruction):

| config | wall (s) | throughput (docs/sec) |
|---|---|---|
| local[8]  | {r8["wall_sec"]} | {r8["docs_per_sec"]:,} |
| local[32] | {r32["wall_sec"]} | {r32["docs_per_sec"]:,} |

**Scaling efficiency (8 -> 32 cores) = (thr32/thr8)/4 =
{eff:.3f}** (north_rule target: >= 0.8).

## Skew evidence (hot-cell salting)

Entity->cell distribution at res 6 (80% of mentions cluster in 5 hot
cities by construction):

| measure | rows |
|---|---|
| max rows in one cell (unsalted join key) | {r8["max_cell_rows"]:,} |
| mean rows per cell | {r8["mean_cell_rows"]} |
| max rows per (cell, salt) after 8-way salting | {r8["max_salted_key_rows"]:,} |

Salting divides the hottest join key by ~{round(r8["max_cell_rows"] / max(r8["max_salted_key_rows"], 1), 1)}x,
eliminating the straggler task; AQE skew-join remains enabled as the
runtime backstop (plans/session.py).
"""
    out_md = REPO / "BENCH" / "BASELINE.md"
    out_md.parent.mkdir(exist_ok=True)
    out_md.write_text(md)
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
