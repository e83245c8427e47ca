"""Interleaved PAIRED scaling measurement (north_rule: >= 0.8 from N to 4N).

Why this exists: tools/bench_scaling.py runs the local[N] leg to
completion, then the local[4N] leg.  Nine consecutive round-4 windows
(K, L, O..V) collapsed BETWEEN or DURING the legs — the shared host's
4->16 spin ceiling routinely decays from ~0.9 to ~0.65 over the ~15
minutes a sequential run takes, and the 4N leg (which always runs
second) eats the degradation, biasing measured efficiency DOWN through
no fault of the engine.  The three-point calibration (run U onward)
detects this but cannot correct it.

This tool removes the between-leg drift term instead of detecting it:

- BOTH children (local[N] and local[4N]) start once, build the plan,
  and warm up; then they stay resident and idle.
- The parent alternates single timed executions: pair i = one wall on
  each side, back-to-back, so the two walls of a pair share a
  ~1-minute window instead of being ~10 minutes apart.
- Within-pair order alternates (N-first on even pairs, 4N-first on
  odd) so neither side systematically runs later in its pair.
- Efficiency is computed PER PAIR: eff_i = (wall_N_i / wall_4N_i) / 4.
  A neighbor burst during pair i inflates both walls of that pair
  roughly equally and the ratio survives; under the sequential
  protocol the same burst lands on one leg only and wrecks the run.
  The MEDIAN paired efficiency is the headline statistic (robust to a
  burst landing inside the ~20 s gap between a pair's two walls);
  best-pair and the classic best-of-K per-leg ratio are reported
  alongside for continuity with runs A-V.

The idle JVM costs nothing while the other side runs (verified: spin
calibration numbers with both children resident match children-free
windows), and the pure-CPU spin ceiling is still bracketed pre/mid/
post exactly as in the sequential tool.

Usage: python tools/bench_scaling_paired.py [pages_n] [N] [pages_dir]
  pages_dir: reuse an already-materialized pages parquet (required —
  generate with tools/bench_scaling.py once, or pass its tempdir).
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PAIRS = 7

_CHILD = r"""
import json, sys, time, os
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
sys.path.insert(0, __REPO__)
from pyspark.sql import functions as F
from skyway_spark.plans.session import get_spark
from skyway_spark.functions.filter import apply_cel
from skyway_spark.operators import tiles
from skyway_spark.operators.extract import extract_geo_entities
from skyway_spark.operators.pip import point_in_polygon
from skyway_spark.sources.generate import generate_polygons

cpus = __CPUS__
spark = get_spark(
    "scaling-paired-%d" % cpus, cpus=cpus, shuffle_partitions=cpus,
    extra_conf={
        # SPARK_GRAFT_SPLIT_MB tunes scan-split granularity: 16 MB over
        # the 128-file input reproduces the sequential tool's 128
        # splits; smaller values over a finer-file input raise the wave
        # count (128 splits = only 8 waves at 16 cores, so the
        # last-wave straggler penalty lands 4x harder on the fast leg
        # than at 4 cores' 32 waves — a 100 TB scan has millions of
        # splits and no such quantization).
        "spark.sql.files.maxPartitionBytes": str(
            int(os.environ.get("SPARK_GRAFT_SPLIT_MB", "16")) * 1024 * 1024
        ),
        "spark.sql.files.openCostInBytes": "0",
    },
)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(__PAGES_DIR__)
n = pages.count()

ents = extract_geo_entities(pages)
kept = apply_cel(ents, 'tags["amenity"] != "bench"')
polys = generate_polygons(spark)
hits = point_in_polygon(kept.select("id", "lat", "lon"), polys, res=6)
rolled = tiles.assign_tiles(hits, 10).groupBy(
    "polygon_id", "tile_x", "tile_y").agg(F.count(F.lit(1)).alias("n"))

tiles_n = rolled.count()  # warm-up: codegen, parquet footers
print("READY %d %d %d" % (n, tiles_n, pages.rdd.getNumPartitions()), flush=True)

for line in sys.stdin:
    cmd = line.strip()
    if cmd == "GO":
        t0 = time.monotonic()
        rolled.count()
        print("WALL %.3f" % (time.monotonic() - t0), flush=True)
    elif cmd == "QUIT":
        break
spark.stop()
print("DONE", flush=True)
"""


def start_child(cpus: int, pages_dir: str) -> subprocess.Popen:
    code = (
        _CHILD.replace("__REPO__", repr(str(REPO)))
        .replace("__CPUS__", str(cpus))
        .replace("__PAGES_DIR__", repr(pages_dir))
    )
    return subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        bufsize=1,
    )


def await_line(proc: subprocess.Popen, prefix: str, timeout_s: float = 900) -> str:
    # select-gated read so a silently hung child (e.g. a Spark deadlock)
    # trips the deadline instead of blocking readline() forever (ADVICE r4).
    import select

    deadline = time.monotonic() + timeout_s
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            raise RuntimeError(f"timeout waiting for {prefix!r}")
        ready, _, _ = select.select([proc.stdout], [], [], min(remaining, 5.0))
        if not ready:
            continue
        line = proc.stdout.readline()
        if not line:
            raise RuntimeError(f"child exited before {prefix!r} (rc={proc.poll()})")
        if line.startswith(prefix):
            return line.strip()


def timed_wall(proc: subprocess.Popen) -> float:
    proc.stdin.write("GO\n")
    proc.stdin.flush()
    return float(await_line(proc, "WALL").split()[1])


def spin_calibration(n_lo: int, n_hi: int, reps: int = 3) -> float:
    import multiprocessing as mp

    def measure(procs: int) -> float:
        best = None
        for _ in range(reps):
            with mp.Pool(procs) as p:
                t0 = time.monotonic()
                p.map(_spin, range(procs))
                w = time.monotonic() - t0
            best = w if best is None or w < best else best
        return procs / best

    lo, hi = measure(n_lo), measure(n_hi)
    return (hi / lo) / (n_hi / n_lo)


def _spin(_):
    x = 0
    for i in range(20_000_000):
        x += i
    return x


def main() -> None:
    pages_n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n_hi = 4 * n_lo
    if len(sys.argv) < 4:
        raise SystemExit("pages_dir required (materialize via tools/bench_scaling.py)")
    pages_dir = sys.argv[3]

    lo = start_child(n_lo, pages_dir)
    hi = start_child(n_hi, pages_dir)
    r_lo = await_line(lo, "READY")
    r_hi = await_line(hi, "READY")
    n_docs = int(r_lo.split()[1])
    assert r_lo.split()[1:] == r_hi.split()[1:], "children disagree on input"
    n_splits = int(r_lo.split()[3]) if len(r_lo.split()) > 3 else None
    print(
        f"children ready: {n_docs} docs, tiles={r_lo.split()[2]}, splits={n_splits}",
        flush=True,
    )

    # The host's 4->16 parallel headroom swings 0.65-0.90 on a ~30 s
    # timescale even with zero Spark running (measured control,
    # BENCH/BASELINE.md run-Z note), so 3-point bracketing cannot
    # characterize a multi-minute run.  Instead: a quick 1-rep ceiling
    # immediately BEFORE each pair gives every pair its own-moment
    # hardware context, and the headline conditional statistic is the
    # median paired efficiency over pairs whose own ceiling was >= 0.8.
    c_pre = spin_calibration(n_lo, n_hi)
    c_mid = None
    pairs = []
    for i in range(PAIRS):
        c_i = spin_calibration(n_lo, n_hi, reps=1)
        first, second = (lo, hi) if i % 2 == 0 else (hi, lo)
        w_first = timed_wall(first)
        w_second = timed_wall(second)
        w_lo, w_hi = (w_first, w_second) if first is lo else (w_second, w_first)
        eff = (w_lo / w_hi) / (n_hi / n_lo)
        pairs.append(
            {
                "order": "lo-first" if first is lo else "hi-first",
                "ceiling": round(c_i, 3),
                "wall_lo": round(w_lo, 3),
                "wall_hi": round(w_hi, 3),
                "eff": round(eff, 3),
            }
        )
        print(
            f"pair {i}: ceil={c_i:.3f} lo={w_lo:.3f}s hi={w_hi:.3f}s eff={eff:.3f}",
            flush=True,
        )
        if i == PAIRS // 2 - 1:
            c_mid = spin_calibration(n_lo, n_hi)
    c_post = spin_calibration(n_lo, n_hi)

    for proc in (lo, hi):
        proc.stdin.write("QUIT\n")
        proc.stdin.flush()
    for proc in (lo, hi):
        proc.wait(timeout=120)

    effs = sorted(p["eff"] for p in pairs)
    walls_lo = sorted(p["wall_lo"] for p in pairs)
    walls_hi = sorted(p["wall_hi"] for p in pairs)
    ceilings = [round(c, 3) for c in (c_pre, c_mid, c_post) if c is not None]
    ceiling = min(ceilings)
    good = sorted(p["eff"] for p in pairs if p["ceiling"] >= 0.8)
    report = {
        "protocol": "interleaved-paired",
        "pages": n_docs,
        "scan_splits": n_splits,
        "n_lo": n_lo,
        "n_hi": n_hi,
        "pairs": pairs,
        "paired_eff_median": effs[len(effs) // 2],
        "paired_eff_best": effs[-1],
        "paired_eff_all": effs,
        "good_ceiling_pairs": len(good),
        "paired_eff_median_at_good_ceiling": good[len(good) // 2] if good else None,
        "classic_eff_best_walls": round((walls_lo[0] / walls_hi[0]) / (n_hi / n_lo), 3),
        "walls_lo": walls_lo,
        "walls_hi": walls_hi,
        "docs_per_sec_hi_best": round(n_docs / walls_hi[0], 1),
        "cpu_spin_ceilings_pre_mid_post": ceilings,
        "cpu_spin_ceiling": ceiling,
        "window_stable": max(ceilings) - min(ceilings) <= 0.06 and ceiling >= 0.85,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
