"""Whole-stage-codegen regression gate (VERDICT r3 item 2).

Round 3's exit sweep logged 12 "Code grows beyond 64 KB" Janino
failures — Spark silently degraded those stages to interpreted
expression evaluation on exactly the queries whose scan stage carries
the 100-TB hours (the flagship among them).  This test runs every
formerly-affected query in ONE fresh JVM subprocess and fails on any
`ERROR CodeGenerator` / 64 KB-overflow line in the combined output, so
the fallback class cannot silently return.

A subprocess (not the shared test session) because codegen errors are
emitted by the JVM directly to process stderr — they never surface
through the py4j bridge.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

# every query that hit the 64 KB Janino limit in BENCH/SWEEP_r03c.log
AFFECTED = [
    "q_pages_pipeline",
    "q_extract_entities",
    "q_media_features",
    "q_ahash",
    "q_ahash_pairs",
    "q_warc_parse",
    "q_warc_stats",
    "q_warc_pipeline",
    "q_media_clusters",
    "q_hex_disk",
    "q_variogram",
]

_CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
from skyway_spark.plans.session import get_spark
import __spark_entry__ as entry

spark = get_spark("codegen-clean", cpus=4, shuffle_partitions=4)
qs = entry.queries()
for name in {affected!r}:
    qs[name](spark, "/root/testdata/sf0.001").collect()
    print("RAN", name, flush=True)
print("ALL-DONE", flush=True)
"""


def test_no_codegen_fallback_on_flagship_and_friends():
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD.format(repo=str(REPO), affected=AFFECTED)],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    out = proc.stdout + proc.stderr
    assert "ALL-DONE" in out, f"child failed (rc={proc.returncode}):\n{out[-4000:]}"
    bad = [
        ln
        for ln in out.splitlines()
        if "ERROR CodeGenerator" in ln or "Code grows beyond 64 KB" in ln
    ]
    assert not bad, "codegen fallback returned:\n" + "\n".join(bad[:5])
