"""Round-exit gate — the checked version of the discipline round 3 ran
by hand (VERDICT r3 item 4): AFTER the final code commit, one command

  python tools/round_exit.py r04

produces, in order:
  1. the full Arrow-strict oracle sweep over every registry query at
     sf0.01 -> BENCH/SWEEP_<tag>.log + per-query walls
     BENCH/QUERIES_<tag>.json (VERDICT r3 item 5);
  2. a codegen audit of the sweep log: any `ERROR CodeGenerator` /
     "Code grows beyond 64 KB" line fails the gate (VERDICT r3 item 2);
  3. the full pytest run -> BENCH/PYTEST_<tag>.log;
  4. a PASS/FAIL summary line per stage and a nonzero exit on any
     failure, so it cannot be half-skipped under deadline.

The sweep and pytest run as child processes so their full stderr
(including executor-side codegen ERRORs) lands in the committed logs.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

CODEGEN_RE = re.compile(r"ERROR CodeGenerator|Code grows beyond 64 KB")


def run(cmd: list[str], log: Path) -> int:
    with log.open("w") as fh:
        p = subprocess.run(
            cmd, cwd=REPO, stdout=fh, stderr=subprocess.STDOUT, text=True
        )
    return p.returncode


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r04"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    sweep_log = bench_dir / f"SWEEP_{tag}.log"
    pytest_log = bench_dir / f"PYTEST_{tag}.log"
    walls = bench_dir / f"QUERIES_{tag}.json"
    failures = []

    print(f"[1/3] oracle sweep -> {sweep_log}", flush=True)
    rc = run(
        [sys.executable, "tools/check_oracle.py", f"--walls={walls}", sf],
        sweep_log,
    )
    text = sweep_log.read_text(errors="replace")
    n_ok = len(re.findall(r"^OK    ", text, re.M))
    n_fail = len(re.findall(r"^FAIL  ", text, re.M))
    print(f"      sweep: {n_ok} OK, {n_fail} FAIL (exit {rc})")
    if rc != 0 or n_fail:
        failures.append(f"sweep: {n_fail} failures")

    print("[2/3] codegen audit of sweep log", flush=True)
    cg = [ln for ln in text.splitlines() if CODEGEN_RE.search(ln)]
    if cg:
        failures.append(f"codegen: {len(cg)} ERROR CodeGenerator lines")
        print(f"      FAIL: {len(cg)} codegen error lines (first: {cg[0][:120]})")
    else:
        print("      OK: zero codegen error lines")

    print(f"[3/3] pytest -> {pytest_log}", flush=True)
    rc = run([sys.executable, "-m", "pytest", "tests/", "-q"], pytest_log)
    tail = pytest_log.read_text(errors="replace").strip().splitlines()
    print(f"      {tail[-1] if tail else '(empty)'} (exit {rc})")
    if rc != 0:
        failures.append("pytest: nonzero exit")

    if failures:
        print("ROUND-EXIT GATE: FAIL — " + "; ".join(failures))
        return 1
    print("ROUND-EXIT GATE: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
