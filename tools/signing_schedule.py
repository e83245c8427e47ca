"""Driver-signing schedule (VERDICT r3 item 3): map EVERY registry
query to the round in which it got (or is planned to get) a
driver-signed row in CORRECTNESS_r0N.json.

The driver gate signs only the first 50 `queries()` entries per round,
so with 267 registry queries the signing lag is structural.  This tool
makes the lag auditable: it reads the committed CORRECTNESS artifacts
for past signatures, the current `_R4_WINDOW` for this round's slate,
and deterministically schedules every still-unsigned query into future
rounds (r5, r6, ...) in registry order — oldest-unsigned first, 50 per
round, matching the rotation discipline rounds 2-4 actually used.

Writes BENCH/SIGNING.md.  Pure file I/O — no Spark session.
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def signed_rounds() -> dict[str, list[str]]:
    """query -> rounds with a full-pass driver row (rows+schema+hash)."""
    out: dict[str, list[str]] = {}
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        tag = f.stem.split("_")[1]  # r01
        data = json.loads(f.read_text())
        for q, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                out.setdefault(q, []).append(tag)
    return out


def registry_order() -> list[str]:
    """Registry keys in `queries()` output order — imported from the
    entry module itself (building the dict needs no SparkSession), so
    the schedule can never drift from what the driver gate sees."""
    import sys

    sys.path.insert(0, str(REPO))
    import __spark_entry__ as entry

    return list(entry.queries().keys())


def main() -> None:
    signed = signed_rounds()
    order = registry_order()
    current_round = 5
    window = order[:50]

    rows = []
    backlog = []
    for pos, q in enumerate(order):
        past = signed.get(q, [])
        if pos < 50:
            plan = f"r{current_round:02d} (window pos {pos})"
        elif past:
            plan = "signed"
        else:
            backlog.append(q)
            plan = None  # assigned below
        rows.append([q, pos, ", ".join(past) or "-", plan])

    # future rounds: 50 per round in registry (oldest-first) order
    for i, q in enumerate(backlog):
        rnd = current_round + 1 + i // 50
        slot = i % 50
        for row in rows:
            if row[0] == q:
                row[3] = f"r{rnd:02d} (planned, slot {slot})"

    n_signed = sum(1 for r in rows if r[2] != "-")
    n_window = len(window)
    n_backlog = len(backlog)
    lines = [
        "# Driver-signing schedule",
        "",
        f"Registry: **{len(order)} queries**; driver-signed so far "
        f"(full pass in a committed CORRECTNESS artifact): **{n_signed}**; "
        f"in this round's window: **{n_window}**; unsigned backlog after "
        f"this round: **{n_backlog}** "
        f"(~{(n_backlog + 49) // 50} more round(s) at 50/round).",
        "",
        "Every query not yet signed is deterministically scheduled below "
        "(oldest-unsigned first, 50 per round) — the same rotation rule "
        "rounds 2-4 used.  Queries below position 49 stay guarded by the "
        "Arrow-strict local sweep (tools/check_oracle.py, dtype-width-"
        "sensitive hashing identical to the driver's) plus pytest.",
        "",
        "| query | pos | signed in | signing round |",
        "|---|---|---|---|",
    ]
    for q, pos, past, plan in rows:
        lines.append(f"| {q} | {pos} | {past} | {plan} |")
    out = REPO / "BENCH" / "SIGNING.md"
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(order)} queries, {n_signed} signed, "
          f"{n_backlog} backlog")


if __name__ == "__main__":
    main()
