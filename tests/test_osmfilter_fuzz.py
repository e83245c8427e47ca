"""Scaled differential fuzz of the OSMFilter compiler vs the logic.rs
oracle transcription — the OSMFilter counterpart of tests/test_cel_fuzz.py.

test_osmfilter.py replays 30 randomized programs one Spark job each;
this file generates 300 deeper programs (nesting to depth 3, up to 7
statements per level, adversarial edges: RENAME old==new, RENAME onto
an existing key, KEEP/DELETE with overlapping key sets, EQUALS on keys
a sibling SET just wrote) and evaluates them BATCHED — each program
contributes its compiled (keep, tags) expression pair to a shared
select, ~40 programs per job — so the whole fuzz is a handful of jobs.

Both the kept-set AND the final mutated tags must match the oracle for
every element. The seed is fixed; failures reproduce deterministically
and print the offending program AST.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from skyway_spark.functions.filter.ast import (
    Commit,
    Delete,
    Drop,
    EqualsSelector,
    HasSelector,
    Keep,
    OsmFilterProgram,
    Rename,
    SelectionBlock,
    Set,
    TypeSelector,
)
from skyway_spark.functions.filter.osmfilter_compile import compile_osmfilter

from test_osmfilter import make_elements, oracle

KEYS = ["footway", "surface", "name", "amenity", "type", "highway"]
VALS = ["sidewalk", "dirt", "x", "cafe", "route", "tertiary", ""]


def _rand_selector(rnd: random.Random):
    c = rnd.randrange(4)
    if c == 0:
        flags = [rnd.random() < 0.5 for _ in range(3)]
        if not any(flags):
            flags[rnd.randrange(3)] = True
        return TypeSelector(*flags)
    if c == 1:
        return HasSelector(rnd.choice(KEYS))
    # EQUALS twice as likely with an empty-string value in the pool:
    # missing-key vs present-empty is the null-safety edge
    return EqualsSelector(rnd.choice(KEYS), rnd.choice(VALS))


def _rand_statements(rnd: random.Random, depth: int, n: int):
    out = []
    for _ in range(n):
        c = rnd.randrange(12)
        if c <= 3 and depth < 3:
            out.append(
                SelectionBlock(
                    _rand_selector(rnd),
                    _rand_statements(rnd, depth + 1, rnd.randint(1, 4)),
                )
            )
        elif c == 4:
            out.append(Commit())
        elif c == 5:
            out.append(Drop())
        elif c == 6:
            out.append(Delete(tuple(rnd.sample(KEYS, rnd.randint(1, 3)))))
        elif c == 7:
            out.append(Keep(tuple(rnd.sample(KEYS, rnd.randint(1, 3)))))
        elif c == 8:
            k = rnd.choice(KEYS)
            # 1-in-3 RENAME to itself; otherwise possibly onto a key
            # that exists (overwrite path, logic.rs:88-93)
            out.append(Rename(k, k if rnd.random() < 0.33 else rnd.choice(KEYS)))
        else:
            out.append(Set(rnd.choice(KEYS), rnd.choice(VALS)))
    return out


N_PROGRAMS = 300
BATCH = 40


def test_fuzz_compiled_cascade_matches_logic_oracle(spark):
    rnd = random.Random(0x05F1)
    progs = [
        OsmFilterProgram("0.2.0", _rand_statements(rnd, 0, rnd.randint(1, 7)))
        for _ in range(N_PROGRAMS)
    ]
    df, rows = make_elements(spark)
    df = df.coalesce(1)
    mismatches = []
    drops_seen = 0
    multi_stage = 0
    for start in range(0, len(progs), BATCH):
        chunk = progs[start : start + BATCH]
        # compile each program with its own column prefix and a small
        # size budget, then apply all programs' stages level-merged —
        # one job evaluates the whole batch however deep the programs
        compiled = [
            compile_osmfilter(p, size_budget=24, prefix=f"__p{i}")
            for i, p in enumerate(chunk)
        ]
        multi_stage += sum(len(c.stages) > 1 for c in compiled)
        staged = df
        for level in range(max(len(c.stages) for c in compiled)):
            merged = {}
            for c in compiled:
                if level < len(c.stages):
                    merged.update(c.stages[level])
            staged = staged.withColumns(merged)
        cols = [F.col("id")]
        for i in range(len(chunk)):
            cols.append(F.col(f"__p{i}_keep").alias(f"k{i}"))
            cols.append(F.col(f"__p{i}_tags").alias(f"t{i}"))
        got = staged.select(*cols).collect()
        assert [r["id"] for r in got] == [r[1] for r in rows]
        for i, prog in enumerate(chunk):
            for r, (etype, _id, tags) in zip(got, rows):
                keep, want_tags = oracle(prog, etype, tags)
                have_keep = bool(r[f"k{i}"])
                if not keep:
                    drops_seen += 1
                if have_keep != keep or (keep and dict(r[f"t{i}"]) != want_tags):
                    mismatches.append(
                        (start + i, prog, _id, keep, want_tags, have_keep, dict(r[f"t{i}"]))
                    )
    assert not mismatches, "\n".join(
        f"program {n}: {p}\n  id {i}: oracle=({k}, {wt}) column=({hk}, {ht})"
        for n, p, i, k, wt, hk, ht in mismatches[:8]
    )
    # the corpus must exercise the DROP path substantially, not just
    # default-commit programs — and the staged (multi-projection)
    # compile path must be hit by a meaningful share of programs
    assert drops_seen > 500, drops_seen
    assert multi_stage > 50, multi_stage


def test_deep_program_compiles_bounded(spark):
    """A long mutation chain (60 statements) used to build a ~2^60-node
    Column tree and OOM the driver at compile time; the staged fold
    must compile it in bounded time/space and still match the oracle."""
    stmts = []
    for i in range(20):
        stmts.append(Set(KEYS[i % len(KEYS)], VALS[i % len(VALS)]))
        stmts.append(Rename(KEYS[(i + 1) % len(KEYS)], KEYS[(i + 2) % len(KEYS)]))
        stmts.append(Delete((KEYS[(i + 3) % len(KEYS)],)))
    prog = OsmFilterProgram("0.2.0", stmts)
    compiled = compile_osmfilter(prog)
    # size-tracked staging: ~5-6 mutations fit per 100-node stage
    assert 8 <= len(compiled.stages) <= 16, len(compiled.stages)
    df, rows = make_elements(spark)
    got = {r["id"]: dict(r["tags"]) for r in compiled.apply(df).collect()}
    for etype, i, tags in rows:
        keep, want = oracle(prog, etype, tags)
        assert keep and got[i] == want


def test_single_stage_budget_covers_reference_programs():
    """Programs at or under the budget keep the historical single
    projection — .keep/.tags stay usable (the flagship shape)."""
    text = (
        "OSMFilter v0.2.0\n\nTYPE node, way\n"
        '\tHAS "big"\n\t\tSET "class" "large"\n'
        '\t\tRENAME "ptype" "kind"\n\t\tDELETE "brand"\n\t\tCOMMIT\n'
        'EQUALS "brand" "Brand#13"\n\tDROP\nCOMMIT\n'
    )
    compiled = compile_osmfilter(text)
    assert len(compiled.stages) == 1
    compiled.keep, compiled.tags  # noqa: B018 — must not raise
