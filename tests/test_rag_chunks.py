"""RAG overlapping-window chunking (operators/packing.chunk_windows):
chunk grid arithmetic, overlap content, tail behavior, coverage, and
the zero-shuffle plan contract."""

from __future__ import annotations

import pytest

from skyway_spark.operators.packing import chunk_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_short_doc_single_chunk(spark):
    out = chunk_windows(_docs(spark, [(1, "a b c")]), width=5, stride=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_id, r.start_tok, r.n_tokens, r.chunk_text) == (0, 1, 3, "a b c")


def test_exact_grid_and_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))  # 10 tokens, W=4 S=2 -> 4 chunks
    out = sorted(
        chunk_windows(_docs(spark, [(7, text)]), width=4, stride=2).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.start_tok for r in out] == [1, 3, 5, 7]
    assert all(r.n_tokens == 4 for r in out)
    # adjacent chunks share width - stride = 2 tokens
    assert out[0].chunk_text.split()[2:] == out[1].chunk_text.split()[:2]
    # every token covered, in order
    assert out[-1].chunk_text == "t6 t7 t8 t9"


def test_short_tail_chunk(spark):
    text = " ".join(str(i) for i in range(11))  # 11 tokens, W=4 S=3
    out = sorted(
        chunk_windows(_docs(spark, [(2, text)]), width=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # ceil((11-4)/3)+1 = 4 chunks; last starts at 10, runs 2 short
    assert len(out) == 4
    assert out[-1].start_tok == 10 and out[-1].n_tokens == 2
    assert out[-1].chunk_text == "9 10"


def test_whitespace_normalization_and_empty(spark):
    rows = [(1, "  a\t b \n c  "), (2, "   ")]
    out = chunk_windows(_docs(spark, rows), width=10, stride=10).collect()
    assert len(out) == 1  # blank doc dropped
    assert out[0].chunk_text == "a b c"


def test_invalid_params(spark):
    with pytest.raises(ValueError):
        chunk_windows(_docs(spark, [(1, "a")]), width=4, stride=5)
    with pytest.raises(ValueError):
        chunk_windows(_docs(spark, [(1, "a")]), width=4, stride=0)


def test_zero_shuffle_plan(spark):
    df = _docs(spark, [(1, "a b c d e f g h")])
    plan = (
        chunk_windows(df, width=4, stride=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
