"""Span corruption (operators/textstats.span_corrupt): sentinel
numbering, reconstruction invariant (masked_text + targets rebuild the
original token stream), and determinism across partitioning."""

from __future__ import annotations

import re

from skyway_spark.operators.textstats import SPAN_P, span_corrupt


def _df(spark, texts, parts=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(parts)


def _masked_blocks(doc_id, n_blocks, mod=5):
    return [
        b for b in range(n_blocks) if (doc_id * 16807 + b * 48271) % SPAN_P % mod == 0
    ]


def test_reconstruction_invariant(spark):
    texts = [" ".join(f"w{j}" for j in range(25)), "a b c", "solo"]
    rows = {r.doc_id: r for r in span_corrupt(_df(spark, texts)).collect()}
    for i, t in enumerate(texts):
        r = rows[i]
        # splice targets back into masked_text -> original text
        tgt = {
            m.group(1): m.group(2).strip()
            for m in re.finditer(r"(<X_\d+>) ((?:(?!<X_)\S+ ?)*)", r.targets)
        }
        rebuilt = re.sub(r"<X_\d+>", lambda m: tgt[m.group(0)], r.masked_text)
        assert rebuilt == t, (i, rebuilt)
        assert r.n_masked == r.masked_text.count("<X_")
        # sentinels are numbered 1..n in order
        sents = re.findall(r"<X_(\d+)>", r.masked_text)
        assert sents == [str(k) for k in range(1, len(sents) + 1)]


def test_mask_positions_match_hash(spark):
    t = " ".join(f"tok{j}" for j in range(30))  # 10 blocks of 3
    (r,) = span_corrupt(_df(spark, [t])).collect()
    want = _masked_blocks(0, 10)
    assert r.n_masked == len(want)


def test_partitioning_invariance(spark):
    texts = [" ".join(f"w{d}_{j}" for j in range(40)) for d in range(20)]
    a = {r.doc_id: (r.masked_text, r.targets) for r in span_corrupt(_df(spark, texts, 1)).collect()}
    b = {r.doc_id: (r.masked_text, r.targets) for r in span_corrupt(_df(spark, texts, 7)).collect()}
    assert a == b
