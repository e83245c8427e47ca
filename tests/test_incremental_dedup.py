"""Incremental dedup census (operators/dedup.incremental_dedup_census):
class priorities, survivor rule, and near-dup probe on hand fixtures."""

from __future__ import annotations

from skyway_spark.operators.dedup import incremental_dedup_census


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again today"


def test_census_all_classes(spark):
    corpus = _df(spark, [(1, BASE), (2, "completely different corpus text here")])
    batch = _df(
        spark,
        [
            (10, BASE),                    # exact_corpus
            (11, "Z" + BASE[1:]),          # near_corpus (1-token edit)
            (12, "Z" + BASE[1:]),          # exact dup of 11 -> exact_batch
            (13, "nothing shared with anything at all zzz qqq www eee rrr"),
        ],
    )
    out = {r.clazz: r.n_docs for r in incremental_dedup_census(corpus, batch).collect()}
    assert out == {
        "exact_corpus": 1,
        "near_corpus": 1,
        "exact_batch": 1,
        "unique": 1,
    }


def test_exact_corpus_beats_batch_dup(spark):
    # two batch copies of a corpus text: BOTH classify exact_corpus
    corpus = _df(spark, [(1, BASE)])
    batch = _df(spark, [(10, BASE), (11, BASE)])
    out = {r.clazz: r.n_docs for r in incremental_dedup_census(corpus, batch).collect()}
    assert out == {"exact_corpus": 2}


def test_survivor_is_smallest_id(spark):
    corpus = _df(spark, [(1, "unrelated corpus content words only here")])
    batch = _df(spark, [(22, BASE), (21, BASE)])
    out = {r.clazz: r.n_docs for r in incremental_dedup_census(corpus, batch).collect()}
    # 21 survives as unique, 22 is the intra-batch duplicate
    assert out == {"unique": 1, "exact_batch": 1}
