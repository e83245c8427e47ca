"""BPE train+apply (operators/textstats.bpe_train/bpe_tokenize) vs a
pure-python reference: merge choice (count + tie-break), left-to-right
simultaneous application (the 'aaa' overlap case), and segmentation
output shape."""

from __future__ import annotations

from collections import Counter

from skyway_spark.operators.textstats import bpe_tokenize, bpe_train


def _ref_train(texts, n_merges):
    streams = [list(w) for t in texts for w in t.strip().split()]
    merges = []
    for _ in range(n_merges):
        c = Counter()
        for s in streams:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c:
            break
        (a, b), n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, n))
        for s in streams:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [a + b]
                i += 1  # continue AFTER the merged symbol: left-to-right
        # (matches string replace semantics: no re-scan of the result)
    return merges, streams


def _ref_encode(word, merges):
    s = list(word)
    for a, b, *_ in merges:
        i = 0
        while i < len(s) - 1:
            if s[i] == a and s[i + 1] == b:
                s[i : i + 2] = [a + b]
            i += 1
    return s


def test_train_matches_reference(spark):
    texts = ["low lower lowest", "new newer newest", "low new low"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = bpe_train(df, n_merges=5)
    want, _ = _ref_train(texts, 5)
    assert got == want


def test_overlap_aaa_semantics(spark):
    # merge (a,a) on 'aaaa' must give [aa, aa]; on 'aaa' -> [aa, a]
    df = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    merges = bpe_train(df, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    (row,) = bpe_tokenize(df, merges).collect()
    assert row.seg == "aa/aa aa/a" and row.n_tokens == 4


def test_tokenize_matches_reference(spark):
    texts = ["the merge test of the merge", "merges emerge there"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_train(df, n_merges=3)
    got = {r.doc_id: (r.n_tokens, r.seg) for r in bpe_tokenize(df, merges).collect()}
    for i, t in enumerate(texts):
        encs = [_ref_encode(w, merges) for w in t.split()]
        want_seg = " ".join("/".join(e) for e in encs)
        want_n = sum(len(e) for e in encs)
        assert got[i] == (want_n, want_seg), i
