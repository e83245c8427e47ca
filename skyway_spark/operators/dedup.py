"""Document deduplication operators (training-data pipeline suite).

All hash arithmetic is deliberately portable integer math (polynomial
rolling hashes mod fixed primes) rather than engine-specific hash
functions, so every operator has an exact DuckDB SQL oracle and is
reproducible across engines and versions.

Scale notes:
- exact dedup: one map-side-combined groupBy on a 64-bit text hash —
  never shuffles full text;
- MinHash+LSH: signatures are pure Column exprs (nested transform/
  aggregate, JVM-side); banding turns O(n^2) pair search into an
  equi-join on (band_idx, band_hash) buckets; candidate pairs are
  verified with exact n-gram Jaccard. Bucket join is shuffle-on-key,
  and pathological buckets are bounded by ``max_bucket`` (logged, not
  silent);
- SimHash: 64-bit signature from token-hash bit voting; near-dups =
  identical band of high bits (hamming-adjacent candidates via 4-band
  split);
- embedding near-dup: cosine over array<float> via zip_with/aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# portable hash constants (same in the SQL oracles). Sized so every
# fold step stays far inside int64 under ANSI arithmetic:
# acc < 2^44 -> acc*31 + codepoint < 2^49.
HASH_MOD = 1 << 44
PRIME = 2_147_483_647  # 2^31-1 for minhash permutations

# (a, b) pairs for minhash permutations h_i(x) = (a*x + b) % PRIME
MINHASH_PERMS = [(2 * i + 1, 7919 * (i + 1) % PRIME) for i in range(16)]


def _char_codes(col: Column) -> Column:
    """array<int> of codepoints — one split pass instead of a
    substring(col, i, 1) walk (which re-scans the string's UTF-8 bytes
    from the start per index, O(L^2)). Matches the DuckDB oracle's
    ord(substring(...)) per char; the empty string becomes [''] ->
    [ascii('')] = [0], which folds to hash 0 exactly like the oracle's
    empty range."""
    return F.transform(F.split(col, ""), lambda c: F.ascii(c))


def _fold_hash(codes: Column) -> Column:
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % HASH_MOD
    )


def text_hash(col: Column) -> Column:
    """Portable polynomial hash of a string (matches the SQL oracle:
    fold (acc*31 + codepoint) % 2^60); empty string -> 0."""
    return F.when(F.length(col) > 0, _fold_hash(_char_codes(col))).otherwise(
        F.lit(0).cast("long")
    )


# order-sensitive document fingerprint fold (textstats.fingerprint):
# acc < 2^40 -> acc*FP_MULT < 2^60; + token hash (2^44) still < 2^61
FP_MOD = 1 << 40
FP_MULT = 1_048_573


def char_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct character n-grams (array<string>)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(col) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(col, i, F.lit(n))))


def ngram_hashes(col: Column, n: int = 3) -> Column:
    """Distinct n-grams -> portable int64 hashes (array<long>)."""
    return F.array_distinct(
        F.transform(char_ngrams(col, n), lambda g: _fold_hash(_char_codes(g)))
    )


def word_shingle_hashes(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle hashes (array<long>): tokens by
    whitespace split, per-token portable hash, shingle = per-step-mod
    fold of n consecutive token hashes. Word shingles are the standard
    MinHash unit — char n-grams over a small shared vocabulary give
    every document pair a high base Jaccard, which defeats LSH
    banding (every bucket explodes); word shingles keep unrelated
    pairs near zero while same-length edits stay ~1."""
    tokens = F.split(col, " ")
    th = F.transform(tokens, lambda t: _fold_hash(_char_codes(t)))
    # zip_with over shifted slices, NOT transform(i -> slice(th, i)):
    # interpreted HOF lambdas re-evaluate argument expressions per
    # element, so indexing into `th` per shingle re-hashes every token
    # per shingle (quadratic). With slices, `th` is evaluated O(1)
    # times per row.  Shingle fold matches the portable per-step-mod
    # arithmetic: ((h1*31 + h2) % M * 31 + h3) % M.
    m = F.greatest(F.size(th) - (n - 1), F.lit(1))
    shifted = [F.slice(th, i + 1, m) for i in range(n)]
    acc = shifted[0]
    for nxt in shifted[1:]:
        acc = F.zip_with(acc, nxt, lambda a, b: (a * 31 + F.coalesce(b, F.lit(0))) % HASH_MOD)
    return F.array_distinct(acc)


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text groups with >1 member): keep_id = min id, n_dups.

    groupBy on a 64-bit hash first (map-side combine on a fixed-width
    key), then confirms on full text inside the group — at 100 TB the
    full text only shuffles for hash-colliding groups. The hash is an
    internal shuffle key, never an output value, so it uses the
    native xxhash64 (one JVM call per row) rather than the portable
    per-char fold — results are identical either way."""
    h = F.xxhash64(F.col(text_col)).alias("__th")
    return (
        docs.select(F.col(id_col), F.col(text_col), h)
        .groupBy("__th", text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
        .select(F.col(text_col), "keep_id", "n_dups")
    )


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep exactly one row (min id) per distinct text."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.xxhash64(F.col(text_col)), F.col(text_col)).orderBy(F.col(id_col))
    return docs.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    col: Column, n: int = 3, perms=MINHASH_PERMS, unit: str = "char"
) -> Column:
    """array<long> of len(perms) minhash values over n-gram hashes
    (char n-grams or word shingles) — pure Column expr, fully
    JVM-side."""
    grams = ngram_hashes(col, n) if unit == "char" else word_shingle_hashes(col, n)
    return minhash_from_grams(grams, perms)


def minhash_from_grams(grams: Column, perms=MINHASH_PERMS) -> Column:
    """All permutation minima in ONE aggregate pass with an
    array<long> accumulator (acc_i = min(acc_i, (g*a_i + b_i) % P)) —
    one lambda invocation per gram instead of len(perms) transform
    passes over the gram array."""
    init = F.array(*[F.lit(PRIME).cast("long") for _ in perms])
    return F.aggregate(
        grams,
        init,
        lambda acc, g: F.zip_with(
            acc,
            F.array(*[(g * a + b) % PRIME for (a, b) in perms]),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    unit: str = "word",
) -> DataFrame:
    """Near-duplicate candidate pairs via LSH banding, verified with
    exact shingle Jaccard >= threshold. Output: (id_a, id_b, jaccard)
    with id_a < id_b, distinct. Default unit='word' (see
    word_shingle_hashes for why char grams defeat banding)."""
    from pyspark.sql import Window

    rows_per_band = len(MINHASH_PERMS) // bands
    gramf = ngram_hashes if unit == "char" else word_shingle_hashes

    def grams_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("__id"), gramf(F.col(text_col), n).alias("__grams")
        )

    # band on (band, bucket-hash, id) ONLY — the gram arrays (the
    # heavy payload, ~10^2 longs/doc) never enter the banding shuffle
    # or the self-join. The max_bucket window count rides the same
    # light exchange, and the two self-join sides share it
    # (ReusedExchange).
    sig = grams_of(docs).withColumn("__sig", minhash_from_grams(F.col("__grams")))
    banded = sig.select(
        "__id",
        F.posexplode(
            F.array(
                *[
                    F.aggregate(
                        F.slice("__sig", i * rows_per_band + 1, rows_per_band),
                        F.lit(0).cast("long"),
                        lambda acc, v: (acc * 31 + v) % HASH_MOD,
                    )
                    for i in range(bands)
                ]
            )
        ).alias("__band", "__bh"),
    )
    w = Window.partitionBy("__band", "__bh")
    banded = banded.withColumn("__bn", F.count(F.lit(1)).over(w)).where(
        F.col("__bn") <= max_bucket
    )
    cand = (
        banded.select("__band", "__bh", F.col("__id").alias("id_a"))
        .join(
            banded.select("__band", "__bh", F.col("__id").alias("id_b")),
            ["__band", "__bh"],
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        # id pairs only — candidate-sized, pinned so the verify stage
        # below doesn't re-run the whole banding pipeline per use
        .localCheckpoint(eager=True)
    )
    # exact-verify: gram arrays re-attach to CANDIDATE docs only — a
    # candidate-id semi-join runs BELOW the gram hashing, so the
    # (expensive, token-proportional) shingle hashing happens once for
    # the candidate set instead of twice for the whole corpus; one
    # narrow doc scan instead of two.  The verify joins stay
    # deliberately UN-hinted: an explicit F.broadcast is honored
    # regardless of size (AQE never overrides a hint), and on a
    # duplicate-heavy corpus — the normal case for web crawls —
    # candidate rows carrying ~10^2 longs of grams each would OOM the
    # driver under a forced broadcast.  Un-hinted, AQE picks broadcast
    # when the runtime size is small and degrades to a keyed shuffle
    # otherwise (pinned by
    # tests/test_datapipe.py::test_minhash_lsh_join_degrades_to_shuffle).
    cand_ids = (
        cand.select(F.col("id_a").alias("__cid"))
        .union(cand.select(F.col("id_b").alias("__cid")))
        .distinct()
    )
    gcand = grams_of(
        docs.join(
            cand_ids, F.col(id_col) == F.col("__cid"), "semi"
        )
    ).localCheckpoint(eager=True)
    ga = gcand.select(F.col("__id").alias("id_a"), F.col("__grams").alias("__ga"))
    gb = gcand.select(F.col("__id").alias("id_b"), F.col("__grams").alias("__gb"))
    withg = gb.join(ga.join(cand, "id_a"), "id_b")
    return withg.select(
        "id_a", "id_b", jaccard(F.col("__ga"), F.col("__gb")).alias("jaccard")
    ).where(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_col: str = "n_chars",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard pairs, restricted to a same-bucket
    self-join (e.g. equal char length) — the brute-force baseline the
    LSH path is validated against, and itself an equi-join (no cross
    product)."""
    g = docs.select(
        F.col(id_col).alias("__id"),
        F.col(bucket_col).alias("__bk"),
        ngram_hashes(F.col(text_col), n).alias("__g"),
    )
    a = g.select(F.col("__bk"), F.col("__id").alias("id_a"), F.col("__g").alias("__ga"))
    b = g.select(F.col("__bk"), F.col("__id").alias("id_b"), F.col("__g").alias("__gb"))
    return (
        a.join(b, "__bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jaccard(F.col("__ga"), F.col("__gb")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash over whitespace tokens with the portable token hash:
    bit b of the signature = majority vote of token-hash bit b.

    All ``bits`` votes are tallied in ONE aggregate pass with an
    array<long> accumulator (acc_b += (h & 2^b != 0)) — one lambda
    invocation per token instead of ``bits`` full passes over the
    token array; the signature then reassembles from the counters
    (count*2 > ntok -> add the bit's mask)."""
    tokens = F.split(col, " ")
    th = F.transform(tokens, lambda t: _fold_hash(_char_codes(t)))
    ntok = F.size(tokens).cast("long")
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    counts = F.aggregate(
        th,
        F.array(*[F.lit(0).cast("long") for _ in range(bits)]),
        lambda acc, h: F.zip_with(
            acc, masks, lambda a, m: a + (h.bitwiseAND(m) != 0).cast("long")
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts, masks, lambda c, m: F.when(c * 2 > ntok, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda s, v: s + v,
    )


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Candidate pairs sharing at least one of ``bands`` signature
    bands (pigeonhole: hamming <= bands-1 guaranteed found), verified
    by exact hamming distance <= max_hamming."""
    width = bits // bands
    mask = (1 << width) - 1
    s = docs.select(F.col(id_col).alias("__id"), simhash(F.col(text_col), bits).alias("__sh"))
    banded = s.select(
        "__id",
        "__sh",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("__sh", i * width).bitwiseAND(F.lit(mask))
                    for i in range(bands)
                ]
            )
        ).alias("__band", "__bh"),
    )
    a = banded.select("__band", "__bh", F.col("__id").alias("id_a"), F.col("__sh").alias("__sa"))
    b = banded.select("__band", "__bh", F.col("__id").alias("id_b"), F.col("__sh").alias("__sb"))
    return (
        a.join(b, ["__band", "__bh"])
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb"))).alias("hamming")
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding near-dup
# ---------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Cosine >= threshold pairs within a bucket (label / coarse LSH
    bucket) — equi-join, no cross product."""
    v = emb.select(
        F.col(bucket_col).alias("__bk"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    a = v.select("__bk", F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = v.select("__bk", F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        a.join(b, "__bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine_sim(F.col("__va"), F.col("__vb")), 6).alias("cos_sim")
        )
        .where(F.col("cos_sim") >= threshold)
    )


def levenshtein_verify_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    min_sim_pct: int = 90,
    unit: str = "word",
) -> DataFrame:
    """Edit-distance verification of MinHash-LSH candidate pairs — the
    RefinedWeb/SlimPajama recipe: banding prunes the O(n^2) pair space,
    then surviving candidates get an EXACT Levenshtein check so hash
    collisions / shingle-insensitive edits can't leak through.

    Output: (id_a, id_b, lev, len_a, len_b, verified) with
    ``verified`` = lev * 100 <= (100 - min_sim_pct) * max(len_a, len_b)
    — pure integer arithmetic, so the normalized-similarity cut is
    engine-exact (no float division).

    Scale shape: the quadratic-cost levenshtein() runs ONLY on the
    LSH-surviving candidate pairs (a vanishing fraction of the corpus);
    texts re-attach through two narrow id-keyed joins against the
    candidate set — un-hinted, so AQE broadcasts the candidate side
    when small and degrades to a keyed shuffle otherwise, same policy
    as minhash_lsh_pairs.  Levenshtein itself is a JVM built-in
    (whole-stage codegen'd), no Python.
    """
    cand = minhash_lsh_pairs(
        docs, id_col=id_col, text_col=text_col, threshold=threshold, unit=unit
    ).select("id_a", "id_b")
    ta = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta"))
    tb = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb"))
    lev = F.levenshtein(F.col("__ta"), F.col("__tb"))
    len_a, len_b = F.length("__ta"), F.length("__tb")
    return (
        cand.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a",
            "id_b",
            lev.alias("lev"),
            len_a.alias("len_a"),
            len_b.alias("len_b"),
            (
                lev * 100 <= (100 - min_sim_pct) * F.greatest(len_a, len_b)
            ).alias("verified"),
        )
    )


def _winnow_fps(
    docs: DataFrame,
    k: int,
    w: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared staged pipeline: (id, __nk, __nw, __fps sorted-distinct
    fingerprint array) — see winnow_fingerprints for the algorithm and
    the staging rationale."""
    t = F.lower(F.col(text_col))
    s1 = docs.select(
        F.col(id_col),
        _char_codes(t).alias("__codes"),
        F.greatest(F.length(t) - F.lit(k - 1), F.lit(0)).alias("__nk"),
    )
    hashes = F.when(
        F.col("__nk") >= 1,
        F.transform(
            F.sequence(F.lit(1), F.col("__nk")),
            lambda i: _fold_hash(F.slice(F.col("__codes"), i, k)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    s2 = s1.select(id_col, "__nk", hashes.alias("__hashes"))
    s3 = s2.select(
        id_col,
        "__nk",
        F.greatest(F.size(F.col("__hashes")) - F.lit(w - 1), F.lit(0)).alias("__nw"),
        "__hashes",
    )
    fps = F.when(
        F.col("__nw") >= 1,
        F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nw")),
                    lambda j: F.array_min(F.slice(F.col("__hashes"), j, w)),
                )
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return s3.select(id_col, "__nk", "__nw", fps.alias("__fps"))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): hash every char ``k``-gram of the
    lowercased text, slide a ``w``-hash window, keep the MINIMUM hash
    of each window — the selected set is position-robust (any shared
    substring of length >= k+w-1 guarantees a shared fingerprint) and
    ~1/w the size of the full shingle set.

    Output per doc: (id, n_kgrams, n_windows, n_fps, fp_chk) where
    n_fps counts the distinct selected fingerprints and fp_chk is an
    order-canonical fold checksum over the SORTED fingerprint set (the
    same chk idiom as the geometry queries) — pinning the exact set
    without shipping arrays.  The cross-doc application is the usual
    one: explode fingerprints, equi-join on fp, verify candidates
    (operators/dedup.levenshtein_verify_pairs) — same banding shape as
    minhash LSH with the window guarantee instead of a probability.

    Scale shape: hashes, window minima, distinct and checksum are all
    row-local Column HOFs in the scan stage — ZERO shuffles; the
    fingerprint table this feeds is (id, fp) longs, never text.
    """
    # STAGED projections, deliberately: higher-order functions are
    # interpreted (no whole-stage codegen) and Spark's subexpression
    # elimination does not reach inside lambda bodies, so an inlined
    # `hashes` expression would be RE-COMPUTED for every window
    # position — O(len^2 * k) interpreted lambda calls (measured:
    # seconds per 300-char row).  Materializing codes -> hashes -> fps
    # as separate select stages makes each array a column VALUE
    # computed once per row; all stages still fuse into the one scan
    # (projections, no shuffle).
    s4 = _winnow_fps(docs, k, w, id_col, text_col)
    chk = F.aggregate(
        F.col("__fps"), F.lit(0).cast("long"), lambda a, b: (a * 31 + b) % HASH_MOD
    )
    return s4.select(
        F.col(id_col),
        F.col("__nk").cast("int").alias("n_kgrams"),
        F.col("__nw").cast("int").alias("n_windows"),
        F.size("__fps").alias("n_fps"),
        chk.alias("fp_chk"),
    )


def winnow_fp_table(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exploded fingerprint table (id, fp) — one row per distinct
    selected fingerprint per document; the join substrate for
    fingerprint-based dedup and decontamination.

    The fps array is localCheckpoint-pinned BEFORE the explode: the
    optimizer merges projections under a Generate regardless of
    reference counts, which re-inlines the staged hash pipeline into
    the window-min lambda — O(len^2 * k) interpreted evaluation
    (winnow_fingerprints' staging survives only because its summary
    output keeps multiple references alive; explode keeps one).  The
    size() column in the pinned frame preserves the double reference
    so the checkpoint itself materializes from the staged plan.  At
    scale the fingerprint table is exactly what you'd persist anyway.
    """
    pinned = (
        _winnow_fps(docs, k, w, id_col, text_col)
        .select(id_col, F.size("__fps").alias("__n_fps"), "__fps")
        .localCheckpoint(eager=False)
    )
    return pinned.select(id_col, F.explode("__fps").alias("fp"))


def winnow_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 8,
    w: int = 4,
    share_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination by winnowing fingerprints: score
    every corpus document by how much of ITS OWN fingerprint set is
    covered by benchmark fingerprints, flag at coverage >=
    ``share_pct`` percent (integer cross-multiply — no float ratio).
    Coverage-normalized, because raw shared counts just measure
    document length / vocabulary commonality; near-complete coverage
    is what verbatim benchmark leakage looks like.  The winnowing
    guarantee makes this SUBSTRING-robust where exact-window
    contamination (operators/textstats.contamination) is
    token-window-exact and the Bloom variant is probabilistic: any
    verbatim overlap of length >= k+w-1 chars is caught regardless of
    position or tokenization.

    Output, one row per corpus doc: (doc_id, n_fps, n_shared_fps,
    n_bench_docs, flagged).

    Scale shape: both sides reduce to (id, fp) long pairs in their
    scan stages (text never shuffles); the benchmark side is
    benchmark-sized (broadcastable — left to AQE, never forced); the
    flag join is fp-equi and the joins/aggregates all carry longs.
    """
    cf = winnow_fp_table(corpus, k, w, id_col, text_col)
    bf = winnow_fp_table(benchmark, k, w, id_col, text_col).select(
        F.col(id_col).alias("__bid"), "fp"
    )
    counts = cf.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_fps"))
    hits = (
        cf.join(bf, "fp")
        .groupBy(id_col)
        .agg(
            F.count_distinct("fp").alias("n_shared_fps"),
            F.count_distinct("__bid").alias("n_bench_docs"),
        )
    )
    return counts.join(hits, id_col, "left").select(
        id_col,
        "n_fps",
        F.coalesce("n_shared_fps", F.lit(0)).alias("n_shared_fps"),
        F.coalesce("n_bench_docs", F.lit(0)).alias("n_bench_docs"),
        (
            F.coalesce("n_shared_fps", F.lit(0)) * 100
            >= F.col("n_fps") * F.lit(share_pct)
        ).alias("flagged"),
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold_pct: int = 80,
) -> DataFrame:
    """Asymmetric near-duplicate pairs by n-gram CONTAINMENT
    c(A,B) = |A∩B| / min(|A|,|B|) — the signal Jaccard misses when a
    short document is embedded inside a longer one (boilerplate
    wrappers, quoted articles): Jaccard dilutes by the union, max
    containment stays 1.0.

    Output: (id_a, id_b, inter, size_a, size_b) with id_a < id_b and
    inter * 100 >= threshold_pct * min(size_a, size_b) — the integer
    inequality keeps the threshold engine-exact (no float division).

    Scale shape: intersections are computed FROM the join, not by
    comparing gram arrays — documents explode once into distinct
    (gram_hash, id) rows (gram hashes are int64; text never leaves the
    scan), the self-join on the gram key yields one row per shared
    gram per pair, and a map-side-combined groupBy on the pair counts
    |A∩B| directly.  Stop-gram guard: grams shared by more than
    ``max_df`` documents are dropped before the join (they would
    square in the pair count while carrying no dedup signal) — the
    standard posting-list cap from the dedup literature.
    """
    max_df = 64
    # pin the (id, shingle-array) projection before the 3-branch
    # fan-out (sizes / df counts / kept grams): the shingle fold is an
    # interpreted HOF that Catalyst would otherwise re-evaluate per
    # branch (the repo's staging discipline); the pinned table is
    # int64 arrays only — text never leaves the scan
    sh = docs.select(
        F.col(id_col).alias("__id"),
        word_shingle_hashes(F.col(text_col), n).alias("__g"),
    ).localCheckpoint(eager=True)
    g = sh.select("__id", F.explode("__g").alias("gram"))
    sizes = g.groupBy("__id").agg(F.count(F.lit(1)).alias("sz"))
    df_counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    g_kept = g.join(df_counts.where(F.col("df") <= max_df), "gram")
    a = g_kept.select(F.col("gram"), F.col("__id").alias("id_a"))
    b = g_kept.select(F.col("gram"), F.col("__id").alias("id_b"))
    inter = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("__id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("__id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
        .where(
            F.col("inter") * 100
            >= F.lit(threshold_pct) * F.least("size_a", "size_b")
        )
        .select("id_a", "id_b", "inter", "size_a", "size_b")
    )


def fuzzy_join_lev1(
    a: DataFrame,
    b: DataFrame,
    key: str = "key",
    id_col: str = "id",
) -> DataFrame:
    """Blocked fuzzy equi-join at edit distance <= 1 (record linkage /
    title reconciliation) via the DELETION NEIGHBORHOOD: two strings
    within one edit always share a variant of {s} ∪ Del1(s) (equal →
    s itself; substitution at i → both delete i; insertion → the
    longer side deletes the inserted char), so candidates come from an
    exact equi-join on generated variants — never a theta join, never
    a length-bucketed cross join. Candidates are verified with the
    exact levenshtein() (same integer on any engine).

    Scale shape: the variant explode is len(key)+1 per row (a
    short-key constant); the join is keyed by variant string (AQE
    handles popular variants); DISTINCT pair collapse runs on the
    already-small candidate set. At 100 TB both sides shuffle once,
    by variant.

    Output: (a_id, b_id, dist) with dist <= 1.
    """

    ka, kb = F.col("a_key"), F.col("b_key")
    av = a.select(
        F.col(id_col).alias("a_id"), F.col(key).alias("a_key")
    ).withColumn(
        "__v",
        F.explode(
            F.concat(
                F.array(F.col("a_key")),
                F.transform(
                    F.sequence(F.lit(1), F.length("a_key")),
                    lambda i: F.concat(
                        F.substring(F.col("a_key"), F.lit(1), i - 1),
                        F.substring(F.col("a_key"), i + 1, F.length("a_key")),
                    ),
                ),
            )
        ),
    )
    bv = b.select(
        F.col(id_col).alias("b_id"), F.col(key).alias("b_key")
    ).withColumn(
        "__v",
        F.explode(
            F.concat(
                F.array(F.col("b_key")),
                F.transform(
                    F.sequence(F.lit(1), F.length("b_key")),
                    lambda i: F.concat(
                        F.substring(F.col("b_key"), F.lit(1), i - 1),
                        F.substring(F.col("b_key"), i + 1, F.length("b_key")),
                    ),
                ),
            )
        ),
    )
    cand = av.join(bv, "__v").select("a_id", "a_key", "b_id", "b_key").distinct()
    return cand.where(F.levenshtein(ka, kb) <= 1).select(
        "a_id", "b_id", F.levenshtein(ka, kb).alias("dist")
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking (LBFS/rsync family): a chunk boundary
    falls AFTER position i whenever the polynomial rolling hash of the
    trailing ``window`` chars is divisible by ``divisor`` — so
    boundaries are determined by local content, and an edit re-syncs
    after at most ``window`` chars (unlike fixed-size chunking, where
    one insertion shifts every later chunk).  Expected chunk length is
    ``divisor`` chars.

    The hash is h(i) = sum_j code(i-j) * B^j mod M (B=257, M=2^31-1),
    evaluated INDEPENDENTLY per position (window is constant-size, so
    no sequential fold is needed) — all integer, engine-exact.

    Scale shape: pure scan-stage Column HOFs over a staged char-code
    array (staged once as a real column — nested-HOF re-evaluation of
    inline array expressions is the known 1000x trap), then one
    row-local explode.  Zero shuffles; zero Python.

    Output: (doc_id, idx, start, chunk_len, chunk) — idx 1-based,
    start 0-based char offset.
    """
    B, M = 257, (1 << 31) - 1
    pows = F.array(*[F.lit(pow(B, j, M)) for j in range(window)])
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.transform(F.split(F.col(text_col), ""), F.ascii).alias("a"),
    )
    n = F.size("a")

    def h(i):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(window - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.element_at("a", i - j).cast("long") * F.element_at(pows, j + 1),
        ) % M

    pos = F.filter(F.sequence(F.lit(window), n), lambda i: h(i) % divisor == 0)
    bounds = F.array_distinct(
        F.concat(F.array(F.lit(0)), pos, F.array(n))
    )
    # stage the bounds array as a real column: its elements are read
    # 3x per chunk inside the transform lambda below, and an inline
    # array expression would re-evaluate per reference
    staged = staged.select("doc_id", "text", bounds.alias("b"))
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("b") - 1),
        lambda k: F.struct(
            k.cast("int").alias("idx"),
            F.element_at("b", k).alias("start"),
            (F.element_at("b", k + 1) - F.element_at("b", k)).alias("chunk_len"),
            F.col("text")
            .substr(
                F.element_at("b", k) + 1,
                F.element_at("b", k + 1) - F.element_at("b", k),
            )
            .alias("chunk"),
        ),
    )
    return staged.select(
        "doc_id", F.explode(chunks).alias("c")
    ).select("doc_id", "c.idx", "c.start", "c.chunk_len", "c.chunk")


def cdc_duplicate_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 64,
    min_copies: int = 2,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-corpus duplicated content by CDC chunk — the dedup view:
    chunks shared by exact AND shifted near-copies collide because
    boundaries re-sync with content (the property fixed-size chunking
    lacks).  Output: top ``top_n`` (chunk_len, n_copies, n_docs,
    chunk) by (n_copies desc, chunk) — deterministic.

    Scale shape: one map-side-combined groupBy; at 100 TB the group
    key would be xxhash64(chunk) with text resolved only for the
    top-n survivors — here the oracle checks chunk TEXT, so the text
    key stays (fixture-scale contract, same convention as
    dedup_chunks_rewrite)."""
    ch = cdc_chunks(docs, window, divisor, id_col, text_col)
    return (
        ch.groupBy("chunk")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.max("chunk_len").alias("chunk_len"),
        )
        .where(F.col("n_copies") >= min_copies)
        .orderBy(F.col("n_copies").desc(), "chunk")
        .limit(top_n)
        .select("chunk_len", "n_copies", "n_docs", "chunk")
    )


def jaccard_prefix_join(
    docs: DataFrame,
    threshold_pct: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXACT Jaccard set-similarity self-join via prefix filtering
    (PPJoin family, Xiao et al. 2008) — the deterministic counterpart
    to MinHash-LSH: no false negatives, no probability knobs.

    Theorem used: order all tokens by global (frequency asc, token)
    — rarest first; if J(A, B) >= t then A and B must share a token
    within each one's first  |X| - ceil(t*|X|) + 1  rarest tokens.  So
    candidates come from an equi-join on PREFIX tokens only — the
    prefix is short and starts with globally RARE tokens, which is
    precisely what keeps the join's per-key fan-out small at corpus
    scale (the frequent tokens that would explode the join never enter
    a prefix unless a set is nearly all-frequent).

    Verification is exact: intersection counted by joining the full
    distinct-token lists of candidate pairs; the threshold test
    cross-multiplies (100*inter >= t_pct*(na+nb-inter)) — all integer.

    Scale shape: one groupBy for token frequencies (alphabet-sized), a
    doc-keyed sort to build ranked token arrays, the prefix equi-join
    (bounded fan-out by rarity), and a candidate-keyed count join.
    Text never shuffles — only (doc_id, token-rank) pairs.

    Output: (id_a, id_b, n_inter, n_union) for pairs with
    J >= threshold_pct/100, id_a < id_b.
    """
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))).alias(
            "tok"
        ),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    from pyspark.sql import Window

    rank = freq.select(
        "tok",
        F.row_number().over(Window.orderBy("f", "tok")).alias("rk"),
    )
    ranked = toks.join(rank, "tok").select("id", "rk")
    per_doc = ranked.groupBy("id").agg(
        F.sort_array(F.collect_list("rk")).alias("rks"),
        F.count(F.lit(1)).alias("n"),
    )
    t = int(threshold_pct)
    # prefix length n - ceil(t*n/100) + 1, all integer
    plen = F.col("n") - F.ceil(F.col("n") * t / 100).cast("long") + 1
    pref = per_doc.select(
        "id", "n", F.explode(F.slice("rks", 1, plen.cast("int"))).alias("rk")
    )
    a = pref.select(F.col("id").alias("id_a"), F.col("n").alias("n_a"), "rk")
    b = pref.select(F.col("id").alias("id_b"), F.col("n").alias("n_b"), "rk")
    cand = (
        a.join(b, "rk")
        .where(F.col("id_a") < F.col("id_b"))
        # size filter (the other prefix-family theorem): J >= t forces
        # t*max(n_a,n_b) <= |A∩B| <= min(n_a,n_b), so mismatched set
        # sizes can never reach the threshold — at high t this kills
        # almost every candidate BEFORE the verification join (measured
        # 92 s -> seconds on the dup-augmented corpus at sf0.1)
        .where(
            (F.col("n_a") * 100 >= t * F.col("n_b"))
            & (F.col("n_b") * 100 >= t * F.col("n_a"))
        )
        .select("id_a", "id_b", "n_a", "n_b")
        .distinct()
    )
    ta = ranked.select(F.col("id").alias("id_a"), "rk")
    tb = ranked.select(F.col("id").alias("id_b"), "rk")
    inter = (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "rk"])
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    uni = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.where(F.col("n_inter") * 100 >= t * uni)
        .select("id_a", "id_b", "n_inter", uni.alias("n_union"))
    )


def incremental_dedup_census(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Incremental (daily-crawl) dedup: classify a NEW batch against
    an EXISTING corpus — the production shape of web-scale dedup,
    where re-deduplicating the full 100 TB corpus per ingest is the
    anti-pattern and only the batch is probed.

    Classes, by priority:
      exact_corpus  — text hash already in the corpus
      exact_batch   — intra-batch exact duplicate (keeps the smallest
                      id as survivor; the survivor itself classifies
                      by the remaining rules)
      near_corpus   — LSH band match to a corpus doc verified at
                      shingle Jaccard >= threshold
      unique        — none of the above

    Output census: (clazz, n_docs), exact int64.

    Exactness: hash-equal candidates are RE-VERIFIED on raw text, so a
    44-bit text_hash collision (near-certain by ~4M docs, guaranteed at
    the 100 TB target) can never classify a distinct doc as
    exact_corpus/exact_batch — the census matches a raw-text-equality
    oracle for every input, not just collision-free fixtures.

    Scale shape: the corpus contributes ONLY its hash set and its
    banded signature table (signature = 16 longs/doc; both
    aggregate-light, both buildable once and reused across ingests);
    the batch-side joins are hash- and band-keyed equi-joins sized by
    the BATCH.  Corpus text re-attaches only for hashes that actually
    occur in the batch (a hash-keyed semi-join first, so the verify
    join is batch-sized); gram arrays re-attach to candidate pairs
    only (two narrow id-keyed joins, the minhash_lsh_pairs
    discipline).  No bucket cap here — parity with the exhaustive
    oracle; production can pre-filter hot bands exactly as
    minhash_lsh_pairs does.
    """
    from pyspark.sql import Window

    rows_per_band = len(MINHASH_PERMS) // bands

    def prep(df, with_text=False):
        cols = [
            F.col(id_col).alias("id"),
            word_shingle_hashes(F.col(text_col), n).alias("g"),
            text_hash(F.col(text_col)).alias("h"),
        ]
        if with_text:
            cols.append(F.col(text_col).alias("txt"))
        return df.select(*cols)

    def banded(df):
        sig = df.withColumn("sig", minhash_from_grams(F.col("g")))
        return sig.select(
            "id",
            F.posexplode(
                F.array(
                    *[
                        F.aggregate(
                            F.slice("sig", i * rows_per_band + 1, rows_per_band),
                            F.lit(0).cast("long"),
                            lambda acc, v: (acc * 31 + v) % HASH_MOD,
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("band", "bh"),
        )

    b = prep(batch, with_text=True).localCheckpoint(eager=True)
    c = prep(corpus).localCheckpoint(eager=True)

    # exact-vs-corpus: hash-keyed candidate probe, then raw-text verify.
    # Corpus text enters the plan only for batch-present hashes (the
    # semi-join keeps the verify side batch-sized at 100 TB corpus).
    cand_corp = (
        corpus.select(
            text_hash(F.col(text_col)).alias("h"),
            F.col(text_col).alias("ctxt"),
        )
        .join(b.select("h").distinct(), "h", "left_semi")
        .distinct()
    )
    exact_corp = (
        b.join(cand_corp, "h")
        .where(F.col("txt") == F.col("ctxt"))
        .select("id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rest1 = b.join(exact_corp, "id", "left_anti")
    # intra-batch exact classes group on (h, text): same-hash different-
    # text rows are NOT duplicates
    w = Window.partitionBy("h", "txt").orderBy("id")
    rest1 = rest1.withColumn("rn", F.row_number().over(w))
    exact_batch = rest1.where(F.col("rn") > 1).select("id")
    survivors = rest1.where(F.col("rn") == 1).select("id", "g").localCheckpoint(
        eager=True
    )

    cand = (
        banded(survivors).join(
            banded(c).select("band", "bh", F.col("id").alias("cid")),
            ["band", "bh"],
        )
        .select("id", "cid")
        .distinct()
    )
    ver = (
        cand.join(survivors.select("id", F.col("g").alias("ga")), "id")
        .join(c.select(F.col("id").alias("cid"), F.col("g").alias("gb")), "cid")
        .where(jaccard(F.col("ga"), F.col("gb")) >= threshold)
        .select("id")
        .distinct()
    )
    unique = survivors.select("id").join(ver, "id", "left_anti")

    census = (
        exact_corp.select(F.lit("exact_corpus").alias("clazz"))
        .unionByName(exact_batch.select(F.lit("exact_batch").alias("clazz")))
        .unionByName(ver.select(F.lit("near_corpus").alias("clazz")))
        .unionByName(unique.select(F.lit("unique").alias("clazz")))
    )
    return census.groupBy("clazz").agg(F.count(F.lit(1)).alias("n_docs"))


def minhash_error_histogram(
    pairs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    type_col: str = "pair_type",
    n: int = 3,
    bucket_pp: int = 5,
) -> DataFrame:
    """MinHash estimator calibration — measure, don't guess: for
    ground-truth document pairs, compare the signature estimate
    (matching positions / 16) against the EXACT shingle Jaccard and
    histogram the absolute error in percent-point buckets.  The audit
    that tells you whether 16 permutations are enough for your dedup
    threshold before you spend a 100 TB pass on it.

    All integer: with m matching positions (of P=16 perms), i = |A&B|,
    u = |A|+|B|-i, the error in scaled percent points is
    |m*u - P*i| * 100 // (P*u), bucketed by ``bucket_pp``.

    Output: (pair_type, err_bucket, n_pairs, max_err_pp).

    Scale shape: Column-only per pair (shingles, signatures, one
    zip_with) — no joins beyond what the caller used to form pairs;
    the histogram is a map-side-combined groupBy.
    """
    P = len(MINHASH_PERMS)
    ga = word_shingle_hashes(F.col(text_a), n)
    gb = word_shingle_hashes(F.col(text_b), n)
    sa = minhash_from_grams(ga)
    sb = minhash_from_grams(gb)
    m = F.aggregate(
        F.zip_with(sa, sb, lambda a, b: F.when(a == b, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    i = F.size(F.array_intersect(ga, gb))
    u = F.size(ga) + F.size(gb) - i
    err_pp = F.abs(m * u - P * i) * 100 / (P * u)
    err_pp = F.floor(err_pp).cast("long")
    out = pairs.select(
        F.col(type_col).alias("pair_type"),
        (err_pp / F.lit(bucket_pp)).cast("long").alias("err_bucket"),
        err_pp.alias("e"),
    )
    return out.groupBy("pair_type", "err_bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.max("e").alias("max_err_pp"),
    )
