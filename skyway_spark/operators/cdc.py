"""Changelog application (CDC merge): the MERGE INTO / upsert
semantics of Iceberg/Delta/Hudi as a pure DataFrame transformation.

A changelog is a stream of keyed rows carrying ``op`` = 'U' (upsert,
full payload) or 'D' (delete) and a monotone ``seq`` (commit LSN,
Kafka offset, event id).  Applying it to a snapshot yields the table
state after the last change: latest-wins per key, deletes remove,
upserts replace-or-insert.

The reference engine (skyway, a single-pass converter) has no
analogue; in OSM terms this is exactly the `.osc` changeset-apply
operation its ecosystem performs upstream (osmium apply-changes), so
a user of the reference gets the missing half of the workflow here.

Scale shape: ONE key-shuffle of the changelog (window per key keeps
only the max-seq row — map-side nothing, but the changelog is the
small side by construction), then one key anti-join against the
snapshot (AQE broadcasts the surviving change keys when small) and a
union.  The snapshot is never window-sorted and its payload never
shuffles — at 100 TB the big table moves zero bytes except through
the anti-join's key comparison, which bucketing/partition-pruning on
the key column turns into a local probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_changelog(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    changelog_hint: str = "auto",
) -> DataFrame:
    """Return the post-changelog table state.

    ``changes`` must contain ``key_cols``, ``seq_col``, ``op_col`` and
    every snapshot payload column (payload values on 'D' rows are
    ignored).  Latest-wins per key by ``seq``; a seq tie breaks to 'U'
    over 'D' (deterministic, and the safe direction: replay keeps
    data).  Output columns == snapshot columns.

    The latest-per-key slice is localCheckpoint'ed (lazy): it feeds
    BOTH the anti-join keys and the upsert payload, and without the
    pin Spark plans the key-window twice.  ``changelog_hint``:

    - ``'broadcast'`` — hint the anti-join keys to broadcast: the big
      snapshot moves ZERO bytes (right whenever the changelog batch
      fits an executor, the overwhelmingly common case);
    - ``'auto'`` — no hint; AQE/planner decides, degrading to a
      co-partitioned join for pathological TB-scale changelogs.
      (Never force-broadcast by default — the round-1 minhash lesson.)
    """
    if changelog_hint not in ("auto", "broadcast"):
        raise ValueError(f"changelog_hint must be auto|broadcast, got {changelog_hint!r}")
    payload = snapshot.columns
    missing = [c for c in payload + [seq_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changelog missing columns: {missing}")
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .localCheckpoint(eager=False)
    )
    keys = latest.select(*key_cols)
    if changelog_hint == "broadcast":
        keys = F.broadcast(keys)
    survivors = snapshot.join(keys, list(key_cols), "left_anti")
    upserts = latest.where(F.col(op_col) == "U").select(*payload)
    return survivors.unionByName(upserts)


def apply_changelog_versioned(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Seq-aware changelog apply for OUT-OF-ORDER logs (the Hudi
    precombine-field semantics): the snapshot itself carries
    ``seq_col`` (the seq that produced each row), and a change wins a
    key only if its seq is STRICTLY greater — a late-arriving stale
    update or delete is a no-op, so replaying any permutation of the
    same changelog converges to the same state (tested law).

    Contrast with ``apply_changelog``: that one is for in-order logs
    and keeps the big snapshot completely unshuffled (broadcast
    anti-join).  Version comparison inherently needs to SEE the
    snapshot's seq per key, so this variant pays one keyed full-outer
    join of snapshot vs the latest-per-key change slice — co-located
    (zero snapshot movement) when the snapshot is bucketed/partitioned
    by the key, which is how a 100 TB upsert table is laid out anyway;
    the change side is window-reduced to one row per touched key
    first.  Output columns == snapshot columns (seq_col updated to the
    winning seq).
    """
    payload = snapshot.columns
    if seq_col not in payload:
        raise ValueError(f"snapshot must carry {seq_col!r} for versioned apply")
    missing = [c for c in payload + [op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"changelog missing columns: {missing}")
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .select(*[F.col(c).alias(f"__c_{c}") for c in payload + [op_col]])
    )
    cond = [F.col(k) == F.col(f"__c_{k}") for k in key_cols]
    j = snapshot.join(latest, cond, "full_outer")
    change_wins = F.col(f"__c_{seq_col}").isNotNull() & (
        F.col(seq_col).isNull() | (F.col(f"__c_{seq_col}") > F.col(seq_col))
    )
    dropped = change_wins & (F.col(f"__c_{op_col}") == "D")
    out_cols = [
        F.when(change_wins, F.col(f"__c_{c}")).otherwise(F.col(c)).alias(c)
        for c in payload
    ]
    # change-only 'D' rows (key absent from snapshot) fall under
    # `dropped` too, so the single filter covers deletes and no-ops
    return j.where(~dropped).select(*out_cols)


def changelog_to_scd2(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a
    changelog: one row per (key, version) with its validity interval
    [valid_from, valid_to) in seq units — valid_to is the next
    change's seq for that key, NULL while current.  Delete rows close
    the previous interval and emit no payload row (is_current handles
    the "deleted now" case by absence).

    Together with apply_changelog/apply_changelog_versioned this
    completes the CDC triad: latest state, versioned state, and full
    history with time travel by seq (`WHERE valid_from <= s AND
    (valid_to IS NULL OR valid_to > s)`).

    Scale shape: ONE keyed window (lead over seq per key) — the
    changelog shuffles once on the key, payload included; history
    builds are offline compactions, not hot-path lookups.
    """
    payload = [c for c in changes.columns if c != op_col]
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).asc())
    with_next = changes.select(
        *payload,
        F.col(op_col).alias("__op"),
        F.lead(F.col(seq_col)).over(w).alias("valid_to"),
    )
    return with_next.where(F.col("__op") == "U").select(
        *[c for c in payload if c != seq_col],
        F.col(seq_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Changelog BETWEEN two keyed snapshots — the inverse of
    ``apply_changelog``: emit op 'I' for keys only in ``new``, 'D' for
    keys only in ``old``, 'U' for keys present in both whose compared
    columns differ (null-safe).  Unchanged keys are dropped.

    Output: keys + op + old_/new_-prefixed compare columns.

    Scale shape: ONE full-outer sort-merge join co-partitioned on the
    key (both sides shuffle once on the same key, so AQE can plan a
    skew-split); compare columns ride the join row — no second pass,
    no driver collection.  At 100 TB this is the standard
    snapshot-reconciliation shape (table-format diff, backfill
    validation), linear in the larger snapshot.
    """
    o = old.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        j.withColumn("op", op)
        .where(F.col("op").isNotNull())
        .drop("__in_old", "__in_new")
    )


def pit_join(
    facts: DataFrame,
    history: DataFrame,
    key_cols: list[str],
    at_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) join — the feature-store correctness
    primitive: each fact row picks the dimension VERSION whose
    [valid_from, valid_to) interval contains the fact's ``at`` value,
    never a later one (no leakage) and never an earlier one (no
    staleness).  Inner semantics: facts before the key's first version
    or inside a delete gap drop out.

    Scale shape: an equi-join on the key with the interval predicate
    as join condition — versions-per-key is the small fan-out (bounded
    by change frequency, not corpus size), so this stays a plain
    shuffled hash/sort-merge join; SCD2 intervals partition each key's
    timeline, so every fact matches AT MOST one version and the join
    never amplifies.
    """
    f = facts
    cond = [f[k] == history[k] for k in key_cols]
    cond.append(f[at_col] >= history[from_col])
    cond.append(history[to_col].isNull() | (f[at_col] < history[to_col]))
    joined = f.join(history, cond, "inner")
    return joined.select(
        *[f[c] for c in facts.columns],
        *[history[c] for c in history.columns if c not in facts.columns],
    )
