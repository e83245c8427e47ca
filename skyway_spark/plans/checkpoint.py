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
    ) -> DataFrame:
        """Return the stage DataFrame, resuming from the checkpoint
        when the manifest matches ``fingerprint``."""
        data_dir, manifest_path, lineage_dir = self._paths(name)
        m = self._load_manifest(manifest_path)
        if m and m.get("fingerprint") == fingerprint:
            self.results.append(
                StageResult(name, fingerprint, m["row_count"], m["n_partitions"], 0, True)
            )
            return spark.read.parquet(data_dir)

        t0 = time.monotonic()
        df = fn()
        df.write.mode("overwrite").parquet(data_dir)
        out = spark.read.parquet(data_dir)
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
            "row_count": row_count,
            "n_partitions": len(lrows),
            "partition_rows": {int(r["partition_id"]): int(r["rows"]) for r in lrows},
            "wall_ms": wall_ms,
            "schema": out.schema.jsonValue(),
        }
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
