"""Structured Streaming over the events table shape.

The reference has no event-time streaming (its "streaming" is
stdin/stdout piping, docs/src/usage.md); this module adds the
standard Spark treatment for the engine's events feed: file-source
readStream -> watermark -> tumbling-window aggregation, plus a
stateful sessionizer. Bounded runs use trigger(availableNow=True) so
batch tests exercise the exact streaming plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.readStream.format(fmt).schema(EVENTS_DDL).load(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window per-type counts with late-data watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


SESSION_OUTPUT_DDL = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_SESSION_STATE_DDL = "start long, last long, n long"


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization with
    applyInPandasWithState (one state per user; event-time timeout).

    A session closes when the watermark passes last_event + gap; the
    closed session is emitted as (user_id, start, end, n_events).
    Arrow-batched per group — no per-row Python (input_hint)."""
    import pandas as pd  # local import: workers deserialize the closure

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(last, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start = last = None
        n = 0
        if state.exists:
            start, last, n = state.get
        out = []
        for pdf in pdf_iter:
            ts = pdf["ts"].sort_values().astype("int64") // 1000  # ns -> us
            for t in ts:
                t = int(t)
                if last is not None and t - last > gap_us:
                    out.append((key[0], start, last, n))
                    start, n = t, 0
                if start is None:
                    start = t
                last = t
                n += 1
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + gap_us) // 1000)  # ms
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_OUTPUT_DDL,
            _SESSION_STATE_DDL,
            "append",
            "EventTimeTimeout",
        )
    )


def tile_window_counts(
    points: DataFrame, z: int = 8, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming spatial rollup: tumbling event-time windows x slippy
    tile, with late data bounded by the watermark. The tile key is the
    same pure-Column math as the batch path (functions/cells.py), so
    stream and batch rollups agree bit-for-bit; state per trigger is
    one row per live (window, tile), which at planet scale is bounded
    by the tile grid, not the input rate.

    points needs (ts, lat, lon)."""
    from skyway_spark.functions import cells

    tx, ty = cells.tile_xy(F.col("lat"), F.col("lon"), z)
    return (
        points.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window).alias("w"),
            tx.alias("tile_x"),
            ty.alias("tile_y"),
        )
        .agg(F.count(F.lit(1)).alias("n_points"))
        .select(
            F.col("w.start").alias("window_start"),
            F.lit(z).alias("tile_z"),
            "tile_x",
            "tile_y",
            "n_points",
        )
    )


def join_streams_interval(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: right events within
    [left_ts, left_ts + within] for the same key. Both sides carry
    watermarks and the join condition bounds event-time range, so
    Spark can evict join state — the requirement for an unbounded
    stream-stream join to run with finite memory. Output columns:
    key, l_ts, l_id, r_ts, r_id.

    ``how='left_outer'`` additionally emits null-padded rows for left
    events that never matched, once the watermark passes their join
    window (Spark requires exactly this watermark + event-time-bound
    combination for outer stream-stream joins); the batch-mode
    equivalent is a plain left join, which the parity test pins."""
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("l_ts"),
        F.col("event_id").alias("l_id"),
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("r_ts"),
        F.col("event_id").alias("r_id"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"interval {within}"))
    )
    return l.join(r, cond, how).select(
        F.col("__k").alias(key), "l_ts", "l_id", "r_ts", "r_id"
    )


def enrich_stream(events: DataFrame, dim: DataFrame, on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join. The static side is broadcast —
    per micro-batch the stream stays narrow (no stateful join, no
    shuffle of the stream side), which is the only join shape that
    holds up when the stream is the 100 TB side."""
    return events.join(F.broadcast(dim), on, "left")


def dedup_stream(
    events: DataFrame, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup on event id: state is bounded by the
    watermark (ids older than it are evicted), so at-least-once
    sources (Kafka replays, file re-lists) become exactly-once
    downstream without unbounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        [id_col]
    )


def run_bounded(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str, fmt: str = "parquet"
) -> None:
    """Drain all available input once (availableNow) — the streaming
    plan, watermarks included, executed to completion for tests and
    backfills."""
    q = (
        stream_df.writeStream.format(fmt)
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_bounded_complete(stream_df: DataFrame, name: str) -> None:
    """Drain all available input once in COMPLETE mode into the
    in-memory sink table ``name`` — for unwatermarked streaming
    aggregations (sketch registers, running counters) whose full
    result is re-emitted per trigger.  Sketch maintenance is the
    canonical use: HLL's register max and CMS's counter sum are
    commutative-idempotent/associative combines, so the streaming
    aggregation state IS the sketch and stream==batch holds exactly
    (pinned by tests/test_streaming_sketches.py).  In production the
    complete-mode sink would be a foreachBatch merge into the sketch
    store; memory sink keeps the test harness engine-only."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


TRIP_OUTPUT_DDL = (
    "user_id long, n_points long, first_id long, last_id long, path_cm long"
)
_TRIP_STATE_DDL = (
    "first_id long, last_id long, n long, path_cm long, "
    "last_us long, last_lat double, last_lon double"
)


def segment_trips_stream(
    points: DataFrame,
    jump_km: float,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming counterpart of operators/trajectory.segment_trips:
    per-user trip segmentation with applyInPandasWithState. A segment
    closes when the NEXT point breaks it (geodesic jump > ``jump_km``
    or time gap > ``gap``, detected in-batch) or when the watermark
    passes last_point + gap (event-time timeout). Closed segments emit
    as (user_id, n_points, first_id, last_id, path_cm) — the same
    integer path quantization as the batch operator, so
    stream == batch on closed segments (pinned in test_pipeline.py).

    Input needs (user_id, event_id, ts, lat, lon). State per user is
    one segment summary + the last point — O(1), skew-safe. Points are
    ordered (ts, event_id) within each batch; cross-batch order is the
    arrival order, the standard streaming-sessionizer contract.
    """
    import math

    import pandas as pd  # local import: workers deserialize the closure

    gap_us = int(pd.Timedelta(gap).total_seconds() * 1_000_000)
    jump = float(jump_km)

    def hav(la1, lo1, la2, lo2):
        dla = math.radians(la2 - la1) / 2.0
        dlo = math.radians(lo2 - lo1) / 2.0
        a = math.sin(dla) ** 2 + math.cos(math.radians(la1)) * math.cos(
            math.radians(la2)
        ) * math.sin(dlo) ** 2
        return 2.0 * 6371.0088 * math.asin(math.sqrt(a))

    def emit(rows):
        return pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "n_points": [r[1] for r in rows],
                "first_id": [r[2] for r in rows],
                "last_id": [r[3] for r in rows],
                "path_cm": [r[4] for r in rows],
            }
        )

    def fn(key, pdf_iter, state):
        if state.hasTimedOut:
            fid, lid, n, path, *_ = state.get
            state.remove()
            yield emit([(key[0], n, fid, lid, path)])
            return
        have = state.exists
        fid = lid = n = path = last_us = 0
        llat = llon = 0.0
        if have:
            fid, lid, n, path, last_us, llat, llon = state.get
        out = []
        # Arrow delivers one GROUP as MULTIPLE chunks when it exceeds
        # maxRecordsPerBatch; chunks arrive in shuffle order, so sorting
        # per chunk would process points out of time order. Buffer the
        # whole group for this trigger and sort ONCE — per-entity volume
        # per trigger bounds the buffer (the applyInPandasWithState norm).
        chunks = list(pdf_iter)
        if not chunks and not have:
            return  # no data, no state: write no phantom state
        whole = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["ts", "event_id", "lat", "lon"])
        )
        pdf = whole.sort_values(["ts", "event_id"])
        us = pdf["ts"].astype("int64") // 1000
        for t, eid, la, lo in zip(us, pdf["event_id"], pdf["lat"], pdf["lon"]):
            t, eid, la, lo = int(t), int(eid), float(la), float(lo)
            if have:
                step = hav(llat, llon, la, lo)
                if step > jump or (t - last_us) > gap_us:
                    out.append((key[0], n, fid, lid, path))
                    fid = lid = eid
                    n, path = 1, 0
                else:
                    n += 1
                    fid, lid = min(fid, eid), max(lid, eid)
                    path += math.floor(step * 1e5)
            else:
                fid = lid = eid
                n, path = 1, 0
                have = True
            last_us, llat, llon = t, la, lo
        state.update((fid, lid, n, path, last_us, llat, llon))
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)  # ms
        if out:
            yield emit(out)

    return (
        points.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            TRIP_OUTPUT_DDL,
            _TRIP_STATE_DDL,
            "append",
            "EventTimeTimeout",
        )
    )


def latest_snapshot_version(spark, root: str) -> int:
    """Highest committed snapshot version under ``root`` (-1 if none)."""
    from pathlib import Path

    versions = [
        int(p.name[1:])
        for p in Path(root).glob("v*")
        if p.name[1:].isdigit() and (p / "_SUCCESS").exists()
    ]
    return max(versions, default=-1)


def read_snapshot(spark, root: str) -> DataFrame:
    """Read the latest committed snapshot version."""
    v = latest_snapshot_version(spark, root)
    if v < 0:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    return spark.read.parquet(f"{root}/v{v}")


def apply_changelog_stream(
    changes: DataFrame,
    snapshot_root: str,
    key_cols: list[str],
    checkpoint_dir: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """Streaming CDC upsert: each micro-batch of changelog rows is
    applied to the latest snapshot version and committed as a NEW
    version directory (``v0``, ``v1``, ...) — copy-on-write table
    semantics (the Hudi/Delta shape) with plain parquet + _SUCCESS
    markers as the commit protocol, so nothing here depends on a table
    format being installed.

    Ordering contract: batch boundaries must respect per-key seq order
    (true for CDC sources with per-key ordering, e.g. a keyed Kafka
    topic); within a batch any order is fine (latest-seq-wins).  The
    streamed final state then equals one batch apply of the whole log
    — pinned by tests/test_streaming_sketches.py.

    Scale shape: per batch, exactly apply_changelog's cost (changelog
    key-window + broadcast anti-join) plus one snapshot rewrite; a
    real deployment replaces the full rewrite with a format-native
    row-level MERGE, but the dataflow — and this operator's join
    shape — is identical.
    """
    from skyway_spark.operators.cdc import apply_changelog

    def upsert(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = latest_snapshot_version(spark, snapshot_root)
        if v < 0:
            raise FileNotFoundError(f"no committed snapshot under {snapshot_root}")
        snap = spark.read.parquet(f"{snapshot_root}/v{v}")
        out = apply_changelog(
            snap, batch_df, key_cols, seq_col, op_col, changelog_hint="broadcast"
        )
        out.write.mode("overwrite").parquet(f"{snapshot_root}/v{v + 1}")

    return (
        changes.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


GEOFENCE_OUTPUT_DDL = (
    "entity bigint, ts timestamp, point_id bigint, "
    "from_region bigint, to_region bigint, kind string"
)
_GEOFENCE_STATE_DDL = "last_us bigint, last_region bigint"


def geofence_stream(
    points: DataFrame,
    polygons: DataFrame,
    watermark: str = "2 hours",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming counterpart of trajectory.geofence_transitions:
    enter/exit/switch alerts as points arrive.

    The containment stage is STATELESS — the fence set is
    dimension-sized (same contract as the operators/pip broadcast
    path), so region-per-point compiles to the literal-edge ray-cast
    Column with the batch operator's exact arithmetic; region is the
    MINIMUM containing polygon_id, -1 outside.  The only streaming
    state is one (last_ts, last_region) pair per entity
    (applyInPandasWithState), making state size O(entities), never
    O(events).  Stream == batch on time-ordered arrival (single-batch
    or ordered multi-batch input; the standard streaming-sessionizer
    contract), pinned in tests.
    """
    import pandas as pd  # local import: workers deserialize the closure

    from skyway_spark.operators.pip import _odd_crossings, _rings_lit

    rows = polygons.select(
        "polygon_id", "ring", F.col("ring_role").alias("role")
    ).collect()
    outers: dict[int, list] = {}
    holes: dict[int, list] = {}
    for r in rows:
        ys = [float(p["lat"]) for p in r["ring"]]
        xs = [float(p["lon"]) for p in r["ring"]]
        tgt = outers if r["role"] == "outer" else holes
        tgt.setdefault(int(r["polygon_id"]), []).append((ys, xs))

    lat_c, lon_c = F.col("lat"), F.col("lon")
    region = F.lit(None).cast("long")
    for pid in sorted(outers, reverse=True):  # smallest containing pid wins
        inside = F.lit(False)
        for ring in outers[pid]:
            inside = inside | _odd_crossings(
                F.element_at(_rings_lit([ring]), 1), lat_c, lon_c
            )
        for ring in holes.get(pid, []):
            inside = inside & ~_odd_crossings(
                F.element_at(_rings_lit([ring]), 1), lat_c, lon_c
            )
        region = F.when(inside, F.lit(pid).cast("long")).otherwise(region)

    regioned = points.withWatermark(ts_col, watermark).select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("point_id"),
        F.coalesce(region, F.lit(-1)).cast("long").alias("region"),
    )

    def fn(key, pdf_iter, state):
        prev_us, prev_region = (state.get if state.exists else (-1, -1))
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "point_id"])
        out = {k: [] for k in ("ts", "point_id", "from_region", "to_region", "kind")}
        us = pdf["ts"].astype("int64") // 1000
        for t, pid_, reg, ts_val in zip(us, pdf["point_id"], pdf["region"], pdf["ts"]):
            reg = int(reg)
            if reg != prev_region:
                kind = (
                    "exit" if reg == -1 else ("enter" if prev_region == -1 else "switch")
                )
                out["ts"].append(ts_val)
                out["point_id"].append(int(pid_))
                out["from_region"].append(prev_region)
                out["to_region"].append(reg)
                out["kind"].append(kind)
            prev_region = reg
            prev_us = int(t)
        state.update((prev_us, prev_region))
        if out["ts"]:
            yield pd.DataFrame({"entity": [key[0]] * len(out["ts"]), **out})

    return regioned.groupBy("entity").applyInPandasWithState(
        fn,
        GEOFENCE_OUTPUT_DDL,
        _GEOFENCE_STATE_DDL,
        "append",
        "NoTimeout",
    )


ZSCORE_OUTPUT_DDL = "entity bigint, ts timestamp, point_id bigint, v_q bigint, n_prior bigint"
_ZSCORE_STATE_DDL = "n bigint, s bigint, ssq bigint"


def zscore_stream(
    points: DataFrame,
    watermark: str = "2 hours",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    min_n: int = 5,
    z2: int = 9,
) -> DataFrame:
    """Streaming twin of operators/stats.running_zscore_flags: per
    entity the state is the integer moment triple (n, s, ssq) —
    O(entities), never O(events) — and each arriving point is flagged
    against the PRIOR state with the same cross-multiplied z^2 > z2
    integer inequality, then folded in.  Stream == batch on
    time-ordered arrival (parity-pinned)."""
    import pandas as pd  # local import: workers deserialize the closure

    quant = points.withWatermark(ts_col, watermark).select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("point_id"),
        F.floor(F.col(value_col) * scale).cast("long").alias("v_q"),
    )

    def fn(key, pdf_iter, state):
        n, s, ssq = (state.get if state.exists else (0, 0, 0))
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "point_id"])
        out = {k: [] for k in ("ts", "point_id", "v_q", "n_prior")}
        for ts_val, pid, vq in zip(pdf["ts"], pdf["point_id"], pdf["v_q"]):
            vq = int(vq)
            dev = vq * n - s
            if n >= min_n and dev * dev > z2 * (n * ssq - s * s):
                out["ts"].append(ts_val)
                out["point_id"].append(int(pid))
                out["v_q"].append(vq)
                out["n_prior"].append(n)
            n, s, ssq = n + 1, s + vq, ssq + vq * vq
        state.update((n, s, ssq))
        if out["ts"]:
            yield pd.DataFrame({"entity": [key[0]] * len(out["ts"]), **out})

    return quant.groupBy("entity").applyInPandasWithState(
        fn,
        ZSCORE_OUTPUT_DDL,
        _ZSCORE_STATE_DDL,
        "append",
        "NoTimeout",
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE session_window aggregation
    (merging-window state managed by the engine) — the built-in
    counterpart of the custom applyInPandasWithState ``sessionize``;
    having both pins that the hand-rolled operator matches the engine's
    own session semantics.  Works identically over batch and streaming
    input (the parity test runs it both ways)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )



# NOTE on Spark 4's transformWithState[InPandas]: the successor API to
# applyInPandasWithState exists in this PySpark build, but its state
# server speaks protobuf and `google.protobuf` is not installed in the
# target container (ImportError: cannot import name 'descriptor'),
# verified empirically — the API crashes at runner init, not in user
# code.  applyInPandasWithState is therefore the supported custom-
# stateful path here (sessionize, segment_trips_stream, geofence_stream,
# zscore_stream); the operators port mechanically to StatefulProcessor
# once the dependency is available.


CUSUM_OUTPUT_DDL = (
    "entity bigint, ts timestamp, point_id bigint, v_q bigint, "
    "s_hi bigint, s_lo bigint"
)
_CUSUM_STATE_DDL = "s_hi bigint, s_lo bigint"


def cusum_stream(
    points: DataFrame,
    mu_q: int,
    k_q: int,
    h_q: int,
    watermark: str = "2 hours",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
) -> DataFrame:
    """Streaming twin of operators/stats.cusum_changepoints: per entity
    the state is just the two CUSUM statistics (s_hi, s_lo) — O(1) per
    entity — updated with the literal Page recurrence

        s_hi = max(0, s_hi + (v - mu_q) - k_q)
        s_lo = min(0, s_lo + (v - mu_q) + k_q)

    and emitted whenever s_hi > h_q or s_lo < -h_q.  The batch operator
    computes the same values via the prefix-sum identity; parity on
    time-ordered arrival is test-pinned, which doubles as an
    independent proof of the identity on real data."""
    import pandas as pd  # local import: workers deserialize the closure

    quant = points.withWatermark(ts_col, watermark).select(
        F.col(entity_col).alias("entity"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("point_id"),
        F.floor(F.col(value_col) * scale).cast("long").alias("v_q"),
    )

    def fn(key, pdf_iter, state):
        s_hi, s_lo = (state.get if state.exists else (0, 0))
        chunks = list(pdf_iter)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "point_id"])
        out = {k: [] for k in ("ts", "point_id", "v_q", "s_hi", "s_lo")}
        for ts_val, pid, vq in zip(pdf["ts"], pdf["point_id"], pdf["v_q"]):
            vq = int(vq)
            s_hi = max(0, s_hi + (vq - mu_q) - k_q)
            s_lo = min(0, s_lo + (vq - mu_q) + k_q)
            if s_hi > h_q or s_lo < -h_q:
                out["ts"].append(ts_val)
                out["point_id"].append(int(pid))
                out["v_q"].append(vq)
                out["s_hi"].append(s_hi)
                out["s_lo"].append(s_lo)
        state.update((s_hi, s_lo))
        if out["ts"]:
            yield pd.DataFrame({"entity": [key[0]] * len(out["ts"]), **out})

    return quant.groupBy("entity").applyInPandasWithState(
        fn,
        CUSUM_OUTPUT_DDL,
        _CUSUM_STATE_DDL,
        "append",
        "NoTimeout",
    )
