"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.8) — this is the
north-star extension: the same event-time analytics the batch registry
exposes (events_hourly, sessionization), expressed as incremental
streaming queries with watermarked state. Tests assert stream/batch
equivalence: replaying the parquet fixture through the stream produces
the batch answers.

Scale notes: watermarks bound state (late data beyond the watermark is
dropped, state for closed windows is evicted); the windowed aggregates
are partial-agg'd before the shuffle like any groupBy. On a cluster the
source would be Kafka/files-on-arrival; the parquet replay here uses the
same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.schemas import TABLE_SCHEMAS


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events fixture.

    Same ts handling as the batch loader (sources/loaders.py): the file
    has shipped as both TIMESTAMP(NANOS) (readable only as raw INT64 via
    nanosAsLong — truncate to micros) and TIMESTAMP(MICROS) (a native
    timestamp). The streaming source needs a declared schema, so probe
    the footer with a zero-row batch read and declare accordingly. The
    watermark/window columns need a true TIMESTAMP type (session tz
    pinned UTC by the session factory).
    """
    import os

    from pyspark.sql.types import LongType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, "events.parquet")
    ts_is_long = isinstance(
        spark.read.parquet(path).schema["ts"].dataType, LongType
    )
    raw_schema = ", ".join(
        [
            "event_id long",
            "ts long" if ts_is_long else "ts timestamp",
            "user_id long",
            "event_type string",
            "value double",
            "props string",
        ]
    )
    # The streaming file source requires a *directory*. The driver
    # fixture ships events.parquet as a single FILE (stream the parent
    # dir with a glob pinned to that name), but Spark-written datasets
    # are a DIRECTORY of part files (stream it directly — a name glob
    # would match nothing and silently replay an EMPTY stream, the bug
    # the sf1 scale pass caught in r4).
    if os.path.isdir(path):
        stream = spark.readStream.schema(raw_schema).format("parquet").load(path)
    else:
        stream = (
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
    if ts_is_long:
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return stream


def windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling (or sliding, if ``slide`` given) window
    aggregate per event_type — the streaming twin of the batch
    ``events_hourly`` registry query."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via ``session_window`` — the
    streaming twin of the batch lag+cumsum ``sessionization`` query.
    State per (user, open session); watermark closes and evicts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def user_running_stats(
    events: DataFrame,
    *,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful per-key operator via ``applyInPandasWithState``:
    maintains (event count, value sum, max value) per user across
    micro-batches and emits the updated totals each batch.

    This is the escape hatch for aggregations Spark's built-ins can't
    express (per-key model state, CUSUM detectors, decaying counters…);
    state is a small tuple per user, partitioned by the grouping key, and
    the GroupStateTimeout + watermark bound its lifetime. Arrow batches
    keep the Python hop amortized."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double, max_value double"
    state_schema = "n long, total double, mx double"

    def update(key, pdfs, state: GroupState):
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)],
             "max_value": [mx]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def transition_stream(
    events: DataFrame,
    *,
    watermark: str = "2 hours",
    n_buckets: int = 64,
) -> DataFrame:
    """Streaming Markov transitions: per user, each arriving event is
    paired with that user's PREVIOUS event type (the sequence-model
    feature stream, batch twin: ``event_transitions``).

    Event-time-correct across micro-batches (ADVICE r2): arriving
    events are BUFFERED in state and a transition is emitted only once
    the watermark passes its event — by then every earlier event has
    either arrived (buffered, so it chains first) or been dropped as
    late by the watermark filter, so the emitted chain equals the batch
    chain over the ≤-watermark prefix regardless of how arrivals split
    across micro-batches. An EventTimeTimeout re-invokes idle keys as
    the watermark advances so buffered events flush without needing new
    data for that key. Emits (prev_type, next_type, next_ts); the
    consumer aggregates counts (stream or batch).

    State is keyed on hash(user_id) %% n_buckets, NOT on user_id: a
    per-user grouping pays the Arrow/pandas per-group overhead once per
    USER per micro-batch (~1 ms each — the dominant cost when keys are
    plentiful and small, measured 2x the whole replay wall time at
    sf0.1), while bucketing amortizes it over n_buckets groups and
    chains every user inside a bucket with one vectorized
    groupby-shift. Same correctness: a user's events all land in one
    bucket. Size n_buckets to saturate executors — state partitioning
    (and therefore cluster parallelism) follows the bucket key.

    Per-bucket state = each user's last emitted type + the (user, ts,
    id, type) buffer of events inside the watermark horizon — bounded
    by events per watermark interval, same bound every watermarked
    stateful op here carries. Events newer than (max event time -
    watermark delay) stay pending until the watermark passes them; on
    an unbounded stream that is the correct answer, and the replay test
    accounts for it explicitly."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "prev_type string, next_type string, next_ts timestamp"
    # the event buffer is ONE pickled-numpy blob, not per-element arrays:
    # state encode/decode walks every element of an array column, and in
    # a replay's first batch the buffer holds the whole fixture — the
    # blob form cuts state (de)serialization from per-event to per-bucket
    state_schema = "lt_user array<long>, lt_type array<string>, buf binary"

    def update(key, pdfs, state: GroupState):
        import pickle

        wm = state.getCurrentWatermarkMs()
        if state.exists:
            lt_user, lt_type, blob = state.get
            last_map = dict(zip(lt_user or [], lt_type or []))
            if blob:
                b_user, b_ts, b_eid, b_typ = pickle.loads(bytes(blob))
                users, tss, eids, typs = [b_user], [b_ts], [b_eid], [b_typ]
            else:
                users, tss, eids, typs = [], [], [], []
        else:
            last_map = {}
            users, tss, eids, typs = [], [], [], []
        for pdf in pdfs:
            if len(pdf):
                users.append(pdf["user_id"].to_numpy("int64"))
                # pin ns resolution before the int cast: Arrow may hand
                # pandas datetime64[us] or [ns] depending on version
                tss.append(
                    pdf["ts"].astype("datetime64[ns]").to_numpy("int64") // 1000
                )
                eids.append(pdf["event_id"].to_numpy("int64"))
                typs.append(pdf["event_type"].to_numpy(object))
        if users:
            user = np.concatenate(users)
            ts = np.concatenate(tss)
            eid = np.concatenate(eids)
            typ = np.concatenate(typs)
        else:
            user = np.empty(0, "int64")
            ts = np.empty(0, "int64")
            eid = np.empty(0, "int64")
            typ = np.empty(0, object)
        order = np.lexsort((eid, ts, user))
        user, ts, eid, typ = user[order], ts[order], eid[order], typ[order]
        flushed = ts // 1000 <= wm
        r_user, r_ts, r_typ = user[flushed], ts[flushed], typ[flushed]
        if len(r_user):
            # chain within each user: prev = row above when same user,
            # else that user's carried last_map entry (vectorized; the
            # per-event Python loop this replaces was the hot path)
            prev = np.empty(len(r_user), dtype=object)
            prev[1:] = r_typ[:-1]
            first_of_user = np.empty(len(r_user), dtype=bool)
            first_of_user[0] = True
            first_of_user[1:] = r_user[1:] != r_user[:-1]
            starts = np.flatnonzero(first_of_user)
            for i in starts:  # one hop per USER, not per event
                prev[i] = last_map.get(int(r_user[i]))
            keep = np.array([p is not None for p in prev[starts]])
            mask = np.ones(len(r_user), dtype=bool)
            mask[starts[~keep]] = False
            out = pd.DataFrame(
                {
                    "prev_type": prev[mask],
                    "next_type": r_typ[mask],
                    "next_ts": pd.to_datetime(pd.Series(r_ts[mask]), unit="us"),
                }
            )
            ends = np.r_[starts[1:] - 1, len(r_user) - 1]
            for i in ends:  # one hop per USER
                last_map[int(r_user[i])] = r_typ[i]
        else:
            out = pd.DataFrame(
                {
                    "prev_type": pd.Series(dtype="object"),
                    "next_type": pd.Series(dtype="object"),
                    "next_ts": pd.Series(dtype="datetime64[ns]"),
                }
            )
        pending = ~flushed
        blob = (
            pickle.dumps((user[pending], ts[pending], eid[pending], typ[pending]))
            if pending.any()
            else None
        )
        state.update((list(map(int, last_map.keys())), list(last_map.values()), blob))
        # wake this bucket on the next watermark advance even if no new
        # data arrives for it — that is what flushes the buffer
        state.setTimeoutTimestamp(wm + 1)
        yield out

    return (
        events.withWatermark("ts", watermark)
        .withColumn("__bucket", F.pmod(F.xxhash64("user_id"), F.lit(n_buckets)))
        .groupBy("__bucket")
        .applyInPandasWithState(
            update, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def deduped_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming dedup: emit the first arrival per key, drop re-deliveries
    (at-least-once source -> exactly-once-per-key output).

    ``dropDuplicatesWithinWatermark`` keys state on ``key_cols`` and —
    unlike plain ``dropDuplicates`` — evicts each key once the watermark
    passes its first-seen event time, so state is bounded by (keys per
    watermark interval), not by the stream's lifetime. That bound is what
    makes this viable on an unbounded 100 TB/day ingest feed."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def correlated_pairs_stream(
    events: DataFrame,
    *,
    left_type: str = "purchase",
    right_type: str = "error",
    gap: str = "5 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each ``left_type`` event paired with the
    same user's ``right_type`` events within ±``gap`` — the streaming twin
    of the batch ``range_join_bucketed`` query.

    Both sides carry a watermark and the join condition bounds event-time
    distance, so Spark can size the join state buffer: a row is held only
    until the opposite stream's watermark passes its admissible window,
    then evicted. Without the time bound the state would grow without
    limit — the bound is what makes stream-stream joins run forever."""
    left = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {gap}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {gap}"))
    )
    return left.join(right, cond, "inner").select(
        "purchase_id",
        "error_id",
        F.round(
            (F.col("l_ts").cast("double") - F.col("r_ts").cast("double")), 3
        ).alias("gap_sec"),
    )


def enriched_stream(
    events: DataFrame,
    profiles: DataFrame,
    *,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static join: enrich each arriving event with a static
    profile/feature table — the online feature-lookup pattern (batch-
    computed user features served against the live stream).

    The static side is broadcast per micro-batch (hinted explicitly:
    profile tables are dim-sized), so the stream side never shuffles and
    no join state accumulates — unlike stream-stream joins, stream-static
    joins are stateless. If the profile table outgrows broadcast range,
    pre-bucket it by the key and drop the hint: the per-batch join
    becomes a bucket-local sort-merge."""
    return events.join(F.broadcast(profiles), key, "left")


def stream_upsert_sink(
    df: DataFrame,
    path: str,
    key_cols: list[str],
    partition_col: str,
    *,
    order_col: str | None = None,
    checkpoint: str | None = None,
) -> None:
    """Streaming ingest into a partitioned parquet store: each micro-batch
    is REPLACE-INTO-upserted at partition granularity via ``foreachBatch``
    + ``upsert_parquet_partitioned``.

    Delivery semantics: the streaming engine gives at-least-once batch
    delivery on retry; the key-level upsert makes redelivery idempotent,
    so the store converges to exactly-once per key — the standard
    streaming-into-lakehouse sink shape when no transaction log (Delta/
    Iceberg) is available. Each batch rewrites only the partitions it
    touches, so an unbounded ingest feed into a day-partitioned 100 TB
    store does O(batch) work per trigger, not O(store).

    ``availableNow`` trigger: drain everything currently in the source,
    then stop — the replay-to-parity mode the tests use; a production
    deployment would use a processing-time trigger and a durable
    ``checkpoint``.
    """
    from ..sources.loaders import upsert_parquet_partitioned

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # The batch plan would otherwise recompute for the emptiness
        # check, the touched-partition collect, and the merge write —
        # persist once per trigger, release before the next.
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            upsert_parquet_partitioned(
                batch_df, path, key_cols, partition_col, order_col=order_col
            )
        finally:
            batch_df.unpersist()

    writer = df.writeStream.foreachBatch(_sink).trigger(availableNow=True)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    q = writer.start()
    q.awaitTermination()


def replay_events_multibatch(
    spark: SparkSession,
    sf_dir: str,
    build,
    *,
    n_batches: int = 10,
    output_mode: str = "append",
    table: str = "__multibatch_replay",
    state_store_provider: str | None = None,
) -> dict:
    """Rate-limited replay measuring STEADY-STATE per-batch cost
    (VERDICT r3 #7): split the fixture into ``n_batches`` time-range
    files and stream them one per micro-batch (maxFilesPerTrigger=1
    under availableNow), so the run exercises repeated watermark
    advances and incremental state churn instead of one giant first
    batch — the number that matters on an unbounded stream.

    Files are written with ``repartitionByRange(ts)`` so each
    micro-batch is a later time slice (ascending part numbers AND
    ascending forced mtimes — the file source's ordering either way);
    in-order slices keep the watermark monotone so the emitted output
    still equals the batch twin over the ≤-final-watermark prefix.

    ``state_store_provider='rocksdb'`` runs the replay on the RocksDB
    state store (the production backend for large state; Spark bundles
    rocksdbjni) — the provider class is fixed at the query's first
    checkpoint, and each replay starts a fresh query, so a scoped conf
    around start() is sufficient and nothing leaks to the session.

    Returns per-batch progress: input rows, trigger wall ms, state rows."""
    import contextlib
    import json as _json
    import os
    import shutil
    import tempfile
    import time

    from ..session import scoped_conf
    from ..sources.loaders import load_table

    providers = {
        "rocksdb": "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    }
    if state_store_provider is not None and state_store_provider not in providers:
        raise ValueError(f"unknown state_store_provider: {state_store_provider!r}")

    dest = tempfile.mkdtemp(prefix="events_ranged_")
    try:
        ev = load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        ev.repartitionByRange(n_batches, "ts").write.mode("overwrite").parquet(dest)
        parts = sorted(f for f in os.listdir(dest) if f.endswith(".parquet"))
        base = time.time()
        for i, f in enumerate(parts):
            os.utime(os.path.join(dest, f), (base + i, base + i))
        schema = (
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", "1")
            .load(dest)
        )
        scope = (
            scoped_conf(
                spark,
                **{
                    "spark.sql.streaming.stateStore.providerClass": providers[
                        state_store_provider
                    ]
                },
            )
            if state_store_provider is not None
            else contextlib.nullcontext()
        )
        with scope:
            q = (
                build(stream)
                .writeStream.outputMode(output_mode)
                .format("memory")
                .queryName(table)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        batches = []
        peak = 0
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = _json.loads(p.json)
            batches.append(
                {
                    "input_rows": int(p.get("numInputRows") or 0),
                    "trigger_ms": int((p.get("durationMs") or {}).get("triggerExecution") or 0),
                }
            )
            for so in p.get("stateOperators") or []:
                peak = max(peak, int(so.get("numRowsTotal") or 0))
        return {
            "n_batches": len(batches),
            "peak_state_rows": peak,
            "batches": batches,
            "table": table,
        }
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def run_stream_to_table(df: DataFrame, name: str, *, output_mode: str = "append") -> dict:
    """Drive a streaming frame to completion over the (finite) fixture and
    land results in an in-memory table ``name`` — availableNow semantics:
    process everything currently in the source, then stop.

    Returns run metrics scraped from the query progress — peak state-store
    rows and micro-batch count — so benches can report the state footprint
    alongside wall time (VERDICT r2 #4)."""
    import json as _json

    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    peak = 0
    progress = q.recentProgress
    for p in progress:
        if not isinstance(p, dict):
            p = _json.loads(p.json)
        for so in p.get("stateOperators") or []:
            peak = max(peak, int(so.get("numRowsTotal") or 0))
    return {"peak_state_rows": peak, "n_batches": len(progress)}
