"""Structured Streaming operators over the events stream (SURVEY §7
M2.6). The reference has no streaming concept (SURVEY §2.6); these are
the Spark-native stream versions of the batch queries in
``rs_query_engine_spark.queries`` — same logical plan, incremental
execution.

Batch/stream parity: ``hourly_agg_stream`` computes exactly
``queries.events_hourly_window``; the batch query is the oracle-checked
truth, and ``run_stream_to_memory`` lets tests drive the streaming
version over the same parquet and compare results (the classic
kappa-architecture check).

Scale notes: watermarks bound the window state store (without one, an
event-time grouped stream grows state forever); ``session_window``
state merges adjacent sessions per key. Shuffle partitioning of a
streaming agg is the same hash partitioning as batch — state lives
with the partition.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

D_PRICE = "decimal(12,2)"

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open the events parquet as a (bounded) stream — the same call
    shape works on an unbounded directory/Kafka source in production.

    The file-stream source requires a *directory* (it tails new files);
    the corpus ships a single file, so we expose it through a symlink
    directory — which is exactly the production layout (a drop
    directory of parquet files).

    Streaming readers cannot infer schemas, and how Spark surfaces the
    parquet TIMESTAMP(NANOS) ``ts`` column varies by version (bigint
    nanos on ≤3.5 with the legacy conf, ``timestamp_ntz`` on 4.1+).
    Probing the *batch* read of the same path gives the authoritative
    schema for this engine, and ``normalize_events_ts`` applies the
    matching conversion — guaranteeing batch/stream parity by
    construction. The probe reads only the parquet footer (no data)."""
    from rs_query_engine_spark.session import ensure_nanos_as_long
    from rs_query_engine_spark.sources.corpus import (
        _read_cached_schema,
        normalize_events_ts,
    )

    ensure_nanos_as_long(spark)
    src = f"{sf_dir}/events.parquet"
    # r18: probe through the corpus schema cache — same (sf_dir,
    # "events") key as every batch read of this path, so the footer
    # inference happens once per process, not once per stream start
    schema = _read_cached_schema(spark, sf_dir, "events").schema
    if os.path.isfile(src):
        # stable digest (not builtin hash(), which is per-process
        # randomized) so re-runs reuse the same shim dir instead of
        # leaking a new /tmp dir per process
        digest = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:16]
        shim = os.path.join(tempfile.gettempdir(), f"rsqes_stream_{digest}")
        os.makedirs(shim, exist_ok=True)
        link = os.path.join(shim, "events.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.abspath(src), link)
        src = shim
    raw = spark.readStream.schema(schema).format("parquet").load(src)
    return normalize_events_ts(raw)


def hourly_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation with a late-data watermark
    — the streaming twin of ``queries.events_hourly_window``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast(D_PRICE)).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = "5 minutes", watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (gap-based) — stateful streaming via
    ``session_window``; state for a user's open session merges as
    events arrive and closes ``gap`` after the last event."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count("event_id").alias("n_events"),
            F.sum(F.col("value").cast(D_PRICE)).cast("double").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def run_stream_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    state_partitions: int = 8,
    available_now: bool = False,
) -> DataFrame:
    """Drive a (bounded) streaming query to completion into an
    in-memory sink and return the result table — the test harness for
    batch/stream parity.

    ``state_partitions`` scopes ``spark.sql.shuffle.partitions`` for
    the stream's lifetime: a streaming query pins its state-store
    partition count at first start, and every partition costs a state
    store instance per stateful operator — size it to key cardinality
    (150 users here), not to the batch shuffle default.

    ``available_now`` switches the drain from ``processAllAvailable``
    to ``trigger(availableNow=True)`` + ``awaitTermination`` — REQUIRED
    for unbounded sources (rate / rate-micro-batch), where
    processAllAvailable would chase ever-newer offsets forever
    (measured); availableNow snapshots the available offset at start
    and terminates."""
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        writer = stream_df.writeStream.outputMode(output_mode).format(
            "memory"
        ).queryName(query_name)
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        try:
            if available_now:
                q.awaitTermination()
            else:
                q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def view_purchase_attribution_stream(
    events: DataFrame, attribution_window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each purchase attributed to the same
    user's views in the preceding ``attribution_window``.

    Both sides carry watermarks and the join condition bounds event
    time in both directions — the two requirements that let Spark
    evict join state (otherwise a stream-stream join buffers forever).
    State is hash-partitioned by user_id, same as the batch join's
    shuffle."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    ).withWatermark("view_ts", watermark)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    ).withWatermark("purchase_ts", watermark)
    return views.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {attribution_window}")),
    ).select("view_id", "purchase_id", "user_id", "view_ts", "purchase_ts")


def run_stream_to_parquet(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    state_partitions: int = 8,
    transform_fn=None,
) -> None:
    """Drive a (bounded) stream into parquet via ``foreachBatch`` —
    the production sink pattern.

    ``foreachBatch`` hands each micro-batch to ordinary batch-writer
    code, which is what enables exactly-once file output: the batch id
    is recorded in the checkpoint, so a retried batch overwrites its
    own ``_batch_id=N`` partition instead of appending duplicates
    (idempotent-by-partition). The checkpoint directory is the
    source-of-truth for restart offsets — at 100 TB it lives on the
    shared object store next to the output.

    ``transform_fn`` (optional, DataFrame -> DataFrame) runs as batch
    code on each micro-batch before the write — per-batch maintenance
    (e.g. the IVM partials reduce) composes with the same idempotent
    sink instead of duplicating it."""
    from pyspark.sql import functions as F

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out_df = transform_fn(batch_df) if transform_fn is not None else batch_df
        (
            out_df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(path)
        )

    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    watermark: str = "90 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication: keep the FIRST event per key,
    expiring key state once event time passes ``watermark`` — the
    streaming twin of ``SELECT DISTINCT``/``dropDuplicates``.

    ``dropDuplicatesWithinWatermark`` bounds the state store by keys
    seen within the watermark horizon (plain ``dropDuplicates`` on a
    stream grows state forever); at 100 TB/day the horizon — not the
    corpus — sizes the cluster's state. With a horizon wider than a
    bounded input, the result is exactly batch DISTINCT on the keys,
    which is what the oracle checks."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


# Late-arrival feed layout (``ensure_late_feed``): the corpus split
# into four drop-files whose EVENT-TIME order deliberately disagrees
# with ARRIVAL order — the scenario watermarks exist for. Tier bounds
# are event-time offsets from the corpus max; the watermark delay is
# chosen so the late tier STRADDLES the watermark standing when it
# arrives (some rows admitted, some dropped — both outcomes
# observable). The on-time feed is split into TWO batches because
# Spark's late-event filter lags the eviction watermark by one batch
# (the filter for batch N uses the watermark derived from data through
# batch N-2 — measured on 4.1, matching the ForLateEvents /
# ForEviction split of SPARK-40925): a late file arriving immediately
# after the watermark-advancing batch is never filtered, so the drop
# path needs the advancing batch to be TWO batches back.
LATE_TIER_A1_DAYS = 5  # on-time feed 1: ts in (mx-5d, mx-3d], arrives 1st
LATE_TIER_A2_DAYS = 3  # on-time feed 2: ts in (mx-3d, mx-2d], arrives 2nd
LATE_TIER_C_DAYS = 2  # catch-up feed: ts in (mx-2d, mx], arrives 4th
LATE_DELAY = "84 hours"  # watermark delay (3.5 days)


def ensure_late_feed(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the 4-file LATE-ARRIVAL drop directory for the
    events stream, once per corpus generation (same mtime+params-keyed
    atomic-install machinery as the index artifacts): tier0/tier1 =
    the on-time feed (event time ``(mx-5d, mx-3d]`` then
    ``(mx-3d, mx-2d]`` — two batches so the first one's watermark is
    in force for late filtering when the late file lands, see the
    layout comment above), tier2 = the LATE feed (everything older —
    it arrives third although its event time is oldest), tier3 = the
    catch-up feed (the newest two days — arrives last and advances the
    watermark far enough to finalize every earlier window). File
    mtimes are forced strictly increasing so the file-stream source
    (which orders by modification time) replays arrival order
    deterministically, one file per micro-batch.

    The single-scalar ``max(ts)`` collect is a bounded artifact-build
    cost (one row, once per corpus generation), not a per-query loop."""
    import shutil as _shutil
    from datetime import timedelta

    from rs_query_engine_spark.sources.artifacts import (
        artifact_root,
        install_artifact,
    )
    from rs_query_engine_spark.sources.corpus import normalize_events_ts

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    root = artifact_root(
        src,
        "latefeed",
        f"a1={LATE_TIER_A1_DAYS}|a2={LATE_TIER_A2_DAYS}|c={LATE_TIER_C_DAYS}",
    )
    feed = os.path.join(root, "feed")

    def complete(r: str) -> bool:
        d = os.path.join(r, "feed")
        try:
            return len([p for p in os.listdir(d) if p.endswith(".parquet")]) == 4
        except OSError:
            return False

    if complete(root):
        return feed
    ev = normalize_events_ts(spark.read.parquet(src))
    mx = ev.agg(F.max("ts")).collect()[0][0]
    a_lo = mx - timedelta(days=LATE_TIER_A1_DAYS)
    a_mid = mx - timedelta(days=LATE_TIER_A2_DAYS)
    a_hi = mx - timedelta(days=LATE_TIER_C_DAYS)
    tiers = [
        ("tier0", (F.col("ts") > a_lo) & (F.col("ts") <= a_mid)),
        ("tier1", (F.col("ts") > a_mid) & (F.col("ts") <= a_hi)),
        ("tier2", F.col("ts") <= a_lo),
        ("tier3", F.col("ts") > a_hi),
    ]

    def write(tmp: str) -> None:
        fd = os.path.join(tmp, "feed")
        os.makedirs(fd)
        for i, (name, pred) in enumerate(tiers):
            staging = os.path.join(tmp, f"_{name}")
            ev.filter(pred).coalesce(1).write.parquet(staging)
            part = [p for p in os.listdir(staging) if p.endswith(".parquet")][0]
            dst = os.path.join(fd, f"{name}.parquet")
            os.rename(os.path.join(staging, part), dst)
            _shutil.rmtree(staging)
            # arrival order = mtime order; any fixed base works (the
            # source ages files RELATIVE to the newest, so absolute
            # epoch values never trip maxFileAge)
            t = 1_700_000_000 + i * 10
            os.utime(dst, (t, t))

    install_artifact(root, "latefeed", src, write, complete)
    return feed


def ensure_hourly_agg_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Persisted streaming CHECKPOINT of the 1-hour windowed count
    over the late feed — the same operator ``stream_late_data_drop``
    replays to a memory sink (same window, delay, and aggregate; that
    query's oracle pins the emitted set, this checkpoint's state
    holds the complement) — built once per corpus generation via the
    standard atomic install; completeness = the batch-4 commit
    exists."""
    from rs_query_engine_spark.sources.artifacts import (
        artifact_root,
        install_artifact,
    )

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    root = artifact_root(src, "winaggckpt", f"delay={LATE_DELAY}|win=1h")
    ck = os.path.join(root, "ckpt")

    def complete(r: str) -> bool:
        return os.path.exists(os.path.join(r, "ckpt", "commits", "4"))

    if complete(root):
        return ck

    def write(tmp: str) -> None:
        feed = ensure_late_feed(spark, sf_dir)
        schema = spark.read.parquet(feed).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        agg = (
            stream.withWatermark("ts", LATE_DELAY)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
            )
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                agg.writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    install_artifact(root, "winaggckpt", src, write, complete)
    return ck


def ensure_state_reader_ready(spark: SparkSession) -> None:
    """Make ``spark.read.format("statestore")`` usable in THIS session.

    The state reader's partition tasks report to the session's
    StateStoreCoordinator RPC endpoint, but Spark only instantiates
    that endpoint when a streaming query starts — a fresh session
    reading a CACHED checkpoint artifact (built by an earlier
    process) fails with RpcEndpointNotFoundException (measured). One
    trivial availableNow rate→noop stream instantiates the
    coordinator; memoized per session."""
    if getattr(spark, "_rsqes_state_reader_ready", False):
        return
    df = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    q = (
        df.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark._rsqes_state_reader_ready = True


def view_purchase_late_join(stream: DataFrame) -> DataFrame:
    """The view→purchase attribution join pipeline over an events
    stream — ONE builder shared by the live replay query
    (``queries_staged_r10.stream_stream_join_late``) and the
    persisted checkpoint (:func:`ensure_join_checkpoint`), so the
    state the ``statestore`` reader inspects provably comes from the
    IDENTICAL operator the emitted-pairs oracle pins (the
    ``user_day_ttl_stream`` sharing precedent): both sides
    watermarked at ``LATE_DELAY``, purchases matched to the same
    user's views within the preceding 24 h."""
    views = (
        stream.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("vu"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", LATE_DELAY)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", LATE_DELAY)
    )
    return views.join(
        purchases,
        (F.col("vu") == F.col("user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr("INTERVAL 24 HOURS")
        ),
    ).select("user_id", "view_id", "purchase_id", "view_ts", "purchase_ts")


def ensure_join_checkpoint(spark: SparkSession, sf_dir: str) -> str:
    """Persisted streaming CHECKPOINT of the watermarked stream-stream
    view→purchase attribution join replayed over the 4-file late feed
    — the THIRD state layout the ``statestore`` reader exposes
    (``symmetricHashJoin``: per side, ``keyToNumValues`` +
    ``keyWithIndexToValue``; the reader merges each side's pair under
    ``option("joinSide", ...)``). The streaming pipeline is exactly
    ``queries_staged_r10.stream_stream_join_late``'s (same feed,
    watermark delay, and condition-derived retention bounds), so the
    buffered state at stream end is that query's replay arithmetic
    applied to the FINAL min-of-sides watermark: a view is retained
    while ``view_ts + 24 h >= wf``, a purchase while ``ts >= wf``
    (eviction at batch N uses the one-batch-lagged watermark —
    pinned in tests/unit/test_stream_join_eviction.py — and the
    trailing no-data batch applies the all-data watermark last).

    Built once per corpus generation via the standard mtime+params
    atomic install; completeness = the batch-4 commit exists."""
    from rs_query_engine_spark.sources.artifacts import (
        artifact_root,
        install_artifact,
    )

    src = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    root = artifact_root(src, "joinckpt", f"delay={LATE_DELAY}|bound=24h")
    ck = os.path.join(root, "ckpt")

    def complete(r: str) -> bool:
        return os.path.exists(os.path.join(r, "ckpt", "commits", "4"))

    if complete(root):
        return ck

    def write(tmp: str) -> None:
        feed = ensure_late_feed(spark, sf_dir)
        schema = spark.read.parquet(feed).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        joined = view_purchase_late_join(stream)
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            q = (
                joined.writeStream.outputMode("append")
                .format("noop")
                .option("checkpointLocation", os.path.join(tmp, "ckpt"))
                .start()
            )
            try:
                q.processAllAvailable()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    install_artifact(root, "joinckpt", src, write, complete)
    return ck
