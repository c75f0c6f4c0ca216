"""Structured Streaming equivalents of the reference's daily micro-batch.

The reference's "stream" is a cron loop with per-date idempotence checks
(README.md:21-25, get_similarity.py:89-103). The Spark-native shapes:

- ``Trigger.AvailableNow`` batch-over-stream: process everything new since
  the checkpoint, then stop — exactly the cron-with-ledger semantics, but
  the ledger is the checkpoint and scales to file streams of any size.
- Watermarked windowed aggregation for event-time rollups with late data.

Tested against the events table (a file stream of its parquet); at
cluster scale the same code points at an object-store directory or Kafka.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Broadcast a stream-static dim only below this on-disk size — the same
# estimate Spark's autoBroadcastJoinThreshold applies to file relations
# (64 MB, matching the session default). Module-level so tests can
# simulate a 100x dim by zeroing it.
_STREAM_DIM_BROADCAST_MAX_BYTES = 64 * 1024 * 1024


def await_available_now(q, timeout_s: int = 3600) -> None:
    """Block until an AvailableNow query actually TERMINATES.

    ``awaitTermination(120)`` returns False on timeout without stopping
    the query — the caller then reads the memory sink while micro-batches
    are still committing and silently gets a PARTIAL result (first
    reachable at sf10, where the 60M-event sessionizer legitimately runs
    past 120 s). AvailableNow guarantees termination once the snapshot of
    input is drained, so the only reason to ever hit the bound is a hung
    stream — make that loud: stop the query and raise instead of racing
    its sink."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"AvailableNow query {q.name!r} still running after {timeout_s}s"
        )


# One batch-reader probe per (application, sf_dir): resolved ts dtype,
# table-dir-vs-single-file layout, and Catalyst's relation-size estimate.
# The streaming family calls event_stream / _suggest_state_partitions
# 10+ times per suite (the interval join alone probes three times), and
# each un-memoized probe is a driver-side parquet footer read + file
# listing — measured ~1 s of the interval-join cell at sf0.1. Same
# staleness contract as registry._PER_DISTINCT_COUNT_CACHE: sources are
# immutable snapshots for the process; a long-lived service re-ingesting
# under the same path should clear this at ingest boundaries. Keyed on
# applicationId with dead-app eviction so session restarts re-probe and
# the dict cannot grow without bound.
_SOURCE_PROBE_CACHE: dict[tuple[str, str], tuple[str, bool, int | None]] = {}


def _probe_events_source(
    spark: SparkSession, sf_dir: str
) -> tuple[str, bool, int | None]:
    """Probe ``sf_dir/events.parquet`` once per session: returns
    ``(resolved_ts_dtype, is_table_dir, size_bytes)``.

    ``size_bytes`` is Catalyst's own file-index relation estimate (the
    number broadcast planning uses — any Hadoop FS, zero jobs), or None
    when the private stats path is unavailable (warned loudly once — a
    silent fallback would quietly re-regress sf10 stateful queries to
    the capped partition default).

    Raises whatever the batch reader raises for a missing/non-parquet
    source — callers decide whether that's fatal (a stream must fail)
    or a soft default (partition sizing).
    """
    import os
    import warnings

    app = spark.sparkContext.applicationId
    key = (app, sf_dir)
    hit = _SOURCE_PROBE_CACHE.get(key)
    if hit is not None:
        return hit
    for stale in [k for k in _SOURCE_PROBE_CACHE if k[0] != app]:
        del _SOURCE_PROBE_CACHE[stale]

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, "events.parquet")
    batch = spark.read.parquet(path)
    resolved = dict(batch.dtypes).get("ts", "timestamp_ntz")
    # two on-disk layouts: testdata keeps events.parquet as a single FILE
    # inside sf_dir (stream the dir, glob-filter the leaf name),
    # benchdata/production write it as a Spark table DIRECTORY whose
    # leaves are part-*.parquet — a leaf-name glob of "events.parquet"
    # there matches NOTHING and the stream silently reads zero rows
    # (caught by the r7 sf1 oracle gate), so stream the directory itself.
    # Layout is detected from the batch read's resolved leaf files, which
    # works on ANY Hadoop filesystem (s3a/hdfs/abfs) — an os.path.isdir
    # probe would be local-only and silently pick the zero-row glob
    # branch on object stores; empty-table fallback keeps the local stat.
    leaves = batch.inputFiles()
    is_table_dir = (
        any("events.parquet/" in f for f in leaves)
        if leaves
        else os.path.isdir(path)
    )
    try:
        # Private py4j path (no public driver-side stats API in PySpark);
        # a Spark version bump breaking it must be LOUD, not a silent
        # fall-back to the 16-partition cap that re-regresses sf10.
        size = int(batch._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception as exc:  # noqa: BLE001 — warn then default
        warnings.warn(
            "per-core state-partition sizing unavailable (private "
            f"optimizedPlan().stats() path failed: {exc!r}); falling back "
            "to the capped default — large stateful queries may regress",
            RuntimeWarning,
            stacklevel=2,
        )
        size = None
    probe = (resolved, is_table_dir, size)
    _SOURCE_PROBE_CACHE[key] = probe
    return probe


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as a file stream (one file today; a directory that
    keeps growing in production — the checkpoint tracks processed files).

    The generated events file has stored ``ts`` as TIMESTAMP(NANOS) in
    some testdata versions (readable only as nanos-as-long) and as
    microsecond TIMESTAMP_NTZ in others. A stream needs an explicit
    schema, so probe the batch reader's resolved type once (footer-only,
    no data scan) and build the matching stream schema; either way the
    stream exposes ``ts`` as a session-TZ TimestampType for
    watermarks/windows — mirroring queries.registry._t.
    """
    import os

    path = os.path.join(sf_dir, "events.parquet")
    resolved, is_table_dir, _ = _probe_events_source(spark, sf_dir)

    def _reader(schema):
        if is_table_dir:
            return spark.readStream.schema(schema).parquet(path)
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    if resolved == "bigint":  # TIMESTAMP(NANOS) via nanos-as-long
        raw = _reader(_events_schema(T.LongType()))
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ts_type = (
        T.TimestampNTZType() if resolved == "timestamp_ntz" else T.TimestampType()
    )
    raw = _reader(_events_schema(ts_type))
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> DataFrame:
    """Event-time windowed counts with a late-data watermark — tumbling
    by default, SLIDING when ``slide`` is given (each event expands into
    its covering windows map-side; state is windows-per-horizon, still
    bounded by the watermark). Partial aggregation happens per
    micro-batch."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


class _state_partitions:
    """Pin the stateful-shuffle partition count for one streaming query.

    The state store creates one provider (RocksDB/HDFS dir, pandas
    worker) PER shuffle partition PER micro-batch; a session default
    sized for batch scans (or the vanilla 200) is pure fixed overhead
    when the keyed state is small. The partition count is locked into
    the plan at query start, so setting it around ``start()`` and
    restoring afterwards leaves the session's batch queries untouched.
    At real scale callers pass ``n`` ~ total executor cores; the
    sf_dir-aware entry points pass ``_suggest_state_partitions`` so big
    inputs get one partition per core (the 16 cap halved the sf10
    sessionizer: 101.5 s capped vs 74.7 s per-core) while small inputs
    keep the cap (per-core providers cost the sf0.1 family +8 s)."""

    def __init__(self, spark: SparkSession, n: int | None):
        self.spark = spark
        self.n = n or min(int(spark.sparkContext.defaultParallelism), 16)

    def __enter__(self):
        self.saved = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.saved)


# Per-core state partitioning pays off above this input size; below it
# the per-partition provider overhead dominates. 64 MB compressed ≈ tens
# of millions of event rows at this schema's zstd ratio.
_STATE_PER_CORE_MIN_BYTES = 64 * 1024 * 1024


def _suggest_state_partitions(spark: SparkSession, sf_dir: str) -> int | None:
    """State-partition count sized to the INPUT, decided driver-side with
    ZERO jobs: Catalyst's own relation-size estimate (the number its
    broadcast planning uses — file-index metadata, any Hadoop FS). A
    state store creates one provider per partition per micro-batch, so
    per-core partitioning only pays for itself once the stateful shuffle
    is large. Measured on 32 cores: the 60M-event sessionizer needs
    per-core (101.5 -> 74.7 s), while per-core on the 600k-event family
    costs +8 s of pure provider overhead. None (-> the capped default)
    when the source can't be sized."""
    try:
        _, _, size = _probe_events_source(spark, sf_dir)
    except Exception:  # noqa: BLE001 — non-parquet/missing source: default
        return None
    if size is not None and size >= _STATE_PER_CORE_MIN_BYTES:
        return int(spark.sparkContext.defaultParallelism)
    return None


def available_now_aggregate(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    slide: str | None = None,
    query_name: str = "wopen_windowed_counts",
) -> DataFrame:
    """Run the windowed aggregate over everything not yet processed, then
    stop (AvailableNow) — the engine's replacement for the reference's
    cron + partition-ledger loop. Returns the result of this run from the
    in-memory sink."""
    agg = windowed_counts(event_stream(spark, sf_dir), window=window, slide=slide)
    with _state_partitions(spark, _suggest_state_partitions(spark, sf_dir)):
        q = (
            agg.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q)
    return spark.table(query_name)


def available_now_interval_join(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    window_s: int = 600,
    watermark: str = "2 hours",
    stream_factory=None,
) -> DataFrame:
    """Stream-stream inner join with a time-interval condition: each click
    joined to the same user's purchases within ``window_s`` seconds after
    it.

    Both sides carry watermarks and the join condition bounds event time
    in both directions — the two requirements that let Spark expire join
    state (unbounded stream-stream state is the 100 TB trap). AvailableNow
    over the static file is one micro-batch, so the append-mode output
    must equal the batch interval join the oracle states.

    ``stream_factory`` overrides the source (tests feed a 3-file sequenced
    directory with maxFilesPerTrigger=1 to exercise cross-batch join state
    and watermark-driven eviction over >1 micro-batch).
    """
    make = stream_factory or (lambda: event_stream(spark, sf_dir))
    clicks = (
        make()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        make()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        F.expr(
            f"user_id = p_user AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + interval {window_s} seconds"
        ),
    ).select(
        "user_id",
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("purchase_ts")) - F.unix_micros(F.col("click_ts"))).alias(
            "gap_us"
        ),
    )
    with _state_partitions(spark, _suggest_state_partitions(spark, sf_dir)):
        q = (
            joined.writeStream.format("memory")
            .queryName("wopen_stream_interval_join")
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q)
    return spark.table("wopen_stream_interval_join")


def available_now_to_table(
    spark: SparkSession,
    sf_dir: str,
    table,
    checkpoint_dir: str,
    partition_field: str = "date_extract",
) -> list[str]:
    """Land the event stream into a date-partitioned warehouse Table via
    ``foreachBatch`` — the streaming twin of the K2 idempotent sink.

    Each micro-batch is split by event date and written with dynamic
    partition overwrite, so a replayed batch (checkpoint recovery)
    rewrites the same partitions instead of appending duplicates:
    end-to-end effectively-once without a transactional sink. Returns the
    partition values written by this run.
    """
    written: list[str] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        days = [
            r.d
            for r in batch_df.select(
                F.date_format("ts", "yyyy-MM-dd").alias("d")
            )
            .distinct()
            .collect()
        ]
        for day in sorted(days):
            rows = batch_df.filter(F.date_format("ts", "yyyy-MM-dd") == day)
            table.write_partition(day, partition_field, rows)
            written.append(day)

    with _state_partitions(spark, _suggest_state_partitions(spark, sf_dir)):
        q = (
            event_stream(spark, sf_dir)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q)
    return written


def available_now_distinct(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup on a key set — dropDuplicatesWithinWatermark
    keeps per-key state only until the watermark passes the key's event
    time, so state is bounded at any input size (the unbounded-state
    dropDuplicates is the trap at 100 TB). AvailableNow over the static
    test file is one micro-batch, so the output must equal batch
    SELECT DISTINCT — which is what the oracle asserts."""
    keys = keys or ["user_id", "event_type"]
    stream = event_stream(spark, sf_dir)
    dedup = (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
        .select(*keys)
    )
    with _state_partitions(spark, _suggest_state_partitions(spark, sf_dir)):
        q = (
            dedup.writeStream.format("memory")
            .queryName("wopen_stream_distinct")
            .outputMode("append")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q)
    return spark.table("wopen_stream_distinct")


def available_now_stream_static_join(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of purchase events
    joins the STATIC customer dimension (broadcast when it fits — the dim
    is re-read per batch but never shuffled, and no join state
    accumulates, unlike stream-stream). The canonical "enrich the
    firehose with a dim table" shape; aggregates purchase value per
    market segment. AvailableNow over the static file is one
    micro-batch, so complete-mode output must equal the batch
    join+aggregate the oracle states.

    The broadcast hint is SIZE-GATED, not hard-coded (r5 verdict), and
    the gate is BYTES-based: the dim's on-disk parquet size is exactly
    the estimate Spark's own autoBroadcastJoinThreshold compares file
    relations against, so the hint engages iff Spark itself would
    consider the dim broadcastable (<= 64 MB on disk — a row-count gate
    tuned for clone-collapse frames wrongly demoted a few-MB customer
    dim at sf1). Driver-side os.stat only — no job, no stream
    interference. At a truly 100x-scale customer dimension the stream
    falls back to an unhinted stream-static join (per-batch shuffle)
    instead of OOMing every executor on the broadcast build."""
    import os

    dim_path = os.path.join(sf_dir, "customer.parquet")
    try:
        dim_bytes = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(dim_path)
            for f in files
            if f.endswith(".parquet")
        ) if os.path.isdir(dim_path) else os.path.getsize(dim_path)
    except OSError:
        # non-POSIX sf_dir (s3a/hdfs): no local stat — skip the hint and
        # let Spark's own size estimate decide the join strategy
        dim_bytes = None
    small = dim_bytes is not None and dim_bytes <= _STREAM_DIM_BROADCAST_MAX_BYTES

    purchases = event_stream(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    dim = spark.read.parquet(dim_path).select("c_custkey", "c_mktsegment")
    cust = F.broadcast(dim) if small else dim
    enriched = purchases.join(cust, purchases.user_id == cust.c_custkey).groupBy(
        F.col("c_mktsegment").alias("segment")
    )
    agg = enriched.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
    with _state_partitions(spark, _suggest_state_partitions(spark, sf_dir)):
        q = (
            agg.writeStream.format("memory")
            .queryName("wopen_stream_static_join")
            .outputMode("complete")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        await_available_now(q)
    return spark.table("wopen_stream_static_join")


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = 200,
    num_partitions: int | None = None,
) -> DataFrame:
    """LIVE continuous source (the built-in rate source) mapped to the
    events-table shape — the adapter that makes every downstream shape
    (watermarked windows, sessionization, joins, sinks) runnable against
    an unbounded stream with real processing-time triggers, not just
    AvailableNow over a static file. In production the identical
    downstream code points at Kafka/Kinesis; the rate source is the
    zero-dependency stand-in for soak and latency tests. Synthetic
    fields are deterministic functions of the monotonically increasing
    ``value``, so assertions on keyed state stay reproducible."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    raw = reader.load()
    types = F.array(F.lit("click"), F.lit("view"), F.lit("purchase"))
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 100).alias("user_id"),
        F.element_at(types, (F.col("value") % 3 + 1).cast("int")).alias("event_type"),
        (F.col("value") % 50).cast("double").alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
