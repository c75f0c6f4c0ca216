"""Structured Streaming coverage in the correctness gate.

AvailableNow over a static input is deterministic (every file processed in
this run, no late data), so the streaming windowed aggregate must equal
the equivalent batch GROUP BY — which is exactly what the DuckDB oracle
states. This pins the watermark/window semantics, not just "it runs".
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.localframe import local_df
from wopen_spark.queries.registry import query
from wopen_spark.streaming.pipeline import available_now_aggregate


@query(
    "streaming_hourly_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def streaming_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows with a watermark, executed as an
    AvailableNow streaming query over the events file; a fresh checkpoint
    per call reprocesses the full (static) input."""
    ckpt = tempfile.mkdtemp(prefix="wopen_stream_ckpt_")
    out = available_now_aggregate(spark, sf_dir, ckpt, window="1 hour")
    return out.orderBy("window_start", "event_type")


# Shared by both stateful-API variants: the session fixpoint is the
# semantics; the operator API (applyInPandasWithState vs Spark 4's
# transformWithStateInPandas) is an implementation knob, so both gate
# against the SAME SQL statement.
_SESSIONS_ORACLE = """
    WITH ev AS (
      SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
      FROM events
    ),
    gaps AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    ),
    agg AS (
      SELECT user_id, sid,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM sess GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events, total_value,
           sid < MAX(sid) OVER (PARTITION BY user_id) AS closed
    FROM agg
    ORDER BY user_id, session_start
    """


@query("streaming_user_sessions", oracle=_SESSIONS_ORACLE)
def streaming_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState) in the gate: gap
    sessionization over the events stream, AvailableNow. One static file =
    one micro-batch, so the emitted sessions must equal batch
    sessionization with the open (last) session flagged closed=false —
    which is what the SQL oracle states.

    Production note (r7 verdict #5): for PLAIN gap sessions the
    JVM-native ``session_window_stats`` query is the 100 TB default
    (~3x faster at sf10); this operator is the template for stateful
    logic session_window can't express."""
    from wopen_spark.streaming.stateful import sessionize_available_now

    ckpt = tempfile.mkdtemp(prefix="wopen_sess_ckpt_")
    out = sessionize_available_now(spark, sf_dir, ckpt, gap_seconds=1800)
    return out.orderBy("user_id", "session_start")


# NOT registered: Spark 4's transformWithStateInPandas sessionizer
# (wopen_spark.streaming.stateful.sessionize_tws) shares the fold core
# and would gate against _SESSIONS_ORACLE, but the operator's state
# protocol requires google.protobuf, which this container does not ship
# (verified: the TWS driver worker crashes with ImportError at stream
# start). The operator + its oracle parity test live behind a
# dependency skip (tests/test_streaming_multibatch.py) — same honest
# boundary as the PyAV-gated media decodes.


@query(
    "streaming_click_purchase_join",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             event_type
      FROM events
    )
    SELECT c.user_id AS user_id, c.event_id AS click_id,
           p.event_id AS purchase_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM ev c JOIN ev p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 600 SECONDS
    ORDER BY c.user_id, click_id, purchase_id
    """,
)
def streaming_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (clicks x purchases within
    10 minutes), AvailableNow: append output must equal the batch interval
    join. State is expirable because both sides are watermarked and the
    condition bounds event time both ways."""
    from wopen_spark.streaming.pipeline import available_now_interval_join

    ckpt = tempfile.mkdtemp(prefix="wopen_ssjoin_ckpt_")
    out = available_now_interval_join(spark, sf_dir, ckpt, window_s=600)
    return out.orderBy("user_id", "click_id", "purchase_id")


@query(
    "streaming_distinct_user_types",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
)
def streaming_distinct_user_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: dropDuplicatesWithinWatermark
    over (user_id, event_type). One static file = one micro-batch, so the
    append-mode output must equal batch DISTINCT."""
    from wopen_spark.streaming.pipeline import available_now_distinct

    ckpt = tempfile.mkdtemp(prefix="wopen_dedup_ckpt_")
    out = available_now_distinct(spark, sf_dir, ckpt)
    return out.orderBy("user_id", "event_type")


@query(
    "streaming_segment_revenue",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
    """,
)
def streaming_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the purchase stream enriched with the
    broadcast customer dim, aggregated per market segment — the third
    streaming join shape (beyond stream-stream interval join and
    stateful sessionization). One micro-batch (AvailableNow) must equal
    the batch join, which is exactly what the oracle asserts."""
    from wopen_spark.streaming.pipeline import available_now_stream_static_join

    ckpt = tempfile.mkdtemp(prefix="wopen_stream_ckpt_")
    return (
        available_now_stream_static_join(spark, sf_dir, ckpt)
        .orderBy("segment")
    )


@query(
    "streaming_sliding_counts",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, make_timestamp(epoch_ns(ts) // 1000)) AS b30,
             event_type, value
      FROM events
    ),
    w AS (
      SELECT unnest([b30, b30 - INTERVAL 30 MINUTE]) AS window_start,
             event_type, value
      FROM b
    )
    SELECT window_start, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM w GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (1h every 30min) in Structured
    Streaming: each event expands into its two covering windows inside
    the streaming aggregate, state bounded by the watermark horizon.
    AvailableNow over the static file must equal the batch bucket
    derivation the oracle states (window starts covering t are
    bucket30(t) and bucket30(t) - 30min)."""
    ckpt = tempfile.mkdtemp(prefix="wopen_stream_ckpt_")
    out = available_now_aggregate(
        spark,
        sf_dir,
        ckpt,
        window="1 hour",
        slide="30 minutes",
        query_name="wopen_sliding_counts",
    )
    return out.orderBy("window_start", "event_type")


@query(
    "topic_exactly_once_ingest",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE event_id % 200 = 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def topic_exactly_once_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-tracked topic consumption, end-to-end exactly-once: a 0.5%
    sample of events is produced into a 2-partition FileTopic across
    THREE segments, loaded into a SnapshotTable by TopicLoader in two
    micro-batch rounds, then the loader is rerun with no new data AND a
    committed batch is replayed directly through the transactional sink.
    If any of those re-deliveries duplicated a single row, the aggregate
    below would double-count and the oracle hash would catch it — the
    exactly-once contract is what this query value-checks.

    The producer side (``produce_df``) stands in for the external system
    that writes the topic in production — records flow to segments from
    EXECUTOR tasks (no driver collect; r8 hygiene finding #1); the
    ENGINE side — offset algebra, segment-name pruning, distributed json
    scan, transactional commit — is the code under test. Mirrors the
    reference's per-date ledger gate (get_similarity.py:89-103) at
    streaming cadence.
    """
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import types as T

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.streaming.topic import FileTopic, TopicLoader

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select("event_id", "user_id", "event_type", "value")
        # partition by user (Kafka key-hash analogue)
        .withColumn("_p", (F.col("user_id") % 2).cast("int"))
    )
    root = tempfile.mkdtemp(prefix="wopen_topic_")
    topic = FileTopic(f"{root}/events_topic", partitions=2)
    # three segments: p0 split in half (by event_id halves — deterministic
    # where the old collect-order cut was not), p1 whole; partition 0
    # gains its SECOND segment later. ONE window pass, persisted across
    # the two produce rounds; zero record bytes on the driver.
    tiled = ev.withColumn(
        "_half",
        F.ntile(2).over(Window.partitionBy("_p").orderBy("event_id")),
    ).persist()
    topic.produce_df(
        tiled.filter((F.col("_p") == 1) | (F.col("_half") == 1)).drop("_half"),
        "_p",
    )

    table = SnapshotTable(spark, f"{root}/ingested")
    table.create(local_df(spark, [], schema))
    loader = TopicLoader(topic, table, group="ingest", schema=schema)
    loader.run_once(spark)  # round 1: p0 partial + p1 full
    # late second segment for partition 0
    topic.produce_df(
        tiled.filter((F.col("_p") == 0) & (F.col("_half") == 2)).drop("_half"),
        "_p",
    )
    tiled.unpersist()
    loader.run_once(spark)  # round 2: only the new p0 range loads
    loader.run_once(spark)  # no new data: must be a no-op
    # crash-replay: re-deliver round 1's already-committed p1 batch
    # straight through the sink with its original txn version
    replay = topic.read(spark, 1, 0, topic.head(1), schema).select(
        *[f.name for f in schema.fields]
    )
    table.append(replay, txn_app="ingest/p1", txn_version=topic.head(1))

    return (
        table.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "streaming_upsert_topic",
    oracle="""
    WITH sampled AS (
      SELECT event_id, user_id, event_type, value FROM events
      WHERE event_id % 100 = 0
    ),
    latest AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rk
      FROM sampled
    )
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           CAST(round(value * 100) AS BIGINT) AS last_value_cents
    FROM latest WHERE rk = 1
    ORDER BY user_id
    """,
)
def streaming_upsert_topic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compacted-topic materialization, end-to-end exactly-once: a 1%
    event sample is produced into a 2-partition FileTopic (partitioned
    by user — the Kafka key-hash contract) across staggered segments; an
    UpsertTopicLoader drains it in MULTIPLE micro-batch rounds, each
    batch reduced to its newest record per user and applied with one
    multi-clause dv merge (update only when ``s.event_id >= t.event_id``,
    else insert — so replays and out-of-order segments can never regress
    state). After catch-up the loader reruns (must be a no-op) AND a
    committed batch is re-merged directly with its original txn version
    (must be rejected by the high-water mark). The table then holds the
    latest event per user — value-checked against the oracle's window
    ranking over the same sample. This is the streaming CDC-upsert sink
    shape: per-batch cost O(changed rows), zero file rewrites."""
    import tempfile

    from pyspark.sql import Window
    from pyspark.sql import types as T

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.streaming.topic import FileTopic, UpsertTopicLoader

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # partition by user = key-sticky, as Kafka would; segments split at
    # event_id-rank cuts so they replay the stream's real arrival order.
    # Producer runs EXECUTOR-side (produce_df — no driver collect, r8
    # hygiene finding #1); only the 2-row count probe touches the driver.
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 100 == 0)
        .select("event_id", "user_id", "event_type", "value")
        .withColumn("_p", (F.col("user_id") % 2).cast("int"))
    )
    # thirds by event_id order: p0 ships its first third up front, p1 its
    # first two thirds — ONE window pass, persisted across the two
    # produce rounds
    tiled = ev.withColumn(
        "_tile",
        F.ntile(3).over(Window.partitionBy("_p").orderBy("event_id")),
    ).persist()
    early = F.when(F.col("_p") == 0, F.col("_tile") == 1).otherwise(
        F.col("_tile") <= 2
    )
    root = tempfile.mkdtemp(prefix="wopen_upsert_topic_")
    topic = FileTopic(f"{root}/user_state", partitions=2)
    topic.produce_df(tiled.filter(early).drop("_tile"), "_p")

    table = SnapshotTable(spark, f"{root}/user_latest")
    table.create(local_df(spark, [], schema), cluster_by=["user_id"])
    loader = UpsertTopicLoader(
        topic, table, group="upsert", schema=schema,
        key="user_id", order_col="event_id",
    )
    r1 = loader.run_once(spark)  # round 1: both partitions partial
    assert set(r1) == {0, 1}, r1
    # late tails for both partitions
    topic.produce_df(tiled.filter(~early).drop("_tile"), "_p")
    tiled.unpersist()
    r2 = loader.run_once(spark)
    assert set(r2) == {0, 1}, r2
    assert loader.run_once(spark) == {}, "caught-up loader must be a no-op"
    # crash-replay: re-merge round 1's committed p0 batch with its
    # original txn version — the high-water mark must reject it
    v_before = table.latest_version()
    replay = topic.read(spark, 0, 0, r1[0][1], schema).select(
        *[f.name for f in schema.fields]
    )
    rep = table.merge_into(
        replay.dropDuplicates(["user_id"]),
        "user_id",
        not_matched=[{"action": "insert", "cond": None}],
        txn_app="upsert/p0",
        txn_version=r1[0][1],
    )
    assert rep.get("replayed") and table.latest_version() == v_before

    return (
        table.read()
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value") * 100).cast("long").alias("last_value_cents"),
        )
        .orderBy("user_id")
    )


@query(
    "streaming_snapshot_sink",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM events
    WHERE event_id % 250 = 0
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def streaming_snapshot_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table format as a STANDARD Structured Streaming sink: a
    0.4% event sample flows topic -> readStream ->
    ``writeStream.format("wopen_snapshot")`` with an AvailableNow
    trigger; each micro-batch lands as one atomic log commit keyed
    (txnApp, epoch). The stream then RERUNS against a FRESH checkpoint —
    epoch ids restart at zero, and the table's transaction high-water
    mark must reject every replayed epoch (asserted: version unchanged).
    If one replayed row landed, the aggregate below would double-count
    and the oracle hash would catch it. Zero user sink code — the same
    exactly-once contract topic_exactly_once_ingest proves for the
    foreachBatch path, through Spark's native sink API."""
    import tempfile

    from pyspark.sql import types as T

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.streaming.topic import FileTopic

    register_snapshot_datasource(spark)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # producer stand-in runs executor-side (produce_df, no driver
    # collect — r8 hygiene finding #1)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 250 == 0)
        .select("event_id", "event_type", "value")
        .withColumn(
            "_p",
            F.when(F.col("event_id") % 500 == 0, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int"),
        )
    )
    root = tempfile.mkdtemp(prefix="wopen_stream_sink_")
    topic = FileTopic(f"{root}/feed", partitions=2)
    topic.produce_df(ev, "_p")

    sink_path = f"{root}/landed"

    def run(ckpt: str) -> None:
        q = (
            topic.stream(spark, schema)
            .select("event_id", "event_type", "value")
            .writeStream.format("wopen_snapshot")
            .option("txnApp", "events-sink")
            .option("checkpointLocation", f"{root}/{ckpt}")
            .option("path", sink_path)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    run("ck1")
    t = SnapshotTable(spark, sink_path)
    v = t.latest_version()
    run("ck2")  # fresh checkpoint: every epoch replays and must bounce
    assert t.latest_version() == v, "replayed epochs must commit nothing"

    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .orderBy("event_type")
    )
