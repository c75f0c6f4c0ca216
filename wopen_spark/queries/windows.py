"""Window-function queries (SURVEY §2.7 + streaming-ish event analytics).

The reference has no real window functions (top-1 via pre-filter, dedup
keep-last); a complete engine needs the full surface: running totals,
lag/lead gaps, sessionization, ranking. All express as Spark window specs
— one shuffle on the partition key, then sorted within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _dsum, _t, query


# Running total per user ordered by time: the cumulative sum runs in sort
# order on both engines; decimal accumulation keeps doubles bit-identical.
@query(
    "cumulative_value_per_user",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
    FROM events
    ORDER BY user_id, event_id
    """,
)
def cumulative_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
        )
        .orderBy("user_id", "event_id")
    )


# lag(): inter-event gap per user, averaged by event type.
@query(
    "avg_gap_by_event_type",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_gaps,
           CAST(SUM(CAST(gap_sec AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS avg_gap_sec
    FROM (
      SELECT event_type,
             floor(epoch(ts))::BIGINT - floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT AS gap_sec
      FROM events
    ) WHERE gap_sec IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def avg_gap_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_sec", gap)
        .filter(F.col("gap_sec").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            (F.sum(F.col("gap_sec").cast("decimal(28,0)")) / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_gap_sec"),
        )
        .orderBy("event_type")
    )


# Sessionization: gap > 30 min starts a new session — the batch analogue of
# the streaming session-window operator (see wopen_spark.streaming).
@query(
    "user_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN floor(epoch(ts))::BIGINT - floor(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))::BIGINT > 1800
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM gaps
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id ORDER BY user_id
    """,
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_session = F.when(
        prev_ts.isNull() | ((F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)) > 1800),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id")
        .agg(
            F.max("session_id").cast("long").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


# rank() with deterministic tiebreak: top-3 orders per priority class.
@query(
    "top3_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             RANK() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    ORDER BY o_orderpriority, rnk
    """,
)
def top3_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_orderpriority", "rnk")
    )


# Sliding frame: 7-row moving revenue over daily order totals.
@query(
    "moving_avg_daily_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS rev,
             COUNT(*) AS n
      FROM orders GROUP BY o_orderdate
    )
    SELECT d, CAST(rev AS DOUBLE) AS daily_revenue,
           CAST(SUM(rev) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS rev_7d,
           CAST(SUM(n) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_7d
    FROM daily ORDER BY d
    """,
)
def moving_avg_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
    return (
        daily.select(
            "d",
            F.col("rev").cast("double").alias("daily_revenue"),
            F.sum("rev").over(w).cast("double").alias("rev_7d"),
            F.sum("n").over(w).cast("long").alias("n_7d"),
        )
        .orderBy("d")
    )


# RANGE frame (value-based, unlike the ROWS frame above): a 30-DAY
# trailing window keeps its meaning when dates are sparse — ROWS 29
# PRECEDING would silently span months on a gappy series.
@query(
    "range_frame_trailing_revenue",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS rev
      FROM orders GROUP BY o_orderdate
    )
    SELECT d,
           CAST(SUM(rev) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 29 DAYS PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_30d
    FROM daily ORDER BY d
    """,
)
def range_frame_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("rev")
    )
    # numeric ordering key for rangeBetween: days since epoch
    days = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = Window.orderBy(days).rangeBetween(-29, 0)
    return daily.select(
        "d", F.sum("rev").over(w).cast("double").alias("rev_30d")
    ).orderBy("d")


# Null-safe equality join (<=>): null keys MATCH each other, unlike '='
# which drops them silently — the semantics SQL spells IS NOT DISTINCT
# FROM. Keys synthesized with nulls so the difference is exercised.
@query(
    "null_safe_join_counts",
    oracle="""
    WITH a AS (SELECT NULLIF(c_custkey % 7, 3) AS k FROM customer),
         b AS (SELECT NULLIF(s_suppkey % 7, 3) AS k FROM supplier)
    SELECT a.k, COUNT(*) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY a.k ORDER BY a.k NULLS FIRST
    """,
)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eqNullSafe (<=>) join semantics, aggregate-before-join: counting
    pairs per key only needs each side's per-key count multiplied, so
    both sides reduce FIRST (map-side combined) and the null-safe join
    runs over two key-cardinality tables — at sf10 the naive pair join
    materializes ~21e9 rows just to count them (54 s); this plan is
    ~1 s and identical by the oracle hash."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 7, F.lit(3)).alias("k"))
        .agg(F.count(F.lit(1)).alias("na"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.nullif(F.col("s_suppkey") % 7, F.lit(3)).alias("kb"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    return (
        c.join(F.broadcast(s), F.col("k").eqNullSafe(F.col("kb")))
        .select("k", (F.col("na") * F.col("nb")).alias("n_pairs"))
        .orderBy(F.col("k").asc_nulls_first())
    )


# NTILE bucketing: equal-frequency deciles of document quality — the
# curriculum-binning / difficulty-stratification primitive. NTILE needs a
# total order; partitioning by language keeps each sort local and
# parallel (the global-NTILE variant would funnel into one task — the
# per-group form is the one that scales).
@query(
    "doc_length_deciles",
    oracle="""
    WITH t AS (
      SELECT lang, doc_id, n_chars,
             NTILE(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT lang, decile, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM t GROUP BY lang, decile ORDER BY lang, decile
    """,
)
def doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    return (
        d.withColumn("decile", F.ntile(10).over(w))
        .groupBy("lang", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "decile")
    )


@query(
    "supplier_balance_percentiles",
    oracle="""
    SELECT s_suppkey,
           s_nationkey,
           round(PERCENT_RANK() OVER w, 6) AS bal_pct_rank,
           round(CUME_DIST() OVER w, 6) AS bal_cume_dist
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey)
    ORDER BY s_suppkey
    """,
)
def supplier_balance_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK and CUME_DIST within nation partitions — the relative-
    standing window functions (the remaining ranking-family coverage
    beyond row_number/rank/ntile). Partitioned on the nation key, so the
    sort is local and parallel; both are rounded to absorb last-ulp
    division differences."""
    s = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("bal_cume_dist"),
    ).orderBy("s_suppkey")


# NTILE: equi-count price quartiles WITHIN each order priority — the
# partitioned form is the scale-safe one (a global NTILE forces a
# single-partition sort; per-key it parallelizes across priorities).
@query(
    "ntile_price_quartiles",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             NTILE(4) OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders
    )
    SELECT o_orderpriority, quartile,
           COUNT(*) AS n_orders,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def ntile_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioning by priority alone caps parallelism at 5 tasks of
    |orders|/5 rows each (~19 s at sf10); bucketed_ntile sub-buckets each
    priority by $10k value ranges, ranks the sub-buckets in parallel,
    and reassembles the EXACT SQL NTILE from broadcast offsets."""
    from wopen_spark.operators.ranking import bucketed_ntile

    o = _t(spark, sf_dir, "orders")
    tiled = bucketed_ntile(
        o.select("o_orderpriority", "o_totalprice", "o_orderkey"),
        4,
        F.expr("cast(round(o_totalprice * 100) as bigint) div 1000000"),
        ["o_totalprice", "o_orderkey"],
        partition_cols=["o_orderpriority"],
        out="quartile",
    )
    return (
        tiled.select(
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "quartile",
        )
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("o_orderpriority", "quartile")
    )


@query(
    "acctbal_dense_rank_in_nation",
    oracle="""
    SELECT n.n_name AS nation, s.s_name AS supplier,
           CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           DENSE_RANK() OVER (
             PARTITION BY n.n_name
             ORDER BY CAST(round(s.s_acctbal * 100) AS BIGINT) DESC
           ) AS drnk
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    ORDER BY nation, drnk, supplier
    """,
)
def acctbal_dense_rank_in_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DENSE_RANK over exact cents per nation — equal balances share a
    rank with no gaps after ties (vs RANK), the right semantics for
    leaderboard tiers. Ranking on the scaled-long cents keeps the tie
    decision engine-exact; one window shuffle on the nation key."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("nation").orderBy(F.desc("acctbal_cents"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("s_name").alias("supplier"),
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_cents"),
        )
        .withColumn("drnk", F.dense_rank().over(w))
        .orderBy("nation", "drnk", "supplier")
    )


@query(
    "debounce_events",
    oracle="""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             floor(epoch(ts))::BIGINT
               - floor(epoch(LAG(ts) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id)))::BIGINT
               AS gap_sec
      FROM events
    ) WHERE gap_sec IS NULL OR gap_sec > 5
    ORDER BY event_id
    """,
)
def debounce_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: drop an event when the SAME user fired the SAME type
    within the previous 5 seconds — the standard double-click /
    retry-storm cleanup before behavioural analytics. Second-resolution
    gaps keep the threshold decision integer-exact on both engines.

    One window shuffle on (user, type); at 100 TB that key is fine-
    grained enough to spread, and no global ordering is ever needed."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("gap_sec", gap)
        .filter(F.col("gap_sec").isNull() | (F.col("gap_sec") > 5))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


@query(
    "event_type_runs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS island
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, island, COUNT(*) AS run_len
      FROM seq GROUP BY 1, 2, 3
    )
    SELECT event_type, run_len, COUNT(*) AS n_runs
    FROM runs GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's event stream (maximal runs of
    the same type), rolled into a (type, run length) histogram — the
    gaps-and-islands GROUPING form (customer_order_gaps covers the gap
    form). The two row_numbers share the user-keyed sort, so both
    windows plus the run aggregate ride ONE user exchange; only the tiny
    histogram reshuffles."""
    ev = _t(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type", "run_len")
        .agg(F.count(F.lit(1)).alias("n_runs"))
        .orderBy("event_type", "run_len")
    )


@query(
    "session_window_stats",
    oracle="""
    WITH us AS (
      SELECT user_id, ts, epoch_us(ts) AS t,
             CAST(round(value * 100) AS BIGINT) AS cents, event_id
      FROM events
    ),
    gaps AS (
      SELECT user_id, ts, t, cents,
             CASE WHEN LAG(t) OVER w IS NULL
                    OR t - LAG(t) OVER w >= 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM us
      WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
    ),
    sess AS (
      SELECT user_id, ts, cents,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window operator (dynamic gap-merged
    grouping inside one aggregate — no window-function pass at all),
    pinned against a lag-islands SQL re-derivation of its exact merge
    rule: an event extends the session iff it starts strictly before
    previous_ts + gap, so a gap of exactly 30min starts a NEW session.
    Bounds stay TIMESTAMP_NTZ end to end (no LTZ cast, no session-tz
    dependency); value sums ride exact cents. One shuffle on the
    grouping key — the cheapest sessionization Spark offers because the
    merge happens inside the aggregate operator, not a sort-window."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("sw")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_cents",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "sliding_hourly_event_stats",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS b30,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    w AS (
      SELECT unnest([b30, b30 - INTERVAL 30 MINUTE]) AS window_start, cents
      FROM b
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM w GROUP BY 1 ORDER BY 1
    """,
)
def sliding_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native SLIDING window aggregate (1h windows every 30min —
    each event lands in exactly two overlapping windows, expanded
    map-side inside the operator, never via a self-join). The oracle
    re-derives the same window set from 30-minute time buckets: the
    epoch-aligned window starts covering t are bucket30(t) and
    bucket30(t) - 30min. Bounds stay TIMESTAMP_NTZ; sums ride exact
    cents; one grouping shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window(F.col("ts"), "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("total_cents"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_cents",
        )
        .orderBy("window_start")
    )
