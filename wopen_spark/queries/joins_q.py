"""As-of join and skew-salted aggregation in the correctness gate.

DuckDB has a native ASOF JOIN, which makes it the perfect oracle for the
union-merge implementation; the salted aggregate must be bit-identical to
a plain GROUP BY (salting is a physical rewrite, not a semantic one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wopen_spark.operators.joins import asof_join_merged, salted_aggregate
from wopen_spark.queries.registry import _t, query

# events.ts is TIMESTAMP(NANOS); both engines compare at µs precision
_DUCK_EV = (
    "SELECT event_id, user_id, event_type, value, "
    "make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events"
)


@query(
    "asof_click_before_purchase",
    oracle=f"""
    WITH ev AS ({_DUCK_EV}),
    p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
    c AS (
      SELECT user_id, ts, event_id AS click_id FROM ev
      WHERE event_type = 'click'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    )
    SELECT p.event_id, p.user_id, c.click_id, c.ts AS click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the user's most recent click at or before it —
    the canonical time-series alignment. ONE events scan (click and
    purchase rows tagged in place — the pre-merged asof_join_merged entry
    point) and one shuffle on user_id for the union-merge window; no
    range-join pair explosion, and no right-side pre-dedup window (the
    carry's last() already resolves equal-ts clicks to the max event_id,
    matching the oracle's QUALIFY dedup). DuckDB's native ASOF JOIN is
    the oracle."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_purchase = F.col("event_type") == "purchase"
    payload_t = "struct<__ts:timestamp,click_id:bigint>"
    merged = ev.select(
        F.col("user_id").alias("__key"),
        F.col("ts").alias("__t"),
        is_purchase.cast("int").alias("__side"),
        F.when(
            ~is_purchase,
            F.struct(
                F.col("ts").alias("__ts"), F.col("event_id").alias("click_id")
            ),
        )
        .otherwise(F.lit(None))
        .cast(payload_t)
        .alias("__payload"),
        "event_id",
        "user_id",
        "ts",
    )
    out = asof_join_merged(
        merged, l_cols=["event_id", "user_id", "ts"], right_cols=["click_id"]
    )
    return out.select(
        "event_id", "user_id", "click_id", F.col("ts_asof").alias("click_ts")
    ).orderBy("event_id")


@query(
    "asof_next_click_after_signup",
    oracle=f"""
    WITH ev AS ({_DUCK_EV}),
    s AS (SELECT * FROM ev WHERE event_type = 'signup'),
    c AS (SELECT user_id, ts, event_id AS click_id FROM ev
          WHERE event_type = 'click'),
    pairs AS (
      SELECT s.event_id, s.user_id, c.click_id, c.ts AS click_ts,
             ROW_NUMBER() OVER (PARTITION BY s.event_id
                                ORDER BY c.ts, c.click_id) AS rn
      FROM s LEFT JOIN c ON c.user_id = s.user_id AND c.ts >= s.ts
    )
    SELECT event_id, user_id, click_id, click_ts
    FROM pairs WHERE rn = 1 ORDER BY event_id
    """,
)
def asof_next_click_after_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of: for every signup, the user's earliest click at or
    after it — the other half of time-series alignment (next-event
    attribution). Same single-scan union-merge shape as the backward
    query, scanning time descending; equal-ts clicks resolve to the min
    click_id, matching the oracle's ORDER BY ts, click_id."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "signup")
    )
    is_signup = F.col("event_type") == "signup"
    payload_t = "struct<__ts:timestamp,click_id:bigint>"
    merged = ev.select(
        F.col("user_id").alias("__key"),
        F.col("ts").alias("__t"),
        is_signup.cast("int").alias("__side"),
        F.when(
            ~is_signup,
            F.struct(
                F.col("ts").alias("__ts"), F.col("event_id").alias("click_id")
            ),
        )
        .otherwise(F.lit(None))
        .cast(payload_t)
        .alias("__payload"),
        "event_id",
        "user_id",
        "ts",
    )
    out = asof_join_merged(
        merged,
        l_cols=["event_id", "user_id", "ts"],
        right_cols=["click_id"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "click_id", F.col("ts_asof").alias("click_ts")
    ).orderBy("event_id")


@query(
    "salted_event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value,
           CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS min_value,
           CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregate over a 5-hot-key distribution: the
    salted plan must equal the plain GROUP BY bit-for-bit (scaled-long
    sums are order-independent, so re-association across salts is
    exact; min/max trivially re-associate)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    out = salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n": (F.lit(1), "count"),
            "total_value": (cents, "sum"),
            "min_value": (cents, "min"),
            "max_value": (cents, "max"),
        },
        buckets=16,
        salt_col="event_id",
    )
    return out.select(
        "event_type",
        "n",
        (F.col("total_value").cast("double") / 100.0).alias("total_value"),
        (F.col("min_value").cast("double") / 100.0).alias("min_value"),
        (F.col("max_value").cast("double") / 100.0).alias("max_value"),
    ).orderBy("event_type")


@query(
    "range_join_events_60s",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us FROM events
    )
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           b.us - a.us AS delta_us
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(b.us - a.us) <= 60000000
    ORDER BY id_a, id_b
    """,
)
def range_join_events_60s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 60 seconds — the bounded-range
    self-join, executed as a bucketed equi-join (operators.joins) instead
    of a per-key cross product; DuckDB runs the naive inequality join as
    the oracle."""
    from wopen_spark.operators.joins import range_join_within

    ev = _t(spark, sf_dir, "events")
    return (
        range_join_within(ev, by="user_id", ts_col="ts", window_seconds=60,
                          id_col="event_id")
        .orderBy("id_a", "id_b")
    )
