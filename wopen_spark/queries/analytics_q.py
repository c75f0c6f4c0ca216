"""Wide-analytics coverage: pivot, exact quantiles, lateral explode
top-N, and the approximate-aggregate toolkit (HLL / quantile sketches —
registered rows-only since sketch outputs are engine-specific by design;
their accuracy contract is unit-tested against exact answers instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _spread, _t, query

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id % 10 AS user_bucket,
           {", ".join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}" for t in _EVENT_TYPES)}
    FROM events GROUP BY user_bucket ORDER BY user_bucket
    """,
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list — the list keeps the
    pivot single-pass (no extra distinct scan to discover columns)."""
    ev = _t(spark, sf_dir, "events")
    out = (
        ev.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # absent combos: pivot yields null, conditional COUNT yields 0
    return out.select(
        "user_bucket",
        *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES],
    ).orderBy("user_bucket")


@query(
    "order_price_quantiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.25), 4) AS q25,
           round(quantile_cont(o_totalprice, 0.50), 4) AS q50,
           round(quantile_cont(o_totalprice, 0.75), 4) AS q75
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles (F.percentile, not the sketch) —
    rounded to 4 decimals on both sides to absorb last-ulp interpolation
    differences between engines."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            *[
                F.round(F.percentile(F.col("o_totalprice"), F.lit(q)), 4).alias(name)
                for name, q in [("q25", 0.25), ("q50", 0.5), ("q75", 0.75)]
            ]
        )
        .orderBy("o_orderpriority")
    )


@query(
    "top_tokens",
    oracle="""
    SELECT t.token, COUNT(*) AS n
    FROM documents, unnest(regexp_extract_all(lower(text), '\\S+')) AS t(token)
    GROUP BY t.token ORDER BY n DESC, token LIMIT 20
    """,
)
def top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode + global top-N: partial-aggregated per partition,
    only (tokens x partitions) rows shuffle, TakeOrdered caps the sort."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    toks = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# Sketch aggregates: engine-specific outputs, so no SQL oracle (the driver
# records the weaker rows-only check); the accuracy contract lives in
# tests/test_operators.py::test_approx_aggregates_within_tolerance.
@query("approx_event_stats")
def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users and a t-digest-style median per event type —
    the constant-memory sketches that replace exact distinct/quantile at
    100 TB (exact distinct = full shuffle of the key space; HLL = a few
    KB per group, mergeable map-side)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
        )
        .orderBy("event_type")
    )