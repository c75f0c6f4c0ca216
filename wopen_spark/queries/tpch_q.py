"""TPC-H-shape relational coverage beyond the reference's two-table
joins: conditional aggregation ratios (Q14), zero-preserving outer-join
histograms (Q13), disjunctive multi-branch predicates (Q19), scalar-
subquery + anti-join filters (Q22), global-share HAVING (Q11), and the
two-dimension star with the same dim joined twice (Q7).

Plan intent at 100 TB: every dimension (part, supplier, customer,
nation) broadcasts; the lineitem/orders facts shuffle at most once on
their join key; scalar aggregates ride a broadcast cross join instead of
a driver collect; all date/segment filters land on the parquet scans.
Aggregates go through scaled-long cents arithmetic (registry._lsum) so
the DuckDB oracle hashes bit-equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _lsum, _t, query

_REV = "l_extendedprice * (1 - l_discount)"
_LSUM4 = "CAST(SUM(CAST(round({expr} * 10000) AS BIGINT)) AS DOUBLE) / 10000.0"


def _rev() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q14 shape: promo revenue share per ship month — conditional aggregation
# over one fact scan, part dim broadcast. The share divides two exact
# scaled-long sums with the identical double ops on both engines.
# ---------------------------------------------------------------------------
@query(
    "promo_revenue_share",
    oracle=f"""
    SELECT date_trunc('month', l.l_shipdate) AS ship_month,
           round(100.0 * ({_LSUM4.format(expr=f"CASE WHEN p.p_type = 'PROMO' THEN {_REV} ELSE 0 END")})
                 / ({_LSUM4.format(expr=_REV)}), 6) AS promo_share,
           {_LSUM4.format(expr=_REV)} AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(100.0 * _lsum(promo, 4) / _lsum(_rev(), 4), 6).alias(
                "promo_share"
            ),
            _lsum(_rev(), 4).alias("total_revenue"),
        )
        .orderBy("ship_month")
    )


# ---------------------------------------------------------------------------
# Q13 shape: distribution of per-customer order counts, zero-order
# customers preserved through the left outer join — two aggregation
# levels, the second over already-tiny data.
# ---------------------------------------------------------------------------
@query(
    "customer_order_histogram",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM per_cust GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive brand/size/quantity branches — one broadcast
# join on the common partkey, the OR evaluated post-join (NOT three
# scans), revenue in exact cents.
# ---------------------------------------------------------------------------
_Q19_BRANCHES = [
    ("Brand#11", 1, 15, 1.0, 11.0),
    ("Brand#12", 1, 25, 10.0, 20.0),
    ("Brand#13", 1, 35, 20.0, 30.0),
]


@query(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT {_LSUM4.format(expr=_REV)} AS revenue, COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE {" OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN {s1} AND {s2}"
        f" AND l.l_quantity BETWEEN {q1} AND {q2})"
        for b, s1, s2, q1, q2 in _Q19_BRANCHES
    )}
    """,
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = None
    for b, s1, s2, q1, q2 in _Q19_BRANCHES:
        branch = (
            (F.col("p_brand") == b)
            & F.col("p_size").between(s1, s2)
            & F.col("l_quantity").between(q1, q2)
        )
        cond = branch if cond is None else (cond | branch)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(_lsum(_rev(), 4).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


# ---------------------------------------------------------------------------
# Q22 shape: customers richer than the mean positive balance with no
# RECENT order (the correlated NOT EXISTS carries a date predicate, so
# the anti join's build side is filtered before the shuffle) — scalar
# aggregate broadcast via cross join (no driver collect), grouped by
# segment.
# ---------------------------------------------------------------------------
@query(
    "idle_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_acctbal
    FROM customer c, thresh t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thresh = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).cast("double")
                / 100.0
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _lsum(F.col("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("mktsegment")
    )


# ---------------------------------------------------------------------------
# Q11 shape: per-supplier revenue kept only above a fixed share of the
# GLOBAL total — the filter threshold is itself an aggregate, broadcast
# back over the grouped rows.
# ---------------------------------------------------------------------------
@query(
    "top_supplier_value_share",
    oracle=f"""
    WITH per_supp AS (
      SELECT l.l_suppkey, {_LSUM4.format(expr=_REV)} AS revenue
      FROM lineitem l GROUP BY 1
    ),
    total AS (
      SELECT CAST(SUM(CAST(round(revenue * 10000) AS BIGINT)) AS DOUBLE)
             / 10000.0 AS total_rev
      FROM per_supp
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supp_name, p.revenue,
           round(100.0 * p.revenue / t.total_rev, 6) AS share_pct
    FROM per_supp p
    JOIN supplier s ON s.s_suppkey = p.l_suppkey, total t
    WHERE p.revenue > 0.011 * t.total_rev
    ORDER BY p.revenue DESC, suppkey
    """,
)
def top_supplier_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_supp = li.groupBy("l_suppkey").agg(_lsum(_rev(), 4).alias("revenue"))
    total = per_supp.agg(
        (
            F.sum(F.round(F.col("revenue") * 10000).cast("long")).cast("double")
            / 10000.0
        ).alias("total_rev")
    )
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("revenue") > 0.011 * F.col("total_rev"))
        .join(F.broadcast(s), per_supp.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "revenue",
            F.round(100.0 * F.col("revenue") / F.col("total_rev"), 6).alias(
                "share_pct"
            ),
        )
        .orderBy(F.desc("revenue"), "suppkey")
    )


# ---------------------------------------------------------------------------
# Q7 shape: cross-nation trade volume — the nation dim joins TWICE (via
# supplier and via customer); both sides broadcast, lineitem shuffles
# once on orderkey to meet orders.
# ---------------------------------------------------------------------------
_TRADE_NATIONS = ("NATION_1", "NATION_2", "NATION_3")


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           year(o.o_orderdate) AS order_year,
           {_LSUM4.format(expr=_REV)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns ON s.s_nationkey = ns.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc ON c.c_nationkey = nc.n_nationkey
    WHERE ns.n_name IN {_TRADE_NATIONS!r}
      AND nc.n_name IN {_TRADE_NATIONS!r}
      AND ns.n_name <> nc.n_name
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_TRADE_NATIONS))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    supp_side = s.join(
        F.broadcast(n.select(F.col("n_nationkey"), F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cust_side = c.join(
        F.broadcast(
            n.select(F.col("n_nationkey"), F.col("n_name").alias("cust_nation"))
        ),
        c.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    return (
        li.join(F.broadcast(supp_side), li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_side), o.o_custkey == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(_lsum(_rev(), 4).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


# ---------------------------------------------------------------------------
# FULL OUTER join shape: two aggregated keyspaces (event users vs order
# customers) merged with both-sided null preservation — the reconcile-
# two-systems report. Aggregating BEFORE the join keeps the outer join
# on two small unique-key tables (never fact x fact).
# ---------------------------------------------------------------------------
@query(
    "full_outer_user_presence",
    oracle="""
    WITH ev AS (SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id),
    oc AS (SELECT o_custkey AS user_id, COUNT(*) AS n_orders
           FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
    SELECT coalesce(ev.user_id, oc.user_id) AS user_id,
           coalesce(ev.n_events, 0) AS n_events,
           coalesce(oc.n_orders, 0) AS n_orders,
           CASE WHEN ev.user_id IS NULL THEN 'orders_only'
                WHEN oc.user_id IS NULL THEN 'events_only'
                ELSE 'both' END AS presence
    FROM ev FULL OUTER JOIN oc ON ev.user_id = oc.user_id
    ORDER BY user_id
    """,
)
def full_outer_user_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    oc = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .groupBy(F.col("o_custkey").alias("o_user"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    joined = ev.join(oc, ev.user_id == oc.o_user, "full_outer")
    return joined.select(
        F.coalesce(F.col("user_id"), F.col("o_user")).alias("user_id"),
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.when(F.col("user_id").isNull(), "orders_only")
        .when(F.col("o_user").isNull(), "events_only")
        .otherwise("both")
        .alias("presence"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Q10 shape: revenue lost to returned items per customer in a quarter —
# the 4-table star (lineitem x orders x customer x nation) with the
# returnflag filter on the fact scan and a top-20 presentation cut.
# ---------------------------------------------------------------------------
@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name, n.n_name AS nation,
           {_LSUM4.format(expr=_REV)} AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-04-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(_lsum(_rev(), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands per customer: the largest silence between consecutive
# orders. The lag window partitions on the (unique-ish) customer key —
# parallel and skew-free, unlike a global-sort gap scan which funnels
# into one task.
# ---------------------------------------------------------------------------
@query(
    "customer_order_gaps",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderdate,
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    )
    SELECT o_custkey AS custkey,
           COUNT(*) AS n_orders,
           MAX(datediff('day', prev_d, o_orderdate)) AS max_gap_days,
           CAST(MIN(o_orderdate) AS DATE)::VARCHAR AS first_order,
           CAST(MAX(o_orderdate) AS DATE)::VARCHAR AS last_order
    FROM seq GROUP BY o_custkey
    HAVING COUNT(*) >= 5
    ORDER BY custkey
    """,
)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.withColumn("prev_d", F.lag("o_orderdate").over(w))
    return (
        seq.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("prev_d").cast("date"))
            ).alias("max_gap_days"),
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
        )
        .filter(F.col("n_orders") >= 5)
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# Q6 shape: the pure scan-predicate revenue aggregate — every predicate
# must reach the parquet scan; the whole query is one map-side-combined
# scalar aggregate (the canonical scan-throughput anchor).
# ---------------------------------------------------------------------------
@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0
             AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24.0
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.03, 0.05)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(
        _lsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Q4 shape: order counts by priority where ANY lineitem shipped after a
# cutoff — correlated EXISTS compiled to a left-semi hash join with the
# lineitem predicate pushed to its scan (the build side shrinks before
# the shuffle).
# ---------------------------------------------------------------------------
@query(
    "late_shipment_order_priority",
    oracle="""
    SELECT o.o_orderpriority AS orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > TIMESTAMP '1998-06-01')
    GROUP BY 1 ORDER BY 1
    """,
)
def late_shipment_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy(F.col("o_orderpriority").alias("orderpriority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("orderpriority")
    )
