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
    # Aggregate-below-outer-join: counting per custkey BEFORE the left
    # join shuffles |customers| count rows (map-side combine contracts
    # the orders fact 10:1) instead of joining the raw fact and
    # aggregating |orders| joined rows; zero-order customers surface as
    # a null count coalesced to 0 — identical to COUNT(o_orderkey) over
    # the outer join.
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    counts = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_cust = c.join(counts, c.c_custkey == counts.o_custkey, "left").select(
        F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_orders")
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


# ---------------------------------------------------------------------------
# Q9 shape: profit by nation x ship-year for a name-filtered part family.
# (The testdata has no partsupp, so profit is discounted revenue; the
# interesting part of Q9 — a selective dim filter driving a 3-dim star
# over the fact, grouped on two derived dims — is intact.) part and
# supplier->nation broadcast; lineitem shuffles once for the final
# group-by.
# ---------------------------------------------------------------------------
@query(
    "nation_year_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
           {_LSUM4.format(expr=_REV)} AS profit,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY 1, 2 DESC
    """,
)
def nation_year_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(_lsum(_rev(), 4).alias("profit"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("nation", F.desc("ship_year"))
    )


# ---------------------------------------------------------------------------
# Q12 shape: late-shipment priority counts by line status — one
# fact-fact equi join (orders x lineitem on orderkey), the "late"
# predicate computed from both sides post-join, priority folded into two
# conditional counts. At 100 TB both sides shuffle on l_orderkey /
# o_orderkey once; no dim table involved.
# ---------------------------------------------------------------------------
@query(
    "late_shipment_mode_counts",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS high_priority_lines,
           SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS low_priority_lines
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1 ORDER BY 1
    """,
)
def late_shipment_mode_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .select("l_orderkey", "l_shipdate", "l_linestatus")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_priority_lines"),
        )
        .orderBy("linestatus")
    )


# ---------------------------------------------------------------------------
# Q16 shape: distinct-supplier counts per part attribute triple, with a
# NOT-IN supplier exclusion. The supplier relation here is derived from
# lineitem (no partsupp in the testdata): dedup (partkey, suppkey)
# first — shrinking the fact ~7x BEFORE the dim join — then anti-join
# the excluded suppliers (broadcast), then count distinct per attrs.
# ---------------------------------------------------------------------------
@query(
    "supplier_count_by_part_attrs",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 2, 3, 4, 5)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, brand, type, size
    """,
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No standalone (partkey, suppkey) distinct: that was a full
    # 60M-row fact shuffle BEFORE the ~10%-selective part filter could
    # bite. The selective broadcast join runs first (map-side, prunes
    # the fact to the qualifying parts), and the final
    # count_distinct(suppkey) performs the dedup inside its own
    # two-phase aggregate — one exchange over the filtered rows only.
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 2, 3, 4, 5)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(bad_supp), ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "brand", "type", "size")
    )


# ---------------------------------------------------------------------------
# Q21 shape: suppliers who were the SOLE failing supplier on a
# multi-supplier order — the double-correlated EXISTS / NOT EXISTS.
# Spark-first decorrelation: BOTH existence tests are per-order set
# facts, so instead of semi/anti self-joins the fact contracts to
# (orderkey, suppkey, ever_failed) pairs (map-side partial agg), then
# one orderkey aggregate derives n_suppliers, n_failed_suppliers, and
# the failed supplier itself — a qualifying order is exactly
# n_failed = 1 AND n_suppliers > 1. Two exchanges, zero joins on the
# fact (the semi+anti formulation cost ~5 fact-sized exchanges).
# ---------------------------------------------------------------------------
@query(
    "sole_failed_supplier_orders",
    oracle="""
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
         failed AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                    WHERE l_returnflag = 'R' AND l_linestatus = 'F')
    SELECT s.s_name AS supplier, COUNT(*) AS numwait
    FROM failed f
    JOIN supplier s ON f.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM pairs p
                  WHERE p.l_orderkey = f.l_orderkey
                    AND p.l_suppkey <> f.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM failed f2
                      WHERE f2.l_orderkey = f.l_orderkey
                        AND f2.l_suppkey <> f.l_suppkey)
    GROUP BY 1 ORDER BY numwait DESC, supplier
    """,
)
def sole_failed_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    failed_flag = (
        (F.col("l_returnflag") == "R") & (F.col("l_linestatus") == "F")
    ).cast("int")
    # ONE fact exchange for BOTH aggregation levels: hash(l_orderkey)
    # satisfies the clustering requirement of the (orderkey, suppkey)
    # aggregate (partition keys ⊆ group keys) AND of the per-order
    # aggregate, so after this repartition neither groupBy plans its own
    # exchange. Grouping by (ok, sk) directly would hash-partition on
    # the pair and force a second shuffle for the per-order rollup.
    pairs = (
        li.select("l_orderkey", "l_suppkey", failed_flag.alias("ff"))
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("ff").alias("ever_failed"))
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("ever_failed").alias("n_failed"),
        F.max(
            F.when(F.col("ever_failed") == 1, F.col("l_suppkey"))
        ).alias("sole_sk"),
    )
    sole = per_order.filter(
        (F.col("n_failed") == 1) & (F.col("n_supp") > 1)
    ).select("sole_sk")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(s), sole.sole_sk == s.s_suppkey)
        .groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "supplier")
    )


# ---------------------------------------------------------------------------
# Q20 shape: suppliers holding a dominant share of a part's shipments —
# nested aggregation (per part+supplier, then per part) feeding a
# semi-join up to the supplier dim. Quantities sum in the exact long
# domain and the dominance test is integer arithmetic (q*4 > total), so
# both engines decide each candidate identically — no double-sum
# order sensitivity in the filter.
# ---------------------------------------------------------------------------
@query(
    "dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
             SUM(CAST(round(l.l_quantity) AS BIGINT)) AS q
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE '%red%'
        AND l.l_shipdate >= TIMESTAMP '1997-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    tot AS (SELECT pk, SUM(q) AS tq, COUNT(*) AS n_supp FROM shipped GROUP BY 1)
    SELECT s.s_name AS supplier, s.s_acctbal AS acctbal,
           COUNT(*) AS n_dominated_parts
    FROM shipped sh
    JOIN tot t ON sh.pk = t.pk
    JOIN supplier s ON sh.sk = s.s_suppkey
    WHERE t.n_supp > 1 AND sh.q * 4 > t.tq
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.round("l_quantity").cast("long")).alias("q"))
    )
    # Per-part totals via a window over the already-aggregated pair set:
    # one extra shuffle on pk over data shrunk to |parts x suppliers|.
    w = Window.partitionBy("pk")
    dominant = (
        shipped.withColumn("tq", F.sum("q").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .filter((F.col("n_supp") > 1) & (F.col("q") * 4 > F.col("tq")))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        dominant.join(F.broadcast(s), dominant.sk == s.s_suppkey)
        .groupBy(
            F.col("s_name").alias("supplier"), F.col("s_acctbal").alias("acctbal")
        )
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy("supplier")
    )


# ---------------------------------------------------------------------------
# Q2 shape: minimum-cost supplier per part within one region. The testdata
# has no partsupp table, so the supply "cost" is contracted from the fact:
# the minimum observed unit price per (part, supplier) pair, in exact
# cents (round half-away on the identical IEEE divide in both engines).
# The eligible set (European suppliers, STANDARD parts) is fixed BEFORE
# the per-part minimum, as in Q2's correlated subquery; ties on the
# minimum all survive, as in the real query.
#
# Plan intent at 100 TB: lineitem contracts to |part x supplier| pairs in
# one shuffle with map-side partial min; part and the supplier~nation~
# region chain broadcast; the per-part minimum is a window over the
# contracted pair set, never a second fact scan.
# ---------------------------------------------------------------------------
@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH cost AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             MIN(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eligible AS (
      SELECT c.pk, c.sk, c.cost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM cost c
      JOIN supplier s ON c.sk = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT e.*, p.p_name,
             MIN(cost_cents) OVER (PARTITION BY pk) AS min_cents
      FROM eligible e JOIN part p ON e.pk = p.p_partkey
      WHERE p.p_type = 'STANDARD'
    )
    SELECT s_acctbal AS acctbal, s_name AS supplier, n_name AS nation,
           pk AS partkey, p_name AS part_name, cost_cents
    FROM ranked WHERE cost_cents = min_cents
    ORDER BY acctbal DESC, supplier, nation, partkey
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_name")
    )
    # eligibility is constant per join key (p_type per partkey, region
    # per suppkey), so both filters push BELOW the pair contraction as
    # broadcast semi-joins — the (pk, sk) shuffle carries only eligible
    # pairs instead of the full fact's pair universe.
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .join(
            F.broadcast(supp_eur.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
    )
    cost = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.min(
            F.round(F.col("l_extendedprice") / F.col("l_quantity") * 100).cast(
                "long"
            )
        ).alias("cost_cents")
    )
    eligible = (
        cost.join(F.broadcast(supp_eur), cost.sk == supp_eur.s_suppkey)
        .join(F.broadcast(p), cost.pk == p.p_partkey)
    )
    w = Window.partitionBy("pk")
    return (
        eligible.withColumn("min_cents", F.min("cost_cents").over(w))
        .filter(F.col("cost_cents") == F.col("min_cents"))
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("pk").alias("partkey"),
            F.col("p_name").alias("part_name"),
            "cost_cents",
        )
        .orderBy(F.desc("acctbal"), "supplier", "nation", "partkey")
    )


# ---------------------------------------------------------------------------
# Q15 shape: the top-revenue supplier(s) for one quarter. Revenue sums in
# the scaled-cents long domain, so the equality against the global
# maximum is exact on both engines — the classic Q15 footgun (double
# revenue == double max) is defined away. The global max rides a
# broadcast cross join of a 1-row aggregate, like Q11's threshold —
# no driver collect, no single-partition window.
# ---------------------------------------------------------------------------
@query(
    "top_quarter_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS sk,
             SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
               AS rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier,
           CAST(r.rev_cents AS DOUBLE) / 100.0 AS total_revenue
    FROM rev r JOIN supplier s ON r.sk = s.s_suppkey
    WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM rev)
    ORDER BY suppkey
    """,
)
def top_quarter_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("sk"))
        .agg(
            F.sum(F.round(_rev() * 100).cast("long")).alias("rev_cents")
        )
    )
    mx = rev.agg(F.max("rev_cents").alias("max_cents"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("sk") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            (F.col("rev_cents").cast("double") / 100.0).alias("total_revenue"),
        )
        .orderBy("suppkey")
    )
