"""Classic multi-way analytical join shapes + SCD2 history.

The reference's joins are all two-table left joins (SURVEY.md §2.5,
get_similarity.py:179-180, update_open_data.py:71-72); a general engine
must also plan the multi-way star shapes those generalize to at 100 TB.
These queries pin the plans Catalyst should pick: dimensions broadcast,
facts shuffle once on the join key, filters land on the parquet scans,
and decorrelated "min per group" subqueries become a single window pass
instead of a self-join re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _dsum, _lsum, _t, query

# ---------------------------------------------------------------------------
# TPC-H Q3 shape: segment-filtered customer x orders x lineitem, revenue
# per open order. Both date filters push to the scans; the two fact
# shuffles key on the same orderkey so AQE can chain them.
# ---------------------------------------------------------------------------
@query(
    "shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
           o.o_orderdate AS orderdate, o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(_lsum(rev, 4).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: 6-way join — two big facts, four dimensions, plus the
# "local supplier" constraint c_nationkey = s_nationkey. The ASIA
# restriction reaches the fact FIRST: region -> nation -> supplier
# pre-filters to ~1/5 of suppliers, and that broadcast prunes lineitem
# map-side (60M -> ~12M at sf10) BEFORE the orderkey shuffle — join
# order Catalyst won't derive because the region filter sits three
# joins away from the fact in the declared tree.
# ---------------------------------------------------------------------------
@query(
    "regional_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY revenue DESC, nation
    """,
)
def regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    s_asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(F.broadcast(s_asia), li.l_suppkey == s_asia.s_suppkey)
        .join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .join(
            c.hint("shuffle_hash"),
            (o.o_custkey == c.c_custkey)
            & (F.col("s_nationkey") == c.c_nationkey),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_lsum(rev, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape (decorrelated): cheapest shipped price per part, all
# suppliers achieving it. The correlated "= (SELECT MIN ...)" subquery is
# one window MIN over the partkey partition — a single shuffle, no
# second scan of lineitem.
# ---------------------------------------------------------------------------
@query(
    "min_price_supplier_per_part",
    oracle="""
    SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
           CAST(l.l_extendedprice AS DOUBLE) AS min_price
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size >= 40
      AND l.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    GROUP BY 1, 2, 3
    ORDER BY partkey, suppkey
    """,
)
def min_price_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 40).select("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "left_semi")
        .withColumn("min_price", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("min_price"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("min_price").cast("double").alias("min_price"),
        )
        .distinct()
        .orderBy("partkey", "suppkey")
    )


# ---------------------------------------------------------------------------
# SCD2 history build: CDC events -> slowly-changing-dimension rows with
# [valid_from, valid_to) intervals and a current flag. At scale this is
# the standard "upsert stream into a dimension" pattern: one shuffle on
# the business key, lead() closes each version, the open version is
# current. (events.ts nanos handled by _t / epoch_ns in the oracle.)
# ---------------------------------------------------------------------------
@query(
    "scd2_user_value_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, value,
             make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events WHERE event_type = 'signup'
    )
    SELECT user_id, event_id, value,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
           (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
    FROM ev
    ORDER BY user_id, valid_from, event_id
    """,
)
def scd2_user_value_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "event_id", "value", "ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("valid_to", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("ts").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


# ---------------------------------------------------------------------------
# Point-in-time (PIT) join — facts joined to the SCD2 dimension version
# VALID AT the fact's timestamp, the temporal-warehouse op that
# complements the event-to-event as-of joins: each purchase attributes
# to the signup version whose [valid_from, valid_to) interval covers
# its ts. Scale shape: equi-join on the business key (user_id) with the
# interval predicate as a residual filter — per-key version chains are
# short, so the range check never degenerates into a nested loop; the
# aggregate then collapses to one row per (user, version).
# ---------------------------------------------------------------------------
@query(
    "pit_join_purchases_scd2",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, make_timestamp(epoch_ns(ts) // 1000) AS ts
      FROM events WHERE event_type = 'signup'
    ),
    dim AS (
      SELECT user_id, event_id AS version_id, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM ev
    ),
    pur AS (
      SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT d.user_id, d.version_id, (d.valid_to IS NULL) AS is_current,
           COUNT(*) AS n_purchases,
           CAST(SUM(p.cents) AS BIGINT) AS total_cents
    FROM pur p
    JOIN dim d ON p.user_id = d.user_id
              AND p.ts >= d.valid_from
              AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    GROUP BY 1, 2, 3 ORDER BY 1, 2
    """,
)
def pit_join_purchases_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sign = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = sign.select(
        F.col("user_id").alias("d_user"),
        F.col("event_id").alias("version_id"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        pur.join(
            dim,
            (pur.user_id == dim.d_user)
            & (F.col("p_ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
        )
        .groupBy(
            "user_id", "version_id", F.col("valid_to").isNull().alias("is_current")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("user_id", "version_id")
    )


# ---------------------------------------------------------------------------
# S4 SQL-interface parity (SURVEY §2.1: the reference ships .sql files run
# by BigQuery; the engine's equivalent is spark.sql over registered
# views). ONE dialect-neutral SQL string is both the Spark query and the
# DuckDB oracle — byte-identical text, two engines, one hash.
# ---------------------------------------------------------------------------
_SQL_URGENT_BY_NATION = """
    SELECT n.n_name AS nation, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY n.n_name
    ORDER BY nation
"""


@query("sql_urgent_orders_by_nation", oracle=_SQL_URGENT_BY_NATION)
def sql_urgent_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SQL_URGENT_BY_NATION)


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share via conditional aggregation — the share of
# yearly revenue from one brand's parts, computed in ONE pass with a
# CASE-gated numerator (no second scan, no self-join). Both sums
# accumulate as decimals, divide as doubles.
# ---------------------------------------------------------------------------
@query(
    "brand_market_share_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS order_year,
           CAST(CAST(SUM(CASE WHEN p.p_brand = 'Brand#1'
                     THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
                / CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS DOUBLE)
               AS DOUBLE) AS brand_share,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1
    ORDER BY order_year
    """,
)
def brand_market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # The part join exists ONLY to flag Brand#1 lines: broadcast just the
    # Brand#1 partkeys (1/25th of part) and left-join — null pk = not
    # Brand#1. Sound because l_partkey -> part is FK-complete (the inner
    # join drops nothing; verified 0 orphans at every SF), so the full
    # 2M-entry part broadcast build+probe is pure overhead.
    b1 = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select(F.col("p_partkey").alias("b1_pk"))
    )
    rev = F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 10000).cast(
        "long"
    )
    brand_rev = F.when(F.col("b1_pk").isNotNull(), rev).otherwise(
        F.lit(0).cast("long")
    )
    # Partial-aggregate-below-join: sums and counts are associative, so
    # lineitem contracts to one row per orderkey (map-side combine)
    # BEFORE the orders join — the join shuffles |orders| rows per side
    # instead of |lineitem|, a ~4x volume cut Catalyst won't derive on
    # its own.
    per_order = (
        li.join(F.broadcast(b1), li.l_partkey == F.col("b1_pk"), "left")
        .groupBy("l_orderkey")
        .agg(
            F.sum(brand_rev).alias("brand_cents"),
            F.sum(rev).alias("total_cents"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
    return (
        per_order.join(o.hint("shuffle_hash"), per_order.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            (
                F.sum("brand_cents").cast("double")
                / F.sum("total_cents").cast("double")
            ).alias("brand_share"),
            F.sum("n_items").alias("n_items"),
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# Q17 shape: "revenue from small-quantity orders of one brand's parts" —
# the classic correlated-average subquery. Spark-first decorrelation: the
# per-part average is a window over ONE lineitem scan (no self-join,
# no second scan), the brand filter broadcasts. The 1/7.0 scaling and
# decimal sum follow the TPC-H definition so both engines agree bitwise.
# ---------------------------------------------------------------------------
@query(
    "small_quantity_part_revenue",
    oracle="""
    WITH avgs AS (
      SELECT l_partkey,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / 7.0 AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN avgs a ON a.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13' AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def small_quantity_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    brand = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    avg_qty = (
        F.sum(F.round(F.col("l_quantity") * 100).cast("long")).over(w).cast("double")
        / 100.0
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey, "left_semi")
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape: large-volume customers — IN (grouped HAVING subquery)
# decorrelated to a pre-aggregated join. The lineitem rollup happens
# BEFORE the join (one shuffle on orderkey, map-side combined); orders
# and customer then join on already-reduced rows. Top-20 with an
# orderkey tie-break keeps the result deterministic.
# ---------------------------------------------------------------------------
@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 30000
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"))
        .filter(F.col("q") > 30000)
        .select("l_orderkey", (F.col("q").cast("double") / 100.0).alias("sum_qty"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "above_nation_avg_customers",
    oracle="""
    WITH c AS (
      SELECT n.n_name AS nation,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS cents
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    agg AS (
      SELECT nation, COUNT(*) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM c GROUP BY 1
    )
    SELECT a.nation, a.n_customers,
           COUNT(*) FILTER (WHERE c.cents * a.n_customers > a.s) AS n_above
    FROM c JOIN agg a USING (nation)
    GROUP BY 1, 2 ORDER BY 1
    """,
)
def above_nation_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers strictly above their nation's average balance — the
    correlated-scalar-subquery shape, decided in EXACT integer
    arithmetic: cents * n > sum_cents is the rational comparison
    cents > sum/n with no division, so no engine ever rounds the
    threshold. One window pass carries (n, sum) per nation and the
    rollup reuses the same nation exchange."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("nation")
    flagged = base.select(
        "nation",
        F.count(F.lit(1)).over(w).alias("n_customers"),
        F.sum("cents").over(w).alias("s"),
        "cents",
    )
    return (
        flagged.groupBy("nation", "n_customers")
        .agg(
            F.sum(
                F.when(F.col("cents") * F.col("n_customers") > F.col("s"), 1)
                .otherwise(0)
            ).alias("n_above")
        )
        .orderBy("nation")
    )


@query(
    "ship_lag_percentiles",
    oracle="""
    WITH lag AS (
      SELECT o.o_orderpriority AS priority,
             datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority, COUNT(*) AS n_lines,
           round(quantile_cont(lag_days, 0.5), 6) AS p50_days,
           round(quantile_cont(lag_days, 0.9), 6) AS p90_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_days
    FROM lag GROUP BY 1 ORDER BY 1
    """,
)
def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority — the fulfilment
    SLA report. The lag is integer days, so the interpolated exact
    percentiles are IEEE-identical across engines (halving/summing
    integers below 2^53); the orders side of the fact-fact join carries
    only (orderkey, priority, date)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "lag_days"
        ),
    )
    return (
        lag.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.percentile("lag_days", 0.5), 6).alias("p50_days"),
            F.round(F.percentile("lag_days", 0.9), 6).alias("p90_days"),
            F.max("lag_days").cast("long").alias("max_days"),
        )
        .orderBy("priority")
    )


@query(
    "order_status_mix_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
           round(CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE)
                 / COUNT(*), 6) AS f_share
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def order_status_mix_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status composition per year — the lifecycle mix report
    (conditional aggregation over one scan; the F-share ratio is one
    engine-identical division)."""
    o = _t(spark, sf_dir, "orders")
    nf = F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            nf.alias("n_f"),
            F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias(
                "n_o"
            ),
            F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias(
                "n_p"
            ),
            F.round(nf.cast("double") / F.count(F.lit(1)), 6).alias("f_share"),
        )
        .orderBy("yr")
    )


@query(
    "dead_stock_parts_by_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           COUNT(*) AS n_parts,
           COUNT(*) FILTER (WHERE l.l_partkey IS NULL) AS never_ordered,
           round(CAST(COUNT(*) FILTER (WHERE l.l_partkey IS NULL) AS DOUBLE)
                 / COUNT(*), 6) AS dead_share
    FROM part p
    LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
      ON p.p_partkey = l.l_partkey
    GROUP BY 1 ORDER BY 1
    """,
)
def dead_stock_parts_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog coverage: parts that never appear in the fact, per brand
    — the dead-stock sweep. The fact contracts to DISTINCT partkeys
    before the join, so the dimension-side outer join sees |parts|
    rows, not |lineitem|."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ordered = _t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    dead = F.sum(F.when(F.col("l_partkey").isNull(), 1).otherwise(0))
    return (
        p.join(ordered, p.p_partkey == ordered.l_partkey, "left")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dead.alias("never_ordered"),
            F.round(dead.cast("double") / F.count(F.lit(1)), 6).alias(
                "dead_share"
            ),
        )
        .orderBy("brand")
    )
