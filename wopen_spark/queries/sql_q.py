"""SQL-front-door queries (r4 verdict #7): each is ``spark.sql`` text over
the views ``sql_frontdoor.register_frontdoor`` registers — the engine's
dedup/LSH operators driven ENTIRELY from SQL, mirroring the reference's
``sql/*.sql`` entry points (/root/reference/sql/get_custom_search_data.sql).
The DuckDB oracles re-derive the operator views from the same md5
primitives, so these pin both the SQL surface and the view semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.localframe import local_df
from wopen_spark.queries.dedup import DUCK_LSH_PAIRS
from wopen_spark.queries.registry import _t, query


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    from wopen_spark.sql_frontdoor import register_frontdoor

    register_frontdoor(spark, sf_dir)
    return spark.sql(text)


@query(
    "sql_dedup_clusters",
    oracle="""
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           COUNT(*) AS n_clones,
           MIN(doc_id) AS keeper
    FROM documents
    GROUP BY fingerprint
    ORDER BY fingerprint
    """,
)
def sql_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup clusters queried from pure SQL over the
    doc_fingerprints operator view — one fingerprint-keyed shuffle, and
    (by construction) the SAME answer a DataFrame user gets from
    doc_fingerprint_dedup: both engine surfaces agree value-for-value."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT fingerprint, COUNT(*) AS n_clones, MIN(doc_id) AS keeper
        FROM doc_fingerprints
        GROUP BY fingerprint
        ORDER BY fingerprint
        """,
    )


@query(
    "sql_lsh_candidate_pairs",
    oracle=f"""
    {DUCK_LSH_PAIRS}
    ORDER BY id_a, id_b
    """,
)
def sql_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash+LSH banding operator consumed as a plain SQL relation:
    SELECT over the lsh_candidate_pairs view. The banded self-join,
    clone-collapse reps, and short-doc guard all live in the view's
    logical plan."""
    return _sql(
        spark,
        sf_dir,
        "SELECT id_a, id_b FROM lsh_candidate_pairs ORDER BY id_a, id_b",
    )


@query(
    "sql_near_dup_source_profile",
    oracle=f"""
    WITH pairs AS ({DUCK_LSH_PAIRS}),
    ids AS (
      SELECT id_a AS doc_id FROM pairs
      UNION
      SELECT id_b FROM pairs
    )
    SELECT d.source AS source, COUNT(*) AS n_dup_docs
    FROM ids JOIN documents d ON d.doc_id = ids.doc_id
    GROUP BY d.source
    ORDER BY source
    """,
)
def sql_near_dup_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A SQL-only composite: the LSH operator view joined back to a base
    table — which corpus slices contribute near-duplicate docs. Proves
    operator views compose with ordinary tables in one Catalyst plan
    (the doc_id join prunes documents to (doc_id, source))."""
    return _sql(
        spark,
        sf_dir,
        """
        SELECT d.source AS source, COUNT(*) AS n_dup_docs
        FROM (
          SELECT id_a AS doc_id FROM lsh_candidate_pairs
          UNION
          SELECT id_b FROM lsh_candidate_pairs
        ) p
        JOIN documents d ON d.doc_id = p.doc_id
        GROUP BY d.source
        ORDER BY source
        """,
    )


# r5 verdict #7: the SQL surface must reach the flagship operators, not
# just dedup. The oracles are SHARED with the DataFrame-API queries
# (ORACLES lookup) — both surfaces are pinned to the same answer.
from wopen_spark.queries.registry import ORACLES  # noqa: E402


@query("sql_fuzzy_top1_type_brand", oracle=ORACLES["fuzzy_top1_type_brand"])
def sql_fuzzy_top1_type_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The J8 fuzzy top-1 join consumed as a plain SQL relation: the
    broadcast cross-score + per-key window live in the view's plan; a
    SQL-only user gets byte-identical similarity scores to the
    DataFrame API (same oracle as fuzzy_top1_type_brand)."""
    return _sql(
        spark,
        sf_dir,
        "SELECT p_type, p_brand, similarity FROM fuzzy_type_brand_top1 "
        "ORDER BY p_type",
    )


@query("sql_near_dup_components", oracle=ORACLES["near_dup_components"])
def sql_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup clusters from pure SQL: the ITERATIVE
    connected-components operator resolves once per process (memoized +
    persisted behind the view) and SQL consumers read the converged
    labels — the pattern for exposing any fixpoint operator to a SQL
    surface. Same oracle (recursive CTE) as near_dup_components."""
    return _sql(
        spark,
        sf_dir,
        "SELECT doc_id, component FROM near_dup_components ORDER BY doc_id",
    )


@query(
    "sql_snapshot_time_travel",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_regionkey = 0
    ORDER BY n_nationkey
    """,
)
def sql_snapshot_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VERSION AS OF from SQL: a SnapshotTable is built from the nation
    table (v1 = full load, v2 = copy-on-write delete of region 0), both
    versions registered as views, and the deleted rows recovered with
    set SQL across the two versions — time travel driven entirely from
    the SQL surface. The oracle recomputes the deleted set relationally,
    so the versioned views are value-checked, not just runnable."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_frontdoor import register_snapshot_view

    # deliberately NOT register_frontdoor: this query touches only the
    # nation table (read directly) and the two snapshot views it
    # registers itself — pulling in the full operator-view surface would
    # pay the eager connected-components resolution for nothing
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_snap_sql_") + "/nation")
    t.create(nation.coalesce(1), cluster_by=["n_nationkey"])
    t.delete_where("n_regionkey = 0")
    register_snapshot_view(spark, t, "nation_snap_v1", version=1)
    register_snapshot_view(spark, t, "nation_snap")
    return spark.sql(
        """
        SELECT n_nationkey, n_name FROM nation_snap_v1
        EXCEPT
        SELECT n_nationkey, n_name FROM nation_snap
        ORDER BY n_nationkey
        """
    )


@query(
    "snapshot_dv_delete_read",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0)
    ORDER BY c_custkey
    """,
)
def snapshot_dv_delete_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read deletion vectors value-checked end-to-end: customer
    loads into a SnapshotTable across several clustered files, a dv
    delete masks (file, row_index) pairs WITHOUT rewriting any data file
    (asserted: files_rewritten == 0), a second stacked dv delete proves
    masks compose, and the final read — clean files scanned straight
    through, masked files anti-joined against their mask union — must
    hash-match the relational complement the oracle computes."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_snap_dv_") + "/customer")
    t.create(customer.repartition(4), cluster_by=["c_custkey"])
    r1 = t.delete_where(
        "c_mktsegment = 'BUILDING' AND c_custkey % 3 = 0", mode="dv"
    )
    assert r1["files_rewritten"] == 0, "dv delete must not rewrite data files"
    # stacked mask over the same files: already-masked rows never rematch
    r2 = t.delete_where(
        "c_mktsegment = 'BUILDING' AND c_custkey % 6 = 0", mode="dv"
    )
    assert r2["rows_masked"] == 0, "stacked dv re-matched masked rows"
    return t.read().orderBy("c_custkey")


@query(
    "snapshot_cdf_incremental_mv",
    oracle="""
    WITH live AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 4 = 2 AND o_totalprice < 50000
                  THEN o_totalprice * 2 ELSE o_totalprice END AS price
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 7)
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(price AS DECIMAL(28,2))) AS DOUBLE) AS total_price
    FROM live GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_cdf_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view over a SnapshotTable change feed,
    exactly once: upstream takes four commits (create half the orders,
    append the rest, dv-delete a slice, dv-update a price band); after
    EACH commit a ChangeFeedLoader folds only that commit's changes into
    signed per-priority deltas (+insert/-delete; the update nets its
    delete+insert pair) and appends them to a downstream delta-log table
    in one atomic commit that carries the upstream-version watermark.
    The MV read — a sum over the delta log — must equal the oracle's
    from-scratch aggregation of the final upstream state; a replayed
    batch (asserted) is a watermark no-op, so drained twice equals
    drained once. This is how a 100 TB rollup stays fresh: per-commit
    O(changed files) work, never a table rescan."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.streaming.changefeed import ChangeFeedLoader

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    root = tempfile.mkdtemp(prefix="wopen_cdf_mv_")
    src = SnapshotTable(spark, root + "/orders")
    tgt = SnapshotTable(spark, root + "/mv_deltas")

    def fold(ch: DataFrame) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return ch.groupBy("o_orderpriority").agg(
            F.sum(sign).cast("long").alias("d_count"),
            F.sum(
                sign * F.col("o_totalprice").cast("decimal(28,2)")
            ).cast("decimal(28,2)").alias("d_price"),
        )

    loader = ChangeFeedLoader(src, tgt, app="mv/orders_by_priority", fold=fold)

    src.create(orders.filter(F.col("o_orderkey") % 4 < 2).repartition(4))
    assert loader.run_once() == (0, 1)
    src.append(orders.filter(F.col("o_orderkey") % 4 >= 2).repartition(4))
    assert loader.run_once() == (1, 2)
    src.delete_where("o_orderstatus = 'F' AND o_orderkey % 10 = 7", mode="dv")
    src.update_where(
        "o_orderkey % 4 = 2 AND o_totalprice < 50000",
        {"o_totalprice": "o_totalprice * 2"},
        mode="dv",
    )
    assert loader.run_until_caught_up() == [(2, 4)]
    assert loader.run_once() is None, "caught-up loader must be a no-op"

    return (
        tgt.read()
        .groupBy("o_orderpriority")
        .agg(
            F.sum("d_count").cast("long").alias("n_orders"),
            F.sum("d_price").cast("double").alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("o_orderpriority")
    )


@query(
    "snapshot_pruned_range_read",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 2000
    GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_pruned_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Footer-stats file pruning made oracle-visible: orders load into a
    SnapshotTable range-clustered by o_orderkey across 8 files, and a
    read_where key-range scan must (a) SKIP files whose [min,max] cannot
    intersect the range — asserted — and (b) still produce the exact
    relational answer (the residual filter guarantees exactness whatever
    the stats say). The read path that makes a 100 TB point-range query
    touch O(matching files), not O(table)."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_prune_") + "/orders"
    )
    t.create(orders.repartition(8), cluster_by=["o_orderkey"])
    df, report = t.read_where({"o_orderkey": (1000, 2000)})
    assert report["files_skipped_by_stats"] > 0, (
        f"range read should skip clustered files: {report}"
    )
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast(
                    "double"
                )
                / 100.0
            ).alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "snapshot_cdf_join_mv",
    oracle="""
    WITH live AS (
      SELECT o.o_totalprice, c.c_mktsegment
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE NOT (o.o_orderstatus = 'O' AND o.o_orderkey % 7 = 3)
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS total_price
    FROM live GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_cdf_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN materialized view: the MV is orders x customer
    aggregated by market segment, and each upstream commit's change
    batch is ENRICHED (broadcast-joined to the dimension) inside the
    fold before the signed per-segment deltas land — the stream-side of
    delta-join maintenance with a static dimension, per-commit cost
    O(changed rows), never a fact rescan. Deletes net out through the
    same join because the dimension is keyed and static; the final MV
    sum must equal the oracle's from-scratch join."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.streaming.changefeed import ChangeFeedLoader

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    root = tempfile.mkdtemp(prefix="wopen_cdf_jmv_")
    src = SnapshotTable(spark, root + "/orders")
    tgt = SnapshotTable(spark, root + "/mv_deltas")

    def fold(ch: DataFrame) -> DataFrame:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        return (
            ch.join(F.broadcast(dim), ch.o_custkey == dim.c_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.sum(sign).cast("long").alias("d_count"),
                F.sum(
                    sign
                    * F.round(F.col("o_totalprice") * 100).cast("long")
                ).cast("long").alias("d_cents"),
            )
        )

    loader = ChangeFeedLoader(src, tgt, app="mv/seg_join", fold=fold)
    src.create(orders.filter(F.col("o_orderkey") % 2 == 0).repartition(4))
    loader.run_once()
    src.append(orders.filter(F.col("o_orderkey") % 2 != 0).repartition(4))
    src.delete_where("o_orderstatus = 'O' AND o_orderkey % 7 = 3", mode="dv")
    loader.run_until_caught_up()
    return (
        tgt.read()
        .groupBy("c_mktsegment")
        .agg(
            F.sum("d_count").cast("long").alias("n_orders"),
            (F.sum("d_cents").cast("double") / 100.0).alias("total_price"),
        )
        .filter(F.col("n_orders") > 0)
        .orderBy("c_mktsegment")
    )


@query(
    "snapshot_bloom_point_read",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
    FROM orders
    WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM orders
                        WHERE o_orderkey % 2 = 1)
    ORDER BY o_orderkey
    """,
)
def snapshot_bloom_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom file skipping made oracle-visible: orders land in TWO
    interleaved appends (even keys, then odd keys) clustered by
    o_orderkey, so every file's [min,max] spans the whole key domain and
    range stats alone can skip nothing for a point probe. The per-file
    bloom on the leading cluster column can: a lookup of the smallest
    ODD key must skip at least one even-batch file (asserted) and still
    return the exact row. The point-lookup shape at 100 TB: O(bloom
    hits), not O(overlapping ranges)."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_bloom_") + "/orders"
    )
    # keep per-file rows under the bloom cap at every sf (blooms are
    # skipped on oversized files by design — range stats own that regime)
    n_files = max(4, int(orders.count()) // 120_000 + 1)
    t.create(
        orders.filter(F.col("o_orderkey") % 2 == 0).repartition(n_files),
        cluster_by=["o_orderkey"],
    )
    t.append(orders.filter(F.col("o_orderkey") % 2 != 0).repartition(n_files))
    key = (
        orders.filter(F.col("o_orderkey") % 2 != 0)
        .agg(F.min("o_orderkey"))
        .collect()[0][0]
    )
    df, report = t.read_where({"o_orderkey": (key, key)})
    assert report["files_skipped_by_bloom"] >= 1, report
    return df.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    ).orderBy("o_orderkey")


@query(
    "snapshot_expectations_ingest",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) FILTER (c_acctbal >= 0) AS BIGINT) AS n_ingested,
           CAST(COUNT(*) FILTER (c_acctbal < 0) AS BIGINT) AS n_quarantined
    FROM customer
    GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_expectations_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Delta-Live-Tables expectations pattern on CHECK constraints:
    the target table declares CHECK (c_acctbal >= 0); the ingest splits
    each batch on the expectation — passing rows append to the target,
    failing rows divert to a quarantine table — and the constraint is
    the BACKSTOP, not the router (appending the quarantine rows directly
    is asserted to raise). Per-segment ingested/quarantined counts must
    match the relational split. At 100 TB: the split is one predicate
    pass over the batch; the constraint re-check on the clean side is a
    second columnar pass over that batch only."""
    import tempfile

    from wopen_spark.snapshot_table import (
        ConstraintViolationError,
        SnapshotTable,
    )

    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    root = tempfile.mkdtemp(prefix="wopen_expect_")
    main = SnapshotTable(spark, root + "/customers")
    quarantine = SnapshotTable(spark, root + "/quarantine")
    main.create(customer.limit(0))
    main.add_constraint("acctbal_nonneg", "c_acctbal >= 0")
    quarantine.create(customer.limit(0))

    ok = customer.filter(F.col("c_acctbal") >= 0)
    bad = customer.filter(F.col("c_acctbal") < 0)
    main.append(ok.repartition(4))
    quarantine.append(bad.coalesce(1))
    if not bad.isEmpty():
        try:
            main.append(bad.limit(5))
            raise AssertionError("constraint backstop did not fire")
        except ConstraintViolationError:
            pass

    m = main.read().groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_ingested")
    )
    q = quarantine.read().groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_quarantined")
    )
    return (
        m.join(q, "c_mktsegment", "full_outer")
        .select(
            "c_mktsegment",
            F.coalesce("n_ingested", F.lit(0)).cast("long").alias("n_ingested"),
            F.coalesce("n_quarantined", F.lit(0))
            .cast("long")
            .alias("n_quarantined"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "snapshot_generated_column_read",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_generated_column_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALWAYS GENERATED AS, oracle-visible: the table declares a
    price_band generated column, orders stream in over two appends that
    do NOT carry the column (it computes at write), a third append
    SUPPLIES it correctly (validated, accepted), and the banded rollup
    read back from storage must match the relational CASE the oracle
    computes from raw orders. At 100 TB this is the materialized-derive
    pattern: the band computes once at ingest and every later read
    group-bys a stored column instead of re-evaluating the CASE."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    band_sql = (
        "CASE WHEN o_totalprice < 50000 THEN 'low' "
        "WHEN o_totalprice < 150000 THEN 'mid' ELSE 'high' END"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_gen_") + "/orders"
    )
    t.create(orders.limit(0))
    t.add_generated_column("price_band", band_sql, "string")
    t.append(orders.filter(F.col("o_orderkey") % 3 == 0).repartition(2))
    t.append(orders.filter(F.col("o_orderkey") % 3 == 1).repartition(2))
    supplied = orders.filter(F.col("o_orderkey") % 3 == 2).withColumn(
        "price_band", F.expr(band_sql)
    )
    t.append(supplied.repartition(2))  # validated against the rule
    return (
        t.read()
        .groupBy("price_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_orderkey").cast("long").alias("min_orderkey"),
        )
        .orderBy("price_band")
    )


@query(
    "snapshot_restore_read",
    oracle="""
    SELECT n_regionkey, CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_name
    FROM nation GROUP BY 1 ORDER BY 1
    """,
)
def snapshot_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE made oracle-visible: nation loads at v1, two destructive
    commits follow (a cow delete of region 0 and a dv delete of odd
    keys), then restore(v1) rolls the table back AS A NEW COMMIT —
    nothing rewritten, old files re-referenced, linear history
    (asserted) — and the restored read must hash-match the ORIGINAL
    relational state. The rollback story a 100 TB table needs after a
    bad pipeline deploy: O(metadata), not O(data)."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_restore_") + "/nation"
    )
    t.create(nation.coalesce(1), cluster_by=["n_nationkey"])
    t.delete_where("n_regionkey = 0")
    t.delete_where("n_nationkey % 2 = 1", mode="dv")
    assert t.read().count() < nation.count()
    v = t.restore(1)
    assert v == t.latest_version()
    ops = [h["operation"] for h in t.history()]
    assert ops == ["create", "delete", "delete", "restore"], ops
    return (
        t.read()
        .groupBy("n_regionkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nations"),
            F.min("n_name").alias("first_name"),
        )
        .orderBy("n_regionkey")
    )


@query(
    "snapshot_merge_cdc_apply",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
    ),
    applied AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 1
                  THEN CAST(c_acctbal + 100.0 AS DOUBLE) ELSE c_acctbal
             END AS c_acctbal,
             CASE WHEN c_custkey % 7 = 1 THEN 'UPDATED' ELSE c_mktsegment
             END AS c_mktsegment
      FROM base WHERE c_custkey % 7 <> 0
      UNION ALL
      SELECT c_custkey + 1000000000000, 'NEW-' || CAST(c_custkey AS VARCHAR),
             CAST(0.0 AS DOUBLE), 'CDC'
      FROM base WHERE c_custkey % 7 = 2
    )
    SELECT c_custkey, c_name, c_acctbal, c_mktsegment
    FROM applied ORDER BY c_custkey
    """,
)
def snapshot_merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-clause MERGE as the CDC-apply primitive, low-shuffle: one
    ``merge_into`` call replays a change batch carrying an ``op`` column
    (D = delete, U = update, I = insert) against a clustered
    SnapshotTable in ``mode="dv"`` — matched deletes and updates become
    deletion-vector masks plus appended update images, inserts append,
    and ZERO existing data files are rewritten (asserted: the write cost
    is O(changed rows), which is what CDC apply must cost at 100 TB —
    Delta calls this low-shuffle merge). The final merge-on-read scan
    must hash-match the oracle's relational replay of the same change
    batch. The op column itself never lands in the table: it drives the
    clause conditions as ``s.op`` and is excluded from insert images."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_merge_cdc_") + "/customer"
    )
    t.create(cust.repartition(4), cluster_by=["c_custkey"])

    k = F.col("c_custkey") % 7
    deletes = cust.filter(k == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    updates = cust.filter(k == 1).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("U").alias("op"),
    )
    inserts = cust.filter(k == 2).select(
        # 10^12: far above any replicated key domain (the scaled corpora
        # offset custkeys by replica*1e6 — a low offset COLLIDES with a
        # higher replica's keys at sf10+, and a colliding "insert" is a
        # matched row the engine rightly skips while a naive oracle
        # union double-counts it; caught by the sf10 gate)
        (F.col("c_custkey") + 1_000_000_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CDC").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    cdc = deletes.unionByName(updates).unionByName(inserts)

    rep = t.merge_into(
        cdc,
        "c_custkey",
        matched=[
            {"action": "delete", "cond": "s.op = 'D'"},
            {
                "action": "update",
                "cond": "s.op = 'U'",
                "set": {"c_acctbal": "s.c_acctbal", "c_mktsegment": "s.c_mktsegment"},
            },
        ],
        not_matched=[{"action": "insert", "cond": "s.op = 'I'"}],
        mode="dv",
    )
    assert rep["files_rewritten"] == 0, "dv CDC apply must not rewrite files"
    assert rep["files_masked"] >= 1, "expected masked files"
    return t.read().orderBy("c_custkey")


@query(
    "snapshot_merge_full_sync",
    oracle="""
    WITH current_state AS (
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 3 = 0
                  THEN CAST(s_acctbal * 2 AS DOUBLE) ELSE s_acctbal
             END AS s_acctbal,
             s_nationkey
      FROM supplier WHERE s_suppkey % 5 <> 0
      UNION ALL
      SELECT s_suppkey + 100000, CAST(1.0 AS DOUBLE), s_nationkey
      FROM supplier WHERE s_suppkey % 5 = 1
    )
    SELECT s_suppkey, s_acctbal, s_nationkey
    FROM current_state ORDER BY s_suppkey
    """,
)
def snapshot_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-to-source synchronization via NOT MATCHED BY SOURCE — the
    nightly "make the warehouse table equal the operational snapshot"
    shape: matched rows update only when the payload actually changed
    (a conditional clause keeps no-op rows in their files), source-only
    rows insert, and target rows the source no longer carries are
    deleted by the by-source clause. Full sync is inherently full-scan
    (asserted: stats skipping is disabled when a by-source clause is
    present — every live file must be probed for departed rows); the
    changed-row condition is what keeps the REWRITE set small. The final
    table must hash-match the oracle's re-derived source snapshot."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_acctbal", "s_nationkey"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_merge_sync_") + "/supplier"
    )
    t.create(supp.repartition(4), cluster_by=["s_suppkey"])

    src = (
        supp.filter(F.col("s_suppkey") % 5 != 0)
        .select(
            "s_suppkey",
            F.when(F.col("s_suppkey") % 3 == 0, F.col("s_acctbal") * 2)
            .otherwise(F.col("s_acctbal"))
            .alias("s_acctbal"),
            "s_nationkey",
        )
        .unionByName(
            supp.filter(F.col("s_suppkey") % 5 == 1).select(
                (F.col("s_suppkey") + 100_000).alias("s_suppkey"),
                F.lit(1.0).alias("s_acctbal"),
                "s_nationkey",
            )
        )
    )
    rep = t.merge_into(
        src,
        "s_suppkey",
        matched=[
            {
                "action": "update",
                "cond": "t.s_acctbal <> s.s_acctbal",
                "set": {"s_acctbal": "s.s_acctbal"},
            }
        ],
        not_matched=[{"action": "insert", "cond": None}],
        not_matched_by_source=[{"action": "delete", "cond": None}],
    )
    assert rep["files_skipped_by_stats"] == 0, "full sync must probe all files"
    return t.read().orderBy("s_suppkey")


@query(
    "snapshot_datasource_read",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice
    FROM part
    WHERE NOT (p_partkey % 6 = 2)
    ORDER BY p_partkey
    """,
)
def snapshot_datasource_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SnapshotTable behind Spark's STANDARD reader surface: the table is
    registered as a Python data source (``format("wopen_snapshot")``) and
    read back with ``spark.read`` after a dv delete and a column rename —
    the scan plans one task per live file, applies deletion vectors
    merge-on-read and the column mapping executor-side via pyarrow, and
    must hash-match the relational complement. Footer-stats/bloom filter
    pushdown (``pushFilters``) is exercised with an asserted file-skip:
    a point read schedules fewer tasks than the table has files, with
    identical results — the property that turns a 10k-file table's point
    query from 10k tasks into a handful at 100 TB."""
    import tempfile

    from wopen_spark.datasource import (
        _SnapshotBatchReader,
        _SnapshotBatchReaderPushdown,
        register_snapshot_datasource,
    )
    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    register_snapshot_datasource(spark)
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_retailprice").cast("double").alias("price")
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_ds_read_") + "/part"
    )
    t.create(part.repartition(4), cluster_by=["p_partkey"])
    t.delete_where("p_partkey % 6 = 2", mode="dv")
    t.rename_column("price", "p_retailprice")

    # pushdown: a point read must schedule strictly fewer file tasks
    probe = int(t.read().agg(F.min("p_partkey")).collect()[0][0])
    rd = _SnapshotBatchReaderPushdown(t.path, {})
    from pyspark.sql.datasource import EqualTo

    rd.pushFilters([EqualTo(("p_partkey",), probe)])
    n_pruned = len(rd.partitions())
    n_all = len(_SnapshotBatchReader(t.path, {}).partitions())
    assert n_pruned < n_all, f"pushdown skipped nothing ({n_pruned}/{n_all})"
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    point = (
        spark.read.format("wopen_snapshot")
        .option("pushdown", "true")
        .load(t.path)
        .filter(F.col("p_partkey") == probe)
    )
    assert point.count() == 1

    return (
        spark.read.format("wopen_snapshot")
        .load(t.path)
        .orderBy("p_partkey")
    )


@query(
    "snapshot_datasource_cdf_stream",
    oracle="""
    WITH live AS (
      SELECT event_type FROM events
      WHERE event_id % 200 = 0
        AND NOT (event_id % 1000 = 200)
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_live
    FROM live GROUP BY event_type ORDER BY event_type
    """,
)
def snapshot_datasource_cdf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change feed as a REAL Structured Streaming source: an upstream
    SnapshotTable takes three commits (create half, append the rest,
    dv-delete a slice), ``spark.readStream.format("wopen_snapshot")``
    drains the feed with an AvailableNow trigger, and each micro-batch
    folds its changes into signed per-type deltas landed exactly-once in
    a downstream delta table (epoch id = txn version). Offsets are table
    versions riding the stream checkpoint, so a commit is never half
    read. The MV — a sum over the landed deltas — must hash-match the
    oracle's from-scratch count of the final live rows. Same MV contract
    as snapshot_cdf_incremental_mv, but driven through Spark's streaming
    runtime instead of the pull loop."""
    import tempfile

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    register_snapshot_datasource(spark)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select("event_id", "event_type")
    )
    root = tempfile.mkdtemp(prefix="wopen_ds_cdf_")
    src = SnapshotTable(spark, root + "/events_src")
    src.create(
        ev.filter(F.col("event_id") % 400 == 0).repartition(2),
        cluster_by=["event_id"],
    )
    src.append(ev.filter(F.col("event_id") % 400 != 0).repartition(2))
    src.delete_where("event_id % 1000 = 200", mode="dv")

    tgt = SnapshotTable(spark, root + "/mv_deltas")
    tgt.create(
        local_df(spark, [], "event_type string, d_count long")
    )

    def land(batch: DataFrame, epoch: int) -> None:
        sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
            F.lit(-1)
        )
        tgt.append(
            batch.groupBy("event_type").agg(
                F.sum(sign).cast("long").alias("d_count")
            ),
            txn_app="mv/ds_cdf",
            txn_version=epoch,
        )

    q = (
        spark.readStream.format("wopen_snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load(src.path)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", root + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive and q.exception() is None, q.exception()

    return (
        tgt.read()
        .groupBy("event_type")
        .agg(F.sum("d_count").cast("long").alias("n_live"))
        .filter(F.col("n_live") > 0)
        .orderBy("event_type")
    )


@query(
    "snapshot_datasource_write_read",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE c_custkey % 2 = 0
    ORDER BY c_custkey
    """,
)
def snapshot_datasource_write_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The writer side of the data source: ``df.write.format(
    "wopen_snapshot")`` CREATES the table on first save (executors
    stream arrow shards, the driver commit derives footer stats and
    lands one atomic log record), a second save with
    ``mode("overwrite")`` replaces the contents transactionally, and the
    read back through the same format must hash-match the oracle. Time
    travel across the overwrite is asserted — the overwritten version
    stays readable, proving the writer went through the log, not past
    it."""
    import tempfile

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    register_snapshot_datasource(spark)
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    path = tempfile.mkdtemp(prefix="wopen_ds_write_") + "/customer"
    cust.repartition(4).write.format("wopen_snapshot").mode("append").save(path)
    cust.filter(F.col("c_custkey") % 2 == 0).repartition(2).write.format(
        "wopen_snapshot"
    ).mode("overwrite").save(path)

    t = SnapshotTable(spark, path)
    assert t.latest_version() == 2
    assert t.read(version=1).count() == cust.count(), "history must survive"
    return (
        spark.read.format("wopen_snapshot").load(path).orderBy("c_custkey")
    )


@query("sql_merge_cdc_apply", oracle=ORACLES["snapshot_merge_cdc_apply"])
def sql_merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME CDC apply as snapshot_merge_cdc_apply, driven entirely
    from SQL text: the standard MERGE INTO statement (conditional
    matched DELETE/UPDATE, NOT MATCHED INSERT, with the change batch as
    a temp view) is parsed by the DML front-door and dispatched to the
    transactional multi-clause merge. Shared oracle — the SQL surface,
    the DataFrame surface, and the relational replay are pinned to one
    answer."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_merge

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_sql_merge_") + "/customer"
    )
    t.create(cust.repartition(4), cluster_by=["c_custkey"])

    k = F.col("c_custkey") % 7
    deletes = cust.filter(k == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    updates = cust.filter(k == 1).select(
        "c_custkey",
        "c_name",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("U").alias("op"),
    )
    inserts = cust.filter(k == 2).select(
        (F.col("c_custkey") + 1_000_000_000_000).alias("c_custkey"),
        F.concat(F.lit("NEW-"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("CDC").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    deletes.unionByName(updates).unionByName(inserts).createOrReplaceTempView(
        "customer_cdc_batch"
    )
    rep = execute_merge(
        spark,
        """
        MERGE INTO customer_tbl AS trg
        USING customer_cdc_batch AS src
        ON trg.c_custkey = src.c_custkey
        WHEN MATCHED AND src.op = 'D' THEN DELETE
        WHEN MATCHED AND src.op = 'U' THEN
          UPDATE SET c_acctbal = src.c_acctbal, c_mktsegment = src.c_mktsegment
        WHEN NOT MATCHED AND src.op = 'I' THEN INSERT *
        """,
        tables={"customer_tbl": t},
        mode="dv",
    )
    assert rep["files_rewritten"] == 0
    return t.read().orderBy("c_custkey")


@query(
    "snapshot_maintain_read",
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM part
    WHERE NOT (p_partkey % 9 = 4)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def snapshot_maintain_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance changes ZERO logical rows, value-checked: part lands
    in five small ingest epochs, a dv delete masks a slice, then
    ``maintain()`` — the auto-compaction policy call — bin-packs the
    small files AND purges the mask (asserted: fewer files, no dvs,
    dataChange=false so CDF stays silent), and a post-vacuum read of the
    maintained table must hash-match the oracle's aggregate over the
    logical rows. The under-threshold no-op is asserted first (zero
    commits): maintenance that rewrites eagerly is how small-file churn
    turns into write amplification at 100 TB."""
    import tempfile

    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", F.col("p_retailprice").cast("double").alias("p_retailprice")
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_maintain_") + "/part"
    )
    t.create(
        part.filter(F.col("p_partkey") % 5 == 0).repartition(2),
        cluster_by=["p_partkey"],
    )
    for i in range(1, 5):
        t.append(part.filter(F.col("p_partkey") % 5 == i).repartition(2))
    v = t.latest_version()
    rep = t.maintain(min_small_files=1000)  # under threshold: must no-op
    assert not rep["binpacked"] and t.latest_version() == v, rep

    t.delete_where("p_partkey % 9 = 4", mode="dv")
    n_before = len(t._state()["files"])
    rep = t.maintain(min_small_files=4, vacuum_retain_last=1)
    assert rep["binpacked"], rep
    st = t._state()
    assert len(st["files"]) < n_before and not st["dvs"]
    assert rep.get("vacuum_removed", 0) >= 1

    return (
        t.read()
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("p_brand")
    )


@query(
    "sql_update_where",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_partkey % 7 = 3 THEN p_brand || '-X' ELSE p_brand END AS p_brand,
           CASE WHEN p_partkey % 7 = 3 AND p_retailprice > 1400
                THEN CAST(p_retailprice AS DOUBLE) * 2
                ELSE CAST(p_retailprice AS DOUBLE) END AS p_retailprice
    FROM part
    ORDER BY p_partkey
    """,
)
def sql_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``UPDATE`` statement (r8 verdict #2): parsed by the DML
    front-door and dispatched to the transactional ``update_where`` in
    dv mode (masks the matched rows, appends updated images — O(changed
    rows), zero rewrites, asserted). The SET list carries a CASE WHEN ..
    END expression — the exact shape the r8 regex splitter truncated —
    so the scanner parse is pinned end-to-end, not just in unit tests."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_update

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_sql_upd_") + "/part"
    )
    t.create(part.repartition(4), cluster_by=["p_partkey"])
    rep = execute_update(
        spark,
        """
        UPDATE part_tbl AS p
        SET p_retailprice = CASE WHEN p.p_retailprice > 1400
                                 THEN p.p_retailprice * 2
                                 ELSE p.p_retailprice END,
            p_brand = concat(p.p_brand, '-X')
        WHERE p.p_partkey % 7 = 3
        """,
        tables={"part_tbl": t},
        mode="dv",
    )
    assert rep["files_rewritten"] == 0, rep
    return t.read().orderBy("p_partkey")


@query(
    "sql_delete_where",
    oracle="""
    SELECT p_partkey, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    WHERE NOT (p_partkey % 9 = 4 OR p_brand = 'Brand#33')
    ORDER BY p_partkey
    """,
)
def sql_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``DELETE FROM`` statement (r8 verdict #2) through the DML
    front-door into ``delete_where``: cow mode first (whole-table update
    of the files holding matches), then a second dv-mode delete proves
    both modes compose on one table; the survivors hash-match the
    relational complement."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_delete

    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_sql_del_") + "/part"
    )
    t.create(part.repartition(4), cluster_by=["p_partkey"])
    execute_delete(
        spark,
        "DELETE FROM part_tbl WHERE p_partkey % 9 = 4",
        tables={"part_tbl": t},
    )
    rep = execute_delete(
        spark,
        "DELETE FROM part_tbl AS p WHERE p.p_brand = 'Brand#33'",
        tables={"part_tbl": t},
        mode="dv",
    )
    assert rep["files_rewritten"] == 0, rep
    return t.read().orderBy("p_partkey")


@query(
    "sql_merge_explicit_insert",
    oracle="""
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey % 3 = 0
    UNION ALL
    SELECT c_custkey, 'NEW-' || c_name, CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey % 3 = 1 AND c_acctbal >= 0
    UNION ALL
    SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE)
    FROM customer WHERE c_custkey % 3 = 1 AND c_acctbal < 0
    ORDER BY c_custkey
    """,
)
def sql_merge_explicit_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-column ``INSERT (cols) VALUES (exprs)`` in SQL MERGE
    (r8 verdict #7, the Delta surface): the first insert clause claims
    non-negative-balance rows with a transformed name and an unmentioned
    (NULL) balance; the rest fall through to ``INSERT *`` —
    first-match-wins across the insert clause list, proven against the
    relational three-way union."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_merge

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_sql_ins_") + "/customer"
    )
    t.create(
        cust.filter(F.col("c_custkey") % 3 == 0).repartition(4),
        cluster_by=["c_custkey"],
    )
    cust.filter(F.col("c_custkey") % 3 == 1).createOrReplaceTempView(
        "cust_ins_src"
    )
    execute_merge(
        spark,
        """
        MERGE INTO tgt t USING cust_ins_src s ON t.c_custkey = s.c_custkey
        WHEN NOT MATCHED AND s.c_acctbal >= 0 THEN
          INSERT (c_custkey, c_name) VALUES (s.c_custkey, concat('NEW-', s.c_name))
        WHEN NOT MATCHED THEN INSERT *
        """,
        tables={"tgt": t},
    )
    return t.read().orderBy("c_custkey")


@query(
    "sql_insert_into",
    oracle="""
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier WHERE s_suppkey % 4 = 0
    UNION ALL
    SELECT s_suppkey, s_name, CAST(s_acctbal AS DOUBLE)
    FROM supplier WHERE s_suppkey % 4 <> 0 AND s_suppkey % 2 = 0
    UNION ALL
    SELECT s_suppkey, upper(s_name), CAST(NULL AS DOUBLE)
    FROM supplier WHERE s_suppkey % 2 = 1
    ORDER BY s_suppkey
    """,
)
def sql_insert_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``INSERT INTO`` statement (r9 — completes the DML quartet
    next to MERGE/UPDATE/DELETE): a SELECT-form full-arity insert, then
    an explicit-column insert whose unlisted column lands NULL, both
    dispatched to the transactional append with ANSI positional
    store-assignment coercion. Read back against the three-way
    relational union."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_insert

    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
    )
    t = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="wopen_sql_insert_") + "/supplier"
    )
    t.create(
        supp.filter(F.col("s_suppkey") % 4 == 0).repartition(2),
        cluster_by=["s_suppkey"],
    )
    supp.createOrReplaceTempView("supplier_ins_src")
    execute_insert(
        spark,
        """
        INSERT INTO supp_tbl
        SELECT s_suppkey, s_name, s_acctbal FROM supplier_ins_src
        WHERE s_suppkey % 4 <> 0 AND s_suppkey % 2 = 0
        """,
        tables={"supp_tbl": t},
    )
    execute_insert(
        spark,
        """
        INSERT INTO supp_tbl (s_suppkey, s_name)
        SELECT s_suppkey, upper(s_name) FROM supplier_ins_src
        WHERE s_suppkey % 2 = 1
        """,
        tables={"supp_tbl": t},
    )
    return t.read().orderBy("s_suppkey")


@query(
    "snapshot_datasource_cdf_batch",
    oracle="""
    WITH live AS (
      SELECT event_type FROM events
      WHERE event_id % 200 = 0
        AND NOT (event_id % 1000 = 200)
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_live
    FROM live GROUP BY event_type ORDER BY event_type
    """,
)
def snapshot_datasource_cdf_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH change-feed reads through the standard reader (r9 — the
    Delta batch-CDF surface): the same three-commit upstream as the
    streaming variant, read as TWO bounded windows
    (``afterVersion``/``endingVersion``) whose signed fold must
    reconstruct the final live counts — proving window splitting loses
    and duplicates nothing. Along the way: the second window alone must
    contain ONLY deletes (the dv commit), and an empty window returns
    zero rows."""
    import tempfile

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.queries.registry import _t
    from wopen_spark.snapshot_table import SnapshotTable

    register_snapshot_datasource(spark)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % 200 == 0)
        .select("event_id", "event_type")
    )
    root = tempfile.mkdtemp(prefix="wopen_ds_cdf_batch_")
    src = SnapshotTable(spark, root + "/events_src")
    src.create(
        ev.filter(F.col("event_id") % 400 == 0).repartition(2),
        cluster_by=["event_id"],
    )
    src.append(ev.filter(F.col("event_id") % 400 != 0).repartition(2))
    src.delete_where("event_id % 1000 = 200", mode="dv")

    def window(lo: int, hi: int) -> DataFrame:
        return (
            spark.read.format("wopen_snapshot")
            .option("readChangeFeed", "true")
            .option("afterVersion", lo)
            .option("endingVersion", hi)
            .load(src.path)
        )

    w2 = window(2, 3)
    assert w2.select("_change_type").distinct().collect() == [
        ("delete",)
    ], "the dv-commit window must be deletes only"
    assert window(3, 3).count() == 0, "empty window must be empty"

    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    folded = window(0, 2).unionByName(w2)
    return (
        folded.groupBy("event_type")
        .agg(F.sum(sign).cast("long").alias("n_live"))
        .filter(F.col("n_live") > 0)
        .orderBy("event_type")
    )


@query(
    "sql_catalog_dml",
    oracle="""
    WITH updated AS (
      SELECT p_partkey, p_brand,
             CASE WHEN p_partkey % 5 = 0
                  THEN CAST(p_retailprice AS DOUBLE) * 2
                  ELSE CAST(p_retailprice AS DOUBLE) END AS p_retailprice
      FROM part
    ), kept AS (
      SELECT * FROM updated WHERE p_brand <> 'Brand#45'
    ), inserted AS (
      SELECT p_partkey + 1000000 AS p_partkey, p_brand,
             CAST(p_retailprice AS DOUBLE) AS p_retailprice
      FROM part WHERE p_partkey % 100 = 7
    )
    SELECT * FROM kept UNION ALL SELECT * FROM inserted
    ORDER BY p_partkey
    """,
)
def sql_catalog_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The named-table catalog end-to-end (r9 verdict #1 — the
    reference's ``BigqueryTable(dataset_id, table_id)`` two-level-name
    contract, /root/reference/custom_search_extraction.py:35-42): a
    table registered as ``crm.parts`` in a persisted Catalog is driven
    through UPDATE, DELETE and INSERT purely BY NAME via ``execute_sql
    (catalog=...)`` — no path, no tables dict — and the final state is
    read back through the standard datasource's ``wopen://crm.parts``
    route, so both by-name surfaces (SQL resolution and the
    catalogRoot reader) are load-bearing in one oracle."""
    import tempfile

    from wopen_spark.catalog import Catalog
    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.snapshot_table import SnapshotTable
    from wopen_spark.sql_dml import execute_sql

    register_snapshot_datasource(spark)
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    root = tempfile.mkdtemp(prefix="wopen_cat_dml_")
    t = SnapshotTable(spark, root + "/parts")
    t.create(part.repartition(4), cluster_by=["p_partkey"])
    cat = Catalog(root + "/catalog")
    cat.register("crm.parts", t.path)

    execute_sql(
        spark,
        "UPDATE crm.parts SET p_retailprice = p_retailprice * 2 "
        "WHERE p_partkey % 5 = 0",
        catalog=cat,
        mode="dv",
    )
    execute_sql(
        spark, "DELETE FROM crm.parts WHERE p_brand = 'Brand#45'", catalog=cat
    )
    part.createOrReplaceTempView("catalog_parts_src")
    execute_sql(
        spark,
        "INSERT INTO crm.parts "
        "SELECT p_partkey + 1000000, p_brand, p_retailprice "
        "FROM catalog_parts_src WHERE p_partkey % 100 = 7",
        catalog=cat,
    )
    hist = execute_sql(spark, "DESCRIBE HISTORY crm.parts", catalog=cat)
    assert hist.count() == 4, "create + three DML commits"
    return (
        spark.read.format("wopen_snapshot")
        .option("catalogRoot", root + "/catalog")
        .load("wopen://crm.parts")
        .orderBy("p_partkey")
    )


@query(
    "snapshot_datasource_schema_evolution",
    oracle="""
    SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
           CAST(NULL AS DOUBLE) AS s_acctbal
    FROM supplier WHERE s_suppkey % 3 = 0
    UNION ALL
    SELECT CAST(s_suppkey AS BIGINT), s_name, CAST(s_acctbal AS DOUBLE)
    FROM supplier WHERE s_suppkey % 3 = 1
    UNION ALL
    SELECT CAST(s_suppkey AS BIGINT), s_name, CAST(NULL AS DOUBLE)
    FROM supplier WHERE s_suppkey % 3 = 2
    ORDER BY s_suppkey
    """,
)
def snapshot_datasource_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the STANDARD writer (r9 verdict #3):
    ``df.write.format("wopen_snapshot").option("mergeSchema", "true")``
    appends (1) a batch that WIDENS the key (int -> long) and adds a new
    nullable column, then (2) a subset-schema batch omitting it — the
    engine's evolution rules (additive nullable, lossless widening,
    subset NULL-fill) reached with zero engine-class calls on the write
    path. Read back through the datasource; pre-evolution rows NULL-fill
    the new column and narrow files read through the widened schema."""
    import tempfile

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.snapshot_table import SnapshotTable

    register_snapshot_datasource(spark)
    supp = _t(spark, sf_dir, "supplier")
    root = tempfile.mkdtemp(prefix="wopen_ds_evolve_") + "/supplier"
    t = SnapshotTable(spark, root)
    t.create(
        supp.filter(F.col("s_suppkey") % 3 == 0)
        .select(F.col("s_suppkey").cast("int").alias("s_suppkey"), "s_name")
        .repartition(2)
    )
    (
        supp.filter(F.col("s_suppkey") % 3 == 1)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .repartition(2)
        .write.format("wopen_snapshot")
        .option("mergeSchema", "true")
        .mode("append")
        .save(root)
    )
    (
        supp.filter(F.col("s_suppkey") % 3 == 2)
        .select(F.col("s_suppkey").cast("long").alias("s_suppkey"), "s_name")
        .repartition(2)
        .write.format("wopen_snapshot")
        .option("mergeSchema", "true")
        .mode("append")
        .save(root)
    )
    out = spark.read.format("wopen_snapshot").load(root)
    assert dict(out.dtypes) == {
        "s_suppkey": "bigint", "s_name": "string", "s_acctbal": "double"
    }, out.dtypes
    return out.orderBy("s_suppkey")


@query(
    "snapshot_datasource_vacuum_recovery",
    oracle="""
    WITH live AS (
      SELECT p_brand FROM part
      WHERE NOT (p_partkey % 3 = 0)
      UNION ALL
      SELECT p_brand FROM part WHERE p_partkey % 100 = 7
    )
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_live
    FROM live GROUP BY p_brand ORDER BY p_brand
    """,
)
def snapshot_datasource_vacuum_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``onVacuumedStart=snapshot`` end to end (r9 verdict #2): a
    checkpointed CDF stream maintains a signed per-brand count MV; the
    consumer falls behind retention (cow delete + vacuum reclaim its
    resume window), and the restarted stream recovers by folding the
    head snapshot — rows tagged ``_change_type='snapshot'``, the
    one-predicate signal to REPLACE the MV instead of folding deltas —
    then consumes incrementally again from the SAME checkpoint. The MV
    must equal the direct recompute of the final live rows. Everything
    is distributed: the MV is a delta-log SnapshotTable, the consumer
    never collects data rows."""
    import tempfile

    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.snapshot_table import SnapshotTable, VacuumedVersionError

    register_snapshot_datasource(spark)
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    root = tempfile.mkdtemp(prefix="wopen_ds_vacrec_")
    src = SnapshotTable(spark, root + "/src")
    src.create(part.filter(F.col("p_partkey") % 2 == 0).repartition(2))
    src.append(part.filter(F.col("p_partkey") % 2 == 1).repartition(2))
    mv = SnapshotTable(spark, root + "/mv")
    mv.create(
        local_df(spark, [], "p_brand string, delta long")
    )

    def fold(b, _eid):
        # ONE scan of the batch (each scan re-reads the CDF through the
        # Python datasource): fold the snapshot-recovery flag into the
        # same per-brand aggregate, persist the (bounded, |brands|-row)
        # result, and decide replace-vs-fold from it — the probe job and
        # the delta job used to each re-read the source (guide §2.4)
        sign = F.when(F.col("_change_type") == "delete", F.lit(-1)).otherwise(
            F.lit(1)
        )
        ag = (
            b.groupBy("p_brand")
            .agg(
                F.sum(sign).alias("delta"),
                F.max(
                    (F.col("_change_type") == "snapshot").cast("int")
                ).alias("_snap"),
            )
            .persist()
        )
        try:
            is_snapshot = bool(
                ag.agg(F.max("_snap")).collect()[0][0] or 0
            )
            deltas = ag.select("p_brand", "delta")
            if is_snapshot:
                mv.overwrite(deltas)  # recovery batch REPLACES the MV
            else:
                mv.append(deltas)
        finally:
            ag.unpersist()

    def drain():
        q = (
            spark.readStream.format("wopen_snapshot")
            .option("readChangeFeed", "true")
            .option("afterVersion", 0)
            .option("onVacuumedStart", "snapshot")
            .load(src.path)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", root + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()  # caught up through the two insert commits
    src.delete_where("p_partkey % 3 = 0")  # cow: rewrites, removes files
    src.vacuum(retain_last=1, orphan_grace_s=0.0)
    try:  # the resume window (2, head] must actually be gone
        src.read_changes(2)
        raise AssertionError("expected the resume window to be vacuumed")
    except VacuumedVersionError:
        pass
    drain()  # recovery: head snapshot replaces the MV
    src.append(
        part.filter(F.col("p_partkey") % 100 == 7)
        .withColumn("p_partkey", F.col("p_partkey") + 10_000_000)
        .repartition(2)
    )
    drain()  # incremental again from the same checkpoint
    return (
        mv.read()
        .groupBy("p_brand")
        .agg(F.sum("delta").cast("long").alias("n_live"))
        .filter(F.col("n_live") > 0)
        .orderBy("p_brand")
    )


@query(
    "sql_ddl_lifecycle",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(c_acctbal AS DOUBLE) AS balance,
           CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS tier
    FROM customer WHERE c_custkey % 2 = 0
    UNION ALL
    SELECT CAST(c_custkey + 9000000 AS BIGINT), 0.0, 'new'
    FROM customer WHERE c_custkey % 1000 = 1
    ORDER BY c_custkey
    """,
)
def sql_ddl_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full SQL-only DDL evolution arc (r10): CTAS materializes a
    clustered table from a SELECT, then the ALTER TABLE family reshapes
    it — ADD COLUMN (NULL-fill, O(metadata)), a dv UPDATE fills the new
    column, RENAME COLUMN (mapping-only), lossless int->bigint widening
    (old narrow files read through the widened schema), DROP COLUMN
    (physical retired), a CHECK constraint validated against the whole
    table, and a catalog-level RENAME TO — with an INSERT through the
    fully-evolved schema and the final state read back over the
    datasource's ``wopen://`` route. Every step is an O(metadata)
    commit except the UPDATE and INSERT: at 100 TB this whole chain
    (minus the backfill) costs log writes, never a data rewrite."""
    import tempfile

    from wopen_spark.catalog import Catalog
    from wopen_spark.datasource import register_snapshot_datasource
    from wopen_spark.sql_dml import execute_sql

    register_snapshot_datasource(spark)
    _t(spark, sf_dir, "customer").createOrReplaceTempView("ddl_custs_src")
    root = tempfile.mkdtemp(prefix="wopen_ddl_")
    cat = Catalog(root + "/catalog")
    execute_sql(
        spark,
        "CREATE TABLE crm.custs CLUSTER BY (c_custkey) AS "
        "SELECT CAST(c_custkey AS INT) AS c_custkey, c_name, "
        "CAST(c_acctbal AS DOUBLE) AS bal "
        "FROM ddl_custs_src WHERE c_custkey % 2 = 0",
        catalog=cat,
    )
    ex = lambda s: execute_sql(spark, s, catalog=cat, mode="dv")  # noqa: E731
    ex("ALTER TABLE crm.custs ADD COLUMN tier STRING")
    ex(
        "UPDATE crm.custs SET tier = CASE WHEN bal > 5000 "
        "THEN 'gold' ELSE 'std' END"
    )
    ex("ALTER TABLE crm.custs RENAME COLUMN bal TO balance")
    ex("ALTER TABLE crm.custs ALTER COLUMN c_custkey TYPE BIGINT")
    ex("ALTER TABLE crm.custs DROP COLUMN c_name")
    ex("ALTER TABLE crm.custs ADD CONSTRAINT bal_known CHECK (balance IS NOT NULL)")
    ex("ALTER TABLE crm.custs RENAME TO crm.customers")
    ex(
        "INSERT INTO crm.customers "
        "SELECT c_custkey + 9000000, 0.0, 'new' "
        "FROM ddl_custs_src WHERE c_custkey % 1000 = 1"
    )
    desc = execute_sql(spark, "DESCRIBE crm.customers", catalog=cat).collect()
    assert [(r.col_name, r.data_type) for r in desc] == [
        ("c_custkey", "bigint"), ("balance", "double"), ("tier", "string")
    ], "evolved schema must be (c_custkey bigint, balance double, tier string)"
    return (
        spark.read.format("wopen_snapshot")
        .option("catalogRoot", root + "/catalog")
        .load("wopen://crm.customers")
        .orderBy("c_custkey")
    )


@query(
    "convert_in_place_orders",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def convert_in_place_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-place parquet adoption (r10 — the ``CONVERT TO DELTA``
    analog): an existing parquet file is adopted AS a snapshot table
    with zero bytes copied (the symlink stands in for "the 100 TB
    directory stays where it is"), footer stats derive the manifest,
    and the adopted file immediately participates in the full engine —
    here a merge-on-read dv delete masks rows of a file the engine
    never wrote. At scale: conversion is O(files) footer reads (fanned
    out to executors past 64 files) + one log write; the data plane
    never moves."""
    import os
    import shutil
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    root = tempfile.mkdtemp(prefix="wopen_convert_") + "/orders"
    os.makedirs(root)
    src = os.path.abspath(os.path.join(sf_dir, "orders.parquet"))
    # the sf table is a single file at small SFs and a directory of
    # part files at large ones — adopt whichever shape exists
    pairs = (
        [(os.path.join(src, n), n) for n in sorted(os.listdir(src))
         if n.endswith(".parquet")]
        if os.path.isdir(src)
        else [(src, "orders.parquet")]
    )
    for s, n in pairs:
        dst = os.path.join(root, n)
        try:
            os.symlink(s, dst)
        except OSError:
            shutil.copyfile(s, dst)
    t = SnapshotTable(spark, root)
    t.convert_from_parquet()
    t.delete_where("o_orderkey % 7 = 0", mode="dv")
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double").alias("total"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "copy_into_exactly_once",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def copy_into_exactly_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``COPY INTO`` exactly-once ingestion (r10): a landing directory
    receives batch-1 files, is copied, RE-copied (the rerun must load
    zero files — the crash/scheduler-retry contract), then receives
    batch-2 and is copied again with a glob spanning both batches — the
    already-loaded files skip on identity, only batch-2 loads, and the
    final table equals the full source exactly once. At scale the
    loaded-file set is a dict diff folded into state/checkpoints (never
    a log scan), so a nightly copy over a million-file landing zone
    costs its NEW files only."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    root = tempfile.mkdtemp(prefix="wopen_copy_")
    inbox = root + "/inbox"
    li.filter(F.col("l_orderkey") % 2 == 0).repartition(4).write.parquet(
        inbox + "/batch1"
    )
    t = SnapshotTable(spark, root + "/t")
    t.create(local_df(spark, [], li.schema))
    r1 = t.copy_into(inbox, pattern="batch1/*.parquet")
    assert r1["files_loaded"] > 0
    r2 = t.copy_into(inbox, pattern="batch1/*.parquet")
    assert (r2["files_loaded"], r2["version"]) == (0, r1["version"]), (
        "rerun must be a no-op"
    )
    li.filter(F.col("l_orderkey") % 2 == 1).repartition(4).write.parquet(
        inbox + "/batch2"
    )
    r3 = t.copy_into(inbox, pattern="batch*/*.parquet")
    assert r3["files_skipped"] == r1["files_loaded"], (
        "batch1 files must skip by identity"
    )
    return (
        t.read()
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(28,2)"))
            .cast("double").alias("qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "identity_column_inserts",
    oracle="""
    WITH e AS (
      SELECT c_name, row_number() OVER (ORDER BY c_custkey) AS rn
      FROM customer WHERE c_custkey % 2 = 0
    ), o AS (
      SELECT c_name, row_number() OVER (ORDER BY c_custkey) AS rn
      FROM customer WHERE c_custkey % 2 = 1
    ), ne AS (SELECT COUNT(*) AS n FROM e)
    SELECT CAST(1000 + 3 * (rn - 1) AS BIGINT) AS id, c_name FROM e
    UNION ALL
    SELECT CAST((SELECT 1000 + 3 * (n - 1) FROM ne) + 3 * rn AS BIGINT),
           c_name
    FROM o
    ORDER BY id
    """,
)
def identity_column_inserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY end-to-end (r10): a table declared
    with START WITH 1000 INCREMENT BY 3 assigns engine-side ids on two
    append batches; the second batch allocates above the first's
    recorded high-water mark. Inputs are single-partition and sorted so
    the map-side allocation (high + step * (monotonic + 1)) is exactly
    the oracle's row_number arithmetic — making the whole allocation
    path (base resolution, footer-stats high-water advance, cross-commit
    continuation) VALUE-checked, not just uniqueness-checked. At scale
    assignment is shuffle-free and the high-water advance reads footer
    stats, never the data."""
    import tempfile

    from wopen_spark.snapshot_table import SnapshotTable

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    t = SnapshotTable(spark, tempfile.mkdtemp(prefix="wopen_ident_") + "/t")
    t.create(local_df(spark, [], "id long, c_name string"))
    t.set_identity_column("id", start=1000, step=3)

    def batch(parity):
        return (
            cust.filter(F.col("c_custkey") % 2 == parity)
            .repartition(1)
            .sortWithinPartitions("c_custkey")
            .select("c_name")
        )

    t.append(batch(0))
    t.append(batch(1))
    return t.read().orderBy("id")
