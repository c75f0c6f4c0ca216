"""SQL front-door: the operator library reachable from pure SQL.

The reference ships ``sql/*.sql`` entry points run by BigQuery
(/root/reference/sql/get_custom_search_data.sql et al.); the engine's
equivalent is ``spark.sql`` over registered views. ``register_frontdoor``
registers every testdata table PLUS operator-derived views (exact-dedup
fingerprints, LSH candidate pairs), so a SQL-only user can run dedup and
near-dup analyses without touching the DataFrame API.

The operator views are lazy logical plans, not materialized snapshots:
a SQL query over them composes into ONE Catalyst plan — filters written
in SQL push down through the view into the parquet scans, and the views'
internal exchanges participate in reuse like any DataFrame pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.tables import load_testdata

# Connected components is ITERATIVE (each register would rerun the label
# loop eagerly — its convergence witness collects). The resolved frame
# is memoized INSIDE the near_dup_components query (per session+sf_dir,
# DISK_ONLY-persisted), so the suite run and the whole SQL surface
# share ONE resolution per process: when the registry query already ran
# in this session, registering the view here is free.
def _near_dup_components_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wopen_spark.queries.registry import QUERIES

    return QUERIES["near_dup_components"](spark, sf_dir)


def register_frontdoor(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + operator views; returns the view names.

    The operator views reachable from pure SQL now span the flagship
    families: exact dedup (``doc_fingerprints``), near-dup candidates
    (``lsh_candidate_pairs``), GRAPH clustering
    (``near_dup_components``), and SIMILARITY
    (``fuzzy_type_brand_top1`` — the reference's J8 fuzzy top-1 join as
    a relation)."""
    from wopen_spark.functions.text import doc_fingerprint
    from wopen_spark.operators.dedup import minhash_lsh_candidates
    from wopen_spark.operators.similarity import fuzzy_top1_join
    from wopen_spark.queries.dedup import _lsh_reps
    from wopen_spark.queries.registry import _spread, _t

    load_testdata(spark, sf_dir)
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    d.select(
        "doc_id", "source", doc_fingerprint(F.col("text")).alias("fingerprint")
    ).createOrReplaceTempView("doc_fingerprints")
    minhash_lsh_candidates(
        _lsh_reps(spark, sf_dir), id_col="doc_id", text_col="text",
        n_hashes=8, n_bands=4,
    ).createOrReplaceTempView("lsh_candidate_pairs")
    _near_dup_components_df(spark, sf_dir).createOrReplaceTempView(
        "near_dup_components"
    )
    p = _t(spark, sf_dir, "part")
    fuzzy_top1_join(
        p.select("p_type").distinct(), p.select("p_brand").distinct(),
        "p_type", "p_brand",
    ).select("p_type", "p_brand", "similarity").createOrReplaceTempView(
        "fuzzy_type_brand_top1"
    )
    return [
        "doc_fingerprints",
        "lsh_candidate_pairs",
        "near_dup_components",
        "fuzzy_type_brand_top1",
    ]


def register_snapshot_view(
    spark: SparkSession, table, name: str, version: int | None = None,
    asof_ts: float | None = None,
) -> str:
    """Expose a SnapshotTable — at head or any historical version — as a
    SQL view: the ``VERSION AS OF`` front-door. The view pins the file
    list at registration (snapshot isolation), so SQL over it is stable
    under concurrent commits; register again to follow the head."""
    table.read(version=version, asof_ts=asof_ts).createOrReplaceTempView(name)
    return name


def register_catalog_views(
    spark: SparkSession, catalog, names: list[str] | None = None
) -> dict[str, str]:
    """Expose every (or the named subset of) catalog-registered table as
    a SQL view in one call — the by-name complement of
    :func:`register_snapshot_view`. Dots in registered names become
    ``__`` in the view name (Spark temp views are single-level):
    ``crm.events`` -> ``crm__events``. Returns {registered name: view
    name}. Views pin the head snapshot at registration; call again to
    follow new commits."""
    out: dict[str, str] = {}
    for name in names if names is not None else catalog.tables():
        view = name.replace(".", "__")
        register_snapshot_view(spark, catalog.handle(spark, name), view)
        out[name] = view
    return out
