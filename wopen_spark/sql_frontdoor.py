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

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from wopen_spark.tables import load_testdata


def register_frontdoor(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register base tables + operator views; returns the view names."""
    from wopen_spark.functions.text import doc_fingerprint
    from wopen_spark.operators.dedup import minhash_lsh_candidates
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
    return ["doc_fingerprints", "lsh_candidate_pairs"]
