"""Iterative-algorithm coverage: connected components over the MinHash-LSH
candidate pairs = transitive near-dup clusters. The DuckDB oracle computes
the same fixpoint with a recursive CTE (transitive closure + min over the
reachable set), so even the ITERATIVE operator is value-checked, not just
rows-counted."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.operators.dedup import minhash_lsh_candidates
from wopen_spark.operators.graph import connected_components
from wopen_spark.queries.dedup import DUCK_LSH_PAIRS
from wopen_spark.queries.registry import _spread, _t, query


@query(
    "near_dup_components",
    oracle=f"""
    WITH RECURSIVE pairs AS ({DUCK_LSH_PAIRS}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, MIN(b) AS component
    FROM reach GROUP BY a ORDER BY doc_id
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: min-label propagation over the LSH candidate
    graph (one join+agg per iteration, lineage checkpointed) vs. a
    recursive-CTE transitive closure in DuckDB."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).filter(
        F.regexp_count(F.col("text"), F.lit(r"\S+")) >= 3
    )
    pairs = minhash_lsh_candidates(
        d, id_col="doc_id", text_col="text", n_hashes=8, n_bands=4
    )
    comps = connected_components(pairs, src="id_a", dst="id_b")
    return comps.select(
        F.col("node").alias("doc_id"), "component"
    ).orderBy("doc_id")
