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
from wopen_spark.queries.dedup import DUCK_LSH_PAIRS, DUCK_LSH_REPS, _lsh_reps
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
    ),
    rep_comp AS (
      SELECT a AS rep_id, MIN(b) AS component FROM reach GROUP BY a
    ),
    {DUCK_LSH_REPS}
    SELECT d.doc_id AS doc_id, rc.component AS component
    FROM documents d
    JOIN reps rm USING (text)
    JOIN rep_comp rc ON rc.rep_id = rm.doc_id
    ORDER BY d.doc_id
    """,
)
def near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clustering: min-label propagation over the rep-level LSH
    candidate graph (one join+agg per iteration, lineage checkpointed)
    vs. a recursive-CTE transitive closure in DuckDB. The iterative part
    runs on the DISTINCT-text graph (4 orders of magnitude smaller than
    the doc count on clone-heavy corpora); every doc then inherits its
    representative's component through one broadcast-size text join, so
    the output stays doc-level. Component ids are min doc_ids, and reps
    are min-per-text, so the labels are identical either way."""
    reps = _lsh_reps(spark, sf_dir)
    pairs = minhash_lsh_candidates(
        reps, id_col="doc_id", text_col="text", n_hashes=8, n_bands=4
    )
    comps = connected_components(pairs, src="id_a", dst="id_b")
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")
    return (
        d.join(F.broadcast(reps.withColumnRenamed("doc_id", "rep_id")), "text")
        .join(
            F.broadcast(comps.withColumnRenamed("node", "rep_id")), "rep_id"
        )
        .select("doc_id", "component")
        .orderBy("doc_id")
    )
