"""Text retrieval + sampling operators for training-data pipelines:
BM25 scoring, winnowing fingerprints, and reproducible hash sampling —
each hash-matched against a DuckDB re-derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import ORACLES, QUERIES, _per_distinct_text, _spread, _t, query

_QUERY_TERMS = ["spark", "sort", "stream"]
_K1, _B = 1.2, 0.75


@query(
    "bm25_search",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, t.token, COUNT(*) AS tf
      FROM documents, unnest(regexp_extract_all(lower(text), '\\S+')) AS t(token)
      WHERE t.token IN ({", ".join(f"'{t}'" for t in _QUERY_TERMS)})
      GROUP BY doc_id, t.token
    ),
    dl AS (
      SELECT doc_id, len(regexp_extract_all(lower(text), '\\S+')) AS dl FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl
    ),
    idf AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY token
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(
               ln(1 + (stats.n_docs - idf.df + 0.5) / (idf.df + 0.5))
               * tf.tf * ({_K1} + 1)
               / (tf.tf + {_K1} * (1 - {_B} + {_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM tf
      JOIN idf USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, round(score, 6) AS bm25
    FROM scored ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for a fixed term set, clone-collapsed: tf/dl are
    functions of the text, and every corpus statistic weights each
    distinct text by its clone count with exact integer sums (a text
    with w clones contributes exactly w docs to n_docs, df, and the
    length total — identical doubles fall out of the same divisions).
    The explode runs over distinct texts; docs inherit their text's
    score through a broadcast join before the global top-20."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    # per-distinct-text frames are keyed on the md5 fingerprint, never the
    # raw (multi-KB) text, and the doc-proportional scored side carries NO
    # forced broadcast — on a mostly-unique 100 TB corpus "docs matching a
    # query term" can be corpus-sized; AQE broadcasts it when it is small
    groups = d.groupBy("text").agg(F.count(F.lit(1)).alias("w")).withColumn(
        "tid", F.md5("text")
    )
    toks = groups.select(
        "tid",
        "w",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
        ).alias("token"),
    )
    tf = (
        toks.filter(F.col("token").isin(_QUERY_TERMS))
        .groupBy("tid", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("w").alias("w"))
    )
    dl = groups.select(
        "tid",
        "w",
        F.regexp_count(F.lower(F.col("text")), F.lit(r"\S+")).alias("dl"),
    )
    stats = dl.agg(
        F.sum("w").alias("n_docs"),
        (
            F.sum(F.col("dl") * F.col("w")).cast("double") / F.sum("w")
        ).alias("avgdl"),
    )
    idf = tf.groupBy("token").agg(F.sum("w").alias("df"))
    term = (
        F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
        * F.col("tf") * (_K1 + 1)
        / (F.col("tf") + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(idf), "token")  # bounded by the query terms
        .join(dl.select("tid", "dl"), "tid")
        .crossJoin(F.broadcast(stats))  # one row
        .groupBy("tid")
        .agg(F.sum(term).alias("score"))
    )
    return (
        d.select("doc_id", F.md5("text").alias("tid"))
        .join(scored, "tid")
        .select("doc_id", F.round(F.col("score"), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "winnowing_fingerprints",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS w FROM documents
      WHERE len(regexp_extract_all(lower(text), '\\S+')) >= 6
    ),
    grams AS (
      SELECT doc_id,
             list_transform(range(1, len(w) - 1),
               i -> substr(md5(array_to_string(w[i:i+2], ' ')), 1, 8)) AS hashes
      FROM toks
    ),
    wins AS (
      SELECT doc_id,
             list_sort(list_distinct(list_transform(range(1, len(hashes) - 1),
               i -> list_min(hashes[i:i+2])))) AS fp
      FROM grams
    )
    SELECT doc_id, array_to_string(fp, '|') AS fingerprint
    FROM wins ORDER BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document sketch: hash every word 3-gram, keep the min
    hash of each sliding window of 3 grams, dedupe — a position-robust
    fingerprint set whose overlap survives local edits (the standard
    plagiarism/near-dup sketch). The sketch is a function of the text
    alone, so it computes once per DISTINCT text and clones inherit via
    broadcast join (_per_distinct_text — sf10: 4,992 sketches instead
    of 500k; docs under 6 words drop in the inner join, as before)."""
    d = _spread(spark, _t(spark, sf_dir, "documents")).select("doc_id", "text")

    def build(texts: DataFrame) -> DataFrame:
        w = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
        t = texts.filter(F.size(w) >= 6).withColumn("__w", w)
        # hash of each word 3-gram (positions 1..len-2, 1-based inclusive)
        grams = F.transform(
            F.sequence(F.lit(1), F.size(F.col("__w")) - 2),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("__w"), i, 3))), 1, 8
            ),
        )
        t = t.withColumn("__g", grams)
        # fingerprint is a SET — emitted sorted so the serialization is
        # engine-order-independent
        wins = F.array_sort(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(F.col("__g")) - 2),
                    lambda i: F.array_min(F.slice(F.col("__g"), i, 3)),
                )
            )
        )
        return t.select("text", F.array_join(wins, "|").alias("fingerprint"))

    return _per_distinct_text(d, build).select("doc_id", "fingerprint").orderBy(
        "doc_id"
    )


@query(
    "deterministic_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 20
    ORDER BY doc_id
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 20% sample by key hash: md5 of a salted key, NOT
    rand() — the same rows come out of any engine, any partitioning, any
    rerun. The only sane sampling primitive for auditable training-data
    pipelines (rand(seed) is partitioning-dependent in a distributed
    engine)."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("smp|"), F.col("doc_id").cast("string"))), 1, 4),
        16,
        10,
    ).cast("long") % 100
    return d.filter(bucket < 20).select("doc_id", "lang").orderBy("doc_id")


# ---------------------------------------------------------------------------
# Retrieve-then-rerank: the two-stage RAG serving pattern — BM25 recall
# (stage 1, cheap, corpus-wide) feeding a candidate frame into an
# Arrow-batched reranker (stage 2, expensive, 20 rows). The rerank
# kernel here is a deterministic md5 stand-in running through the SAME
# mapInPandas plumbing a cross-encoder would use (cf. the multimodal
# decoders): batch shape, schema, and ordering contract are real, the
# model call is swappable. Scale shape: stage 2 cost is O(k), never
# corpus-shaped.
# ---------------------------------------------------------------------------
@query(
    "rerank_bm25_results",
    oracle=None,  # composed below after bm25_search registers
)
def rerank_bm25_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib

    import pandas as pd

    base = QUERIES["bm25_search"](spark, sf_dir)

    def rerank(batches):
        for pdf in batches:
            scores = [
                int(hashlib.md5(f"rr|{d}".encode()).hexdigest()[:8], 16)
                for d in pdf["doc_id"]
            ]
            out = pdf.copy()
            out["rr_score"] = pd.Series(scores, index=pdf.index, dtype="int64")
            yield out

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("bm25", T.DoubleType()),
            T.StructField("rr_score", T.LongType()),
        ]
    )
    from pyspark.sql import Window

    scored = base.mapInPandas(rerank, schema=schema)
    w = Window.orderBy(F.desc("rr_score"), "doc_id")
    return (
        scored.withColumn("rr_rank", F.row_number().over(w))
        .select("doc_id", "bm25", "rr_rank")
        .orderBy("rr_rank")
    )


# register the composed oracle: the bm25 top-20 as a subquery, reranked
# by the identical md5-derived score
ORACLES["rerank_bm25_results"] = f"""
    WITH base AS ({{bm25}}),
    rr AS (
      SELECT doc_id, bm25,
             CAST(('0x' || substr(md5('rr|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               AS rr_score
      FROM base
    )
    SELECT doc_id, bm25,
           ROW_NUMBER() OVER (ORDER BY rr_score DESC, doc_id) AS rr_rank
    FROM rr ORDER BY rr_rank
"""


def _wire_rerank_oracle() -> None:
    ORACLES["rerank_bm25_results"] = ORACLES["rerank_bm25_results"].format(
        bm25=ORACLES["bm25_search"]
    )


_wire_rerank_oracle()
