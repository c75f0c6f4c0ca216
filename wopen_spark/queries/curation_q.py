"""Composite training-data curation pipeline as ONE declarative plan:
quality-filter -> language-consistency filter -> exact dedup -> per-lang
stats. This is the shape a 100 TB corpus pass actually takes, and because
it is a single Catalyst plan the filters fuse into the scan and the only
shuffles are the dedup groupBy and the final per-language aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.functions.text import doc_fingerprint, language_id, quality_score
from wopen_spark.queries.registry import _spread, _t, query
from wopen_spark.queries.text_analysis import (
    _LANG_CASE,
    _LANGS,
    _SCORE_EXPRS,
    _STOP_SUM,
    DUCK_QUALITY_FROM_STATS,
)


@query(
    "corpus_curation",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang, text,
             length(text) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             len(regexp_extract_all(text, '\\S+')) AS words,
             {_STOP_SUM} AS stop_hits,
             {_SCORE_EXPRS}
      FROM documents
    ),
    scored AS (
      SELECT *,
             {DUCK_QUALITY_FROM_STATS} AS q,
             greatest({", ".join("s_" + lang for lang in _LANGS)}) AS best
      FROM m
    ),
    kept AS (
      SELECT * FROM (SELECT *, {_LANG_CASE} AS det FROM scored)
      WHERE q >= 0.5 AND det = lang
    ),
    dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
          ORDER BY doc_id) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_quality
    FROM dedup GROUP BY lang ORDER BY lang
    """,
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep docs with quality >= 0.5 whose detected language agrees with
    the label, drop exact duplicates (min doc_id per content
    fingerprint), report per-language counts and mean quality.

    Clone-collapse-first: quality/language scoring is a function of the
    raw text alone, and the dedup stage keeps one doc per fingerprint
    anyway — so the plan groups by (text, lang) FIRST (one shuffle whose
    map-side partial min collapses clones before they move), scores the
    ~distinct texts instead of every row, then finishes the dedup on the
    tiny group table. Identical output to scoring every row (clones of a
    (text, lang) pair are interchangeable: same q, same det, min doc_id
    survives either way); on the ~100x-replicated large-SF corpora this
    removes 99% of the regex work, and on a duplicate-free corpus it
    degrades to the same one shuffle the dedup groupBy already cost."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    groups = d.groupBy("text", "lang").agg(F.min("doc_id").alias("doc_id"))
    kept = (
        groups.withColumn("q", quality_score(F.col("text")))
        .withColumn("det", language_id(F.col("text")))
        .filter((F.col("q") >= 0.5) & (F.col("det") == F.col("lang")))
    )
    # finish the exact dedup ACROSS (text, lang) groups sharing a
    # normalized fingerprint: min doc_id wins, carrying its lang and q
    unique = (
        kept.withColumn("fp", doc_fingerprint(F.col("text")))
        .groupBy("fp")
        .agg(F.min(F.struct("doc_id", "lang", "q")).alias("s"))
        .select(F.col("s.lang").alias("lang"), F.col("s.q").alias("q"))
    )
    return (
        unique.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag corpus documents sharing any normalized
# character-8-gram with a held-out benchmark set (source 'src0' stands in
# for the eval suite). Shape at 100 TB: the benchmark gram set is tiny and
# broadcast, so the corpus side streams through a broadcast hash join with
# no shuffle of raw text; the per-doc distinct + count aggregates on
# doc_id, where the data is already clustered.
# ---------------------------------------------------------------------------
_G = 8


@query(
    "benchmark_contamination",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id, source,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source, gram FROM (
        SELECT doc_id, source,
               substring(t, unnest(generate_series(1, greatest(length(t) - {_G - 1}, 0))), {_G}) AS gram
        FROM norm
      ) GROUP BY ALL
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE source = 'src0')
    SELECT g.doc_id, COUNT(*) AS n_shared_grams
    FROM grams g JOIN bench b ON g.gram = b.gram
    WHERE g.source <> 'src0'
    GROUP BY g.doc_id
    ORDER BY doc_id
    """,
)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A doc's shared-gram count is a function of its text alone, so the
    gram explode/distinct/probe runs once per distinct (text-side, text)
    pair and every clone inherits the count through a broadcast join on
    the text — on the ~100x-replicated large-SF corpora that is 99% less
    gram churn, and on a duplicate-free corpus it collapses to the same
    work as graming every row. Docs sharing zero grams drop out in the
    inner join, exactly as before."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    # distinct (is_bench, text): a text appearing both in the benchmark
    # source and the corpus grams twice — once per role, as the doc-level
    # original did. The gram stage keys on md5(text) instead of the text
    # itself: a gram row otherwise carries the full multi-KB document
    # through the distinct shuffle, and at length(text) gram rows per doc
    # that shuffle is ~99% dead weight. The md5 stands in for the text
    # through explode/distinct/count; doc_ids re-attach by hashing the
    # corpus side the same way.
    roles = d.select(
        (F.col("source") == "src0").alias("is_bench"), "text"
    ).distinct()
    norm = roles.select(
        "is_bench",
        F.md5(F.col("text")).alias("tid"),
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t"),
    )
    # per-text gram dedup happens IN-ROW (array_distinct before the
    # explode): every duplicate of a (text, gram) pair comes from the
    # same source row, so the old post-explode .distinct() paid a full
    # |grams|-row exchange — the query's biggest shuffle, pure dead
    # weight at any scale — to dedup values that never left their row.
    # Texts shorter than the gram size emit NOTHING (sequence() flips
    # to step -1 when start > stop, which would fabricate a whole-text
    # gram and diverge from the oracle's empty generate_series — the
    # same gate duplicate_kgram_spans carries).
    grams = norm.select(
        "is_bench",
        "tid",
        F.explode(
            F.when(
                F.length("t") >= _G,
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, length(t) - {_G - 1}),"
                        f" p -> substring(t, p, {_G}))"
                    )
                ),
            ).otherwise(F.expr("array()").cast("array<string>"))
        ).alias("gram"),
    )
    bench = grams.filter(F.col("is_bench")).select("gram").distinct()
    per_tid = (
        grams.filter(~F.col("is_bench"))
        .join(F.broadcast(bench), "gram")
        .groupBy("tid")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    # per_tid (docs sharing grams with the benchmark) is usually tiny but
    # adversarially corpus-proportional — no forced broadcast; the join
    # is md5-keyed either way
    return (
        d.filter(F.col("source") != "src0")
        .select("doc_id", F.md5(F.col("text")).alias("tid"))
        .join(per_tid, "tid")
        .select("doc_id", "n_shared_grams")
        .orderBy("doc_id")
    )


@query(
    "fixed_size_sample_per_lang",
    oracle="""
    SELECT lang, doc_id FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('fs|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 20
    ORDER BY lang, doc_id
    """,
)
def fixed_size_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank docs inside each
    language by a salted key hash and keep the first 20 — the
    fixed-BUDGET counterpart to rate-based sampling
    (stratified_sample_by_lang), used when an eval set must have a known
    size per slice. Hash-ordered, so the same 20 docs come out of any
    engine, partitioning, or rerun, and adding new docs only displaces
    members whose hash falls behind — no rand() state anywhere. One
    window shuffle on lang."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("fs|"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    )


@query(
    "contrastive_negatives",
    oracle="""
    WITH anchors AS (
      SELECT doc_id AS anchor_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
      FROM documents WHERE doc_id % 100 = 0
    ),
    pool AS (
      SELECT doc_id AS cand_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp_c
      FROM documents
      WHERE CAST(('0x' || substr(md5('pool|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 50 = 0
    ),
    scored AS (
      SELECT a.anchor_id, p.cand_id,
             md5('neg|' || CAST(a.anchor_id AS VARCHAR) || '|' || CAST(p.cand_id AS VARCHAR)) AS h
      FROM anchors a JOIN pool p ON a.fp <> p.fp_c
    )
    SELECT anchor_id, cand_id, rnk FROM (
      SELECT anchor_id, cand_id,
             ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY h, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= 3 ORDER BY anchor_id, rnk
    """,
)
def contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor doc gets 3 negatives drawn by salted-hash order from a
    hash-thinned candidate POOL (~2% of the corpus, broadcastable at
    any scale), excluding content-identical docs via the normalized
    fingerprint. Every choice is md5-ordered — reproducible on any
    engine, partitioning, or rerun, which is what makes training-data
    sampling auditable. The anchor x pool product is bounded by the
    pool rate, never |corpus|²; WindowGroupLimit prunes the per-anchor
    top-3 map-side."""
    from pyspark.sql import Window

    from wopen_spark.functions.text import doc_fingerprint

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    anchors = (
        d.filter(F.col("doc_id") % 100 == 0)
        .select(
            F.col("doc_id").alias("anchor_id"),
            doc_fingerprint(F.col("text")).alias("fp"),
        )
    )
    pool_bucket = (
        F.conv(
            F.md5(F.concat(F.lit("pool|"), F.col("doc_id").cast("string"))).substr(
                1, 4
            ),
            16,
            10,
        ).cast("long")
        % 50
    )
    pool = (
        d.filter(pool_bucket == 0)
        .select(
            F.col("doc_id").alias("cand_id"),
            doc_fingerprint(F.col("text")).alias("fp_c"),
        )
    )
    scored = anchors.join(F.broadcast(pool), F.col("fp") != F.col("fp_c")).select(
        "anchor_id",
        "cand_id",
        F.md5(
            F.concat_ws(
                "|",
                F.lit("neg"),
                F.col("anchor_id").cast("string"),
                F.col("cand_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("anchor_id").orderBy("h", "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("anchor_id", "cand_id", "rnk")
        .orderBy("anchor_id", "rnk")
    )
