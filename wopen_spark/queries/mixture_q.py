"""Corpus mixture + LM-based curation queries: per-source deterministic
sampling rates, unigram log-probability scoring, cross-source duplicate
overlap, and CUBE grouping-sets analytics.

Scale shapes: the mixture sample is a pure map-side filter (rate map is
a literal, hash is per-row); the unigram LM broadcast-joins a
vocabulary-sized count table against the (doc, term) tf rows; the
overlap matrix self-joins on the uniform md5 fingerprint key only.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _inherit, _spread, _t, query

_DUCK_W = "regexp_extract_all(lower(text), '\\S+')"

# per-source sampling percentages — the "mixture weights" a training run
# assigns to corpus slices (heavier on the cleaner sources)
_MIX_RATES = {"src0": 5, "src1": 20, "src2": 50, "src3": 80, "src4": 100}


# ---------------------------------------------------------------------------
# Deterministic per-source mixture sampling: every row is kept iff a
# salted key hash falls under its source's rate — reproducible on any
# engine/partitioning (rand() is not), and entirely map-side: the rate
# map is a literal, so the filter rides the parquet scan.
# ---------------------------------------------------------------------------
@query(
    "source_mixture_sample",
    oracle=f"""
    WITH tagged AS (
      SELECT source,
             CAST(('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
               AS bucket,
             CASE source {"".join(f"WHEN '{s}' THEN {r} " for s, r in _MIX_RATES.items())}ELSE 0 END AS rate
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (WHERE bucket < rate) AS n_sampled
    FROM tagged GROUP BY source ORDER BY source
    """,
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    rate_map = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(_MIX_RATES.items())]
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix|"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = F.coalesce(rate_map[F.col("source")], F.lit(0))
    return (
        d.select("source", bucket.alias("bucket"), rate.alias("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count(F.when(F.col("bucket") < F.col("rate"), 1)).alias("n_sampled"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Unigram-LM scoring: corpus token counts form the model (vocabulary-
# sized, broadcast); each doc's mean token log-probability flags
# out-of-distribution documents — the cheap perplexity-style quality
# gate. Same ln/sum/round discipline as bm25_search (round 6 after the
# sum bounds float-order noise).
# ---------------------------------------------------------------------------
@query(
    "unigram_logprob_docs",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, t.token, COUNT(*) AS tf
      FROM documents, unnest({_DUCK_W}) AS t(token)
      GROUP BY 1, 2
    ),
    vocab AS (SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token),
    n AS (SELECT SUM(cnt) AS total FROM vocab)
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           round(SUM(tf.tf * ln(CAST(vocab.cnt AS DOUBLE) / n.total)) / SUM(tf.tf), 6)
             AS avg_logprob
    FROM tf JOIN vocab USING (token) CROSS JOIN n
    GROUP BY tf.doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clone-collapsed: per-doc tf is a function of the text, and the
    vocabulary counts weight each distinct text by its clone count
    (cnt = sum of w*tf — exact longs, identical to summing every doc).
    The explode and scoring run per distinct text; docs inherit via
    broadcast join."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    groups = d.groupBy("text").agg(F.count(F.lit(1)).alias("w"))
    tf = (
        groups.select(
            "text",
            "w",
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
            ).alias("token"),
        )
        .groupBy("text", "token")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("w").alias("w"))
    )
    vocab = tf.groupBy("token").agg(F.sum(F.col("tf") * F.col("w")).alias("cnt"))
    n = vocab.agg(F.sum("cnt").alias("total"))
    per_text = (
        tf.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("text")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("cnt").cast("double") / F.col("total"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
    )
    return (
        _inherit(
            d.select("doc_id", "text"),
            per_text,
            ["text"],
            # gate on the cheap distinct-text set: sizing per_text itself
            # would run the whole tf/vocab scoring pipeline once extra
            gate=d.select("text").distinct(),
        )
        .select("doc_id", "n_tokens", "avg_logprob")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-source duplicate overlap: which sources copy from each other —
# fingerprinted on the leading 3-word shingle (a coarse lead-paragraph
# detector; full-text md5 via functions.text.doc_fingerprint plugs in
# for exact overlap). The distinct collapses clones first, then the tiny
# (fingerprint, source) table self-joins on the uniform md5 key only.
# The matrix drives source-level dedup priority in a mixture.
# ---------------------------------------------------------------------------
@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH fps AS (
      SELECT DISTINCT md5(array_to_string({_DUCK_W}[1:3], ' ')) AS fp,
             source
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_texts
    FROM fps a JOIN fps b USING (fp)
    WHERE a.source < b.source
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    lead_fp = F.md5(
        F.array_join(
            F.slice(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0)
                ),
                1,
                3,
            ),
            " ",
        )
    )
    fps = d.select(lead_fp.alias("fp"), "source").distinct()
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_texts"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# CUBE grouping sets over (event_type, day-of-week): all four
# aggregation levels in ONE shuffle — the partial aggregate expands each
# row into its grouping sets map-side, so no re-scan per level (vs. four
# UNION'd GROUP BYs).
# ---------------------------------------------------------------------------
@query(
    "event_type_cube_stats",
    oracle="""
    SELECT event_type,
           CASE WHEN GROUPING(dow) = 0 THEN dow END AS dow,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      -- DuckDB dayofweek is 0-6 (Sun=0); Spark's is 1-7 (Sun=1)
      SELECT event_type, dayofweek(ts) + 1 AS dow, value FROM events
    )
    GROUP BY CUBE (event_type, dow)
    ORDER BY event_type NULLS FIRST, dow NULLS FIRST
    """,
)
def event_type_cube_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        "value",
    )
    return (
        ev.cube("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("dow").asc_nulls_first()
        )
    )


# ---------------------------------------------------------------------------
# Temperature-scaled mixture weights: per-source sampling weight
# proportional to size^(1/τ) with τ=2 (sqrt damping) — the standard
# rebalancing that up-weights small sources when mixing corpora for
# training. Aggregates are exact longs; sqrt is IEEE correctly-rounded
# (unlike pow, which varies by libm — that's WHY τ=2), and the weight is
# emitted in the scaled-integer ppm domain so there is no double-sum or
# round(x, n) engine sensitivity anywhere.
# ---------------------------------------------------------------------------
@query(
    "temperature_mixture_weights",
    oracle="""
    WITH per_src AS (
      SELECT source, COUNT(*) AS n_docs,
             -- outer CAST: DuckDB's BIGINT SUM yields HUGEINT, which
             -- reaches pandas as float64 and breaks the comparator's
             -- integer formatting once values pass ~1e6 (first at sf10)
             CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
      FROM documents GROUP BY source
    ),
    scaled AS (
      SELECT source, n_docs, total_chars,
             CAST(round(sqrt(CAST(total_chars AS DOUBLE)) * 1000000) AS BIGINT)
               AS raw_s
      FROM per_src
    ),
    tot AS (SELECT SUM(raw_s) AS t FROM scaled)
    SELECT source, n_docs, total_chars,
           CAST(round(CAST(raw_s AS DOUBLE) * 1000000 / t) AS BIGINT)
             AS weight_ppm
    FROM scaled CROSS JOIN tot
    ORDER BY source
    """,
)
def temperature_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
    )
    scaled = per_src.withColumn(
        "raw_s",
        F.round(F.sqrt(F.col("total_chars").cast("double")) * 1000000).cast("long"),
    )
    tot = scaled.agg(F.sum("raw_s").alias("t"))
    return (
        scaled.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.round(F.col("raw_s").cast("double") * 1000000 / F.col("t"))
            .cast("long")
            .alias("weight_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# BPE merge counting — one round of byte-pair-encoding vocabulary
# training: count adjacent character pairs across the corpus, weighted
# by word frequency. The expensive explode runs per DISTINCT word (the
# word-count table), not per occurrence — the exact trick a tokenizer
# trainer uses at 100 TB, where the distinct-word table is millions of
# rows while the corpus is trillions of tokens. Pair generation is a
# higher-order transform over index sequences: zero Python in the path.
# ---------------------------------------------------------------------------
@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT t.word AS word, COUNT(*) AS w
      FROM documents, unnest({_DUCK_W}) AS t(word)
      GROUP BY 1
    ),
    idx AS (
      SELECT word, w,
             unnest(generate_series(1, length(word) - 1)) AS i
      FROM words WHERE length(word) >= 2
    ),
    pairs AS (SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, w FROM idx)
    -- outer CAST: HUGEINT SUM -> float64 breaks integer formatting
    -- above ~1e6 (first at sf10, gate batch 5)
    SELECT pair, CAST(SUM(w) AS BIGINT) AS cnt
    FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 40
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    words = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    pairs = (
        words.filter(F.length("word") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - 1),
                    lambda i: F.col("word").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "w",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("w").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(40)
    )


# ---------------------------------------------------------------------------
# BPE vocabulary TRAINING, two merge rounds end-to-end: count adjacent
# symbol pairs, adopt the most frequent pair as a new vocabulary symbol,
# re-segment every word, count again. Extends bpe_pair_counts (one
# counting round) to the actual training loop a tokenizer builder runs.
# All per-symbol work happens on the DISTINCT-word table weighted by
# word frequency — millions of rows at 100 TB while the corpus is
# trillions of tokens — and the argmax pair is a 1-row broadcast into
# the re-segmentation pass, so each round is one explode + one
# map-combined pair shuffle. The merge itself is an array transform
# (greedy left-to-right, non-overlapping): with left != right symbols
# (degenerate same-symbol merges are excluded, and deterministically so
# on both engines) adjacent matches can never overlap, so "emit a||b at
# the pair start, drop the consumed right symbol" reproduces the exact
# BPE re-segmentation with zero Python in the path.
# ---------------------------------------------------------------------------
_DUCK_BPE_PAIRS = """
  SELECT u.pair, CAST(SUM(w) AS BIGINT) AS cnt
  FROM (SELECT w, list_transform(range(1, len(sym)), i -> sym[i] || ' ' || sym[i+1]) AS prs
        FROM {src} WHERE len(sym) >= 2), unnest(prs) AS u(pair)
  GROUP BY 1
"""
_DUCK_BPE_TOP1 = """
  SELECT pair, cnt, split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
  FROM {src} WHERE split_part(pair, ' ', 1) <> split_part(pair, ' ', 2)
  ORDER BY cnt DESC, pair LIMIT 1
"""
_DUCK_BPE_MERGE = """
  SELECT word, w, list_filter(
           list_transform(range(1, len(sym) + 1), i ->
             CASE WHEN sym[i] = {t}.a AND i < len(sym) AND sym[i+1] = {t}.b
                    THEN {t}.a || {t}.b
                  WHEN sym[i] = {t}.b AND i > 1 AND sym[i-1] = {t}.a
                    THEN NULL
                  ELSE sym[i] END),
           x -> x IS NOT NULL) AS sym
  FROM {src}, {t}
"""
# shared training prefix: distinct-word counts -> round-1 pairs/argmax ->
# re-segmented words -> round-2 pairs/argmax
_DUCK_BPE_TRAIN = f"""
    words AS (
      SELECT t.word AS word, COUNT(*) AS w
      FROM documents, unnest({_DUCK_W}) AS t(word) GROUP BY 1
    ),
    w1 AS (SELECT word, w, regexp_extract_all(word, '.') AS sym FROM words),
    p1 AS ({_DUCK_BPE_PAIRS.format(src="w1")}),
    t1 AS ({_DUCK_BPE_TOP1.format(src="p1")}),
    w2 AS ({_DUCK_BPE_MERGE.format(src="w1", t="t1")}),
    p2 AS ({_DUCK_BPE_PAIRS.format(src="w2")}),
    t2 AS ({_DUCK_BPE_TOP1.format(src="p2")})
"""


def _bpe_pipeline(spark: SparkSession, sf_dir: str):
    """Shared two-merge BPE training pipeline: returns
    (words(word, w, sym), t1(pair, cnt, a, b), w2(word, w, sym), t2).
    The distinct-word frame is lazily checkpointed — it feeds round-1
    counting, the re-segmentation, AND any downstream apply step, but
    the corpus explode + word aggregate runs once."""
    from wopen_spark.functions.text import bpe_merge_pair

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    words = (
        d.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            "word",
            "w",
            F.regexp_extract_all("word", F.lit("."), F.lit(0)).alias("sym"),
        )
        .localCheckpoint(eager=False)
    )

    def pair_counts(wdf: DataFrame) -> DataFrame:
        n = F.size("sym")
        pairs = wdf.filter(n >= 2).select(
            "w",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.concat(
                        F.get("sym", i), F.lit(" "), F.get("sym", i + 1)
                    ),
                )
            ).alias("pair"),
        )
        return pairs.groupBy("pair").agg(F.sum("w").alias("cnt"))

    def top1(pc: DataFrame) -> DataFrame:
        sp = F.split("pair", " ")
        return (
            pc.select("pair", "cnt", sp.getItem(0).alias("a"), sp.getItem(1).alias("b"))
            .filter(F.col("a") != F.col("b"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
        )

    def merge(wdf: DataFrame, t: DataFrame) -> DataFrame:
        return wdf.crossJoin(F.broadcast(t.select("a", "b"))).select(
            "word", "w", bpe_merge_pair(F.col("sym"), F.col("a"), F.col("b")).alias("sym")
        )

    t1 = top1(pair_counts(words))
    w2 = merge(words, t1)
    t2 = top1(pair_counts(w2))
    return words, t1, w2, t2, merge


@query(
    "bpe_train_2merges",
    oracle=f"""
    WITH {_DUCK_BPE_TRAIN}
    SELECT 1 AS merge_round, a AS left_sym, b AS right_sym, a || b AS merged, cnt FROM t1
    UNION ALL
    SELECT 2, a, b, a || b, cnt FROM t2
    ORDER BY merge_round
    """,
)
def bpe_train_2merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, t1, _, t2, _ = _bpe_pipeline(spark, sf_dir)

    def out(t: DataFrame, rnd: int) -> DataFrame:
        return t.select(
            F.lit(rnd).alias("merge_round"),
            F.col("a").alias("left_sym"),
            F.col("b").alias("right_sym"),
            F.concat("a", "b").alias("merged"),
            "cnt",
        )

    return out(t1, 1).unionByName(out(t2, 2)).orderBy("merge_round")


# ---------------------------------------------------------------------------
# Tokenizer APPLY — segment the corpus with the trained merges and
# report compression per source (the metric that decides whether a
# tokenizer is worth its vocab budget). Per-word token counts come from
# the distinct-word table after both merges; corpus rows inherit
# through the gated rejoin (broadcast here; md5-fingerprint shuffle on
# a 100 TB vocabulary), so the apply step never re-segments per
# occurrence.
# ---------------------------------------------------------------------------
@query(
    "bpe_tokenize_apply",
    oracle=f"""
    WITH {_DUCK_BPE_TRAIN},
    w3 AS ({_DUCK_BPE_MERGE.format(src="w2", t="t2")}),
    vocab AS (SELECT word, len(sym) AS n_tok FROM w3),
    corpus AS (
      SELECT source, t.word AS word FROM documents, unnest({_DUCK_W}) AS t(word)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_words,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(n_tok) AS BIGINT) / COUNT(*), 4) AS avg_tokens_per_word
    FROM corpus JOIN vocab USING (word)
    GROUP BY source ORDER BY source
    """,
)
def bpe_tokenize_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    words, _, w2, t2, merge = _bpe_pipeline(spark, sf_dir)
    vocab = merge(w2, t2).select("word", F.size("sym").alias("n_tok"))
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    corpus = d.select(
        "source",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
        ).alias("word"),
    )
    # gate on the checkpointed word table (same cardinality as vocab,
    # already materialized) so sizing never re-runs the training chain
    return (
        _inherit(corpus, vocab, ["word"], gate=words)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_words"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.sum("n_tok") / F.count(F.lit(1)), 4).alias(
                "avg_tokens_per_word"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (90/5/5) on a salted key hash —
# reproducible on any engine/partitioning (rand() is not), entirely
# map-side, and leak-proof: a document's split never changes when the
# corpus grows. The per-source breakdown doubles as the drift check
# that the hash is unbiased across slices.
# ---------------------------------------------------------------------------
@query(
    "train_val_test_split",
    oracle="""
    WITH tagged AS (
      SELECT source, n_chars,
             CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100
               AS bucket
      FROM documents
    )
    SELECT source,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM tagged GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))).substr(1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select("source", "n_chars", split.alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).cast("long").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS — the asymmetric level list CUBE can't express:
# ((event_type, dow), (event_type), ()) skips the per-dow-only level.
# Same single-shuffle property as CUBE (map-side expand into the listed
# sets); GROUPING() flags disambiguate real NULLs from rollup NULLs.
# ---------------------------------------------------------------------------
@query(
    "event_grouping_sets_stats",
    oracle="""
    SELECT event_type,
           CASE WHEN GROUPING(dow) = 0 THEN dow END AS dow,
           CAST(GROUPING(event_type) AS BIGINT) AS g_type,
           CAST(GROUPING(dow) AS BIGINT) AS g_dow,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM (
      -- DuckDB dayofweek is 0-6 (Sun=0); Spark's is 1-7 (Sun=1)
      SELECT event_type, dayofweek(ts) + 1 AS dow, value FROM events
    )
    GROUP BY GROUPING SETS ((event_type, dow), (event_type), ())
    ORDER BY g_type, g_dow, event_type NULLS FIRST, dow NULLS FIRST
    """,
)
def event_grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
        "value",
    )
    return (
        ev.groupingSets(
            [["event_type", "dow"], ["event_type"], []], "event_type", "dow"
        )
        .agg(
            F.grouping("event_type").cast("long").alias("g_type"),
            F.grouping("dow").cast("long").alias("g_dow"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select("event_type", "dow", "g_type", "g_dow", "n", "total_value")
        .orderBy(
            "g_type",
            "g_dow",
            F.col("event_type").asc_nulls_first(),
            F.col("dow").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Split leakage check: content fingerprints whose member docs land in
# MORE THAN ONE of the train/val/test splits — exact duplicates leaking
# across the eval boundary, the QA gate run right after any hash split.
# The split is keyed on doc_id while the fingerprint is keyed on
# content, so byte-identical docs with different ids CAN split apart;
# this query quantifies exactly that.
# ---------------------------------------------------------------------------
@query(
    "split_leakage_check",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS hh,
             CASE WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 90 THEN 'train'
                  WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    per_fp AS (
      SELECT hh, COUNT(*) AS n_docs,
             string_agg(DISTINCT split, ',' ORDER BY split) AS splits,
             COUNT(DISTINCT split) AS n_splits
      FROM tagged GROUP BY 1
    )
    SELECT splits, COUNT(*) AS n_groups,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs
    FROM per_fp WHERE n_splits > 1
    GROUP BY 1 ORDER BY 1
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wopen_spark.functions.text import doc_fingerprint
    from wopen_spark.queries.registry import _per_distinct_text

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    bucket = (
        F.conv(
            F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))).substr(1, 4),
            16,
            10,
        ).cast("long")
        % 100
    )
    split = F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    tagged = _per_distinct_text(
        d.select("doc_id", "text"),
        lambda t: t.select("text", doc_fingerprint(F.col("text")).alias("hh")),
    ).select("hh", split.alias("split"))
    per_fp = tagged.groupBy("hh").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(F.array_sort(F.collect_set("split")), ",").alias("splits"),
        F.count_distinct("split").alias("n_splits"),
    )
    return (
        per_fp.filter(F.col("n_splits") > 1)
        .groupBy("splits")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_docs").alias("n_docs"),
        )
        .orderBy("splits")
    )


# ---------------------------------------------------------------------------
# Token-budget allocation: split a 1M-token training budget across
# sources proportional to sqrt-damped size (the temperature-2 mixture),
# CAPPED by each source's available tokens, with the capped surplus
# redistributed once across uncapped sources — one deterministic
# waterfilling round, all in integer arithmetic (floor divisions on
# scaled longs), so the allocation is bit-identical everywhere.
# Available tokens approximate as n_chars / 4 (the usual chars-per-
# token heuristic), summed exactly.
# ---------------------------------------------------------------------------
@query(
    "token_budget_allocation",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(SUM(CAST(n_chars AS BIGINT)) // 4 AS BIGINT) AS avail
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, avail,
             CAST(round(sqrt(CAST(avail AS DOUBLE)) * 1000000) AS BIGINT) AS w
      FROM per_src
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts),
    first_pass AS (
      SELECT source, avail, w,
             LEAST(avail, CAST((1000000 * w) // tw AS BIGINT)) AS alloc1,
             CAST((1000000 * w) // tw AS BIGINT) > avail AS capped
      FROM wts, tot
    ),
    leftover AS (
      SELECT CAST(1000000 - SUM(alloc1) AS BIGINT) AS rem,
             CAST(SUM(CASE WHEN NOT capped THEN w ELSE 0 END) AS BIGINT) AS open_w
      FROM first_pass
    )
    SELECT f.source, f.avail, f.alloc1 +
           CASE WHEN NOT f.capped AND l.open_w > 0
                THEN CAST((l.rem * f.w) // l.open_w AS BIGINT) ELSE 0 END
             AS alloc_tokens
    FROM first_pass f, leftover l
    ORDER BY f.source
    """,
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    # exact integer div (not /-then-cast): at sf10+ the summed chars exceed
    # double's 53-bit integer precision, so a double divide can truncate to
    # a different long than the oracle's exact `//`
    per_src = d.groupBy("source").agg(
        F.expr("sum(cast(n_chars as bigint)) div 4").alias("avail")
    )
    wts = per_src.withColumn(
        "w",
        F.round(F.sqrt(F.col("avail").cast("double")) * 1000000).cast("long"),
    )
    tot = wts.agg(F.sum("w").cast("long").alias("tw"))
    fp = (
        wts.join(F.broadcast(tot))
        .withColumn("fair", F.expr("(1000000 * w) div tw"))
        .withColumn("alloc1", F.least(F.col("avail"), F.col("fair")))
        .withColumn("capped", F.col("fair") > F.col("avail"))
    )
    leftover = fp.agg(
        (F.lit(1000000) - F.sum("alloc1")).cast("long").alias("rem"),
        F.sum(F.when(~F.col("capped"), F.col("w")).otherwise(0))
        .cast("long")
        .alias("open_w"),
    )
    return (
        fp.join(F.broadcast(leftover))
        .select(
            "source",
            "avail",
            (
                F.col("alloc1")
                + F.when(
                    (~F.col("capped")) & (F.col("open_w") > 0),
                    F.expr("(rem * w) div open_w"),
                ).otherwise(0)
            ).alias("alloc_tokens"),
        )
        .orderBy("source")
    )
