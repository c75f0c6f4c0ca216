"""Text-analysis queries: language ID and quality scoring over documents.

Both are pure Column expressions from wopen_spark.functions.text; the
oracles re-derive the same arithmetic in DuckDB SQL so every regexp count
and ratio is checked value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.functions.text import LANG_MARKERS, STOPWORDS, language_id, quality_score
from wopen_spark.queries.registry import (
    _inherit,
    _per_distinct_text,
    _spread,
    _t,
    query,
)


def _duck_word_count(word: str) -> str:
    return f"len(regexp_extract_all(text, '\\b{word}\\b'))"


_LANGS = sorted(LANG_MARKERS)
_SCORE_EXPRS = ",\n           ".join(
    f"({' + '.join(_duck_word_count(w) for w in LANG_MARKERS[lang])}) AS s_{lang}"
    for lang in _LANGS
)
# first-match CASE == alphabetical tie-break, same as the Spark fold
_LANG_CASE = (
    "CASE WHEN best = 0 THEN 'und' "
    + " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in _LANGS)
    + " END"
)


@query(
    "doc_language_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS labeled_lang,
           {_SCORE_EXPRS}
      FROM documents
    ),
    best AS (
      SELECT *, greatest({", ".join("s_" + lang for lang in _LANGS)}) AS best FROM scores
    )
    SELECT doc_id, labeled_lang, {_LANG_CASE} AS detected_lang
    FROM best ORDER BY doc_id
    """,
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detected language is a function of the text alone: computed
    once per DISTINCT text, inherited by clones via broadcast join
    (_per_distinct_text) — 4,992 regex-marker passes at sf10, not 500k."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        _per_distinct_text(
            d.select("doc_id", "lang", "text"),
            lambda t: t.select(
                "text", language_id(F.col("text")).alias("detected_lang")
            ),
        )
        .select("doc_id", F.col("lang").alias("labeled_lang"), "detected_lang")
        .orderBy("doc_id")
    )


_STOP_SUM = " + ".join(_duck_word_count(w) for w in STOPWORDS)

# The ONE DuckDB rendering of functions.text.quality_score — every oracle
# that scores quality derives from these two shapes (change the Column fn
# -> change exactly here, or the oracles silently diverge):
#   DUCK_QUALITY_FROM_STATS expects columns n / alpha / words / stop_hits
#   (the "m" CTE shape); duck_quality_from_text() inlines the stats from
#   a raw `text` column.
DUCK_QUALITY_FROM_STATS = """round(
               0.4 * (CASE WHEN n >= 50 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
               + 0.3 * (CASE WHEN n > 0 THEN alpha::DOUBLE / n::DOUBLE ELSE 0.0 END)
               + 0.3 * least(CAST(1.0 AS DOUBLE),
                   (CASE WHEN words > 0 THEN stop_hits::DOUBLE / words::DOUBLE ELSE 0.0 END) * 8),
               6)"""


def duck_quality_from_text() -> str:
    return f"""round(
      0.4 * (CASE WHEN length(text) >= 50 AND length(text) <= 5000
                  THEN 1.0 ELSE 0.0 END)
      + 0.3 * (CASE WHEN length(text) > 0
               THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                    / length(text)::DOUBLE ELSE 0.0 END)
      + 0.3 * least(CAST(1.0 AS DOUBLE),
          (CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
           THEN ({_STOP_SUM})::DOUBLE
                / len(regexp_extract_all(text, '\\S+'))::DOUBLE
           ELSE 0.0 END) * 8),
      6)"""



@query(
    "doc_quality_scores",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             len(regexp_extract_all(text, '\\S+')) AS words,
             {_STOP_SUM} AS stop_hits
      FROM documents
    )
    SELECT doc_id,
           round(
             0.4 * (CASE WHEN n >= 50 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
             + 0.3 * (CASE WHEN n > 0 THEN alpha::DOUBLE / n::DOUBLE ELSE 0.0 END)
             + 0.3 * least(CAST(1.0 AS DOUBLE),
                 (CASE WHEN words > 0 THEN stop_hits::DOUBLE / words::DOUBLE ELSE 0.0 END) * 8),
             6) AS quality
    FROM m ORDER BY doc_id
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    return (
        _per_distinct_text(
            d.select("doc_id", "text"),
            lambda t: t.select("text", quality_score(F.col("text")).alias("quality")),
        )
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


# Rolling (polynomial / Rabin-Karp) document fingerprint: the order-aware
# complement of the md5 content fingerprint (doc_fingerprint_dedup).
# h = fold(chars, h*31 + codepoint mod 1e9+7) — one array pass per row,
# engine-portable integer arithmetic, no Python in the row path.
@query(
    "doc_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text)+1),
                              i -> CAST(unicode(text[i]) AS BIGINT))),
             (a, c) -> (a * 31 + c) % 1000000007) AS rolling_hash
    FROM documents ORDER BY doc_id
    """,
)
def doc_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != "")
    h = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda a, c: (a * 31 + F.ascii(c)) % F.lit(1000000007).cast("long"),
    )
    return (
        _per_distinct_text(
            d.select("doc_id", "text"),
            lambda t: t.select("text", h.alias("rolling_hash")),
        )
        .select("doc_id", "rolling_hash")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Character-distribution entropy per language — the cheap statistical
# fingerprint for corpus drift / gibberish detection (language-level
# here; the same shape per-doc is the Gopher-style quality gate).
# Char counts are exact longs; each -p*ln(p) term is rounded into the
# scaled-long domain BEFORE the final sum, so only ln's last-ulp can
# differ between engines — invisible at the checker's 6 significant
# digits after the final round.
# ---------------------------------------------------------------------------
@query(
    "char_entropy_by_lang",
    oracle="""
    WITH chars AS (
      SELECT lang, unnest(string_split(text, '')) AS ch FROM documents
    ),
    counts AS (
      SELECT lang, ch, COUNT(*) AS cnt FROM chars WHERE ch <> '' GROUP BY 1, 2
    ),
    totals AS (SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total FROM counts GROUP BY 1),
    terms AS (
      SELECT c.lang,
             CAST(round(-(CAST(c.cnt AS DOUBLE) / t.total)
                        * ln(CAST(c.cnt AS DOUBLE) / t.total) * 1e9) AS BIGINT)
               AS term_s,
             t.total
      FROM counts c JOIN totals t USING (lang)
    )
    SELECT lang,
           round(CAST(SUM(term_s) AS DOUBLE) / 1e9, 6) AS entropy_nats,
           total AS n_chars
    FROM terms GROUP BY lang, total ORDER BY lang
    """,
)
def char_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    chars = d.select(
        "lang",
        F.explode(F.filter(F.split(F.col("text"), ""), lambda c: c != "")).alias(
            "ch"
        ),
    )
    counts = chars.groupBy("lang", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.groupBy("lang").agg(F.sum("cnt").cast("long").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total")
    terms = counts.join(F.broadcast(totals), "lang").select(
        "lang",
        "total",
        F.round(-p * F.log(p) * 1e9).cast("long").alias("term_s"),
    )
    return (
        terms.groupBy("lang", "total")
        .agg(F.round(F.sum("term_s").cast("double") / 1e9, 6).alias("entropy_nats"))
        .select("lang", "entropy_nats", F.col("total").alias("n_chars"))
        .orderBy("lang")
    )


@query(
    "source_vocab_stats",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_extract_all(lower(trim(text)), '\\S+')) AS word
      FROM documents),
    wc AS (SELECT source, word, COUNT(*) AS c FROM toks GROUP BY 1, 2)
    SELECT source, CAST(SUM(c) AS BIGINT) AS total_tokens,
           COUNT(*) AS vocab_size,
           COUNT(*) FILTER (WHERE c = 1) AS hapax_count
    FROM wc GROUP BY 1 ORDER BY 1
    """,
)
def source_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary profile per source: total tokens, distinct
    words, and hapax legomena (words seen exactly once) — the Heaps'-law
    numbers a data-mixture curator reads before weighting sources.

    Clone-weighted: word counting runs once per DISTINCT (source, text)
    pair with the clone multiplicity carried as a weight, so the explode
    touches each distinct document once no matter how replicated the
    corpus is. Two shuffles total — (source, word) with map-side partial
    sums, then the tiny per-source rollup."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    pairs = d.groupBy("source", "text").agg(F.count(F.lit(1)).alias("wt"))
    words = pairs.select(
        "source",
        "wt",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    wc = words.groupBy("source", "word").agg(F.sum("wt").alias("c"))
    return (
        wc.groupBy("source")
        .agg(
            F.sum("c").alias("total_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax_count"),
        )
        .orderBy("source")
    )


_DUCK_QUALITY = f"""
    WITH m AS (
      SELECT doc_id, lang,
             length(text) AS n,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             len(regexp_extract_all(text, '\\S+')) AS words,
             {_STOP_SUM} AS stop_hits
      FROM documents
    ),
    q AS (
      SELECT doc_id, lang,
             round(
               0.4 * (CASE WHEN n >= 50 AND n <= 5000 THEN 1.0 ELSE 0.0 END)
               + 0.3 * (CASE WHEN n > 0 THEN alpha::DOUBLE / n::DOUBLE ELSE 0.0 END)
               + 0.3 * least(CAST(1.0 AS DOUBLE),
                   (CASE WHEN words > 0 THEN stop_hits::DOUBLE / words::DOUBLE ELSE 0.0 END) * 8),
               6) AS quality
      FROM m
    )"""


@query(
    "quality_weighted_sample",
    oracle=f"""
    {_DUCK_QUALITY}
    SELECT doc_id, quality FROM q
    WHERE CAST(('0x' || substr(md5('qws|' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
            % 1000 < CAST(round(quality * 1000) AS BIGINT)
    ORDER BY doc_id
    """,
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional deterministic sampling: each doc's acceptance
    probability IS its quality score, decided by a salted key hash — so
    high-quality docs are upsampled, the decision replays identically on
    any engine/partitioning, and no rand() state exists to desync a
    distributed rerun. This is the curation knob between hard filtering
    (quality cut) and uniform sampling.

    Map-only: the quality term rides the clone-collapse broadcast, the
    hash test is a pure filter — zero data shuffles beyond the collapse."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    scored = _per_distinct_text(
        d.select("doc_id", "text"),
        lambda t: t.select("text", quality_score(F.col("text")).alias("quality")),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qws|"), F.col("doc_id").cast("string"))), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return (
        scored.filter(bucket < F.round(F.col("quality") * 1000).cast("long"))
        .select("doc_id", "quality")
        .orderBy("doc_id")
    )


@query(
    "top_quality_docs_per_lang",
    oracle=f"""
    {_DUCK_QUALITY}
    SELECT lang, doc_id, quality, rnk FROM (
      SELECT lang, doc_id, quality,
             RANK() OVER (PARTITION BY lang ORDER BY quality DESC) AS rnk
      FROM q
    ) WHERE rnk <= 5 ORDER BY lang, rnk, doc_id
    """,
)
def top_quality_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language curriculum head: the top-5 quality ranks per lang,
    with RANK() keeping score ties — a tied 5th place admits every doc
    at that score, which is the right semantics when scores are coarse
    (row_number would drop tied docs by arbitrary id order).

    One window shuffle on lang; the quality term inherits through the
    clone-collapse broadcast like every per-text function."""
    from pyspark.sql import Window

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    scored = _per_distinct_text(
        d.select("doc_id", "lang", "text"),
        lambda t: t.select("text", quality_score(F.col("text")).alias("quality")),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("quality"))
    return (
        scored.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("lang", "doc_id", "quality", "rnk")
        .orderBy("lang", "rnk", "doc_id")
    )


@query(
    "lang_mismatch_by_source",
    oracle=f"""
    WITH scores AS (
      SELECT source, lang AS labeled_lang,
           {_SCORE_EXPRS}
      FROM documents
    ),
    best AS (
      SELECT *, greatest({", ".join("s_" + lang for lang in _LANGS)}) AS best FROM scores
    ),
    det AS (
      SELECT source, labeled_lang, {_LANG_CASE} AS detected_lang FROM best
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE detected_lang <> labeled_lang) AS n_mismatch,
           CAST(COUNT(*) FILTER (WHERE detected_lang <> labeled_lang) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS mismatch_rate
    FROM det GROUP BY 1 ORDER BY 1
    """,
)
def lang_mismatch_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: per source, how often the n-gram language
    detector disagrees with the stored lang label — the drift metric
    that flags a mislabeled or code-mixed corpus slice before it
    poisons per-language sampling. Detection runs once per DISTINCT
    text (clone-collapse); the rollup is one tiny aggregate."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    det = _per_distinct_text(
        d.select("source", "lang", "text"),
        lambda t: t.select(
            "text", language_id(F.col("text")).alias("detected_lang")
        ),
    )
    mism = F.sum(
        F.when(F.col("detected_lang") != F.col("lang"), 1).otherwise(0)
    )
    return (
        det.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            mism.alias("n_mismatch"),
            (mism.cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "mismatch_rate"
            ),
        )
        .orderBy("source")
    )


_POS_SUM = " + ".join(_duck_word_count(w) for w in ["fast", "big", "good", "best", "new"])
_NEG_SUM = " + ".join(_duck_word_count(w) for w in ["slow", "small", "bad", "worst", "old"])


@query(
    "doc_sentiment_scores",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, source,
             ({_POS_SUM}) AS pos, ({_NEG_SUM}) AS neg
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(CASE WHEN pos + neg > 0
               THEN (pos - neg)::DOUBLE / (pos + neg)::DOUBLE
               ELSE 0.0 END, 6) AS sentiment
      FROM m
    )
    SELECT source, COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE sentiment > 0) AS n_positive,
           COUNT(*) FILTER (WHERE sentiment < 0) AS n_negative,
           round(CAST(SUM(CAST(round(sentiment * 1000000) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*), 6) AS mean_sentiment
    FROM scored GROUP BY 1 ORDER BY 1
    """,
)
def doc_sentiment_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment rollup per source (EDBT 2016 Twitter-on-Spark
    shape: broadcast lexicons, one regex alternation pass per doc,
    normalized polarity). Scores compute once per DISTINCT text via
    clone-collapse; the mean aggregates scaled-long score units so the
    rollup is partitioning-independent."""
    from wopen_spark.functions.text import sentiment_score

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    scored = _per_distinct_text(
        d.select("source", "text"),
        lambda t: t.select("text", sentiment_score(F.col("text")).alias("sentiment")),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("sentiment") > 0, 1).otherwise(0)).alias("n_positive"),
            F.sum(F.when(F.col("sentiment") < 0, 1).otherwise(0)).alias("n_negative"),
            F.round(
                F.sum(F.round(F.col("sentiment") * 1000000).cast("long")).cast(
                    "double"
                )
                / 1000000.0
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sentiment"),
        )
        .orderBy("source")
    )


@query(
    "token_lift_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(trim(text)), '\\S+'))) AS w
      FROM documents
    ),
    uni AS (SELECT w, COUNT(*) AS n FROM toks GROUP BY 1),
    n_docs AS (SELECT COUNT(*) AS nd FROM documents),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_ab
      FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY 1, 2 HAVING COUNT(*) >= 20
    )
    SELECT p.w1, p.w2, p.n_ab,
           round(CAST(p.n_ab AS DOUBLE) * nd.nd
                 / (CAST(u1.n AS DOUBLE) * CAST(u2.n AS DOUBLE)), 6) AS lift
    FROM pairs p
    JOIN uni u1 ON p.w1 = u1.w
    JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN n_docs nd
    ORDER BY lift DESC, w1, w2
    LIMIT 25
    """,
)
def token_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token association by LIFT — p(a,b)/(p(a)p(b)) rendered as the
    exact ratio n_ab·N / (n_a·n_b), so no log/PMI libm dependency
    crosses engines. Document-level co-presence with a min-support cut
    BEFORE the ranking; unigram counts broadcast back. Clone-weighted:
    the token self-join runs per DISTINCT text (keyed on md5(text))
    with the clone multiplicity as an exact weight — on the ~100x-
    replicated large SFs that removes ~99% of the pair rows, and the
    join stays bounded by tokens-per-distinct-text."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    groups = d.groupBy("text").agg(F.count(F.lit(1)).alias("wt"))
    toks = groups.select(
        F.md5("text").alias("tid"),
        "wt",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower(F.trim(F.col("text"))), F.lit(r"\S+"), F.lit(0)
                )
            )
        ).alias("w"),
    )
    uni = toks.groupBy("w").agg(F.sum("wt").alias("n"))
    nd = d.agg(F.count(F.lit(1)).alias("nd"))
    b = toks.select(F.col("tid").alias("t2"), F.col("w").alias("w2"))
    pairs = (
        toks.join(b, (toks.tid == b.t2) & (toks.w < b.w2))
        .groupBy(F.col("w").alias("w1"), "w2")
        .agg(F.sum("wt").alias("n_ab"))
        .filter(F.col("n_ab") >= 20)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("n").alias("n1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n").alias("n2"))
    # unigram counts are vocabulary-sized — unbounded on web text, so no
    # forced broadcast (AQE converts when the vocab is actually small);
    # only the one-row n_docs keeps its hint
    return (
        pairs.join(u1, "w1")
        .join(u2, "w2")
        .join(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double")
                * F.col("nd")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "w1", "w2")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Gopher-style document quality gate (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", §A1.1 heuristics, thresholds adapted to this
# corpus): word-count bounds, mean-word-length window, duplicate-word
# ratio, and stopword presence, combined into a keep/drop verdict with a
# per-rule failure breakdown by source. Flags are a function of the text
# alone — computed per DISTINCT text (one regex pass each) and inherited
# by clones; the per-source rollup then shuffles only booleans. The
# reference has no quality gate (SURVEY §2 beyond-reference scope); this
# is the standard pretraining-curation front door.
# ---------------------------------------------------------------------------
_STOP_PRESENCE = (
    "len(list_distinct(regexp_extract_all(text, '\\b(?:"
    + "|".join(sorted(STOPWORDS))
    + ")\\b')))"
)


@query(
    "gopher_quality_filter",
    oracle=f"""
    WITH m AS (
      SELECT source,
             len(regexp_extract_all(text, '\\S+')) AS words,
             length(regexp_replace(text, '\\s', '', 'g')) AS tokchars,
             len(list_distinct(regexp_extract_all(text, '\\S+'))) AS dwords,
             {_STOP_PRESENCE} AS stops
      FROM documents
    ),
    r AS (
      SELECT source,
             (words BETWEEN 30 AND 10000) AS r_wc,
             (words > 0 AND tokchars::DOUBLE / words BETWEEN 3.0 AND 4.5) AS r_ml,
             (words > 0 AND dwords::DOUBLE / words >= 0.45) AS r_dup,
             (stops >= 2) AS r_stop
      FROM m
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM((r_wc AND r_ml AND r_dup AND r_stop)::INT) AS BIGINT) AS n_keep,
           CAST(SUM((NOT r_wc)::INT) AS BIGINT) AS fail_wordcount,
           CAST(SUM((NOT r_ml)::INT) AS BIGINT) AS fail_meanlen,
           CAST(SUM((NOT r_dup)::INT) AS BIGINT) AS fail_dupword,
           CAST(SUM((NOT r_stop)::INT) AS BIGINT) AS fail_stopword,
           round(CAST(SUM((r_wc AND r_ml AND r_dup AND r_stop)::INT) AS BIGINT) / COUNT(*), 4) AS keep_rate
    FROM r GROUP BY source ORDER BY source
    """,
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wopen_spark.functions.text import _marker_hits

    d = _spread(spark, _t(spark, sf_dir, "documents"))
    wordsarr = F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), F.lit(0))
    words = F.size(wordsarr)
    tokchars = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    dwords = F.size(F.array_distinct(wordsarr))
    stops = F.size(F.array_distinct(_marker_hits(F.col("text"), STOPWORDS)))
    ml = tokchars.cast("double") / words
    dup = dwords.cast("double") / words
    flagged = _per_distinct_text(
        d.select("source", "text"),
        lambda t: t.select(
            "text",
            ((words >= 30) & (words <= 10000)).alias("r_wc"),
            ((words > 0) & (ml >= 3.0) & (ml <= 4.5)).alias("r_ml"),
            ((words > 0) & (dup >= 0.45)).alias("r_dup"),
            (stops >= 2).alias("r_stop"),
        ),
    )
    keep = F.col("r_wc") & F.col("r_ml") & F.col("r_dup") & F.col("r_stop")
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("n_keep"),
            F.sum((~F.col("r_wc")).cast("long")).alias("fail_wordcount"),
            F.sum((~F.col("r_ml")).cast("long")).alias("fail_meanlen"),
            F.sum((~F.col("r_dup")).cast("long")).alias("fail_dupword"),
            F.sum((~F.col("r_stop")).cast("long")).alias("fail_stopword"),
            F.round(F.sum(keep.cast("long")) / F.count(F.lit(1)), 4).alias("keep_rate"),
        )
        .orderBy("source")
    )


# Corpus diversity: distinct-bigram ratio per source (distinct-n, the
# standard text-generation diversity metric applied to a training
# mixture — a low ratio flags a templated/boilerplate-heavy source that
# dedup alone won't fix). Bigrams enumerate once per DISTINCT text;
# totals weight by clone count (exact longs); the distinct side counts
# (source, bigram) pairs — clones add nothing, so the shuffle is
# bounded by the distinct-text gram volume.
@query(
    "distinct_bigram_ratio_by_source",
    oracle="""
    WITH dt AS (SELECT DISTINCT text FROM documents),
    toks AS (SELECT text, regexp_extract_all(lower(text), '\\S+') AS w FROM dt),
    bg AS (
      SELECT text, unnest(list_transform(range(1, len(w)),
                          i -> w[i] || ' ' || w[i+1])) AS g
      FROM toks
    ),
    per_text AS (SELECT text, COUNT(*) AS nb FROM bg GROUP BY text),
    tot AS (
      SELECT d.source, CAST(SUM(COALESCE(pt.nb, 0)) AS BIGINT) AS total_bigrams
      FROM documents d LEFT JOIN per_text pt USING (text)
      GROUP BY 1
    ),
    dst AS (
      SELECT st.source, COUNT(DISTINCT bg.g) AS distinct_bigrams
      FROM (SELECT DISTINCT source, text FROM documents) st
      JOIN bg USING (text)
      GROUP BY 1
    )
    SELECT t.source, t.total_bigrams,
           CAST(d.distinct_bigrams AS BIGINT) AS distinct_bigrams,
           round(d.distinct_bigrams::DOUBLE / t.total_bigrams, 6)
             AS distinct_ratio
    FROM tot t JOIN dst d USING (source)
    ORDER BY t.source
    """,
)
def distinct_bigram_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    w = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0))
    bg = (
        d.select("text")
        .distinct()
        .select("text", w.alias("w"))
        .select(
            "text",
            F.explode(
                F.expr(
                    "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
                    " (x, i) -> concat(x, ' ', element_at(w, i + 2)))"
                )
            ).alias("g"),
        )
    )
    per_text = bg.groupBy("text").agg(F.count(F.lit(1)).alias("nb"))
    tot = (
        _inherit(
            d.select("source", "text"),
            per_text,
            ["text"],
            how="left",
            gate=d.select("text").distinct(),
        )
        .groupBy("source")
        .agg(F.sum(F.coalesce(F.col("nb"), F.lit(0))).cast("long").alias("total_bigrams"))
    )
    st = d.select("source", "text").distinct()
    dst = (
        _inherit(st, bg, ["text"], gate=d.select("text").distinct())
        .select("source", "g")
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("distinct_bigrams"))
    )
    return (
        tot.join(dst, "source")
        .select(
            "source",
            "total_bigrams",
            "distinct_bigrams",
            F.round(
                F.col("distinct_bigrams").cast("double") / F.col("total_bigrams"), 6
            ).alias("distinct_ratio"),
        )
        .orderBy("source")
    )


# Zipf rank-frequency slope per source: OLS of ln(freq) on ln(rank)
# over each source's top-100 tokens. Natural text sits near slope -1;
# a flat or cliff-shaped curve flags templated/synthetic sources in a
# mixture. Exactness via the round-the-MODEL discipline (same as the NB
# classifier): both engines round the ~100 ln() doubles per source to
# micro-nat longs FIRST, then every moment sum is integer-exact and the
# closed-form OLS runs on identical inputs.
@query(
    "zipf_slope_by_source",
    oracle="""
    WITH dt AS (SELECT DISTINCT text FROM documents),
    tfd AS (
      SELECT text, t.token, COUNT(*) AS tf
      FROM dt, unnest(regexp_extract_all(lower(text), '\\S+')) AS t(token)
      GROUP BY 1, 2
    ),
    grp AS (SELECT source, text, COUNT(*) AS w FROM documents GROUP BY 1, 2),
    cnt AS (
      SELECT grp.source, tfd.token,
             CAST(SUM(tfd.tf * grp.w) AS BIGINT) AS freq
      FROM tfd JOIN grp USING (text) GROUP BY 1, 2
    ),
    ranked AS (
      SELECT source, freq,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY freq DESC, token) AS rank
      FROM cnt
    ),
    pts AS (
      SELECT source,
             CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS lx,
             CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS ly
      FROM ranked WHERE rank <= 100
    ),
    m AS (
      SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(lx) AS DOUBLE) / 1e6 AS sx,
             CAST(SUM(ly) AS DOUBLE) / 1e6 AS sy,
             CAST(SUM(lx * lx) AS DOUBLE) / 1e12 AS sxx,
             CAST(SUM(lx * ly) AS DOUBLE) / 1e12 AS sxy
      FROM pts GROUP BY 1
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM m ORDER BY source
    """,
)
def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    tfd = (
        d.select("text")
        .distinct()
        .select(
            "text",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(r"\S+"), F.lit(0)
                )
            ).alias("token"),
        )
        .groupBy("text", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    grp = d.groupBy("source", "text").agg(F.count(F.lit(1)).alias("w"))
    cnt = (
        _inherit(grp, tfd, ["text"], gate=d.select("text").distinct())
        .groupBy("source", "token")
        .agg(F.sum(F.col("tf") * F.col("w")).cast("long").alias("freq"))
    )
    from pyspark.sql import Window

    win = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("token")
    )
    fixlog = lambda c: F.round(F.log(c.cast("double")) * 1e6).cast("long")  # noqa: E731
    pts = (
        cnt.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 100)
        .select(
            "source",
            fixlog(F.col("rank")).alias("lx"),
            fixlog(F.col("freq")).alias("ly"),
        )
    )
    m = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum("lx").cast("double") / 1e6).alias("sx"),
        (F.sum("ly").cast("double") / 1e6).alias("sy"),
        (F.sum(F.col("lx") * F.col("lx")).cast("double") / 1e12).alias("sxx"),
        (F.sum(F.col("lx") * F.col("ly")).cast("double") / 1e12).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "source",
        F.col("n").cast("long").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
    ).orderBy("source")
