"""PII scrubbing and repetition-based quality filtering — two
training-data curation ops the corpus pass runs before anything else.

The synthetic documents contain no PII, so the scrub query plants a
deterministic contact block (derived from doc_id with pure integer
arithmetic, identical in both engines) and then proves the redaction
removes it. The repetition metrics are the word-level analogues of the
Gopher repetition rules (the docs have no newlines, so line-based
fractions would be degenerate): top-word fraction and duplicate-bigram
fraction, with thresholds calibrated so the corpus splits into both
classes.

Scale shape: scrubbing is a pure Column regexp chain (codegen, no
shuffle, no Python); repetition metrics are higher-order array ops
computed once per DISTINCT text and broadcast-joined back to docs —
the clone-collapse pattern every text-scoring query here uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.queries.registry import _inherit, _spread, _t, query

# Patterns accepted identically by Java regex (Spark) and RE2 (DuckDB):
# character classes, bounded repetition, no lookarounds.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{4}"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_scrub(col: Column) -> Column:
    """Redact emails, then phone numbers, then IPv4 addresses. Order
    matters (an email's domain must not be half-eaten by the IP rule
    first); each stage is one JVM-side regexp_replace."""
    out = F.regexp_replace(col, _EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, _PHONE_RE, "[PHONE]")
    return F.regexp_replace(out, _IP_RE, "[IP]")


def pii_counts(col: Column) -> list[Column]:
    return [
        F.regexp_count(col, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(col, F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_count(col, F.lit(_IP_RE)).alias("n_ips"),
    ]


# contact block planted per doc: user<id>@mail.example, +1-555-<id%10000>,
# 10.<id%256>.0.<id*7%256> — all integer-derived, so both engines build
# byte-identical inputs
_DUCK_SYNTH = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@mail.example'"
    " || ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR)"
)


@query(
    "pii_scrub_docs",
    oracle=f"""
    WITH synth AS (SELECT doc_id, {_DUCK_SYNTH} AS t FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(t, '{_IP_RE}')) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{_EMAIL_RE}', '[EMAIL]', 'g'),
               '{_PHONE_RE}', '[PHONE]', 'g'),
               '{_IP_RE}', '[IP]', 'g')) AS scrubbed_md5
    FROM synth ORDER BY doc_id
    """,
)
def pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plant a deterministic contact block in every doc, count each PII
    category, and hash the scrubbed text (the hash pins the exact
    replacement output, not just the counts)."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    synth = F.concat(
        F.col("text"),
        F.lit(" Contact user"), F.col("doc_id").cast("string"), F.lit("@mail.example"),
        F.lit(" or +1-555-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."), ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    t = d.select("doc_id", synth.alias("t"))
    return t.select(
        "doc_id",
        *pii_counts(F.col("t")),
        F.md5(pii_scrub(F.col("t"))).alias("scrubbed_md5"),
    ).orderBy("doc_id")


# word-level Gopher-style repetition metrics; thresholds calibrated on
# the corpus (top-word frac spans 0.05-0.30, dup-bigram frac 0-0.13)
_TOP_THRESH, _DUP_THRESH = 0.12, 0.05


@query(
    "repetition_filter_docs",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, regexp_extract_all(lower(trim(text)), '\\S+') AS w
      FROM documents
    ),
    mm AS (
      SELECT doc_id,
        round(CASE WHEN len(w) > 0 THEN
          list_max(list_transform(list_distinct(w),
                   d -> len(list_filter(w, x -> x = d))))::DOUBLE / len(w)
          ELSE 0.0 END, 6) AS top_word_frac,
        round(CASE WHEN len(w) >= 2 THEN
          1.0 - len(list_distinct(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])))::DOUBLE / (len(w) - 1)
          ELSE 0.0 END, 6) AS dup_bigram_frac
      FROM m
    )
    SELECT doc_id, top_word_frac, dup_bigram_frac,
           (top_word_frac > {_TOP_THRESH} OR dup_bigram_frac > {_DUP_THRESH}) AS flagged
    FROM mm ORDER BY doc_id
    """,
)
def repetition_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition metrics + flag. Metrics are a function of the
    text alone, so they are computed once per distinct text and clones
    inherit them through a broadcast join (contamination-query shape)."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    texts = d.select("text").distinct()
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    m = texts.select("text", w.alias("w"))
    top = F.round(
        F.when(
            F.size("w") > 0,
            F.array_max(
                F.transform(
                    F.array_distinct("w"),
                    lambda d_: F.size(F.filter("w", lambda x: x == d_)),
                )
            ).cast("double")
            / F.size("w"),
        ).otherwise(0.0),
        6,
    )
    bigrams = F.zip_with(
        F.col("w"),
        F.slice("w", 2, F.greatest(F.size("w") - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    dup = F.round(
        F.when(
            F.size("w") >= 2,
            1.0
            - F.size(
                F.array_distinct(F.filter(bigrams, lambda x: x.isNotNull()))
            ).cast("double")
            / (F.size("w") - 1),
        ).otherwise(0.0),
        6,
    )
    metrics = m.select(
        "text", top.alias("top_word_frac"), dup.alias("dup_bigram_frac")
    )
    return (
        _inherit(d.select("doc_id", "text"), metrics, ["text"])
        .select(
            "doc_id",
            "top_word_frac",
            "dup_bigram_frac",
            (
                (F.col("top_word_frac") > _TOP_THRESH)
                | (F.col("dup_bigram_frac") > _DUP_THRESH)
            ).alias("flagged"),
        )
        .orderBy("doc_id")
    )
