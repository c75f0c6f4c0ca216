"""Trainable-classifier queries: multinomial Naive Bayes on documents.

The classifier trains, scores, and argmaxes in exact integer fixed-point
(operators.classify — the model's log-probabilities are rounded to
micro-nat longs at train time), so a TRAINED MODEL's predictions are
hash-verifiable against a DuckDB re-derivation exactly like any join:
both engines round the same ~|V|x|L| doubles once, then every sum and
comparison is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wopen_spark.operators.classify import _SCALE, nb_predict, nb_train
from wopen_spark.queries.registry import _inherit, _spread, _t, query

_DUCK_W = "regexp_extract_all(lower(text), '\\S+')"

# Shared oracle CTE chain: tf per distinct text -> clone-weighted
# (lang, token) counts -> fixed-point model -> sparse scores -> argmax.
_DUCK_NB = f"""
    dt AS (SELECT DISTINCT text FROM documents),
    tf AS (
      SELECT text, t.token, COUNT(*) AS tf
      FROM dt, unnest({_DUCK_W}) AS t(token)
      GROUP BY 1, 2
    ),
    grp AS (SELECT text, lang, COUNT(*) AS w FROM documents GROUP BY 1, 2),
    c AS (
      SELECT grp.lang AS label, tf.token, CAST(SUM(tf.tf * grp.w) AS BIGINT) AS c
      FROM tf JOIN grp USING (text) GROUP BY 1, 2
    ),
    totals AS (SELECT label, SUM(c) AS total_tokens FROM c GROUP BY 1),
    vocab AS (SELECT COUNT(DISTINCT token) AS v FROM c),
    lmodel AS (
      SELECT label, total_tokens,
             CAST(round(ln(1.0 / (total_tokens + v)) * {_SCALE}) AS BIGINT) AS l0
      FROM totals CROSS JOIN vocab
    ),
    wmodel AS (
      SELECT c.token, c.label,
             CAST(round(ln(CAST(c.c + 1 AS DOUBLE) / (lm.total_tokens + v))
                        * {_SCALE}) AS BIGINT) - lm.l0 AS l_delta
      FROM c JOIN lmodel lm USING (label) CROSS JOIN vocab
    ),
    nd AS (SELECT lang AS label, COUNT(*) AS n_l FROM documents GROUP BY 1),
    ndt AS (SELECT SUM(n_l) AS n FROM nd),
    priors AS (
      SELECT label,
             CAST(round(ln(CAST(n_l AS DOUBLE) / n) * {_SCALE}) AS BIGINT) AS prior
      FROM nd CROSS JOIN ndt
    ),
    ntok AS (SELECT text, CAST(SUM(tf) AS BIGINT) AS n FROM tf GROUP BY 1),
    base AS (
      SELECT ntok.text, lm.label, p.prior + lm.l0 * ntok.n AS base
      FROM ntok CROSS JOIN lmodel lm JOIN priors p ON p.label = lm.label
    ),
    lift AS (
      SELECT tf.text, wm.label, SUM(tf.tf * wm.l_delta) AS lift
      FROM tf JOIN wmodel wm USING (token) GROUP BY 1, 2
    ),
    scored AS (
      SELECT base.text, base.label,
             base.base + COALESCE(lift.lift, 0) AS score
      FROM base LEFT JOIN lift
        ON lift.text = base.text AND lift.label = base.label
    ),
    pred AS (
      SELECT text, label AS predicted FROM (
        SELECT text, label,
               ROW_NUMBER() OVER (PARTITION BY text
                                  ORDER BY score DESC, label ASC) AS rk
        FROM scored
      ) WHERE rk = 1
    )
"""


def _nb_predictions(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(documents frame, per-distinct-text predictions) shared by the
    NB queries: tokenize once per DISTINCT text, train on clone-weighted
    (lang, token) counts, score sparsely, argmax with integer scores."""
    d = _spread(spark, _t(spark, sf_dir, "documents"))
    tf = (
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
    grp = d.groupBy("text", F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).alias("w")
    )
    labeled_tf = tf.join(grp, "text").select("label", "token", "tf", "w")
    model = nb_train(labeled_tf, weight_col="w")
    nd = d.groupBy(F.col("lang").alias("label")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    n = nd.agg(F.sum("n_l").alias("n"))
    priors = nd.crossJoin(F.broadcast(n)).select(
        "label",
        F.round(
            F.log(F.col("n_l").cast("double") / F.col("n").cast("double"))
            * _SCALE
        )
        .cast("long")
        .alias("prior"),
    )
    return d, nb_predict(tf, model, priors, key_col="text")


@query(
    "nb_lang_confusion",
    oracle=f"""
    WITH {_DUCK_NB}
    SELECT d.lang AS actual_lang, pred.predicted AS predicted_lang,
           COUNT(*) AS n_docs
    FROM documents d JOIN pred USING (text)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def nb_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resubstitution confusion matrix of the trained NB language model:
    every document scored through the fixed-point model it was trained
    on — the standard first sanity report for a corpus-labeling model
    (is lang separable from token counts at all, and where does it
    bleed). One tokenize pass; scoring joins touch only observed
    (token, label) pairs."""
    d, pred = _nb_predictions(spark, sf_dir)
    return (
        _inherit(
            d.select("lang", "text"),
            pred.select("text", "predicted"),
            ["text"],
            gate=d.select("text").distinct(),
        )
        .groupBy(
            F.col("lang").alias("actual_lang"),
            F.col("predicted").alias("predicted_lang"),
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )
