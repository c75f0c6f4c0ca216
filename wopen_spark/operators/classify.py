"""Trainable text classifiers as DataFrame pipelines.

Multinomial Naive Bayes over token counts, trained and scored entirely
in exact integer arithmetic: the ONLY floats are the ~|V|x|L| per-model
log-probabilities, which are rounded to fixed-point longs at train time
(``scale`` micro-nats). Every downstream sum, argmax, and tie-break is
then integer-exact — order-independent across partitions and bit-equal
across engines — so a trained classifier is oracle-verifiable the same
way a join is. (Round the MODEL, not the scores: per-document float
sums would be shuffle-order-dependent.)

Scale shape: training is one tokenize pass + two groupBys on uniform
(token, label) keys; scoring uses the SPARSE formulation
``score = prior + L0 * n_tokens + sum_present tf * (L - L0)`` so the
score join only touches observed (token, label) pairs — unseen-word
mass folds into the closed-form ``L0 * n_tokens`` term instead of a
dense vocab x labels fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-nats; fixed-point resolution of the model


def _fixed_log(col) -> F.Column:
    """ln(col) in micro-nats as an exact long."""
    return F.round(F.log(col) * _SCALE).cast("long")


def nb_train(
    labeled_tf: DataFrame,
    weight_col: str | None = None,
) -> dict[str, DataFrame]:
    """Train multinomial NB with Laplace (+1) smoothing.

    ``labeled_tf``: one row per (label, token) observation carrier with
    columns ``label``, ``token``, ``tf`` (term frequency, long) and an
    optional replication weight (clone-collapse weight). Returns three
    small model frames:

    - ``word``:  (token, label, l_delta) where l_delta = L(w,l) - L0(l),
      the fixed-point log-likelihood LIFT of an observed word over the
      unseen-word floor (only observed pairs are materialized);
    - ``label``: (label, l0, total_tokens) with the unseen-word floor
      L0(l) = ln(1 / (total_l + V)) in micro-nats;
    - priors are the caller's job (they live with the document counts,
      not the token counts).
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    c = labeled_tf.groupBy("label", "token").agg(
        F.sum(F.col("tf") * w).cast("long").alias("c")
    )
    totals = c.groupBy("label").agg(F.sum("c").alias("total_tokens"))
    vocab_n = c.select("token").distinct().agg(
        F.count(F.lit(1)).alias("vocab_n")
    )
    label_model = totals.crossJoin(F.broadcast(vocab_n)).select(
        "label",
        "total_tokens",
        _fixed_log(
            F.lit(1.0) / (F.col("total_tokens") + F.col("vocab_n")).cast("double")
        ).alias("l0"),
    )
    word_model = (
        c.join(F.broadcast(label_model.select("label", "total_tokens", "l0")), "label")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "token",
            "label",
            (
                _fixed_log(
                    (F.col("c") + 1).cast("double")
                    / (F.col("total_tokens") + F.col("vocab_n")).cast("double")
                )
                - F.col("l0")
            ).alias("l_delta"),
        )
    )
    return {"word": word_model, "label": label_model}


def nb_predict(
    tf: DataFrame,
    model: dict[str, DataFrame],
    priors: DataFrame,
    key_col: str = "text",
) -> DataFrame:
    """Score each key (one row per (key, token, tf)) against every label
    and return (key, predicted, score) — argmax with a deterministic
    (score DESC, label ASC) tie-break, all in exact longs.

    ``priors``: (label, prior) fixed-point log-prior frame.
    """
    n_tokens = tf.groupBy(key_col).agg(F.sum("tf").cast("long").alias("_n"))
    base = n_tokens.crossJoin(
        F.broadcast(
            model["label"].join(priors, "label").select("label", "l0", "prior")
        )
    ).select(
        key_col,
        "label",
        (F.col("prior") + F.col("l0") * F.col("_n")).alias("_base"),
    )
    lift = (
        tf.join(model["word"], "token")
        .groupBy(key_col, "label")
        .agg(F.sum(F.col("tf") * F.col("l_delta")).alias("_lift"))
    )
    scored = base.join(lift, [key_col, "label"], "left").select(
        key_col,
        "label",
        (F.col("_base") + F.coalesce(F.col("_lift"), F.lit(0))).alias("score"),
    )
    win = Window.partitionBy(key_col).orderBy(
        F.col("score").desc(), F.col("label").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(win))
        .filter(F.col("_rk") == 1)
        .select(key_col, F.col("label").alias("predicted"), "score")
    )
