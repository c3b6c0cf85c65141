"""Distributed multinomial Naive Bayes text classification — the
workhorse shape behind corpus-pipeline document taggers (domain
routing, FineWeb-Edu-style quality tiers, language-register buckets):
cheap enough to score every page of a web crawl, trainable from a
label table with two aggregations.

Model (McCallum & Nigam, AAAI'98 workshop formulation, Laplace
smoothing with pseudo-count alpha):

    logprior(c)  = ln( N_c / N )
    loglik(t|c)  = ln( (count(t,c) + alpha) / (tot_c + alpha * V) )
    score(d, c)  = logprior(c) + sum_t tf(t,d) * loglik(t|c)
    label(d)     = argmax_c round(score, 9), ties -> label asc

Everything is DataFrame algebra: training is two groupBy aggregations
(per-(label, term) counts and per-label totals) plus three 1-row
frames (N, V, nothing driver-side); scoring expands the doc-term table
by the label set (a broadcast of the few-row label list), left-joins
the count table so unseen (label, term) pairs fall back to the
smoothed zero, and reduces per (doc, label).  The argmax rides a
row_number window on the ROUNDED score with label tie-break so the
winner is identical across engines (CLAUDE.md rank rule).

Scale: the expansion is |doc-term rows| x |labels| — labels are
single digits in practice, so the widest shuffle is the same
(doc_id)-keyed agg the tf table itself needed.  count(t,c) is
vocabulary x labels, broadcast-eligible against the expansion for
small vocabularies and a plain term-keyed shuffle join otherwise
(Catalyst/AQE picks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def nb_train(tf: DataFrame, labels: DataFrame, alpha: float = 1.0) -> dict:
    """Fit from `tf` (doc_id, term, tf) and `labels` (doc_id, label).
    Returns the model as small DataFrames: `priors` (label, logprior),
    `counts` (label, term, c), `totals` (label, tot), and 1-row
    `vocab_n` (v).  All lazily defined; materialization is the
    caller's call (predict joins them as-is)."""
    joined = tf.join(labels, "doc_id")
    counts = joined.groupBy("label", "term").agg(F.sum("tf").alias("c"))
    totals = counts.groupBy("label").agg(F.sum("c").alias("tot"))
    vocab_n = tf.select("term").distinct().agg(F.count("*").alias("v"))
    n_docs = labels.agg(F.count("*").alias("n"))
    priors = (
        labels.groupBy("label")
        .agg(F.count("*").alias("n_c"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "label",
            F.log(F.col("n_c").cast("double") / F.col("n").cast("double")).alias(
                "logprior"
            ),
        )
    )
    return {
        "priors": priors,
        "counts": counts,
        "totals": totals,
        "vocab_n": vocab_n,
        "alpha": alpha,
    }


def nb_score(tf: DataFrame, model: dict) -> DataFrame:
    """(doc_id, label, score) — the full per-label log-posterior
    surface (unnormalized), rounded to the 1e-9 grid."""
    alpha = F.lit(float(model["alpha"]))
    labels_dim = model["priors"].select("label")
    expanded = (
        tf.crossJoin(F.broadcast(labels_dim))
        .join(model["counts"], ["label", "term"], "left")
        .join(F.broadcast(model["totals"]), "label")
        .crossJoin(F.broadcast(model["vocab_n"]))
        .select(
            "doc_id",
            "label",
            (
                F.col("tf").cast("double")
                * F.log(
                    (F.coalesce("c", F.lit(0)) + alpha)
                    / (F.col("tot") + alpha * F.col("v"))
                )
            ).alias("x"),
        )
    )
    return (
        expanded.groupBy("doc_id", "label")
        .agg(F.sum("x").alias("s"))
        .join(F.broadcast(model["priors"]), "label")
        .select(
            "doc_id", "label", F.round(F.col("logprior") + F.col("s"), 9).alias("score")
        )
    )


def nb_classify(tf: DataFrame, labels: DataFrame, alpha: float = 1.0) -> DataFrame:
    """Train on (tf, labels) and return the argmax label per doc:
    (doc_id, label, score) with the deterministic rounded-score /
    label-asc winner rule."""
    scored = nb_score(tf, nb_train(tf, labels, alpha))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
