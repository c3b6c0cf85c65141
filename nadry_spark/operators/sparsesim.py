"""Pairwise document similarity from the inverted index — sparse
TF-IDF cosine via a postings self-join (Elsayed, Lin & Oard, ACL'08,
"Pairwise document similarity in large collections with MapReduce").
The weighted counterpart to the exact-Jaccard all-pairs join
(operators/dedup.ngram_jaccard_dups): instead of set overlap it
scores cos(d1, d2) over tf*idf vectors, and instead of a prefix
filter it prunes by DOCUMENT FREQUENCY — a term occurring in df docs
generates df^2/2 partial products, so the highest-df terms cost
almost all the work while contributing the least idf weight.

    w(d, t)    = tf * ln(N / df)
    dot(d1,d2) = sum_t  w(d1,t) * w(d2,t)      (terms with df <= max_df)
    cos        = dot / (||d1|| * ||d2||)       (norms over KEPT terms)

Norms are computed over the same pruned term space as the dot
product, so cos stays a true cosine of the pruned vectors (<= 1) and
the pruning is a documented approximation of the full-vocabulary
cosine, exactly as in the paper.  Dropped terms are counted and
reported via ``stats`` — never silent.

Scale: one df aggregation, one term-keyed postings self-join bounded
by max_df^2 pairs per term, one (d1, d2) aggregation.  All shuffles
key on term or the pair; no driver-side data.  Cosines land on the
1e-9 grid with the threshold applied to the ROUNDED value.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def tfidf_cosine_pairs(
    tf: DataFrame,
    max_df: int = 100,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    term_col: str = "term",
    tf_col: str = "tf",
    stats: dict | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) with id_a < id_b and rounded cosine >=
    threshold, over tf rows (doc, term, tf)."""
    # the tf input is typically an expensive pipeline (shingle windows +
    # groupBy); it feeds FOUR subtrees below (df aggregation, the
    # pruned-terms count, n_docs, and the weight projection) — persist
    # so it computes once instead of once per consumer
    tf = tf.persist()
    df_t = tf.groupBy(term_col).agg(F.countDistinct(id_col).alias("df"))
    n_docs = tf.select(id_col).distinct().agg(F.count("*").alias("n"))
    dropped = df_t.where(F.col("df") > max_df).count()
    if dropped:
        log.warning(
            "tfidf_cosine_pairs: pruning %d terms with df > %d from the "
            "pair join (their idf weight is lowest, their pair cost df^2 "
            "is highest)", dropped, max_df,
        )
    if stats is not None:
        stats["pruned_terms"] = dropped

    w = (
        tf.join(df_t.where(F.col("df") <= max_df), term_col)
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col).alias("d"),
            F.col(term_col).alias("t"),
            (
                F.col(tf_col).cast("double")
                * F.log(F.col("n").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        )
        .localCheckpoint()
    )
    tf.unpersist()
    norms = w.groupBy("d").agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 9).alias("nrm"))

    a = w.select(F.col("d").alias("id_a"), "t", F.col("w").alias("wa"))
    b = w.select(F.col("d").alias("id_b"), "t", F.col("w").alias("wb"))
    dots = (
        a.join(b, "t")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    return (
        dots.join(norms.select(F.col("d").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(norms.select(F.col("d").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 9).alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(float(threshold)))
    )
