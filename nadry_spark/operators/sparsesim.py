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
    threshold, over tf rows (doc, term, tf) — one row per (doc, term)
    (the usual output of a (doc, term) count aggregation; df is taken
    from the per-term posting-list size)."""
    # ONE term-keyed grouping carries everything the old formulation
    # derived from three subtrees (df aggregation + tf-weight join +
    # checkpoint): the per-term posting array IS the df (size), the
    # idf factor is a per-term column, and the df*(df-1)/2 pairs
    # explode in place. sort_array orders each posting list by doc id,
    # so slicing strictly after the left element enumerates exactly
    # the id_a < id_b pairs.
    tf = tf.persist()
    grouped = (
        tf.groupBy(F.col(term_col).alias("t"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("d"), F.col(tf_col).alias("tf")))
            ).alias("ps")
        )
        # materialized once: feeds the pruned-count job, the pair
        # explode and the norm aggregation (and cuts the tf lineage
        # out of the returned frame)
        .localCheckpoint()
    )
    n = tf.select(id_col).distinct().count()
    tf.unpersist()
    dropped = grouped.where(F.size("ps") > max_df).count()
    if dropped:
        log.warning(
            "tfidf_cosine_pairs: pruning %d terms with df > %d from the "
            "pair join (their idf weight is lowest, their pair cost df^2 "
            "is highest)", dropped, max_df,
        )
    if stats is not None:
        stats["pruned_terms"] = dropped

    # w(d, t) = tf * ln(n / df), bit-identical to the old join form:
    # same double cast, same quotient, same ln — df = size(ps) equals
    # the old countDistinct for one-row-per-(doc,term) input, and the
    # integer n embeds exactly as a double literal.
    kept = grouped.where(F.size("ps") <= max_df).select(
        "ps",
        F.log(
            F.lit(float(n)) / F.size("ps").cast("double")
        ).alias("lnw"),
    )
    norms = (
        kept.select("lnw", F.explode("ps").alias("x"))
        .select(
            F.col("x.d").alias("d"),
            (F.col("x.tf").cast("double") * F.col("lnw")).alias("w"),
        )
        .groupBy("d")
        .agg(F.round(F.sqrt(F.sum(F.col("w") * F.col("w"))), 9).alias("nrm"))
    )

    # Dot-product addends are unchanged (same w(d,t) * w(d',t)
    # products); only their summation order moves, which the 1e-9
    # rounding grid at the cosine (and the oracle's own engine-order
    # independence) already absorbs — same noise class as Spark's
    # partial-agg order.
    e1 = kept.select("lnw", F.posexplode("ps").alias("i", "a"), F.col("ps"))
    e2 = e1.select(
        "lnw",
        "a",
        F.explode(F.expr("slice(ps, i + 2, size(ps) - i - 1)")).alias("b"),
    )
    dots = (
        e2.select(
            F.col("a.d").alias("id_a"),
            F.col("b.d").alias("id_b"),
            (
                (F.col("a.tf").cast("double") * F.col("lnw"))
                * (F.col("b.tf").cast("double") * F.col("lnw"))
            ).alias("p"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum("p").alias("dot"))
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
