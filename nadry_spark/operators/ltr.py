"""Learning-to-rank feature-matrix assembly — the export step between
a search engine and its ranker training job (the LETOR/MSLR table
shape: one row per (query, candidate doc), one column per feature).
A web-scale pipeline regenerates this matrix per training cycle over
every logged query, so the assembly must be pure DataFrame algebra:
candidate generation from the tf table, the BM25 core computed with
THIS engine's exact conventions (operators/bm25.bm25_idf, k1=1.2
b=0.75, same op order as the bm25_rank driver row so the feature
equals the serving score bit-for-bit), and arbitrary extra signal
frames (anchor tf, in-degree, field hits, pagerank, ...) left-joined
with a zero default — a missing signal is feature 0, never a dropped
candidate row.

Scale shape: candidates = docs matching >=1 query term (the posting
union, NOT the corpus); per-feature frames join on doc_id; broadcast
df/corpus scalars.  The output is written per query-batch, so the
only corpus-sized shuffle is the tf aggregation the caller already
built.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ltr_features(
    tf: DataFrame,
    tw: DataFrame,
    query_terms: list[str],
    extras: dict[str, DataFrame] | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """One row per candidate doc (matches >=1 query term):
    (doc_id, f_bm25, f_tf_sum, f_matched_terms, f_doclen, <extras...>).

    tf: (doc_id, term, tf); tw: (doc_id, total_words);
    extras: name -> (doc_id, <name>) frames, left-joined, 0-defaulted.
    """
    q = sorted(set(query_terms))
    corpus = tw.agg(F.count("*").alias("n_docs"), F.avg("total_words").alias("avgdl"))
    cand = tf.where(F.col("term").isin(q))
    df_t = cand.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        cand.join(tw, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)),
        )
        .withColumn(
            "tfnorm",
            F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("total_words") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.col("idf") * F.col("tfnorm")), 9).alias("f_bm25"),
            F.sum("tf").alias("f_tf_sum"),
            F.count("*").alias("f_matched_terms"),
        )
    )
    out = scored.join(
        tw.select("doc_id", F.col("total_words").alias("f_doclen")), "doc_id"
    )
    for name, fdf in (extras or {}).items():
        out = out.join(fdf, "doc_id", "left").withColumn(
            name, F.coalesce(F.col(name), F.lit(0).cast("long"))
        )
    return out
