"""Pseudo-relevance feedback query expansion — RM3 (Lavrenko & Croft,
SIGIR'01 relevance models; the RM3 interpolation as popularized in
Abdul-Jaleel et al., TREC'04 / Lucene's common PRF setup): run the
query, treat the top-k documents as pseudo-relevant, estimate a
relevance language model from them, interpolate it with the original
query, and re-rank with the expanded weighted query.  The standard
recall lever when web queries are short and vocabulary mismatch is
the dominant failure ("automobile" docs for a "car" query).

    pass 1   BM25 top fb_docs (this engine's exact conventions)
    RM       P(t|R) = sum_{d in top}  (score_d / sum_scores) * (tf_td / dl_d)
    select   top fb_terms by P(t|R)  (round-9 + term-asc tie-break)
    weights  w_t = lam * P(t|q) + (1-lam) * Pnorm(t|R)
             with P(t|q) uniform 1/|q| and Pnorm renormalized over the
             selected expansion set
    pass 2   score(d) = sum_t  w_t * idf_t * tfnorm_td   (weighted BM25)

Everything is two passes of the same per-(doc, term) BM25 frame —
pass 2's term set is a DATA-dependent DataFrame (the expansion terms),
so the candidate probe is a term-keyed join instead of an isin
literal; df/idf for expansion terms are computed from the same tf
table.  All selections rank on round(x, 9) with deterministic
tie-breaks so the DuckDB oracle unrolls both passes exactly.

Scale: top-doc and top-term selections are global row_number windows
over ALREADY-AGGREGATED frames (candidate-set-sized and
vocabulary-of-top-docs-sized respectively — not corpus-sized); the
expansion term list (tens of rows) broadcasts into pass 2's probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bm25_frame(
    cand: DataFrame, tw: DataFrame, corpus: DataFrame, k1: float, b: float
) -> DataFrame:
    """Per-(doc_id, term) idf and tfnorm for a candidate tf frame;
    df computed WITHIN cand (join before aggregating keeps one scan)."""
    df_t = cand.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
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
    )


def rm3_rerank(
    tf: DataFrame,
    tw: DataFrame,
    query_terms: list[str],
    fb_docs: int = 10,
    fb_terms: int = 10,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(rank, doc_id, score) after RM3 expansion.

    tf: (doc_id, term, tf); tw: (doc_id, total_words).

    The tf frame is consulted four times (pass-1 probe, relevance
    model, expansion df, pass-2 probe): at corpus scale pass a
    persisted/checkpointed tf (and tw) so the tokenization lineage
    runs once — the caller owns materialization, same contract as
    ltr_features.
    """
    q = sorted(set(query_terms))
    corpus = tw.agg(F.count("*").alias("n_docs"), F.avg("total_words").alias("avgdl"))

    # ---- pass 1: BM25 over the original query, keep top fb_docs ----
    p1 = (
        _bm25_frame(tf.where(F.col("term").isin(q)), tw, corpus, k1, b)
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("idf") * F.col("tfnorm")), 9).alias("score"))
    )
    wtop = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    top = (
        p1.withColumn("_rn", F.row_number().over(wtop))
        .where(F.col("_rn") <= fb_docs)
        .drop("_rn")
        .localCheckpoint()
    )

    # ---- relevance model over the pseudo-relevant set ----
    tot = top.agg(F.sum("score").alias("tot"))
    rm = (
        top.join(tf, "doc_id")
        .join(tw, "doc_id")
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            (
                (F.col("score") / F.col("tot"))
                * (F.col("tf").cast("double") / F.col("total_words").cast("double"))
            ).alias("x"),
        )
        .groupBy("term")
        .agg(F.round(F.sum("x"), 9).alias("p_rm"))
    )
    wterm = Window.orderBy(F.desc("p_rm"), F.asc("term"))
    exp_terms = (
        rm.withColumn("_rn", F.row_number().over(wterm))
        .where(F.col("_rn") <= fb_terms)
        .drop("_rn")
        .localCheckpoint()
    )
    norm = exp_terms.agg(F.sum("p_rm").alias("z"))
    exp_w = exp_terms.crossJoin(F.broadcast(norm)).select(
        "term", (F.col("p_rm") / F.col("z")).alias("p_norm")
    )

    # ---- interpolated query weights ----
    orig = tf.sparkSession.createDataFrame(
        [(t,) for t in q], "term string"
    ).withColumn("q_w", F.lit(1.0) / F.lit(float(len(q))))
    weights = (
        orig.join(exp_w, "term", "full_outer")
        .select(
            "term",
            (
                F.lit(lam) * F.coalesce("q_w", F.lit(0.0))
                + (F.lit(1.0) - F.lit(lam)) * F.coalesce("p_norm", F.lit(0.0))
            ).alias("w"),
        )
        .localCheckpoint()
    )

    # ---- pass 2: weighted BM25 over the expanded query ----
    cand2 = tf.join(F.broadcast(weights.select("term")), "term")
    scored = (
        _bm25_frame(cand2, tw, corpus, k1, b)
        .join(F.broadcast(weights), "term")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("w") * (F.col("idf") * F.col("tfnorm"))), 9).alias("score"))
    )
    wrank = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.select(
        F.row_number().over(wrank).cast("long").alias("rank"), "doc_id", "score"
    )
