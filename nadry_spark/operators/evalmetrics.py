"""Ranking-evaluation metrics — NDCG@k, MRR and recall@k over a run
table and graded relevance judgments (the TREC qrels shape).  An
engine that exports LTR features (operators/ltr) and re-ranks
(operators/prf, diversify) needs the matching measurement harness in
the same execution model: at web scale the run table is millions of
(query, doc, rank) rows and evaluation is itself a distributed join.

    DCG@k  = sum_{i<=k}  (2^rel_i - 1) / log2(i + 1)
    NDCG@k = DCG@k / IDCG@k      (ideal ranking from qrels, ties by
                                  doc_id so the ideal is total-ordered)
    MRR    = 1 / rank of the first rel>0 result (0 if none in the run)
    recall@k = |relevant retrieved in top k| / |relevant|

Judgment-missing run rows count rel=0 (standard); queries with no
relevant docs in qrels are excluded (metrics undefined).  All
arithmetic is fixed-order double math on small integers (2^rel exact,
log2 of integer arguments) rounded at 1e-9, so the DuckDB oracle
reproduces it bit-for-bit.

Scale: one (query, doc)-keyed left join + two (query)-keyed
aggregations; the ideal-DCG side is a window over qrels only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(query_id, ndcg, mrr, recall) per judged query with >=1
    relevant doc."""
    joined = (
        runs.select(query_col, doc_col, rank_col)
        .where(F.col(rank_col) <= k)
        .join(qrels, [query_col, doc_col], "left")
        .withColumn("_rel", F.coalesce(rel_col, F.lit(0)))
    )
    gain = (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)) / F.log2(
        F.col(rank_col).cast("double") + F.lit(1.0)
    )
    per_q = joined.groupBy(query_col).agg(
        F.sum(gain).alias("_dcg"),
        F.min(
            F.when(F.col("_rel") > 0, F.col(rank_col))
        ).alias("_first_rel"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("_hits"),
    )

    wq = Window.partitionBy(query_col).orderBy(
        F.desc(rel_col), F.asc(doc_col)
    )
    rel_only = qrels.where(F.col(rel_col) > 0)
    ideal = (
        rel_only.withColumn("_irank", F.row_number().over(wq))
        .where(F.col("_irank") <= k)
        .groupBy(query_col)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0))
                / F.log2(F.col("_irank").cast("double") + F.lit(1.0))
            ).alias("_idcg")
        )
    )
    totals = rel_only.groupBy(query_col).agg(F.count("*").alias("_n_rel"))

    return (
        per_q.join(ideal, query_col)
        .join(totals, query_col)
        .select(
            query_col,
            F.round(F.col("_dcg") / F.col("_idcg"), 9).alias("ndcg"),
            F.round(
                F.coalesce(
                    F.lit(1.0) / F.col("_first_rel").cast("double"), F.lit(0.0)
                ),
                9,
            ).alias("mrr"),
            F.round(
                F.col("_hits").cast("double") / F.col("_n_rel").cast("double"), 9
            ).alias("recall"),
        )
    )
