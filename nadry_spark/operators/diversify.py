"""Maximal Marginal Relevance result diversification (Carbonell &
Goldstein, SIGIR'98) — greedy re-ranking that trades relevance against
redundancy so a result page (or a few-shot retrieval context) doesn't
show five near-copies of the best hit:

    next = argmax_{d not selected}  lam * rel(d)
                                    - (1-lam) * max_{s selected} sim(d, s)

Complements site-collapse (operators/boolquery collapse): collapse
diversifies by a categorical key, MMR by CONTENT similarity (embedding
cosine), catching near-duplicates that live on unrelated hosts.

Determinism contract (the cross-engine oracle relies on it): rel and
every pairwise cosine are quantized to the 1e-9 grid before use, the
MMR objective is re-rounded at 1e-9, ties break on id asc, and the
iteration count is fixed — so the k selection steps unroll as chained
CTEs in SQL.

Scale shape: MMR is inherently sequential in k, but k is a result
page (5-20), and the candidate pool is the top-N of an upstream
ranker (tens to hundreds).  Pairwise candidate cosines are computed
ONCE as a broadcast self-join (N^2 pairs of a small N); each greedy
step is then a driver-sequenced argmax over N rows — the same
accepted driver-loop pattern as operators/bpe merge learning, with
the corpus-scale work all upstream in candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nadry_spark.operators.similarity import cosine


def mmr_select(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """(order, <id_col>) — the first k MMR picks from `candidates`
    ((id, embedding, rel) rows; rel is the upstream relevance)."""
    spark = candidates.sparkSession
    cand = (
        candidates.select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            F.round(F.col(rel_col), 9).alias("rel9"),
        )
        .localCheckpoint()
    )
    other = cand.select(F.col("cid").alias("oid"), F.col("cvec").alias("ovec"))
    pairs = (
        cand.crossJoin(F.broadcast(other))
        .where(F.col("cid") != F.col("oid"))
        .select(
            "cid", "oid", F.round(cosine(F.col("cvec"), F.col("ovec")), 9).alias("sim9")
        )
        .localCheckpoint()
    )

    one_minus = F.lit(1.0) - F.lit(lam)
    selected: list = []
    k = min(k, cand.count())
    for step in range(k):
        if not selected:
            scored = cand.select(
                "cid", F.round(F.lit(lam) * F.col("rel9"), 9).alias("mmr")
            )
        else:
            maxsim = (
                pairs.where(F.col("oid").isin(selected))
                .groupBy("cid")
                .agg(F.max("sim9").alias("maxsim"))
            )
            scored = (
                cand.join(maxsim, "cid")
                .where(~F.col("cid").isin(selected))
                .select(
                    "cid",
                    F.round(
                        F.lit(lam) * F.col("rel9") - one_minus * F.col("maxsim"), 9
                    ).alias("mmr"),
                )
            )
        best = scored.orderBy(F.desc("mmr"), F.asc("cid")).limit(1).collect()[0]
        selected.append(best["cid"])
    return spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(selected)], f"order long, {id_col} long"
    )
