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
ONCE as a broadcast self-join (N^2 pairs of a small N) and collected
together with the relevances in ONE Spark action; the greedy k-step
argmax then runs driver-side over those page-sized arrays (r5 — the
r04 shape ran one Spark job per selected result, k sequential jobs
for work that fits in a page of memory).  All rounding in the driver
loop mirrors Spark's round() bit-exactly (_round9) so the selection
is identical to the per-step Spark formulation and the unrolled-CTE
oracle.  The corpus-scale work stays upstream in candidate
generation.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nadry_spark.operators.similarity import cosine


def _round9(x: float) -> float:
    """Python mirror of Spark's round(x, 9) on doubles: HALF_UP on the
    shortest round-trip decimal representation (java.math.BigDecimal
    .valueOf uses Double.toString; Python's repr is the same shortest
    repr), so driver-side greedy steps reproduce the JVM expression
    bit-for-bit."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))


def mmr_select(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """(order, <id_col>) — the first k MMR picks from `candidates`
    ((id, embedding, rel) rows; rel is the upstream relevance).

    CONTRACT: candidate ids must be unique. The driver-side greedy
    loop keys relevance/similarity by id, so a pool with repeated ids
    would collapse each to ONE arbitrary row (collect order) — unlike
    the earlier all-Spark formulation where duplicate rows scored
    independently. Callers with possibly-duplicated pools must dedupe
    deterministically upstream (e.g. keep max-rel per id) before
    calling; this function does not guess a policy for them."""
    spark = candidates.sparkSession
    cand = candidates.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        F.round(F.col(rel_col), 9).alias("rel9"),
    ).localCheckpoint()
    other = cand.select(F.col("cid").alias("oid"), F.col("cvec").alias("ovec"))
    # ONE action: relevances + the N^2 pairwise cosines (rel9 repeats
    # on each pair row — page-sized N makes the duplication free, and
    # it folds the two collects into one job)
    rows = (
        cand.crossJoin(F.broadcast(other))
        .where(F.col("cid") != F.col("oid"))
        .select(
            "cid",
            "rel9",
            "oid",
            F.round(cosine(F.col("cvec"), F.col("ovec")), 9).alias("sim9"),
        )
        .collect()
    )
    rel: dict = {}
    sim: dict = {}
    for r in rows:
        rel[r["cid"]] = r["rel9"]
        sim[(r["cid"], r["oid"])] = r["sim9"]
    if not rel:  # 0- or 1-candidate pool: no pair rows
        rel = {r["cid"]: r["rel9"] for r in cand.select("cid", "rel9").collect()}

    one_minus = 1.0 - lam
    selected: list = []
    remaining = set(rel)
    for _step in range(min(k, len(rel))):
        if not selected:
            scored = [(_round9(lam * rel[c]), c) for c in remaining]
        else:
            scored = [
                (
                    _round9(
                        lam * rel[c]
                        - one_minus * max(sim[(c, s)] for s in selected)
                    ),
                    c,
                )
                for c in remaining
            ]
        best = min(scored, key=lambda t: (-t[0], t[1]))[1]
        selected.append(best)
        remaining.discard(best)
    return spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(selected)], f"order long, {id_col} long"
    )
