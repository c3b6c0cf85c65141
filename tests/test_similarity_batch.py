"""Batch-ANN paths (r5): the DataFrame-native IVF query-table mode
must be row-identical to the serving path, and the recall-targeted
PQ re-rank must meet its floor on the bench embeddings.

The serving/batch split exists because ivf_topk collects the query
set for driver-side probe selection (right for a handful of serving
queries, wrong for corpus-x-corpus linkage); ivf_topk_batch keeps
queries distributed end-to-end. Equality here is the contract that
lets callers switch freely.
"""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["neighbour_id"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_ivf_batch_identical_to_serving(spark, emb):
    from nadry_spark.operators.similarity import ivf_build, ivf_topk, ivf_topk_batch

    assigned, cents = ivf_build(emb, n_centroids=8, iters=0)
    q = emb.where(F.col("vec_id") < 7)
    serving = ivf_topk(assigned, cents, q, k=10, nprobe=3)
    batch = ivf_topk_batch(assigned, cents, q, k=10, nprobe=3)
    assert _rows(serving) == _rows(batch)


def test_ivf_batch_whole_corpus_queries(spark, emb):
    """The linkage shape the serving path can't do: every vector is a
    query. Spot-check parity on a sample (full parity would just re-run
    the serving collect for all ids — the sample keeps the test fast
    while still crossing many buckets)."""
    from nadry_spark.operators.similarity import ivf_build, ivf_topk, ivf_topk_batch

    assigned, cents = ivf_build(emb, n_centroids=8, iters=1)
    batch = ivf_topk_batch(assigned, cents, emb, k=5, nprobe=2)
    n_q = batch.select("query_id").distinct().count()
    assert n_q == emb.count()  # every vector got neighbours
    sample_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(40).collect()][::7]
    q = emb.where(F.col("vec_id").isin(sample_ids))
    serving = ivf_topk(assigned, cents, q, k=5, nprobe=2)
    got = _rows(batch.where(F.col("query_id").isin(sample_ids)))
    assert got == _rows(serving)


def test_pq_rerank_auto_targets_recall(spark, emb):
    from nadry_spark.operators.pq import pq_build, pq_rerank_auto, pq_rerank_topk
    from nadry_spark.operators.similarity import brute_force_topk

    codes, books = pq_build(emb, m=8, ksub=16)
    q = emb.where(F.col("vec_id") < 5)
    stats: dict = {}
    got = pq_rerank_auto(
        codes, books, q, emb, k=10, target_recall=0.9,
        sample_queries=5, start_pool=20, max_frac=0.5, stats=stats,
    )
    # stats contract: chosen pool + estimate + the evaluated curve
    assert stats["pool"] >= 20
    assert stats["pool_curve"][0][0] == 20
    assert all(p2 == p1 * 2 for (p1, _), (p2, _) in zip(stats["pool_curve"], stats["pool_curve"][1:]))
    # result is exactly the fixed-pool rerank at the chosen pool
    want = pq_rerank_topk(codes, books, q, emb, k=10, pool=stats["pool"])
    assert _rows(got) == _rows(want)
    # the estimate is honest: measure true recall of the output
    gt = {}
    for r in brute_force_topk(emb, q, k=10).collect():
        gt.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    out = {}
    for r in got.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    true_rec = sum(len(out[k0] & v) / len(v) for k0, v in gt.items()) / len(gt)
    if stats["target_met"]:
        # estimate computed on the same 5 queries -> must agree exactly
        assert true_rec >= 0.9


def test_pq_shipped_operating_point_floor(spark):
    """The r04 finding: defaults that silently under-recall are not
    done. The shipped constants (PQ_M=8, PQ_KSUB=16, pool=400) must
    hold recall@10 >= 0.9 against brute force on the BENCH embeddings
    (sf0.1, 2000x64 near-uniform vectors — the hard case)."""
    import __spark_entry__ as entry

    from nadry_spark.operators.pq import pq_build, pq_rerank_topk
    from nadry_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    codes, books = pq_build(emb, m=entry.PQ_M, ksub=entry.PQ_KSUB)
    got = {}
    for r in pq_rerank_topk(
        codes, books, q, emb, k=10, pool=entry.PQ_RERANK_POOL
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    gt = {}
    for r in brute_force_topk(emb, q, k=10).collect():
        gt.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    recall = sum(len(got[k0] & v) / len(v) for k0, v in gt.items()) / len(gt)
    assert recall >= 0.9, f"shipped PQ operating point recall@10={recall}"
