"""Batch BM25 over a query table (operators/ranker.bm25_topk_batch):
a single-query batch must reproduce the serving-formula ranking
(_bm25_scored semantics), duplicate query terms must collapse, and
every query in the batch gets its own top-k."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def frames(spark):
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    return e.q_doc_term_tf(spark, sf), e.q_total_words(spark, sf)


def test_single_query_batch_matches_serving_formula(spark, frames):
    """One batch query with QUERY_TERMS must rank exactly like the
    bm25_rank driver row (same formula, grid, ties)."""
    import __spark_entry__ as e
    from nadry_spark.operators.ranker import bm25_topk_batch

    tf, tw = frames
    queries = spark.createDataFrame(
        [(1, t) for t in e.QUERY_TERMS], "query_id long, term string"
    )
    got = [
        (r["rank"], r["doc_id"])
        for r in bm25_topk_batch(tf, tw, queries, k=10).orderBy("rank").collect()
    ]
    want = [
        (r["rank"], r["doc_id"])
        for r in e.q_bm25_rank(spark, "/root/testdata/sf0.001")
        .orderBy("rank").limit(10).collect()
    ]
    assert got == want


def test_duplicate_terms_collapse(spark, frames):
    from nadry_spark.operators.ranker import bm25_topk_batch

    tf, tw = frames
    q1 = spark.createDataFrame(
        [(1, "join"), (1, "join"), (1, "hash")], "query_id long, term string"
    )
    q2 = spark.createDataFrame(
        [(1, "join"), (1, "hash")], "query_id long, term string"
    )
    a = [tuple(r) for r in bm25_topk_batch(tf, tw, q1, k=10).orderBy("rank").collect()]
    b = [tuple(r) for r in bm25_topk_batch(tf, tw, q2, k=10).orderBy("rank").collect()]
    assert a == b


def test_every_query_ranked_independently(spark, frames):
    from nadry_spark.operators.ranker import bm25_topk_batch

    tf, tw = frames
    queries = spark.createDataFrame(
        [(1, "join"), (2, "hash"), (3, "filter")], "query_id long, term string"
    )
    out = bm25_topk_batch(tf, tw, queries, k=5)
    per_q = {
        r["query_id"]: r["n"]
        for r in out.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_q) == {1, 2, 3}
    assert all(n <= 5 for n in per_q.values())
    # ranks are 1..n contiguous per query
    for qid in per_q:
        ranks = [
            r["rank"] for r in out.where(F.col("query_id") == qid).orderBy("rank").collect()
        ]
        assert ranks == list(range(1, len(ranks) + 1))
