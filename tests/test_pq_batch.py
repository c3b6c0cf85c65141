"""Batch PQ paths (r5): the wide-codes ADC expression mode must be
row-identical to the long-form serving path, and IVF-PQ must equal
"flat ADC restricted to the probed lists" computed by an independent
composition.

Why the split exists: pq_topk broadcasts a queries-sized distance
table and explodes every candidate into m join rows before a regroup —
right for a handful of serving queries, wrong when the query side is
itself a corpus. pq_topk_batch keeps queries a DataFrame (per-row
distance-table array, per-pair lookup expression); ivfpq_topk_batch
adds the coarse-quantizer pruning (the FAISS IVFADC deployment
shape). Equality here is the contract that lets callers switch.
"""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["neighbour_id"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_pq_codes_wide_shape(spark, emb):
    from nadry_spark.operators.pq import pq_build, pq_codes_wide

    codes, books = pq_build(emb, m=4, ksub=8)
    wide = pq_codes_wide(codes)
    assert wide.count() == emb.count()
    r = wide.orderBy("vec_id").first()
    assert len(r["codes"]) == 4
    # wide row must be the sub-ordered long-form codes
    long_rows = sorted(
        codes.where(F.col("vec_id") == r["vec_id"]).collect(),
        key=lambda x: x["sub"],
    )
    assert [x["code"] for x in long_rows] == list(r["codes"])


def test_pq_batch_identical_to_serving(spark, emb):
    from nadry_spark.operators.pq import pq_build, pq_topk, pq_topk_batch

    codes, books = pq_build(emb, m=4, ksub=8)
    q = emb.where(F.col("vec_id") < 7)
    serving = pq_topk(codes, books, q, k=10)
    batch = pq_topk_batch(codes, books, q, k=10)
    assert _rows(serving) == _rows(batch)


def test_pq_batch_whole_corpus_queries(spark, emb):
    """Every vector a query — the linkage shape. Parity spot-checked
    on a sample crossing many codes."""
    from nadry_spark.operators.pq import pq_build, pq_topk, pq_topk_batch

    codes, books = pq_build(emb, m=4, ksub=8)
    batch = pq_topk_batch(codes, books, emb, k=5)
    assert batch.select("query_id").distinct().count() == emb.count()
    sample_ids = [r["vec_id"] for r in emb.orderBy("vec_id").limit(40).collect()][::7]
    q = emb.where(F.col("vec_id").isin(sample_ids))
    serving = pq_topk(codes, books, q, k=5)
    got = _rows(batch.where(F.col("query_id").isin(sample_ids)))
    assert got == _rows(serving)


def test_ivfpq_equals_probe_restricted_flat_adc(spark, emb):
    """ivfpq_topk_batch == flat batch ADC filtered to (query, probed
    list member) pairs, built here by an independent composition:
    probes from the centroid expression, candidates from the coarse
    assignment, distances from the serving-path pq_topk at k=corpus."""
    from nadry_spark.operators.pq import pq_build, pq_topk, ivfpq_topk_batch
    from nadry_spark.operators.similarity import ivf_build, _centroid_probe_expr

    assigned, cents = ivf_build(emb, n_centroids=8, iters=0)
    codes, books = pq_build(emb, m=4, ksub=8)
    q = emb.where(F.col("vec_id") < 7)
    got = ivfpq_topk_batch(assigned, cents, codes, books, q, k=10, nprobe=3)

    n = emb.count()
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.explode(_centroid_probe_expr("embedding", cents, 3)).alias("p"),
    ).select("query_id", F.col("p.cid").alias("cid"))
    cand = probes.join(assigned.select("vec_id", "cid"), "cid").select(
        "query_id", F.col("vec_id").alias("neighbour_id")
    )
    # full ADC ranking from the SERVING path, re-ranked inside candidates
    full = pq_topk(codes, books, q, k=n).withColumnRenamed("rank", "flat_rank")
    w = Window.partitionBy("query_id").orderBy(F.asc("flat_rank"))
    want = (
        full.join(cand, ["query_id", "neighbour_id"])
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
        .select("query_id", "rank", "neighbour_id")
    )
    assert _rows(got) == _rows(want)


def test_pq_rerank_batch_identical(spark, emb):
    """pq_rerank_topk(batch=True) generates its pool with
    pq_topk_batch — rows must match the serving-pool path exactly."""
    from nadry_spark.operators.pq import pq_build, pq_rerank_topk

    codes, books = pq_build(emb, m=4, ksub=8)
    q = emb.where(F.col("vec_id") < 7)
    serving = pq_rerank_topk(codes, books, q, emb, k=10, pool=30)
    batch = pq_rerank_topk(codes, books, q, emb, k=10, pool=30, batch=True)
    assert _rows(serving) == _rows(batch)


def test_ivfpq_prunes_candidates(spark, emb):
    """The point of the coarse quantizer: fewer scored pairs than flat.
    With nprobe=2 of 8 lists, each query scores roughly a quarter of
    the corpus — assert the probed candidate count is well under flat."""
    from nadry_spark.operators.pq import pq_build, pq_codes_wide
    from nadry_spark.operators.similarity import ivf_build, _centroid_probe_expr

    assigned, cents = ivf_build(emb, n_centroids=8, iters=0)
    q = emb.where(F.col("vec_id") < 7)
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.explode(_centroid_probe_expr("embedding", cents, 2)).alias("p"),
    ).select("query_id", F.col("p.cid").alias("cid"))
    n_cand = probes.join(assigned.select("vec_id", "cid"), "cid").count()
    n_flat = q.count() * emb.count()
    assert n_cand < 0.7 * n_flat


def test_flat_adc_guard_warns_on_quadratic_stream(spark, emb, caplog):
    """pq_topk_batch with stats must report the corpus x queries pair
    stream and warn past the threshold, pointing at ivfpq_topk_batch
    (VERDICT r05 #5: the quadratic shape must never be silent)."""
    import logging

    from nadry_spark.operators.pq import pq_build, pq_topk_batch

    codes, books = pq_build(emb, m=4, ksub=8)
    stats: dict = {}
    with caplog.at_level(logging.WARNING, logger="nadry_spark.pq"):
        pq_topk_batch(codes, books, emb, k=3, stats=stats, warn_pairs=10).collect()
    assert stats["adc_pairs"] == stats["corpus_rows"] * stats["query_rows"]
    assert stats["corpus_rows"] == emb.count()
    assert any("ivfpq_topk_batch" in r.message for r in caplog.records)
