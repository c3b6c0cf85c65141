"""OR-amplified multi-table sign-LSH (operators/similarity
.lsh_topk_multi): single-table degenerate case must equal lsh_topk,
the union must dominate any single table's recall, and the shipped
default (4 x 6-bit tables + multiprobe) must hold a recall floor on
the bench embeddings — the r04 lesson (PQ) that approximate defaults
need asserted floors, applied to the LSH path."""

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [
        (r["query_id"], r["rank"], r["neighbour_id"])
        for r in df.orderBy("query_id", "rank").collect()
    ]


def _recall_at_10(spark, emb, topk_df):
    from nadry_spark.operators.similarity import brute_force_topk

    q = emb.where(F.col("vec_id") < 5)
    gt = {}
    for r in brute_force_topk(emb, q, k=10).collect():
        gt.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    got = {}
    for r in topk_df.collect():
        got.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    return sum(len(got.get(k0, set()) & v) / len(v) for k0, v in gt.items()) / len(gt)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_single_table_degenerate_equals_lsh_topk(spark, emb):
    from nadry_spark.operators.similarity import lsh_topk, lsh_topk_multi

    q = emb.where(F.col("vec_id") < 7)
    dims = [0, 1, 2, 3, 4, 5]
    want = lsh_topk(emb, q, k=10, dims=dims, multiprobe=True)
    got = lsh_topk_multi(emb, q, k=10, tables=[dims], multiprobe=True)
    assert _rows(got) == _rows(want)


def test_union_dominates_single_table(spark, emb):
    """Every neighbour a single table finds at rank r is found by the
    union at rank <= r's cosine position — i.e. the union's result set
    per query is a superset-or-better: its recall vs brute force is
    >= each component table's."""
    from nadry_spark.operators.similarity import lsh_topk, lsh_topk_multi

    q = emb.where(F.col("vec_id") < 5)
    tables = [[0, 1, 2, 3, 4, 5], [6, 7, 8, 9, 10, 11]]
    multi = _recall_at_10(spark, emb, lsh_topk_multi(emb, q, k=10, tables=tables))
    for dims in tables:
        single = _recall_at_10(spark, emb, lsh_topk(emb, q, k=10, dims=dims))
        assert multi >= single


def test_shipped_default_recall_floor(spark):
    """Default 4 x 6-bit multiprobed tables on the BENCH embeddings
    (sf0.1, 2000 x 64 near-uniform vectors — the hard case for sign
    locality): recall@10 must hold the floor. Measured 0.66 at
    introduction (r5) vs 0.52 single-table; the floor (0.6) leaves
    headroom for data-neutral drift but fails on a real regression.
    (On near-uniform vectors IVF is the stronger structure — bench
    ivf recall 1.0 — so the LSH default is documented as measured,
    not pushed to an artificial 0.9 by scanning half the corpus.)"""
    from nadry_spark.operators.similarity import lsh_topk_multi

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5)
    rec = _recall_at_10(spark, emb, lsh_topk_multi(emb, q, k=10))
    assert rec >= 0.6, f"multi-table LSH default recall@10={rec}"
