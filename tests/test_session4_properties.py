"""Property-style invariants over the session-4 operators (hypothesis
where per-example cost is pure-Python-bounded, parametrized Spark
checks where a session round-trip is needed)."""

import math
import random

import pytest


def test_line_dedup_roundtrip_invariants(spark):
    """For ANY corpus: (1) min_docs > n_docs is the identity; (2) the
    kept lines are a subset of the originals with order preserved."""
    from nadry_spark.operators.linededup import line_dedup_text

    rng = random.Random(4)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = [
        (i, "\n".join(
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
            for _ in range(rng.randint(1, 5))
        ))
        for i in range(12)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    ident = {r["doc_id"]: r["text"] for r in line_dedup_text(df, min_docs=99).collect()}
    assert ident == dict(docs)

    out = {r["doc_id"]: r["text"] for r in line_dedup_text(df, min_docs=2).collect()}
    for d, text in docs:
        kept = out[d].split("\n") if out[d] else []
        orig = text.split("\n")
        # subset + order preserved (subsequence test)
        it = iter(orig)
        assert all(line in it for line in kept), (d, kept, orig)


def test_temperature_mix_rate_monotonicity(spark):
    """Raising T must not increase the head domain's keep share
    relative to the tail's (uniform-ward pull is monotone in T)."""
    from nadry_spark.operators.sampling import temperature_mix

    rows = [("head", f"h{i}") for i in range(400)] + [
        ("tail", f"t{i}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, "domain string, doc_key string")

    def shares(temp):
        kept = temperature_mix(df, "domain", "doc_key", temp=temp, target_rows=150)
        counts = {
            r["domain"]: r["count"]
            for r in kept.groupBy("domain").count().collect()
        }
        return counts.get("head", 0), counts.get("tail", 0)

    h1, t1 = shares(1.0)
    h4, t4 = shares(4.0)
    # T=1 is natural sampling; T=4 pulls toward uniform: the tail's
    # kept count must not shrink and the head's must not grow
    assert t4 >= t1 and h4 <= h1


def test_ranking_metrics_bounds(spark):
    """NDCG/MRR/recall always land in [0, 1], any run/qrels shape."""
    from nadry_spark.operators.evalmetrics import ranking_metrics

    rng = random.Random(11)
    runs, qrels = [], []
    for q in range(6):
        docs = rng.sample(range(30), 8)
        runs += [(q, f"d{d}", i + 1) for i, d in enumerate(docs)]
        qrels += [
            (q, f"d{d}", rng.randint(0, 3))
            for d in rng.sample(range(30), rng.randint(1, 10))
        ]
    r = spark.createDataFrame(runs, "query_id long, doc_id string, rank long")
    j = spark.createDataFrame(qrels, "query_id long, doc_id string, rel int")
    for row in ranking_metrics(r, j, k=8).collect():
        for m in ("ndcg", "mrr", "recall"):
            assert 0.0 <= row[m] <= 1.0, (row["query_id"], m, row[m])


def test_pq_codes_shape_any_m(spark):
    """For every legal m, codes = n*m rows and every code indexes a
    real codebook entry."""
    from nadry_spark.operators.pq import pq_build

    vecs = [(i, [float((i * 7 + j) % 5) for j in range(12)]) for i in range(10)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    for m in (1, 2, 3, 4, 6):
        codes, books = pq_build(df, m=m, ksub=4)
        rows = codes.collect()
        assert len(rows) == 10 * m
        valid = {s: {cid for cid, _ in books[s]} for s in range(m)}
        assert all(r["code"] in valid[r["sub"]] for r in rows)
