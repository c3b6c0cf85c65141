"""Product quantization (operators/pq) vs a pure-Python ADC replica;
shape and self-exclusion checks."""


def _ref_pq(vecs, m, ksub, queries, k):
    ids = sorted(vecs)
    d = len(vecs[ids[0]])
    d_sub = d // m
    seeds = ids[:ksub]
    books = []
    for s in range(m):
        books.append(
            [(i, vecs[seeds[i]][s * d_sub:(s + 1) * d_sub]) for i in range(len(seeds))]
        )
    codes = {}
    for v in ids:
        codes[v] = []
        for s in range(m):
            sub = vecs[v][s * d_sub:(s + 1) * d_sub]
            best = min(
                (round(sum((a - b) ** 2 for a, b in zip(sub, c)), 9), cid)
                for cid, c in books[s]
            )
            codes[v].append(best[1])
    out = {}
    for q in queries:
        dt = []
        for s in range(m):
            qsub = vecs[q][s * d_sub:(s + 1) * d_sub]
            dt.append(
                {cid: round(sum((a - b) ** 2 for a, b in zip(qsub, c)), 9)
                 for cid, c in books[s]}
            )
        dists = {
            v: round(sum(dt[s][codes[v][s]] for s in range(m)), 9)
            for v in ids
            if v != q
        }
        ranked = sorted(dists.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        out[q] = [v for v, _ in ranked]
    return out


def test_pq_matches_reference(spark):
    from nadry_spark.operators.pq import pq_build, pq_topk

    # three loose clusters in 8-dim space
    base = {
        0: [0.0] * 8, 1: [0.1] * 8, 2: [0.05] * 8,
        3: [5.0] * 8, 4: [5.1] * 8,
        5: [0.0, 5.0] * 4, 6: [0.05, 5.1] * 4,
        7: [2.5] * 8,
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in base.items()],
        "vec_id long, embedding array<double>",
    )
    codes, books = pq_build(df, m=2, ksub=4)
    assert codes.count() == len(base) * 2          # m codes per vector
    assert len(books) == 2 and len(books[0]) == 4

    got_df = pq_topk(codes, books, df.where("vec_id IN (0, 3)"), k=3)
    got = {}
    for r in got_df.orderBy("query_id", "rank").collect():
        got.setdefault(r["query_id"], []).append(r["neighbour_id"])
    want = _ref_pq(base, 2, 4, [0, 3], 3)
    assert got == want
    # cluster sanity: 0's nearest by ADC are its cluster-mates
    assert set(got[0][:2]) <= {1, 2, 5, 6}  # codes collapse to near-0 codewords
    assert 3 not in got[0]


def test_pq_dim_validation(spark):
    import pytest

    from nadry_spark.operators.pq import pq_build

    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        pq_build(df, m=2)


def test_pq_rerank_recovers_exact_order(spark):
    """ADC pool + exact cosine re-rank must equal brute force when the
    pool covers the corpus."""
    import random

    from nadry_spark.operators.pq import pq_build, pq_rerank_topk
    from nadry_spark.operators.similarity import brute_force_topk

    rng = random.Random(7)
    vecs = {
        i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(24)
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    codes, books = pq_build(df, m=2, ksub=4)
    q = df.where("vec_id < 2")
    got = [
        (r["query_id"], r["rank"], r["neighbour_id"])
        for r in pq_rerank_topk(codes, books, q, df, k=5, pool=23)
        .orderBy("query_id", "rank").collect()
    ]
    want = [
        (r["query_id"], r["rank"], r["neighbour_id"])
        for r in brute_force_topk(df, q, k=5).orderBy("query_id", "rank").collect()
    ]
    assert got == want
