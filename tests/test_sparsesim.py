"""Sparse TF-IDF cosine pairs (operators/sparsesim) vs a pure-Python
replica, incl. df-pruning semantics."""

import math


def _ref(tf_rows, max_df, threshold):
    docs = sorted({d for d, _, _ in tf_rows})
    n = len(docs)
    df = {}
    for _d, t, _f in tf_rows:
        df[t] = df.get(t, 0) + 1
    kept = {t for t, c in df.items() if c <= max_df}
    w = {}
    for d, t, f in tf_rows:
        if t in kept:
            w[(d, t)] = f * math.log(n / df[t])
    nrm = {
        d: round(math.sqrt(sum(v * v for (dd, _t), v in w.items() if dd == d)), 9)
        for d in docs
    }
    out = {}
    for i, d1 in enumerate(docs):
        for d2 in docs[i + 1:]:
            dot = sum(
                w[(d1, t)] * w[(d2, t)]
                for t in kept
                if (d1, t) in w and (d2, t) in w
            )
            if dot == 0.0:
                continue
            c = round(dot / (nrm[d1] * nrm[d2]), 9)
            if c >= threshold:
                out[(d1, d2)] = c
    return out


def test_tfidf_cosine_pairs(spark):
    from nadry_spark.operators.sparsesim import tfidf_cosine_pairs

    tf_rows = [
        (1, "apple", 3), (1, "pie", 2), (1, "common", 1),
        (2, "apple", 2), (2, "pie", 3), (2, "common", 1),     # ~ doc 1
        (3, "rocket", 4), (3, "fuel", 1), (3, "common", 1),
        (4, "rocket", 1), (4, "fuel", 2), (4, "common", 1),   # ~ doc 3
        (5, "banana", 5),
    ]
    df = spark.createDataFrame(tf_rows, "doc_id long, term string, tf long")
    stats = {}
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            df, max_df=3, threshold=0.5, stats=stats
        ).collect()
    }
    want = _ref(tf_rows, 3, 0.5)
    assert got == want
    assert (1, 2) in got and (3, 4) in got and (1, 3) not in got
    # 'common' (df=4) was pruned: it must not create cross-topic pairs
    assert stats["pruned_terms"] == 1
