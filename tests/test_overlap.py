"""Corpus-overlap audit (operators/sketches.corpus_overlap): exact
counts vs hand math, sketch estimates vs a pure-Python KMV replica."""

import hashlib


def _frac(v):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:13], 16) / float(16 ** 13)


def _kmv_est(values, k):
    hs = sorted({_frac(v) for v in values})[:k]
    if len(hs) < k:
        return float(len(hs))
    return (k - 1) / hs[-1]


def test_corpus_overlap(spark):
    from nadry_spark.operators.sketches import corpus_overlap

    a_keys = [f"k{i}" for i in range(300)]
    b_keys = [f"k{i}" for i in range(200, 500)]          # overlap 100
    a = spark.createDataFrame([(x,) for x in a_keys], "key string")
    b = spark.createDataFrame([(x, ) for x in b_keys * 2], "key string")  # dups in B
    row = corpus_overlap(a, b, "key", k=64).collect()[0]

    assert (row["n_a"], row["n_b"], row["n_inter"], row["n_union"]) == (
        300, 300, 100, 500,
    )
    assert row["jaccard"] == round(100 / 500, 9)
    assert row["containment_b_in_a"] == round(100 / 300, 9)

    assert row["est_a"] == round(_kmv_est(a_keys, 64), 6)
    assert row["est_b"] == round(_kmv_est(b_keys, 64), 6)
    est_u = _kmv_est(set(a_keys) | set(b_keys), 64)
    assert row["est_union"] == round(est_u, 6)
    est_i = max(0.0, _kmv_est(a_keys, 64) + _kmv_est(b_keys, 64) - est_u)
    assert row["est_inter"] == round(est_i, 6)
    # sketch sanity: estimates within 30% of truth at k=64
    assert abs(row["est_union"] - 500) / 500 < 0.3
