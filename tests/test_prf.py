"""RM3 (operators/prf) vs a pure-Python reference replicating every
rounding/tie-break point of the two-pass expansion."""

import math


def _bm25_parts(tf_rows, tw, terms, k1=1.2, b=0.75):
    n = len(tw)
    avgdl = sum(tw.values()) / n
    df = {}
    for (d, t), f in tf_rows.items():
        if t in terms:
            df[t] = df.get(t, 0) + 1
    out = {}
    for (d, t), f in tf_rows.items():
        if t in terms:
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            tfn = f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * tw[d] / avgdl))
            out[(d, t)] = idf * tfn
    return out


def _ref_rm3(tf_rows, tw, q, fb_docs, fb_terms, lam=0.5):
    q = sorted(set(q))
    parts = _bm25_parts(tf_rows, tw, q)
    p1 = {}
    for (d, t), v in parts.items():
        p1[d] = p1.get(d, 0.0) + v
    p1 = {d: round(v, 9) for d, v in p1.items()}
    top = sorted(p1.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_docs]
    tot = sum(s for _, s in top)
    rm = {}
    for d, s in top:
        for (dd, t), f in tf_rows.items():
            if dd == d:
                rm[t] = rm.get(t, 0.0) + (s / tot) * (float(f) / float(tw[d]))
    rm = {t: round(v, 9) for t, v in rm.items()}
    exp = sorted(rm.items(), key=lambda kv: (-kv[1], kv[0]))[:fb_terms]
    z = sum(v for _, v in exp)
    weights = {}
    for t, v in exp:
        weights[t] = (1.0 - lam) * (v / z)
    for t in q:
        weights[t] = weights.get(t, 0.0) + lam * (1.0 / len(q))
    parts2 = _bm25_parts(tf_rows, tw, set(weights))
    p2 = {}
    for (d, t), v in parts2.items():
        p2[d] = p2.get(d, 0.0) + weights[t] * v
    p2 = {d: round(v, 9) for d, v in p2.items()}
    ranked = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))
    return {d: (i + 1, s) for i, (d, s) in enumerate(ranked)}


def test_rm3_matches_reference(spark):
    from nadry_spark.operators.prf import rm3_rerank

    # vocabulary-mismatch setup: docs about 'car' vs 'automobile';
    # feedback docs carry both, so expansion should pull automobile
    # docs into the 'car engine' query's results
    texts = {
        1: {"car": 3, "engine": 2, "automobile": 1},
        2: {"car": 1, "engine": 1},
        3: {"automobile": 4, "engine": 1},
        4: {"automobile": 2, "wheel": 2},
        5: {"banana": 5},
        6: {"car": 1, "wheel": 3},
    }
    tf_rows = {(d, t): f for d, ts in texts.items() for t, f in ts.items()}
    tw = {d: sum(ts.values()) for d, ts in texts.items()}
    q = ["car", "engine"]

    tf = spark.createDataFrame(
        [(d, t, f) for (d, t), f in tf_rows.items()],
        "doc_id long, term string, tf long",
    )
    twdf = spark.createDataFrame(list(tw.items()), "doc_id long, total_words long")
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in rm3_rerank(tf, twdf, q, fb_docs=3, fb_terms=3).collect()
    }
    want = _ref_rm3(tf_rows, tw, q, fb_docs=3, fb_terms=3)
    assert got == want
    # automobile-only docs must now be reachable (pure expansion hits)
    assert 3 in got and 4 in got
    # the off-topic doc must not appear
    assert 5 not in got
