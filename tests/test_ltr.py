"""LTR feature assembly (operators/ltr) vs a pure-Python reference:
BM25 feature must equal the engine's bm25 convention bit-for-bit,
missing extra signals must default to 0 (not drop the candidate)."""

import math


def _ref_features(tf_rows, tw, q, extras, k1=1.2, b=0.75):
    n = len(tw)
    avgdl = sum(tw.values()) / n
    df = {}
    for d, t, f in tf_rows:
        if t in q:
            df[t] = df.get(t, 0) + 1
    out = {}
    for d in sorted(tw):
        matched = [(t, f) for dd, t, f in tf_rows if dd == d and t in q]
        if not matched:
            continue
        s = 0.0
        for t, f in matched:
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (f * (k1 + 1.0) / (f + k1 * (1.0 - b + b * tw[d] / avgdl)))
        row = {
            "f_bm25": round(s, 9),
            "f_tf_sum": sum(f for _, f in matched),
            "f_matched_terms": len(matched),
            "f_doclen": tw[d],
        }
        for name, vals in extras.items():
            row[name] = vals.get(d, 0)
        out[d] = row
    return out


def test_ltr_features_matches_reference(spark):
    from nadry_spark.operators.ltr import ltr_features

    tf_rows = [
        (1, "spark", 3), (1, "query", 1), (1, "noise", 9),
        (2, "spark", 1),
        (3, "noise", 5),              # no query-term match: excluded
        (4, "query", 2),
    ]
    tw = {1: 20, 2: 5, 3: 8, 4: 12}
    extras = {"f_anchor_tf": {1: 7, 3: 2}, "f_indegree": {2: 4}}
    q = ["spark", "query"]

    tf = spark.createDataFrame(tf_rows, "doc_id long, term string, tf long")
    twdf = spark.createDataFrame(
        list(tw.items()), "doc_id long, total_words long"
    )
    ex = {
        name: spark.createDataFrame(
            [(d, v) for d, v in vals.items()], f"doc_id long, {name} long"
        )
        for name, vals in extras.items()
    }
    got = {r["doc_id"]: r.asDict() for r in ltr_features(tf, twdf, q, ex).collect()}
    want = _ref_features(tf_rows, tw, q, extras)
    assert set(got) == set(want) == {1, 2, 4}
    for d, row in want.items():
        grow = got[d]
        for k, v in row.items():
            assert grow[k] == v, (d, k, grow[k], v)
    # doc 2 has no anchor signal: feature is 0, row not dropped
    assert got[2]["f_anchor_tf"] == 0 and got[2]["f_indegree"] == 4
