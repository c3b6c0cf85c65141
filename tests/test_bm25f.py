"""BM25F (operators/bm25f) vs a pure-Python reference of the simple
weighted-field extension, including zero-length fields and anchor-only
matches."""

import math


def _ref_bm25f(field_tf, field_len, fields, q, k1=1.2):
    docs = sorted({d for d, _ in field_len})
    n = len(docs)
    avglen = {}
    for f in {f for _, f in field_len}:
        lens = [field_len[(d, ff)] for d, ff in field_len if ff == f]
        avglen[f] = float(sum(lens)) / float(len(lens))
    df = {}
    for (d, f, t), tf in field_tf.items():
        if t in q and tf > 0:
            df.setdefault(t, set()).add(d)
    out = {}
    for d in docs:
        s = 0.0
        for t in sorted(set(q)):
            if t not in df:
                continue
            wtf = 0.0
            for f, (w, b) in fields.items():
                tf = field_tf.get((d, f, t), 0)
                if tf:
                    den = 1.0 - b + b * (field_len[(d, f)] / avglen[f])
                    wtf += w * (tf / den)
            if wtf == 0.0:
                continue
            idf = math.log(1.0 + (n - len(df[t]) + 0.5) / (len(df[t]) + 0.5))
            s += idf * (wtf / (k1 + wtf))
        if s:
            out[d] = round(s, 9)
    return out


def test_bm25f_matches_reference(spark):
    from nadry_spark.operators.bm25f import bm25f_score

    fields = {"title": (2.5, 0.6), "body": (1.0, 0.75), "anchor": (1.5, 0.0)}
    field_tf = {
        (1, "title", "spark"): 1, (1, "body", "spark"): 4, (1, "body", "index"): 1,
        (2, "body", "spark"): 2, (2, "body", "query"): 3,
        (3, "anchor", "spark"): 5,          # anchor-only match, own text thin
        (4, "body", "query"): 1,
    }
    field_len = {
        (1, "title"): 3, (1, "body"): 10, (1, "anchor"): 0,
        (2, "title"): 0, (2, "body"): 6, (2, "anchor"): 0,
        (3, "title"): 2, (3, "body"): 1, (3, "anchor"): 5,
        (4, "title"): 1, (4, "body"): 4, (4, "anchor"): 2,
    }
    q = ["spark", "query", "missing"]

    tf_df = spark.createDataFrame(
        [(d, f, t, c) for (d, f, t), c in field_tf.items()],
        "doc_id long, field string, term string, tf long",
    )
    len_df = spark.createDataFrame(
        [(d, f, c) for (d, f), c in field_len.items()],
        "doc_id long, field string, len long",
    )
    fields_df = spark.createDataFrame(
        [(f, w, b) for f, (w, b) in fields.items()], "field string, w double, b double"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_score(tf_df, len_df, fields_df, q).collect()
    }
    want = _ref_bm25f(field_tf, field_len, fields, q)
    assert got == want
    # the anchor-only doc must rank: external text covers thin pages
    assert 3 in got and got[3] > 0.0
    # title+body doc beats body-only doc on 'spark' despite lower body tf?
    # (not asserted directionally — weights decide; reference equality is
    # the contract)
