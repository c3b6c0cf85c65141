"""More-Like-This (operators/mlt) vs an independent pure-Python
implementation of the Lucene MoreLikeThis core: tf*idf interesting-term
selection, broadcast disjunctive rescoring, deterministic tie-breaks."""

import math
from collections import Counter


def _ref_mlt(docs: dict[int, list[str]], src: int, max_terms: int, k: int):
    tf = {d: Counter(ws) for d, ws in docs.items()}
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    n = float(len(docs))
    idf = {t: math.log(n / (df[t] + 1)) + 1 for t in df}
    interesting = sorted(
        ((round(c * idf[t], 9), t) for t, c in tf[src].items()),
        key=lambda x: (-x[0], x[1]),
    )[:max_terms]
    terms = {t for _, t in interesting}
    scored = []
    for d, c in tf.items():
        if d == src:
            continue
        s = sum(c[t] * idf[t] for t in terms if t in c)
        if s:
            scored.append((d, round(s, 9)))
    scored.sort(key=lambda x: (-x[1], x[0]))
    return scored[:k]


def test_more_like_this_matches_reference(spark):
    from nadry_spark.operators.mlt import more_like_this

    docs = {
        0: "apple banana apple cherry".split(),
        1: "apple banana date apple".split(),
        2: "cherry cherry eggfruit banana".split(),
        3: "unrelated words entirely".split(),
        4: "apple cherry banana".split(),
    }
    rows = [(d, w) for d, ws in docs.items() for w in ws]
    terms = spark.createDataFrame(rows, "doc_id long, term string")
    got = [
        (r["doc_id"], r["mlt_score"])
        for r in more_like_this(terms, 0, max_query_terms=2, k=3).collect()
    ]
    assert got == _ref_mlt(docs, 0, 2, 3)
    # excluding the source and k-bounding
    assert all(d != 0 for d, _ in got) and len(got) <= 3


def test_more_like_this_tie_breaks(spark):
    """Equal-score docs order by doc_id; equal-score terms by term —
    the determinism the oracle mirror relies on."""
    from nadry_spark.operators.mlt import more_like_this

    docs = {
        0: ["zz", "yy"],
        1: ["zz", "yy"],  # identical to 2 -> identical score
        2: ["zz", "yy"],
        3: ["other"],
    }
    rows = [(d, w) for d, ws in docs.items() for w in ws]
    terms = spark.createDataFrame(rows, "doc_id long, term string")
    got = [r["doc_id"] for r in more_like_this(terms, 0, 2, 10).collect()]
    assert got == [1, 2]
