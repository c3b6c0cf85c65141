"""PMI collocations (operators/collocations) vs a pure-Python
reference: textual adjacency, joint-filter pair formation, min-count
floor, deterministic tie-breaks."""

import math
from collections import Counter


def _ref_pmi(texts, stop, min_count, k):
    def ok(w):
        return 2 <= len(w) <= 50 and w not in stop

    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.lower().split()
        uni.update(w for w in ws if ok(w))
        big.update((a, b) for a, b in zip(ws, ws[1:]) if ok(a) and ok(b))
    t_uni = float(sum(uni.values()))
    t_big = float(sum(big.values()))
    out = []
    for (a, b), c in big.items():
        if c < min_count:
            continue
        pmi = math.log((c / t_big) / ((uni[a] / t_uni) * (uni[b] / t_uni)))
        out.append((a, b, c, round(pmi, 9)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:k]


def test_pmi_bigrams_matches_reference(spark):
    from nadry_spark.operators.collocations import pmi_bigrams

    stop = ["the", "of"]
    texts = (
        ["hong kong trade news today"] * 6
        + ["trade winds move today"] * 4
        + ["news of the markets today"] * 4
        + ["markets move fast", "fast winds of news"] * 3
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["w1"], r["w2"], r["n_pair"], r["pmi"])
        for r in pmi_bigrams(docs, stopwords=stop, min_count=3, k=10).collect()
    ]
    want = _ref_pmi(texts, set(stop), 3, 10)
    assert got == want
    # 'hong kong' (always adjacent, members rare elsewhere) must beat
    # 'trade news' (members common in other contexts)
    names = [(a, b) for a, b, _, _ in got]
    assert names.index(("hong", "kong")) < names.index(("trade", "news"))
    # pairs straddling a stopword never form ('news of the trade' makes
    # no (news, trade) pair) and sub-floor pairs are dropped
    assert all(n >= 3 for _, _, n, _ in got)
    assert ("news", "trade") not in names
