"""MMR (operators/diversify) vs a pure-Python reference; the pick
sequence must diverge from pure-relevance order when near-dups lead."""

import math


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def _ref_mmr(cands, k, lam=0.7):
    rel9 = {i: round(r, 9) for i, (_, r) in cands.items()}
    sim9 = {
        (i, j): round(_cos(cands[i][0], cands[j][0]), 9)
        for i in cands
        for j in cands
        if i != j
    }
    sel = []
    for _ in range(min(k, len(cands))):
        best = None
        for i in sorted(cands):
            if i in sel:
                continue
            if not sel:
                m = round(lam * rel9[i], 9)
            else:
                m = round(
                    lam * rel9[i] - (1.0 - lam) * max(sim9[(i, j)] for j in sel), 9
                )
            if best is None or m > best[1]:
                best = (i, m)
        sel.append(best[0])
    return sel


def test_mmr_matches_reference_and_diversifies(spark):
    from nadry_spark.operators.diversify import mmr_select

    # ids 1,2 nearly identical & most relevant; 3 orthogonal topic;
    # 4 mid-relevance near 3
    cands = {
        1: ([1.0, 0.0, 0.05], 0.99),
        2: ([1.0, 0.01, 0.0], 0.98),
        3: ([0.0, 1.0, 0.0], 0.80),
        4: ([0.05, 1.0, 0.1], 0.70),
        5: ([0.5, 0.5, 0.5], 0.60),
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], float(r)) for i, (v, r) in cands.items()],
        "vec_id long, embedding array<double>, rel double",
    )
    got = [
        r["vec_id"]
        for r in mmr_select(df, k=4, lam=0.7).orderBy("order").collect()
    ]
    want = _ref_mmr(cands, 4)
    assert got == want
    # diversification: the orthogonal doc 3 must beat near-dup 2 for
    # slot 2 even though 2 has higher relevance
    assert got[0] == 1 and got[1] == 3
    # k capped at candidate count
    assert mmr_select(df.limit(2), k=10).count() == 2
