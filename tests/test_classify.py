"""Naive Bayes (operators/classify) vs a pure-Python reference of the
Laplace-smoothed multinomial model, including unseen (label, term)
smoothing and the rounded-score/label-asc argmax rule."""

import math


def _ref_nb(tf_rows, labels, alpha=1.0):
    """tf_rows: [(doc_id, term, tf)]; labels: {doc_id: label}."""
    vocab = sorted({t for _, t, _ in tf_rows})
    lset = sorted(set(labels.values()))
    counts = {}
    totals = {c: 0 for c in lset}
    for d, t, f in tf_rows:
        c = labels[d]
        counts[(c, t)] = counts.get((c, t), 0) + f
        totals[c] += f
    n = len(labels)
    n_c = {c: sum(1 for v in labels.values() if v == c) for c in lset}
    out = {}
    for d in sorted({r[0] for r in tf_rows}):
        best = None
        for c in lset:
            s = math.log(float(n_c[c]) / float(n))
            for dd, t, f in tf_rows:
                if dd != d:
                    continue
                s += float(f) * math.log(
                    (counts.get((c, t), 0) + alpha) / (totals[c] + alpha * len(vocab))
                )
            s = round(s, 9)
            if best is None or s > best[1] or (s == best[1] and c < best[0]):
                best = (c, s)
        out[d] = best
    return out


def test_nb_classify_matches_reference(spark):
    from nadry_spark.operators.classify import nb_classify

    tf_rows = [
        (1, "spark", 3), (1, "index", 2),
        (2, "spark", 1), (2, "query", 4),
        (3, "cat", 5), (3, "dog", 1),
        (4, "dog", 3), (4, "query", 1),   # mixed-evidence doc
        (5, "cat", 2), (5, "spark", 2),   # near-tie candidate
    ]
    labels = {1: "tech", 2: "tech", 3: "pets", 4: "pets", 5: "tech"}
    tf = spark.createDataFrame(tf_rows, "doc_id long, term string, tf long")
    lab = spark.createDataFrame(
        list(labels.items()), "doc_id long, label string"
    )
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in nb_classify(tf, lab).collect()
    }
    assert got == _ref_nb(tf_rows, labels)
    # training docs with clear vocabulary recover their own label
    assert got[1][0] == "tech" and got[3][0] == "pets"


def test_nb_score_full_surface(spark):
    from nadry_spark.operators.classify import nb_score, nb_train

    tf = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "doc_id long, term string, tf long"
    )
    lab = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, label string")
    scored = nb_score(tf, nb_train(tf, lab)).collect()
    # every (doc, label) pair present, even for terms unseen under a label
    assert {(r["doc_id"], r["label"]) for r in scored} == {
        (1, "x"), (1, "y"), (2, "x"), (2, "y"),
    }
    assert all(r["score"] < 0.0 for r in scored)
