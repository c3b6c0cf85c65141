"""NDCG/MRR/recall (operators/evalmetrics) vs hand math."""

import math


def test_ranking_metrics(spark):
    from nadry_spark.operators.evalmetrics import ranking_metrics

    runs = spark.createDataFrame(
        [
            # q1: rel pattern [2, 0, 1] at ranks 1..3
            (1, "a", 1), (1, "b", 2), (1, "c", 3),
            # q2: first relevant at rank 3
            (2, "x", 1), (2, "y", 2), (2, "z", 3),
            # q3: nothing relevant retrieved
            (3, "p", 1),
            # q4: judged but no relevant docs at all -> excluded
            (4, "m", 1),
        ],
        "query_id long, doc_id string, rank long",
    )
    qrels = spark.createDataFrame(
        [
            (1, "a", 2), (1, "c", 1), (1, "d", 3),   # 'd' missed by the run
            (2, "z", 1),
            (3, "q", 2),
            (4, "m", 0),
        ],
        "query_id long, doc_id string, rel int",
    )
    got = {r["query_id"]: r.asDict() for r in ranking_metrics(runs, qrels, k=3).collect()}

    def dcg(rels):
        return sum((2 ** r - 1) / math.log2(i + 2) for i, r in enumerate(rels))

    q1 = got[1]
    assert q1["ndcg"] == round(dcg([2, 0, 1]) / dcg([3, 2, 1]), 9)
    assert q1["mrr"] == 1.0
    assert q1["recall"] == round(2 / 3, 9)

    q2 = got[2]
    assert q2["ndcg"] == round(dcg([0, 0, 1]) / dcg([1]), 9)
    assert q2["mrr"] == round(1 / 3, 9)
    assert q2["recall"] == 1.0

    q3 = got[3]
    assert q3 == {"query_id": 3, "ndcg": 0.0, "mrr": 0.0, "recall": 0.0}

    assert 4 not in got  # no relevant docs -> metrics undefined
