"""asof_join / interval_join semantics vs naive formulations."""

import pytest
from pyspark.sql import functions as F

from nadry_spark.operators.temporal import asof_join, interval_join


def test_asof_join_matches_naive(spark):
    """The union+window as-of must equal the naive per-left-row
    'max right_ts <= left_ts' formulation, including left-outer nulls
    and <= tie inclusion."""
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 5), (2, 7), (3, 100)],
        "k long, lt long",
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 8, "d")],
        "k long, rt long, payload string",
    )
    got = {
        (r["k"], r["lt"]): (r["payload"], r["m_rt"])
        for r in asof_join(
            left,
            right.withColumn("m_rt", F.col("rt")),
            on="k",
            left_ts="lt",
            right_ts="rt",
            right_cols=["payload", "m_rt"],
        ).collect()
    }
    # (1,10): rt=10 ties -> included; (1,25): rt=20; (1,5): none;
    # (2,7): rt=8 is later -> none; (3,100): key absent -> none
    assert got == {
        (1, 10): ("a", 10),
        (1, 25): ("b", 20),
        (1, 5): (None, None),
        (2, 7): (None, None),
        (3, 100): (None, None),
    }

    strict = {
        (r["k"], r["lt"]): r["payload"]
        for r in asof_join(
            left, right, on="k", left_ts="lt", right_ts="rt",
            right_cols=["payload"], strict=True,
        ).collect()
    }
    assert strict[(1, 10)] is None  # rt=10 no longer visible at lt=10
    assert strict[(1, 25)] == "b"

    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="lt", right_ts="rt",
                  right_cols=["lt"])


def test_asof_join_randomized_vs_naive(spark):
    """Property check on a random-ish deterministic dataset: compare
    against the naive window-free SQL formulation."""
    import random

    rng = random.Random(4)
    lrows = [(rng.randrange(8), rng.randrange(1000)) for _ in range(300)]
    rrows = [
        (rng.randrange(8), rng.randrange(1000), i) for i in range(200)
    ]
    # dedupe right per (k, rt): keep max rid (asof precondition)
    best = {}
    for k, rt, rid in rrows:
        best[(k, rt)] = max(best.get((k, rt), -1), rid)
    rrows = [(k, rt, rid) for (k, rt), rid in best.items()]
    left = spark.createDataFrame(lrows, "k long, lt long")
    right = spark.createDataFrame(rrows, "k long, rt long, rid long")
    got = sorted(
        (r["k"], r["lt"], r["rid"])
        for r in asof_join(
            left, right, on="k", left_ts="lt", right_ts="rt",
            right_cols=["rid"],
        ).collect()
    )
    def naive(k, lt):
        cands = [(rt, rid) for (kk, rt, rid) in rrows if kk == k and rt <= lt]
        return max(cands)[1] if cands else None
    want = sorted((k, lt, naive(k, lt)) for k, lt in lrows)
    assert got == want


def test_interval_join_matches_naive(spark):
    """Bucketed equi-join must reproduce the naive range predicate for
    every `closed` mode, across bucket widths (including widths smaller
    and larger than the intervals)."""
    import random

    rng = random.Random(9)
    pts_rows = [(i, rng.randrange(500)) for i in range(400)]
    iv_rows = []
    for i in range(40):
        lo = rng.randrange(480)
        iv_rows.append((i, lo, lo + rng.randrange(1, 60)))
    pts = spark.createDataFrame(pts_rows, "pid long, p long")
    ivs = spark.createDataFrame(iv_rows, "iid long, lo long, hi long")

    for closed in ("left", "both", "right", "neither"):
        def pred(p, lo, hi):
            lo_ok = p >= lo if closed in ("left", "both") else p > lo
            hi_ok = p <= hi if closed in ("right", "both") else p < hi
            return lo_ok and hi_ok

        want = sorted(
            (pid, iid)
            for pid, p in pts_rows
            for iid, lo, hi in iv_rows
            if pred(p, lo, hi)
        )
        for width in (7, 64, 1000):
            got = sorted(
                (r["pid"], r["iid"])
                for r in interval_join(
                    pts, ivs, "p", "lo", "hi", bucket_width=width,
                    closed=closed,
                ).collect()
            )
            assert got == want, (closed, width)

    with pytest.raises(ValueError):
        interval_join(pts, ivs, "p", "lo", "hi", 10, closed="open")


def test_interval_join_plan_has_no_nested_loop(spark):
    """The whole point: the physical plan must be a hash/sort-merge
    equi-join on the bucket, never BroadcastNestedLoopJoin."""
    pts = spark.range(100).select(F.col("id").alias("p"))
    ivs = spark.range(10).select(
        (F.col("id") * 10).alias("lo"), (F.col("id") * 10 + 5).alias("hi")
    )
    plan = interval_join(
        pts, ivs, "p", "lo", "hi", bucket_width=10
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "Join" in plan
