"""Funnel + cohort retention (operators/funnel) vs hand-computed
expectations, incl. the strictly-after ordering rule."""

from datetime import datetime


def _ts(d, h=0, m=0):
    return datetime(2024, 1, d, h, m)


def test_funnel_ordering(spark):
    from nadry_spark.operators.funnel import funnel

    rows = [
        # u1: clean view -> click -> purchase
        (1, "view", _ts(1)), (1, "click", _ts(2)), (1, "purchase", _ts(3)),
        # u2: clicks BEFORE viewing -> click doesn't count, then no later click
        (2, "click", _ts(1)), (2, "view", _ts(2)), (2, "purchase", _ts(3)),
        # u3: view + click same ts -> strict 'after' blocks the click
        (3, "view", _ts(5)), (3, "click", _ts(5)),
        # u4: view then click, no purchase
        (4, "view", _ts(1)), (4, "click", _ts(1, 1)),
        # u5: never views (click+purchase only)
        (5, "click", _ts(1)), (5, "purchase", _ts(2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        r["step_name"]: (r["step"], r["n_users"], r["conv_rate"])
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got["view"] == (0, 4, 1.0)            # u1 u2 u3 u4
    assert got["click"] == (1, 2, 0.5)           # u1, u4 (u2 pre-view, u3 same-ts)
    assert got["purchase"] == (2, 1, 0.25)       # u1 only


def test_cohort_retention(spark):
    from nadry_spark.operators.funnel import cohort_retention

    rows = [
        (1, "signup", _ts(1)), (1, "view", _ts(1, 5)), (1, "view", _ts(3)),
        (2, "signup", _ts(1)), (2, "click", _ts(2)),
        (3, "signup", _ts(2)), (3, "view", _ts(2, 1)),
        # activity BEFORE signup date never counts
        (4, "view", _ts(1)), (4, "signup", _ts(3)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    got = {
        (r["cohort_date"], r["day_offset"]): (r["n_active"], r["retention"])
        for r in cohort_retention(
            ev, active_types=["view", "click"]
        ).collect()
    }
    assert got[("2024-01-01", 0)] == (1, 0.5)    # u1 active day 0 (of 2 in cohort)
    assert got[("2024-01-01", 1)] == (1, 0.5)    # u2 clicked day 1
    assert got[("2024-01-01", 2)] == (1, 0.5)    # u1 viewed day 3rd
    assert got[("2024-01-02", 0)] == (1, 1.0)    # u3
    assert ("2024-01-03", 0) not in got          # u4's view predates signup
