"""Session path mining + rate anomalies (operators/eventstats)."""

import math
from datetime import datetime, timedelta


def test_top_session_paths(spark):
    from nadry_spark.operators.eventstats import top_session_paths

    t0 = datetime(2024, 1, 1)

    def mk(u, offset_s, typ, eid):
        return (u, typ, t0 + timedelta(seconds=offset_s), eid)

    rows = [
        # u1 session 1: view>click ; gap >30min ; session 2: view
        mk(1, 0, "view", 1), mk(1, 60, "click", 2), mk(1, 4000, "view", 3),
        # u2: view>click (one session)
        mk(2, 0, "view", 4), mk(2, 30, "click", 5),
        # u3: single long session truncated at max_len=2: view>click (purchase cut)
        mk(3, 0, "view", 6), mk(3, 10, "click", 7), mk(3, 20, "purchase", 8),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = [
        (r["path"], r["n_sessions"])
        for r in top_session_paths(ev, gap_seconds=1800, k=10, max_len=2).collect()
    ]
    assert got == [("view>click", 3), ("view", 1)]


def test_rate_anomalies(spark):
    from nadry_spark.operators.eventstats import rate_anomalies

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 10 steady hours of 5 events, then one hour with 50
    for h in range(10):
        for j in range(5):
            rows.append((eid, "view", t0 + timedelta(hours=h, minutes=j))); eid += 1
    for j in range(50):
        rows.append((eid, "view", t0 + timedelta(hours=10, minutes=j))); eid += 1
    ev = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp")
    got = rate_anomalies(ev, window_hours=24, threshold=3.0).collect()
    # steady hours have zero trailing variance -> only the spike could
    # flag, and it can't (variance 0) ... so add slight jitter instead
    assert got == []

    rows2 = list(rows)
    # make hour 3 have 6 events so trailing variance is nonzero
    rows2.append((eid, "view", t0 + timedelta(hours=3, minutes=55)))
    ev2 = spark.createDataFrame(rows2, "event_id long, event_type string, ts timestamp")
    got2 = {r["hour_epoch"]: r for r in rate_anomalies(ev2, threshold=3.0).collect()}
    spike_epoch = int((t0 + timedelta(hours=10)).timestamp())
    assert spike_epoch in got2 and got2[spike_epoch]["n"] == 50
    # z matches the integer-sum formula by hand
    r = got2[spike_epoch]
    ns = [5, 5, 5, 6, 5, 5, 5, 5, 5, 5]
    s, sq, m = sum(ns), sum(x * x for x in ns), len(ns)
    mean = s / m
    var = (sq - s * s / m) / (m - 1)
    assert r["z"] == round((50 - mean) / math.sqrt(var), 9)


def test_ab_test(spark):
    import hashlib

    from nadry_spark.operators.eventstats import ab_test

    def frac(u):
        h = hashlib.md5(f"ab|{u}".encode()).hexdigest()[:13]
        return int(h, 16) / float(16 ** 13)

    rows = []
    for u in range(60):
        rows.append((u, "view"))
        if u % 3 == 0:
            rows.append((u, "purchase"))
    rows.append((999, "purchase"))  # converter never exposed: ignored
    ev = spark.createDataFrame(
        [(u, t) for u, t in rows], "user_id long, event_type string"
    )
    r = ab_test(ev).collect()[0]

    arms = {"A": [], "B": []}
    for u in range(60):
        arms["A" if frac(u) < 0.5 else "B"].append(u)
    n_a, n_b = len(arms["A"]), len(arms["B"])
    c_a = sum(1 for u in arms["A"] if u % 3 == 0)
    c_b = sum(1 for u in arms["B"] if u % 3 == 0)
    assert (r["n_a"], r["n_b"], r["conv_a"], r["conv_b"]) == (n_a, n_b, c_a, c_b)
    assert r["n_a"] + r["n_b"] == 60
    import math
    p_a, p_b = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    z = (p_a - p_b) / math.sqrt(pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b))
    assert r["z"] == round(z, 9)
