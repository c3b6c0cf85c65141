"""Item co-occurrence (operators/cooccur) vs a pure-Python replica;
user-cap skew guard semantics."""


def _ref(rows, min_users, k, cap=1000):
    ui = sorted(set(rows))
    per_user = {}
    for u, i in ui:
        per_user.setdefault(u, set()).add(i)
    uni = {}
    for _u, i in ui:
        uni[i] = uni.get(i, 0) + 1
    n = len(per_user)
    pairs = {}
    for u, items in per_user.items():
        if len(items) > cap:
            continue
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                pairs[(s[x], s[y])] = pairs.get((s[x], s[y]), 0) + 1
    out = []
    for (a, b), c in pairs.items():
        if c < min_users:
            continue
        lift = (c / n) / ((uni[a] / n) * (uni[b] / n))
        out.append((a, b, c, round(lift, 9)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:k]


def test_cooccurrence_matches_reference(spark):
    from nadry_spark.operators.cooccur import item_cooccurrence

    rows = [
        (1, "x"), (1, "y"), (1, "x"),      # duplicate engagement: counts once
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "y"), (4, "z"),
        (5, "x"), (5, "y"), (5, "z"),
        (6, "q"),
    ]
    df = spark.createDataFrame(rows, "user_id long, item string")
    got = [
        (r["item_a"], r["item_b"], r["n_users"], r["lift"])
        for r in item_cooccurrence(df, item_col="item", min_users=2, k=10).collect()
    ]
    assert got == _ref(rows, 2, 10)
    # (x, y): 3 users of 6 -> top pair present
    assert any(a == "x" and b == "y" and n == 3 for a, b, n, _ in got)


def test_cooccurrence_user_cap(spark):
    from nadry_spark.operators.cooccur import item_cooccurrence

    heavy = [(1, f"i{j}") for j in range(30)]
    light = [(2, "i0"), (2, "i1"), (3, "i0"), (3, "i1")]
    df = spark.createDataFrame(heavy + light, "user_id long, item string")
    stats = {}
    got = item_cooccurrence(
        df, item_col="item", min_users=2, k=100, user_cap=10, stats=stats
    ).collect()
    assert stats["skipped_users"] == 1
    # only the light users form pairs: (i0, i1) with 2 users
    assert [(r["item_a"], r["item_b"], r["n_users"]) for r in got] == [("i0", "i1", 2)]
