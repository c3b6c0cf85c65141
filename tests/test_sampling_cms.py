"""Deterministic sampling + Count-Min Sketch invariants."""

import pytest
from pyspark.sql import functions as F

from nadry_spark.operators.sampling import hash_sample, stratified_sample
from nadry_spark.operators.sketches import cms_estimate, cms_table


def test_hash_sample_deterministic_and_calibrated(spark):
    df = spark.range(20000).select(F.col("id"))
    a = {r["id"] for r in hash_sample(df, "id", 0.1, salt="x").collect()}
    b = {r["id"] for r in hash_sample(df, "id", 0.1, salt="x").collect()}
    assert a == b  # decision is a pure function of (key, salt)
    # repartitioning cannot change membership (rand() sampling fails this)
    c = {
        r["id"]
        for r in hash_sample(df.repartition(17), "id", 0.1, salt="x").collect()
    }
    assert a == c
    # calibrated: ~10% +- sampling noise
    assert 0.08 < len(a) / 20000 < 0.12
    # different salt = a fresh, roughly independent sample
    d = {r["id"] for r in hash_sample(df, "id", 0.1, salt="y").collect()}
    assert d != a
    overlap = len(a & d) / max(1, len(a))
    assert overlap < 0.2  # ~10% expected under independence
    # nested samples: frac 0.05 of the same salt is a SUBSET of 0.1
    e = {r["id"] for r in hash_sample(df, "id", 0.05, salt="x").collect()}
    assert e <= a
    with pytest.raises(ValueError):
        hash_sample(df, "id", 1.5)


def test_stratified_sample_quota_and_order(spark):
    rows = [(i, "abc"[i % 3]) for i in range(300)] + [(1000, "rare")]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = stratified_sample(df, ["grp"], "id", 7, salt="z").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append((r["sample_rank"], r["id"]))
    assert {g: len(v) for g, v in by_grp.items()} == {
        "a": 7, "b": 7, "c": 7, "rare": 1  # quota capped by stratum size
    }
    for g, v in by_grp.items():
        assert sorted(r for r, _ in v) == list(range(1, len(v) + 1))
    # deterministic under repartition
    out2 = stratified_sample(df.repartition(13), ["grp"], "id", 7, salt="z")
    assert sorted((r["grp"], r["id"]) for r in out2.collect()) == sorted(
        (r["grp"], r["id"]) for r in out
    )
    with pytest.raises(ValueError):
        stratified_sample(df, ["grp"], "id", 0)


def test_cms_never_underestimates_and_bounds(spark):
    import random

    rng = random.Random(3)
    # zipf-ish term stream: term_i appears ~ 1000/i times
    stream = []
    for i in range(1, 60):
        stream += [f"t{i}"] * (1000 // i)
    rng.shuffle(stream)
    df = spark.createDataFrame([(t,) for t in stream], "term string")
    W, D = 128, 4
    sketch = cms_table(df, "term", width=W, depth=D)
    srows = sketch.collect()
    assert len(srows) <= W * D
    assert sum(r["cnt"] for r in srows) == len(stream) * D  # every occurrence counted D times

    keys = df.select("term").distinct()
    est = {
        r["term"]: r["cms_count"]
        for r in cms_estimate(sketch, keys, "term", width=W, depth=D).collect()
    }
    true = {}
    for t in stream:
        true[t] = true.get(t, 0) + 1
    for t, n in true.items():
        assert est[t] >= n  # CMS never under-estimates
    # heavy hitters stay sharply estimated (collision noise ~ N/W)
    assert est["t1"] - true["t1"] <= 3 * len(stream) // W


def test_hll_estimate_accuracy_and_duplicates(spark):
    """HLL estimate within the published error band (~1.04/sqrt(m) =
    6.5% at m=256; allow 4 sigma), and duplicate rows leave the sketch
    unchanged (register max is idempotent)."""
    from nadry_spark.operators.sketches import hll_distinct_estimate

    vals = [(f"value-{i}",) for i in range(5000)]
    df = spark.createDataFrame(vals, "v string")
    row = hll_distinct_estimate(df, "v").collect()[0]
    assert row["exact_distinct"] == 5000
    assert abs(row["est_distinct"] - 5000) / 5000 < 4 * 1.04 / 16
    dup = df.unionAll(df).unionAll(df)
    row2 = hll_distinct_estimate(dup, "v").collect()[0]
    assert row2["s_total"] == row["s_total"]
    assert row2["est_distinct"] == row["est_distinct"]


def test_hll_small_range_linear_counting(spark):
    """With n << m most registers stay empty: the small-range branch
    must fire and return m*ln(m/V) — near-exact at tiny n."""
    from nadry_spark.operators.sketches import hll_distinct_estimate

    df = spark.createDataFrame([(f"x{i}",) for i in range(20)], "v string")
    row = hll_distinct_estimate(df, "v").collect()[0]
    assert row["n_zero"] > 0
    assert abs(row["est_distinct"] - 20) <= 2  # linear counting regime


def test_hll_registers_merge(spark):
    """Mergeability: max-combining two halves' registers equals the
    registers of the union — the property that lets per-partition /
    per-segment sketches fold without rescanning."""
    from pyspark.sql import functions as F

    from nadry_spark.operators.sketches import hll_registers

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(300)], "v string")
    merged = (
        hll_registers(a, "v")
        .unionByName(hll_registers(b, "v"))
        .groupBy("bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    direct = hll_registers(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))
