"""Temperature mixing (operators/sampling.temperature_mix) vs a
pure-Python replica of the hash/rate math; rebalancing direction and
determinism checks."""

import hashlib
import math


def _frac(salt, key):
    h = hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:13]
    return int(h, 16) / float(16 ** 13)


def _ref_mix(rows, temp, target, salt=""):
    counts = {}
    for d, k in rows:
        counts[d] = counts.get(d, 0) + 1
    n = sum(counts.values())
    w = {d: (c / n) ** (1.0 / temp) for d, c in counts.items()}
    z = sum(w.values())
    rates = {
        d: round(min(1.0, target * round(w[d] / z, 9) / counts[d]), 9)
        for d in counts
    }
    return {(d, k) for d, k in rows if _frac(salt, k) < rates[d]}, rates


def test_temperature_mix_matches_reference(spark):
    from nadry_spark.operators.sampling import temperature_mix

    # head domain 800 rows, mid 150, tail 50
    rows = (
        [("head", f"h{i}") for i in range(800)]
        + [("mid", f"m{i}") for i in range(150)]
        + [("tail", f"t{i}") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "domain string, doc_key string")
    got = {
        (r["domain"], r["doc_key"])
        for r in temperature_mix(
            df, "domain", "doc_key", temp=2.0, target_rows=300
        ).collect()
    }
    want, rates = _ref_mix(rows, 2.0, 300)
    assert got == want

    # rebalancing direction: tail keep-rate must exceed its natural
    # share of the target (uniform-ward pull), head must be below
    natural = {d: 300 * c / 1000 / c for d, c in
               {"head": 800, "mid": 150, "tail": 50}.items()}
    assert rates["tail"] > natural["tail"]
    assert rates["head"] < natural["head"]

    # deterministic: a rerun keeps exactly the same rows
    again = {
        (r["domain"], r["doc_key"])
        for r in temperature_mix(
            df, "domain", "doc_key", temp=2.0, target_rows=300
        ).collect()
    }
    assert again == got


def test_temperature_mix_validation(spark):
    import pytest

    from nadry_spark.operators.sampling import temperature_mix

    df = spark.createDataFrame([("a", "k")], "domain string, doc_key string")
    with pytest.raises(ValueError):
        temperature_mix(df, "domain", "doc_key", temp=0.0)
