"""Deterministic cardinality sketches for corpus statistics.

KMV (k-minimum-values) distinct-count estimation: hash every distinct
value to [0, 1) and keep the k smallest hashes; if the k-th smallest
is t, the estimate is (k-1)/t (Bar-Yossef et al., RANDOM'02 — public
algorithm). Unlike HyperLogLog (whose register layouts differ across
engines), KMV over md5 is BIT-DETERMINISTIC: Spark and DuckDB produce
the identical estimate, so the sketch itself is SQL-oracle-checkable —
the property this engine's correctness gate is built on.

At 100TB the sketch is one groupBy-free aggregation: hash (codegen),
global top-k-smallest via sort+limit on distinct hashes (Spark prunes
with a partial limit per partition), k doubles to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 13 hex chars = 52 bits: the hash integer is EXACTLY representable in
# a double (<= 2^53), so int-parse -> cast -> divide-by-2^52 performs
# one identically-rounded IEEE division in Spark and DuckDB. More
# digits would make the integer itself inexact in a double and the two
# engines could round the cast differently.
_HEX_DIGITS = 13
_SPACE = float(16 ** _HEX_DIGITS)


def kmv_frac(col):
    """md5-derived uniform hash in [0, 1): first 13 hex digits as an
    exact-in-double integer over 16^13. Identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_DIGITS), 16, 10).cast("double") / F.lit(
        _SPACE
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row DataFrame (k, kth_min, est_distinct, exact_distinct).

    est = (k-1)/t where t is the k-th smallest hash of the DISTINCT
    values; exact_distinct rides along for error inspection (drop it
    for corpora where exact counting is the thing being avoided).
    """
    hashed = df.select(kmv_frac(F.col(col)).alias("h")).distinct()
    kth = (
        hashed.orderBy("h")
        .limit(k)
        .agg(F.max("h").alias("t"), F.count("*").alias("n_kept"))
    )
    exact = df.select(col).distinct().count()
    return kth.select(
        F.lit(k).alias("k"),
        F.round("t", 12).alias("kth_min"),
        F.round(
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                (k - 1) / F.col("t")
            ),
            6,
        ).alias("est_distinct"),
        F.lit(exact).cast("long").alias("exact_distinct"),
    )
