"""Deterministic hash-based sampling — the reproducible alternative to
rand()-based sampling for training-data pipelines.

``df.sample(frac)`` draws from a per-partition RNG: results change
with partitioning, retries, and engine version, which poisons
experiment reproducibility and makes cross-engine verification
impossible. Hash sampling decides membership from the ROW KEY alone
(md5-derived uniform in [0,1), the same 13-hex-digit exact-in-double
construction as the KMV sketch), so a sample is:

- reproducible across runs, partitionings, engines (SQL-oracle-able);
- consistent across tables (the same key samples in or out
  everywhere — join two 1% samples and they align);
- versionable (the salt string IS the sample's identity).

``stratified_sample`` takes an exact per-stratum quota by ranking
each stratum in hash order — deterministic "take k of each class"
without collecting group sizes first. One window shuffle on the
strata key; at 100 TB this is the standard balanced-subset shape
(skewed strata cost their own partition, not a global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nadry_spark.operators.sketches import kmv_frac


def hash_sample(
    df: DataFrame, key_col: str, frac: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose salted key hash
    lands below ``frac``. Same key + same salt => same decision,
    everywhere, forever."""
    if not (0.0 <= frac <= 1.0):
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    keyed = F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    return df.where(kmv_frac(keyed) < F.lit(float(frac)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen and ordered
    by salted key hash (ties broken by the key itself so the result
    is total-ordered and engine-independent). Adds ``sample_rank``
    (1-based within stratum)."""
    if n_per_stratum <= 0:
        raise ValueError("n_per_stratum must be positive")
    keyed = F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    w = Window.partitionBy(*strata_cols).orderBy(
        kmv_frac(keyed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= n_per_stratum)
    )
