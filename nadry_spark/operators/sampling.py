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


def temperature_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    temp: float = 2.0,
    target_rows: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-scaled domain mixture — the standard
    rebalancing step for multi-domain / multilingual training corpora
    (the exponent-smoothed sampling of mBERT/XLM-R, Conneau et al.
    2020: sample domain d with probability proportional to p_d^(1/T)).
    T=1 keeps natural proportions; T->inf approaches uniform over
    domains; in between, head domains are down-weighted and tail
    domains up-weighted without ever oversampling (keep rate capped
    at 1).

    Mechanics: per-domain counts n_d give p_d = n_d/N, smoothed
    weight w_d = p_d^(1/T), target share share_d = round(w_d / sum w,
    9), per-domain keep rate r_d = round(min(1, target_rows * share_d
    / n_d), 9); a row survives iff its salted key hash (same
    construction as hash_sample) lands below its domain's r_d — so
    the mix is reproducible row-for-row and SQL-oracle-able, and the
    SAME doc keeps its fate when the pipeline reruns.

    Scale: one count aggregation over the domain key (map-side
    combinable), a broadcast join of the tiny per-domain rate table,
    and a stateless filter — no shuffle of the data itself.
    """
    if temp <= 0:
        raise ValueError("temp must be positive")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("n_d"))
    tot = counts.agg(F.sum("n_d").alias("n"))
    w = counts.crossJoin(F.broadcast(tot)).withColumn(
        "w_d",
        F.pow(F.col("n_d").cast("double") / F.col("n").cast("double"),
              F.lit(1.0) / F.lit(float(temp))),
    )
    z = w.agg(F.sum("w_d").alias("z"))
    rates = (
        w.crossJoin(F.broadcast(z))
        .withColumn("share", F.round(F.col("w_d") / F.col("z"), 9))
        .withColumn(
            "keep_rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_rows)) * F.col("share") / F.col("n_d"),
                ),
                9,
            ),
        )
        .select(domain_col, "keep_rate")
    )
    keyed = F.concat(F.lit(salt), F.lit("|"), F.col(key_col).cast("string"))
    return (
        df.join(F.broadcast(rates), domain_col)
        .where(kmv_frac(keyed) < F.col("keep_rate"))
        .drop("keep_rate")
    )
