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


def cms_bucket(col, row: int, width: int):
    """Deterministic Count-Min bucket for hash row ``row``: md5 of the
    salted value, 13 hex digits (exact in a 64-bit int), mod width.
    Identical arithmetic in Spark and DuckDB."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), col)), 1, _HEX_DIGITS),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_table(df: DataFrame, col: str, width: int = 256, depth: int = 4) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan, J.Alg 2005) as a
    DataFrame: ``depth`` independent hash rows of ``width`` counters,
    built in ONE aggregation over an explode of the depth rows —
    (row, bucket, cnt) with depth*width rows max, regardless of input
    size or cardinality. The fixed-size frequency summary for streams
    / corpora where a full per-key groupBy is the thing being avoided.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    )
    return rows.groupBy(
        F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, width: int, depth: int
) -> DataFrame:
    """Point-query the sketch for each key: min over the depth rows of
    the key's bucket counter. CMS never under-estimates (every
    occurrence lands in the counted bucket) — ``est >= true`` always,
    with overestimate bounded by collisions (~N/width per row, min
    over depth rows). Join is (keys x depth) vs the fixed-size sketch:
    broadcastable regardless of corpus size."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(key_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_count"))
    )


# ---- HyperLogLog ----------------------------------------------------------

# HLL (Flajolet et al., AofA'07) is usually NOT cross-engine
# deterministic because each engine's built-in picks its own hash and
# register layout.  This implementation pins both: md5, b=8 bucket
# bits (m=256 registers) from the first 2 hex chars, and the rank
# source w from the next 13 hex chars (52 bits — exactly parseable
# into a BIGINT in Spark and DuckDB alike).  The register sum
# Z = sum(2^-M_j) is the one place IEEE addition order could diverge
# between engines, so it is computed in EXACT integer arithmetic:
# S = sum(2^(53-M_j)) <= 256*2^53 = 2^61 fits a BIGINT, and
# Z = S / 2^53 is a single identically-rounded division.  The only
# transcendental (ln in the small-range correction) is rounded away
# at 6 digits, and the correction BRANCH is decided on the
# bit-identical raw estimate.
_HLL_B = 8
_HLL_M = 1 << _HLL_B  # 256
_HLL_WBITS = 52  # 13 hex chars; rho(w) in [1, 53]
_HLL_POW = float(1 << (_HLL_WBITS + 1))  # 2^53
# alpha_m * m^2 * 2^53 folded into ONE Python double embedded as a
# literal in both engines, so the estimate is literal/S — one division
HLL_NUMERATOR = 0.7213 / (1.0 + 1.079 / _HLL_M) * _HLL_M * _HLL_M * _HLL_POW


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, m_j): max leading-zero rank per register. Duplicates
    are harmless (max is idempotent) — no distinct pass needed, which
    is the property that makes HLL mergeable and streaming-friendly."""
    h = F.md5(F.col(col))
    w = F.conv(F.substring(h, 3, 13), 16, 10).cast("long")
    rho = F.when(w == F.lit(0), F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(
            F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_distinct_estimate(df: DataFrame, col: str) -> DataFrame:
    """One-row DataFrame (m, n_zero, s_total, est_distinct,
    exact_distinct). est is the standard HLL estimate with the
    small-range (linear counting) correction; exact_distinct rides
    along for error inspection."""
    regs = hll_registers(df, col)
    agg = regs.agg(
        F.sum(F.expr(f"shiftleft(1L, {_HLL_WBITS + 1} - m_j)")).alias("s_present"),
        F.count("*").alias("n_present"),
    )
    exact = df.select(col).distinct().count()
    m = _HLL_M
    s_total = (
        F.col("s_present")
        + (F.lit(m) - F.col("n_present")) * F.lit(int(_HLL_POW)).cast("long")
    ).cast("long")
    n_zero = (F.lit(m) - F.col("n_present")).cast("long")
    est_raw = F.lit(HLL_NUMERATOR) / s_total.cast("double")
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (n_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / n_zero.cast("double")),
    ).otherwise(est_raw)
    return agg.select(
        F.lit(m).alias("m"),
        n_zero.alias("n_zero"),
        s_total.alias("s_total"),
        F.round(est, 6).alias("est_distinct"),
        F.lit(exact).cast("long").alias("exact_distinct"),
    )


def corpus_overlap(
    a: DataFrame, b: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """Dataset-overlap audit: how much of corpus B is already in A?
    The question every dataset merge/refresh asks before paying for
    dedup — answered exactly (one full-outer membership join) and by
    KMV sketch (what a 100 TB deployment would precompute per corpus
    and merge in milliseconds; Beyer et al., SIGMOD'07 k-min-value
    synopses: union sketch = k smallest of the merged k-mins,
    intersection by inclusion-exclusion).

    One row: exact n_a/n_b/n_inter/n_union, jaccard and containment
    (share of B's keys present in A), plus est_a/est_b/est_union/
    est_inter from the same md5 hash space as every sketch in this
    module — bit-deterministic and oracle-checkable. Exact side costs
    one distinct + one full-outer join shuffle on the key; the sketch
    side's k-min per corpus is map-side combinable.
    """
    ka = a.select(F.col(col).alias("key")).distinct()
    kb = b.select(F.col(col).alias("key")).distinct()
    both = (
        ka.withColumn("in_a", F.lit(1))
        .join(kb.withColumn("in_b", F.lit(1)), "key", "full_outer")
        .agg(
            F.sum(F.coalesce("in_a", F.lit(0))).alias("n_a"),
            F.sum(F.coalesce("in_b", F.lit(0))).alias("n_b"),
            F.sum(
                F.coalesce("in_a", F.lit(0)) * F.coalesce("in_b", F.lit(0))
            ).alias("n_inter"),
        )
    )

    def _kth(df: DataFrame, name: str) -> DataFrame:
        hashed = df.select(kmv_frac(F.col("key")).alias("h")).distinct()
        return (
            hashed.orderBy("h")
            .limit(k)
            .agg(F.max("h").alias(f"t_{name}"), F.count("*").alias(f"m_{name}"))
        )

    est = lambda t, m: F.when(  # noqa: E731 — local estimator expression
        F.col(m) < k, F.col(m).cast("double")
    ).otherwise((k - 1) / F.col(t))

    sketches = (
        _kth(ka, "a")
        .crossJoin(_kth(kb, "b"))
        .crossJoin(_kth(ka.unionByName(kb).distinct(), "u"))
    )
    return (
        both.crossJoin(F.broadcast(sketches))
        .select(
            "n_a",
            "n_b",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
                9,
            ).alias("jaccard"),
            F.round(
                F.col("n_inter").cast("double") / F.col("n_b").cast("double"), 9
            ).alias("containment_b_in_a"),
            F.round(est("t_a", "m_a"), 6).alias("est_a"),
            F.round(est("t_b", "m_b"), 6).alias("est_b"),
            F.round(est("t_u", "m_u"), 6).alias("est_union"),
            F.round(
                F.greatest(
                    F.lit(0.0), est("t_a", "m_a") + est("t_b", "m_b") - est("t_u", "m_u")
                ),
                6,
            ).alias("est_inter"),
        )
    )
