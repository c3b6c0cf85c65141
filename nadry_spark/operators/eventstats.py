"""Event-stream analytics beyond funnels: top user journeys and
traffic-rate anomaly detection.

``top_session_paths`` — the "top user journeys" report: sessionize by
inactivity gap (the same gaps-and-islands shape as the driver's
sessionization query), form each session's ordered event-type path
(capped at ``max_len`` events so a bot session cannot materialize an
unbounded string), count identical paths corpus-wide.  Ordering
inside a session is (ts, event_id) — total, so the path string is
deterministic.

``rate_anomalies`` — hourly event-rate z-scores against a trailing
window, the pager-duty query.  Variance is computed from INTEGER
window sums (sum, sum of squares, count are exact in BIGINT;
var = (sq - s*s/n) / (n-1) with a fixed double op order), so unlike
stddev_samp() the result is bit-identical across engines — same
trick as the HLL integer register sum.  Flags |z| > threshold.

Scale shape: both are window functions over (user)- or
(event_type)-partitioned frames plus one count aggregation — the
standard sessionless log-analytics plans, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    k: int = 20,
    max_len: int = 8,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(path, n_sessions) for the k most common session journeys;
    path = '>'-joined event types of the session's first max_len
    events. Ties rank path-asc."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    sess = (
        events.select(
            user_col,
            type_col,
            ts_col,
            id_col,
            (
                F.unix_timestamp(ts_col)
                - F.unix_timestamp(F.lag(ts_col, 1).over(w))
                > gap_seconds
            )
            .cast("int")
            .alias("new_sess"),
        )
        .fillna({"new_sess": 1})
        .withColumn(
            "sess_no",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    ws = Window.partitionBy(user_col, "sess_no").orderBy(ts_col, id_col)
    truncated = sess.withColumn("_rn", F.row_number().over(ws)).where(
        F.col("_rn") <= max_len
    )
    paths = truncated.groupBy(user_col, "sess_no").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(ts_col, id_col, F.col(type_col).alias("t")))
                ),
                lambda x: x["t"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(k)
    )


def rate_anomalies(
    events: DataFrame,
    window_hours: int = 24,
    threshold: float = 3.0,
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(event_type, hour_epoch, n, z) for hours whose event count sits
    more than `threshold` trailing-window standard deviations from
    the trailing mean. Hours with fewer than 2 trailing observations
    or zero variance are never flagged."""
    hourly = events.groupBy(
        type_col,
        F.unix_timestamp(F.date_trunc("hour", F.col(ts_col))).alias("hour_epoch"),
    ).agg(F.count("*").alias("n"))
    return rate_anomalies_from_hourly(
        hourly, window_hours=window_hours, threshold=threshold, type_col=type_col
    )


def rate_anomalies_from_hourly(
    hourly: DataFrame,
    window_hours: int = 24,
    threshold: float = 3.0,
    type_col: str = "event_type",
) -> DataFrame:
    """Core scorer over a precomputed (event_type, hour_epoch, n)
    table — shared by the batch path above and the streaming monitor
    (streaming/monitor.py), which maintains the hourly table
    incrementally and re-scores it per batch."""
    w = (
        Window.partitionBy(type_col)
        .orderBy("hour_epoch")
        .rowsBetween(-window_hours, -1)
    )
    stats = hourly.select(
        type_col,
        "hour_epoch",
        "n",
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("sq"),
        F.count("n").over(w).alias("m"),
    ).where(F.col("m") >= 2)
    mean = F.col("s").cast("double") / F.col("m").cast("double")
    var = (
        F.col("sq").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double") / F.col("m").cast("double")
    ) / (F.col("m").cast("double") - F.lit(1.0))
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        stats.withColumn("_var", var)
        .where(F.col("_var") > 0)
        .select(type_col, "hour_epoch", "n", F.round(z, 9).alias("z"))
        .where(F.abs(F.col("z")) > threshold)
    )


def ab_test(
    events: DataFrame,
    conv_type: str = "purchase",
    exposure_type: str = "view",
    salt: str = "ab",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Two-proportion z-test over a deterministic 50/50 user split —
    the experiment-analysis primitive, with the assignment coming from
    the engine's salted hash (operators/sampling discipline) so the
    same user lands in the same arm on every rerun and engine.

    Exposed users (any `exposure_type` event) are assigned arm A if
    their salted hash < 0.5 else B; a user converts if they have any
    `conv_type` event.  One output row: per-arm sizes, conversions,
    rates, and the pooled two-proportion z statistic

        z = (pA - pB) / sqrt( p*(1-p) * (1/nA + 1/nB) )

    computed from integer counts in one fixed double op sequence
    (bit-identical cross-engine; no variance estimator drift).
    Scale: two user-keyed distinct aggregations and a 1-row join.
    """
    from nadry_spark.operators.sketches import kmv_frac

    keyed = F.concat(F.lit(salt), F.lit("|"), F.col("u").cast("string"))
    exposed = (
        events.where(F.col(type_col) == exposure_type)
        .select(F.col(user_col).alias("u"))
        .distinct()
        .withColumn("arm", F.when(kmv_frac(keyed) < 0.5, "A").otherwise("B"))
    )
    converted = (
        events.where(F.col(type_col) == conv_type)
        .select(F.col(user_col).alias("u"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    per_arm = (
        exposed.join(converted, "u", "left")
        .groupBy("arm")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.coalesce("conv", F.lit(0))).alias("c"),
        )
    )
    a = per_arm.where(F.col("arm") == "A").select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = per_arm.where(F.col("arm") == "B").select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a").cast("double")
    p_b = F.col("conv_b").cast("double") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    ).cast("double")
    den = F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (
            F.lit(1.0) / F.col("n_a").cast("double")
            + F.lit(1.0) / F.col("n_b").cast("double")
        )
    )
    # degenerate experiments (0% or 100% pooled conversion) have no
    # variance: report z = 0 rather than raise (ANSI divide-by-zero)
    z = F.when(den > 0, (p_a - p_b) / den).otherwise(F.lit(0.0))
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 9).alias("rate_a"),
        F.round(p_b, 9).alias("rate_b"),
        F.round(z, 9).alias("z"),
    )
