"""Behavioral event analytics: ordered funnels and cohort retention —
the two queries every event log answers first (product analytics'
bread and butter; same semantics as the classic funnel/retention
reports of Mixpanel/Amplitude, computed here as pure DataFrame
algebra over the engine's events table).

Funnel (ordered, earliest-completion semantics): a user reaches step
i when an event of the step's type exists STRICTLY AFTER the moment
they reached step i-1; the reach time is the MIN qualifying
timestamp, so the whole cascade is deterministic (no per-row
tie-breaking — min is total on timestamps, and equal-ts events
cannot advance two steps at once because the comparison is strict).

Retention: users are cohorted by the calendar date of their FIRST
`signup_type` event; a cohort member is retained at offset d if any
`active_types` event falls exactly d days after their cohort date.

Scale shape: every step/offset is one (user)-keyed min- or
distinct-aggregation plus a join against the previous step's
user-sized frame — the standard sessionless event-analytics shape
(no window over the raw log, no per-user collect).  Step chains are
short (a funnel is 3-5 steps), so the linear join chain is fine;
lineage capped per step with localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(step, step_name, n_users, conv_rate): users reaching each
    ordered step, conversion measured against step 0 (round-9)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = None
    counts = []
    for st in steps:
        cur = events.where(F.col(type_col) == st).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("ts")
        )
        if reached is None:
            reached = cur.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            reached = (
                cur.join(reached, "u")
                .where(F.col("ts") > F.col("t"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        reached = reached.localCheckpoint()
        counts.append(reached.agg(F.count("*").alias("n_users")))

    base = F.broadcast(counts[0].select(F.col("n_users").alias("n0")))
    out = None
    for i, (st, c) in enumerate(zip(steps, counts)):
        row = c.crossJoin(base).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(st).alias("step_name"),
            "n_users",
            F.round(
                F.col("n_users").cast("double") / F.col("n0").cast("double"), 9
            ).alias("conv_rate"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def cohort_retention(
    events: DataFrame,
    signup_type: str = "signup",
    active_types: list[str] | None = None,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_date, day_offset, n_active, retention): per signup-date
    cohort, how many members produced an active event exactly
    `day_offset` days later (offset 0 = signup day), retention
    against the cohort's size (round-9). cohort_date is an ISO string
    (flat driver-friendly column)."""
    cohorts = (
        events.where(F.col(type_col) == signup_type)
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(F.to_date(ts_col)).alias("cd"))
    )
    sizes = cohorts.groupBy("cd").agg(F.count("*").alias("n_cohort"))
    active = events
    if active_types is not None:
        active = events.where(F.col(type_col).isin(list(active_types)))
    activity = active.select(
        F.col(user_col).alias("u"), F.to_date(ts_col).alias("ad")
    ).distinct()
    return (
        cohorts.join(activity, "u")
        .where(F.col("ad") >= F.col("cd"))
        .select("u", "cd", F.datediff("ad", "cd").cast("long").alias("day_offset"))
        .distinct()
        .groupBy("cd", "day_offset")
        .agg(F.countDistinct("u").alias("n_active"))
        .join(sizes, "cd")
        .select(
            F.date_format("cd", "yyyy-MM-dd").alias("cohort_date"),
            "day_offset",
            "n_active",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort").cast("double"), 9
            ).alias("retention"),
        )
    )
