"""Temporal joins Spark lacks as built-ins: as-of join and interval
(range) join, both expressed as shuffle-bounded DataFrame plans.

These are the two workhorse joins of event/timeseries enrichment that
neither Spark SQL nor the reference engine (a keyword search backend)
ships natively. Both are implemented WITHOUT a nested-loop/theta join:

- ``asof_join``: union + partitioned window with ``last(ignorenulls)``
  — one shuffle on the key, no range-join explosion. The standard
  distributed formulation (equivalent to pandas ``merge_asof`` /
  QuestDB/kdb ``aj``) of "for each left row, the most recent right row
  at or before it".
- ``interval_join``: bucketed equi-join — intervals explode to the
  fixed-width buckets they span, points map to exactly one bucket, the
  join is a plain hash equi-join on (keys..., bucket) followed by the
  exact range filter. Each point matches each interval at most once
  (the point's own bucket), so no dedup pass is needed. Cost is
  O(points + intervals * avg_span/bucket) shuffle rows instead of the
  O(points * intervals) of a BroadcastNestedLoopJoin.

At 100 TB both shapes hold: the as-of join shuffles each side once by
key and the window is a linear per-partition sweep; the interval join's
bucket width is the knob trading explode factor against per-bucket
fan-in (pick ~ the median interval length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join: for every left row, attach ``right_cols`` from
    the right row with the greatest ``right_ts`` <= ``left_ts`` (or
    strictly < with ``strict=True``) within the same ``on`` key.

    Left rows with no prior right row keep NULLs in ``right_cols``
    (left-outer semantics). ``right_cols`` must not collide with left
    column names and must not include ``right_ts`` itself — alias it
    into ``right_cols`` beforehand if the match timestamp is wanted.

    Right rows should be unique per (on, right_ts): ties at the exact
    same timestamp have no defined winner in any as-of engine — dedupe
    first (e.g. keep max id) to make results deterministic.

    Plan shape: unionByName of the two tagged sides, one shuffle by
    ``on``, and a running ``last(ignorenulls)`` window per right
    column. No range join, no broadcast requirement on either side.
    """
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")
    # side orders right rows BEFORE left rows at equal ts so <= ties
    # resolve to "include the right row"; strict mode flips the order
    # so a right row at exactly left_ts is NOT visible to that left row
    l2 = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(0 if strict else 1)
    )
    r2 = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(1 if strict else 0).alias("_side"),
        *[F.col(c) for c in right_cols],
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in u.columns if c not in right_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    keep_left = 0 if strict else 1
    return filled.where(F.col("_side") == keep_left).drop("_ts", "_side")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
    closed: str = "left",
) -> DataFrame:
    """Join points to every interval containing them, [lo, hi) by
    default (``closed``: "left" | "both" | "right" | "neither"), via a
    bucketed equi-join — no nested-loop plan.

    ``point_col``/``lo_col``/``hi_col`` must be numeric (cast
    timestamps to epoch seconds first). ``keys`` adds equality columns
    present on both sides. Every interval explodes to the
    ``bucket_width``-wide buckets it spans; a point lives in exactly
    one bucket, so each (point, interval) pair joins at most once and
    no post-join dedup is needed. Pick ``bucket_width`` near the
    median interval length: explode factor stays ~2 while each bucket
    keys a bounded slice of the point stream.
    """
    if closed not in ("left", "both", "right", "neither"):
        raise ValueError(f"closed must be left|both|right|neither, got {closed!r}")
    keys = list(keys or [])
    lo_ok = (
        F.col(point_col) >= F.col(lo_col)
        if closed in ("left", "both")
        else F.col(point_col) > F.col(lo_col)
    )
    hi_ok = (
        F.col(point_col) <= F.col(hi_col)
        if closed in ("right", "both")
        else F.col(point_col) < F.col(hi_col)
    )
    ib = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ),
    )
    pb = points.withColumn("_b", F.floor(F.col(point_col) / bucket_width))
    return pb.join(ib, keys + ["_b"]).where(lo_ok & hi_ok).drop("_b")
