"""Item co-occurrence mining from behavior logs — the item-item
"users who viewed X also viewed Y" signal (Linden, Smith & York, IEEE
Internet Computing 2003, Amazon item-to-item collaborative filtering;
Church & Hanks' lift/PMI scoring as in operators/collocations but
over user baskets instead of token adjacency).  A search engine uses
it for related-content rails and query-independent doc-doc affinity;
a training pipeline uses it to mine weak supervision pairs.

    lift(a, b) = ( c_ab / U ) / ( (c_a / U) * (c_b / U) )

with U = number of distinct users, c_x = users engaging with x,
c_ab = users engaging with both (distinct-user counts, so one user
hammering a pair counts once — the same spam resistance as
anchors.n_srcs).

Scale shape: distinct (user, item) → per-user self-join → one
(a, b)-keyed count.  The self-join is quadratic PER USER, so power
users are the skew hazard: ``user_cap`` drops users with more than
cap distinct items from PAIR GENERATION (their unigram counts still
count), logged + reported via ``stats`` — the skip_hot_buckets
discipline.  A capped user contributes cap^2 pairs max; the shuffle
keys are (user) then (a, b), both fine at 100 TB.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def item_cooccurrence(
    engagements: DataFrame,
    user_col: str = "user_id",
    item_col: str = "item",
    min_users: int = 2,
    k: int = 20,
    user_cap: int = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k (item_a, item_b, n_users, lift) with item_a < item_b,
    ranked by round(lift, 9) desc then (item_a, item_b) asc."""
    ui = engagements.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct().localCheckpoint()

    sizes = ui.groupBy("u").agg(F.count("*").alias("n_items"))
    heavy = sizes.where(F.col("n_items") > user_cap)
    n_heavy = heavy.count()
    if n_heavy:
        log.warning(
            "item_cooccurrence: skipping %d users over user_cap=%d for pair "
            "generation (unigram counts unaffected)", n_heavy, user_cap,
        )
    if stats is not None:
        stats["skipped_users"] = n_heavy
    pair_src = ui.join(heavy.select("u"), "u", "left_anti")

    a = pair_src.select("u", F.col("i").alias("ia"))
    b = pair_src.select("u", F.col("i").alias("ib"))
    pairs = (
        a.join(b, "u")
        .where(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("n_users"))
        .where(F.col("n_users") >= min_users)
    )

    uni = ui.groupBy("i").agg(F.count("*").alias("c"))
    n_u = ui.select("u").distinct().agg(F.count("*").alias("n"))
    lift = (
        (F.col("n_users").cast("double") / F.col("n").cast("double"))
        / (
            (F.col("c_a").cast("double") / F.col("n").cast("double"))
            * (F.col("c_b").cast("double") / F.col("n").cast("double"))
        )
    )
    return (
        pairs.join(uni.select(F.col("i").alias("ia"), F.col("c").alias("c_a")), "ia")
        .join(uni.select(F.col("i").alias("ib"), F.col("c").alias("c_b")), "ib")
        .crossJoin(F.broadcast(n_u))
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            "n_users",
            F.round(lift, 9).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.asc("item_a"), F.asc("item_b"))
        .limit(k)
    )
