"""Suggestions store — S11 (api/SupabaseService.java:67-165).

The reference keeps a Supabase/Postgres table `Suggestions` with
case-insensitive substring fetch (``ilike %q%`` + limit, :67-107) and
insert-with-409-dedup (:115-165). Rebuilt as a tiny DataFrame utility:
fetch = ilike filter + deterministic order + limit; insert = union +
case-preserving first-wins dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fetch_suggestions(suggestions: DataFrame, q: str, limit: int = 10) -> DataFrame:
    """ilike '%q%' (case-insensitive substring), ordered, limited."""
    escaped = q.replace("%", r"\%").replace("_", r"\_")
    return (
        suggestions.where(F.col("suggestion").ilike(f"%{escaped}%"))
        .orderBy("suggestion")
        .limit(limit)
    )


def insert_suggestion(suggestions: DataFrame, new: str) -> DataFrame:
    """Insert with duplicate rejection (the 409 path): no-op if an
    equal-ignoring-case suggestion exists."""
    spark = suggestions.sparkSession
    from nadry_spark.localrows import local_rows_df

    new_df = local_rows_df(spark, "suggestion string", [(new,)])
    existing_lc = suggestions.select(F.lower("suggestion").alias("_lc"))
    to_add = new_df.join(
        existing_lc, F.lower(new_df.suggestion) == existing_lc._lc, "left_anti"
    )
    return suggestions.unionByName(to_add.select("suggestion"))
