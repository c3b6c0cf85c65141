"""Gated re-split for CPU-heavy work directly over a small scan.

Operators whose expensive work (explode fan-out, md5 hashing, map-side
partial aggregation) runs in the SCAN stage inherit the scan's
parallelism; a small parquet input packs into ~1 split
(spark.sql.files.maxPartitionBytes), serializing that work regardless
of cluster size. ``spread_small_scan`` hash-repartitions the input by
a key ONLY when the scan has fewer partitions than the cluster —
bytes-cheap for doc-shaped rows, deterministic (keyed, not
round-robin), and a no-op at real scale where the scan already
carries >= cluster-width splits. This replaces the incidental spread
the old per-doc window formulations provided via their Exchange, at a
fraction of the shuffled bytes (raw doc rows, not one-row-per-token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, key_col: str) -> DataFrame:
    """Repartition ``df`` by ``key_col`` to the cluster's default
    parallelism when (and only when) its current partitioning is
    narrower than that."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key_col)
    return df
