"""Sequence packing — fold documents into token-budget training bins.

A training-data pipeline's last mile: given per-document token counts
and a context-window budget, assign documents to bins so each bin's
total stays under the budget (an oversized document gets a bin of its
own).  The published practice (GPT-style pretraining data loaders,
T5's "pack sequences" preprocessing) is greedy next-fit over a
deterministic document order — simple, streaming, and reproducible,
which matters more than bin-count optimality for shuffling training
shards.

Scale shape: a global sequential next-fit is inherently serial, so the
corpus is first split into ``shards`` hash shards and packed
independently within each — exactly how a 1000-executor run would do
it (each task packs one shard; bins are (shard, bin_id) pairs).  The
per-shard pass is a single applyInPandas over rows pre-sorted by
document id, O(shard rows) with one int of carried state; no
collect(), no driver loop.

Determinism contract (mirrored by the DuckDB oracle in
__spark_entry__._packing_sql): shard = doc_id % shards, order within a
shard by doc_id ascending, next-fit state machine
``fill + nt <= budget ? same bin : new bin``.  Production would swap
the modulo for xxhash64(id) — the state machine is unchanged.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_DDL = "shard long, bin_id long, doc_id long, n_tokens long"


def pack_next_fit(
    docs: DataFrame,
    budget: int,
    shards: int = 8,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(id, n_tokens, ...) -> (shard, bin_id, doc_id, n_tokens), bins
    packed next-fit per shard in ascending id order."""
    if budget <= 0:
        raise ValueError("budget must be positive")

    def pack(key, pdf):
        pdf = pdf.sort_values("doc_id")
        bins = []
        bin_id, fill = 0, 0
        first = True
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if first:
                fill = nt
                first = False
            elif fill + nt <= budget:
                fill += nt
            else:
                bin_id += 1
                fill = nt
            bins.append(bin_id)
        out = pdf[["shard", "doc_id", "n_tokens"]].copy()
        out["bin_id"] = pd.Series(bins, index=pdf.index, dtype="int64")
        return out[["shard", "bin_id", "doc_id", "n_tokens"]]

    tagged = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    ).withColumn("shard", F.pmod(F.col("doc_id"), F.lit(int(shards))).cast("long"))
    return tagged.groupBy("shard").applyInPandas(pack, PACKED_DDL)


def bin_stats(packed: DataFrame, budget: int) -> DataFrame:
    """(shard, bin_id) -> fill statistics; utilization =
    total_tokens / budget (can exceed 1 only for single oversized
    documents, by construction)."""
    return packed.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.lit(float(budget)), 9).alias("utilization"),
    )
