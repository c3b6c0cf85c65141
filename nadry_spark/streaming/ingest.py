"""Structured Streaming ingestion: pages stream -> incremental index.

The reference has no streaming (batch crawl + batch index; resume is
checkpoint-reload — WebCrawlerMain.java:21-34). This module adds the
streaming-native equivalent for continuous corpus growth:

* ``stream_ingest`` — file-source stream of pages; each micro-batch
  runs the SAME extract/tokenize/postings plan as the batch build and
  appends a *delta segment* (LSM L0) under out/delta_postings +
  out/delta_docs, tagged with batch_id. foreachBatch gives exactly-once
  per-batch output with the stream checkpoint.
* ``compact_deltas`` — folds delta segments into postings long form,
  keeping the LATEST batch per doc (re-crawled urls supersede older
  rows — first-writer-wins inverted to last-writer, the streaming
  analog of the reference's idempotent upsert S5/S6).
* ``crawl_rate_stats`` — watermarked tumbling-window counts over
  warc_ts: the late-data-tolerant monitoring aggregation.
* ``stateful_first_seen`` — applyInPandasWithState dedup: only the
  first occurrence of each url ever crosses the stream (custom
  stateful operator, the P2 visited-filter as streaming state).
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nadry_spark.sources.pages import PAGES_SCHEMA_DDL


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 4,
):
    """Start the ingest stream; returns the StreamingQuery."""
    from nadry_spark.operators.index_build import build_postings, doc_stats, extract_documents
    from nadry_spark.session import ship_package

    ship_package(spark)
    pages = (
        spark.readStream.schema(PAGES_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        docs = extract_documents(batch_df)
        postings = build_postings(docs).withColumn("batch_id", F.lit(batch_id))
        stats = doc_stats(docs).withColumn("batch_id", F.lit(batch_id))
        postings.write.mode("append").parquet(os.path.join(out_dir, "delta_postings"))
        # content/links kept: needed when deltas are finalized into
        # serving segments (enrichment + pagerank)
        stats.write.mode("append").parquet(os.path.join(out_dir, "delta_docs"))

    return (
        pages.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_deltas(spark: SparkSession, out_dir: str) -> tuple[DataFrame, DataFrame]:
    """Fold delta segments -> (postings, doc_stats), latest batch wins
    per doc_id (re-ingested urls supersede)."""
    from pyspark.sql import Window

    deltas = spark.read.parquet(os.path.join(out_dir, "delta_postings"))
    docs = spark.read.parquet(os.path.join(out_dir, "delta_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("batch_id"))
    latest_docs = (
        docs.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    latest_keys = latest_docs.select("doc_id", "batch_id")
    postings = deltas.join(latest_keys, ["doc_id", "batch_id"], "left_semi").drop("batch_id")
    return postings, latest_docs.drop("batch_id")


def finalize_stream_index(
    spark: SparkSession, stream_out_dir: str, segments_dir: str, **kwargs
) -> dict:
    """Compact the streamed delta segments into a queryable segment dir
    (docmap, compressed blocks, positions, terms, manifests) — the
    streaming-to-serving bridge. Latest batch wins per doc_id."""
    from nadry_spark.sources.segments import segments_from_postings

    postings, docs = compact_deltas(spark, stream_out_dir)
    return segments_from_postings(spark, postings, docs, segments_dir, **kwargs)


def crawl_rate_stats(pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window ingest counts by lang (late data
    beyond the watermark is dropped, state is bounded)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"), F.sum(F.length("html")).alias("bytes_in"))
    )


_FIRST_SEEN_OUT = "url string, warc_ts timestamp, html binary, text string, lang string"
_FIRST_SEEN_STATE = "seen boolean"


def _first_seen_fn(key, pdf_iter, state: GroupState):
    if state.exists:
        return iter(())
    state.update((True,))
    first = None
    for pdf in pdf_iter:
        pdf = pdf.sort_values("warc_ts")
        first = pdf.iloc[:1] if first is None else first
        break
    return iter(() if first is None else (first,))


def stateful_first_seen(pages_stream: DataFrame) -> DataFrame:
    """P2 visited-filter as streaming state: emit each url only the
    first time it is seen across the whole stream lifetime."""
    return pages_stream.groupBy("url").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=_FIRST_SEEN_OUT,
        stateStructType=_FIRST_SEEN_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
