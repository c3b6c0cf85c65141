"""Streaming rate monitoring: the pager-duty loop as Structured
Streaming — watermarked tumbling-window counts over the event stream,
folded into a durable hourly table per micro-batch, each batch
re-scoring the accumulated history with the batch engine's EXACT
anomaly semantics (operators/eventstats.rate_anomalies_from_hourly),
so an alert fired by the stream is bit-identical to what a batch
backfill over the same events would flag.

Exactly-once discipline mirrors streaming/ingest.py: emissions land
partitioned by batch_id (a replayed batch overwrites its own
partition), and because the stream runs in UPDATE mode — append mode
would withhold every window the watermark hasn't passed, i.e. all of
them on a finite availableNow backlog — each emission carries the
window's complete count so far, and the fold keeps only the LATEST
emission per (event_type, hour): no double counting, monotone
refinement.  The anomalies table is a small full rewrite per batch.
Watermarking bounds streaming state; late events beyond the watermark
are dropped (the standard trade — a batch backfill over the durable
event log corrects the hourly table).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def monitor_rates(
    spark: SparkSession,
    events_stream: DataFrame,
    out_dir: str,
    watermark: str = "2 hours",
    window_hours: int = 24,
    threshold: float = 3.0,
):
    """Start the monitoring stream; returns the StreamingQuery.
    Writes ``out_dir/hourly`` (event_type, hour_epoch, n, batch_id)
    and ``out_dir/anomalies`` (event_type, hour_epoch, n, z)."""
    from nadry_spark.operators.eventstats import rate_anomalies_from_hourly

    counts = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "n",
        )
    )
    hourly_dir = os.path.join(out_dir, "hourly")
    anomalies_dir = os.path.join(out_dir, "anomalies")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(hourly_dir)
        )
        # update-mode re-emissions refine a window's count: keep the
        # LATEST emission per (event_type, hour) — never sum them
        from pyspark.sql import Window

        wlatest = Window.partitionBy("event_type", "hour_epoch").orderBy(
            F.desc("batch_id")
        )
        hourly = (
            spark.read.parquet(hourly_dir)
            .withColumn("_rn", F.row_number().over(wlatest))
            .where(F.col("_rn") == 1)
            .select("event_type", "hour_epoch", "n")
        )
        (
            rate_anomalies_from_hourly(
                hourly, window_hours=window_hours, threshold=threshold
            )
            .write.mode("overwrite")
            .parquet(anomalies_dir)
        )

    return (
        counts.writeStream.outputMode("update")
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .foreachBatch(process_batch)
        .trigger(availableNow=True)
        .start()
    )
