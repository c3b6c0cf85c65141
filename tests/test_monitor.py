"""Streaming rate monitor (streaming/monitor): the stream-scored
anomalies must equal the batch rate_anomalies over the same events,
across multiple micro-batches."""

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq


def _events(start_eid, hours, spike_hour=None):
    t0 = datetime(2024, 1, 1)
    rows = []
    eid = start_eid
    for h in hours:
        n = 50 if h == spike_hour else (6 if h == 3 else 5)
        for j in range(n):
            rows.append(
                (eid, t0 + timedelta(hours=h, minutes=j % 60), eid % 7, "view",
                 1.0, "{}")
            )
            eid += 1
    return rows, eid


def test_monitor_matches_batch(spark, tmp_path_factory):
    from nadry_spark.operators.eventstats import rate_anomalies
    from nadry_spark.streaming.monitor import EVENTS_SCHEMA, monitor_rates

    in_dir = str(tmp_path_factory.mktemp("monitor_in"))
    out = str(tmp_path_factory.mktemp("monitor_out"))
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write_chunk(rows, name):
        pq.write_table(
            pa.table({c: [r[i] for r in rows] for i, c in enumerate(cols)}),
            os.path.join(in_dir, name),
        )

    rows1, eid = _events(0, range(0, 8))
    write_chunk(rows1, "part1.parquet")

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir)
    q = monitor_rates(spark, stream, out, threshold=3.0)
    q.awaitTermination(120)

    # second backlog: more steady hours plus the spike
    rows2, _ = _events(eid, range(8, 11), spike_hour=10)
    write_chunk(rows2, "part2.parquet")
    q2 = monitor_rates(spark, spark.readStream.schema(EVENTS_SCHEMA).parquet(in_dir), out)
    q2.awaitTermination(120)

    batch = spark.createDataFrame(rows1 + rows2, EVENTS_SCHEMA)
    want = {
        (r["event_type"], r["hour_epoch"]): (r["n"], r["z"])
        for r in rate_anomalies(batch, threshold=3.0).collect()
    }
    got = {
        (r["event_type"], r["hour_epoch"]): (r["n"], r["z"])
        for r in spark.read.parquet(os.path.join(out, "anomalies")).collect()
    }
    assert got == want and want  # the spike hour is flagged identically
