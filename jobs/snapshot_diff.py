"""Snapshot CDC job: what changed between two commit points of the
incremental serving family.

    python jobs/snapshot_diff.py --segments /data/serving --from-snap 1
    python jobs/snapshot_diff.py --segments /data/serving \
        --from-snap 1 --to-snap 2 --out /data/diff_1_2 \
        --content-out /data/changed_docs

Prints one JSON line with per-change counts. ``--out`` writes the flat
``(doc_id, url, change)`` diff as parquet; ``--content-out``
additionally writes ``(doc_id, url, title, content, change)`` for the
added+updated docs — the incremental feed for
``jobs/export_training_shards.py``, so a recurring corpus export
processes O(changes) instead of re-reading the whole corpus.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True, help="serving family root")
    ap.add_argument("--from-snap", type=int, required=True, metavar="ID")
    ap.add_argument("--to-snap", type=int, default=None, metavar="ID",
                    help="default: the CURRENT serving state")
    ap.add_argument("--out", default=None,
                    help="write the (doc_id, url, change) diff as parquet")
    ap.add_argument("--content-out", default=None,
                    help="write added+updated docs WITH content as parquet "
                         "(the incremental export feed)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nadry_spark.session import get_spark
    from nadry_spark.streaming.ingest import open_serving_index
    from nadry_spark.streaming.snapshots import open_snapshot, snapshot_diff

    spark = get_spark("nadry_snapshot_diff", master=args.master)
    diff = snapshot_diff(spark, args.segments, args.from_snap, args.to_snap)
    if args.out:
        diff.write.mode("overwrite").parquet(args.out)
        diff = spark.read.parquet(args.out)  # count from the written data
    counts = {r["change"]: r["n"] for r in
              diff.groupBy("change").agg(F.count("*").alias("n")).collect()}
    result = {"from": args.from_snap, "to": args.to_snap,
              "added": counts.get("added", 0),
              "removed": counts.get("removed", 0),
              "updated": counts.get("updated", 0)}
    if args.content_out:
        if args.to_snap is None:
            to_idx = open_serving_index(spark, args.segments)
        else:
            to_idx = open_snapshot(spark, args.segments, args.to_snap)
        changed = diff.where(F.col("change") != "removed")
        feed = (
            to_idx.content_for(changed.select("doc_id"))
            .join(changed, "doc_id")
            .select("doc_id", "url", "title", "content", "change")
        )
        feed.write.mode("overwrite").parquet(args.content_out)
        result["content_rows"] = spark.read.parquet(args.content_out).count()
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
