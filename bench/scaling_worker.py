"""spark-submit worker for bench/scaling.py — one leg of the
two-parallelism scaling measurement.

Run via ``spark-submit --master local[N] --py-files nadry_spark.zip
bench/scaling_worker.py N PAGES CORPUS``: the nadry_spark import comes
from the --py-files zip (the north-rule packaging path for a
multi-executor cluster), NOT from a repo-path hack, so this is the
same launch shape a real cluster submit would use.
"""

import json
import shutil
import sys
import time


def main() -> None:
    cpus = int(sys.argv[1])
    n_pages = int(sys.argv[2])  # noqa: F841 — recorded in the result line
    corpus = sys.argv[3]

    from nadry_spark.operators.bm25 import bm25_topk
    from nadry_spark.session import get_spark
    from nadry_spark.sources.segments import SegmentIndex, build_segments

    spark = get_spark("scaling", master=f"local[{cpus}]", shuffle_partitions=cpus)
    pages = spark.read.parquet(corpus)
    seg_dir = f"/tmp/nadry_scaling_seg_{cpus}"
    shutil.rmtree(seg_dir, ignore_errors=True)
    t0 = time.time()
    meta = build_segments(spark, pages, seg_dir, n_shards=32, shards_per_job=32)
    build_sec = time.time() - t0

    idx = SegmentIndex(spark, seg_dir)
    queries = [
        "news report update", "table batch value sort", "news 2024",
        "small filter merge", "report table news batch",
    ]
    bm25_topk(idx, queries[0], k=10).collect()  # warm
    t0 = time.time()
    for q in queries:
        bm25_topk(idx, q, k=10, mode="taat").collect()
    query_sec = (time.time() - t0) / len(queries)
    print(
        "RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "n_docs": meta["n_docs"],
                "build_sec": round(build_sec, 2),
                "docs_per_sec": round(meta["n_docs"] / build_sec, 1),
                "bm25_p50_sec": round(query_sec, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
