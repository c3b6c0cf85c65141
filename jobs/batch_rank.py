"""Batch ranking job — a whole queryset against built segments in ONE
Spark job (operators/bm25.bm25_queryset_topk): the LTR-training /
eval-harness / hard-negative-mining entry point.

    python jobs/batch_rank.py --segments /data/segments \
        --queries queries.tsv --out /data/rankings [--k 10] [--mode and]

``--queries`` is a TSV of (query_id <TAB> query text) — or a parquet
path with (query_id, query) columns.  Output is parquet
(query_id, doc_id, url, doc_no, score) with <= k rows per query,
plus one JSON summary line on stdout.

Per-query semantics are exactly the serving path's
(bm25_topk(mode="taat") — tokenize, drop unknown terms, conjunctive
empty-on-missing, score desc / doc_no asc ties); only the job shape
changes: one blocks scan pruned to the union of all query terms, each
posting block decoded once per shard (measured 13.5x faster than 24
sequential serving calls on the bench index — BENCH/R05_NOTES.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_queries(path: str, spark) -> dict[int, str]:
    if path.endswith(".parquet") or os.path.isdir(path):
        rows = spark.read.parquet(path).select("query_id", "query").collect()
        return {int(r["query_id"]): r["query"] for r in rows}
    out: dict[int, str] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, text = line.split("\t", 1)
            out[int(qid)] = text
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True)
    ap.add_argument("--queries", required=True,
                    help="TSV (query_id\\tquery) or parquet with (query_id, query)")
    ap.add_argument("--out", required=True, help="output parquet dir")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=["or", "and"], default="or")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    from nadry_spark.operators.bm25 import bm25_queryset_topk
    from nadry_spark.session import get_spark
    from nadry_spark.sources.segments import SegmentIndex

    spark = get_spark("batch_rank", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    queries = load_queries(args.queries, spark)
    idx = SegmentIndex(spark, args.segments).warm()
    t0 = time.time()
    out = bm25_queryset_topk(idx, queries, k=args.k,
                             conjunctive=args.mode == "and")
    out.write.mode("overwrite").parquet(args.out)
    wrote = spark.read.parquet(args.out)
    n_rows = wrote.count()
    n_q = wrote.select("query_id").distinct().count()
    print(json.dumps({
        "queries_in": len(queries),
        "queries_with_results": n_q,
        "rows": n_rows,
        "k": args.k,
        "mode": args.mode,
        "sec": round(time.time() - t0, 3),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
