"""Isolated serving-latency probe for A/B runs between two checkouts.

Times ONLY the serving rows (warm index, p50 loops identical to
bench.py's serving section) against the segments already built under
the bench cache — so two trees can be compared back-to-back under the
same machine conditions without paying the full suite. Run with
cwd = the tree to measure:

    cd <tree> && python bench/serving_ab.py [reps]

Prints one JSON line. Not part of the frozen bench contract.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/nadry_bench_cache")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = 10000
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

from nadry_spark.session import get_spark  # noqa: E402

spark = get_spark("serving_ab", master=f"local[{CPUS}]", shuffle_partitions=CPUS * 2)

from pyspark.sql import functions as F  # noqa: E402

from nadry_spark.operators.bm25 import bm25_topk  # noqa: E402
from nadry_spark.operators.phrase import phrase_search  # noqa: E402
from nadry_spark.sources.segments import SegmentIndex  # noqa: E402

seg_dir = os.path.join(CACHE_ROOT, f"segments_{N_PAGES}_cpu{CPUS}")
coarse_dir = os.path.join(CACHE_ROOT, f"segments_coarse_{N_PAGES}")

out: dict[str, float] = {}
t0 = time.time()
idx = SegmentIndex(spark, seg_dir).warm()
out["warm_s"] = round(time.time() - t0, 3)

queries = ["news report update", "table batch value sort", "news 2024"]
bm25_topk(idx, queries[0], k=10, mode="taat").collect()  # warmup
for mode in ("taat", "bmw"):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        for q in queries:
            bm25_topk(idx, q, k=10, mode=mode).collect()
        t = (time.time() - t0) / len(queries)
        best = t if best is None else min(best, t)
    out[f"bm25_{mode}_p50"] = round(best, 3)

phrase_search(idx, "news report", k=10).collect()  # warm
best = None
for _ in range(REPS):
    t0 = time.time()
    phrase_search(idx, "news report", k=10).collect()
    best = min(best or 9e9, time.time() - t0)
out["phrase_search"] = round(best, 3)

highdf = [
    r["term"]
    for r in idx.terms.where(~F.col("term").contains(":"))
    .orderBy(F.desc("df"), "term").limit(3).collect()
]
cidx = SegmentIndex(spark, coarse_dir).warm()
rare = [
    r["term"]
    for r in cidx.terms.where(~F.col("term").contains(":") & (F.col("df") >= 3))
    .orderBy("df", "term").limit(1).collect()
]
conj = rare + highdf[:2]
bm25_topk(cidx, "", k=10, mode="bmw", tokens=conj, conjunctive=True).collect()
for mode in ("taat", "bmw"):
    best = None
    for _ in range(REPS):
        t0 = time.time()
        bm25_topk(cidx, "", k=10, mode=mode, tokens=conj, conjunctive=True).collect()
        best = min(best or 9e9, time.time() - t0)
    out[f"bm25_{mode}_conj_coarse_p50"] = round(best, 3)

print(json.dumps(out))
spark.stop()
