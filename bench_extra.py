"""Per-query isolation harness for optimization work (guide §1).

bench.py is FROZEN (driver contract); this file carries the extra
measurements: time a SUBSET of registry queries with bench.py's exact
methodology (same session config, warmup, per-query fn(spark, SF).collect(),
min over N passes), label jobs, and optionally capture
.explain("formatted") into plans/<tag>/<name>.txt.

Usage:
  python bench_extra.py [--passes 2] [--plans plans/r06 --suffix _before] name [name ...]
  python bench_extra.py --all-heavy     # the round-6 watch list
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEAVY = [
    "pq_ann", "pq_rerank", "pq_batch", "ivfpq_ann", "ivf_ann", "ivf_batch",
    "ivf_iter1", "lsh_ann", "lsh_multi", "minhash_pairs", "dup_clusters",
    "jaccard_dups", "semdedup", "pagerank", "sparse_cosine", "lm_quality",
]


def main() -> None:
    args = sys.argv[1:]
    passes = 2
    plans_dir = None
    suffix = ""
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--passes":
            passes = int(args[i + 1]); i += 2
        elif a == "--plans":
            plans_dir = args[i + 1]; i += 2
        elif a == "--suffix":
            suffix = args[i + 1]; i += 2
        elif a == "--all-heavy":
            names += HEAVY; i += 1
        else:
            names.append(a); i += 1

    from nadry_spark.session import get_spark

    spark = get_spark(
        "nadry_bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # same steady-state warmup shape as bench.py
    from pyspark.sql import functions as F

    from nadry_spark.functions.udfs import tokenize_udf

    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    spark.range(100).select(
        tokenize_udf(F.concat(F.lit("warming tokens "), F.col("id").cast("string")))
    ).collect()
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(50)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("t"))
        .groupBy("t").count().count()
    )
    next(iter(queries.values()))(spark, SF_DIR).collect()

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for p in range(passes):
        for name in names:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:pass{p}")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            t = round(time.time() - t0, 3)
            samples.setdefault(name, []).append(t)
            if name not in timings or t < timings[name]:
                timings[name] = t
            spark.sparkContext.setJobDescription(None)

    if plans_dir:
        import contextlib
        import io

        os.makedirs(plans_dir, exist_ok=True)
        for name in names:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                queries[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())

    print(json.dumps({"sf": SF_DIR, "passes": passes, "queries": timings,
                      "samples": samples}))
    spark.stop()


if __name__ == "__main__":
    main()
