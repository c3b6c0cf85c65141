"""PageRank job: reads a built segment dir — or an incremental
multi-segment serving root (auto-detected via serving_state.json) —
computes reference-exact PageRank over the GLOBAL doc link graph and
writes popularity back into each segment's docmap.

    python jobs/pagerank.py --segments /data/segments
    python jobs/pagerank.py --segments /data/serving_root
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument(
        "--check-every", type=int, default=1,
        help="convergence-poll cadence (iterations per driver action); "
        "1 (default) = reference-exact per-iteration stopping; >1 cuts "
        "driver actions ~k x but can stop at a different iteration "
        "than the reference (the k-step L1 delta is usually, not "
        "provably, larger than the per-iteration delta)",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from nadry_spark.operators.pagerank import apply_pagerank, pagerank
    from nadry_spark.session import get_spark

    spark = get_spark("nadry_pagerank", master=args.master)
    t0 = time.time()

    state_path = os.path.join(args.segments, "serving_state.json")
    if os.path.exists(state_path):
        # multi-segment family: rank over the GLOBAL live link graph
        # (tombstoned re-crawls excluded), then back-fill each
        # segment's docmap with its slice of the scores
        with open(state_path) as f:
            seg_dirs = [
                os.path.join(args.segments, n) for n in json.load(f)["segments"]
            ]
        from nadry_spark.sources.segments import MultiSegmentIndex

        msi = MultiSegmentIndex(spark, seg_dirs)
        parts = []
        for i, seg in enumerate(msi.segments):
            part = msi._live(
                i,
                seg.docmap.select("doc_no", "url").join(
                    seg.docs_content.select("doc_no", "links"), "doc_no"
                ),
            )
            parts.append(part.select("url", "links"))
        graph = parts[0]
        for p in parts[1:]:
            graph = graph.unionByName(p)
        ranks = pagerank(
            graph, damping=args.damping, tol=args.tol,
            max_iter=args.max_iter, check_every=args.check_every,
        ).localCheckpoint()
        targets = [(s.path, s.docmap) for s in msi.segments]
    else:
        seg_dirs = [args.segments]
        docmap = spark.read.parquet(os.path.join(args.segments, "docmap"))
        content = spark.read.parquet(os.path.join(args.segments, "docs_content"))
        docs = docmap.select("doc_no", "url").join(
            content.select("doc_no", "links"), "doc_no"
        )
        ranks = pagerank(
            docs.select("url", "links"),
            damping=args.damping,
            tol=args.tol,
            max_iter=args.max_iter,
            check_every=args.check_every,
        )
        targets = [(args.segments, docmap)]

    import shutil

    for seg_dir, docmap in targets:
        updated = apply_pagerank(docmap, ranks)
        tmp = os.path.join(seg_dir, "docmap_new")
        updated.repartitionByRange(4, "doc_no").write.mode("overwrite").parquet(tmp)
        # atomic-ish swap
        final = os.path.join(seg_dir, "docmap")
        bak = os.path.join(seg_dir, "docmap_old")
        if os.path.exists(bak):
            shutil.rmtree(bak)
        os.replace(final, bak)
        os.replace(tmp, final)

    n_ranked = ranks.count()
    print(
        json.dumps(
            {
                "event": "pagerank_done",
                "n_ranked": n_ranked,
                "elapsed_sec": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
