"""Resumable training-shard export job.

    spark-submit --py-files nadry_spark.zip jobs/export_training_shards.py \
        --docs /data/documents_parquet --out /data/shards \
        --lang en --min-quality 0.45 --budget 2048 --shards 64

Or plain ``python jobs/export_training_shards.py ...`` locally. Kill it
mid-run and rerun: finished stages (filter, exact dedup, near dedup,
domain cap, pack) are skipped via export_manifest.json; intermediate
state is survivor ID LISTS only — document text is shuffled and
written exactly once, in the final pack stage.
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
    ap.add_argument("--docs", required=True,
                    help="documents table (doc_id, text[, lang, source]): "
                         "a parquet path, parquet:<path>, or iceberg:<table>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default="en",
                    help="language gate; 'any' disables it")
    ap.add_argument("--min-quality", type=float, default=0.45)
    ap.add_argument("--min-tokens", type=int, default=1)
    ap.add_argument("--max-tokens", type=int, default=None)
    ap.add_argument("--jaccard", type=float, default=0.8,
                    help="near-dup Jaccard threshold")
    ap.add_argument("--domain-cap", type=int, default=0,
                    help="max docs per source (0 = uncapped)")
    ap.add_argument("--classifier-labels", default=None,
                    help="parquet of (doc_id, label) seed annotations; "
                         "trains an NB filter (with --classifier-keep)")
    ap.add_argument("--classifier-keep", default=None,
                    help="keep docs whose predicted label equals this")
    ap.add_argument("--line-min-docs", type=int, default=0,
                    help="drop lines occurring in >= N distinct docs "
                         "(CCNet boilerplate pass; 0 = off)")
    ap.add_argument("--mix-temp", type=float, default=0.0,
                    help="temperature for p^(1/T) domain mixing (0 = off)")
    ap.add_argument("--mix-target", type=int, default=0,
                    help="target row count for the mixed corpus")
    ap.add_argument("--budget", type=int, default=2048,
                    help="tokens per packed training bin")
    ap.add_argument("--shards", type=int, default=16)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from nadry_spark.pipeline.training_export import (
        ExportConfig,
        export_training_shards,
    )
    from nadry_spark.session import get_spark
    from nadry_spark.sources.catalog import read_table

    spark = get_spark("nadry_export_shards", master=args.master)
    t0 = time.time()
    docs = read_table(spark, args.docs)
    cfg = ExportConfig(
        lang=None if args.lang == "any" else args.lang,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        jaccard_threshold=args.jaccard,
        domain_cap=args.domain_cap,
        classifier_labels=args.classifier_labels,
        classifier_keep=args.classifier_keep,
        line_min_docs=args.line_min_docs,
        mix_temp=args.mix_temp,
        mix_target=args.mix_target,
        budget=args.budget,
        shards=args.shards,
    )
    manifest = export_training_shards(
        spark, docs, args.out, cfg, resume=not args.no_resume
    )
    stages = {k: v for k, v in manifest.items() if k != "config"}
    print(
        json.dumps(
            {
                "event": "export_done",
                "out": args.out,
                "elapsed_sec": round(time.time() - t0, 2),
                "stages": stages,
            },
            sort_keys=True,
        )
    )


if __name__ == "__main__":
    main()
