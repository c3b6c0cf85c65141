"""Corpus profile job: one JSON line of know-your-data stats
(sizes, token distribution, language mix, quality, dup rate, domain
concentration) before anything trains on a corpus.

    python jobs/corpus_stats.py --docs /root/testdata/sf0.01/documents.parquet
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
                    help="documents source (parquet path or catalog scheme)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from nadry_spark.pipeline.profile import corpus_profile
    from nadry_spark.session import get_spark
    from nadry_spark.sources.catalog import read_table

    spark = get_spark("nadry_corpus_stats", master=args.master)
    t0 = time.time()
    report = corpus_profile(read_table(spark, args.docs))
    report["event"] = "corpus_stats"
    report["elapsed_sec"] = round(time.time() - t0, 2)
    print(json.dumps(report, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
