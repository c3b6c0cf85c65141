"""Corpus profile — the "know your data" report every ingest should
emit before anyone trains on it: sizes, token counts, language mix,
quality distribution, duplication rate, domain concentration. One
pass-bounded job producing one JSON-able dict (jobs/corpus_stats.py),
composed entirely from the engine's own operators so the numbers
match what the pipeline stages will actually do.

Scale: everything is an aggregation — the only non-trivial pieces
ride the engine's sketches (KMV distinct tokens) and the exact
rank-based quantiles (one sort-free window per metric via
percent-bound row_number). No driver-side data beyond the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_profile(docs: DataFrame, top_sources: int = 5) -> dict:
    """dict report over (doc_id, text[, lang, source]) rows."""
    from nadry_spark.operators.dedup import exact_dedup
    from nadry_spark.operators.sketches import kmv_distinct_estimate
    from nadry_spark.operators.textstats import quality_score

    cols = docs.columns
    toks = docs.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: F.length(w) > 0)
        ).alias("n_tokens"),
    )
    base = toks.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("n_tokens"), 3).alias("mean_doc_tokens"),
    ).collect()[0]
    out = {
        "n_docs": int(base["n_docs"]),
        "n_tokens": int(base["n_tokens"]),
        "mean_doc_tokens": float(base["mean_doc_tokens"]),
    }

    # exact rank-based token-count quantiles (p25/p50/p90 discrete
    # defn) — rank window, only the three quantile ROWS come back
    n = out["n_docs"]
    if n:
        from pyspark.sql import Window

        positions = {
            p: max(1, (n * p + 99) // 100) for p in (25, 50, 90)
        }
        w = Window.orderBy("n_tokens", "doc_id")
        hits = {
            r["rn"]: r["n_tokens"]
            for r in toks.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn").isin(list(set(positions.values()))))
            .collect()
        }
        for p, pos in positions.items():
            out[f"doc_tokens_p{p}"] = int(hits[pos])

    est = kmv_distinct_estimate(
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")).where(
            F.length("tok") > 0
        ),
        "tok",
    ).collect()[0]
    out["distinct_tokens_est"] = float(est["est_distinct"])
    out["distinct_tokens_exact"] = int(est["exact_distinct"])

    survivors = exact_dedup(docs.select("doc_id", "text"), "doc_id", "text").count()
    out["exact_dup_rate"] = round(1.0 - survivors / n, 6) if n else 0.0

    q = quality_score(docs, "doc_id", "text")
    qrow = q.agg(
        F.round(F.avg("quality"), 6).alias("mean"),
        F.round(F.min("quality"), 6).alias("min"),
    ).collect()[0]
    out["quality_mean"] = float(qrow["mean"])
    out["quality_min"] = float(qrow["min"])

    if "lang" in cols:
        out["lang_mix"] = {
            r["lang"]: int(r["count"])
            for r in docs.groupBy("lang").count().collect()
        }
    if "source" in cols:
        top = (
            docs.groupBy("source")
            .count()
            .orderBy(F.desc("count"), F.asc("source"))
            .limit(top_sources)
            .collect()
        )
        out["top_sources"] = {r["source"]: int(r["count"]) for r in top}
        out["source_concentration_top5"] = (
            round(sum(r["count"] for r in top) / n, 6) if n else 0.0
        )
    return out
