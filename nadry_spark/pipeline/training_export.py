"""End-to-end training-shard export: the composed corpus pipeline a
100 TB pretraining run needs, built entirely from the engine's own
operators and resumable per stage.

    documents (doc_id, text[, lang, source])
      -> filter      language-ID + heuristic quality + token bounds
      -> dedup_exact keep min-id per identical text
      -> dedup_near  MinHash-LSH pairs -> connected components ->
                     keep the min-id member per duplicate cluster
      -> domain_cap  at most N docs per source, longest first
      -> pack        next-fit sequence packing into token-budget bins,
                     final shards written ONCE with the text attached

Scale design: every intermediate stage persists only its SURVIVOR ID
LIST (a few bytes per doc) plus a manifest entry with row counts and
timings — the full text column crosses the shuffle exactly once, in
the final pack/write. A killed run resumes at the first unfinished
stage by reading the previous stage's id list; nothing upstream is
recomputed (per-stage lineage + metrics, the north-rule checkpoint
contract, same manifest discipline as sources/segments.py).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

STAGES = (
    "filter",
    "classify",
    "dedup_exact",
    "dedup_near",
    "domain_cap",
    "line_dedup",
    "mix",
    "pack",
)


@dataclass
class ExportConfig:
    lang: str | None = "en"  # None disables the language gate
    min_quality: float = 0.45
    min_tokens: int = 1
    max_tokens: int | None = None
    jaccard_threshold: float = 0.8
    shingle_n: int = 3
    n_hashes: int = 16
    bands: int = 4
    cc_iterations: int = 8
    domain_cap: int = 0  # 0 disables the per-source cap
    classifier_labels: str | None = None  # parquet (doc_id, label); None disables
    classifier_keep: str | None = None  # label whose argmax docs survive
    classifier_alpha: float = 1.0
    line_min_docs: int = 0  # 0 disables line-level boilerplate dedup
    line_sep: str = "\n"
    mix_temp: float = 0.0  # 0 disables temperature mixing
    mix_target: int = 0
    mix_salt: str = "mix"
    budget: int = 2048
    shards: int = 16
    extra: dict = field(default_factory=dict)

    def to_json(self) -> dict:
        d = dict(self.__dict__)
        d.pop("extra", None)
        return d


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "export_manifest.json")


def _load_manifest(out_dir: str) -> dict:
    try:
        with open(_manifest_path(out_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


def _ids_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, f"ids_{stage}")


def _write_ids(df: DataFrame, path: str) -> int:
    df.select(F.col("doc_id").cast("long")).write.mode("overwrite").parquet(path)
    # count from the written files so the recorded metric is the
    # durable artifact, not a recomputation of the lineage
    return df.sparkSession.read.parquet(path).count()


def _stage_filter(docs: DataFrame, cfg: ExportConfig) -> DataFrame:
    # ONE pass: lang/quality/token-count are 1:1 per-doc predicates, so
    # they fuse into a single projection + conjunctive filter — the
    # per-predicate frames + left-semi joins re-scanned the text three
    # times and shuffled twice for the same survivor set. Column forms
    # are the operators' own expressions (lang_pred_col /
    # quality_score_col), so the kept set is identical.
    from nadry_spark.operators.textstats import lang_pred_col, quality_score_col

    # NOT spread_small_scan'd: A/B measured the doc-row exchange
    # costing more than the parallelism bought here (warm filter stage
    # 1.15 s fused vs 1.42 s fused+spread on the doubled bench corpus)
    base = docs.select("doc_id", "text")
    flt = base.select(
        "doc_id",
        lang_pred_col("text").alias("_lang"),
        quality_score_col("text").alias("_q"),
        F.size(F.split(F.trim("text"), r"\s+")).alias("_ntok"),
    )
    cond = (F.col("_q") >= cfg.min_quality) & (F.col("_ntok") >= cfg.min_tokens)
    if cfg.lang is not None:
        cond = cond & (F.col("_lang") == cfg.lang)
    if cfg.max_tokens is not None:
        cond = cond & (F.col("_ntok") <= cfg.max_tokens)
    return flt.where(cond).select("doc_id")


def _stage_classify(live: DataFrame, cfg: ExportConfig, stats: dict) -> DataFrame:
    """FineWeb-Edu-style model filter: train multinomial NB on the
    labeled subset (a small curated/LLM-annotated doc set), score
    every live doc, keep the docs whose argmax label is
    `classifier_keep`. Disabled unless both config knobs are set."""
    if not cfg.classifier_labels or cfg.classifier_keep is None:
        return live.select("doc_id")
    from nadry_spark.operators.classify import nb_score, nb_train

    labels = live.sparkSession.read.parquet(cfg.classifier_labels)
    tf = (
        live.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .where((F.length("term") >= 2) & (F.length("term") <= 50))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    labeled_tf = tf.join(labels.select("doc_id"), "doc_id", "left_semi")
    model = nb_train(labeled_tf, labels, alpha=cfg.classifier_alpha)
    scored = nb_score(tf, model)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("label"))
    pred = (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("doc_id", "label")
    )
    kept = pred.where(F.col("label") == cfg.classifier_keep).select("doc_id")
    stats["classifier_kept_label"] = cfg.classifier_keep
    return kept


def _stage_dedup_exact(live: DataFrame, cfg: ExportConfig) -> DataFrame:
    from nadry_spark.operators.dedup import exact_dedup

    return exact_dedup(live.select("doc_id", "text"), "doc_id", "text").select("doc_id")


def _stage_dedup_near(live: DataFrame, cfg: ExportConfig, stats: dict) -> DataFrame:
    from nadry_spark.operators.components import connected_components
    from nadry_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(
        live.select("doc_id", "text"),
        "doc_id",
        "text",
        shingle_n=cfg.shingle_n,
        n_hashes=cfg.n_hashes,
        bands=cfg.bands,
        threshold=cfg.jaccard_threshold,
        stats=stats,
    )
    labels = connected_components(
        pairs.select("id_a", "id_b"),
        src="id_a",
        dst="id_b",
        iterations=cfg.cc_iterations,
    )
    # min-label propagation converges to component = min doc_id in the
    # cluster; keep exactly that member, drop the rest.  Docs in no
    # pair never enter `labels` and are kept by the anti join.
    drop = labels.where(F.col("v") != F.col("component")).select(
        F.col("v").alias("doc_id")
    )
    stats["near_dup_dropped"] = drop.count()
    return live.select("doc_id").join(drop, "doc_id", "left_anti")


def _stage_domain_cap(live: DataFrame, cfg: ExportConfig) -> DataFrame:
    if cfg.domain_cap <= 0 or "source" not in live.columns:
        return live.select("doc_id")
    ranked = live.select(
        "doc_id",
        "source",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.desc(F.length("text")), F.asc("doc_id")))
        .alias("_rk"),
    )
    return ranked.where(F.col("_rk") <= cfg.domain_cap).select("doc_id")


def _lines_kept_path(out_dir: str) -> str:
    return os.path.join(out_dir, "lines_kept")


def _stage_line_dedup(
    live: DataFrame, cfg: ExportConfig, out_dir: str, stats: dict
) -> DataFrame:
    """CCNet-style boilerplate pass: persist the kept (doc_id,
    line_no) pairs (the one stage whose survivors are finer-grained
    than a doc id — pack rebuilds the cleaned text from them) and
    keep only docs with at least one surviving line."""
    from nadry_spark.operators.linededup import dedup_lines, split_lines

    if cfg.line_min_docs <= 0:
        return live.select("doc_id")
    lines = split_lines(live.select("doc_id", "text"), sep=cfg.line_sep)
    kept = dedup_lines(lines, min_docs=cfg.line_min_docs)
    kept.select("doc_id", "line_no").write.mode("overwrite").parquet(
        _lines_kept_path(out_dir)
    )
    written = live.sparkSession.read.parquet(_lines_kept_path(out_dir))
    stats["lines_kept"] = written.count()
    stats["lines_total"] = lines.count()
    return written.select("doc_id").distinct()


def _stage_mix(live: DataFrame, cfg: ExportConfig, stats: dict) -> DataFrame:
    from nadry_spark.operators.sampling import temperature_mix

    if cfg.mix_temp <= 0 or cfg.mix_target <= 0 or "source" not in live.columns:
        return live.select("doc_id")
    kept = temperature_mix(
        live.select("doc_id", "source"),
        "source",
        "doc_id",
        temp=cfg.mix_temp,
        target_rows=cfg.mix_target,
        salt=cfg.mix_salt,
    ).select("doc_id")
    return kept


def _rebuild_line_deduped_text(
    live: DataFrame, cfg: ExportConfig, out_dir: str
) -> DataFrame:
    """(doc_id, text) with only the lines the line_dedup stage kept,
    rejoined in original order."""
    from nadry_spark.operators.linededup import split_lines

    kept = live.sparkSession.read.parquet(_lines_kept_path(out_dir))
    lines = split_lines(live.select("doc_id", "text"), sep=cfg.line_sep).join(
        kept, ["doc_id", "line_no"], "left_semi"
    )
    return lines.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("line_no", "line"))),
                lambda x: x["line"],
            ),
            cfg.line_sep,
        ).alias("text")
    )


def _stage_pack(live: DataFrame, cfg: ExportConfig, out_dir: str, stats: dict) -> int:
    from nadry_spark.operators.packing import bin_stats, pack_next_fit

    if cfg.line_min_docs > 0 and os.path.isdir(_lines_kept_path(out_dir)):
        live = _rebuild_line_deduped_text(live, cfg, out_dir)
    with_tokens = live.select(
        "doc_id",
        "text",
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    packed = pack_next_fit(
        with_tokens, budget=cfg.budget, shards=cfg.shards, tokens_col="n_tokens"
    )
    final = packed.join(with_tokens.select("doc_id", "text"), "doc_id").select(
        "shard", "bin_id", "doc_id", "n_tokens", "text"
    )
    shards_dir = os.path.join(out_dir, "shards")
    final.write.mode("overwrite").partitionBy("shard").parquet(shards_dir)
    written = live.sparkSession.read.parquet(shards_dir)
    bs = bin_stats(
        written.select("shard", "bin_id", "doc_id", "n_tokens"),
        cfg.budget,
    ).agg(
        F.count("*").alias("n_bins"),
        F.round(F.avg("utilization"), 4).alias("avg_fill"),
        F.max("total_tokens").alias("max_bin_tokens"),
    ).collect()[0]
    stats["n_bins"] = int(bs["n_bins"])
    stats["avg_fill"] = float(bs["avg_fill"])
    stats["max_bin_tokens"] = int(bs["max_bin_tokens"])
    return written.count()


def export_training_shards(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: ExportConfig | None = None,
    *,
    resume: bool = True,
) -> dict:
    """Run the five-stage export; returns the manifest (stage ->
    {status, rows, elapsed_sec, ...}).  ``resume=True`` skips stages
    whose id list (or final shard dir) is already recorded done."""
    cfg = cfg or ExportConfig()
    os.makedirs(out_dir, exist_ok=True)
    manifest = _load_manifest(out_dir) if resume else {}
    manifest["config"] = cfg.to_json()

    def docs_for(ids: DataFrame | None) -> DataFrame:
        return docs if ids is None else docs.join(ids, "doc_id", "left_semi")

    prev_ids: DataFrame | None = None
    for stage in STAGES:
        entry = manifest.get(stage) or {}
        path = _ids_path(out_dir, stage)
        if (
            resume
            and entry.get("status") == "done"
            and os.path.isdir(path if stage != "pack" else os.path.join(out_dir, "shards"))
        ):
            entry["resumed"] = True
            if stage != "pack":
                prev_ids = spark.read.parquet(path)
            continue
        t0 = time.time()
        stats: dict = {}
        if stage == "filter":
            ids = _stage_filter(docs, cfg)
        elif stage == "classify":
            ids = _stage_classify(docs_for(prev_ids), cfg, stats)
        elif stage == "dedup_exact":
            ids = _stage_dedup_exact(docs_for(prev_ids), cfg)
        elif stage == "dedup_near":
            ids = _stage_dedup_near(docs_for(prev_ids), cfg, stats)
        elif stage == "domain_cap":
            ids = _stage_domain_cap(docs_for(prev_ids), cfg)
        elif stage == "line_dedup":
            ids = _stage_line_dedup(docs_for(prev_ids), cfg, out_dir, stats)
        elif stage == "mix":
            ids = _stage_mix(docs_for(prev_ids), cfg, stats)
        else:  # pack
            rows = _stage_pack(docs_for(prev_ids), cfg, out_dir, stats)
            manifest[stage] = {
                "status": "done",
                "rows": rows,
                "elapsed_sec": round(time.time() - t0, 2),
                **stats,
            }
            _save_manifest(out_dir, manifest)
            continue
        rows = _write_ids(ids, path)
        manifest[stage] = {
            "status": "done",
            "rows": rows,
            "elapsed_sec": round(time.time() - t0, 2),
            **stats,
        }
        _save_manifest(out_dir, manifest)
        prev_ids = spark.read.parquet(path)
    return manifest
