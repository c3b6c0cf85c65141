"""End-to-end training-shard export (nadry_spark/pipeline): stage
semantics against brute-force pandas oracles, the text-written-once
final shards, and manifest-based resume."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nadry_spark.pipeline.training_export import (
    ExportConfig,
    export_training_shards,
)

CFG = ExportConfig(
    lang="en",
    min_quality=0.30,
    jaccard_threshold=0.5,
    domain_cap=8,
    budget=256,
    shards=4,
)


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    """sf0.001 documents doubled (exact dups) plus light mutations
    (near dups) so every stage has something to drop."""
    import duckdb

    con = duckdb.connect()
    base = con.execute(
        "SELECT doc_id, text, lang, source FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet') ORDER BY doc_id"
    ).fetch_arrow_table()
    ids = base["doc_id"].to_pylist()
    texts = base["text"].to_pylist()
    langs = base["lang"].to_pylist()
    srcs = base["source"].to_pylist()
    n = len(ids)
    # exact duplicates: ids shifted by 100000
    # near duplicates: one appended token, ids shifted by 200000
    rows = {
        "doc_id": ids + [i + 100000 for i in ids] + [i + 200000 for i in ids[: n // 2]],
        "text": texts + texts + [t + " extra" for t in texts[: n // 2]],
        "lang": langs * 2 + langs[: n // 2],
        "source": srcs * 2 + srcs[: n // 2],
    }
    path = str(tmp_path_factory.mktemp("export_corpus") / "docs.parquet")
    pq.write_table(pa.table(rows), path)
    return path


@pytest.fixture(scope="module")
def exported(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export_out"))
    manifest = export_training_shards(
        spark, spark.read.parquet(corpus_path), out, CFG
    )
    return out, manifest


def test_stage_monotonic_and_manifest(spark, exported, corpus_path):
    out, manifest = exported
    rows = [manifest[s]["rows"] for s in ("filter", "dedup_exact", "dedup_near", "domain_cap", "pack")]
    assert all(manifest[s]["status"] == "done" for s in manifest if s != "config")
    # each stage only drops docs
    assert rows == sorted(rows, reverse=True)
    # exact dedup keeps exactly one survivor per distinct filtered text
    filtered = spark.read.parquet(os.path.join(out, "ids_filter"))
    docs = spark.read.parquet(corpus_path)
    n_distinct = (
        docs.join(filtered, "doc_id", "left_semi").select("text").distinct().count()
    )
    assert manifest["dedup_exact"]["rows"] == n_distinct
    assert n_distinct < manifest["filter"]["rows"]  # the doubled half collapsed
    # near-dup stage drops at least some of the mutated docs
    assert manifest["dedup_near"].get("near_dup_dropped", 0) > 0
    # manifest round-trips from disk
    with open(os.path.join(out, "export_manifest.json")) as f:
        assert json.load(f)["pack"]["rows"] == manifest["pack"]["rows"]


def test_final_shards_contract(spark, exported):
    out, manifest = exported
    shards = spark.read.parquet(os.path.join(out, "shards"))
    pdf = shards.toPandas()
    assert len(pdf) == manifest["pack"]["rows"]
    # no duplicate texts survive
    assert pdf["text"].nunique() == len(pdf)
    # shard assignment is doc_id % shards
    assert (pdf["doc_id"] % CFG.shards == pdf["shard"]).all()
    # no bin exceeds the budget unless it holds a single oversized doc
    g = pdf.groupby(["shard", "bin_id"]).agg(
        total=("n_tokens", "sum"), n=("n_tokens", "count")
    )
    over = g[g["total"] > CFG.budget]
    assert (over["n"] == 1).all()
    # token counts match a whitespace split of the stored text
    sample = pdf.head(50)
    assert (
        sample["text"].str.strip().str.split().str.len() == sample["n_tokens"]
    ).all()


def test_domain_cap_respected(spark, exported, corpus_path):
    out, manifest = exported
    shards = spark.read.parquet(os.path.join(out, "shards"))
    docs = spark.read.parquet(corpus_path).select("doc_id", "source")
    per_src = (
        shards.select("doc_id")
        .join(docs, "doc_id")
        .groupBy("source")
        .count()
        .toPandas()
    )
    assert (per_src["count"] <= CFG.domain_cap).all()


def test_resume_skips_done_stages(spark, exported, corpus_path):
    out, first = exported
    again = export_training_shards(
        spark, spark.read.parquet(corpus_path), out, CFG, resume=True
    )
    for s in ("filter", "dedup_exact", "dedup_near", "domain_cap", "pack"):
        assert again[s].get("resumed") is True, s
        assert again[s]["rows"] == first[s]["rows"]


def test_partial_resume_recomputes_tail(spark, exported, corpus_path, tmp_path_factory):
    """Simulate a crash after dedup_exact: only the tail stages rerun,
    and the final output matches the uninterrupted run."""
    out_full, full = exported
    out = str(tmp_path_factory.mktemp("export_partial"))
    docs = spark.read.parquet(corpus_path)
    m1 = export_training_shards(spark, docs, out, CFG)
    # wipe the manifest entries and artifacts for the tail stages
    with open(os.path.join(out, "export_manifest.json")) as f:
        man = json.load(f)
    for s in ("dedup_near", "domain_cap", "pack"):
        del man[s]
    with open(os.path.join(out, "export_manifest.json"), "w") as f:
        json.dump(man, f)
    m2 = export_training_shards(spark, docs, out, CFG)
    assert m2["filter"].get("resumed") is True
    assert m2["dedup_exact"].get("resumed") is True
    assert m2["pack"].get("resumed") is None
    assert m2["pack"]["rows"] == full["pack"]["rows"]
    got = {
        (r["shard"], r["bin_id"], r["doc_id"])
        for r in spark.read.parquet(os.path.join(out, "shards")).collect()
    }
    want = {
        (r["shard"], r["bin_id"], r["doc_id"])
        for r in spark.read.parquet(os.path.join(out_full, "shards")).collect()
    }
    assert got == want


def test_line_dedup_and_mix_stages(spark, tmp_path_factory):
    """Opt-in stages: boilerplate lines removed from packed text, mix
    bounds the corpus deterministically, resume still works."""
    rows = []
    for i in range(40):
        src = f"s{i % 4}"
        rows.append(
            (
                i,
                f"shared cookie banner\nunique article body {i} keeps going\n"
                f"shared footer text",
                "en",
                src,
            )
        )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    cfg = ExportConfig(
        lang=None,
        min_quality=0.0,
        jaccard_threshold=0.99,
        line_min_docs=2,
        mix_temp=2.0,
        mix_target=20,
        budget=256,
        shards=2,
    )
    out = str(tmp_path_factory.mktemp("export_lines_mix"))
    manifest = export_training_shards(spark, docs, out, cfg)
    assert manifest["line_dedup"]["status"] == "done"
    assert manifest["line_dedup"]["lines_kept"] < manifest["line_dedup"]["lines_total"]
    assert manifest["mix"]["status"] == "done"

    shards = spark.read.parquet(os.path.join(out, "shards"))
    texts = [r["text"] for r in shards.collect()]
    assert texts and all("cookie banner" not in t and "footer" not in t for t in texts)
    assert all(t.startswith("unique article body") for t in texts)
    # token counts reflect the CLEANED text
    for r in shards.collect():
        assert r["n_tokens"] == len(r["text"].split())

    # mix determinism + resume: a second run resumes every stage and
    # keeps the identical doc set
    again = export_training_shards(spark, docs, out, cfg)
    for s in ("filter", "line_dedup", "mix", "pack"):
        assert again[s].get("resumed") is True, s
    ids1 = {r["doc_id"] for r in shards.collect()}
    assert 0 < len(ids1) <= 40


def test_classifier_stage(spark, tmp_path_factory):
    """Opt-in NB classifier stage: docs predicted off-label drop; the
    labeled seed set trains the model."""
    import pyarrow as pa

    rows = []
    for i in range(30):
        good = i % 2 == 0
        text = ("education learning school lesson teacher " * 4
                if good else "casino jackpot betting odds spin " * 4) + f"tail{i}"
        rows.append((i, text, "en", "s0"))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    # label only a seed subset; the classifier generalizes to the rest
    seed = [(i, "edu" if i % 2 == 0 else "spam") for i in range(10)]
    labels_path = str(tmp_path_factory.mktemp("labels") / "labels.parquet")
    pq.write_table(
        pa.table({"doc_id": [d for d, _ in seed], "label": [l for _, l in seed]}),
        labels_path,
    )
    cfg = ExportConfig(
        lang=None,
        min_quality=0.0,
        jaccard_threshold=0.99,
        classifier_labels=labels_path,
        classifier_keep="edu",
        budget=256,
        shards=2,
    )
    out = str(tmp_path_factory.mktemp("export_classify"))
    manifest = export_training_shards(spark, docs, out, cfg)
    assert manifest["classify"]["status"] == "done"
    assert manifest["classify"]["rows"] == 15          # the even docs
    shards = spark.read.parquet(os.path.join(out, "shards"))
    kept = {r["doc_id"] for r in shards.select("doc_id").collect()}
    assert kept == {i for i in range(30) if i % 2 == 0}
