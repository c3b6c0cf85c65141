"""Index-build correctness vs the pure-Python oracle (SURVEY.md §5 item 3)."""

import pyarrow.parquet as pq
import pytest

from tests.oracle import oracle_index


@pytest.fixture(scope="module")
def built(spark, tiny_pages_path):
    from nadry_spark.operators.index_build import build_index

    pages = spark.read.parquet(tiny_pages_path)
    postings_df, docstats_df = build_index(pages)
    postings = {
        (r["term"], r["doc_id"]): r.asDict() for r in postings_df.collect()
    }
    docstats = {r["doc_id"]: r.asDict() for r in docstats_df.collect()}
    raw = pq.read_table(tiny_pages_path).to_pylist()
    o_postings, o_docs = oracle_index(
        [(r["html"].decode("utf-8"), r["url"]) for r in raw]
    )
    return postings, docstats, o_postings, o_docs


def test_pages_text_invariant(tiny_pages_path):
    """The per-url invariant: re-extracting html reproduces text byte-identically."""
    from nadry_spark.functions.htmlextract import process_document

    raw = pq.read_table(tiny_pages_path).to_pylist()
    assert len(raw) == 40
    for r in raw:
        doc = process_document(r["html"].decode("utf-8"), r["url"])
        assert doc["content"] == r["text"], r["url"]


def test_same_posting_keys(built):
    postings, _, o_postings, _ = built
    assert set(postings.keys()) == set(o_postings.keys())
    assert len(postings) > 100


def test_positions_tf_weight_match(built):
    postings, _, o_postings, _ = built
    for key, op in o_postings.items():
        sp = postings[key]
        assert sp["positions_title"] == sorted(op["positions"]["title"]), key
        assert sp["positions_desc"] == sorted(op["positions"]["description"]), key
        assert sp["positions_body"] == sorted(op["positions"]["body"]), key
        assert sp["tf"] == op["tf"], key
        assert sp["weight"] == pytest.approx(op["weight"]), key
        assert sp["url"] == op["url"], key


def test_doc_stats_match(built):
    _, docstats, _, o_docs = built
    assert set(docstats.keys()) == set(o_docs.keys())
    for doc_id, od in o_docs.items():
        sd = docstats[doc_id]
        assert sd["total_words"] == od["total_words"], doc_id
        assert sd["title"] == od["title"]
        assert sd["description"] == od["description"]
        assert sd["content"] == od["content"]
        assert sorted(sd["links"]) == sorted(od["links"])
        assert sd["popularity_score"] == 0.0


def test_special_tokens_present(built):
    postings, _, _, _ = built
    terms = {t for t, _ in postings.keys()}
    assert any(t.startswith("email:") for t in terms)
    assert any(t.startswith("url:") for t in terms)
    assert any(t.startswith("num:") for t in terms)
    # stopwords must not be indexed
    from nadry_spark.functions.stopwords import STOP_WORDS

    assert not (terms & STOP_WORDS)


def test_distributed_generator_matches_driver(spark, tiny_pages_path):
    """pages_dataframe (mapInPandas path) == generate_pages_parquet rows."""
    from nadry_spark.sources.pages import pages_dataframe

    dist = {r["url"]: r for r in pages_dataframe(spark, 40, seed=42).collect()}
    raw = pq.read_table(tiny_pages_path).to_pylist()
    assert len(dist) == len(raw) == 40
    for r in raw:
        d = dist[r["url"]]
        assert bytes(d["html"]) == r["html"]
        assert d["text"] == r["text"]
        assert d["lang"] == r["lang"]


def test_derive_n_shards_bounds():
    """Shard count caps docs/shard (worker memory bound at scale) and
    floors at cluster parallelism (small corpora still use every core)."""
    import math

    from nadry_spark.sources.segments import MAX_DOCS_PER_SHARD, derive_n_shards

    assert derive_n_shards(100, 32) == 32
    assert derive_n_shards(120_000, 32) == 32  # parallelism floor dominates
    big = 10_000_000
    assert derive_n_shards(big, 32) == math.ceil(big / MAX_DOCS_PER_SHARD)
    # the 10^12-doc regime: shard_size stays bounded, shards scale linearly
    assert derive_n_shards(big * 100, 32) == math.ceil(big * 100 / MAX_DOCS_PER_SHARD)


def test_catalog_read_table_schemes(spark, tiny_pages_path):
    """parquet path + parquet: scheme read; iceberg: scheme either reads
    (jar present) or fails with an actionable error (this sandbox)."""
    import pytest

    from nadry_spark.sources.catalog import iceberg_available, read_table

    bare = read_table(spark, tiny_pages_path)
    assert bare.count() == 40
    assert read_table(spark, "parquet:" + tiny_pages_path).columns == bare.columns
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg"):
            read_table(spark, "iceberg:main.db.pages")
