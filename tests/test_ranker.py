"""Rank-identity tests: Spark exact ranker vs pure-Python oracle of the
reference formulas (SURVEY.md §5 item 4)."""

import pyarrow.parquet as pq
import pytest

from tests.oracle import oracle_index, oracle_rank


@pytest.fixture(scope="module")
def engine(spark, tiny_pages_path):
    from nadry_spark.operators.index_build import build_index

    pages = spark.read.parquet(tiny_pages_path)
    postings_df, docstats_df = build_index(pages)
    postings_df = postings_df.cache()
    docstats_df = docstats_df.cache()
    raw = pq.read_table(tiny_pages_path).to_pylist()
    o_postings, o_docs = oracle_index([(r["html"].decode(), r["url"]) for r in raw])
    return postings_df, docstats_df, o_postings, o_docs


def _common_terms(o_postings, k=3):
    from collections import Counter

    df = Counter(term for term, _ in o_postings)
    # pick frequent plain terms (skip specials) for a multi-candidate query
    return [t for t, _ in df.most_common(50) if ":" not in t and "_" not in t][:k]


def _spark_rank(spark, postings_df, docstats_df, tokens):
    from nadry_spark.operators.ranker import candidates_for_terms, rank_exact

    cand = candidates_for_terms(postings_df, tokens)
    return rank_exact(spark, cand, docstats_df, tokens).collect()


def test_rank_identity_multi_term(spark, engine):
    postings_df, docstats_df, o_postings, o_docs = engine
    tokens = _common_terms(o_postings, 3)
    got = _spark_rank(spark, postings_df, docstats_df, tokens)
    want = oracle_rank(tokens, o_postings, o_docs)
    assert len(got) == len(want) > 3
    for g, w in zip(got, want):
        assert g["doc_id"] == w[0]
        assert g["url"] == w[1]
        assert g["relevance"] == pytest.approx(w[2], rel=1e-12)
        assert g["score"] == pytest.approx(w[4], rel=1e-12)


def test_rank_identity_with_duplicate_query_tokens(spark, engine):
    postings_df, docstats_df, o_postings, o_docs = engine
    t = _common_terms(o_postings, 2)
    tokens = [t[0], t[1], t[0]]  # duplicate -> query bag freq 2
    got = _spark_rank(spark, postings_df, docstats_df, tokens)
    want = oracle_rank(tokens, o_postings, o_docs)
    assert [g["doc_id"] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g["score"] == pytest.approx(w[4], rel=1e-12)


def test_unknown_term_empty(spark, engine):
    postings_df, docstats_df, _, _ = engine
    got = _spark_rank(spark, postings_df, docstats_df, ["zzzzunknownzzz"])
    assert got == []


def test_search_end_to_end_pagination(spark, engine):
    from nadry_spark.operators.ranker import search

    postings_df, docstats_df, o_postings, o_docs = engine
    tokens = _common_terms(o_postings, 3)
    query = " ".join(tokens)
    page0 = search(spark, postings_df, docstats_df, query, page=0, page_size=5).collect()
    page1 = search(spark, postings_df, docstats_df, query, page=1, page_size=5).collect()
    want = oracle_rank(
        __import__("nadry_spark.functions.tokenizer", fromlist=["tokenize"]).tokenize(query),
        o_postings,
        o_docs,
    )
    assert [r["doc_id"] for r in page0] == [w[0] for w in want[:5]]
    assert [r["doc_id"] for r in page1] == [w[0] for w in want[5:10]]


def test_stopword_only_query_empty(spark, engine):
    from nadry_spark.operators.ranker import search

    postings_df, docstats_df, _, _ = engine
    assert search(spark, postings_df, docstats_df, "the and of in").collect() == []


def test_additive_search_matches_manual(spark, engine):
    from nadry_spark.operators.ranker import additive_search

    postings_df, _, o_postings, _ = engine
    tokens = _common_terms(o_postings, 2)
    got = additive_search(postings_df, tokens, k=10).collect()
    # manual: sum weights per doc over query tokens
    scores = {}
    urls = {}
    for (term, doc_id), p in o_postings.items():
        if term in tokens:
            scores[doc_id] = scores.get(doc_id, 0.0) + p["weight"]
            urls[doc_id] = p["url"]
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(g["doc_id"], g["score"]) for g in got] == [
        (d, pytest.approx(s)) for d, s in want
    ]
