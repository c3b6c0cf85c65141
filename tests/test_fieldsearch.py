"""Field-restricted BM25 vs a brute-force python oracle over the tiny
corpus, plus multi-segment parity."""

import math
from collections import Counter

import pytest

from nadry_spark.functions.tokenizer import tokenize
from nadry_spark.operators.bm25 import bm25_idf
from nadry_spark.operators.fieldsearch import field_search

FIELDS = ("title", "description", "body")


def _oracle_field_rank(o_postings, o_docs, tokens, field, k1, b):
    """doc_id -> score with tf restricted to ``field``."""
    n_docs = len(o_docs)
    avgdl = sum(d["total_words"] for d in o_docs.values()) / n_docs
    by_term = {}
    for (t, d), p in o_postings.items():
        tf = len(p["positions"][field])
        if tf:
            by_term.setdefault(t, {})[d] = tf
    scores: dict = {}
    for t in set(tokens):
        hits = by_term.get(t, {})
        if not hits:
            continue
        idf = bm25_idf(n_docs, len(hits))
        for d, tf in hits.items():
            dl = o_docs[d]["total_words"]
            tfnorm = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            scores[d] = scores.get(d, 0.0) + idf * tfnorm
    return {d: round(s, 9) for d, s in scores.items()}


def _frequent_terms(o_docs, field_getter, n=3):
    cnt = Counter()
    for d in o_docs.values():
        for t in set(tokenize(field_getter(d))):
            cnt[t] += 1
    terms = [t for t, c in cnt.most_common(8) if c >= 3][:n]
    assert terms, "fixture corpus too small for field query"
    return terms


@pytest.mark.parametrize("field,src", [
    ("title", "title"),
    ("description", "description"),
    ("body", "content"),
])
def test_field_search_matches_oracle(spark, seg, field, src):
    idx, o_postings, o_docs = seg
    k1, b = float(idx.meta["k1"]), float(idx.meta["b"])
    terms = _frequent_terms(o_docs, lambda d: d[src])
    query = " ".join(terms)
    want = _oracle_field_rank(
        o_postings, o_docs, tokenize(query), field, k1, b
    )
    got = {
        r["doc_id"]: round(r["score"], 9)
        for r in field_search(idx, query, field, k=1000).collect()
    }
    assert got == want
    # a match in ANOTHER field only must not appear: every returned doc
    # has at least one query term in the target field
    for d in got:
        assert any(
            len(o_postings.get((t, d), {"positions": {field: []}})["positions"][field])
            for t in tokenize(query)
        ), (d, field)


def test_field_search_title_differs_from_body(spark, seg):
    """Sanity: restricting to title is actually restrictive — the body
    ranking over the same query scores a strict superset of docs."""
    idx, o_postings, o_docs = seg
    terms = _frequent_terms(o_docs, lambda d: d["title"])
    q = " ".join(terms)
    title_docs = {r["doc_id"] for r in field_search(idx, q, "title", k=1000).collect()}
    body_docs = {r["doc_id"] for r in field_search(idx, q, "body", k=1000).collect()}
    assert title_docs, "vacuous field-restriction case"
    assert title_docs != body_docs


def test_field_search_multisegment_parity(spark, seg, tiny_pages_path, tmp_path_factory):
    import pyarrow.parquet as pq

    from nadry_spark.sources.segments import MultiSegmentIndex, build_segments

    idx, _, o_docs = seg
    base = tmp_path_factory.mktemp("fs_halves")
    table = pq.read_table(tiny_pages_path)
    n = table.num_rows
    paths = []
    for i, (lo, hi) in enumerate([(0, n // 2), (n // 2, n)]):
        pfile = str(base / f"pages{i}.parquet")
        pq.write_table(table.slice(lo, hi - lo), pfile)
        segdir = str(base / f"seg{i}")
        build_segments(
            spark, spark.read.parquet(pfile), segdir, n_shards=3, shards_per_job=3
        )
        paths.append(segdir)
    msi = MultiSegmentIndex(spark, paths)
    terms = _frequent_terms(o_docs, lambda d: d["title"])
    q = " ".join(terms)
    for fld in FIELDS:
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in field_search(idx, q, fld, k=1000).collect()
        ]
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in field_search(msi, q, fld, k=1000).collect()
        ]
        assert got == want, fld


def test_field_search_empty_and_bad_field(spark, seg):
    idx, _, _ = seg
    assert field_search(idx, "the of and", "title", k=10).count() == 0
    with pytest.raises(ValueError):
        field_search(idx, "news", "footer")
