"""Anchor-text extraction (functions/htmlextract.extract_anchor_links
+ anchor_links_udf) and inbound aggregation (operators/anchors)."""


HTML_A = """<html><body>
<a href="https://target.com/page">spark index engine</a>
<a href="https://target.com/page">spark engine</a>
<a href="https://other.com/x">the engine</a>
<a href="javascript:alert(1)">evil</a>
<a href="#frag">same page</a>
</body></html>"""

HTML_B = """<html><body>
<a href="https://target.com/page">fast <b>spark</b> engine</a>
<a href="https://target.com/page">fast engine</a>
</body></html>"""


def test_extract_anchor_links_pure():
    from nadry_spark.functions.htmlextract import extract_anchor_links

    got = extract_anchor_links(HTML_A, "https://src1.com/")
    # per-occurrence, no dedup; javascript: dropped; a fragment-only
    # href resolves to the page itself (normalize_url strips #frag —
    # same self-link behavior as the reference's extractLinks)
    assert got == [
        ("https://target.com/page", "spark index engine"),
        ("https://target.com/page", "spark engine"),
        ("https://other.com/x", "the engine"),
        ("https://src1.com/", "same page"),
    ]
    # nested markup contributes its text
    got_b = extract_anchor_links(HTML_B, "https://src2.com/")
    assert ("https://target.com/page", "fast spark engine") in got_b
    assert extract_anchor_links("", "https://x.com/") == []
    assert extract_anchor_links(None, "https://x.com/") == []


def test_anchor_term_index_e2e(spark):
    from pyspark.sql import functions as F

    from nadry_spark.functions.udfs import anchor_links_udf
    from nadry_spark.operators.anchors import anchor_term_index

    pages = spark.createDataFrame(
        [("https://src1.com/", HTML_A), ("https://src2.com/", HTML_B)],
        "url string, html string",
    )
    links = (
        pages.select("url", F.explode(anchor_links_udf("html", "url")).alias("l"))
        .select(F.col("url").alias("src"), "l.dst", "l.anchor")
    )
    idx = anchor_term_index(links, stopwords=["the"])
    rows = {
        (r["dst"], r["term"]): (r["tf"], r["n_srcs"]) for r in idx.collect()
    }
    # 'spark' appears 3x toward target.com/page across 2 distinct srcs
    assert rows[("https://target.com/page", "spark")] == (3, 2)
    # 'engine' appears 4x toward target.com/page (2 from each src)
    assert rows[("https://target.com/page", "engine")] == (4, 2)
    # stopword filtered, single-source term counted once
    assert ("https://other.com/x", "the") not in rows
    assert rows[("https://other.com/x", "engine")] == (1, 1)


def test_anchor_backfill_and_boosted_search(spark, seg, tiny_pages_path):
    """Backfill anchors into a built segment (jobs/anchors.py logic)
    and serve the anchor-boosted query path."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from nadry_spark.functions.htmlextract import extract_anchor_links
    from nadry_spark.functions.tokenizer import tokenize
    from nadry_spark.functions.udfs import anchor_links_udf
    from nadry_spark.operators.anchors import (
        anchor_boosted_topk,
        anchor_term_index_tokenized,
    )
    from nadry_spark.operators.bm25 import bm25_topk

    idx, _, _ = seg
    assert not idx.has_anchors

    pages = spark.read.parquet(tiny_pages_path)
    links = pages.select(
        "url", F.explode(anchor_links_udf("html", "url")).alias("l")
    ).select(F.col("url").alias("src"), "l.dst", "l.anchor")
    at = anchor_term_index_tokenized(links)
    docmap = idx.docmap
    rows = (
        docmap.select("doc_no", F.col("url").alias("dst"))
        .join(at, "dst")
        .select("doc_no", "term", "tf", "n_srcs")
    )
    import os

    rows.write.mode("overwrite").parquet(os.path.join(idx.path, "anchors"))
    assert idx.has_anchors

    # brute-force oracle from the pure functions over the raw corpus
    raw = pq.read_table(tiny_pages_path).to_pylist()
    url2no = {r["url"]: r["doc_no"] for r in docmap.collect()}
    want: dict = {}
    for r in raw:
        for dst, anchor in extract_anchor_links(r["html"].decode(), r["url"]):
            if dst not in url2no:
                continue
            for t in tokenize(anchor):
                key = (url2no[dst], t)
                tf, srcs = want.get(key, (0, set()))
                srcs = srcs | {r["url"]}
                want[key] = (tf + 1, srcs)
    got = {
        (r["doc_no"], r["term"]): (r["tf"], r["n_srcs"])
        for r in idx.anchors.collect()
    }
    assert got == {k: (tf, len(srcs)) for k, (tf, srcs) in want.items()}
    assert got  # the tiny corpus does carry internal anchors

    # boosted serving: weight=0 is rank-identical to plain BM25 ...
    q = "news report"
    plain = [r["doc_no"] for r in bm25_topk(idx, q, k=10).collect()]
    zero = [
        r["doc_no"] for r in anchor_boosted_topk(idx, q, k=10, weight=0.0).collect()
    ]
    assert zero == plain
    # ... and with weight, scores shift by w*ln(1+srcs) for anchored docs
    boosted = {
        r["doc_no"]: r["score"]
        for r in anchor_boosted_topk(idx, q, k=10, weight=0.5).collect()
    }
    toks = set(tokenize(q))
    srcs_by_doc: dict = {}
    for (dno, t), (tf, n) in got.items():
        if t in toks:
            srcs_by_doc[dno] = srcs_by_doc.get(dno, 0) + n
    base_scores = {
        r["doc_no"]: r["score"] for r in bm25_topk(idx, q, k=50).collect()
    }
    import math

    for dno, sc in boosted.items():
        expect = round(
            base_scores[dno] + 0.5 * math.log(1.0 + srcs_by_doc.get(dno, 0)), 9
        )
        assert sc == expect, (dno, sc, expect)
