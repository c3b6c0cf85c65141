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
