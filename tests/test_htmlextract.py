"""HTML extraction goldens — reference F1-F4 semantics (SURVEY.md §5 item 2).

Fixtures model the reference's test.html / sample1.html / sample2.html:
title, meta description, script/.ads/.comments to strip, nested content
to exercise the F3 duplication, relative/fragment/query links.
"""

from nadry_spark.functions.htmlextract import (
    extract_links,
    generate_doc_id,
    normalize_url,
    parse_html,
    process_document,
)

SAMPLE = """<!DOCTYPE html>
<html><head>
<title>  Test   Page </title>
<meta name="description" content="A sample description">
<script>var x = 1;</script>
</head>
<body>
<main><p>Main text with <strong>bold</strong> words.</p></main>
<div class="ads">BUY NOW</div>
<div class="comments"><p>spam comment</p></div>
<section><p>Second section.</p></section>
<a href="https://Other.Example.com/Page#frag">link one</a>
<a href="/relative/path">link two</a>
<a href="http://insecure.example.com/x">http link</a>
<a href="https://q.example.com/s?b=2&a=1&">query link</a>
<script>tracking();</script>
</body></html>"""

BASE = "https://site0.example.com/p/0"


def test_title_and_description():
    doc = process_document(SAMPLE, BASE)
    assert doc["title"] == "Test Page"
    assert doc["description"] == "A sample description"


def test_doc_id_is_sha256_hex():
    doc = process_document(SAMPLE, BASE)
    assert doc["doc_id"] == generate_doc_id(BASE)
    import hashlib

    assert doc["doc_id"] == hashlib.sha256(BASE.encode()).hexdigest()
    assert len(doc["doc_id"]) == 64


def test_links_https_only_normalized():
    doc = process_document(SAMPLE, BASE)
    # http:// link dropped (reference slash-collapse quirk); fragments
    # stripped; lowercased; relative resolved; query params sorted
    assert doc["links"] == sorted(
        [
            "https://other.example.com/page",
            "https://site0.example.com/relative/path",
            "https://q.example.com/s?a=1&b=2",
        ]
    )


def test_unwanted_removed_but_links_extracted_first():
    # link extraction happens BEFORE script/.ads/.comments removal
    html = '<body><div class="ads"><a href="https://ad.example.com/x">ad</a></div></body>'
    root = parse_html(html)
    links = extract_links(root, BASE)
    assert links == {"https://ad.example.com/x"}
    doc = process_document(html, BASE)
    assert "https://ad.example.com/x" in doc["links"]
    assert "ad" not in doc["content"]


def test_content_duplication_semantics():
    # main.text() emitted once, then every matching extra section again —
    # the F3 duplication is deliberate (DocumentProcessor.java:124-149)
    html = "<body><main><p>alpha beta</p></main></body>"
    doc = process_document(html, BASE)
    # main block once + main (extra list) + p (extra list)
    assert doc["content"] == "alpha beta alpha beta alpha beta"


def test_script_and_ads_stripped_from_content():
    doc = process_document(SAMPLE, BASE)
    assert "BUY NOW" not in doc["content"]
    assert "spam comment" not in doc["content"]
    assert "var x" not in doc["content"]
    assert "Main text with bold words." in doc["content"]
    assert "Second section." in doc["content"]


def test_body_fallback_when_no_content_sections():
    html = "<body>just raw text</body>"
    doc = process_document(html, BASE)
    assert doc["content"] == "just raw text"


def test_empty_and_oversize_skipped():
    assert process_document(None, BASE) is None
    assert process_document("   ", BASE) is None


def test_div_class_content_selected():
    html = '<body><div class="main-CONTENT-area"><p>inner text</p></div></body>'
    doc = process_document(html, BASE)
    # div[class*=content] (case-insensitive substring) selected as main
    assert doc["content"].startswith("inner text")


def test_normalize_url_quirks():
    # http:// mangled to http:/ by the (?<!https:)/+ collapse
    assert normalize_url("http://a.example.com/x", BASE) == "http:/a.example.com/x"
    # https double slashes in path collapse
    assert (
        normalize_url("https://a.example.com//x///y", BASE) == "https://a.example.com/x/y"
    )
    # fragment stripped, case lowered
    assert normalize_url("HTTPS://A.COM/B#Frag", BASE) == "https://a.com/b"
    # empty query params dropped, params sorted
    assert normalize_url("https://a.com/b?z=1&&a=2", BASE) == "https://a.com/b?a=2&z=1"
    # query-only question mark dropped
    assert normalize_url("https://a.com/b?", BASE) == "https://a.com/b"
    # empty/None rejected
    assert normalize_url("", BASE) is None
    assert normalize_url(None, BASE) is None
    # relative resolution against base
    assert normalize_url("sub/page", "https://s.com/a/b") == "https://s.com/a/sub/page"
    # dot segments removed (java URI.normalize)
    assert normalize_url("../up", "https://s.com/a/b/c") == "https://s.com/a/up"


def test_whitespace_normalization_in_text():
    html = "<body><p>a\n\n  b\tc</p></body>"
    doc = process_document(html, BASE)
    # no main/article/div-content block -> content = the p extra-section once
    assert doc["content"] == "a b c"


def test_deterministic():
    a = process_document(SAMPLE, BASE)
    b = process_document(SAMPLE, BASE)
    assert a == b


def test_hostile_link_schemes_dropped():
    """javascript:/mailto:/data: hrefs must never survive extraction;
    only http(s) links do (and http:// dies to the slash-collapse quirk)."""
    from nadry_spark.functions.htmlextract import extract_links, parse_html

    html = (
        "<html><body>"
        '<a href="javascript:alert(1)">x</a>'
        '<a href="mailto:a@b.com">m</a>'
        '<a href="data:text/html;base64,AAAA">d</a>'
        '<a href="ftp://files.example.com/f">f</a>'
        '<a href="  ">blank</a>'
        '<a href="https://ok.example.com/page">ok</a>'
        '<a href="http://gone.example.com/">http-quirk</a>'
        "</body></html>"
    )
    root = parse_html(html)
    links = extract_links(root, "https://base.example.com/")
    assert links == {"https://ok.example.com/page"}
