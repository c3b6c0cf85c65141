"""Serving-path tests: QueryEngine envelope, cache, pagination,
phrase mode, snippet enrichment (SearchController semantics)."""

import pytest

from nadry_spark.functions.snippets import find_first_context_match


@pytest.fixture(scope="module")
def engine(seg):
    from nadry_spark.plans.query import QueryEngine

    idx, _, _ = seg
    return QueryEngine(idx, scoring="exact")


def test_envelope_shape_and_pagination(engine, seg):
    _, o_postings, _ = seg
    from collections import Counter

    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    q = " ".join(t for t, _ in cnt.most_common(3))
    res = engine.search(q, page=0, page_size=5)
    assert res["success"] is True
    assert res["currentPage"] == 0
    assert len(res["data"]) <= 5
    assert res["totalResults"] >= len(res["data"])
    assert res["totalPages"] >= 1
    assert res["tokens"]
    for row in res["data"]:
        assert row["title"] is not None
        assert row["description"]
        assert row["doc_id"] and row["url"]


def test_envelope_reference_reflection_keys(engine, seg):
    """Each result row carries the QueryDocument reflection-dump keys
    (api/SearchWrapper.java:476-491 toMap over QueryDocument.java:5-18),
    incl. the reference's 'relevenceScore' spelling."""
    _, o_postings, _ = seg
    from collections import Counter

    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    q = " ".join(t for t, _ in cnt.most_common(2)) + " zz-reflection-probe"
    res = engine.search(q, page=0, page_size=3)
    assert res["data"]
    expected = {
        "id", "url", "termFrequency", "popularityScore", "relevenceScore",
        "totalWord", "score", "title", "description", "DOC_TFIDF", "QUERY_TFIDF",
    }
    for row in res["data"]:
        assert expected <= set(row), sorted(row)
        assert isinstance(row["termFrequency"], dict) and row["termFrequency"]
        assert isinstance(row["totalWord"], int) and row["totalWord"] > 0
        # DOC_TFIDF covers the doc's matched terms; QUERY_TFIDF covers
        # every query token (df=0 terms included, Ranker.java:94-97)
        assert set(row["DOC_TFIDF"]) <= set(row["QUERY_TFIDF"])
        assert set(row["termFrequency"]) == set(row["DOC_TFIDF"])
        assert row["relevenceScore"] == row["relevance"]


def test_count_cap_bounds_total_results(seg):
    """count_up_to mode: totalResults counted only to cap+1, flagged as
    a lower bound when the cap is hit; exact mode stays the default."""
    from nadry_spark.plans.query import QueryEngine

    idx, o_postings, _ = seg
    from collections import Counter

    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    term = cnt.most_common(1)[0][0]

    exact = QueryEngine(idx, scoring="exact").search(term, page=0, page_size=3)
    assert "totalResultsIsLowerBound" not in exact  # reference-parity default
    full_total = exact["totalResults"]
    assert full_total > 2

    capped = QueryEngine(idx, scoring="exact", count_cap=2).search(
        term, page=0, page_size=3
    )
    assert capped["totalResults"] == 3  # cap+1 = "more than 2"
    assert capped["totalResultsIsLowerBound"] is True
    assert capped["data"] == exact["data"]  # page content identical

    roomy = QueryEngine(idx, scoring="exact", count_cap=10_000).search(
        term, page=0, page_size=3
    )
    assert roomy["totalResults"] == full_total
    assert roomy["totalResultsIsLowerBound"] is False


def test_search_only_pages_cross_driver(engine, seg):
    """totalResults reflects the full candidate set while only one
    page of rows is fetched (no full-rank collect on the driver)."""
    _, o_postings, _ = seg
    from collections import Counter

    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    term = cnt.most_common(1)[0][0]
    res = engine.search(term + " zz-paging-probe", page=0, page_size=2)
    assert len(res["data"]) <= 2
    assert res["totalResults"] >= len(res["data"])
    if res["totalResults"] > 2:
        res2 = engine.search(term + " zz-paging-probe2", page=1, page_size=2)
        assert res2["currentPage"] == 1
        ids0 = {r["id"] for r in res["data"]}
        assert all(r["id"] not in ids0 for r in res2["data"])


def test_cache_hit_is_same_object(engine, seg):
    _, o_postings, _ = seg
    term = next(t for t, _ in o_postings if ":" not in t)
    r1 = engine.search(term)
    r2 = engine.search(term)
    assert r1 is r2  # reference quirk: cache keyed by exact query string


def test_empty_and_stopword_queries(engine):
    res = engine.search("the and of")
    assert res["data"] == [] and res["totalResults"] == 0


def test_phrase_mode_switches(engine, seg):
    idx, o_postings, o_docs = seg
    # find a real bigram
    from nadry_spark.functions.tokenizer import tokenize

    for d in o_docs.values():
        toks = tokenize(d["content"])
        pair = next(
            (
                (a, b)
                for a, b in zip(toks, toks[1:])
                if ":" not in a and ":" not in b and tokenize(f"{a} {b}") == [a, b]
            ),
            None,
        )
        if pair:
            break
    assert pair
    from nadry_spark.functions.tokenizer import tokenize as tok

    raw = f'ignored "{pair[0]} {pair[1]}" also-ignored'
    res = engine.search(raw)
    # phrase REPLACES the query for ranking/caching, but the envelope's
    # tokens come from the ORIGINAL full query (SearchController.java:100)
    assert res["tokens"] == tok(raw)
    assert res["totalResults"] >= 1
    # cache key is the extracted phrase, not the raw query
    # (SearchController.java:63-76): a different wrapper, same phrase -> HIT
    res2 = engine.search(f'zz-other "{pair[0]} {pair[1]}" tail-words')
    assert res2 is res


def test_snippet_semantics():
    content = "First sentence here. The magic token appears in this one. Third."
    out = find_first_context_match(content, ["magic"])
    assert out == "The magic token appears in this one."
    # fallback: first sentence when no token matches
    out2 = find_first_context_match(content, ["zzz"])
    assert out2 == "First sentence here."
    # long sentence centering
    long_sent = "start " + "x " * 200 + "needle " + "y " * 200 + "end."
    out3 = find_first_context_match(long_sent, ["needle"])
    assert "needle" in out3 and len(out3) <= 246 and out3.startswith("...")
    # no content
    assert find_first_context_match(None, ["a"]).startswith("No content")


def test_missing_term_queries_return_empty(engine, seg):
    """Terms absent from the index: empty result, no errors, in all
    modes (disjunctive, multi-token phrase, single-token phrase)."""
    for q in (
        "zzznonexistent qqqmissing",
        '"zzznonexistent qqqmissing"',
        '"zzznonexistent"',
    ):
        res = engine.search(q)
        assert res["success"] is True
        assert res["totalResults"] == 0 and res["data"] == []


def test_cache_lru_bound_and_quirk(seg):
    """The serving cache keeps the reference quirks (exact-key hit,
    page/limit drift ignored) but is bounded: least-recently-used
    entries evict beyond cache_cap; a re-touched entry survives."""
    from collections import Counter

    from nadry_spark.plans.query import QueryEngine

    idx, o_postings, _ = seg
    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    terms = [t for t, _ in cnt.most_common(6)]
    eng = QueryEngine(idx, scoring="exact", cache_cap=3)

    r0 = eng.search(terms[0], page=0, page_size=2)
    # quirk intact: same key with DIFFERENT page returns the cached page
    assert eng.search(terms[0], page=1, page_size=5) is r0

    eng.search(terms[1], page=0, page_size=2)
    eng.search(terms[0], page=0, page_size=2)  # touch terms[0] -> MRU
    eng.search(terms[2], page=0, page_size=2)  # cache full: [1, 0, 2]
    eng.search(terms[3], page=0, page_size=2)  # evicts terms[1] (LRU)
    assert len(eng._cache) == 3
    assert terms[1] not in eng._cache
    assert eng.search(terms[0], page=0, page_size=2) is r0  # survived


def test_bm25_path_envelope_lower_bound(seg):
    """bm25 fast-path totals are per-shard-top-k bounded at `need`:
    a full frame is flagged as a lower bound; a sparse query whose
    candidates fit under `need` is exact and unflagged."""
    from collections import Counter

    from nadry_spark.plans.query import QueryEngine

    idx, o_postings, _ = seg
    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    hot = cnt.most_common(1)[0][0]
    rare = min(
        (t for t, _ in cnt.items() if ":" not in t), key=lambda t: cnt[t]
    )

    eng = QueryEngine(idx, scoring="bm25")
    full = eng.search(hot, page=0, page_size=2)
    assert full["totalResults"] == 2  # need = (0+1)*2, frame filled
    assert full["totalResultsIsLowerBound"] is True

    sparse = QueryEngine(idx, scoring="bm25").search(rare, page=0, page_size=10)
    assert sparse["totalResults"] == cnt[rare]
    assert "totalResultsIsLowerBound" not in sparse


def test_count_cap_composes_with_bm25_topk_bound(seg):
    """count_cap over an already top-k-bounded bm25 frame: a roomy cap
    must NOT report the frame-truncated count as exact (regression: the
    elif made count_cap swallow the topk lower-bound flag)."""
    from collections import Counter

    from nadry_spark.plans.query import QueryEngine

    idx, o_postings, _ = seg
    cnt = Counter(t for t, _ in o_postings if ":" not in t)
    hot = cnt.most_common(1)[0][0]
    assert cnt[hot] > 2  # more candidates than need=2

    eng = QueryEngine(idx, scoring="bm25", count_cap=1000)
    res = eng.search(hot, page=0, page_size=2)
    assert res["totalResults"] == 2  # top-k frame bound at need
    assert res["totalResultsIsLowerBound"] is True  # composed, not masked


def test_did_you_mean_on_zero_results(seg):
    """Opt-in didYouMean: a misspelled token with an indexed term
    within edit distance 2 gets a corrected-query suggestion on
    zero-result envelopes; hit envelopes and the default engine never
    carry the field."""
    from collections import Counter

    from nadry_spark.plans.query import QueryEngine

    idx, o_postings, _ = seg
    cnt = Counter(t for t, _ in o_postings if ":" not in t and len(t) >= 5)
    common = cnt.most_common(1)[0][0]
    typo = common[:-1] + ("x" if common[-1] != "x" else "z")  # dist 1
    assert typo not in cnt

    eng = QueryEngine(idx, scoring="bm25", did_you_mean=True)
    res = eng.search(typo)
    assert res["totalResults"] == 0
    assert res["didYouMean"] == common

    # a hit query never carries the field
    hit = eng.search(common)
    assert hit["totalResults"] > 0 and "didYouMean" not in hit

    # gibberish with no neighbour: no suggestion
    none = eng.search("qqqqqqqqqqqq")
    assert none["totalResults"] == 0 and "didYouMean" not in none

    # reference-exact default: field never appears
    plain = QueryEngine(idx, scoring="bm25")
    assert "didYouMean" not in plain.search(typo)
