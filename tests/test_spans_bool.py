"""Span-near / ordered-span and boolean-query tests: brute-force
position oracles over the tiny corpus, phrase equivalence at slop=0,
and set-algebra parity for the boolean tree evaluator."""

import itertools

import pytest

from nadry_spark.functions.tokenizer import tokenize

FIELDS = ("title", "description", "body")


def _by_term(o_postings):
    by_term = {}
    for (t, d), p in o_postings.items():
        by_term.setdefault(t, {})[d] = p["positions"]
    return by_term


def _brute_min_cover(lists):
    """Smallest inclusive window covering one element from each list."""
    best = None
    for combo in itertools.product(*lists):
        w = max(combo) - min(combo) + 1
        best = w if best is None or w < best else best
    return best


def _brute_min_ordered(lists):
    """Smallest window with one pick per list at strictly increasing
    positions, in list order."""
    best = None
    for combo in itertools.product(*lists):
        if all(a < b for a, b in zip(combo, combo[1:])):
            w = combo[-1] - combo[0] + 1
            best = w if best is None or w < best else best
    return best


def _term_sets(o_docs, n_terms, n_sets=4):
    from collections import Counter

    cnt = Counter()
    for d in o_docs.values():
        for t in set(tokenize(d["content"])):
            if ":" not in t and not t.startswith("_"):
                cnt[t] += 1
    frequent = [t for t, c in cnt.most_common(12) if c >= 5]
    sets = list(itertools.combinations(frequent, n_terms))[: n_sets]
    assert sets, "fixture corpus too small for span term sets"
    return [list(s) for s in sets]


def _oracle_spans(o_postings, terms, ordered):
    """doc -> min window across fields, or None."""
    by_term = _by_term(o_postings)
    if any(t not in by_term for t in terms):
        return {}
    docs = set.intersection(*(set(by_term[t]) for t in terms))
    out = {}
    for d in docs:
        best = None
        for f in FIELDS:
            lists = [by_term[t][d][f] for t in terms]
            if any(not l for l in lists):
                continue
            w = (_brute_min_ordered if ordered else _brute_min_cover)(lists)
            if w is not None and (best is None or w < best):
                best = w
        if best is not None:
            out[d] = best
    return out


@pytest.mark.parametrize("ordered", [False, True])
def test_span_windows_vs_bruteforce(spark, seg, ordered):
    from pyspark.sql import functions as F

    from nadry_spark.operators.phrase import positions_long
    from nadry_spark.operators.spans import (
        minimal_cover_windows,
        ordered_span_windows,
    )

    idx, o_postings, o_docs = seg
    docmap = {r["doc_no"]: r["doc_id"] for r in idx.docmap.collect()}
    for terms in _term_sets(o_docs, 2) + _term_sets(o_docs, 3, 2):
        pos = positions_long(
            idx.positions.where(F.col("term").isin(sorted(set(terms))))
        )
        fn = ordered_span_windows if ordered else minimal_cover_windows
        per_field = fn(pos, terms)
        got = {}
        for r in per_field.groupBy("doc_no").agg(
            F.min("min_window").alias("mw")
        ).collect():
            got[docmap[r["doc_no"]]] = r["mw"]
        want = _oracle_spans(o_postings, terms, ordered)
        assert got == want, (terms, ordered)
        assert want, f"vacuous span case {terms}"


def test_ordered_slop0_equals_phrase(spark, seg):
    """Ordered span with slop=0 is exactly the consecutive-phrase
    semantics of operators/phrase.py."""
    from nadry_spark.operators.phrase import phrase_match_docs
    from nadry_spark.operators.spans import span_near_docs

    idx, o_postings, o_docs = seg
    from tests.test_phrase import _bigrams_from_corpus

    for tokens in _bigrams_from_corpus(o_docs, 3):
        spans = {
            r["doc_no"]
            for r in span_near_docs(idx, tokens, slop=0, ordered=True).collect()
        }
        phrase = {r["doc_no"] for r in phrase_match_docs(idx, tokens).collect()}
        assert spans == phrase, tokens


def test_span_near_search_surface(spark, seg):
    from nadry_spark.operators.spans import span_near_search

    idx, o_postings, o_docs = seg
    terms = _term_sets(o_docs, 2)[0]
    out = span_near_search(idx, " ".join(terms), slop=20, k=5)
    rows = out.collect()
    assert rows and list(out.columns) == ["doc_id", "url", "min_window"]
    windows = [r["min_window"] for r in rows]
    assert windows == sorted(windows)
    assert all(w <= len(terms) + 20 for w in windows)


# --------------------------------------------------------------------------
# boolean queries
# --------------------------------------------------------------------------


def test_parse_bool_precedence_and_errors():
    from nadry_spark.operators.boolquery import parse_bool_query

    assert repr(parse_bool_query("a b OR c")) == "((a AND b) OR c)"
    t = parse_bool_query("a AND (b OR NOT c)")
    assert t.kind == "and" and t.kids[1].kind == "or"
    assert t.kids[1].kids[1].kind == "not"
    t2 = parse_bool_query("NOT NOT x")
    assert t2.kind == "not" and t2.kids[0].kind == "not"
    for bad in ["", "(a", "a)", "a AND", "a OR"]:
        with pytest.raises(ValueError):
            parse_bool_query(bad)


def _py_eval(expr_sets, universe, node):
    from nadry_spark.operators.boolquery import BoolNode  # noqa: F401

    if node.kind == "term":
        return expr_sets.get(node.term, set())
    if node.kind == "not":
        return universe - _py_eval(expr_sets, universe, node.kids[0])
    parts = [_py_eval(expr_sets, universe, k) for k in node.kids]
    out = parts[0]
    for p in parts[1:]:
        out = (out & p) if node.kind == "and" else (out | p)
    return out


def test_eval_bool_tree_vs_set_algebra(spark, seg):
    from pyspark.sql import functions as F  # noqa: F401

    from nadry_spark.operators.boolquery import eval_bool_tree, parse_bool_query

    idx, o_postings, o_docs = seg
    by_term = _by_term(o_postings)
    universe = set(o_docs)  # o_docs keyed by doc_id
    terms = _term_sets(o_docs, 4)[0]
    a, b, c, d = terms
    expr_sets = {t: set(by_term.get(t, {})) for t in terms}

    term_docs = idx.candidates_for(terms).select("term", "doc_id")
    uni_df = idx.docmap.select("doc_id")
    for q in [
        f"{a} AND {b}",
        f"{a} OR {b} OR {c}",
        f"{a} AND NOT {b}",
        f"({a} AND {b}) OR ({c} AND NOT {d})",
        f"NOT ({a} OR {b})",
        f"{a} {b} NOT {c}",  # implicit AND
    ]:
        tree = parse_bool_query(q)
        got = {r["doc_id"] for r in eval_bool_tree(tree, term_docs, uni_df).collect()}
        want = _py_eval(expr_sets, universe, tree)
        assert got == want, q
    assert any(
        _py_eval(expr_sets, universe, parse_bool_query(q))
        for q in [f"{a} AND {b}"]
    ), "vacuous boolean fixture"


def test_bool_search_ranked(spark, seg):
    from nadry_spark.operators.boolquery import bool_search, parse_bool_query

    idx, o_postings, o_docs = seg
    by_term = _by_term(o_postings)
    terms = _term_sets(o_docs, 2)[0]
    a, b = terms
    out = bool_search(idx, f"{a} AND NOT {b}", k=10).collect()
    got = {r["doc_id"] for r in out}
    want = set(by_term.get(a, {})) - set(by_term.get(b, {}))
    assert got <= want
    assert len(out) == min(10, len(want))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # pure-negative query matches the complement
    neg = bool_search(idx, f"NOT {a}", k=1000).collect()
    assert {r["doc_id"] for r in neg} == set(o_docs) - set(by_term.get(a, {}))
