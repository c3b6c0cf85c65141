"""Single-threaded pure-Python oracle of the reference index + ranking
semantics (SURVEY.md §5 items 3-4). Used to check the Spark operators.

Implements, without Spark:
- IndexBuilder.buildIndex field-by-field position indexing
  (IndexBuilder.java:126-145, field order TITLE/DESCRIPTION/BODY :72-75)
- Posting weight/tf accumulation (InvertedIndex.java:229-260)
- Ranker.java:25-137 formulas (candidate-set N/DF, log10 idf,
  max-normalizations, 0.7/0.3 blend)
- PageRank.java:44-81 with its in-degree divisor quirk
"""

from __future__ import annotations

import math
from collections import defaultdict

from nadry_spark.functions.htmlextract import process_document
from nadry_spark.functions.tokenizer import tokenize

FIELDS = ("title", "description", "body")
FIELD_WEIGHTS = {"title": 3.0, "description": 1.5, "body": 1.0}


def oracle_index(pages: list[tuple[str, str]]):
    """pages = [(html, url)] -> (postings, docs).

    postings: {(term, doc_id): {"url":, "positions": {field: [pos..]},
    "tf":, "weight":}}; docs: {doc_id: {...,"total_words":}}.
    """
    postings: dict = {}
    docs: dict = {}
    for html, url in pages:
        doc = process_document(html, url)
        if doc is None:
            continue
        doc_id = doc["doc_id"]
        total_words = 0
        field_text = {
            "title": doc["title"],
            "description": doc["description"],
            "body": doc["content"],
        }
        for field in FIELDS:
            tokens = tokenize(field_text[field])
            total_words += len(tokens)
            for pos, term in enumerate(tokens):
                key = (term, doc_id)
                p = postings.setdefault(
                    key,
                    {
                        "url": url,
                        "positions": {f: [] for f in FIELDS},
                        "tf": 0,
                        "weight": 0.0,
                    },
                )
                p["positions"][field].append(pos)
                p["tf"] += 1
                p["weight"] += FIELD_WEIGHTS[field]
        docs[doc_id] = {**doc, "total_words": total_words}
    return postings, docs


def oracle_rank(query_tokens: list[str], postings: dict, docs: dict):
    """SearchWrapper.searchWithMetadata candidate build + Ranker.Rank.

    Returns list of (doc_id, url, relevance_norm, popularity_norm, score)
    sorted by score desc (full sort, ties in stable candidate order).
    """
    # J1 disjunctive candidate build (SearchWrapper.java:169-185)
    doc_tf: dict[str, dict[str, int]] = defaultdict(dict)
    doc_url: dict[str, str] = {}
    for (term, doc_id), p in postings.items():
        if term in query_tokens:
            doc_url.setdefault(doc_id, p["url"])
            doc_tf[doc_id][term] = doc_tf[doc_id].get(term, 0) + p["tf"]

    candidates = sorted(doc_tf.keys())  # canonical order for determinism
    if not candidates:
        return []

    n = len(candidates)
    query_bag: dict[str, int] = {}
    for t in query_tokens:
        query_bag[t] = query_bag.get(t, 0) + 1
    query_len = sum(query_bag.values())

    # A8: DF over the candidate set only (Ranker.java:84-90)
    df: dict[str, int] = defaultdict(int)
    for d in candidates:
        for t in doc_tf[d]:
            df[t] += 1

    def tfidf(bag: dict[str, int], length: int) -> dict[str, float]:
        out = {}
        for t, tf in bag.items():
            idf = math.log10(n / (1 + df.get(t, 0)))
            out[t] = (tf / length) * idf
        return out

    q_vec = tfidf(query_bag, query_len)

    # A11a: popularity normalized by max over candidates (Ranker.java:67-71)
    pops = {d: docs[d].get("popularity_score", 0.0) for d in candidates}
    max_pop = max(pops.values()) if pops else 0.0
    if max_pop > 0:
        pops = {d: v / max_pop for d, v in pops.items()}
    # reference: max_pop == 0 -> 0/0 = NaN; we pin 0.0 (documented deviation)

    # A9/A10: doc tfidf + dot product
    rel = {}
    for d in candidates:
        d_vec = tfidf(doc_tf[d], docs[d]["total_words"])
        rel[d] = sum(q_vec[t] * d_vec[t] for t in q_vec if t in d_vec)
    max_rel = max(rel.values()) if rel else 0.0
    if max_rel > 0:
        rel = {d: v / max_rel for d, v in rel.items()}

    rows = [
        (d, doc_url[d], rel[d], pops[d], 0.7 * rel[d] + 0.3 * pops[d]) for d in candidates
    ]
    rows.sort(key=lambda r: (-r[4], r[0]))
    return rows


def oracle_pagerank(doc_links: dict[str, list[str]], damping=0.85, tol=1e-6, max_iter=100):
    """PageRank.java:20-81 exact semantics.

    graph is keyed by DESTINATION url -> list of inlinker urls, restricted
    to known urls. N = len(graph) (pages with >=1 inlink). The divisor for
    an inlinker's contribution is graph.get(inlinker).size() — the
    inlinker's IN-degree (reference quirk, PageRank.java:67-69) — and
    inlinkers that have no inlinks of their own are skipped (:63-66).
    """
    urls = set(doc_links.keys())
    graph: dict[str, list[str]] = {}
    for url, links in doc_links.items():
        for to in links:
            if to not in urls:
                continue
            graph.setdefault(to, []).append(url)

    n = len(graph)
    if n == 0:
        return {}
    ranks = {p: 1.0 / n for p in graph}
    for _ in range(max_iter):
        new_ranks = {}
        diff = 0.0
        for page in graph:
            rank_sum = 0.0
            for in_page in graph.get(page, []):
                if in_page not in graph:
                    continue  # inlinker itself has no inlinks -> skipped
                divisor = len(graph[in_page])  # IN-degree of inlinker (quirk)
                rank_sum += ranks[in_page] / divisor
            nr = (1 - damping) / n + damping * rank_sum
            new_ranks[page] = nr
            diff += abs(nr - ranks[page])
        ranks = new_ranks
        if diff < tol:
            break
    return ranks
