"""Phrase search — the J2 conjunctive positional join.

Reference: api/SearchWrapper.java:266-397. A doc matches iff every
phrase token i appears at position p0 + i in the SAME field for some
start p0 (consecutive positions, same-field requirement :326-328).
Tokens missing from the index abort with an empty result (:313-316).
Single-token phrases delegate to regular search (:282-284). Matched
docs are ranked with every phrase token's tf forced to 1 (:357-366).

Spark formulation: instead of the reference's iterative narrowing
(seeded from token 0), one shuffle does it — join each token's
positions against the token-offset list, normalize to the would-be
phrase start (adj = pos - i), and count distinct offsets per
(doc, field, adj). A group holding all n offsets is an exact match.
This is algebraically identical and O(total postings of phrase terms)
with a single aggregation, no n-way self-join chain.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nadry_spark.functions.tokenizer import tokenize
from nadry_spark.sources.segments import SegmentIndex

_QUOTED = re.compile(r'"([^"]*)"')


def extract_quoted_phrases(query: str) -> list[str]:
    """F16 — api/SearchController.java:127-140; first phrase wins."""
    return _QUOTED.findall(query)


def positions_long(positions: DataFrame) -> DataFrame:
    """Segment positions table -> (doc_no, term, field, pos) long form."""
    parts = []
    for field, col in (
        ("title", "positions_title"),
        ("description", "positions_desc"),
        ("body", "positions_body"),
    ):
        parts.append(
            positions.select(
                "doc_no",
                "term",
                F.lit(field).alias("field"),
                F.explode(col).alias("pos"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def phrase_match_docs(index: SegmentIndex, tokens: list[str]) -> DataFrame:
    """doc_nos containing the exact consecutive same-field phrase."""
    spark = index.spark
    n = len(tokens)
    offsets = spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "i int, term string"
    )
    pos = positions_long(
        index.positions.where(F.col("term").isin(sorted(set(tokens))))
    )
    joined = pos.join(F.broadcast(offsets), "term")
    starts = (
        joined.select("doc_no", "field", (F.col("pos") - F.col("i")).alias("adj"), "i")
        .groupBy("doc_no", "field", "adj")
        .agg(F.countDistinct("i").alias("n_hit"))
        .where(F.col("n_hit") == n)
    )
    return starts.select("doc_no").distinct()


def phrase_search(index: SegmentIndex, phrase: str, k: int = 10) -> DataFrame:
    """Full phrase path: tokenize -> positional match -> rank (tf=1).

    Returns (doc_id, url, relevance, popularity, score) like the
    disjunctive path; ranking uses the reference-exact formulas with
    phrase_mode tf=1.
    """
    from nadry_spark.operators.ranker import rank_exact

    spark = index.spark
    tokens = tokenize(phrase)
    empty = spark.createDataFrame(
        [], "doc_id string, url string, relevance double, popularity double, score double"
    )
    if not tokens:
        return empty
    if len(tokens) == 1:
        # reference delegates to regular search (:282-284); exact-mode
        # equivalent below, with true tf from the index
        matched = positions_long(
            index.positions.where(F.col("term") == tokens[0])
        ).select("doc_no").distinct()
    else:
        matched = phrase_match_docs(index, tokens)

    docmap = index.docmap
    docs = docmap.join(matched, "doc_no").select(
        "doc_id", "url", "total_words", "popularity_score"
    )
    # candidate long form with tf from postings (single-token regular
    # search) or tf=1 (phrase mode)
    terms_df = spark.createDataFrame([(t,) for t in sorted(set(tokens))], "term string")
    cand = docs.crossJoin(F.broadcast(terms_df)).select(
        "term", "doc_id", "url", F.lit(1).alias("tf")
    )
    if len(tokens) == 1:
        # regular search semantics: true tf from the index
        blocks = index.blocks.where(F.col("term") == tokens[0])
        import pandas as pd

        def explode_tf(pdf_iter):
            from nadry_spark.operators.codecs import decode_posting_block as dec

            for pdf in pdf_iter:
                rows = {"doc_no": [], "tf": []}
                for r in pdf.itertuples():
                    doc_nos, tfs, _ = dec(r.docs_bin, r.tfs_bin, r.dls_bin)
                    rows["doc_no"].extend(int(x) for x in doc_nos)
                    rows["tf"].extend(int(x) for x in tfs)
                yield pd.DataFrame(rows)

        tfdf = blocks.mapInPandas(explode_tf, "doc_no long, tf int")
        cand = (
            docmap.join(tfdf, "doc_no")
            .select(F.lit(tokens[0]).alias("term"), "doc_id", "url", "tf")
        )
    ranked = rank_exact(
        spark,
        cand,
        docmap.select("doc_id", "total_words", "popularity_score"),
        tokens,
        phrase_mode=len(tokens) > 1,
    )
    return ranked.limit(k)
