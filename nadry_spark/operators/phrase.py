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

from nadry_spark.localrows import empty_df, local_rows_df

from nadry_spark.functions.tokenizer import tokenize
from nadry_spark.sources.segments import SegmentIndex

_QUOTED = re.compile(r'"([^"]*)"')


def extract_quoted_phrases(query: str) -> list[str]:
    """F16 — api/SearchController.java:127-140; first phrase wins."""
    return _QUOTED.findall(query)


def positions_long(positions: DataFrame) -> DataFrame:
    """Segment positions table (delta-varint binary per field) ->
    (doc_no, term, field, pos) long form.

    One vectorized mapInPandas pass: per Arrow batch and field the row
    buffers are joined into ONE byte string (C-level; varints are
    self-delimiting), decoded in a single codecs.decode_position_lists
    call, and absolute positions recovered with a segmented cumsum —
    no per-row decode calls, no per-position Python. Callers filter by
    term FIRST so the parquet scan prunes (tests/test_plans.py asserts
    the pushdown) and only query-term rows ever reach the decoder."""
    import numpy as np
    import pandas as pd

    from nadry_spark.operators.codecs import decode_position_lists
    from nadry_spark.sources.segments import _POS_FIELDS

    def gen(batches):
        for pdf in batches:
            for field, ncol, bcol in _POS_FIELDS:
                counts = pdf[ncol].to_numpy(dtype=np.int64)
                if counts.sum() == 0:
                    continue
                pos = decode_position_lists(list(pdf[bcol]), counts)
                yield pd.DataFrame(
                    {
                        "doc_no": np.repeat(pdf["doc_no"].to_numpy(np.int64), counts),
                        "term": np.repeat(pdf["term"].to_numpy(dtype=object), counts),
                        "field": field,
                        "pos": pos.astype(np.int32),
                    }
                )

    return positions.mapInPandas(
        gen, "doc_no long, term string, field string, pos int"
    )


def phrase_match_docs(index: SegmentIndex, tokens: list[str]) -> DataFrame:
    """doc_nos containing the exact consecutive same-field phrase.

    Two physically different, row-identical shapes:

    * **Fused kernel** (warm serving path): when the positions store
      is pinned by ``warm()`` its cache partitions are whole shards
      (explicit repartition by ``shard``), and doc-range sharding
      puts every row of a doc in exactly one shard — so the entire
      match (decode -> adj normalization -> per-(doc, field, adj)
      distinct-offset count == n) runs inside ONE mapInPandas pass
      with no exchange, and per-partition distinct doc_nos are
      globally distinct. A raw parquet scan gives no such partition
      guarantee (split packing can place row groups of one file in
      different tasks at scale), so the fused form is gated on the
      cache.
    * **Join + aggregation** (scale path, unchanged): offset join,
      groupBy (doc, field, adj), countDistinct(i) == n.
    """
    spark = index.spark
    n = len(tokens)
    if "positions" in getattr(index, "_cached", {}):
        pos = index.positions.where(F.col("term").isin(sorted(set(tokens))))
        return _phrase_match_fused(pos, tokens)
    # LocalRelation-backed (localrows): a createDataFrame list goes
    # through parallelize, so even this tiny broadcast input costs a
    # full task set to build
    offsets = local_rows_df(
        spark, "i int, term string", [(i, t) for i, t in enumerate(tokens)]
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


def _phrase_match_fused(pos: DataFrame, tokens: list[str]) -> DataFrame:
    """One-pass phrase match over a doc-complete-partition positions
    frame (see phrase_match_docs): same (doc, field, adj) distinct-i
    count as the join form, vectorized per partition."""
    import numpy as np
    import pandas as pd

    from nadry_spark.operators.codecs import decode_position_lists
    from nadry_spark.sources.segments import _POS_FIELDS

    n = len(tokens)
    nf = len(_POS_FIELDS)
    offs_of: dict[str, list[int]] = {}
    for i, t in enumerate(tokens):
        offs_of.setdefault(t, []).append(i)

    def gen(batches):
        docs_p = []
        field_p = []
        adj_p = []
        i_p = []
        for pdf in batches:
            terms = pdf["term"].to_numpy(dtype=object)
            doc_nos = pdf["doc_no"].to_numpy(np.int64)
            for f_code, (_field, ncol, bcol) in enumerate(_POS_FIELDS):
                counts = pdf[ncol].to_numpy(dtype=np.int64)
                if counts.sum() == 0:
                    continue
                posv = decode_position_lists(list(pdf[bcol]), counts).astype(
                    np.int64
                )
                d_rep = np.repeat(doc_nos, counts)
                t_rep = np.repeat(terms, counts)
                for t, offs in offs_of.items():
                    m = t_rep == t
                    if not m.any():
                        continue
                    pm, dm = posv[m], d_rep[m]
                    for i in offs:
                        docs_p.append(dm)
                        field_p.append(
                            np.full(len(dm), f_code, dtype=np.int64)
                        )
                        adj_p.append(pm - i)
                        i_p.append(np.full(len(dm), i, dtype=np.int64))
        if docs_p:
            d = np.concatenate(docs_p)
            fc = np.concatenate(field_p)
            adj = np.concatenate(adj_p) + np.int64(n)  # >= 1
            iv = np.concatenate(i_p)
            m1 = int(adj.max()) + 1
            grp = (d * nf + fc) * m1 + adj
            # distinct (group, i) then count distinct i per group
            per_grp = np.unique(grp * n + iv) // n
            uniq, cnt = np.unique(per_grp, return_counts=True)
            matched = np.unique(uniq[cnt == n] // m1 // nf)
        else:
            matched = np.empty(0, dtype=np.int64)
        yield pd.DataFrame({"doc_no": matched})

    return pos.mapInPandas(gen, "doc_no long")


def phrase_match_doc_ids(index, tokens: list[str]) -> DataFrame:
    """doc_ids containing the phrase — works over a SegmentIndex or a
    MultiSegmentIndex (doc spaces are segment-disjoint, so the J2
    positional aggregation runs per segment and the matched ids union;
    tombstoned re-crawls excluded)."""
    if hasattr(index, "segments"):  # MultiSegmentIndex
        parts = []
        for i, seg in enumerate(index.segments):
            matched = index._live(i, phrase_match_docs(seg, tokens))
            parts.append(
                seg.docmap.join(matched, "doc_no").select("doc_id")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out
    matched = phrase_match_docs(index, tokens)
    return index.docmap.join(matched, "doc_no").select("doc_id")


def disjunctive_ranked(
    index, tokens: list[str], with_metadata: bool = False
) -> DataFrame:
    """Regular exact-mode search over pre-tokenized index terms: decode
    candidate tfs from the compressed blocks (term-pruned scan) and run
    the reference ranking formulas. Unlimited — callers paginate.
    Works over a SegmentIndex or a MultiSegmentIndex (both expose
    candidates_for / doc_meta_df; the multi form unions live docs with
    tombstoned re-crawls excluded)."""
    from nadry_spark.operators.ranker import rank_exact

    cand = index.candidates_for(tokens)
    return rank_exact(
        index.spark,
        cand,
        index.doc_meta_df().select("doc_id", "total_words", "popularity_score"),
        tokens,
        with_metadata=with_metadata,
        materialize=True,
    )


def phrase_ranked(
    index, tokens: list[str], with_metadata: bool = False
) -> DataFrame:
    """Multi-token phrase path: positional match -> rank with every
    term's tf forced to 1 (SearchWrapper.java:357-366). Unlimited —
    pagination happens AFTER full ranking (:649-666). Works over single
    or multi-segment indexes (phrase_match_doc_ids)."""
    from nadry_spark.operators.ranker import rank_exact

    spark = index.spark
    meta = index.doc_meta_df()
    docs = meta.join(phrase_match_doc_ids(index, tokens), "doc_id").select(
        "doc_id", "url", "total_words", "popularity_score"
    )
    terms_df = local_rows_df(
        spark, "term string", [(t,) for t in sorted(set(tokens))]
    )
    cand = docs.crossJoin(F.broadcast(terms_df)).select(
        "term", "doc_id", "url", F.lit(1).alias("tf")
    )
    return rank_exact(
        spark,
        cand,
        meta.select("doc_id", "total_words", "popularity_score"),
        tokens,
        phrase_mode=True,
        with_metadata=with_metadata,
        materialize=True,
    )


def phrase_search(index: SegmentIndex, phrase: str, k: int = 10) -> DataFrame:
    """Full phrase path: tokenize -> positional match -> rank (tf=1).

    Returns (doc_id, url, relevance, popularity, score) like the
    disjunctive path; ranking uses the reference-exact formulas with
    phrase_mode tf=1.

    Single-token quirk: the reference delegates to
    searchWithMetadata(phraseTokens[0]) (SearchWrapper.java:282-284),
    which RE-tokenizes the already-stemmed token — results differ
    whenever tokenize(stem(w)) != stem(w) (e.g. a stem that equals a
    stop word vanishes). Faithfully reproduced.
    """
    spark = index.spark
    tokens = tokenize(phrase)
    ddl = "doc_id string, url string, relevance double, popularity double, score double"
    if not tokens:
        return empty_df(spark, ddl)
    if len(tokens) == 1:
        retok = tokenize(tokens[0])
        if not retok:
            return empty_df(spark, ddl)
        return disjunctive_ranked(index, retok).limit(k)
    return phrase_ranked(index, tokens).limit(k)
