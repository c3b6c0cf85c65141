"""Query front-end — the SearchController/SearchWrapper serving path.

Reproduces api/SearchController.java:53-111 + SearchWrapper:
1. quoted-phrase detection: the FIRST quoted phrase switches to phrase
   mode and REPLACES the query (:63-70, F16);
2. per-query result cache keyed by the exact search string (:35-46,
   76-97 — quirk preserved: the cache stores one page's enrichment and
   ignores page/limit drift on hit);
3. disjunctive rank (exact reference formulas) or BM25 top-k;
4. pagination AFTER full ranking (SearchWrapper.java:649-666);
5. late enrichment of the current page only: title/snippet via the
   F15 pandas UDF + content join (J4, :500-557).

The result envelope mirrors the reference JSON
{success, data, totalPages, currentPage, totalResults, tokens,
searchTimeSec} (:102-111).
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from nadry_spark.functions.snippets import snippet_udf
from nadry_spark.functions.tokenizer import tokenize
from nadry_spark.operators.phrase import extract_quoted_phrases, phrase_search
from nadry_spark.sources.segments import SegmentIndex


def decode_tf_for_terms(index: SegmentIndex, terms: list[str]):
    """(term, doc_no, tf) long form decoded from the compressed blocks
    of the given terms — the exact-mode candidate probe (J1/S7)."""
    import pandas as pd

    blocks = index.blocks.where(F.col("term").isin(terms))

    def explode_tf(batches):
        from nadry_spark.operators.codecs import decode_posting_block as dec

        for pdf in batches:
            out = {"term": [], "doc_no": [], "tf": []}
            for r in pdf.itertuples():
                doc_nos, tfs, _ = dec(r.docs_bin, r.tfs_bin, r.dls_bin)
                out["term"].extend([r.term] * len(doc_nos))
                out["doc_no"].extend(int(x) for x in doc_nos)
                out["tf"].extend(int(x) for x in tfs)
            yield pd.DataFrame(out)

    return blocks.mapInPandas(explode_tf, "term string, doc_no long, tf int")


class QueryEngine:
    def __init__(self, index: SegmentIndex, scoring: str = "exact"):
        """scoring: 'exact' (reference-identical TF-IDF blend) or
        'bm25' (block-max WAND fast path)."""
        self.index = index
        self.scoring = scoring
        self._cache: dict[str, dict] = {}

    def _rank_disjunctive(self, tokens: list[str], need: int):
        if self.scoring == "bm25":
            from nadry_spark.operators.bm25 import bm25_topk

            return bm25_topk(self.index, " ".join(tokens), k=need, mode="taat")
        # exact mode: decode candidate tfs straight from the compressed
        # blocks (term-pruned scan; much lighter than exploding the
        # positions table) and run the reference formulas
        from nadry_spark.operators.ranker import rank_exact

        idx = self.index
        tf = decode_tf_for_terms(idx, sorted(set(tokens)))
        cand = tf.join(idx.docmap.select("doc_no", "doc_id", "url"), "doc_no").select(
            "term", "doc_id", "url", "tf"
        )
        ranked = rank_exact(
            idx.spark,
            cand,
            idx.docmap.select("doc_id", "total_words", "popularity_score"),
            tokens,
        )
        return ranked

    def search(self, query: str, page: int = 0, page_size: int = 10) -> dict:
        """Full serving path; returns the reference's result envelope."""
        t0 = time.time()
        if page < 0:
            page = 0
        if page_size <= 0:
            page_size = 10

        cached = self._cache.get(query)
        if cached is not None:
            return cached  # quirk: ignores page/limit drift, like the ref

        phrases = extract_quoted_phrases(query)
        if phrases:
            tokens = tokenize(phrases[0])
            ranked_df = phrase_search(self.index, phrases[0], k=1_000_000_000)
        else:
            tokens = tokenize(query)
            ranked_df = self._rank_disjunctive(tokens, (page + 1) * page_size) if tokens else None

        if not tokens or ranked_df is None:
            envelope = self._envelope([], 0, page, page_size, tokens, t0)
            self._cache[query] = envelope
            return envelope

        ranked = ranked_df.collect()
        total = len(ranked)
        page_rows = ranked[page * page_size : (page + 1) * page_size]

        enriched = self._enrich(page_rows, tokens)
        envelope = self._envelope(enriched, total, page, page_size, tokens, t0)
        self._cache[query] = envelope
        return envelope

    def _enrich(self, page_rows, tokens):
        """J4 + F15: join content for the k paged docs only, snippet UDF."""
        if not page_rows:
            return []
        idx = self.index
        spark = idx.spark
        by_doc_id = {r["doc_id"]: r.asDict() for r in page_rows}
        ids_df = spark.createDataFrame(
            [(d,) for d in by_doc_id], "doc_id string"
        )
        detail = (
            idx.docmap.join(F.broadcast(ids_df), "doc_id")
            .join(idx.docs_content, "doc_no")
            .select(
                "doc_id", "title",
                snippet_udf(tokens)(F.col("content")).alias("description"),
            )
            .collect()
        )
        details = {r["doc_id"]: r for r in detail}
        out = []
        for r in page_rows:
            row = dict(by_doc_id[r["doc_id"]])
            d = details.get(r["doc_id"])
            row["title"] = d["title"] if d is not None else "No Title Available"
            row["description"] = (
                d["description"] if d is not None else "Details not available."
            )
            out.append(row)
        return out

    @staticmethod
    def _envelope(data, total, page, page_size, tokens, t0):
        import math

        return {
            "success": True,
            "data": data,
            "totalResults": total,
            "totalPages": math.ceil(total / page_size) if page_size else 0,
            "currentPage": page,
            "tokens": list(tokens) if tokens else [],
            "searchTimeSec": round(time.time() - t0, 4),
        }
