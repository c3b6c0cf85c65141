"""BM25 top-k over compressed segments: distributed block-max WAND.

north_star: "multi-term conjunctive/disjunctive top-k via posting-list
intersection with block-max WAND pruning and a bounded min-heap".

Architecture: shards partition the doc space, so per-shard scoring is
exact and independent; the global top-k is the k-way merge (orderBy +
limit k on <= n_shards * k rows). Two shard scorers, identical output:

* ``taat`` — term-at-a-time, numpy-vectorized dense accumulator.
  No per-posting Python; usually fastest when shard posting lists fit
  the accumulator (they do by construction: accumulator = shard_size
  floats).
* ``bmw`` — document-at-a-time block-max WAND with a bounded min-heap.
  Skips whole blocks without decoding when the sum of current block
  max scores can't beat the heap threshold. Wins when k is small and
  query terms have very long lists with selective score distribution.

Both support disjunctive (OR) and conjunctive (AND) modes. idf is the
Lucene/Robertson BM25+ form ln(1 + (N - df + 0.5)/(df + 0.5)) — always
positive, monotone in rarity.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nadry_spark.functions.tokenizer import tokenize
from nadry_spark.localrows import empty_df, local_rows_df
from nadry_spark.operators.codecs import bm25_tfnorm, decode_posting_block
from nadry_spark.sources.segments import SegmentIndex

TOPK_SCHEMA = "doc_no long, score double"


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _shard_taat(k: int, k1: float, b: float, avgdl: float, shard_size: int,
                idf_map: dict[str, float], n_query_terms: int, conjunctive: bool,
                exclude: frozenset = frozenset(), codec: str = "varint"):
    def score(key, pdf: pd.DataFrame):
        base = int(key[0]) * shard_size
        scores = np.zeros(shard_size, dtype=np.float64)
        seen_terms = np.zeros(shard_size, dtype=np.int32)
        for term, tpdf in pdf.groupby("term"):
            idf = idf_map[term]
            for docs_bin, tfs_bin, dls_bin in zip(
                tpdf["docs_bin"], tpdf["tfs_bin"], tpdf["dls_bin"]
            ):
                doc_nos, tfs, dls = decode_posting_block(
                    docs_bin, tfs_bin, dls_bin, codec
                )
                idx = (doc_nos - np.uint64(base)).astype(np.int64)
                scores[idx] += idf * bm25_tfnorm(tfs, dls, avgdl, k1, b)
                seen_terms[idx] += 1
        if conjunctive:
            mask = seen_terms == n_query_terms
        else:
            mask = seen_terms > 0
        cand = np.nonzero(mask)[0]
        if exclude and cand.size:
            # tombstoned doc_nos (re-crawls superseded by a newer
            # segment) drop BEFORE top-k selection so the k slots fill
            # with live docs
            cand = cand[~np.isin(cand + base, np.fromiter(exclude, dtype=np.int64))]
        if cand.size == 0:
            return pd.DataFrame({"doc_no": [], "score": []}).astype(
                {"doc_no": "int64", "score": "float64"}
            )
        topn = min(k, cand.size)
        # top-k by (score desc, doc_no asc). Full lexsort, NOT
        # argpartition: argpartition picks an ARBITRARY member of a
        # score tie straddling the k boundary, so the doc_no tie-break
        # only applied to whichever members survived the partition
        # (found by the tests/test_bmw_fuzz.py property fuzz — BMW's
        # heap honored the tie rule, TAAT didn't). cand is bounded by
        # shard_size, so the exact sort is O(shard_size log) — noise.
        order = np.lexsort((cand, -scores[cand]))
        sel = cand[order[:topn]]
        return pd.DataFrame(
            {"doc_no": (sel + base).astype("int64"), "score": scores[sel]}
        )

    return score


class _TermCursor:
    """Cursor over one term's blocks within a shard (lazy block decode)."""

    __slots__ = ("idf", "blocks", "bi", "pi", "doc_nos", "tfnorms", "max_score", "cur",
                 "_k1b", "_decodes", "_bscale", "_codec")

    def __init__(self, idf: float, blocks: list[dict], k1: float, b: float, avgdl: float,
                 decodes: list | None = None, bound_scale: float = 1.0,
                 codec: str = "varint"):
        self._codec = codec
        self.idf = idf
        # blocks sorted by min_doc_no: list of dicts w/ bins + max_tfnorm
        self.blocks = blocks
        self.bi = -1
        self.pi = 0
        self.doc_nos = None
        self.tfnorms = None
        # bound_scale: stored max_tfnorm was computed with the SEGMENT's
        # build-time avgdl; under a larger query-time (global) avgdl the
        # true tfnorm can exceed it by at most avgdl_g/avgdl_s (the
        # denominator D = tf + k1(1-b) + k1*b*dl/avgdl satisfies
        # D_s/D_g <= avgdl_g/avgdl_s for avgdl_g >= avgdl_s), so
        # scaling the bound keeps block-max skipping admissible in
        # multi-segment mode
        self._bscale = bound_scale
        self.max_score = idf * max(blk["max_tfnorm"] for blk in blocks) * bound_scale
        self._k1b = (k1, b, avgdl)
        self._decodes = decodes  # shared [count] cell for skip-rate evidence
        self.cur = -1
        self._next_block()

    def _decode(self, blk):
        k1, b, avgdl = self._k1b
        if self._decodes is not None:
            self._decodes[0] += 1
        doc_nos, tfs, dls = decode_posting_block(
            blk["docs_bin"], blk["tfs_bin"], blk["dls_bin"], self._codec
        )
        self.doc_nos = doc_nos.astype(np.int64)
        self.tfnorms = bm25_tfnorm(tfs, dls, avgdl, k1, b)

    def _next_block(self):
        self.bi += 1
        if self.bi >= len(self.blocks):
            self.cur = None  # exhausted
            return
        self._decode(self.blocks[self.bi])
        self.pi = 0
        self.cur = int(self.doc_nos[0])

    def block_max(self) -> float:
        return self.idf * self.blocks[self.bi]["max_tfnorm"] * self._bscale

    def score_current(self) -> float:
        return self.idf * float(self.tfnorms[self.pi])

    def advance(self):
        """Next posting."""
        self.pi += 1
        if self.pi >= len(self.doc_nos):
            self._next_block()
        else:
            self.cur = int(self.doc_nos[self.pi])

    def seek(self, target: int):
        """Advance to first doc_no >= target, skipping blocks w/o decode."""
        if self.cur is None or self.cur >= target:
            return
        # skip whole blocks by max_doc_no (no decode)
        while self.bi < len(self.blocks) and self.blocks[self.bi]["max_doc_no"] < target:
            self.bi += 1
            self.doc_nos = None
        if self.bi >= len(self.blocks):
            self.cur = None
            return
        if self.doc_nos is None:
            self._decode(self.blocks[self.bi])
        self.pi = int(np.searchsorted(self.doc_nos, target, side="left"))
        if self.pi >= len(self.doc_nos):
            self._next_block()
        else:
            self.cur = int(self.doc_nos[self.pi])


def _shard_bmw(k: int, k1: float, b: float, avgdl: float,
               idf_map: dict[str, float], n_query_terms: int, conjunctive: bool,
               stats_mode: bool = False, exclude: frozenset = frozenset(),
               bound_inflation: float = 1.0, codec: str = "varint"):
    def score(key, pdf: pd.DataFrame):
        decodes = [0]
        cursors: list[_TermCursor] = []
        for term, tpdf in pdf.groupby("term"):
            blocks = (
                tpdf.sort_values("min_doc_no")[
                    ["min_doc_no", "max_doc_no", "docs_bin", "tfs_bin", "dls_bin", "max_tfnorm"]
                ]
                .to_dict("records")
            )
            cursors.append(
                _TermCursor(idf_map[term], blocks, k1, b, avgdl, decodes=decodes,
                            bound_scale=bound_inflation, codec=codec)
            )
        if conjunctive and len(cursors) < n_query_terms:
            if stats_mode:
                return pd.DataFrame(
                    {"shard": [int(key[0])], "n_blocks": [len(pdf)],
                     "n_decoded": [decodes[0]]}
                )
            return pd.DataFrame({"doc_no": [], "score": []}).astype(
                {"doc_no": "int64", "score": "float64"}
            )

        heap: list[tuple[float, int]] = []  # (score, -doc_no) min-heap, size k
        threshold = -math.inf

        def push(doc_no: int, s: float):
            nonlocal threshold
            item = (s, -doc_no)
            if len(heap) < k:
                heapq.heappush(heap, item)
                if len(heap) == k:
                    threshold = heap[0][0]
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
                threshold = heap[0][0]

        live = [c for c in cursors if c.cur is not None]
        while live:
            live.sort(key=lambda c: c.cur)
            if conjunctive:
                if len(live) < n_query_terms:
                    break
                pivot_doc = live[-1].cur  # all terms must contain the doc
                ub = sum(c.max_score for c in live)
                if ub <= threshold and len(heap) == k:
                    break
            else:
                # WAND pivot: smallest prefix whose UB sum beats threshold
                acc = 0.0
                pivot_idx = None
                for i, c in enumerate(live):
                    acc += c.max_score
                    if acc > threshold or len(heap) < k:
                        pivot_idx = i
                        break
                if pivot_idx is None:
                    break  # nothing can beat the heap
                pivot_doc = live[pivot_idx].cur

            # align: all cursors before pivot must reach pivot_doc
            aligned = all(c.cur == pivot_doc for c in live if c.cur <= pivot_doc)
            if aligned:
                at_pivot = [c for c in live if c.cur == pivot_doc]
                # block-max check: sum of current block maxes.
                # `>=` is a conservative no-op, not a correctness
                # requirement: WAND scores candidates in strictly
                # increasing doc_no order, and push()'s (score, -doc_no)
                # tuple compare only displaces the heap min on a tie
                # when the NEW doc_no is smaller — which a later
                # candidate never is. Equal-to-threshold blocks are
                # therefore admitted purely to keep this bound check
                # visibly safe; the strict `acc > threshold` pivot
                # selection and `ub <= threshold` conjunctive break
                # above are correct for the same reason.
                bub = sum(c.block_max() for c in at_pivot)
                if bub >= threshold or len(heap) < k or conjunctive:
                    if (not conjunctive or len(at_pivot) == n_query_terms) and (
                        pivot_doc not in exclude
                    ):
                        s = sum(c.score_current() for c in at_pivot)
                        push(pivot_doc, s)
                for c in at_pivot:
                    c.advance()
            else:
                for c in live:
                    if c.cur < pivot_doc:
                        c.seek(pivot_doc)
            live = [c for c in live if c.cur is not None]

        if stats_mode:
            return pd.DataFrame(
                {"shard": [int(key[0])], "n_blocks": [len(pdf)],
                 "n_decoded": [decodes[0]]}
            )
        rows = sorted(((s, -negd) for s, negd in heap), key=lambda x: (-x[0], x[1]))
        return pd.DataFrame(
            {"doc_no": [d for _, d in rows], "score": [s for s, _ in rows]}
        ).astype({"doc_no": "int64", "score": "float64"})

    return score


def bm25_topk(
    index: SegmentIndex,
    query: str,
    k: int = 10,
    mode: str = "taat",
    conjunctive: bool = False,
    tokens: list[str] | None = None,
) -> DataFrame:
    """Tokenize -> prune blocks by term -> per-shard top-k -> global top-k.

    Returns (doc_id, url, doc_no, score) ordered by (score desc, doc_no).

    `tokens` bypasses tokenization for callers that already hold index
    terms (QueryEngine): re-tokenizing stems diverges from the index —
    stems equal to stopwords vanish ('wills'->'will'-> dropped), stems
    restem ('happili'->'happi'), and special tokens shred ('num:2024'
    -> 'num','_num_') — which also falsely empties conjunctive mode.
    """
    spark = index.spark
    tokens = tokenize(query) if tokens is None else list(tokens)
    distinct = sorted(set(tokens))
    ddl = "doc_id string, url string, doc_no long, score double"
    if not distinct:
        return empty_df(spark, ddl)
    stats = index.term_stats(distinct)
    terms = [t for t in distinct if t in stats]
    if not terms:
        return empty_df(spark, ddl)
    if conjunctive and len(terms) < len(distinct):
        return empty_df(spark, ddl)  # a missing term can never match conjunctively
    n_docs = index.meta["n_docs"]
    idf_map = {t: bm25_idf(n_docs, stats[t]["df"]) for t in terms}

    blocks = index.blocks.where(F.col("term").isin(terms))
    meta = index.meta
    args = dict(
        k=k, k1=meta["k1"], b=meta["b"], avgdl=meta["avgdl"],
        idf_map=idf_map, n_query_terms=len(terms), conjunctive=conjunctive,
        codec=meta.get("codec", "varint"),
    )
    if mode == "taat":
        scorer = _shard_taat(shard_size=meta["shard_size"], **args)
    else:
        scorer = _shard_bmw(**args)

    per_shard = blocks.groupBy("shard").applyInPandas(scorer, TOPK_SCHEMA)
    topk = per_shard.orderBy(F.desc("score"), F.asc("doc_no")).limit(k)
    dm = getattr(index, "_docmap_dict", None)
    if dm is not None:
        # serving fast path (docmap pinned in the driver at warm()):
        # ONE Spark job — the per-shard scoring — then the <=k winners
        # enrich from the driver dict; the broadcast join below costs a
        # second materialization job per query for the same rows. Same
        # rows, same (score desc, doc_no) order. local_rows_df returns
        # them as a LocalRelation, so the caller's collect() runs no
        # second job (createDataFrame parallelized into a full task
        # set — ~250 ms per call on the bench box).
        rows = topk.collect()
        if all(r["doc_no"] in dm for r in rows):
            data = [
                (dm[r["doc_no"]][0], dm[r["doc_no"]][1], r["doc_no"], r["score"])
                for r in rows
            ]
            return local_rows_df(spark, ddl, data)
    return (
        index.docmap.join(F.broadcast(topk), "doc_no")
        .select("doc_id", "url", "doc_no", "score")
        .orderBy(F.desc("score"), F.asc("doc_no"))
    )


def bm25_topk_multi(
    msi,
    query: str,
    k: int = 10,
    mode: str = "taat",
    conjunctive: bool = False,
    tokens: list[str] | None = None,
) -> DataFrame:
    """BM25 top-k over a MultiSegmentIndex — the incremental-serving
    path: per-segment exact scoring with GLOBAL statistics, k-way merge
    of per-segment top-ks, ties on doc_id (cluster-size independent).

    Global statistics are tombstone-exact: N/avgdl come from the
    index's live-doc meta, and per-term df subtracts superseded docs
    containing the term (msi.df_corrections — probed once per term and
    cached on the handle, NOT per query), so SCORES are identical to a
    fresh single-segment rebuild of the latest corpus. BMW mode
    inflates each segment's stored block maxima by
    max(1, avgdl_global/avgdl_segment) to stay admissible under the
    global length normalization (see _TermCursor.bound_scale).

    Returns (doc_id, url, score) ordered by (score desc, doc_id asc).
    Tie semantics: the global merge breaks exact-score ties on doc_id,
    but per-shard top-k pruning inside the scorers keeps ties by the
    shard-local doc_no — the same fast-path caveat as single-segment
    bm25_topk (SURVEY §9.5): an exact float-score tie AT the per-shard
    k boundary can surface a different member of the tied group than a
    rebuild would. Exact BM25 ties across distinct docs are
    fp-measure-zero in practice; the rank-identity tests pass on real
    corpora, and exact-mode scoring (the reference-parity path) has
    the cluster-size-independent tie order.
    """
    spark = msi.spark
    toks = tokenize(query) if tokens is None else list(tokens)
    distinct = sorted(set(toks))
    ddl = "doc_id string, url string, score double"
    if not distinct:
        return empty_df(spark, ddl)
    stats = msi.term_stats(distinct)
    terms = [t for t in distinct if t in stats]
    if not terms:
        return empty_df(spark, ddl)
    # df correction: superseded docs still sit in their segment's terms
    # table; subtract the excluded docs that actually contain each term
    # (cached on the handle — one batched probe per previously-unseen
    # term, nothing per query on the steady-state serving path)
    df_corr = msi.df_corrections(terms)
    live_df = {t: stats[t]["df"] - df_corr.get(t, 0) for t in terms}
    terms = [t for t in terms if live_df[t] > 0]
    if not terms:
        return empty_df(spark, ddl)
    if conjunctive and len(terms) < len(distinct):
        return empty_df(spark, ddl)

    meta = msi.meta
    idf_map = {t: bm25_idf(meta["n_docs"], live_df[t]) for t in terms}
    args = dict(
        k=k, k1=meta["k1"], b=meta["b"], avgdl=meta["avgdl"],
        idf_map=idf_map, n_query_terms=len(terms), conjunctive=conjunctive,
    )
    dicts_ok = all(
        getattr(s, "_docmap_dict", None) is not None for s in msi.segments
    )
    parts = []
    for i, (seg, excl) in enumerate(zip(msi.segments, msi.excluded)):
        # codec is a per-SEGMENT property (segments of one family may
        # be built with different codecs across compactions)
        seg_args = dict(
            args,
            exclude=frozenset(int(x) for x in excl),
            codec=seg.meta.get("codec", "varint"),
        )
        if mode == "taat":
            scorer = _shard_taat(shard_size=seg.meta["shard_size"], **seg_args)
        else:
            scorer = _shard_bmw(
                bound_inflation=max(1.0, meta["avgdl"] / seg.meta["avgdl"]),
                **seg_args,
            )
        per_shard = (
            seg.blocks.where(F.col("term").isin(terms))
            .groupBy("shard")
            .applyInPandas(scorer, TOPK_SCHEMA)
        )
        if dicts_ok:
            parts.append(per_shard.withColumn("_seg", F.lit(i)))
        else:
            parts.append(
                seg.docmap.join(F.broadcast(per_shard), "doc_no")
                .select("doc_id", "url", "score")
            )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    if dicts_ok:
        # serving fast path (per-segment docmaps pinned at warm()): the
        # per-segment shard top-ks (<= n_shards*k rows each) collect in
        # ONE job and the k-way merge + enrichment run driver-side —
        # the join formulation costs one broadcast materialization per
        # segment per query. Same rows and the same (score desc,
        # doc_id asc) merge order.
        rows = merged.collect()
        enriched = []
        for r in rows:
            doc_id, url = msi.segments[r["_seg"]]._docmap_dict[r["doc_no"]]
            enriched.append((doc_id, url, r["score"]))
        enriched.sort(key=lambda x: (-x[2], x[0]))
        return local_rows_df(spark, ddl, enriched[:k])
    return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


BMW_STATS_SCHEMA = "shard int, n_blocks long, n_decoded long"


def bmw_block_stats(
    index: SegmentIndex,
    query: str,
    k: int = 10,
    conjunctive: bool = False,
    tokens: list[str] | None = None,
) -> dict:
    """Measured block-skip evidence for the BMW scorer: runs the exact
    WAND loop over the query's blocks but reports, per shard, how many
    blocks existed vs how many the cursors actually DECODED (seek()
    skips whole blocks by max_doc_no without decoding; the block-max
    threshold check skips scoring). Returns
    ``{"n_blocks", "n_decoded", "skip_rate"}`` totals.
    """
    spark = index.spark
    toks = tokenize(query) if tokens is None else list(tokens)
    terms = sorted(set(toks))
    stats = index.term_stats(terms)
    terms = [t for t in terms if t in stats]
    if not terms:
        return {"n_blocks": 0, "n_decoded": 0, "skip_rate": 0.0}
    meta = index.meta
    idf_map = {t: bm25_idf(meta["n_docs"], stats[t]["df"]) for t in terms}
    scorer = _shard_bmw(
        k=k, k1=meta["k1"], b=meta["b"], avgdl=meta["avgdl"],
        idf_map=idf_map, n_query_terms=len(terms), conjunctive=conjunctive,
        stats_mode=True, codec=meta.get("codec", "varint"),
    )
    rows = (
        index.blocks.where(F.col("term").isin(terms))
        .groupBy("shard")
        .applyInPandas(scorer, BMW_STATS_SCHEMA)
        .collect()
    )
    total = sum(r["n_blocks"] for r in rows)
    decoded = sum(r["n_decoded"] for r in rows)
    return {
        "n_blocks": int(total),
        "n_decoded": int(decoded),
        "skip_rate": round(1.0 - decoded / total, 3) if total else 0.0,
    }


QSET_SCHEMA = "query_id long, doc_no long, score double"


def _shard_taat_queryset(
    k: int, k1: float, b: float, avgdl: float, shard_size: int,
    q_ids: list[int], q_terms: list[list[str]], idf_map: dict[str, float],
    conjunctive: bool, codec: str = "varint", exclude: frozenset = frozenset(),
):
    """Multi-query TAAT shard scorer: every posting block of the
    queryset's TERM UNION is decoded exactly ONCE per shard, its
    idf*tfnorm contribution accumulated into each query that uses the
    term — Q queries cost one pass over the union's postings instead
    of Q passes.  Memory is O(n_queries x shard_size) accumulator
    floats; shard_size is docs-per-shard (bounded by construction at
    any corpus size), so batch the queryset if Q is huge."""
    term_to_qs: dict[str, list[int]] = {}
    for qi, ts in enumerate(q_terms):
        for t in ts:
            term_to_qs.setdefault(t, []).append(qi)
    nq = len(q_terms)
    need = np.array([len(ts) for ts in q_terms], dtype=np.int32)

    def score(key, pdf: pd.DataFrame):
        base = int(key[0]) * shard_size
        scores = np.zeros((nq, shard_size), dtype=np.float64)
        seen = np.zeros((nq, shard_size), dtype=np.int32)
        for term, tpdf in pdf.groupby("term"):
            contrib = np.zeros(shard_size, dtype=np.float64)
            present = np.zeros(shard_size, dtype=np.int32)
            idf = idf_map[term]
            for docs_bin, tfs_bin, dls_bin in zip(
                tpdf["docs_bin"], tpdf["tfs_bin"], tpdf["dls_bin"]
            ):
                doc_nos, tfs, dls = decode_posting_block(
                    docs_bin, tfs_bin, dls_bin, codec
                )
                idx = (doc_nos - np.uint64(base)).astype(np.int64)
                contrib[idx] += idf * bm25_tfnorm(tfs, dls, avgdl, k1, b)
                present[idx] = 1
            for qi in term_to_qs.get(term, ()):
                scores[qi] += contrib
                seen[qi] += present
        excl_arr = (
            np.fromiter(exclude, dtype=np.int64) if exclude else None
        )
        outs = []
        for qi in range(nq):
            mask = (seen[qi] == need[qi]) if conjunctive else (seen[qi] > 0)
            cand = np.nonzero(mask)[0]
            if excl_arr is not None and cand.size:
                # tombstoned doc_nos drop BEFORE top-k selection, same
                # as _shard_taat
                cand = cand[~np.isin(cand + base, excl_arr)]
            if cand.size == 0:
                continue
            topn = min(k, cand.size)
            # exact (score desc, doc_no asc) like _shard_taat — see its
            # argpartition-tie note
            order = np.lexsort((cand, -scores[qi][cand]))
            sel = cand[order[:topn]]
            outs.append(pd.DataFrame({
                "query_id": np.full(topn, q_ids[qi], dtype=np.int64),
                "doc_no": (sel + base).astype("int64"),
                "score": scores[qi][sel],
            }))
        if not outs:
            return pd.DataFrame(
                {"query_id": [], "doc_no": [], "score": []}
            ).astype({"query_id": "int64", "doc_no": "int64", "score": "float64"})
        return pd.concat(outs, ignore_index=True)

    return score


def bm25_queryset_topk(
    index: SegmentIndex,
    queries: dict[int, str],
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """Segment-native BATCH serving: a whole QUERYSET ranked in one
    Spark job — the LTR-training / eval-harness / hard-negative-mining
    shape over the real compressed index.  One blocks scan pruned to
    the UNION of all query terms, each block decoded once per shard
    (`_shard_taat_queryset`), per-query global top-k as a window.
    Q serving calls cost Q jobs + Q scans; this costs one of each.

    Per-query semantics are EXACTLY bm25_topk(mode="taat")'s
    (tokenize -> distinct terms -> drop terms missing from the index;
    conjunctive queries with a missing term return no rows; same
    idf/tfnorm/tie rules) — asserted row-identical per query in
    tests/test_bm25_queryset.py.

    Returns (query_id, doc_id, url, doc_no, score) with per-query rank
    order (score desc, doc_no asc), <= k rows per query."""
    from pyspark.sql import Window

    spark = index.spark
    ddl = "query_id long, doc_id string, url string, doc_no long, score double"
    q_ids, q_terms = [], []
    union_terms: set[str] = set()
    all_distinct: dict[int, list[str]] = {}
    for qid, q in queries.items():
        all_distinct[qid] = sorted(set(tokenize(q)))
        union_terms.update(all_distinct[qid])
    if not union_terms:
        return empty_df(spark, ddl)
    stats = index.term_stats(sorted(union_terms))
    for qid, distinct in all_distinct.items():
        terms = [t for t in distinct if t in stats]
        if not terms:
            continue
        if conjunctive and len(terms) < len(distinct):
            continue  # bm25_topk: a missing term can never match conjunctively
        q_ids.append(qid)
        q_terms.append(terms)
    if not q_ids:
        return empty_df(spark, ddl)
    live_terms = sorted({t for ts in q_terms for t in ts})
    n_docs = index.meta["n_docs"]
    idf_map = {t: bm25_idf(n_docs, stats[t]["df"]) for t in live_terms}

    meta = index.meta
    scorer = _shard_taat_queryset(
        k=k, k1=meta["k1"], b=meta["b"], avgdl=meta["avgdl"],
        shard_size=meta["shard_size"], q_ids=q_ids, q_terms=q_terms,
        idf_map=idf_map, conjunctive=conjunctive,
        codec=meta.get("codec", "varint"),
    )
    per_shard = (
        index.blocks.where(F.col("term").isin(live_terms))
        .groupBy("shard")
        .applyInPandas(scorer, QSET_SCHEMA)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_no"))
    topk = (
        per_shard.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
    return (
        index.docmap.join(F.broadcast(topk), "doc_no")
        .select("query_id", "doc_id", "url", "doc_no", "score")
        .orderBy("query_id", F.desc("score"), F.asc("doc_no"))
    )


def bm25_queryset_topk_multi(
    msi,
    queries: dict[int, str],
    k: int = 10,
    conjunctive: bool = False,
) -> DataFrame:
    """Batch queryset serving over a MultiSegmentIndex — the
    incremental-family counterpart of :func:`bm25_queryset_topk`: one
    job ranks the whole queryset across every live segment with GLOBAL
    statistics (tombstone-exact df corrections, global N/avgdl, BMW-
    style per-segment codec dispatch), per-segment scoring via the
    shared `_shard_taat_queryset` kernel (term-union blocks scan, each
    block decoded once per shard, tombstones dropped pre-top-k), then
    a per-query k-way merge with doc_id-asc ties — the same
    per-query semantics as :func:`bm25_topk_multi` (asserted
    row-identical in tests/test_bm25_queryset.py).

    Returns (query_id, doc_id, url, score), <= k rows per query,
    ordered (query_id, score desc, doc_id asc)."""
    from pyspark.sql import Window

    spark = msi.spark
    ddl = "query_id long, doc_id string, url string, score double"
    all_distinct = {qid: sorted(set(tokenize(q))) for qid, q in queries.items()}
    union_terms = sorted({t for ts in all_distinct.values() for t in ts})
    if not union_terms:
        return empty_df(spark, ddl)
    stats = msi.term_stats(union_terms)
    present = [t for t in union_terms if t in stats]
    df_corr = msi.df_corrections(present)
    live_df = {t: stats[t]["df"] - df_corr.get(t, 0) for t in present}
    live = {t for t in present if live_df[t] > 0}

    q_ids, q_terms = [], []
    for qid, distinct in all_distinct.items():
        terms = [t for t in distinct if t in live]
        if not terms:
            continue
        if conjunctive and len(terms) < len(distinct):
            continue
        q_ids.append(qid)
        q_terms.append(terms)
    if not q_ids:
        return empty_df(spark, ddl)
    live_terms = sorted({t for ts in q_terms for t in ts})
    meta = msi.meta
    idf_map = {t: bm25_idf(meta["n_docs"], live_df[t]) for t in live_terms}

    parts = []
    for seg, excl in zip(msi.segments, msi.excluded):
        scorer = _shard_taat_queryset(
            k=k, k1=meta["k1"], b=meta["b"], avgdl=meta["avgdl"],
            shard_size=seg.meta["shard_size"], q_ids=q_ids, q_terms=q_terms,
            idf_map=idf_map, conjunctive=conjunctive,
            codec=seg.meta.get("codec", "varint"),
            exclude=frozenset(int(x) for x in excl),
        )
        per_shard = (
            seg.blocks.where(F.col("term").isin(live_terms))
            .groupBy("shard")
            .applyInPandas(scorer, QSET_SCHEMA)
        )
        # reduce to a per-query top-k BEFORE the docmap broadcast: the
        # raw per-shard frame holds up to n_shards*Q*k rows, so for a
        # corpus-sized queryset (the LTR/eval shape) the forced
        # broadcast would grow with Q unbounded; after the window it is
        # <= Q*k rows per segment — the same bound the single-segment
        # path has. Tie caveat: this prunes on the shard-local
        # (score desc, doc_no) order like every per-shard top-k here
        # (exact fp score ties at the k boundary — measure-zero — may
        # surface a different tied member than the unpruned merge).
        wseg = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_no")
        )
        per_shard = (
            per_shard.withColumn("_rn", F.row_number().over(wseg))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
        parts.append(
            seg.docmap.join(F.broadcast(per_shard), "doc_no")
            .select("query_id", "doc_id", "url", "score")
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )
