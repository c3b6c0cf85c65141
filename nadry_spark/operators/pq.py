"""Product quantization ANN (Jégou, Douze & Schmid, TPAMI'11,
"Product quantization for nearest neighbor search") — the
memory-bound scale path for embedding search: a D-dim vector is
split into m contiguous subvectors, each quantized against its own
small codebook, so the corpus is stored as m single-byte codes per
vector (64x-256x smaller than float32) and queries score candidates
from a precomputed distance table without touching the original
vectors.  At 10^12 documents the raw embeddings don't fit anywhere
hot — PQ codes do; IVF (operators/similarity) narrows WHERE to look,
PQ shrinks WHAT is stored and compared.

Asymmetric distance computation (ADC): for a query q, build the
m x ksub table  dt[s][c] = ||q_s - codebook_s[c]||^2  (tiny: per
query, m*ksub doubles), then every candidate's approximate distance
is the sum of m table lookups — here a broadcast join of the table
against the long-form (id, sub, code) frame and one (query, id)
aggregation.  No corpus-sized vector math at query time.

Codebooks reuse the deterministic Lloyd machinery of
:func:`nadry_spark.operators.similarity.ivf_build` per subspace
(seeded from the first ksub vectors by id, distances on the 1e-9
grid, means on the 1e-6 grid) so training is RNG-free and the
cross-engine oracle can rebuild codebooks exactly; per-subspace and
total distances are quantized at 1e-9 with id-asc tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from nadry_spark.operators.similarity import ivf_build

# Shipped PQ operating point (single source of truth — __spark_entry__
# imports these): m=8 x ksub=16 = 32 bits/vector (32x compression vs
# float32) and a 400-candidate re-rank pool. Chosen from the r5 numpy
# sweep on the bench embeddings (near-uniform 2000x64 vectors, the
# WORST case for coarse quantization): rerank recall@10 = 0.92 at
# pool=400 (vs 0.46 at the old m=4/pool=50 defaults), ADC-only 0.24.
# The >=0.9 rerank floor is asserted in tests/test_similarity_batch.py
# (test_pq_shipped_operating_point_floor).
PQ_M = 8
PQ_KSUB = 16
PQ_RERANK_POOL = 400


def _vec_sql(vec_col: str) -> str:
    return f"`{vec_col}`" if vec_col.isidentifier() else vec_col


def pq_build(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train m per-subspace codebooks and encode the corpus.

    Returns (codes, codebooks): codes = (id, sub, code) long form —
    the compressed representation a 100 TB deployment persists instead
    of the vectors; codebooks = list of per-subspace [(cid, centroid)].
    ``iters`` Lloyd rounds per subspace (0 = seed centroids, the
    oracle-mirrored default; refinement is the same machinery
    ivf_iter1 already verifies).

    Default ``m=8`` is the shipped operating point (32x compression,
    rerank recall@10 0.92 at ``PQ_RERANK_POOL`` — the r5 sweep); it is
    the single source of truth that ``__spark_entry__.PQ_M`` imports.

    Cost shape: the first ksub FULL vectors are collected once and
    sliced driver-side into every subspace's seed codebook (one job,
    not one per subspace — each subspace's seeds are by construction
    slices of the same rows), and the corpus is encoded in ONE scan
    that computes all m subspace argmins per row (an m-entry struct
    explode) instead of m unioned per-subspace assignment scans.  Both
    produce bit-identical codes to the per-subspace formulation: the
    argmin expression per subspace is unchanged
    (:func:`~nadry_spark.operators.similarity._nearest_centroid_expr`
    over the same slice)."""
    from nadry_spark.operators.similarity import _collect_vectors_local

    loc = _collect_vectors_local(vectors, id_col, vec_col)
    if loc is not None and len(loc["pdf"]):
        return _pq_build_local(
            vectors.sparkSession, vectors.schema[id_col].dataType, loc, m,
            ksub, iters, id_col,
        )
    first = vectors.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("pq_build: empty vector table")
    d = first["d"]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m

    seed_rows = vectors.orderBy(id_col).limit(ksub).select(vec_col).collect()
    seeds = [[float(x) for x in r[vec_col]] for r in seed_rows]

    codebooks = []
    for s in range(m):
        sub_seeds = [
            (i, v[s * d_sub : (s + 1) * d_sub]) for i, v in enumerate(seeds)
        ]
        if iters == 0:
            codebooks.append(sub_seeds)
        else:
            sub = vectors.select(
                id_col, F.slice(F.col(vec_col), s * d_sub + 1, d_sub).alias("subv")
            )
            _, cents = ivf_build(
                sub, n_centroids=ksub, iters=iters, id_col=id_col,
                vec_col="subv", seed_centroids=sub_seeds,
            )
            codebooks.append(cents)

    from nadry_spark.operators.similarity import _nearest_centroid_sql

    entries = ",".join(
        f"struct({s} AS sub, "
        + _nearest_centroid_sql(
            f"slice({_vec_sql(vec_col)}, {s * d_sub + 1}, {d_sub})", codebooks[s]
        )
        + " AS code)"
        for s in range(m)
    )
    codes = (
        vectors.select(id_col, F.explode(F.expr(f"array({entries})")).alias("e"))
        .select(id_col, F.col("e.sub").alias("sub"), F.col("e.code").alias("code"))
    )
    return codes.localCheckpoint(), codebooks


def _pq_build_local(spark, id_dtype, loc, m, ksub, iters, id_col):
    """pq_build on a collected table (driver ANN fast-path family, see
    operators/similarity): per-subspace codebooks via
    :func:`~nadry_spark.operators.similarity._lloyd_local` (identical
    seed/assignment/quantization rules), codes as a LOCAL long-form
    frame carrying the arrays for downstream ADC calls."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    from nadry_spark.operators.similarity import _lloyd_local

    ids, V = loc["ids"], loc["V"]
    n, d = V.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    d_sub = d // m
    order = np.argsort(ids, kind="stable")[:ksub]
    codebooks = []
    codes_mat = np.empty((n, m), dtype=np.int64)
    for s in range(m):
        sub = V[:, s * d_sub : (s + 1) * d_sub]
        sub_seeds = [
            (i, [float(x) for x in V[order[i], s * d_sub : (s + 1) * d_sub]])
            for i in range(len(order))
        ]
        assign, cents = _lloyd_local(ids, sub, sub_seeds, iters)
        codebooks.append(cents)
        codes_mat[:, s] = assign
    pdf = pd.DataFrame(
        {
            id_col: np.repeat(ids, m),
            "sub": np.tile(np.arange(m, dtype=np.int32), n),
            "code": codes_mat.reshape(-1).astype(np.int32),
        }
    )
    schema = StructType(
        [
            StructField(id_col, id_dtype, True),
            StructField("sub", IntegerType(), False),
            StructField("code", IntegerType(), False),
        ]
    )
    codes_df = spark.createDataFrame(pdf, schema)
    codes_df._nadry_local = {
        "ids": ids, "V": V, "codes": codes_mat, "codebooks": codebooks,
    }
    return codes_df, codebooks


def _adc_dists_local(local, codebooks, qv):
    """round-9 ADC distance of every corpus row to one query vector:
    per-subspace round-9 tables (sequential-fold squared distances),
    summed in fixed s order like :func:`_adc_dist_expr`."""
    import numpy as np

    from nadry_spark.operators.similarity import _d2_round9

    codes_mat = local["codes"]
    n = codes_mat.shape[0]
    d_sub = len(codebooks[0][0][1])
    total = np.zeros(n, dtype=np.float64)
    for s, cents in enumerate(codebooks):
        Cs = np.array([c for _, c in cents], dtype=np.float64)
        cids = np.array([cid for cid, _ in cents], dtype=np.int64)
        qsub = np.asarray(qv, dtype=np.float64)[s * d_sub : (s + 1) * d_sub]
        d2 = _d2_round9(qsub[None, :], Cs)[0]
        total += d2[np.searchsorted(cids, codes_mat[:, s])]
    return np.round(total, 9)


def _pq_topk_rows_local(local, codebooks, qid, qv, k):
    """Per-query ADC top-k (dist asc, id asc, self excluded)."""
    import numpy as np

    ids = local["ids"]
    dist = _adc_dists_local(local, codebooks, qv)
    mask = ids != qid
    cand_ids = ids[mask]
    order = np.lexsort((cand_ids, dist[mask]))[:k]
    return [(qid, r + 1, cand_ids[i]) for r, i in enumerate(order)]


def _pq_topk_frame(spark, rows, id_dtype):
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out = pd.DataFrame(rows, columns=["query_id", "rank", "neighbour_id"])
    schema = StructType(
        [
            StructField("query_id", id_dtype, True),
            StructField("rank", LongType(), False),
            StructField("neighbour_id", id_dtype, True),
        ]
    )
    return spark.createDataFrame(out, schema)


def pq_topk(
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbour_id) by ADC distance (asc, id-asc
    ties), self excluded. `queries` carries original vectors; the
    corpus side is codes only."""
    from nadry_spark.operators.similarity import (
        _collect_vectors_local,
        _sq_dist_sql,
    )

    local = getattr(codes, "_nadry_local", None)
    if local is not None:
        qloc = _collect_vectors_local(queries, id_col, vec_col)
        if qloc is not None:
            rows = []
            for qid, qv in zip(qloc["ids"].tolist(), qloc["V"]):
                rows.extend(_pq_topk_rows_local(local, codebooks, qid, qv, k))
            return _pq_topk_frame(
                codes.sparkSession, rows, codes.schema[id_col].dataType
            )

    d_sub = len(codebooks[0][0][1])
    # the whole m x ksub distance table in ONE scan of the query side
    # (an (m*ksub)-entry struct explode) — the per-subspace union
    # recomputed the query scan m times for the same rows.  SQL-text
    # assembly (one JVM parse) — the Column-API build of these m*ksub
    # nested expressions cost ~3.2s of py4j round-trips per call,
    # dwarfing the query's own execution.
    entries = []
    for s, cents in enumerate(codebooks):
        qsub = f"slice({_vec_sql(vec_col)}, {s * d_sub + 1}, {d_sub})"
        for cid, cvec in cents:
            entries.append(
                f"struct({s} AS sub, {int(cid)} AS code, "
                f"{_sq_dist_sql(qsub, cvec)} AS d2)"
            )
    dtab = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(F.expr("array(" + ",".join(entries) + ")")).alias("e"),
        )
        .select(
            "query_id",
            F.col("e.sub").alias("sub"),
            F.col("e.code").alias("code"),
            F.col("e.d2").alias("d2"),
        )
    )

    scored = (
        codes.join(F.broadcast(dtab), ["sub", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("d2"), 9).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                F.col(id_col).alias("neighbour_id"))
    )


def pq_codes_wide(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Long-form (id, sub, code) -> wide (id, codes array<int> ordered
    by sub) — the shape a 100 TB deployment PERSISTS: m small ints per
    vector in one row, so ADC scoring is a per-row expression instead
    of an m-way join + regroup."""
    return (
        codes.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select(id_col, F.transform("sc", lambda x: x["code"]).alias("codes"))
    )


def _dtab_expr(codebooks: list, vec_col: str):
    """The per-query ADC distance table as ONE array<map<int,double>>
    column expression: tabs[s][cid] = round(||q_s - codebook_s[cid]||^2,
    9) with subspaces in s order and entries keyed BY cid (a map, not a
    position — pq_build delegates to the Lloyd machinery, which drops
    empty clusters when iters>0, so cids need not be contiguous; a
    positional lookup would silently read the wrong entry or NULL for
    such a codebook).  Codebooks are driver-side literals (m x ksub x
    d_sub floats — always small by construction), so the expression
    tree size is independent of both corpus and query-set size."""
    from nadry_spark.operators.similarity import _sq_dist_sql

    d_sub = len(codebooks[0][0][1])
    per_sub = []
    for s, cents in enumerate(codebooks):
        qsub = f"slice({_vec_sql(vec_col)}, {s * d_sub + 1}, {d_sub})"
        cids = "array(" + ",".join(str(int(cid)) for cid, _cvec in cents) + ")"
        dists = "array(" + ",".join(_sq_dist_sql(qsub, cvec) for _cid, cvec in cents) + ")"
        per_sub.append(f"map_from_arrays({cids}, {dists})")
    return F.expr("array(" + ",".join(per_sub) + ")")


def _adc_dist_expr():
    """round(sum_s tabs[s][codes[s]], 9) from the wide `codes` and the
    per-query `tabs` columns — whole-stage-codegen map lookups keyed by
    cid, no join, no regroup.  Summation is in fixed s order (0..m-1);
    the long-form path's groupBy sum is order-free, but both round the
    total on the 1e-9 grid, so the results agree (asserted row-identical
    in tests/test_pq_batch.py, incl. a non-contiguous-cid codebook)."""
    return F.round(
        F.aggregate(
            F.zip_with(
                F.col("tabs"),
                F.col("codes"),
                lambda t, c: F.element_at(t, c.cast("int")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )


def pq_topk_batch(
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
    warn_pairs: int = 50_000_000,
) -> DataFrame:
    """DataFrame-native batch ADC top-k: the query set stays a TABLE
    end-to-end — no broadcast of a queries-sized distance table, no
    corpus x queries x m exploded join.  Each query row carries its
    m x ksub distance table as an array column (:func:`_dtab_expr`),
    the corpus side is the wide codes (m ints per row), and scoring is
    a per-pair expression over the flat-scan pair stream.  Same rows as
    :func:`pq_topk` (asserted in tests); use it when the query side is
    itself corpus-sized (cross-corpus linkage, batch dedup).

    Scale shape: flat ADC is inherently corpus x queries — what batch
    mode removes is the per-pair m-row blow-up and the queries-sized
    broadcast, leaving one pair-stream expression scan + the per-query
    top-k window.  When the corpus carries an IVF coarse quantizer,
    :func:`ivfpq_topk_batch` prunes the pair stream to probed lists
    first — the FAISS IVFADC deployment shape.

    ``stats`` (optional, same discipline as the LSH family's cap
    reporting): fills ``corpus_rows`` / ``query_rows`` /
    ``adc_pairs`` (= corpus x queries, the inherent flat-ADC stream
    size) and logs a warning pointing at :func:`ivfpq_topk_batch`
    when the pair stream exceeds ``warn_pairs`` — the quadratic
    shape should never be picked silently for corpus x corpus
    linkage. Costless when ``stats`` is None (no counting jobs on
    the serving path)."""
    from nadry_spark.operators.similarity import _collect_vectors_local

    local = getattr(codes, "_nadry_local", None)
    qloc = (
        _collect_vectors_local(queries, id_col, vec_col)
        if local is not None
        else None
    )
    if stats is not None:
        import logging

        m = len(codebooks)
        if local is not None and qloc is not None:
            n_corpus = len(local["ids"])
            n_queries = len(qloc["ids"])
        else:
            n_corpus = codes.count() // max(1, m)
            n_queries = queries.count()
        stats["corpus_rows"] = n_corpus
        stats["query_rows"] = n_queries
        stats["adc_pairs"] = n_corpus * n_queries
        if stats["adc_pairs"] > warn_pairs:
            logging.getLogger("nadry_spark.pq").warning(
                "pq_topk_batch: flat ADC will stream %d corpus x %d query "
                "= %d pairs (> %d); for corpus-scale query sets use "
                "ivfpq_topk_batch (IVF-pruned ADC) instead",
                n_corpus, n_queries, stats["adc_pairs"], warn_pairs,
            )
    if local is not None and qloc is not None:
        rows = []
        for qid, qv in zip(qloc["ids"].tolist(), qloc["V"]):
            rows.extend(_pq_topk_rows_local(local, codebooks, qid, qv, k))
        return _pq_topk_frame(
            codes.sparkSession, rows, codes.schema[id_col].dataType
        )
    wide = pq_codes_wide(codes, id_col=id_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), _dtab_expr(codebooks, vec_col).alias("tabs")
    )
    scored = (
        wide.crossJoin(q)
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbour_id"),
            _adc_dist_expr().alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbour_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "neighbour_id"
        )
    )


def ivfpq_topk_batch(
    assigned: DataFrame,
    centroids: list,
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ (the FAISS IVFADC deployment shape, Jégou TPAMI'11 §IV):
    a coarse quantizer routes each query to its `nprobe` nearest
    inverted lists, and ONLY those lists' PQ codes are ADC-scored —
    candidate count is a corpus fraction (~nprobe/n_centroids) and the
    scored payload is m bytes/vector, so neither raw vectors nor the
    full code table are touched per query.  Queries stay a DataFrame
    end-to-end: probe selection is the same broadcast-centroid
    expression as :func:`~nadry_spark.operators.similarity
    .ivf_topk_batch`, the probes->lists join is a plain equi-join on
    cid (broadcast while the query side is small, shuffle-hash when
    both sides are corpus-sized), and the ADC distance is the per-pair
    expression of :func:`pq_topk_batch`.

    `assigned` is ivf_build's (id, cid) coarse assignment; `centroids`
    its centroid list; `codes`/`codebooks` from :func:`pq_build`.
    Returns (query_id, rank, neighbour_id) by ADC distance asc,
    id-asc ties, self excluded."""
    from nadry_spark.operators.similarity import (
        _centroid_probe_expr,
        _collect_vectors_local,
        _d2_round9,
    )

    a_local = getattr(assigned, "_nadry_local", None)
    c_local = getattr(codes, "_nadry_local", None)
    if a_local is not None and c_local is not None:
        qloc = _collect_vectors_local(queries, id_col, vec_col)
        if qloc is not None:
            import numpy as np

            # align the coarse assignment to the codes table's row
            # order by id (separate collects of the same table need
            # not share an order)
            a_ids, a_cid = a_local["ids"], a_local["cid"]
            a_order = np.argsort(a_ids, kind="stable")
            pos = np.searchsorted(a_ids[a_order], c_local["ids"])
            pos = np.minimum(pos, len(a_ids) - 1)
            row_cid = a_cid[a_order][pos]
            matched = a_ids[a_order][pos] == c_local["ids"]
            C = np.array([c for _, c in centroids], dtype=np.float64)
            cent_ids = np.array([c for c, _ in centroids], dtype=np.int64)
            ids = c_local["ids"]
            rows = []
            for qid, qv in zip(qloc["ids"].tolist(), qloc["V"]):
                d2 = _d2_round9(np.asarray(qv, dtype=np.float64)[None, :], C)[0]
                probe = cent_ids[np.lexsort((cent_ids, d2))[:nprobe]]
                mask = matched & np.isin(row_cid, probe) & (ids != qid)
                dist = _adc_dists_local(c_local, codebooks, qv)
                cand_ids = ids[mask]
                order = np.lexsort((cand_ids, dist[mask]))[:k]
                rows.extend(
                    (qid, r + 1, cand_ids[i]) for r, i in enumerate(order)
                )
            return _pq_topk_frame(
                codes.sparkSession, rows, codes.schema[id_col].dataType
            )

    probes = queries.select(
        F.col(id_col).alias("query_id"),
        _dtab_expr(codebooks, vec_col).alias("tabs"),
        F.explode(_centroid_probe_expr(vec_col, centroids, nprobe)).alias("p"),
    ).select("query_id", "tabs", F.col("p.cid").alias("cid"))
    lists = assigned.select(id_col, "cid").join(
        pq_codes_wide(codes, id_col=id_col), id_col
    )
    scored = (
        lists.join(probes, "cid")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbour_id"),
            _adc_dist_expr().alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbour_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", F.col("rank").cast("long").alias("rank"), "neighbour_id"
        )
    )


def pq_rerank_topk(
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    pool: int = PQ_RERANK_POOL,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch: bool = False,
) -> DataFrame:
    """The production PQ deployment shape: ADC generates a cheap
    candidate pool from codes alone, then ONLY the pool's original
    vectors are fetched (here: joined from `vectors` — in a 100 TB
    deployment, point reads from cold storage) and re-ranked by exact
    cosine.  Recall approaches brute force at pool >> k while the
    scan stays code-sized.  (query_id, rank, neighbour_id), cosine
    ties on the 1e-9 grid + id asc like brute_force_topk.

    Default ``pool=PQ_RERANK_POOL`` (400) is the shipped operating
    point: measured recall@10 0.92 on the bench embeddings, with the
    pytest floor in tests/test_similarity_batch.py — the old pool=50
    default silently under-recalled (0.46, the r04 finding).

    ``batch=True`` generates the candidate pool with
    :func:`pq_topk_batch` (queries stay a DataFrame, no queries-sized
    broadcast) — same rows either way (asserted in
    tests/test_pq_batch.py); use it when the query side is itself
    corpus-sized."""
    from nadry_spark.operators.similarity import (
        _collect_vectors_local,
        _seq_dot,
        cosine,
    )

    local = getattr(codes, "_nadry_local", None)
    if local is not None:
        qloc = _collect_vectors_local(queries, id_col, vec_col)
        vloc = (
            _collect_vectors_local(vectors, id_col, vec_col)
            if qloc is not None
            else None
        )
        if qloc is not None and vloc is not None:
            import numpy as np

            v_ids, Vv = vloc["ids"], vloc["V"]
            v_order = np.argsort(v_ids, kind="stable")
            v_ids_sorted = v_ids[v_order]
            v_norms = (
                np.sqrt(np.cumsum(Vv * Vv, axis=1)[:, -1])[v_order]
                if len(v_ids)
                else np.empty(0)
            )
            Vv_sorted = Vv[v_order] if len(v_ids) else Vv
            rows = []
            for qid, qv in zip(qloc["ids"].tolist(), qloc["V"]):
                pool_rows = _pq_topk_rows_local(local, codebooks, qid, qv, pool)
                cand_ids = np.array([r[2] for r in pool_rows])
                # fetch the pool's ORIGINAL vectors (inner-join
                # semantics: ids absent from `vectors` drop out)
                pos = np.searchsorted(v_ids_sorted, cand_ids)
                pos = np.minimum(pos, max(0, len(v_ids_sorted) - 1))
                ok = (
                    (v_ids_sorted[pos] == cand_ids)
                    if len(v_ids_sorted)
                    else np.zeros(len(cand_ids), dtype=bool)
                )
                cand_ids, pos = cand_ids[ok], pos[ok]
                qv = np.asarray(qv, dtype=np.float64)
                qn = np.sqrt(np.cumsum(qv * qv)[-1]) if len(qv) else 0.0
                cos = _seq_dot(Vv_sorted[pos], qv) / (qn * v_norms[pos])
                c9 = np.round(cos, 9)
                order = np.lexsort((cand_ids, -c9))[:k]
                rows.extend((qid, r + 1, cand_ids[i]) for r, i in enumerate(order))
            return _pq_topk_frame(
                codes.sparkSession, rows, codes.schema[id_col].dataType
            )

    pool_fn = pq_topk_batch if batch else pq_topk
    cand = pool_fn(
        codes, codebooks, queries, k=pool, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbour_id")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbour_id"), F.col(vec_col).alias("vvec")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbour_id")
        .select(
            "query_id",
            "neighbour_id",
            F.round(cosine(F.col("qvec"), F.col("vvec")), 9).alias("c9"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c9"), F.asc("neighbour_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbour_id")
    )


def pq_rerank_auto(
    codes: DataFrame,
    codebooks: list,
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    target_recall: float = 0.9,
    sample_queries: int = 5,
    start_pool: int = 100,
    max_frac: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stats: dict | None = None,
) -> DataFrame:
    """Recall-targeted pool sizing for the PQ+re-rank deployment:
    pick the smallest pool (start_pool, 2x, 4x, ...) whose estimated
    recall@k reaches ``target_recall``, then run the full re-rank at
    that pool.  A fixed default pool silently under-recalls when the
    embedding distribution is hard for coarse quantization (the r04
    finding: recall@10 = 0.46 at pool=50 on the near-uniform bench
    vectors); this makes the operating point a measured contract.

    The estimate is cheap and fully bounded: exact ground truth is
    computed for ``sample_queries`` queries only (sample x corpus dot
    products — one scan), the ADC candidate ranking for the sample is
    computed ONCE at the maximum pool, and every smaller pool is then
    evaluated driver-side by slicing that one collected candidate list
    (sample x max_pool rows — KB-sized), so growing the search costs
    no extra Spark jobs.  The chosen pool, its recall estimate, and
    the per-pool curve are reported via ``stats`` — never silent.

    Caveat: the estimate is over the query SAMPLE (default: the first
    ``sample_queries`` by id); a pathologically non-uniform query
    distribution should pass a representative sample instead.
    """
    from nadry_spark.operators.similarity import brute_force_topk

    n_vec = vectors.count()
    max_pool = max(start_pool, int(n_vec * max_frac))
    sample = queries.orderBy(id_col).limit(sample_queries)

    # exact ground truth on the sample only
    gt: dict[int, set] = {}
    for r in brute_force_topk(
        vectors, sample, k=k, id_col=id_col, vec_col=vec_col
    ).collect():
        gt.setdefault(r["query_id"], set()).add(r["neighbour_id"])

    # one ADC ranking at max_pool + exact cosines for those candidates
    cand = pq_topk(
        codes, codebooks, sample, k=max_pool, id_col=id_col, vec_col=vec_col
    ).withColumnRenamed("rank", "adc_rank")
    from nadry_spark.operators.similarity import cosine as _cos

    q = sample.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    v = vectors.select(F.col(id_col).alias("neighbour_id"), F.col(vec_col).alias("vvec"))
    rows = (
        cand.join(F.broadcast(q), "query_id")
        .join(v, "neighbour_id")
        .select(
            "query_id", "neighbour_id", "adc_rank",
            F.round(_cos(F.col("qvec"), F.col("vvec")), 9).alias("c9"),
        )
        .collect()
    )
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)

    curve: list[tuple[int, float]] = []
    pool = min(start_pool, max_pool)
    chosen, est = max_pool, 0.0
    while True:
        recalls = []
        for qid, items in by_q.items():
            sub = [r for r in items if r["adc_rank"] <= pool]
            sub.sort(key=lambda r: (-r["c9"], r["neighbour_id"]))
            got = {r["neighbour_id"] for r in sub[:k]}
            if gt.get(qid):
                recalls.append(len(got & gt[qid]) / len(gt[qid]))
        rec = sum(recalls) / len(recalls) if recalls else 0.0
        curve.append((pool, round(rec, 3)))
        chosen, est = pool, rec
        if rec >= target_recall or pool >= max_pool:
            break
        # clamp the last doubling to max_pool: the ADC candidate
        # ranking was already computed at max_pool, so the largest
        # available pool is always in the curve (a bare pool *= 2
        # could skip it — e.g. start=100, max=250 tested only 100/200
        # and reported target_met=False with 250 unevaluated)
        pool = min(pool * 2, max_pool)
    if stats is not None:
        stats["pool"] = chosen
        stats["recall_estimate"] = round(est, 3)
        stats["pool_curve"] = curve
        stats["target_met"] = est >= target_recall

    return pq_rerank_topk(
        codes, codebooks, queries, vectors, k=k, pool=chosen,
        id_col=id_col, vec_col=vec_col,
    )
