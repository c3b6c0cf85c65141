"""Connected components by min-label propagation — the clustering
step that turns near-duplicate PAIRS (MinHash/SimHash/cosine output)
into duplicate GROUPS for keep-one-per-cluster corpus cleaning.

Spark has no built-in connected components (GraphFrames is an
external package), so this implements the classic iterative
formulation with DataFrame ops only: every vertex starts labeled with
its own id; each round every vertex takes the min of its own label
and its neighbours' labels. A component converges once the minimum id
has reached every member — O(diameter) rounds, each round one join +
one min-aggregate (two shuffles on vertex id).

Near-dup graphs are almost always unions of small quasi-cliques
(every member of a dup group pairs with most others), so diameter is
tiny and a handful of rounds converges. For graphs with long chains
at 100 TB scale the round count grows with diameter — the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) halves diameter per
round and would be the upgrade path; for dedup clustering the plain
propagation is the right cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    until_converged: bool = False,
    checkpoint_every: int = 3,
    driver_max_edges: int | None = 2_000_000,
) -> DataFrame:
    """(v, component) for every vertex appearing in ``edges``;
    ``component`` is the minimum vertex id reachable within
    ``iterations`` propagation rounds (= the true component id once
    rounds >= graph diameter).

    ``until_converged=True`` additionally stops early when a round
    changes no label (one count() job per round — the driver-side
    loop is control flow only, all data stays distributed). Fixed
    ``iterations`` with ``until_converged=False`` is bit-deterministic
    regardless of convergence, which is what the cross-engine oracle
    checks rely on.

    Driver fast path (the bpe_merges_local / mmr_select precedent):
    dedup pair graphs are a tiny fraction of the corpus (LSH/PPJoin
    candidates that VERIFIED — thousands of edges for thousands of
    docs), so when the symmetrized edge set is driver-sized
    (``driver_max_edges``, default 2M ~ tens of MB) the k propagation
    rounds run as vectorized numpy min-scatters on one collected edge
    list instead of k (join + min-aggregate) Spark rounds (2 shuffles
    each). The simulation is round-for-round the SAME recurrence
    (label(v) <- min(label(v), min over neighbours)), on index ranks
    of the sorted vertex set, so min-by-rank == min-by-value for
    numeric ids and for strings (UTF-8 byte order == code-point
    order) — bit-identical output to the distributed loop, asserted
    in tests/test_components_fuzzy.py. Past the threshold (true
    corpus-scale pair graphs) the distributed loop runs unchanged;
    ``driver_max_edges=None`` disables the fast path.
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.distinct().localCheckpoint()
    if driver_max_edges is not None and und.count() <= driver_max_edges:
        return _cc_local(und, iterations, until_converged)
    labels = (
        und.select(F.col("a").alias("v")).distinct()
        .withColumn("component", F.col("v"))
    )
    for i in range(iterations):
        nbr = und.join(
            labels.select(F.col("v").alias("b"), "component"), "b"
        ).select(F.col("a").alias("v"), "component")
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
        )
        if (i + 1) % checkpoint_every == 0 or until_converged:
            new_labels = new_labels.localCheckpoint()
        if until_converged:
            changed = (
                new_labels.join(labels.withColumnRenamed("component", "_old"), "v")
                .where(F.col("component") != F.col("_old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
    return labels


def _cc_local(und: DataFrame, iterations: int, until_converged: bool) -> DataFrame:
    """Driver-side simulation of ``iterations`` min-label-propagation
    rounds over the (already symmetrized, distinct, checkpointed)
    edge frame — exactly the recurrence of the distributed loop,
    vectorized with numpy min-scatters."""
    import numpy as np

    pdf = und.toPandas()
    spark = und.sparkSession
    a_vals = pdf["a"].to_numpy()
    b_vals = pdf["b"].to_numpy()
    verts = np.unique(np.concatenate([a_vals, b_vals]))
    a_idx = np.searchsorted(verts, a_vals)
    b_idx = np.searchsorted(verts, b_vals)
    labels = np.arange(len(verts), dtype=np.int64)
    for _ in range(iterations):
        new = labels.copy()
        # label(a) <- min(label(a), min over labels of its neighbours)
        np.minimum.at(new, a_idx, labels[b_idx])
        if until_converged and np.array_equal(new, labels):
            break
        labels = new
    vtype = und.schema["a"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("v", vtype, True), StructField("component", vtype, True)]
    )
    rows = list(zip(verts.tolist(), verts[labels].tolist()))
    return spark.createDataFrame(rows, schema)


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    driver_max_edges: int | None = 2_000_000,
) -> DataFrame:
    """Synchronous label propagation communities (Raghavan et al.,
    Phys. Rev. E 2007, "Near linear time algorithm to detect community
    structures in large-scale networks") — (v, community) after a
    FIXED number of rounds.

    Where :func:`connected_components` answers "which docs are
    transitively linked at all" (dedup clusters), LPA answers "which
    densely-linked neighbourhood does each page sit in" (site/domain
    communities for crawl partitioning, domain-cap grouping, topical
    sampling strata).

    Every vertex starts labeled with its own id; each round every
    vertex adopts the most frequent label among its neighbours
    (vertex-count weighted), ties broken by MIN label — with a fixed
    round count this is bit-deterministic, so the DuckDB oracle can
    unroll the rounds as chained CTEs. Vertices keep their previous
    label on rounds where they have no labeled neighbour (isolated
    vertices never occur here: vertices are edge endpoints after
    symmetrization).

    Scale: per round one join keyed by vertex + one (v, label) count
    + one per-v argmax window — all shuffles on the vertex id, no
    driver-side data. Lineage capped per round with localCheckpoint.
    """
    from pyspark.sql import Window

    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.where(F.col("a") != F.col("b")).distinct().localCheckpoint()
    if driver_max_edges is not None and und.count() <= driver_max_edges:
        return _lpa_local(und, iterations)
    labels = und.select(F.col("a").alias("v")).distinct().withColumn(
        "community", F.col("v")
    )
    w = Window.partitionBy("v").orderBy(F.desc("cnt"), F.asc("community"))
    for _ in range(iterations):
        nbr = und.join(
            labels.select(F.col("v").alias("b"), "community"), "b"
        ).select(F.col("a").alias("v"), "community")
        labels = (
            nbr.groupBy("v", "community")
            .agg(F.count("*").alias("cnt"))
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("v", "community")
            .localCheckpoint()
        )
    return labels


def _lpa_local(und: DataFrame, iterations: int) -> DataFrame:
    """Driver-side simulation of ``iterations`` synchronous LPA rounds
    over the (symmetrized, self-loop-free, distinct, checkpointed)
    edge frame — the exact argmax-by-(count desc, label asc) recurrence
    of the distributed loop, on index ranks of the sorted vertex set
    (count/argmax are pure integer ops, so the output is bit-identical;
    min-by-rank == min-by-value, same argument as _cc_local)."""
    import numpy as np

    pdf = und.toPandas()
    spark = und.sparkSession
    a_vals = pdf["a"].to_numpy()
    b_vals = pdf["b"].to_numpy()
    verts = np.unique(np.concatenate([a_vals, b_vals]))
    a_idx = np.searchsorted(verts, a_vals)
    b_idx = np.searchsorted(verts, b_vals)
    n = len(verts)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iterations):
        # counts[(v, neighbour-label)] -> argmax by (count desc, label asc)
        key = a_idx.astype(np.int64) * n + labels[b_idx]
        uniq, cnt = np.unique(key, return_counts=True)
        v_of = uniq // n
        lab_of = uniq % n
        # lexsort: within each v, highest count first, then smallest
        # label — the first row per v is the distributed row_number()==1
        order = np.lexsort((lab_of, -cnt, v_of))
        v_sorted = v_of[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = v_sorted[1:] != v_sorted[:-1]
        new = labels.copy()
        new[v_sorted[first]] = lab_of[order][first]
        labels = new
    vtype = und.schema["a"].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("v", vtype, True), StructField("community", vtype, True)]
    )
    rows = list(zip(verts.tolist(), verts[labels].tolist()))
    return spark.createDataFrame(rows, schema)
