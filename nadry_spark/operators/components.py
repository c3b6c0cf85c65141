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
    """
    und = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    und = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    und = und.distinct().localCheckpoint()
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
