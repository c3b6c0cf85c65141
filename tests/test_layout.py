"""Z-order layout: interleave correctness + clustering benefit."""

import pytest
from pyspark.sql import functions as F

from nadry_spark.operators.layout import zorder_repartition, zvalue


def _morton(xs: list[int], bits: int) -> int:
    z = 0
    for b in range(bits - 1, -1, -1):
        for x in xs:
            z = (z << 1) | ((x >> b) & 1)
    return z


def test_zvalue_matches_reference(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.randrange(1 << 10), rng.randrange(1 << 10)) for _ in range(200)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zvalue([F.col("x"), F.col("y")], bits=10).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton([x, y], 10)
    # 3-column interleave, and the key stays within 63 bits
    z3 = df.select(
        zvalue([F.col("x"), F.col("y"), F.col("x")], bits=10).alias("z")
    ).agg(F.max("z")).collect()[0][0]
    assert 0 <= z3 < (1 << 30)
    with pytest.raises(ValueError):
        zvalue([F.col("x")], bits=64)
    with pytest.raises(ValueError):
        zvalue([], bits=8)


def test_zorder_repartition_shrinks_bounding_boxes(spark):
    """The point of the layout: per-partition (x, y) bounding boxes
    must cover far less area than a single-column sort's, so min/max
    file stats prune on BOTH columns."""
    import random

    rng = random.Random(11)
    rows = [(i, rng.randrange(4096), rng.randrange(4096)) for i in range(20000)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    nparts = 16

    def boxes(frame):
        part = frame.withColumn("p", F.spark_partition_id())
        return part.groupBy("p").agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        ).collect()

    def hits(bxs, dim, lo, hi):
        """Partitions a min/max-pruned scan must read for dim∈[lo,hi]."""
        a, b = (("x0", "x1") if dim == "x" else ("y0", "y1"))
        return sum(1 for r in bxs if r[a] <= hi and r[b] >= lo)

    single_sorted = df.repartitionByRange(nparts, "x")
    zordered = zorder_repartition(df, ["x", "y"], bits=10, num_partitions=nparts)
    assert zordered.count() == len(rows)  # rows intact
    sb, zb = boxes(single_sorted), boxes(zordered)
    # x-sort: perfect pruning on x, NONE on y (every partition spans
    # the full y range). z-order: decent pruning on BOTH dimensions —
    # that balance is the entire point of the layout.
    q = (1000, 1255)  # a 1/16-wide slice of the 0..4095 space
    assert hits(sb, "x", *q) <= 3
    assert hits(sb, "y", *q) == nparts  # single-column sort can't prune y
    # repartitionByRange draws its boundaries from a NON-deterministic
    # reservoir sample, so hit counts jitter by a partition or two
    # run-to-run (observed 8 and 9 on identical input); assert the
    # pruning claim with headroom, not an exact boundary placement
    assert hits(zb, "x", *q) <= nparts * 5 // 8
    assert hits(zb, "y", *q) <= nparts * 5 // 8
