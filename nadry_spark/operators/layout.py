"""Z-order (Morton) data layout — multi-dimensional clustering for
scan pruning, the primitive behind Delta/Iceberg ``OPTIMIZE ZORDER``.

Sorting a table by one column makes that column's min/max file stats
selective and every other column's useless. Interleaving the bits of
several columns into one Morton key and range-partitioning on it
gives every participating column partially-sorted locality: each
output partition covers a small hyper-rectangle of the key space, so
min/max pruning works for predicates on ANY of the z-ordered columns.
This is pure public knowledge (Morton 1966; the Delta OPTIMIZE ZORDER
and Iceberg sort-order docs describe the same construction).

``zvalue`` builds the interleave as a single closed-form column
expression (2*bits shift/mask ops, whole-stage-codegen friendly — no
UDF), which also makes it bit-deterministic and SQL-mirrorable for
the oracle. ``zorder_repartition`` scales each column to the bit
range from its global min/max (one stats pass) and range-partitions
on the key — two jobs total, shuffle only the final exchange, the
same cost shape as a plain global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list, bits: int = 16):
    """Morton-interleave the low ``bits`` bits of the given integer
    column expressions (col 0 contributes the most-significant bit of
    each group). Inputs must already be non-negative and < 2**bits;
    use zorder_repartition for automatic scaling."""
    if not cols:
        raise ValueError("zvalue needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit key")
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for c in cols:
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            )
    return z


def zvalue_sql(exprs: list[str], bits: int = 16) -> str:
    """The identical interleave as portable SQL (DuckDB oracle side)."""
    z = "0"
    for b in range(bits - 1, -1, -1):
        for e in exprs:
            z = f"((({z}) << 1) | ((({e}) >> {b}) & 1))"
    return z


def zorder_repartition(
    df: DataFrame, cols: list[str], bits: int = 10, num_partitions: int = 32
) -> DataFrame:
    """Range-partition ``df`` by the Morton key of ``cols`` (each
    scaled to [0, 2**bits) from its global min/max — one stats job).
    Rows stay intact; only layout changes. Downstream writers get
    partitions whose per-column min/max ranges are tight on EVERY
    z-ordered column — the property file-stat pruning needs."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    span = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = stats[f"_lo_{c}"], stats[f"_hi_{c}"]
        rng = (hi - lo) or 1.0
        scaled.append(
            F.least(
                F.lit(span),
                F.floor((F.col(c).cast("double") - lo) / rng * span).cast("long"),
            )
        )
    keyed = df.withColumn("_z", zvalue(scaled, bits))
    return keyed.repartitionByRange(num_partitions, "_z").drop("_z")
