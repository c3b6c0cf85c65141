"""Driver-resident result rows as LocalRelation-backed DataFrames.

Serving fast paths end with a handful of driver-side rows (the <=k
winners enriched from the pinned docmap) that must go back to the
caller AS A DATAFRAME. ``spark.createDataFrame(rows, ddl)`` builds an
RDD via ``parallelize`` with defaultParallelism slices, so the
caller's ``collect()`` schedules a full task set (32 tasks on
local[32]) to read back ten rows — measured 250+ ms per serving call
on the bench box, dominating the sub-second query latency.

``local_rows_df`` instead emits a parameterized ``VALUES`` query:
values bind as literals (no string escaping, injection-safe for
arbitrary doc ids / URLs), the optimizer folds it to a LocalRelation,
and ``collect()`` returns WITHOUT running a job (~15 ms including the
parse). ``empty_df`` is the zero-row equivalent (a WHERE 1=0
projection) for the miss branches — cheaper than the eager
``createDataFrame([], ddl)`` and only built when actually needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_CAST_TYPES = {
    "string": "STRING",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INT",
    "integer": "INT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
}


def _fields(ddl: str) -> list[tuple[str, str]]:
    out = []
    for part in ddl.split(","):
        name, typ = part.strip().split()
        out.append((name, _CAST_TYPES[typ.lower()]))
    return out


def empty_df(spark: SparkSession, ddl: str) -> DataFrame:
    """Zero-row frame with the given flat DDL schema; no RDD, no job."""
    cols = ", ".join(
        f"CAST(NULL AS {typ}) AS {name}" for name, typ in _fields(ddl)
    )
    return spark.sql(f"SELECT {cols} WHERE 1 = 0")


def local_rows_df(spark: SparkSession, ddl: str, rows: list[tuple]) -> DataFrame:
    """Small driver-side ``rows`` as a LocalRelation-backed frame with
    the given flat DDL schema (types from ``_CAST_TYPES`` only).
    ``collect()`` on the result does not run a Spark job."""
    if not rows:
        return empty_df(spark, ddl)
    fields = _fields(ddl)
    args: dict[str, object] = {}
    tuples = []
    for r, row in enumerate(rows):
        cells = []
        for c, ((_name, typ), v) in enumerate(zip(fields, row)):
            key = f"p{r}_{c}"
            args[key] = v
            cells.append(f"CAST(:{key} AS {typ})")
        tuples.append("(" + ", ".join(cells) + ")")
    names = ", ".join(name for name, _ in fields)
    sql = "SELECT * FROM VALUES " + ", ".join(tuples) + f" AS t({names})"
    return spark.sql(sql, args=args)
