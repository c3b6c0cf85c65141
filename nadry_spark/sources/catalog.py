"""Input-catalog abstraction: Parquet today, Iceberg when a runtime
jar is on the classpath.

The north rule targets "Iceberg tables of Common-Crawl-style web
pages"; this sandbox ships no Iceberg runtime jar (SURVEY.md §6), so
the engine reads the same schema from Parquet and keeps an explicit
`iceberg:` source scheme that activates when a deployment adds
  --packages org.apache.iceberg:iceberg-spark-runtime-<ver>
  --conf spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog
Nothing else in the engine changes: every operator consumes a
DataFrame, and Iceberg scans surface through the same DSv2 pushdown
(PushedFilters / partition pruning) the plan tests assert on Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CATALOG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CATALOG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, source: str) -> DataFrame:
    """Read an input table by source string:

    * ``iceberg:<catalog.db.table>`` — Iceberg catalog table (requires
      the runtime jar; raises a clear error otherwise)
    * ``warc:<path-or-glob>`` — WARC archives (ISO 28500 / Common
      Crawl layout incl. per-record gzip), parsed into the pages shape
    * ``wet:<path-or-glob>`` — WET extracted-text archives (Common
      Crawl conversion records); rows carry text with empty html and
      index through the text fall-through without re-extraction
    * ``parquet:<path>`` or a bare path — Parquet directory
    """
    if source.startswith("warc:"):
        from nadry_spark.sources.warc import read_warc

        return read_warc(spark, source[len("warc:"):])
    if source.startswith("wet:"):
        from nadry_spark.sources.warc import read_wet

        return read_wet(spark, source[len("wet:"):])
    if source.startswith("iceberg:"):
        name = source[len("iceberg:"):]
        if not iceberg_available(spark):
            raise RuntimeError(
                f"source '{source}' needs the Iceberg Spark runtime on the "
                f"classpath ({ICEBERG_CATALOG_CLASS} not found). Launch with "
                "--packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13 "
                "and spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog, "
                "or pass a parquet path instead."
            )
        return spark.read.table(name)
    if source.startswith("parquet:"):
        source = source[len("parquet:"):]
    return spark.read.parquet(source)
