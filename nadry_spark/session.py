"""SparkSession factory with the engine's standard configuration.

Defaults target the sandbox (local[32], single JVM) but every knob is
what we'd ship to a 1000-executor cluster: AQE on (runtime coalesce +
skew-join splitting), Arrow for all pandas-UDF traffic, UTC session
timezone (oracle comparability), shuffle partitions sized to the
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_SESSIONS: set[int] = set()


def build_package_zip(dest: str | None = None) -> str:
    """Zip the nadry_spark package for spark-submit --py-files (and the
    in-session addPyFile path below). Deterministic walk; returns the
    zip path."""
    pkg_root = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(pkg_root)
    if not os.path.isdir(pkg_root):
        # imported from a --py-files zip (pkg_root = .../x.zip/nadry_spark):
        # os.walk over a zip-internal path yields nothing and would
        # silently produce an EMPTY zip — reuse the archive we were
        # imported from instead
        if zipfile.is_zipfile(repo_root):
            return repo_root
        raise RuntimeError(
            f"nadry_spark imported from non-directory {pkg_root!r} that is "
            "not a zip archive — cannot package for --py-files"
        )
    zpath = dest or os.path.join(
        tempfile.gettempdir(), f"nadry_spark_pkg_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, repo_root))
    return zpath


def ship_package(spark: SparkSession) -> None:
    """Ship the nadry_spark package to executors (the spark-submit
    --py-files story, automated). Without this, Python workers spawned
    from a different cwd cannot unpickle our pandas UDFs."""
    key = id(spark)
    if key in _SHIPPED_SESSIONS:
        return
    spark.sparkContext.addPyFile(build_package_zip())
    _SHIPPED_SESSIONS.add(key)


def get_spark(
    app_name: str = "nadry_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        if master.startswith("local["):
            n = master[6:-1]
            shuffle_partitions = int(n) if n.isdigit() else 32
        else:
            shuffle_partitions = 200

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
