import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from nadry_spark.session import get_spark

    s = get_spark("nadry_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_pages_path(tmp_path_factory):
    """40-page deterministic corpus parquet."""
    from nadry_spark.sources.pages import generate_pages_parquet

    path = str(tmp_path_factory.mktemp("corpus") / "pages.parquet")
    generate_pages_parquet(path, n_pages=40, seed=42)
    return path


@pytest.fixture(scope="session")
def seg(spark, tiny_pages_path, tmp_path_factory):
    """Built segments over the tiny corpus + the pure-Python oracle."""
    import pyarrow.parquet as pq

    from nadry_spark.sources.segments import SegmentIndex, build_segments
    from tests.oracle import oracle_index

    out = str(tmp_path_factory.mktemp("segments"))
    pages = spark.read.parquet(tiny_pages_path)
    build_segments(spark, pages, out, n_shards=4, shards_per_job=2)
    idx = SegmentIndex(spark, out)
    raw = pq.read_table(tiny_pages_path).to_pylist()
    o_postings, o_docs = oracle_index([(r["html"].decode(), r["url"]) for r in raw])
    return idx, o_postings, o_docs
