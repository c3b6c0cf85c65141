"""Driver-contract self-check: every queries() entry matches its
oracle_sql() via DuckDB at sf0.001 (the driver runs sf0.01 — same logic,
smaller here for speed). Mirrors the driver's compare: row count, column
names, order-insensitive value multiset."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(val):
    if isinstance(val, list):
        return tuple(_canon(v) for v in val)
    if isinstance(val, float):
        return round(val, 9)
    return val


def _rows_to_multiset(rows, cols):
    out = []
    for r in rows:
        d = dict(zip(cols, r)) if not hasattr(r, "asDict") else r.asDict()
        out.append(tuple(_canon(d[c]) for c in sorted(cols)))
    return sorted(out)


@pytest.mark.parametrize("name", list(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # driver records a weaker rows-only check for non-SQL ops
        rows = q(spark, SF_DIR).collect()
        assert len(rows) > 0, f"{name}: rows-only check found no rows"
        return
    sdf = q(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    ores = ddb.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert _rows_to_multiset(srows, scols) == _rows_to_multiset(orows, ocols), name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert {"doc_id", "url", "relevance", "popularity", "score"} <= set(df.columns)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
