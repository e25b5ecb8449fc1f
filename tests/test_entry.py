"""Driver-contract validation: run every queries() entry at sf0.01 and
compare against its oracle_sql() in DuckDB, mimicking the grading
driver (row count + sorted value frame equality)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        # hash-based operators: driver records a rows-only check;
        # semantics are cross-verified in tests/test_pipeline_ops.py
        assert q(spark, SF_DIR).count() >= 0
        return
    got = normalize(q(spark, SF_DIR).toPandas())
    want = normalize(duck.execute(sql).fetchdf())
    assert len(got) == len(want), (name, len(got), len(want))
    assert list(got.columns) == list(want.columns), name
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind in "fiu" or b.dtype.kind in "fiu":
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            assert ((a.isna() & b.isna()) | (a == b)).all(), (name, c)
        else:
            assert a.astype(str).equals(b.astype(str)), (name, c)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"doc_id", "n_tok", "tok_sum"}
