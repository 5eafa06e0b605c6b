"""Local mirror of the driver's DuckDB oracle gate: every queries() entry
with an oracle_sql() must match row-for-row (sorted columns + rows) at
sf0.001. Entries without an oracle get a rows-run smoke check."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, con, name):
    got = _canon(QUERIES[name](spark, SF_DIR).toPandas())
    assert len(got) > 0, f"{name} returned no rows"
    if name not in ORACLES:
        return  # rows-only contract (approximate operators)
    want = _canon(con.sql(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name} column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name} row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert "image_id" in df.columns
