"""Self-check of the driver contract: run every queries() entry at
sf0.01 and compare against its oracle_sql() via DuckDB, mimicking the
driver's row-count + order-insensitive value comparison."""

import importlib.util

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"

spec = importlib.util.spec_from_file_location("spark_entry", "/root/repo/__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck01, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF).toPandas()
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck01.execute(oracle).df()
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} != {len(odf)}"
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert sum(r.text_mismatches for r in rows) == 0
