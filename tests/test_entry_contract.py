"""Driver-contract tests: entry() smoke + query-vs-DuckDB-oracle parity.

Mirrors what the round driver does (CORRECTNESS_r{N}.json) at sf0.001 so
regressions surface in pytest before the driver runs.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "trend_strength" in df.columns


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    got = entrymod.queries()[name](spark, sf_dir).toPandas()
    exp = ddb.execute(entrymod.oracle_sql()[name]).fetchdf()
    g, e = normalize(got), normalize(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e), f"{name}: {len(g)} vs {len(e)} rows"
    pd.testing.assert_frame_equal(g, e, check_dtype=False, atol=1e-9)


def test_rows_only_queries_nonempty(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in set(qs) - set(oracles):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name
