"""Driver-contract test: run every queries() entry at small SF and
compare SQL-oracled ones against DuckDB exactly the way the driver does
(sort columns by name, sort rows, compare values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

import __ray_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return c


# cover the driver-facing registry AND the retired variants (the retirees
# were consolidated out of queries() so the driver's 50-query sample covers
# every registered entry — pytest remains their correctness gate)
ALL_QUERIES = {**entrymod.queries(), **entrymod.retired_queries()}
ALL_ORACLES = {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}
ORACLED = sorted(ALL_ORACLES.keys())
ROWS_ONLY = sorted(set(ALL_QUERIES.keys()) - set(ORACLED))


def test_driver_registry_capped_at_50():
    assert len(entrymod.queries()) <= 50
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(ray_session, sf_dir, con, name):
    got = _canon(_to_pandas(ALL_QUERIES[name](sf_dir)))
    exp = _canon(con.sql(ALL_ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch {got.columns} vs {exp.columns}"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(exp[c]):
            assert (got[c].astype(float) - exp[c].astype(float)).abs().max() < 1e-9, f"{name}.{c}"
        else:
            assert got[c].astype(str).tolist() == exp[c].astype(str).tolist(), f"{name}.{c}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, sf_dir, name):
    res = _to_pandas(ALL_QUERIES[name](sf_dir))
    assert res is not None and len(res) >= 0


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_pandas(out)
    assert len(df) >= 1
    assert "pass" in df.columns
