"""Mimics the driver's correctness gate: every queries() entry vs its
oracle_sql() on DuckDB — row count, schema (column names), and exact
values after canonical ordering. Exact equality here implies the
driver's value-hash will match."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

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


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    got = entrymod.queries()[name](spark, SF_DIR).toPandas()
    if name not in entrymod.oracle_sql():
        # rows-only contract (approximate / non-SQL-expressible op):
        # must run and be deterministic across invocations
        again = entrymod.queries()[name](spark, SF_DIR).toPandas()
        assert len(got) == len(again)
        return
    want = ddb.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), f"{name}: columns differ"
    assert len(got) == len(want), f"{name}: row counts {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            assert np.allclose(
                gv.astype(float), wv.astype(float), atol=1e-9, equal_nan=True
            ), f"{name}.{col}: float values differ"
        else:
            assert gv.astype(object).tolist() == wv.astype(object).tolist(), (
                f"{name}.{col}: values differ"
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
