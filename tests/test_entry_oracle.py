"""Emulates the driver's correctness gate locally: every ``queries()`` entry
runs on Spark at sf0.01 and must match its ``oracle_sql()`` DuckDB twin
exactly (row count, column names, and values after name-sorted columns and
row sort) — the same comparison the driver hashes.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf01_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf01_dir}/{t}.parquet'"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("float64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_NAMES = sorted(set(entry_mod.oracle_sql()))
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck, sf01_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _normalize(q(spark, sf01_dir).toPandas())
    exp = _normalize(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if g.dtype.kind == "f":
            ok = np.allclose(g, e, rtol=0, atol=0, equal_nan=True)
        else:
            ok = (pd.Series(g) == pd.Series(e)).all()
        assert ok, f"{name}.{c}: first diffs {pd.DataFrame({'got': g, 'exp': e})[g != e][:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf01_dir, name):
    df = entry_mod.queries()[name](spark, sf01_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) == 500  # total assignment over sf0.001 documents
    assert set(pdf.columns) == {"doc_id", "cluster_id", "cluster_size"}
