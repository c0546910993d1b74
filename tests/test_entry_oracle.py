"""Driver-contract gate, replicated locally: run every queries() entry
on Spark AND its oracle_sql() on DuckDB over the same parquet tables,
compare row count, column names, and (order-insensitively) values —
the same comparison CORRECTNESS_r{N}.json records.

Runs at sf0.001 for speed; the driver runs sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize numeric types, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            # Decimal / bytes -> float/str
            df[c] = df[c].map(
                lambda v: float(v) if hasattr(v, "as_tuple") else v
            )
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.fixture(scope="module")
def spark():
    from lucene_solr_spark.session import get_spark

    s = get_spark()
    yield s


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert sdf is not None
        return
    ddf = duck_run(ORACLES[name])
    a, b = canon(sdf), canon(ddf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: rows {len(a)} vs {len(b)}"
    for c in a.columns:
        if a[c].dtype == "float64":
            for i, (x, y) in enumerate(zip(a[c], b[c])):
                nx = x is None or (isinstance(x, float) and math.isnan(x))
                ny = y is None or (isinstance(y, float) and math.isnan(y))
                if nx or ny:
                    assert nx == ny, f"{name}.{c}[{i}]: {x} vs {y}"
                else:
                    assert x == y, f"{name}.{c}[{i}]: {x!r} != {y!r}"
        else:
            mismatch = (a[c] != b[c]) & ~(a[c].isna() & b[c].isna())
            assert not mismatch.any(), (
                f"{name}.{c}: first mismatch\n"
                f"{a[mismatch].head()}\nvs\n{b[mismatch].head()}"
            )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
