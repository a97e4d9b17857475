"""Driver-style correctness gate: every queries() entry with an oracle_sql()
twin must match DuckDB on row count, schema (column names) and
order-insensitive values at the test scale factor."""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str).where(df[c].notna(), None)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    if not a.equals(b):
        merged = a.compare(b) if a.shape == b.shape else None
        raise AssertionError(f"{name}: value mismatch\n{merged if merged is not None else ''}")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _entries():
    import __ray_entry__ as e

    q = e.queries()
    sql = e.oracle_sql()
    return [(name, q[name], sql.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name", [n for n, _, _ in _entries()])
def test_query_vs_oracle(name, ray_session, sf_dir, duck):
    import __ray_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    result = to_pandas(fn(sf_dir))
    assert len(result) >= 0 and len(result.columns) > 0
    if sql is None:
        assert len(result) > 0, f"{name}: rows-only check — expected non-empty result"
        return
    expected = duck.execute(sql).fetchdf()
    compare(result, expected, name)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = to_pandas(e.entry())
    assert len(res) > 0
    assert "subj" in res.columns
