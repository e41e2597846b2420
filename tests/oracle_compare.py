"""Local replica of the driver's Ray-vs-DuckDB comparison: row count,
schema (column names), and an order-insensitive value hash over
name-sorted columns. Used by tests and ad-hoc checks."""
from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def to_pandas(result) -> pd.DataFrame:
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    return result.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def compare(ray_result, sql: str, sf_dir: str) -> dict:
    ray_df = to_pandas(ray_result)
    con = duckdb_conn(sf_dir)
    oracle_df = con.execute(sql).fetchdf()
    out = {
        "rows_ray": len(ray_df),
        "rows_oracle": len(oracle_df),
        "cols_ray": sorted(ray_df.columns),
        "cols_oracle": sorted(oracle_df.columns),
    }
    out["rows_match"] = out["rows_ray"] == out["rows_oracle"]
    out["schema_match"] = out["cols_ray"] == out["cols_oracle"]
    out["hash_match"] = (
        out["schema_match"] and value_hash(ray_df) == value_hash(oracle_df)
    )
    return out
