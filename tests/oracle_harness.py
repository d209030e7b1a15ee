"""Local mirror of the driver's correctness gate: run each registry query in
Spark and its SQL twin in DuckDB over the same parquet, compare row count,
column names, and order-insensitive values (floats rounded)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
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
)

FLOAT_DECIMALS = 6


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None and not isinstance(v, float) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        problems.append(f"{name}: columns differ spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(sp) != len(duck_df):
        problems.append(f"{name}: rowcount spark={len(sp)} duck={len(duck_df)}")
        return problems
    a, b = _canon(sp), _canon(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            # exact equality: the driver hashes values, so ULP drift between
            # engines is a real failure — queries must emit bit-identical
            # doubles (raw per-row arithmetic) or decimals made exact by
            # rounding at the true decimal precision of the data.
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av.isna() & bv.isna()) | (av == bv))
        else:
            bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            problems.append(
                f"{name}: column {c} has {n_bad} mismatched values "
                f"(first at row {i}: spark={a[c][i]!r} duck={b[c][i]!r})"
            )
    return problems
