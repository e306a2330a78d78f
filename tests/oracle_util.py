"""Mirror of the driver's Spark-vs-DuckDB comparison so failures surface
in pytest before the driver's verify runs: row count, column names
(sorted), and order-insensitive value comparison."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # unify timestamps to naive ISO strings, floats to stable repr
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v))
                else repr(float(v))
            )
        else:
            df[c] = df[c].map(lambda v: "" if v is None else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_rel, name: str = "") -> None:
    s = _normalize(spark_df.toPandas())
    d = _normalize(duck_rel.fetchdf())
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch\n spark={list(s.columns)}\n duck ={list(d.columns)}"
    )
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    if len(s) == 0:  # both empty: equal regardless of residual dtypes
        return
    if not s.equals(d):
        diff_mask = (s != d).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first diffs:\n"
            f"spark:\n{s[diff_mask].head(5)}\nduck:\n{d[diff_mask].head(5)}"
        )
