"""Local mirror of the driver's DuckDB differential check.

Runs a Spark query and its DuckDB oracle on the same parquet dir,
sorts columns by name and rows by all columns, and compares values
(floats exactly — both sides pre-round computed floats, see
queries/__init__ docstring — with a small np.isclose fallback to
distinguish "semantics wrong" from "last-ulp rounding").
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

TEST_TABLES = (
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


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TEST_TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df.reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "query") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"

    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = pd.to_numeric(g, errors="coerce").to_numpy(dtype=float)
            wa = pd.to_numeric(w, errors="coerce").to_numpy(dtype=float)
            both_nan = np.isnan(ga) & np.isnan(wa)
            eq = np.isclose(ga, wa, rtol=1e-9, atol=1e-9) | both_nan
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} float mismatches; "
                f"first: {ga[~eq][:3]} vs {wa[~eq][:3]}"
            )
            exact = (ga == wa) | both_nan
            assert len(exact) == 0 or exact.mean() > 0.999, (
                f"{name}.{col}: values close but not hash-identical for "
                f"{int((~exact).sum())}/{len(exact)} rows — tighten rounding"
            )
        else:
            eq = (g.isna() & w.isna()) | (g == w)
            assert eq.all(), (
                f"{name}.{col}: {int((~eq).sum())} mismatches; first bad row: "
                f"{got.loc[~eq].head(2).to_dict()} vs {want.loc[~eq].head(2).to_dict()}"
            )


def assert_parity(spark, query_fn, oracle_sql: str, sf_dir: str, name: str) -> None:
    compare(query_fn(spark, sf_dir), run_oracle(oracle_sql, sf_dir), name)


def sanity_float_cols(df: pd.DataFrame) -> list[str]:
    return [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]


def hash_frame(df: pd.DataFrame) -> str:
    """Order-insensitive value hash (debugging aid)."""
    norm = _normalize(df)
    payload = norm.to_csv(index=False, float_format="%.6f")
    import hashlib

    return hashlib.md5(payload.encode()).hexdigest()


def isclose_scalar(a, b) -> bool:
    if a is None or b is None:
        return a is b
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9) or (
            math.isnan(a) and math.isnan(b)
        )
    return a == b
