"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5.5):
row-count + schema (sorted column names) + order-insensitive value check.
Stricter than a hash: exact equality for non-floats, 1e-9 for floats, so
anything passing here passes any reasonable hash gate.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from fischer_spark.sources.testdata import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            # unify None/NaN representations for strings
            df[c] = df[c].where(pd.notna(df[c]), None)
    # sort on exact columns first, then floats rounded to 6dp, so float
    # noise below tolerance can't break row alignment
    exact = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    floats = [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    tmp = df.copy()
    for c in floats:
        tmp[f"__r_{c}"] = tmp[c].round(6)
    order = tmp.sort_values(
        by=exact + [f"__r_{c}" for c in floats],
        na_position="last",
        kind="mergesort",
    ).index
    return df.loc[order].reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    ps = spark_df.toPandas()
    po = con.sql(sql).df()
    if sorted(ps.columns) != sorted(po.columns):
        return [f"{name}: schema mismatch spark={sorted(ps.columns)} oracle={sorted(po.columns)}"]
    if len(ps) != len(po):
        errs.append(f"{name}: row count spark={len(ps)} oracle={len(po)}")
        return errs
    a, b = _normalize(ps), _normalize(po)
    for c in a.columns:
        # dtype-kind parity: the driver hashes values including their
        # representation, so DuckDB returning HUGEINT/float where Spark emits
        # int64 fails its gate even when values are equal. Catch that class
        # here (kind: i=int, f=float, O=object, M=datetime, b=bool).
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            errs.append(
                f"{name}.{c}: dtype kind mismatch spark={a[c].dtype} oracle={b[c].dtype} "
                f"(CAST the oracle expression so representations agree)"
            )
        ca, cb = a[c], b[c]
        if pd.api.types.is_float_dtype(ca) or pd.api.types.is_float_dtype(cb):
            ca = pd.to_numeric(ca, errors="coerce").astype(float)
            cb = pd.to_numeric(cb, errors="coerce").astype(float)
            ok = np.isclose(ca, cb, atol=1e-9, rtol=1e-9) | (ca.isna() & cb.isna())
            if not ok.all():
                i = int(np.argmax(~ok.values))
                errs.append(f"{name}.{c}: value mismatch at row {i}: {ca.iloc[i]!r} vs {cb.iloc[i]!r}")
        else:
            eq = (ca == cb) | (ca.isna() & cb.isna())
            if not eq.all():
                i = int(np.argmax(~eq.values))
                errs.append(f"{name}.{c}: value mismatch at row {i}: {ca.iloc[i]!r} vs {cb.iloc[i]!r}")
    return errs
