"""Exponential smoothing per series: EWMA and Holt double smoothing.

The recursive forms the read surface needs for trend-following
dashboards and the PromQL ``holt_winters()`` (double exponential
smoothing — despite the name it has no seasonal term, per the public
Prometheus docs; our seasonal detector covers seasonality separately):

- ``ewma``:  s_t = alpha*y_t + (1-alpha)*s_{t-1},   s_0 = y_0
- ``holt``:  level_t = sf*y_t + (1-sf)*(level_{t-1} + trend_{t-1})
             trend_t = tf*(level_t - level_{t-1}) + (1-tf)*trend_{t-1}
             level_0 = y_0, trend_0 = y_1 - y_0 (undefined for n == 1)

Each sample depends on its predecessor's smoothed state, so the
computation is inherently sequential PER SERIES — the right Spark shape
is one grouped Arrow UDF per series key (applyInPandas), numpy inside;
series are independent, so parallelism is across keys exactly like the
LTTB downsample (operators/downsample.py).  Not SQL-expressible without
numerically explosive (1-alpha)^-i rescaling, hence rows-only in the
driver gate; the kernels are pinned index-for-index against naive
Python loops in tests/test_smooth.py.

EWMA runs through pandas ``Series.ewm(alpha, adjust=False).mean()`` —
the Cython implementation of exactly s_t = (1-a)*s_{t-1} + a*y_t, C
speed, numerically stable (no growing (1-a)^-i factors).  Holt has no
vectorized pandas form; its 2x2 coupled recurrence runs as an O(n)
Python loop per series INSIDE the Arrow batch — acceptable because the
input is tier rows (<= 1440 points per series-day at the finest tier),
not raw samples; the cross-key parallelism is what matters at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["ewma", "holt"]


def _ewma_np(y: np.ndarray, alpha: float) -> np.ndarray:
    """s_t = (1-a)*s_{t-1} + a*y_t via pandas' Cython ewm kernel."""
    return (
        pd.Series(y.astype("float64"))
        .ewm(alpha=alpha, adjust=False)
        .mean()
        .to_numpy()
    )


def _holt_np(y: np.ndarray, sf: float, tf: float):
    n = len(y)
    level = np.empty(n)
    trend = np.empty(n)
    level[0] = y[0]
    trend[0] = y[1] - y[0] if n > 1 else np.nan
    for i in range(1, n):
        prev = level[i - 1] + trend[i - 1]
        level[i] = sf * y[i] + (1.0 - sf) * prev
        trend[i] = tf * (level[i] - level[i - 1]) + (1.0 - tf) * trend[i - 1]
    return level, trend


def _out_schema(df: DataFrame, cols: list[str], extra: list[str]) -> StructType:
    base = [f for f in df.schema.fields if f.name in cols]
    return StructType(base + [StructField(c, DoubleType()) for c in extra])


def ewma(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    alpha: float = 0.3,
    out_col: str = "smoothed",
) -> DataFrame:
    """EWMA per series key, ordered by ts.  One grouped Arrow UDF —
    a single Exchange on the key; the sequential scan runs inside
    numpy per series."""
    cols = key_cols + [ts_col, val_col]
    schema = _out_schema(df.select(*cols), cols, [out_col])

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        pdf[out_col] = _ewma_np(pdf[val_col].to_numpy(), alpha)
        return pdf

    return df.select(*cols).groupBy(*key_cols).applyInPandas(_fn, schema=schema)


def holt(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    sf: float = 0.3,
    tf: float = 0.1,
) -> DataFrame:
    """Holt double exponential smoothing (PromQL holt_winters(sf, tf))
    per series key: adds `level` and `trend` columns; `smoothed` is the
    level (the PromQL return value).  Series with one sample get
    NaN trend (no pair to seed it), level = the sample."""
    cols = key_cols + [ts_col, val_col]
    schema = _out_schema(
        df.select(*cols), cols, ["smoothed", "trend"]
    )

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        level, trend = _holt_np(pdf[val_col].to_numpy("float64"), sf, tf)
        pdf["smoothed"] = level
        pdf["trend"] = trend
        return pdf

    return df.select(*cols).groupBy(*key_cols).applyInPandas(_fn, schema=schema)
