"""Exponential smoothing per series: EWMA, Holt double smoothing, and
additive Holt-Winters triple (seasonal) smoothing.

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
LTTB downsample (operators/downsample.py).  No closed WINDOW form exists
without numerically explosive (1-alpha)^-i rescaling, but the Holt
recurrence IS oracle-checkable via a DuckDB recursive CTE that replays
the identical double op sequence — holt_exact_events_1h runs it under
the driver's full value gate (bit-exact, queries_extended.py O109); the
kernels are additionally pinned index-for-index against naive Python
loops in tests/test_smooth.py.

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

__all__ = ["ewma", "holt", "holt_winters_seasonal"]


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


def _hw_np(y: np.ndarray, m: int, a: float, b: float, g: float):
    """Additive Holt-Winters (triple) recurrence — the public textbook
    form (NIST/Hyndman):

        level_t  = a*(y_t - season_{t-m}) + (1-a)*(level_{t-1} + trend_{t-1})
        trend_t  = b*(level_t - level_{t-1}) + (1-b)*trend_{t-1}
        season_t = g*(y_t - level_t) + (1-g)*season_{t-m}

    Standard initialization over the first two seasons: level = mean of
    season 1, trend = (mean of season 2 - mean of season 1)/m, initial
    seasonals = y_i - level for i < m.  fitted_t (one-step-ahead
    forecast) = level_{t-1} + trend_{t-1} + season_{t-m}, defined from
    t = m on; NaN before.  Needs n >= 2*m — shorter series return all
    NaN (no honest seasonal estimate exists).
    """
    n = len(y)
    level = np.full(n, np.nan)
    trend = np.full(n, np.nan)
    season = np.full(n, np.nan)
    fitted = np.full(n, np.nan)
    if n < 2 * m:
        return fitted, level, trend, season
    l_prev = float(np.mean(y[:m]))
    t_prev = float((np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m)
    season[:m] = y[:m] - l_prev
    level[:m] = l_prev
    trend[:m] = t_prev
    for i in range(m, n):
        s_m = season[i - m]
        fitted[i] = l_prev + t_prev + s_m
        l_cur = a * (y[i] - s_m) + (1.0 - a) * (l_prev + t_prev)
        trend[i] = b * (l_cur - l_prev) + (1.0 - b) * t_prev
        season[i] = g * (y[i] - l_cur) + (1.0 - g) * s_m
        level[i] = l_cur
        l_prev, t_prev = l_cur, trend[i]
    return fitted, level, trend, season


def holt_winters_seasonal(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    m: int = 24,
    a: float = 0.3,
    b: float = 0.1,
    g: float = 0.2,
) -> DataFrame:
    """Triple exponential smoothing (additive Holt-Winters) per series
    key — the seasonal-aware forecaster PromQL's double-smoothing
    ``holt_winters()`` lacks: `fitted` is the one-step-ahead forecast
    (level + trend + last season estimate), so `value - fitted` is a
    seasonality-adjusted residual usable directly as an anomaly signal.

    ``m`` is the season length IN SAMPLES (24 on an hourly tier =
    day-of-hours).  Same Spark shape as ewma/holt: one grouped Arrow
    UDF, single Exchange on the key, O(n) loop per series inside the
    batch (tier rows, never raw samples)."""
    cols = key_cols + [ts_col, val_col]
    schema = _out_schema(
        df.select(*cols), cols, ["fitted", "level", "trend", "season"]
    )

    def _fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        fitted, level, trend, season = _hw_np(
            pdf[val_col].to_numpy("float64"), m, a, b, g
        )
        pdf["fitted"] = fitted
        pdf["level"] = level
        pdf["trend"] = trend
        pdf["season"] = season
        return pdf

    return df.select(*cols).groupBy(*key_cols).applyInPandas(_fn, schema=schema)
