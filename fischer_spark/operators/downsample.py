"""LTTB downsampling: shape-preserving per-series reduction to k points.

Largest-Triangle-Three-Buckets (Sveinn Steinarsson, "Downsampling Time
Series for Visual Representation", U. Iceland MSc thesis, 2013 — public):
keep the first and last sample, split the rest into k-2 equal buckets,
and from each bucket keep the point forming the largest triangle with
the previously kept point and the next bucket's centroid.  The standard
way a timeseries store serves a 10^9-point series to a 2000px dashboard
without aliasing away spikes (plain striding misses extrema; bucket
averaging flattens them).

Not SQL-expressible (each bucket's choice depends on the previous
bucket's choice), so this is a grouped Arrow UDF: one shuffle on the
series key, then a numpy pass per series — the per-bucket area compute
is vectorized; the only Python loop is over the k OUTPUT buckets.

Scale shape: identical to the detectors (one Exchange on the series
key).  A single series must fit one task — true by construction for
tiered reads (query_range first, then LTTB on the tier rows: a year of
1m data is 526k rows ≈ 8 MB).  Guard rails, not repartitioning, handle
the pathological one-series-is-the-whole-table case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["lttb", "lttb_downsample"]


def lttb(ts: np.ndarray, vals: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the kept points (sorted ascending).  ts must be sorted.
    n_out >= 3; series shorter than n_out are kept whole."""
    n = len(ts)
    if n <= n_out:
        return np.arange(n)
    if n_out < 3:
        raise ValueError("lttb needs n_out >= 3")
    t = ts.astype(np.float64)
    v = vals.astype(np.float64)
    # bucket boundaries over the interior points [1, n-1)
    bounds = (1 + np.arange(n_out - 1) * (n - 2) / (n_out - 2)).astype(np.int64)
    bounds[-1] = n - 1
    keep = np.empty(n_out, dtype=np.int64)
    keep[0] = 0
    a = 0  # previously selected point
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        # next bucket centroid (last "bucket" is the final point itself)
        nlo, nhi = (hi, n) if i == n_out - 3 else (bounds[i + 1], bounds[i + 2])
        ct, cv = t[nlo:nhi].mean(), v[nlo:nhi].mean()
        # triangle area vs previous point and next centroid, vectorized
        area = np.abs(
            (t[a] - ct) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (cv - v[a])
        )
        a = lo + int(np.argmax(area))
        keep[i + 1] = a
    keep[-1] = n - 1
    return keep


def lttb_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    n_out: int = 1000,
) -> DataFrame:
    """Per-series LTTB: at most ``n_out`` rows per key, first/last samples
    always kept, NULL values dropped first (they carry no shape)."""
    clean = df.na.drop(subset=[ts_col, val_col])
    cols = list(clean.columns)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        # secondary sort on value: Spark hands the group over in shuffle
        # order, so a ts-only sort would make duplicate-timestamp picks
        # nondeterministic run-to-run
        pdf = pdf.sort_values([ts_col, val_col], kind="mergesort", ignore_index=True)
        ts = pdf[ts_col].to_numpy()
        # datetimes → int64 ns for the area math; values must be numeric
        if np.issubdtype(ts.dtype, np.datetime64):
            ts = ts.astype("datetime64[ns]").astype(np.int64)
        idx = lttb(ts.astype(np.float64), pdf[val_col].to_numpy(), n_out)
        return pdf.iloc[idx]

    return clean.groupBy(*key_cols).applyInPandas(_one, schema=clean.select(*cols).schema)
