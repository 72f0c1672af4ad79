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


def m4_downsample(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "bucket_ts",
    val_col: str = "value",
    n_px: int = 400,
) -> DataFrame:
    """O78 — M4 visualization downsample (Jugel et al., "M4: A
    Visualization-Oriented Time Series Data Aggregation", VLDB 2014 —
    public): split each series' time extent into ``n_px`` pixel buckets
    and keep per bucket the four points a line renderer needs for a
    pixel-perfect plot: first, last, min and max.  Unlike LTTB this IS
    expressible as relational algebra, so it stays entirely JVM-side
    (whole-stage codegen, no Arrow hop) — the right default for dashboard
    reads; LTTB is the shape-quality upgrade when n_px is very small.

    Plan shape: per-key extents (partial-agg groupBy, tiny) broadcast
    back, then ONE shuffle on (key, px) feeding a window + final agg that
    share the same partitioning.  Pixel index is exact integer µs
    arithmetic: px = (n_px · (t − t0)) div (span + 1) — the +1 makes the
    max timestamp land in bucket n_px−1 and a single-point series well-
    defined; all quantities are non-negative so `div` (truncation) IS
    floor, identical in any engine.  Ties on (ts, value) are resolved by
    ordering on both, so duplicate timestamps cannot flip first/last
    run-to-run (the same determinism rule as lttb_downsample).

    Returns one row per (key, px): t_first/v_first, t_last/v_last,
    v_min/v_max, n_pts.  Output size ≤ n_px per series regardless of
    input volume — a 10^9-point series reads back as ≤400 rows.
    """
    from pyspark.sql import Window, functions as F

    clean = df.na.drop(subset=[ts_col, val_col])
    m = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ext = clean.groupBy(*key_cols).agg(
        F.min(m).alias("_t0"), F.max(m).alias("_t1")
    )
    b = clean.join(F.broadcast(ext), key_cols)
    # `div` is integral division (long÷long→long, no double round-trip —
    # n_px·span can exceed 2^53 where double floor misplaces boundary rows)
    b = (
        b.withColumn("_num", F.lit(n_px) * (m - F.col("_t0")))
        .withColumn("_den", F.col("_t1") - F.col("_t0") + F.lit(1))
        .withColumn("px", F.expr("_num div _den"))
    )
    w = (
        Window.partitionBy(*key_cols, "px")
        .orderBy(ts_col, val_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    b = b.select(
        *key_cols,
        "px",
        F.col(val_col).alias("_v"),
        F.first(ts_col).over(w).alias("t_first"),
        F.first(val_col).over(w).alias("v_first"),
        F.last(ts_col).over(w).alias("t_last"),
        F.last(val_col).over(w).alias("v_last"),
    )
    return b.groupBy(*key_cols, "px").agg(
        F.min("t_first").alias("t_first"),
        F.min("v_first").alias("v_first"),
        F.min("t_last").alias("t_last"),
        F.min("v_last").alias("v_last"),
        F.min("_v").alias("v_min"),
        F.max("_v").alias("v_max"),
        F.count(F.lit(1)).alias("n_pts"),
    )
