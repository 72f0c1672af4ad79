"""Per-series linear trend: deriv (regression slope) + predict_linear.

The monitoring read surface needs "how fast is this series moving and
where will it be in an hour" (the public PromQL ``deriv()`` /
``predict_linear()`` pair): a least-squares line fit per series per
window, slope in value-units per second, and the fitted value
extrapolated to a future instant.

Two forms, same formula, different numeric contracts:

- ``linear_trend_exact``: the driver-gated form.  All five regression
  states (n, Σx, Σy, Σxy, Σx²) are accumulated EXACTLY — x as integer
  microseconds relative to the window start, y scaled to integer
  cents — in Spark decimals sized so every product stays inside
  decimal(38,0) (bounds below); the slope/intercept doubles are then
  derived with a fixed expression shape that the DuckDB oracle mirrors
  token-for-token (its sums run in HUGEINT), so the comparison is
  bit-deterministic regardless of partial-aggregation order
  (queries.py module docstring convention).
- ``linear_trend_fast``: the scale path — the same closed form over
  double sums via the built-in ``regr_slope``/``regr_intercept``
  aggregates (whole-stage codegen, no decimal BigDecimal cost).  Order-
  dependent in the last ulp, so never hash-gated; tests pin it to the
  exact form within 1e-9 relative.

Exactness bounds for the exact form (documented, asserted nowhere —
they are far beyond any real window): with x ≤ 8.64e10 µs (one day)
and y ≤ 1e7 cents, Σx·Σy ≤ n²·8.64e17 and n·Σx² ≤ n²·7.5e21 stay
under 1e38 for n ≤ 3e8 rows per series-window — decimal(38,0) and
DuckDB HUGEINT (1.7e38) both hold them exactly.

Scale shape: one partial-aggregated groupBy per (key, window) — a
single hash Exchange, map-side combine on all five states; no window
function, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fischer_spark.functions.time import is_ntz

__all__ = ["linear_trend_exact", "linear_trend_fast"]


def _x_rel_us(df: DataFrame, ts_col: str, bucket: Column) -> Column:
    """Integer microseconds since the containing window's start."""
    c = F.col(ts_col).cast("timestamp") if is_ntz(df, ts_col) else F.col(ts_col)
    return F.unix_micros(c) - F.unix_micros(bucket.cast("timestamp"))


def linear_trend_exact(
    df: DataFrame,
    key_cols: list[str],
    bucket: Column,
    ts_col: str = "ts",
    val_col: str = "value",
    predict_at_s: float = 90000.0,
) -> DataFrame:
    """Exact-state least-squares trend per (key, bucket).

    Output per group: n, slope (units/second), predict (fitted value at
    ``predict_at_s`` seconds after the bucket start; default 90000 s =
    25 h, one hour past a daily bucket).  slope/predict are NULL when
    the fit is degenerate (n < 2 or all samples at one instant).

    y is fixed-point cents (``floor(value*100 + 0.5)``) — exact for any
    2-decimal-intended double, the fixture convention.
    """
    b = bucket.alias("bucket_ts")
    x = _x_rel_us(df, ts_col, bucket)
    y = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")

    g = df.select(*key_cols, b, x.alias("x"), y.alias("y")).groupBy(
        *key_cols, "bucket_ts"
    )
    agg = g.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(15,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(10,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(22,0)")).alias("sxy"),
        F.sum(
            (F.col("x").cast("decimal(15,0)") * F.col("x").cast("decimal(15,0)"))
        ).alias("sxx"),
    )

    # A, B exact (decimal×decimal stays within 38 digits per the bounds
    # above); slope/predict derive with the oracle's exact expression
    # shape: every double op below appears in the same order in the SQL.
    a_num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    b_den = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    slope = a_num.cast("double") / b_den.cast("double") * F.lit(10000.0)
    mean_y = agg["sy"].cast("double") / agg["n"].cast("double") / F.lit(100.0)
    mean_x_s = (
        agg["sx"].cast("double") / agg["n"].cast("double") / F.lit(1000000.0)
    )
    degenerate = (agg["n"] < 2) | (b_den == 0)
    slope_c = F.when(degenerate, F.lit(None).cast("double")).otherwise(slope)
    return agg.select(
        *key_cols,
        "bucket_ts",
        "n",
        slope_c.alias("slope"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(mean_y + slope * (F.lit(predict_at_s) - mean_x_s))
        .alias("predict"),
    )


def linear_trend_fast(
    df: DataFrame,
    key_cols: list[str],
    bucket: Column,
    ts_col: str = "ts",
    val_col: str = "value",
    predict_at_s: float = 90000.0,
) -> DataFrame:
    """Double-sum trend via built-in regr_slope/regr_intercept — the
    100 TB path (codegen aggregates, no decimal).  Same schema as the
    exact form; last-ulp order-dependent, so test-pinned, never
    hash-gated."""
    x_s = _x_rel_us(df, ts_col, bucket).cast("double") / F.lit(1000000.0)
    y = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("double") / F.lit(100.0)
    g = (
        df.select(
            *key_cols, bucket.alias("bucket_ts"), x_s.alias("x"), y.alias("y")
        )
        .groupBy(*key_cols, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("icpt"),
        )
    )
    return g.select(
        *key_cols,
        "bucket_ts",
        "n",
        "slope",
        (F.col("icpt") + F.col("slope") * F.lit(predict_at_s)).alias("predict"),
    )
