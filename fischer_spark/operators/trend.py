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

__all__ = ["linear_trend_exact", "linear_trend_fast", "theil_sen_slope"]


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


def theil_sen_slope(
    df: DataFrame,
    key_cols: list[str],
    x_col: str = "h",
    y_col: str = "y",
) -> DataFrame:
    """Theil–Sen robust slope per group (O126): the median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i) over i < j — a 29.3%%-
    breakdown-point trend estimator (Sen 1968, public) that a single
    corrupted bucket cannot move, unlike the least-squares ``deriv``
    pair in this module.

    Exactness contract: ``x_col`` and ``y_col`` must be integer-valued
    (bucket index / cents), so each pairwise slope is ONE exact-integer
    subtraction pair and ONE double division — bit-identical in any
    engine.  "Median" is the DISCRETE median — the element at
    row_number ceil(n/2) under the total order (slope, x_i, x_j) — so
    no interpolation arithmetic exists to diverge; for even pair
    counts this is the lower middle element (documented convention;
    the estimator's robustness is unchanged — Sen's original uses
    either middle).

    Mechanism: an intra-group self-equi-join on ``key_cols`` builds the
    O(w²) pair set, one window ranks slopes, one filter keeps the
    median row.  Scale shape: the join key IS the group key — one
    Exchange per side, pairs never leave their partition; w is the
    bucket count per group (24 for daily-over-hourly ⇒ 276 pairs), a
    CONSTANT, so the quadratic is bounded and the whole pipeline is
    codegen (no Python, no collect)."""
    from pyspark.sql import Window

    a = df.select(
        *key_cols,
        F.col(x_col).cast("long").alias("_xa"),
        F.col(y_col).cast("long").alias("_ya"),
    )
    b = df.select(
        *key_cols,
        F.col(x_col).cast("long").alias("_xb"),
        F.col(y_col).cast("long").alias("_yb"),
    )
    pairs = a.join(b, key_cols).filter(F.col("_xa") < F.col("_xb"))
    slope = (F.col("_yb") - F.col("_ya")).cast("double") / (
        F.col("_xb") - F.col("_xa")
    ).cast("double")
    ranked = pairs.select(
        *key_cols, slope.alias("slope"), F.col("_xa").alias("_xi"),
        F.col("_xb").alias("_xj"),
    )
    w = Window.partitionBy(*key_cols).orderBy("slope", "_xi", "_xj")
    ranked = ranked.select(
        *key_cols,
        "slope",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*key_cols)).alias("_n"),
    )
    return ranked.filter(
        F.col("_rn") == F.ceil(F.col("_n") / F.lit(2)).cast("int")
    ).select(
        *key_cols,
        F.col("slope").alias("ts_slope"),
        F.col("_n").cast("long").alias("n_pairs"),
    )
