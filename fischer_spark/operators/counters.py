"""Counter semantics: reset-aware increase / rate / delta per series.

Monitoring counters (requests served, bytes crawled) are cumulative and
reset to zero on process restart; the useful signal is the per-interval
INCREASE, which a plain diff gets wrong at every reset (a huge negative
spike).  These follow the public Prometheus counter semantics: a sample
lower than its predecessor means the counter reset, and the increase
since the previous sample is the raw value itself (reset assumed to
zero).  ``delta`` is the gauge form — plain signed difference, no reset
logic.

Unlike PromQL's range-vector ``increase()`` the per-sample transforms
do no window-boundary extrapolation: they are exact adjacent-sample
transforms whose sum over any window IS the window increase — the right
primitive for a batch engine (extrapolation is a presentation-layer
estimate, not a stored fact).  ``extrapolated_rate`` below is the
explicit opt-in that replays the REAL Prometheus estimate per window
for users who need numbers matching their Prometheus graphs.

Scale shape: one window function per series key — a single hash
Exchange on the key + an in-partition sort, the same shuffle shape as
the z-score detector (BENCH/PLANS.md); no Python, no second pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "change_flags",
    "counter_increase",
    "counter_rate",
    "extrapolated_rate",
    "gauge_delta",
    "instant_transforms",
]


def _w(key_cols: list[str], order_cols: list[str]) -> Window:
    return Window.partitionBy(*key_cols).orderBy(*order_cols)


def counter_increase(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    val_col: str = "value",
    out_col: str = "increase",
) -> DataFrame:
    """Reset-aware per-sample increase; NULL for each series' first sample."""
    prev = F.lag(val_col).over(_w(key_cols, order_cols))
    inc = (
        F.when(prev.isNull(), F.lit(None))
        .when(F.col(val_col) >= prev, F.col(val_col) - prev)
        .otherwise(F.col(val_col))  # reset: counter restarted from 0
    )
    return df.withColumn(out_col, inc)


def counter_rate(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str = "ts",
    val_col: str = "value",
    inc_col: str = "increase",
    out_col: str = "rate",
) -> DataFrame:
    """increase / elapsed-seconds per sample; NULL on first sample and on
    zero/negative elapsed time (duplicate timestamps).  Elapsed time is
    microsecond-exact (unix_timestamp would truncate sub-second sample
    spacing to whole seconds); NTZ timestamps are cast through per the
    repo-wide convention (functions/time.py)."""
    from fischer_spark.functions.time import is_ntz

    w = _w(key_cols, order_cols)
    out = counter_increase(df, key_cols, order_cols, val_col, inc_col)
    c = F.col(ts_col).cast("timestamp") if is_ntz(df, ts_col) else F.col(ts_col)
    us = F.unix_micros(c)
    dt_us = us - F.lag(us).over(w)
    return out.withColumn(
        out_col,
        F.when(
            dt_us > 0,
            F.col(inc_col) / (dt_us.cast("double") / F.lit(1000000.0)),
        ).otherwise(F.lit(None)),
    )


def change_flags(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    val_col: str = "value",
) -> DataFrame:
    """Per-sample `changed` / `reset` integer flags (PromQL ``changes()``
    / ``resets()`` numerators): changed = value differs from the series
    predecessor, reset = value dropped below it.  Both 0 on each
    series' first sample (no predecessor — nothing changed yet), so a
    windowed SUM over the flags IS the changes/resets count for any
    window, including ones that cross the sample the window started on.
    Same single-Exchange window shape as the other counter transforms."""
    prev = F.lag(val_col).over(_w(key_cols, order_cols))
    changed = F.when(
        prev.isNotNull() & (F.col(val_col) != prev), F.lit(1)
    ).otherwise(F.lit(0))
    reset = F.when(
        prev.isNotNull() & (F.col(val_col) < prev), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn("changed", changed).withColumn("reset", reset)


def gauge_delta(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    val_col: str = "value",
    out_col: str = "delta",
) -> DataFrame:
    """Plain signed per-sample difference (gauges; no reset semantics)."""
    prev = F.lag(val_col).over(_w(key_cols, order_cols))
    return df.withColumn(out_col, F.col(val_col) - prev)


def instant_transforms(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """PromQL ``irate()`` / ``idelta()`` per-sample numerators: the
    instant rate/delta between each sample and its series predecessor —
    wherever that predecessor falls, exactly like PromQL's "last two
    samples in the range" (the range covers earlier buckets too).
    Adds ``irate`` (reset-aware increase / elapsed seconds, NULL on a
    series' first sample or a non-increasing timestamp) and ``idelta``
    (plain signed difference, gauge semantics).

    Elapsed time is microsecond-exact integer arithmetic with ONE double
    division at the end — the repo's hash-safe float convention.  A
    bucketed read (the ``irate_events`` registry query) keeps each
    (series, bucket)'s LAST sample: PromQL's instant evaluation at the
    bucket boundary.

    Scale shape: one window = one hash Exchange on the series key + an
    in-partition sort — identical to counter_rate above; the bucketed
    keep-last is a second window on a strict refinement of the same key,
    so AQE reuses the Exchange lineage."""
    from fischer_spark.functions.time import is_ntz

    w = _w(key_cols, order_cols)
    c = F.col(ts_col).cast("timestamp") if is_ntz(df, ts_col) else F.col(ts_col)
    us = F.unix_micros(c)
    prev_v = F.lag(val_col).over(w)
    dt_us = us - F.lag(us).over(w)
    inc = F.when(F.col(val_col) >= prev_v, F.col(val_col) - prev_v).otherwise(
        F.col(val_col)  # reset: counter restarted from 0
    )
    dt_s = dt_us.cast("double") / F.lit(1000000.0)
    return df.withColumn(
        "irate",
        F.when(prev_v.isNotNull() & (dt_us > 0), inc / dt_s),
    ).withColumn("idelta", F.col(val_col) - prev_v)


def extrapolated_rate(
    df: DataFrame,
    key_cols: list[str],
    bucket_col: str,
    window_s: int,
    ts_col: str = "ts",
    val_col: str = "value",
    counter: bool = True,
) -> DataFrame:
    """PromQL ``rate()`` / ``increase()`` with the REAL Prometheus
    window-boundary extrapolation (public semantics, promql/functions.go
    ``extrapolatedRate``), per (series key, window bucket).  This is the
    presentation-layer estimate the module docstring's exact transforms
    deliberately omit — offered here as an explicit opt-in so a PromQL
    user gets numbers that match their Prometheus graphs:

      raw        = reset-aware increase over the samples INSIDE the
                   window (first in-window sample is the base)
      sampled    = t_last - t_first (seconds)
      avg_iv     = sampled / (n - 1);   thresh = avg_iv * 1.1
      d_start    = t_first - window_start, snapped to avg_iv/2 when it
                   exceeds thresh; counters additionally cap it at the
                   time-to-zero  sampled * (v_first / raw)  so the
                   extrapolated increase never implies a negative start
      d_end      = window_end - t_last, snapped the same way
      increase   = raw * ((sampled + d_start + d_end) / sampled)
      rate       = raw * ((sampled + d_start + d_end) / sampled
                          / window_s)          -- Prometheus op order

    Windows with fewer than two samples (or zero sampled interval —
    duplicate-only timestamps) yield no row, exactly like PromQL.

    Expects ONE sample per (key, ts) — collapse duplicates first so
    first/last lookups are deterministic.  Float ops run in the pinned
    order above (integer microseconds until the documented divisions),
    so a SQL oracle replaying the same order matches bit-for-bit.

    Scale shape: one lag window partitioned by (key, bucket) + a
    groupBy on the same columns — AQE reuses the single hash Exchange;
    no Python, no second shuffle."""
    from fischer_spark.functions.time import is_ntz

    grp = [*key_cols, bucket_col]
    w = Window.partitionBy(*grp).orderBy(ts_col)
    c = F.col(ts_col).cast("timestamp") if is_ntz(df, ts_col) else F.col(ts_col)
    us = F.unix_micros(c)
    prev_v = F.lag(val_col).over(w)
    inc = (
        F.when(F.col(val_col) >= prev_v, F.col(val_col) - prev_v).otherwise(
            F.col(val_col)
        )
        if counter
        else F.col(val_col) - prev_v
    )
    bc = (
        F.col(bucket_col).cast("timestamp")
        if is_ntz(df, bucket_col)
        else F.col(bucket_col)
    )
    per = df.select(
        *grp,
        us.alias("_us"),
        F.col(val_col).alias("_v"),
        F.when(prev_v.isNotNull(), inc).alias("_inc"),
        F.unix_micros(bc).alias("_bus"),
    )
    g = per.groupBy(*grp).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_inc").alias("raw"),
        F.min("_us").alias("_us_first"),
        F.max("_us").alias("_us_last"),
        F.min_by("_v", "_us").alias("_v_first"),
        F.min("_bus").alias("_bus0"),
    )
    g = g.where((F.col("n") >= 2) & (F.col("_us_last") > F.col("_us_first")))
    sampled = (F.col("_us_last") - F.col("_us_first")).cast("double") / F.lit(1e6)
    avg_iv = sampled / (F.col("n") - F.lit(1)).cast("double")
    thresh = avg_iv * F.lit(1.1)
    d_start_raw = (F.col("_us_first") - F.col("_bus0")).cast("double") / F.lit(1e6)
    d_end_raw = (
        F.col("_bus0") + F.lit(window_s * 1_000_000) - F.col("_us_last")
    ).cast("double") / F.lit(1e6)
    d_start = F.when(d_start_raw >= thresh, avg_iv / F.lit(2.0)).otherwise(
        d_start_raw
    )
    if counter:
        d_zero = sampled * (
            F.col("_v_first").cast("double") / F.col("raw").cast("double")
        )
        d_start = F.when(
            (F.col("raw") > 0) & (F.col("_v_first") >= 0),
            F.least(d_start, d_zero),
        ).otherwise(d_start)
    d_end = F.when(d_end_raw >= thresh, avg_iv / F.lit(2.0)).otherwise(d_end_raw)
    factor = (sampled + d_start + d_end) / sampled
    return g.select(
        *grp,
        "n",
        "raw",
        (F.col("raw").cast("double") * factor).alias("increase_ext"),
        (
            F.col("raw").cast("double")
            * (factor / F.lit(float(window_s)))
        ).alias("rate_ext"),
    )
