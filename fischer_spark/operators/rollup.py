"""O17/O18 — tiered continuous aggregates with exact algebraic states.

Design (SURVEY.md §4.2, §7 hard-part 1): a rollup row carries the algebraic
state (cnt, sum, sum_sq, min, max).  sum/sum_sq are DECIMAL, so addition is
exact and order-free — `rollup_1h(raw) == rollup_1h(rollup_1m(raw))`
bit-for-bit at every tier, under any partitioning / parallelism.  mean and
stddev are *derived* from the state at read time, never aggregated.

Scale notes:
- `rollup_points` is one shuffle on (key, bucket); map-side partial
  aggregation is automatic (hash-aggregate partial+final).
- `rollup_states` re-aggregates a *much smaller* input (bucket counts, not
  raw rows): the 1m→1h→1d cascade touches raw data exactly once.
- `rollup_points_salted` is the explicit hot-key path (BASELINE.json:
  "explicit salt-based skew handling for hot domains"): phase 1 spreads a
  hot (domain, bucket) group over SALT_K reducers, phase 2 combines the
  SALT_K exact partial states.  Because the state algebra is exact, the
  salted result is bit-identical to the unsalted one — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fischer_spark.schemas import TIER_TRUNC

KEY_COLS = ["domain", "metric", "tag"]
STATE_COLS = ["cnt", "sum", "sum_sq", "min", "max"]

# value → exact decimal: 6 fractional digits covers count/share/byte values;
# sum_sq gets 12.  value*value is computed in double (deterministic per row)
# then cast — exact for |v²| < 1e16, which holds for all three families.
_DEC_SUM = "decimal(28,6)"
_DEC_SQ = "decimal(28,12)"


def _point_aggs() -> list:
    v = F.col("value")
    return [
        F.count(v).alias("cnt"),
        F.sum(v.cast(_DEC_SUM)).alias("sum"),
        F.sum((v * v).cast(_DEC_SQ)).alias("sum_sq"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    ]


def _state_aggs() -> list:
    return [
        F.sum("cnt").alias("cnt"),
        F.sum("sum").alias("sum"),
        F.sum("sum_sq").alias("sum_sq"),
        F.min("min").alias("min"),
        F.max("max").alias("max"),
    ]


def rollup_points(points: DataFrame, tier: str) -> DataFrame:
    """Raw series points → one tier of algebraic states."""
    bucket = F.date_trunc(TIER_TRUNC[tier], "bucket_ts").alias("bucket_ts")
    return (
        points.groupBy(*KEY_COLS, bucket)
        .agg(*_point_aggs())
        .withColumn("tier", F.lit(tier))
        .select(*KEY_COLS, "tier", "bucket_ts", *STATE_COLS)
    )


def rollup_states(states: DataFrame, tier: str) -> DataFrame:
    """Finer-tier states → coarser tier, by exact state addition."""
    bucket = F.date_trunc(TIER_TRUNC[tier], "bucket_ts").alias("bucket_ts")
    return (
        states.groupBy(*KEY_COLS, bucket)
        .agg(*_state_aggs())
        .withColumn("tier", F.lit(tier))
        .select(*KEY_COLS, "tier", "bucket_ts", *STATE_COLS)
    )


def rollup_points_salted(points: DataFrame, tier: str, salt_k: int = 16) -> DataFrame:
    """Two-phase skew-safe rollup: partial agg on (key, bucket, salt), then
    exact combine on (key, bucket).  Salt is a deterministic hash of the
    fine timestamp+value so re-runs shard identically.

    WHEN TO SALT: coarse buckets where one (key, bucket) group is huge —
    per-domain daily totals, all-time per-key aggregates — i.e. places
    where a single reducer would receive a hot group's full combine load.
    Do NOT salt fine buckets (raw→1m): groups there are small, map-side
    partial aggregation already combines hot groups per input partition,
    and salting multiplies the shuffled state rows instead (measured 5×
    on the 80M-point bench input — BENCH/BASELINE.md).  Exactness is
    identical either way (decimal state algebra), so the choice is purely
    a physical one."""
    bucket = F.date_trunc(TIER_TRUNC[tier], "bucket_ts").alias("bucket_ts")
    salted = points.withColumn(
        "_salt", F.pmod(F.xxhash64("bucket_ts", "value"), F.lit(salt_k))
    )
    partial = salted.groupBy(*KEY_COLS, bucket, "_salt").agg(*_point_aggs())
    return (
        partial.groupBy(*KEY_COLS, "bucket_ts")
        .agg(*_state_aggs())
        .withColumn("tier", F.lit(tier))
        .select(*KEY_COLS, "tier", "bucket_ts", *STATE_COLS)
    )


def with_derived_stats(states: DataFrame) -> DataFrame:
    """Attach mean/stddev derived from the exact state.

    stddev is the sample form sqrt((sum_sq - sum²/n) / (n-1)); guarded for
    n<2 and for tiny negative residue from the final double conversion.
    """
    n = F.col("cnt").cast("double")
    s = F.col("sum").cast("double")
    sq = F.col("sum_sq").cast("double")
    var = (sq - (s * s) / n) / (n - F.lit(1.0))
    return states.withColumn("mean", s / n).withColumn(
        "stddev",
        F.when(F.col("cnt") < 2, F.lit(None).cast("double")).otherwise(
            F.sqrt(F.greatest(var, F.lit(0.0)))
        ),
    )


def tiered_rollups(points: DataFrame, tiers: tuple[str, ...] = ("1m", "1h", "1d"), salt_k: int | None = None) -> dict[str, DataFrame]:
    """The continuous-aggregate cascade: raw→1m once, then 1m→1h→1d from
    states.  Raw data is touched exactly once regardless of tier count."""
    out: dict[str, DataFrame] = {}
    base = (
        rollup_points_salted(points, tiers[0], salt_k)
        if salt_k
        else rollup_points(points, tiers[0])
    )
    out[tiers[0]] = base
    prev = base
    for t in tiers[1:]:
        prev = rollup_states(prev, t)
        out[t] = prev
    return out
