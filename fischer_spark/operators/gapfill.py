"""O24/O25 — gap-fill: dense bucket spine + LOCF / linear interpolation.

Pure DataFrame closed forms (DuckDB-oracle-expressible):
- spine: per-key `sequence(min_ts, max_ts, tier interval)` + explode,
  left-joined to real points. The sequence is generated distributed,
  per key — no driver loop, no cross-key blowup.
- LOCF: `last(value, ignorenulls)` over an unbounded-preceding row frame.
- linear: prev/next real point via last/first ignorenulls, closed-form
  lerp on epoch seconds.

Scale note (SURVEY.md §7 hard-part 5): the spine is O(key × span/tier).
Gap-fill is intended at domain granularity (≤ millions of keys), not url
granularity; url-level fill must be window-bounded by the caller.

Determinism note: a bucket holding SEVERAL real points has no inherent
row order, and the carried/anchor value for neighbouring gaps must not
depend on partitioning.  The fill windows therefore order by
(bucket_ts, value) — ties broken by value — making the LOCF carry the
bucket's max and linear's prev/next anchors the prev-max/next-min.
Callers wanting mean-anchored fill should pre-aggregate buckets first
(rollup → fill over the derived mean).  Caught by the pipeline test:
unordered ties made two identical runs disagree on filled minutes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fischer_spark.functions.time import bucketize, is_ntz

KEY_COLS = ["domain", "metric", "tag"]
TIER_INTERVAL = {"1m": "interval 1 minute", "1h": "interval 1 hour", "1d": "interval 1 day"}


def bucket_spine(points: DataFrame, tier: str) -> DataFrame:
    """Dense per-key bucket spine from each key's min to max bucket,
    left-joined with the real points; missing buckets have value NULL."""
    # tag is nullable and NULL join keys never match — carry a null-safe
    # sentinel key through the spine join, restore tag at the end.
    sentinel = "\x00"
    pts = (
        points.withColumn("bucket_ts", bucketize("bucket_ts", tier, is_ntz(points, "bucket_ts")))
        .withColumn("_tagk", F.coalesce(F.col("tag"), F.lit(sentinel)))
        .drop("tag")
    )
    spine = (
        pts.groupBy("domain", "metric", "_tagk")
        .agg(F.min("bucket_ts").alias("t0"), F.max("bucket_ts").alias("t1"))
        .select(
            "domain",
            "metric",
            "_tagk",
            F.explode(
                F.expr(f"sequence(t0, t1, {TIER_INTERVAL[tier]})")
            ).alias("bucket_ts"),
        )
    )
    joined = spine.join(pts, on=["domain", "metric", "_tagk", "bucket_ts"], how="left")
    return joined.withColumn(
        "tag", F.when(F.col("_tagk") == sentinel, F.lit(None).cast("string")).otherwise(F.col("_tagk"))
    ).drop("_tagk")


def gapfill_locf(points: DataFrame, tier: str) -> DataFrame:
    """Last-observation-carried-forward over the dense spine.
    Leading gaps stay NULL (nothing to carry)."""
    dense = bucket_spine(points, tier)
    w = (
        Window.partitionBy(*KEY_COLS)
        .orderBy("bucket_ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.withColumn(
        "value_filled", F.last("value", ignorenulls=True).over(w)
    ).withColumn("was_gap", F.col("value").isNull())


def gapfill_linear(points: DataFrame, tier: str) -> DataFrame:
    """Linear interpolation between surrounding real points.
    Edges (no prev or no next) stay NULL."""
    dense = bucket_spine(points, tier)
    wp = (
        Window.partitionBy(*KEY_COLS)
        .orderBy("bucket_ts", "value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(*KEY_COLS)
        .orderBy("bucket_ts", "value")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    real_ts = F.when(F.col("value").isNotNull(), F.col("bucket_ts"))
    d = (
        dense.withColumn("pv", F.last("value", ignorenulls=True).over(wp))
        .withColumn("pt", F.last(real_ts, ignorenulls=True).over(wp))
        .withColumn("nv", F.first("value", ignorenulls=True).over(wn))
        .withColumn("nt", F.first(real_ts, ignorenulls=True).over(wn))
    )
    pt_s = F.unix_timestamp("pt").cast("double")
    nt_s = F.unix_timestamp("nt").cast("double")
    t_s = F.unix_timestamp("bucket_ts").cast("double")
    frac = (t_s - pt_s) / (nt_s - pt_s)
    lerp = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
    return (
        d.withColumn(
            "value_filled",
            F.when(F.col("value").isNotNull(), F.col("value"))
            .when(F.col("pv").isNotNull() & F.col("nv").isNotNull(), lerp)
            .otherwise(F.lit(None).cast("double")),
        )
        .withColumn("was_gap", F.col("value").isNull())
        .drop("pv", "pt", "nv", "nt")
    )
