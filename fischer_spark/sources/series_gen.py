"""Deterministic synthetic series-point generator (bench/scaling input).

Generates the canonical long series form directly — no html payloads —
so rollup/detector benchmarks measure ENGINE throughput ("rolled-up
points/sec", BASELINE.json metric) rather than page-synthesis cost.
Pure column expressions over spark.range: reproducible at any
parallelism, like synth_pages.

Layout: `n_keys` series keys × `points_per_key` points at `cadence_s`
spacing (with ±jitter), values = level + daily sine + hash noise, one
planted spike per 10k-th key so detector stages have work to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"


def synth_series(
    spark: SparkSession,
    n_keys: int = 1000,
    points_per_key: int = 10_000,
    cadence_s: int = 10,
    seed: int = 42,
) -> DataFrame:
    n = n_keys * points_per_key
    df = spark.range(n)
    h = lambda k: F.xxhash64(F.col("id"), F.lit(seed), F.lit(k))  # noqa: E731
    key_idx = (F.col("id") / points_per_key).cast("long")
    i = F.col("id") % points_per_key

    jitter = F.pmod(h(1), F.lit(cadence_s)).cast("long")
    ts = F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(
        F.lit(0), F.lit(0), F.lit(0), (i * cadence_s + jitter).cast("decimal(18,6)")
    )
    sec_of_day = (i * cadence_s) % 86400
    level = (F.pmod(key_idx * 7919, F.lit(500)) + 20).cast("double")
    seasonal = F.sin(sec_of_day.cast("double") / 86400.0 * 6.283185307179586) * (
        level * 0.2
    )
    noise = (F.pmod(h(2), F.lit(1000)).cast("double") / 1000.0 - 0.5) * (level * 0.05)
    spike = F.when(
        (F.pmod(key_idx, F.lit(97)) == 0)
        & (i > points_per_key * 0.7)
        & (i < points_per_key * 0.7 + 50),
        level * 5.0,
    ).otherwise(F.lit(0.0))

    return df.select(
        F.concat(F.lit("k"), key_idx.cast("string")).alias("domain"),
        F.lit("synthetic").alias("metric"),
        F.lit(None).cast("string").alias("tag"),
        ts.alias("bucket_ts"),
        (level + seasonal + noise + spike).alias("value"),
    )
