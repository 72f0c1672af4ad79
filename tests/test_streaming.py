"""Streaming extension smoke: rate-limited memory stream through the 1m
window rollup and the stateful z-score, checked against batch algebra."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def pages_batch(spark, pages):
    return pages.select(
        "domain", "warc_ts", F.octet_length("html").alias("page_bytes")
    ).filter(F.col("domain") == "d001.example")


def test_streaming_rollup_matches_batch(spark, pages_batch, tmp_path):
    from fischer_spark.streaming.rollup_stream import streaming_rollup_1m

    src_dir = str(tmp_path / "src")
    pages_batch.write.parquet(src_dir)
    stream = (
        spark.readStream.schema(pages_batch.schema).parquet(src_dir)
    )
    out = streaming_rollup_1m(stream, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("t_stream_1m")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_stream_1m")

    from fischer_spark.operators.rollup import rollup_points
    from fischer_spark.operators.series import page_size_series

    want = rollup_points(page_size_series(pages_batch), "1m")
    # append-mode emits only watermark-finalized windows; with
    # availableNow the final watermark may hold back the last window(s)
    finalized = got.count()
    assert finalized > 0
    # join on non-null keys only (tag is NULL for page_size; NULL keys
    # never equi-join — the engine's internal joins use sentinel keys)
    j = got.join(
        want.select(
            "domain", "bucket_ts",
            F.col("cnt").alias("w_cnt"), F.col("sum").alias("w_sum"),
        ),
        ["domain", "bucket_ts"],
        "inner",
    )
    assert j.count() == finalized  # every emitted window exists in batch
    assert j.filter((F.col("cnt") != F.col("w_cnt")) | (F.col("sum") != F.col("w_sum"))).count() == 0


def test_streaming_zscore_state(spark, tmp_path):
    from fischer_spark.streaming.rollup_stream import streaming_zscore

    import datetime

    rows = [
        ("k", datetime.datetime(2024, 1, 1, 0, m), 10.0 + (m % 3) + (50.0 if m == 20 else 0.0))
        for m in range(30)
    ]
    src = spark.createDataFrame(rows, "domain string, bucket_ts timestamp, value double")
    src_dir = str(tmp_path / "zsrc")
    src.write.parquet(src_dir)
    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    q = (
        streaming_zscore(stream)
        .writeStream.format("memory")
        .queryName("t_stream_z")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.bucket_ts.minute: r.score for r in spark.sql("SELECT * FROM t_stream_z").collect()}
    assert len(got) == 30
    assert got[20] is not None and got[20] > 3  # planted spike scored
    assert got[0] is None  # cold state unscored


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_streaming_coarse_tiers_match_batch(spark, pages_batch, tmp_path, tier):
    """1h/1d streaming tiers carry the same exact states as the batch
    rollup at that tier (the lambda-architecture seam, per tier)."""
    from fischer_spark.streaming.rollup_stream import streaming_rollup_tier

    src_dir = str(tmp_path / f"src_{tier}")
    pages_batch.write.parquet(src_dir)
    stream = spark.readStream.schema(pages_batch.schema).parquet(src_dir)
    out = streaming_rollup_tier(stream, tier, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName(f"t_stream_{tier}")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM t_stream_{tier}")

    from fischer_spark.operators.rollup import rollup_points
    from fischer_spark.operators.series import page_size_series

    want = rollup_points(page_size_series(pages_batch), tier)
    finalized = got.count()
    assert finalized > 0
    j = got.join(
        want.select(
            "domain", "bucket_ts",
            F.col("cnt").alias("w_cnt"), F.col("sum").alias("w_sum"),
            F.col("sum_sq").alias("w_sq"),
        ),
        ["domain", "bucket_ts"],
        "inner",
    )
    assert j.count() == finalized
    assert (
        j.filter(
            (F.col("cnt") != F.col("w_cnt"))
            | (F.col("sum") != F.col("w_sum"))
            | (F.col("sum_sq") != F.col("w_sq"))
        ).count()
        == 0
    )


def test_streaming_hist_tier_matches_batch(spark, pages_batch, tmp_path):
    """Streaming histogram states (finalized windows) equal the batch
    histogram tier bit-for-bit — the percentile lambda seam."""
    from fischer_spark.streaming.rollup_stream import streaming_hist_tier

    src_dir = str(tmp_path / "hsrc")
    pages_batch.write.parquet(src_dir)
    stream = spark.readStream.schema(pages_batch.schema).parquet(src_dir)
    q = (
        streaming_hist_tier(stream, "1h", 0.0, float(1 << 20), 256, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("t_stream_hist")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM t_stream_hist")

    from fischer_spark.operators.histogram import hist_states
    from fischer_spark.operators.series import page_size_series

    want = hist_states(page_size_series(pages_batch), "1h", 0.0, float(1 << 20), 256)
    finalized = got.count()
    assert finalized > 0
    j = got.join(
        want.select("domain", "bucket_ts", "bin", F.col("bin_cnt").alias("w_cnt")),
        ["domain", "bucket_ts", "bin"],
        "inner",
    )
    assert j.count() == finalized
    assert j.filter(F.col("bin_cnt") != F.col("w_cnt")).count() == 0
