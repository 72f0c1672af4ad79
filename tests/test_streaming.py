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


def test_streaming_late_event_within_watermark_matches_batch_refresh(
    spark, tmp_path
):
    """VERDICT r2 next #7 — the lambda seam under late data: a late event
    arriving INSIDE the watermark merges into its still-open window, and
    the finalized streaming state equals the batch system of record after
    an idempotent late-data refresh (refresh_tier → overwrite_range) —
    bit-for-bit, every state column."""
    import datetime
    import glob
    import os
    import shutil

    from fischer_spark.operators.rollup import refresh_tier, rollup_points
    from fischer_spark.operators.series import page_size_series
    from fischer_spark.sources.storage import ParquetManifestStore
    from fischer_spark.streaming.rollup_stream import streaming_rollup_1m

    t0 = datetime.datetime(2024, 1, 1)
    mk = lambda m, b: ("d", t0 + datetime.timedelta(minutes=m), b)
    schema = "domain string, warc_ts timestamp, page_bytes long"
    on_time = [mk(m, 100 + m) for m in range(10)] + [mk(30, 500)]
    late = [mk(5, 999)]  # same 1m bucket as the on-time minute-5 row
    flush1 = [mk(180, 1)]  # advances watermark past every real window
    flush2 = [mk(240, 1)]  # one more batch so append-mode emits them

    src = tmp_path / "late_src"
    src.mkdir()
    for i, batch in enumerate([on_time, late, flush1, flush2]):
        part_dir = str(tmp_path / f"b{i}")
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(part_dir)
        dst = str(src / f"{i:02d}.parquet")
        shutil.copy(glob.glob(f"{part_dir}/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))  # file-source order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one micro-batch per file, in order
        .parquet(str(src))
    )
    q = (
        streaming_rollup_1m(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_stream_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM t_stream_late WHERE bucket_ts < '2024-01-01 01:00:00'")

    # the late row merged into its open window before finalization
    merged = got.filter(F.col("bucket_ts") == "2024-01-01 00:05:00").collect()
    assert len(merged) == 1 and merged[0]["cnt"] == 2
    assert float(merged[0]["sum"]) == 105.0 + 999.0
    assert got.count() == 11  # all on-time windows finalized too

    # batch system of record: base rollup committed, then the late event
    # arrives and refresh_tier reprocesses exactly the touched bucket
    store = ParquetManifestStore(spark, str(tmp_path / "wh"))
    base_pts = page_size_series(spark.createDataFrame(on_time, schema))
    store.append("rollup_1m", rollup_points(base_pts, "1m"))
    late_pts = page_size_series(spark.createDataFrame(late, schema))
    assert refresh_tier(store, "rollup_1m", "1m", late_pts) is not None

    want = store.read("rollup_1m")
    j = got.join(
        want.select(
            "domain", "bucket_ts",
            F.col("cnt").alias("w_cnt"), F.col("sum").alias("w_sum"),
            F.col("sum_sq").alias("w_sq"), F.col("min").alias("w_min"),
            F.col("max").alias("w_max"),
        ),
        ["domain", "bucket_ts"],
        "inner",
    )
    assert j.count() == 11  # every finalized window exists in the store
    assert (
        j.filter(
            (F.col("cnt") != F.col("w_cnt"))
            | (F.col("sum") != F.col("w_sum"))
            | (F.col("sum_sq") != F.col("w_sq"))
            | (F.col("min") != F.col("w_min"))
            | (F.col("max") != F.col("w_max"))
        ).count()
        == 0
    )


def test_streaming_counter_rate_matches_batch(spark, tmp_path):
    """Streaming reset-aware counter rate == batch operators/counters
    on the same in-order series, including across a reset."""
    import datetime as dt

    from fischer_spark.operators.counters import counter_rate
    from fischer_spark.streaming.rollup_stream import streaming_counter_rate

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # two keys; key "a" has a genuine reset (40 -> 7)
    vals_a = [10.0, 25.0, 40.0, 7.0, 9.5]
    vals_b = [100.0, 100.0, 160.0]
    for i, v in enumerate(vals_a):
        rows.append(("a", t0 + dt.timedelta(seconds=90 * i), v))
    for i, v in enumerate(vals_b):
        rows.append(("b", t0 + dt.timedelta(seconds=45 * i), v))
    src = spark.createDataFrame(
        rows, "domain: string, bucket_ts: timestamp, value: double"
    )
    src_dir = str(tmp_path / "cr_src")
    src.coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    q = (
        streaming_counter_rate(stream)
        .writeStream.format("memory")
        .queryName("t_stream_cr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["domain"], r["bucket_ts"]): (r["increase"], r["rate"])
        for r in spark.sql("SELECT * FROM t_stream_cr").collect()
    }
    want = {
        (r["domain"], r["bucket_ts"]): (r["increase"], r["rate"])
        for r in counter_rate(
            src, ["domain"], ["bucket_ts"], ts_col="bucket_ts"
        ).collect()
    }
    assert set(got) == set(want) and len(got) == len(rows)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert (g is None and w is None) or g == w


def test_streaming_alerts_match_batch_transitions(spark, tmp_path):
    """O85: streaming pending/firing/resolved transitions == the ones
    derived from batch alert_for_intervals on the same bucket series —
    including a run that spans a micro-batch boundary and a gap-reset."""
    import datetime
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from fischer_spark.operators.detect import alert_for_intervals
    from fischer_spark.streaming.rollup_stream import streaming_alerts

    t0 = datetime.datetime(2024, 1, 1)
    hr = lambda h: t0 + datetime.timedelta(hours=h)  # noqa: E731
    # key "a": true h0-h4 (fires, for=3h), false h5 (resolves),
    #          true h7-h8 (pending; gap at h5-h6 means fresh run), false h9
    # key "b": true h0-h1 only (pending), false h2
    # key "c": true h0-h1, MISSING h2, false h3 — the gap is discovered
    #          from a FALSE bucket: resolved must still be retroactive at
    #          h2 (= last_idx+1), same as discovery from a true bucket
    #          (ADVICE r3: resolution timing must not depend on the
    #          polarity of the next observed record)
    rows = [
        ("a", hr(h), v)
        for h, v in [(0, 9.0), (1, 9.0), (2, 9.0), (3, 9.0), (4, 9.0), (5, 1.0),
                     (7, 9.0), (8, 9.0), (9, 1.0)]
    ] + [("b", hr(h), v) for h, v in [(0, 9.0), (1, 9.0), (2, 1.0)]] + [
        ("c", hr(h), v) for h, v in [(0, 9.0), (1, 9.0), (3, 1.0)]
    ]
    schema = "domain string, bucket_ts timestamp, value double"
    # split mid-run: the a-run h0-h4 spans the batch boundary at h2
    batches = [
        [r for r in rows if r[1] < hr(3)],
        [r for r in rows if r[1] >= hr(3)],
    ]
    src = tmp_path / "al_src"
    src.mkdir()
    for i, batch in enumerate(batches):
        part = str(tmp_path / f"al_b{i}")
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(part)
        dst = str(src / f"{i:02d}.parquet")
        shutil.copy(glob.glob(f"{part}/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("cond", F.col("value") >= 5)
    )
    q = (
        streaming_alerts(stream, tier="1h", for_s=3 * 3600, alertname="hot")
        .writeStream.format("memory")
        .queryName("t_stream_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["domain"], r["event"], r["at_ts"])
        for r in spark.sql("SELECT * FROM t_stream_alerts").collect()
    }

    # batch truth: islands → transitions (resolved = ends_at + step for
    # every island here, since each is followed by a false/later bucket)
    batch_df = spark.createDataFrame(rows, schema).select(
        "domain", F.lit("m").alias("metric"), F.lit(None).cast("string").alias("tag"),
        "bucket_ts", "value",
    )
    islands = alert_for_intervals(
        batch_df, F.col("value") >= 5, tier="1h", for_s=3 * 3600, alertname="hot"
    ).collect()
    want = set()
    for r in islands:
        want.add((r["domain"], "pending", r["starts_at"]))
        if r["state"] == "firing":
            want.add((r["domain"], "firing", r["fires_at"]))
        want.add(
            (r["domain"], "resolved", r["ends_at"] + datetime.timedelta(hours=1))
        )
    assert got == want, (sorted(got), sorted(want))
    # sanity on the shape itself
    assert ("a", "firing", hr(3)) in got           # fired at start+for
    assert ("a", "resolved", hr(5)) in got         # false bucket resolves
    assert ("a", "pending", hr(7)) in got          # gap => fresh run
    assert not any(d == "b" and e == "firing" for d, e, _ in got)
    # gap discovered from a false bucket resolves retroactively at h2,
    # never at the false bucket's own h3
    assert ("c", "resolved", hr(2)) in got
    assert ("c", "resolved", hr(3)) not in got


def test_streaming_hist_tier_late_event_matches_batch_refresh(spark, tmp_path):
    """VERDICT r4 next #6 — the hist-tier lambda seam under late data,
    mirroring the states seam test above: a late event arriving INSIDE
    the watermark merges into its still-open 1h window's BIN COUNTS,
    and every finalized streaming hist row equals the batch hist tier
    after an idempotent late-data refresh (refresh_hist_tier), exact
    integer bin counts bit-for-bit."""
    import datetime
    import glob
    import os
    import shutil

    from fischer_spark.operators.histogram import hist_states, refresh_hist_tier
    from fischer_spark.operators.series import page_size_series
    from fischer_spark.sources.storage import ParquetManifestStore
    from fischer_spark.streaming.rollup_stream import streaming_hist_tier

    LO, HI, NB = 0.0, 1024.0, 16  # bin width 64
    t0 = datetime.datetime(2024, 1, 1)
    mk = lambda m, b: ("d", t0 + datetime.timedelta(minutes=m), b)
    schema = "domain string, warc_ts timestamp, page_bytes long"
    # hour-0 window: minutes 0..9 at 100+m (all bin 1), minute 30 at 500 (bin 7)
    on_time = [mk(m, 100 + m) for m in range(10)] + [mk(30, 500)]
    late = [mk(5, 100)]  # same window AND same bin as the on-time rows
    flush1 = [mk(180, 1)]  # advances watermark past the real window
    flush2 = [mk(240, 1)]  # one more batch so append-mode emits it

    src = tmp_path / "hist_late_src"
    src.mkdir()
    for i, batch in enumerate([on_time, late, flush1, flush2]):
        part_dir = str(tmp_path / f"hb{i}")
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(part_dir)
        dst = str(src / f"{i:02d}.parquet")
        shutil.copy(glob.glob(f"{part_dir}/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i, 1700000000 + i))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_hist_tier(stream, "1h", LO, HI, NB, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("t_stream_hist_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT * FROM t_stream_hist_late WHERE bucket_ts < '2024-01-01 01:00:00'"
    )

    # the late row merged into its open window's bin before finalization
    bins = {r["bin"]: r["bin_cnt"] for r in got.collect()}
    assert bins == {1: 11, 7: 1}

    # batch system of record: base hist tier committed, then the late
    # event refreshes exactly the touched bucket by bin-count addition
    store = ParquetManifestStore(spark, str(tmp_path / "hwh"))
    base = hist_states(
        page_size_series(spark.createDataFrame(on_time, schema)), "1h", LO, HI, NB
    )
    store.append("hist_1h", base)
    delta = hist_states(
        page_size_series(spark.createDataFrame(late, schema)), "1h", LO, HI, NB
    )
    assert refresh_hist_tier(store, "hist_1h", "1h", delta) is not None

    want = store.read("hist_1h")
    j = got.join(
        want.select("domain", "bucket_ts", "bin", F.col("bin_cnt").alias("w_cnt")),
        ["domain", "bucket_ts", "bin"],
        "inner",
    )
    assert j.count() == got.count() == 2
    assert j.filter(F.col("bin_cnt") != F.col("w_cnt")).count() == 0
