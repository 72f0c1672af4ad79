"""Detector tests: cross-check the Catalyst-window form against the
grouped-Arrow-UDF form (SURVEY.md §5.6), interval assembly, and planted
anomaly recovery on the synthetic pages table."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.detect import (
    anomaly_intervals,
    seasonal_score,
    seasonal_score_grouped_arrow,
    zscore_grouped_arrow,
    zscore_window,
)
from fischer_spark.operators.series import crawl_rate_series

from tests.conftest import assert_df_equal


def _series(spark, values, start_hour=0):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("d.example", "m", None, t0 + timedelta(hours=start_hour + i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )


def test_zscore_flags_spike(spark):
    vals = [10.0, 11, 10, 9, 10, 11, 10, 9, 10, 11, 100, 10, 9]
    scored = zscore_window(_series(spark, vals), w=8, min_periods=4)
    rows = {r.bucket_ts.hour: r.score for r in scored.collect()}
    assert rows[10] is not None and abs(rows[10]) > 3
    # early points have no score (window too small)
    assert rows[0] is None and rows[3] is None


def test_zscore_window_vs_arrow(spark, pages):
    pts = crawl_rate_series(pages.filter(F.col("domain").isin(
        "d000.example", "d001.example", "d005.example")))
    a = zscore_window(pts, w=24, min_periods=8)
    b = zscore_grouped_arrow(pts, w=24, min_periods=8)
    assert_df_equal(a, b, tol=1e-9)


def test_seasonal_window_vs_arrow(spark, pages):
    pts = crawl_rate_series(pages.filter(F.col("domain").isin(
        "d002.example", "d004.example")))
    a = seasonal_score(pts, min_slot_n=2)
    b = seasonal_score_grouped_arrow(pts, min_slot_n=2)
    # scores (the semantics) agree to 1e-9; the raw sd diagnostic may carry
    # ~1e-9 float noise on constant slots (why the SD floor is relative)
    assert_df_equal(a.drop("sd"), b.drop("sd"), tol=1e-9)
    assert_df_equal(a.select("domain", "bucket_ts", "sd"),
                    b.select("domain", "bucket_ts", "sd"), tol=1e-6)


def test_interval_assembly(spark):
    # islands at hours 3-4 and 8 (scores over tau=3), rest quiet
    scores = [0, 1, 0, 5, 6, 0, 1, 0, -4, 0]
    df = _series(spark, scores).withColumnRenamed("value", "score")
    df = df.withColumn("value", F.lit(1.0)).withColumn("mu", F.lit(0.0)).withColumn("sd", F.lit(1.0))
    out = anomaly_intervals(df, tau=3.0).orderBy("interval_start").collect()
    assert len(out) == 2
    assert out[0].interval_start.hour == 3 and out[0].interval_end.hour == 4
    assert out[0].n_points == 2 and out[0].peak_score == 6.0
    assert out[1].interval_start.hour == 8 and out[1].n_points == 1
    assert out[1].peak_score == 4.0  # abs of -4


def test_planted_crawl_spike_detected(pages):
    """Synthetic domain d000 has a crawl-rate spike on day 5 hours 10-14;
    the hourly z-score detector must emit an interval covering it."""
    pts = crawl_rate_series(pages.filter(F.col("domain") == "d000.example"))
    from fischer_spark.operators.rollup import rollup_points, with_derived_stats

    hourly = with_derived_stats(rollup_points(pts, "1h")).select(
        "domain", "metric", "tag", "bucket_ts", F.col("sum").cast("double").alias("value")
    )
    scored = zscore_window(hourly, w=24, min_periods=8)
    ivals = anomaly_intervals(scored, tau=3.0).collect()
    assert any(
        iv.interval_start.day == 6 and 10 <= iv.interval_start.hour <= 14 for iv in ivals
    ), [(iv.interval_start, iv.peak_score) for iv in ivals]


def test_robust_seasonal_score_outlier_resistance(spark):
    """A single wild sample cannot inflate the robust spread: normal
    samples keep |score| small while the outlier scores huge; a
    constant slot (mad == 0) yields NULL scores."""
    import datetime as dt

    from fischer_spark.operators.detect import robust_seasonal_score

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    rows = []
    # slot hour=9: values 100..109 plus one 10_000 outlier
    for i in range(10):
        rows.append((i, "a", t0 + dt.timedelta(days=i), 100.0 + i))
    rows.append((99, "a", t0 + dt.timedelta(days=10), 10_000.0))
    # slot hour=12: constant values -> mad == 0 -> NULL scores
    t12 = dt.datetime(2024, 1, 1, 12, 0, 0)
    for i in range(5):
        rows.append((200 + i, "a", t12 + dt.timedelta(days=i), 7.0))
    df = spark.createDataFrame(
        rows, "event_id: long, event_type: string, ts: timestamp, value: double"
    )
    out = {
        r["event_id"]: r
        for r in robust_seasonal_score(
            df, ["event_type"], F.hour("ts"), val_col="value"
        ).collect()
    }
    normal_scores = [abs(out[i]["score"]) for i in range(10)]
    assert max(normal_scores) < 2.0          # untouched by the outlier
    assert out[99]["score"] > 100.0          # the outlier itself screams
    for i in range(5):
        assert out[200 + i]["score"] is None  # constant slot
    # classic mean/std would let the outlier mask itself: its plain z
    # over this slot is < 3.2 while the robust score is > 100
    import statistics

    vals = [100.0 + i for i in range(10)] + [10_000.0]
    z_outlier = (10_000.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert z_outlier < 3.2


def test_alert_for_intervals_gap_resets_timer(spark):
    """O80: the `for` timer resets on a missing bucket — two 2h-true runs
    separated by a silent hour stay `pending` under for=3h, while an
    unbroken 3h run fires at starts_at + 3h."""
    import datetime

    from pyspark.sql import functions as F

    from fischer_spark.operators.detect import alert_for_intervals

    base = datetime.datetime(2024, 1, 1)

    def row(domain, h, v):
        return (domain, "m", None, base + datetime.timedelta(hours=h), float(v))

    rows = (
        # 'gap': true at h0,h1 — h2 missing — true at h3,h4 → two pending islands
        [row("gap", h, 9) for h in (0, 1, 3, 4)]
        # 'dip': true h0,h1, FALSE h2, true h3,h4 → also two pending islands
        + [row("dip", h, 9) for h in (0, 1, 3, 4)] + [row("dip", 2, 1)]
        # 'fire': true h0..h3 unbroken → one firing island
        + [row("fire", h, 9) for h in range(4)]
    )
    df = spark.createDataFrame(
        rows, "domain string, metric string, tag string, bucket_ts timestamp, value double"
    )
    out = alert_for_intervals(
        df, F.col("value") >= 5, tier="1h", for_s=3 * 3600, alertname="a"
    ).toPandas().sort_values(["domain", "starts_at"], ignore_index=True)

    gap = out[out.domain == "gap"]
    assert list(gap.state) == ["pending", "pending"] and list(gap.n_buckets) == [2, 2]
    assert gap.fires_at.isna().all()
    dip = out[out.domain == "dip"]
    assert list(dip.state) == ["pending", "pending"]
    fire = out[out.domain == "fire"]
    assert len(fire) == 1 and fire.state.iloc[0] == "firing"
    assert fire.n_buckets.iloc[0] == 4
    assert fire.fires_at.iloc[0] == base + datetime.timedelta(hours=3)


def test_alert_for_prometheus_convention(spark):
    """O80 opt-in (VERDICT r4 next #3a): convention="prometheus" fires on
    ELAPSED time (n-1)*step >= for, matching Prometheus' instant-sample
    rule, one bucket LATER than the default coverage rule n*step >= for.

    Hand-computed at tier=1h, for=3h:
      3 consecutive true buckets → bucket: 3h>=3h FIRING; prom: 2h<3h PENDING
      4 consecutive true buckets → both conventions FIRING
    """
    import datetime

    import pytest
    from pyspark.sql import functions as F

    from fischer_spark.operators.detect import alert_for_intervals

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("three", "m", None, base + datetime.timedelta(hours=h), 9.0)
        for h in range(3)
    ] + [
        ("four", "m", None, base + datetime.timedelta(hours=h), 9.0)
        for h in range(4)
    ]
    df = spark.createDataFrame(
        rows, "domain string, metric string, tag string, bucket_ts timestamp, value double"
    )
    cond = F.col("value") >= 5

    bucket = {
        r["domain"]: r
        for r in alert_for_intervals(df, cond, tier="1h", for_s=3 * 3600).collect()
    }
    prom = {
        r["domain"]: r
        for r in alert_for_intervals(
            df, cond, tier="1h", for_s=3 * 3600, convention="prometheus"
        ).collect()
    }
    # the divergence case: exactly-for-long run
    assert bucket["three"]["state"] == "firing"
    assert prom["three"]["state"] == "pending" and prom["three"]["fires_at"] is None
    # one bucket longer: both fire, at the same instant starts_at + for
    for out in (bucket, prom):
        assert out["four"]["state"] == "firing"
        assert out["four"]["fires_at"] == base + datetime.timedelta(hours=3)
    # both conventions report the same island geometry
    for d in ("three", "four"):
        assert bucket[d]["starts_at"] == prom[d]["starts_at"]
        assert bucket[d]["n_buckets"] == prom[d]["n_buckets"]

    with pytest.raises(ValueError, match="unknown for-convention"):
        alert_for_intervals(df, cond, tier="1h", for_s=0, convention="grafana")


# --------------------------------------------------------------------------
# iqr_outliers (O115): Tukey fences, hand-computed.
# --------------------------------------------------------------------------

def test_iqr_outliers_hand_computed(spark):
    import datetime as dt

    from fischer_spark.operators.detect import iqr_outliers

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # group "a": [1,2,3,4,100] -> q1=2, q3=4, fences [-1, 7]
        *[("a", t0 + dt.timedelta(hours=i), float(v))
          for i, v in enumerate([1, 2, 3, 4, 100])],
        # group "b": [0,10,20,1000] -> q1=7.5, q3=265, hi fence 651.25
        *[("b", t0 + dt.timedelta(hours=i), float(v))
          for i, v in enumerate([0, 10, 20, 1000])],
        ("b", t0 + dt.timedelta(hours=9), None),  # NULL dropped first
    ]
    df = spark.createDataFrame(rows, "k: string, bucket_ts: timestamp, value: double")
    out = iqr_outliers(df, ["k"], ts_col="bucket_ts").collect()
    a = {r["value"]: r for r in out if r["k"] == "a"}
    assert a[1.0]["q1"] == 2.0 and a[1.0]["q3"] == 4.0
    assert a[1.0]["lo_fence"] == -1.0 and a[1.0]["hi_fence"] == 7.0
    assert [a[v]["is_outlier"] for v in (1.0, 2.0, 3.0, 4.0, 100.0)] == [0, 0, 0, 0, 1]
    b = {r["value"]: r for r in out if r["k"] == "b"}
    assert len(b) == 4  # NULL row dropped
    assert b[0.0]["q1"] == 7.5
    assert b[0.0]["q3"] == 20.0 + (1000.0 - 20.0) * 0.25  # 265.0
    assert b[1000.0]["is_outlier"] == 1 and b[20.0]["is_outlier"] == 0


# --------------------------------------------------------------------------
# cusum_scores (O121): Page's two-sided CUSUM, hand-computed.
# --------------------------------------------------------------------------

def test_cusum_hand_computed_upward_shift(spark):
    import datetime as dt

    from fischer_spark.operators.detect import cusum_scores

    t0 = dt.datetime(2024, 1, 1)
    # target 10, k=1, h=3: values 10,12,13,13 -> d = 0,2,3,3
    # sp: max(0,0+0-1)=0; max(0,0+2-1)=1; max(0,1+3-1)=3; max(0,3+3-1)=5
    rows = [("a", t0 + dt.timedelta(hours=i), float(v), 10.0)
            for i, v in enumerate([10, 12, 13, 13])]
    df = spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, value: double, target: double"
    )
    out = sorted(cusum_scores(df, ["k"], k=1.0, h=3.0).collect(),
                 key=lambda r: r["bucket_ts"])
    assert [r["sp"] for r in out] == [0.0, 1.0, 3.0, 5.0]
    assert [r["sn"] for r in out] == [0.0, 0.0, 0.0, 0.0]
    assert [r["alarm"] for r in out] == [0, 0, 0, 1]  # alarm is sp > h, strict


def test_cusum_downward_shift_and_reset_to_zero(spark):
    import datetime as dt

    from fischer_spark.operators.detect import cusum_scores

    t0 = dt.datetime(2024, 1, 1)
    # drop below target then recover: sn accumulates, then drains to 0.
    rows = [("a", t0 + dt.timedelta(hours=i), float(v), 10.0)
            for i, v in enumerate([10, 7, 6, 10, 14])]
    df = spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, value: double, target: double"
    )
    out = sorted(cusum_scores(df, ["k"], k=1.0, h=5.0).collect(),
                 key=lambda r: r["bucket_ts"])
    # sn: 0; max(0,0+3-1)=2; max(0,2+4-1)=5; max(0,5+0-1)=4; max(0,4-4-1)=0
    assert [r["sn"] for r in out] == [0.0, 2.0, 5.0, 4.0, 0.0]
    assert [r["alarm"] for r in out] == [0, 0, 0, 0, 0]  # 5.0 is not > 5.0


def test_cusum_accumulates_small_shifts_zscore_misses(spark):
    import datetime as dt

    from fischer_spark.operators.detect import cusum_scores

    t0 = dt.datetime(2024, 1, 1)
    # persistent +2 shift, k=1: every step adds 1 -> crosses h=10 at
    # step 11 even though each sample is well inside any z fence.
    rows = [("a", t0 + dt.timedelta(hours=i), 12.0, 10.0) for i in range(15)]
    df = spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, value: double, target: double"
    )
    out = sorted(cusum_scores(df, ["k"], k=1.0, h=10.0).collect(),
                 key=lambda r: r["bucket_ts"])
    assert [r["sp"] for r in out] == [float(i + 1) for i in range(15)]
    assert [r["alarm"] for r in out] == [0] * 10 + [1] * 5
