"""O112 — PromQL *_over_time range functions (operators/overtime.py):
hand-computed expectations, plan shape (all-codegen, one Exchange), and
query_range(fn=...) wiring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.overtime import (
    mad_over_time,
    quantile_over_time,
)


def _series_df(spark, vals, key="a"):
    rows = [(key, i, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "k string, bucket_ts long, value double")


def _ref_q(frame, q):
    s = np.sort(np.asarray(frame, dtype=float))
    k = (len(s) - 1) * q
    lo, hi = s[int(np.floor(k))], s[int(np.ceil(k))]
    return lo + (hi - lo) * (k - np.floor(k))


def test_quantile_over_time_hand_computed(spark):
    vals = [5.0, 1.0, 3.0, 9.0, 7.0, 2.0]
    out = (
        quantile_over_time(
            _series_df(spark, vals), ["k"], {"p50": 0.5, "p90": 0.9}, w=3,
            ts_col="bucket_ts",
        )
        .orderBy("bucket_ts")
        .collect()
    )
    for i, r in enumerate(out):
        frame = vals[max(0, i - 2): i + 1]
        assert r["n"] == len(frame)
        assert r["p50"] == pytest.approx(_ref_q(frame, 0.5), abs=1e-12)
        assert r["p90"] == pytest.approx(_ref_q(frame, 0.9), abs=1e-12)


def test_mad_over_time_hand_computed(spark):
    vals = [1.0, 1.0, 10.0, 2.0, 3.0]
    out = (
        mad_over_time(_series_df(spark, vals), ["k"], w=3, ts_col="bucket_ts")
        .orderBy("bucket_ts")
        .collect()
    )
    for i, r in enumerate(out):
        frame = np.array(vals[max(0, i - 2): i + 1])
        med = _ref_q(frame, 0.5)
        assert r["med"] == pytest.approx(med, abs=1e-12)
        assert r["mad"] == pytest.approx(_ref_q(np.abs(frame - med), 0.5), abs=1e-12)


def test_quantile_over_time_drops_nulls(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, 3.0)],
        "k string, bucket_ts long, value double",
    )
    out = quantile_over_time(df, ["k"], {"p50": 0.5}, w=2, ts_col="bucket_ts")
    rows = {r["bucket_ts"]: r for r in out.collect()}
    assert set(rows) == {0, 2}          # NULL sample dropped, not emitted
    assert rows[2]["n"] == 2            # frame spans the gap (row frame)
    assert rows[2]["p50"] == pytest.approx(2.0)


def test_overtime_plan_all_codegen_single_exchange(spark):
    """Both *_over_time kernels must stay JVM-side: no Arrow/Python eval
    node, exactly one Exchange (the series key) — this is the contract
    that separates them from the smoothing kernels, which genuinely need
    sequential state."""
    from tests.test_plans import plan_of

    df = _series_df(spark, range(10))
    for op in (
        quantile_over_time(df, ["k"], {"p50": 0.5}, w=4, ts_col="bucket_ts"),
        mad_over_time(df, ["k"], w=4, ts_col="bucket_ts"),
    ):
        p = plan_of(op)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
        assert p.count(") Exchange") == 1


def test_query_range_fn_quantile_and_mad_wiring(spark):
    """query_range-style fn application: _apply_range_fn routes
    quantile_over_time/mad_over_time and replaces value, preserving the
    (domain, metric, tag, bucket_ts) shape."""
    from fischer_spark.api import _apply_range_fn

    rows = [("d", "m", "t", i, float(v)) for i, v in enumerate([5, 1, 3, 9])]
    df = spark.createDataFrame(
        rows, "domain string, metric string, tag string, bucket_ts long, value double"
    )
    got = (
        _apply_range_fn(df, "quantile_over_time", {"q": 0.5, "w": 2})
        .orderBy("bucket_ts")
        .collect()
    )
    assert [r["value"] for r in got] == pytest.approx([5.0, 3.0, 2.0, 6.0])
    mad = _apply_range_fn(df, "mad_over_time", {"w": 2}).orderBy("bucket_ts").collect()
    assert mad[0]["value"] == pytest.approx(0.0)
    assert mad[1]["value"] == pytest.approx(2.0)  # frame [5,1]: med 3, devs [2,2]


# --------------------------------------------------------------------------
# corr_over_time (O122): hand-computed rolling Pearson.
# --------------------------------------------------------------------------

def test_corr_over_time_hand_computed(spark):
    import datetime as dt
    import math

    from fischer_spark.operators.overtime import corr_over_time

    t0 = dt.datetime(2024, 1, 1)
    # y = 2x exactly -> corr 1.0 once the window has variance; then an
    # anti-tracking bucket flips the tail window negative.
    rows = [("a", t0 + dt.timedelta(hours=i), x, y)
            for i, (x, y) in enumerate([(1, 2), (2, 4), (3, 6), (4, 2)])]
    df = spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, x: long, y: long"
    )
    out = sorted(corr_over_time(df, ["k"], "x", "y", w=3).collect(),
                 key=lambda r: r["bucket_ts"])
    assert out[0]["corr"] is None           # single point: zero variance
    # perfectly-tracking windows: r is the pinned float expression (the
    # sqrt product lands one ulp off 12, so "1.0" is 1.0000000000000002
    # in BOTH engines — that bit pattern IS the contract)
    assert out[1]["corr"] == (2 * 10 - 3 * 6) / (
        math.sqrt(2 * 5 - 9) * math.sqrt(2 * 20 - 36)
    )
    assert out[2]["corr"] == (3 * 28 - 6 * 12) / (
        math.sqrt(3 * 14 - 36) * math.sqrt(3 * 56 - 144)
    )
    # window (2,4),(3,6),(4,2): n=3 sx=9 sy=12 sxx=29 syy=56 sxy=34
    num = 3 * 34 - 9 * 12
    dx, dy = 3 * 29 - 81, 3 * 56 - 144
    assert out[3]["corr"] == num / (math.sqrt(dx) * math.sqrt(dy))


def test_corr_over_time_constant_window_is_null(spark):
    import datetime as dt

    from fischer_spark.operators.overtime import corr_over_time

    t0 = dt.datetime(2024, 1, 1)
    rows = [("a", t0 + dt.timedelta(hours=i), 5, i + 1) for i in range(4)]
    df = spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, x: long, y: long"
    )
    out = corr_over_time(df, ["k"], "x", "y", w=3).collect()
    assert all(r["corr"] is None for r in out)  # x constant everywhere


# --------------------------------------------------------------------------
# rolling distinct users (O124): hand-computed sliding union.
# --------------------------------------------------------------------------

def test_rolling_distinct_users_hand_computed(spark):
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", t0, 1), ("a", t0, 2), ("a", t0, 2),
        ("a", t0 + dt.timedelta(hours=1), 2), ("a", t0 + dt.timedelta(hours=1), 3),
        ("a", t0 + dt.timedelta(hours=2), 9),
        ("a", t0 + dt.timedelta(hours=3), 1),
    ]
    ev = spark.createDataFrame(rows, "event_type: string, ts: timestamp, user_id: long")
    s = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.collect_set("user_id").alias("us"))
    win = Window.partitionBy("event_type").orderBy("bucket_ts").rowsBetween(-1, 0)
    out = sorted(
        s.select(
            "bucket_ts",
            F.size("us").alias("hourly"),
            F.size(F.array_distinct(F.flatten(F.collect_list("us").over(win))))
            .alias("rolling"),
        ).collect(),
        key=lambda r: r["bucket_ts"],
    )
    # w=2 sliding unions: {1,2}; {1,2}∪{2,3}=3; {2,3}∪{9}=3; {9}∪{1}=2
    assert [r["hourly"] for r in out] == [2, 2, 1, 1]
    assert [r["rolling"] for r in out] == [2, 3, 3, 2]
