"""EWMA / Holt double exponential smoothing (operators/smooth.py):
kernels pinned against naive Python loops, plus the fixed-point and
convergence properties that define the recurrences."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from fischer_spark.operators.smooth import _ewma_np, _holt_np, ewma, holt


def _naive_ewma(y, a):
    out = [y[0]]
    for x in y[1:]:
        out.append((1 - a) * out[-1] + a * x)
    return out


def _naive_holt(y, sf, tf):
    level = [y[0]]
    trend = [y[1] - y[0] if len(y) > 1 else float("nan")]
    for x in y[1:]:
        prev = level[-1] + trend[-1]
        lv = sf * x + (1 - sf) * prev
        trend.append(tf * (lv - level[-1]) + (1 - tf) * trend[-1])
        level.append(lv)
    return level, trend


def test_ewma_kernel_matches_naive_loop():
    rng = np.random.default_rng(3)
    y = rng.uniform(0, 100, size=500)
    got = _ewma_np(y, 0.25)
    want = _naive_ewma(list(y), 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_holt_kernel_matches_naive_loop():
    rng = np.random.default_rng(4)
    y = rng.uniform(0, 100, size=300)
    level, trend = _holt_np(y, 0.3, 0.1)
    want_l, want_t = _naive_holt(list(y), 0.3, 0.1)
    np.testing.assert_allclose(level, want_l, rtol=1e-12)
    np.testing.assert_allclose(trend, want_t, rtol=1e-12)


def test_ewma_constant_series_fixed_point():
    y = np.full(100, 42.5)
    np.testing.assert_array_equal(_ewma_np(y, 0.3), y)


def test_holt_linear_series_exact_trend():
    # on a perfect line level tracks it and trend converges to the slope
    y = 5.0 + 0.7 * np.arange(200)
    level, trend = _holt_np(y, 0.5, 0.2)
    assert abs(trend[-1] - 0.7) < 1e-9
    assert abs(level[-1] - y[-1]) < 1e-9


def test_ewma_geometric_convergence_to_step():
    # step input: distance to the new plateau decays as (1-a)^t exactly
    y = np.concatenate([np.zeros(1), np.full(50, 10.0)])
    s = _ewma_np(y, 0.2)
    for t in range(1, 51):
        assert math.isclose(10.0 - s[t], 10.0 * 0.8**t, rel_tol=1e-9)


def _series_df(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    rng = np.random.default_rng(9)
    for k in ("a", "b"):
        for i in range(60):
            rows.append((k, t0 + dt.timedelta(hours=i), float(rng.uniform(0, 50))))
    return spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, value: double"
    )


def test_ewma_spark_matches_kernel_per_key(spark):
    df = _series_df(spark)
    out = ewma(df, ["k"], alpha=0.4).collect()
    src = {
        k: [r["value"] for r in sorted(rows, key=lambda r: r["bucket_ts"])]
        for k, rows in _group(df.collect()).items()
    }
    got = {
        k: [r["smoothed"] for r in sorted(rows, key=lambda r: r["bucket_ts"])]
        for k, rows in _group(out).items()
    }
    for k in ("a", "b"):
        np.testing.assert_allclose(got[k], _ewma_np(np.array(src[k]), 0.4), rtol=1e-12)


def test_holt_spark_schema_and_single_sample(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("solo", t0, 3.5), ("pair", t0, 1.0), ("pair", t0 + dt.timedelta(hours=1), 2.0)],
        "k: string, bucket_ts: timestamp, value: double",
    )
    out = {r["k"]: r for r in holt(df, ["k"]).collect() if r["bucket_ts"] == t0}
    assert out["solo"]["smoothed"] == 3.5
    t = out["solo"]["trend"]  # NaN surfaces as NULL through Arrow
    assert t is None or math.isnan(t)
    assert out["pair"]["smoothed"] == 1.0 and out["pair"]["trend"] == 1.0


def _group(rows):
    g: dict = {}
    for r in rows:
        g.setdefault(r["k"], []).append(r)
    return g
