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


def _hw_ref(y, m, a, b, g):
    """Independent reference: same public textbook recurrence, written
    as an explicit state machine over python floats (not the shipped
    array-indexed form)."""
    import math as _m

    n = len(y)
    out = [float("nan")] * n
    if n < 2 * m:
        return out
    level = sum(y[:m]) / m
    trend = (sum(y[m : 2 * m]) / m - sum(y[:m]) / m) / m
    seasons = [y[i] - level for i in range(m)]
    for t in range(m, n):
        s = seasons[t % m]
        out[t] = level + trend + s
        new_level = a * (y[t] - s) + (1 - a) * (level + trend)
        new_trend = b * (new_level - level) + (1 - b) * trend
        seasons[t % m] = g * (y[t] - new_level) + (1 - g) * s
        level, trend = new_level, new_trend
    return out


def test_hw_kernel_matches_reference_and_short_series_nan():
    from fischer_spark.operators.smooth import _hw_np

    rng = np.random.default_rng(7)
    y = rng.normal(50, 5, 100)
    m, a, b, g = 12, 0.35, 0.15, 0.25
    fitted, level, trend, season = _hw_np(y, m, a, b, g)
    ref = _hw_ref(list(y), m, a, b, g)
    for i in range(100):
        if math.isnan(ref[i]):
            assert math.isnan(fitted[i])
        else:
            assert abs(fitted[i] - ref[i]) < 1e-9

    short = _hw_np(y[: 2 * m - 1], m, a, b, g)
    assert all(np.isnan(arr).all() for arr in short)


def test_hw_converges_on_exact_seasonal_line():
    """On y_t = L + T*t + S_{t mod m} the one-step forecast error decays
    toward zero — the filter locks onto the exact generating process."""
    from fischer_spark.operators.smooth import _hw_np

    m = 8
    S = np.array([3.0, -1.0, 0.5, -2.5, 1.0, 2.0, -1.5, -1.5])
    assert abs(S.sum()) < 1e-12
    t = np.arange(400)
    y = 100.0 + 0.25 * t + S[t % m]
    fitted, *_ = _hw_np(y, m, 0.3, 0.1, 0.2)
    err = np.abs(y - fitted)
    head = np.nanmean(err[m : m + 50])
    tail = np.nanmean(err[-50:])
    assert tail < head / 10
    assert tail < 0.05


def test_hw_spark_grouped_matches_kernel(spark):
    from fischer_spark.operators.smooth import _hw_np, holt_winters_seasonal

    t0 = dt.datetime(2024, 1, 1)
    rng = np.random.default_rng(11)
    rows = []
    vals = {}
    for k in ("a", "b"):
        y = rng.normal(10, 2, 60)
        vals[k] = y
        rows += [
            (k, t0 + dt.timedelta(hours=i), float(y[i])) for i in range(60)
        ]
    rng.shuffle(rows)  # input order must not matter (UDF sorts per key)
    df = spark.createDataFrame(rows, "k: string, bucket_ts: timestamp, value: double")
    out = _group(holt_winters_seasonal(df, ["k"], m=12).collect())
    for k in ("a", "b"):
        got = [
            r["fitted"]
            for r in sorted(out[k], key=lambda r: r["bucket_ts"])
        ]
        want, *_ = _hw_np(vals[k], 12, 0.3, 0.1, 0.2)
        for gv, wv in zip(got, want):
            if np.isnan(wv):
                assert gv is None or math.isnan(gv)
            else:
                assert abs(gv - wv) < 1e-9
