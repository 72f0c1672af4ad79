"""Linear trend: deriv/predict_linear (operators/trend.py) and
changes/resets flags (operators/counters.py change_flags)."""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import functions as F

from fischer_spark.operators.counters import change_flags
from fischer_spark.operators.trend import linear_trend_exact, linear_trend_fast


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _day_bucket():
    return F.date_trunc("day", F.col("ts"))


def test_trend_exact_perfect_line(spark):
    # y = 2.00 + 0.05*t (units/s), sampled every 100 s: slope recovers
    # exactly (integer cents, integer µs — zero residual fit)
    rows = [("a", _ts(100 * i), 2.0 + 0.05 * (100 * i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")
    out = linear_trend_exact(df, ["k"], _day_bucket()).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 20
    assert abs(r["slope"] - 0.05) < 1e-12
    # predict at 90000 s after day start: 2 + 0.05*90000
    assert abs(r["predict"] - (2.0 + 0.05 * 90000.0)) < 1e-6


def test_trend_exact_matches_numpy_lstsq(spark):
    rng = np.random.default_rng(7)
    t = np.sort(rng.integers(0, 86400, size=200))
    y = np.round(rng.uniform(0, 400, size=200), 2)
    rows = [("a", _ts(int(ti)), float(yi)) for ti, yi in zip(t, y)]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")
    r = linear_trend_exact(df, ["k"], _day_bucket()).collect()[0]
    slope_np, icpt_np = np.polyfit(t.astype(float), y, 1)
    assert abs(r["slope"] - slope_np) < 1e-9 * max(1.0, abs(slope_np))
    pred_np = icpt_np + slope_np * 90000.0
    assert abs(r["predict"] - pred_np) < 1e-6


def test_trend_fast_agrees_with_exact(spark):
    rng = np.random.default_rng(11)
    rows = [
        (k, _ts(int(ti)), float(np.round(v, 2)))
        for k in ("a", "b")
        for ti, v in zip(
            np.sort(rng.integers(0, 86400, size=150)),
            rng.uniform(0, 400, size=150),
        )
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")
    exact = {
        r["k"]: r for r in linear_trend_exact(df, ["k"], _day_bucket()).collect()
    }
    fast = {
        r["k"]: r for r in linear_trend_fast(df, ["k"], _day_bucket()).collect()
    }
    for k in ("a", "b"):
        assert abs(exact[k]["slope"] - fast[k]["slope"]) < 1e-9 * max(
            1.0, abs(exact[k]["slope"])
        )
        assert abs(exact[k]["predict"] - fast[k]["predict"]) < 1e-6


def test_trend_degenerate_groups_null(spark):
    rows = [
        ("one", _ts(10), 5.0),                      # n = 1
        ("same_t", _ts(20), 1.0), ("same_t", _ts(20), 9.0),  # all x equal
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")
    out = {r["k"]: r for r in linear_trend_exact(df, ["k"], _day_bucket()).collect()}
    assert out["one"]["slope"] is None and out["one"]["predict"] is None
    assert out["same_t"]["slope"] is None and out["same_t"]["predict"] is None


def test_change_flags_counts(spark):
    rows = [
        ("a", _ts(0), 10.0),   # first: changed=0, reset=0
        ("a", _ts(10), 10.0),  # flat: changed=0
        ("a", _ts(20), 12.0),  # up: changed=1
        ("a", _ts(30), 3.0),   # down: changed=1, reset=1
        ("a", _ts(40), 3.0),   # flat
    ]
    df = spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")
    out = change_flags(df, ["k"], ["ts"]).orderBy("ts").collect()
    assert [r["changed"] for r in out] == [0, 0, 1, 1, 0]
    assert [r["reset"] for r in out] == [0, 0, 0, 1, 0]
