"""Reset-aware counter increase/rate/delta (operators/counters.py)."""

from __future__ import annotations

import datetime as dt

from fischer_spark.operators.counters import (
    counter_increase,
    counter_rate,
    gauge_delta,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _fixture(spark):
    rows = [
        # key, ts, value — includes a reset (20 -> 3) and a flat sample
        ("a", _ts(0), 10.0),
        ("a", _ts(10), 20.0),
        ("a", _ts(20), 3.0),   # reset: increase = 3
        ("a", _ts(25), 3.0),   # flat: increase = 0
        ("b", _ts(0), 5.0),
        ("b", _ts(0), 7.0),    # duplicate ts: rate must be NULL, not inf
    ]
    return spark.createDataFrame(rows, "k: string, ts: timestamp, value: double")


def _by_key(rows, k):
    return [r for r in rows if r["k"] == k]


def test_counter_increase_resets(spark):
    out = counter_increase(_fixture(spark), ["k"], ["ts", "value"]).collect()
    a = sorted(_by_key(out, "a"), key=lambda r: r["ts"])
    assert a[0]["increase"] is None
    assert a[1]["increase"] == 10.0
    assert a[2]["increase"] == 3.0  # reset-aware, NOT -17
    assert a[3]["increase"] == 0.0


def test_counter_rate_and_zero_dt(spark):
    out = counter_rate(_fixture(spark), ["k"], ["ts", "value"]).collect()
    a = sorted(_by_key(out, "a"), key=lambda r: r["ts"])
    assert a[0]["rate"] is None
    assert a[1]["rate"] == 1.0   # +10 over 10 s
    assert a[2]["rate"] == 0.3   # reset: 3 over 10 s
    b = sorted(_by_key(out, "b"), key=lambda r: r["value"])
    assert b[1]["rate"] is None  # dt == 0 guarded


def test_gauge_delta_signed(spark):
    out = gauge_delta(_fixture(spark), ["k"], ["ts", "value"]).collect()
    a = sorted(_by_key(out, "a"), key=lambda r: r["ts"])
    assert a[2]["delta"] == -17.0  # gauges keep the sign


def test_instant_transforms_irate_idelta(spark):
    """instant_transforms (PromQL irate/idelta numerators): reset-aware
    instant rate vs plain delta between adjacent samples; NULL on each
    series' first sample; microsecond-exact elapsed time."""
    import datetime

    from fischer_spark.operators.counters import instant_transforms

    t0 = datetime.datetime(2024, 1, 1)

    def at(s):
        return t0 + datetime.timedelta(seconds=s)

    df = spark.createDataFrame(
        [
            ("a", at(0), 1, 10.0),
            ("a", at(2), 2, 16.0),    # +6 over 2s -> irate 3.0, idelta 6.0
            ("a", at(2.5), 3, 4.0),   # reset: irate 4/0.5=8.0, idelta -12.0
            ("b", at(0), 4, 7.0),     # lone first sample -> NULLs
        ],
        "k string, ts timestamp, event_id long, value double",
    )
    out = {r["event_id"]: (r["irate"], r["idelta"])
           for r in instant_transforms(df, ["k"], ["ts", "event_id"]).collect()}
    assert out[1] == (None, None)
    assert out[2] == (3.0, 6.0)
    assert out[3] == (8.0, -12.0)
    assert out[4] == (None, None)


# --------------------------------------------------------------------------
# extrapolated_rate (O114): real PromQL extrapolatedRate semantics,
# hand-computed per the public promql/functions.go algorithm.
# --------------------------------------------------------------------------

_B0 = dt.datetime(2024, 1, 1)  # hourly bucket start, window_s = 3600


def _xr_fixture(spark, rows):
    df = spark.createDataFrame(
        [(k, _ts(s), float(v)) for k, s, v in rows],
        "k: string, ts: timestamp, value: double",
    )
    from pyspark.sql import functions as F

    return df.withColumn("bucket_ts", F.date_trunc("hour", "ts"))


def _xr(spark, rows, **kw):
    from fischer_spark.operators.counters import extrapolated_rate

    out = extrapolated_rate(
        _xr_fixture(spark, rows), ["k"], "bucket_ts", 3600, **kw
    ).collect()
    return {r["k"]: r for r in out}


def test_extrapolated_rate_no_snap_with_zero_cap(spark):
    # samples at 600/1800/3000 s: boundaries within thresh -> raw
    # durations kept, but the counter time-to-zero cap bites on start:
    # d_zero = 2400 * (10/60) = 400 < 600.
    r = _xr(spark, [("a", 600, 10), ("a", 1800, 40), ("a", 3000, 70)])["a"]
    assert r["n"] == 3 and r["raw"] == 60.0
    assert r["increase_ext"] == 60.0 * ((2400.0 + 400.0 + 600.0) / 2400.0)  # 85.0
    assert r["rate_ext"] == 60.0 * (((2400.0 + 400.0 + 600.0) / 2400.0) / 3600.0)


def test_extrapolated_rate_snap_to_half_interval(spark):
    # bunched mid-window: both boundary gaps exceed 1.1*avg_iv -> snap to
    # avg_iv/2 = 5 s; v_first = 0 makes the zero-cap pin d_start to 0.
    r = _xr(spark, [("b", 1700, 0), ("b", 1710, 5), ("b", 1720, 10)])["b"]
    assert r["raw"] == 10.0
    assert r["increase_ext"] == 10.0 * ((20.0 + 0.0 + 5.0) / 20.0)  # 12.5


def test_extrapolated_rate_reset_in_window(spark):
    # reset 100 -> 20: raw = 20 (counter restarted), and the zero-cap
    # uses v_first=100 (d_zero = 500 > d_start=100, no cap).
    r = _xr(spark, [("c", 100, 100), ("c", 200, 20)])["c"]
    assert r["raw"] == 20.0
    assert r["increase_ext"] == 20.0 * ((100.0 + 100.0 + 50.0) / 100.0)  # 50.0


def test_extrapolated_rate_promql_empty_cases(spark):
    # single sample and zero sampled interval yield NO row (PromQL).
    out = _xr(
        spark,
        [("solo", 100, 5), ("dup", 200, 1), ("dup", 200, 2)],
    )
    assert out == {}


def test_extrapolated_rate_gauge_mode(spark):
    # counter=False (PromQL delta()): signed raw, no zero-cap.
    r = _xr(spark, [("g", 0, 10), ("g", 1200, 4)], counter=False)["g"]
    assert r["raw"] == -6.0
    assert r["increase_ext"] == -6.0 * ((1200.0 + 0.0 + 600.0) / 1200.0)  # -9.0
