"""Spearman rank correlation (operators/overtime.py spearman_grouped),
Theil-Sen robust slope (operators/trend.py theil_sen_slope), cohort
retention and source entropy registry queries (O125-O128)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from fischer_spark.operators.overtime import spearman_grouped
from fischer_spark.operators.trend import theil_sen_slope


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def _mk(spark, xs, ys):
    rows = [("a", _ts(i), int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, x: long, y: long"
    )


def test_spearman_monotone_transform_is_one(spark):
    # y = x^3 is a monotone transform: Pearson < 1 but Spearman == 1 exactly
    xs = [1, 2, 3, 4, 5, 6, 7, 8]
    ys = [x**3 for x in xs]
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert r["n"] == 8
    assert abs(r["rho"] - 1.0) < 1e-12


def test_spearman_reversed_is_minus_one(spark):
    xs = [1, 2, 3, 4, 5]
    ys = [50, 40, 30, 20, 10]
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert abs(r["rho"] + 1.0) < 1e-12


def test_spearman_matches_scipy_formula_no_ties(spark):
    # no ties -> rho == 1 - 6*sum(d^2)/(n(n^2-1)), the textbook closed form
    rng = np.random.default_rng(11)
    xs = rng.permutation(100).tolist()
    ys = rng.permutation(100).tolist()
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    rx = np.argsort(np.argsort(xs)) + 1
    ry = np.argsort(np.argsort(ys)) + 1
    d2 = float(((rx - ry) ** 2).sum())
    expect = 1.0 - 6.0 * d2 / (100 * (100**2 - 1))
    assert abs(r["rho"] - expect) < 1e-12


def test_spearman_outlier_bounded(spark):
    # one wild outlier: Pearson collapses toward it, Spearman moves by
    # at most one rank's worth
    xs = list(range(1, 21))
    ys = [2 * x for x in xs]
    ys[-1] = 10**9  # still the max -> identical ranks -> rho stays 1
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert abs(r["rho"] - 1.0) < 1e-12


def test_spearman_null_on_degenerate(spark):
    r = spearman_grouped(_mk(spark, [5], [7]), ["k"], "x", "y").collect()[0]
    assert r["rho"] is None and r["n"] == 1


def _slope_df(spark, pts):
    rows = [("a", int(h), int(y)) for h, y in pts]
    return spark.createDataFrame(rows, "k: string, h: long, y: long")


def test_theil_sen_clean_line_exact(spark):
    # y = 7x + 3: every pairwise slope is exactly 7.0
    df = _slope_df(spark, [(h, 7 * h + 3) for h in range(24)])
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 7.0
    assert r["n_pairs"] == 24 * 23 // 2


def test_theil_sen_survives_corruption(spark):
    # 24 points on y=5x, then corrupt 6 of them wildly: least squares is
    # destroyed, Theil-Sen still returns exactly 5.0 (median pairwise
    # slope over the 18 clean points dominates: C(18,2)=153 of 276 pairs)
    pts = [(h, 5 * h) for h in range(24)]
    for h in (2, 7, 11, 15, 19, 23):
        pts[h] = (h, 10**7 + h)
    df = _slope_df(spark, pts)
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 5.0


def test_theil_sen_discrete_median_convention(spark):
    # 3 points -> 3 pairwise slopes; median = 2nd smallest = ceil(3/2)=2
    # slopes of (0,0),(1,10),(2,14): (0,1)=10, (1,2)=4, (0,2)=7 -> median 7
    df = _slope_df(spark, [(0, 0), (1, 10), (2, 14)])
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 7.0 and r["n_pairs"] == 3


def test_cohort_retention_planted(spark):
    # u1 first on day0, active day0+day2; u2 first day0 only; u3 first day1,
    # active day1+day2
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES
    import os, tempfile

    d0 = dt.datetime(2024, 3, 1, 10)
    rows = [
        (1, d0, "u1", "view", 1.0, "{}"),
        (2, d0.replace(hour=12), "u2", "view", 1.0, "{}"),
        (3, d0 + dt.timedelta(days=2), "u1", "click", 1.0, "{}"),
        (4, d0 + dt.timedelta(days=1), "u3", "view", 1.0, "{}"),
        (5, d0 + dt.timedelta(days=2), "u3", "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: string, event_type: string,"
        " value: double, props: string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {
            (r["cohort_day"].day, r["day_offset"]): (
                r["active_users"], r["cohort_users"])
            for r in QUERIES["cohort_retention_events"](spark, td).collect()
        }
    assert out[(1, 0)] == (2, 2)   # day-1 cohort: u1,u2 both active day 0
    assert out[(1, 2)] == (1, 2)   # only u1 came back at offset 2
    assert out[(2, 0)] == (1, 1)   # day-2 cohort: u3
    assert out[(2, 1)] == (1, 1)
    assert (1, 1) not in out       # nobody from day-1 cohort active at +1


def test_source_entropy_bounds(spark):
    sf_dir = "/root/testdata/sf0.001"
    import fischer_spark.queries_webtext  # noqa: F401
    from fischer_spark.queries import QUERIES

    rows = QUERIES["source_entropy_documents"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log10(n_sources); top_share in (0, 1]
        assert -1e-12 <= r["entropy10"] <= math.log10(r["n_sources"]) + 1e-12
        assert 0.0 < r["top_share"] <= 1.0
        if r["n_sources"] == 1:
            assert r["entropy10"] == 0.0
