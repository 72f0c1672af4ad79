"""The fischer-shaped parity layer (SURVEY.md §5.1): frozen
prometheus-style fixture series → frozen expected anomaly intervals.

These goldens ARE the reference surface under self-parity rules
(SURVEY.md §0.3): any detector change that shifts an interval or a score
beyond 1e-9 fails here and requires a deliberate regeneration
(tools/gen_prom_fixtures.py) in the same commit.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from fischer_spark.operators.detect import (
    anomaly_intervals,
    seasonal_score,
    zscore_window,
)

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "prom_series"
CASES = sorted(
    p.stem for p in FIXDIR.glob("*.json") if not p.stem.endswith("_intervals")
)


def _load_df(spark, case: str):
    import datetime

    d = json.loads((FIXDIR / f"{case}.json").read_text())
    rows = [
        (
            d["metric"]["domain"],
            d["metric"]["__name__"],
            None,
            datetime.datetime.utcfromtimestamp(int(ts)),
            float(v),
        )
        for ts, v in d["values"]
    ]
    return spark.createDataFrame(
        rows,
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )


def _got(df):
    return [
        {
            "domain": r.domain,
            "detector": r.detector,
            "interval_start": int(r.interval_start.timestamp()),
            "interval_end": int(r.interval_end.timestamp()),
            "peak_score": r.peak_score,
            "mean_score": r.mean_score,
            "n_points": r.n_points,
        }
        for r in df.orderBy("interval_start").collect()
    ]


def _check(got, want):
    assert len(got) == len(want), (got, want)
    for g, w in zip(got, want):
        for k in ("domain", "detector", "interval_start", "interval_end", "n_points"):
            assert g[k] == w[k], (k, g, w)
        for k in ("peak_score", "mean_score"):
            assert abs(g[k] - w[k]) < 1e-9, (k, g, w)


def test_cases_exist():
    assert set(CASES) == {
        "flat_spike", "trend", "seasonal_broken_day", "gappy", "constant",
    }


@pytest.mark.parametrize("case", CASES)
def test_zscore_goldens(spark, case):
    df = _load_df(spark, case)
    got = _got(
        anomaly_intervals(
            zscore_window(df, w=24, min_periods=8), tau=3.0, tier="1h", detector="zscore"
        )
    )
    want = json.loads((FIXDIR / f"{case}_zscore_intervals.json").read_text())
    _check(got, want)


@pytest.mark.parametrize("case", CASES)
def test_seasonal_goldens(spark, case):
    df = _load_df(spark, case)
    got = _got(
        anomaly_intervals(
            seasonal_score(df, min_slot_n=3), tau=3.0, tier="1h", detector="seasonal"
        )
    )
    want = json.loads((FIXDIR / f"{case}_seasonal_intervals.json").read_text())
    _check(got, want)


def test_constant_series_quiet(spark):
    """stddev≈0 guard: a constant series produces NO intervals from either
    detector (scores undefined, not infinite)."""
    df = _load_df(spark, "constant")
    assert anomaly_intervals(zscore_window(df, w=24, min_periods=8), tau=0.1).count() == 0
    assert anomaly_intervals(seasonal_score(df), tau=0.1).count() == 0
