"""Generate the frozen prometheus-style detector fixtures (FIXTURES.md §2).

Run ONCE (or when the detector spec changes — same commit as the spec
change, per the self-parity rule SURVEY.md §0.3):

    python tools/gen_prom_fixtures.py

Writes tests/fixtures/prom_series/<case>.json (input series in
prometheus query_range response shape) and <case>_zscore_intervals.json /
<case>_seasonal_intervals.json (expected scored intervals).
"""

from __future__ import annotations

import json
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

FIXDIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "prom_series"

BASE = 1704067200  # 2024-01-01 00:00:00 UTC
HOUR = 3600


def _series(name: str, domain: str, values: list[tuple[int, float]]) -> dict:
    return {
        "metric": {"__name__": name, "domain": domain},
        "values": [[ts, str(v)] for ts, v in values],
    }


def make_cases() -> dict[str, dict]:
    cases = {}

    # 1. flat + single spike at hour 100
    vals = [(BASE + i * HOUR, 10.0 + (i % 3)) for i in range(168)]
    vals[100] = (vals[100][0], 80.0)
    cases["flat_spike"] = _series("crawl_rate", "flat.example", vals)

    # 2. linear trend (no anomalies expected from seasonal; zscore quiet)
    vals = [(BASE + i * HOUR, 5.0 + 0.25 * i) for i in range(168)]
    cases["trend"] = _series("crawl_rate", "trend.example", vals)

    # 3. daily seasonality over 8 weeks (8 samples per hod/dow slot, so the
    # LOO gate n>=3 passes) with one phase-flipped day (day 40) and small
    # deterministic noise so slot stddev is honest.
    vals = []
    for i in range(56 * 24):
        hod = i % 24
        day = i // 24
        base = 50 + 40 * math.sin(2 * math.pi * hod / 24)
        if day == 40:
            base = 50 + 40 * math.sin(2 * math.pi * ((hod + 12) % 24) / 24)
        noise = ((i * 2654435761) % 97) / 97.0 - 0.5  # deterministic ±0.5
        vals.append((BASE + i * HOUR, round(base + noise, 3)))
    cases["seasonal_broken_day"] = _series("crawl_rate", "seasonal.example", vals)

    # 4. gappy series (whole missing stretches; LOCF/linear disagree)
    vals = [
        (BASE + i * HOUR, 20.0 + (i % 5))
        for i in range(168)
        if not (40 <= i < 52 or 90 <= i < 93)
    ]
    vals[120] = (vals[120][0], 3.0)
    cases["gappy"] = _series("crawl_rate", "gappy.example", vals)

    # 5. constant (stddev = 0 guard: zero intervals expected)
    vals = [(BASE + i * HOUR, 7.0) for i in range(100)]
    cases["constant"] = _series("crawl_rate", "const.example", vals)

    return cases


def prom_to_df(spark, case: dict):
    import datetime

    from pyspark.sql import functions as F

    rows = [
        (
            case["metric"]["domain"],
            case["metric"]["__name__"],
            None,
            datetime.datetime.utcfromtimestamp(int(ts)),
            float(v),
        )
        for ts, v in case["values"]
    ]
    return spark.createDataFrame(
        rows,
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )


def intervals_to_json(df) -> list[dict]:
    out = []
    for r in df.orderBy("interval_start").collect():
        out.append(
            {
                "domain": r.domain,
                "detector": r.detector,
                "interval_start": int(r.interval_start.timestamp()),
                "interval_end": int(r.interval_end.timestamp()),
                "peak_score": round(r.peak_score, 9),
                "mean_score": round(r.mean_score, 9),
                "n_points": r.n_points,
            }
        )
    return out


def main() -> None:
    from fischer_spark.operators.detect import (
        anomaly_intervals,
        seasonal_score,
        zscore_window,
    )
    from fischer_spark.session import get_spark

    FIXDIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark("gen_fixtures", master="local[4]", shuffle_partitions=4)
    for name, case in make_cases().items():
        (FIXDIR / f"{name}.json").write_text(json.dumps(case, indent=1))
        df = prom_to_df(spark, case)
        z = anomaly_intervals(
            zscore_window(df, w=24, min_periods=8), tau=3.0, tier="1h", detector="zscore"
        )
        s = anomaly_intervals(
            seasonal_score(df, min_slot_n=3), tau=3.0, tier="1h", detector="seasonal"
        )
        (FIXDIR / f"{name}_zscore_intervals.json").write_text(
            json.dumps(intervals_to_json(z), indent=1)
        )
        (FIXDIR / f"{name}_seasonal_intervals.json").write_text(
            json.dumps(intervals_to_json(s), indent=1)
        )
        print(name, "zscore:", z.count(), "seasonal:", s.count())
    spark.stop()


if __name__ == "__main__":
    main()
