"""O24/O25 gap-fill unit tests with hand-computed expectations
(SURVEY.md §5.4)."""

from __future__ import annotations

from datetime import datetime

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(
        [("d.example", "m", None, datetime(2024, 1, 1, h), v) for h, v in rows],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )


def _filled(df):
    return {
        r.bucket_ts.hour: r.value_filled
        for r in df.orderBy("bucket_ts").collect()
    }


def test_locf_basic(spark):
    from fischer_spark.operators.gapfill import gapfill_locf

    src = _mk(spark, [(0, 10.0), (3, 40.0)])  # hours 1,2 missing
    out = _filled(gapfill_locf(src, "1h"))
    assert out == {0: 10.0, 1: 10.0, 2: 10.0, 3: 40.0}


def test_locf_leading_gap_stays_null(spark):
    from fischer_spark.operators.gapfill import gapfill_locf

    src = _mk(spark, [(1, None), (2, 5.0)])
    out = _filled(gapfill_locf(src, "1h"))
    assert out[1] is None and out[2] == 5.0


def test_linear_basic(spark):
    from fischer_spark.operators.gapfill import gapfill_linear

    src = _mk(spark, [(0, 10.0), (3, 40.0)])
    out = _filled(gapfill_linear(src, "1h"))
    assert out == {0: 10.0, 1: 20.0, 2: 30.0, 3: 40.0}


def test_linear_edges_null(spark):
    from fischer_spark.operators.gapfill import gapfill_linear

    src = _mk(spark, [(0, None), (1, 10.0), (2, None), (3, 20.0), (4, None)])
    out = _filled(gapfill_linear(src, "1h"))
    assert out[0] is None and out[1] == 10.0 and out[2] == 15.0
    assert out[3] == 20.0 and out[4] is None


def test_single_point(spark):
    from fischer_spark.operators.gapfill import gapfill_linear, gapfill_locf

    src = _mk(spark, [(5, 7.0)])
    assert _filled(gapfill_locf(src, "1h")) == {5: 7.0}
    assert _filled(gapfill_linear(src, "1h")) == {5: 7.0}


def test_spine_covers_planted_gaps(pages):
    """Synthetic gap hours (d003, hours 2-3) appear as was_gap rows."""
    from pyspark.sql import functions as F

    from fischer_spark.operators.gapfill import gapfill_locf
    from fischer_spark.operators.series import crawl_rate_series

    pts = crawl_rate_series(pages.filter(F.col("domain") == "d003.example"))
    filled = gapfill_locf(pts, "1h")
    gap_hours = filled.filter(F.col("was_gap") & F.hour("bucket_ts").isin(2, 3))
    assert gap_hours.count() > 0
    assert filled.filter(F.col("value_filled").isNull()).count() <= 1  # only possible leading
