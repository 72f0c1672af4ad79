"""PromQL scalar functions (functions/scalars.py, O116) — hand-computed
per the public promql/functions.go definitions."""

from __future__ import annotations

import pytest

from fischer_spark.functions.scalars import (
    clamp,
    clamp_max,
    clamp_min,
    round_to,
    sgn,
)


def _apply(spark, fn, values):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(v),) for v in values], "v: double")
    return [r[0] for r in df.select(fn(F.col("v")).alias("o")).collect()]


def test_clamp_family(spark):
    vs = [-5.0, 0.0, 50.0, 125.0, 200.0, 999.0]
    assert _apply(spark, lambda v: clamp(v, 50.0, 200.0), vs) == [
        50.0, 50.0, 50.0, 125.0, 200.0, 200.0,
    ]
    assert _apply(spark, lambda v: clamp_min(v, 100.0), vs) == [
        100.0, 100.0, 100.0, 125.0, 200.0, 999.0,
    ]
    assert _apply(spark, lambda v: clamp_max(v, 100.0), vs) == [
        -5.0, 0.0, 50.0, 100.0, 100.0, 100.0,
    ]


def test_clamp_rejects_inverted_bounds():
    with pytest.raises(ValueError):
        clamp(None, 10.0, 1.0)


def test_sgn(spark):
    assert _apply(spark, sgn, [-3.5, 0.0, 7.0]) == [-1.0, 0.0, 1.0]


def test_round_ties_up_and_to_nearest(spark):
    # Prometheus rounds ties UP (toward +inf): 2.5 -> 3, -2.5 -> -2.
    assert _apply(spark, round_to, [2.5, -2.5, 2.4, -2.4]) == [3.0, -2.0, 2.0, -2.0]
    # to_nearest = 0.5: floor(v*2 + 0.5)/2.
    assert _apply(spark, lambda v: round_to(v, 0.5), [1.24, 1.25, 1.26]) == [
        1.0, 1.5, 1.5,
    ]


def test_round_rejects_nonpositive():
    with pytest.raises(ValueError):
        round_to(None, 0.0)
