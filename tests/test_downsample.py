"""LTTB downsample vs a naive reference implementation of the same
public algorithm (Steinarsson 2013), plus shape-preservation properties.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.downsample import lttb, lttb_downsample


def _lttb_reference(ts, vals, n_out):
    """Deliberately naive O(n·k) loop translation of the thesis
    pseudocode — the numpy version must match it index-for-index."""
    n = len(ts)
    if n <= n_out:
        return list(range(n))
    bounds = [1 + math.floor(i * (n - 2) / (n_out - 2)) for i in range(n_out - 1)]
    bounds[-1] = n - 1
    keep = [0]
    a = 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = (hi, n) if i == n_out - 3 else (bounds[i + 1], bounds[i + 2])
        ct = sum(ts[nlo:nhi]) / (nhi - nlo)
        cv = sum(vals[nlo:nhi]) / (nhi - nlo)
        best, best_area = lo, -1.0
        for j in range(lo, hi):
            area = abs(
                (ts[a] - ct) * (vals[j] - vals[a])
                - (ts[a] - ts[j]) * (cv - vals[a])
            )
            if area > best_area:
                best, best_area = j, area
        keep.append(best)
        a = best
    keep.append(n - 1)
    return keep


@pytest.mark.parametrize("n,k", [(500, 10), (1000, 100), (37, 5), (10, 3)])
def test_lttb_matches_reference(n, k):
    rng = random.Random(n * 1000 + k)
    ts = np.arange(n, dtype=np.float64)
    vals = np.array([rng.gauss(0, 1) for _ in range(n)])
    got = lttb(ts, vals, k)
    ref = _lttb_reference(list(ts), list(vals), k)
    assert list(got) == ref
    assert got[0] == 0 and got[-1] == n - 1 and len(got) == k


def test_lttb_short_series_kept_whole():
    assert list(lttb(np.arange(5.0), np.arange(5.0), 10)) == [0, 1, 2, 3, 4]


def test_lttb_preserves_spike():
    n = 10_000
    vals = np.zeros(n)
    vals[6321] = 500.0  # a single spike must survive 100x downsampling
    idx = lttb(np.arange(n, dtype=float), vals, 100)
    assert 6321 in set(idx.tolist())


def test_lttb_downsample_spark(spark):
    rows = [
        (k, float(i), float(((i * 7919 + ord(k)) % 101) - 50))
        for k in ("x", "y")
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "k: string, t: double, value: double")
    out = lttb_downsample(df, ["k"], ts_col="t", val_col="value", n_out=20)
    pdf = out.toPandas()
    for k in ("x", "y"):
        sub = pdf[pdf["k"] == k].sort_values("t")
        assert len(sub) == 20
        assert sub["t"].iloc[0] == 0.0 and sub["t"].iloc[-1] == 399.0
        # matches the single-series kernel exactly
        vals = np.array(
            [float(((i * 7919 + ord(k)) % 101) - 50) for i in range(400)]
        )
        ref = lttb(np.arange(400, dtype=float), vals, 20)
        assert sub["t"].to_numpy().astype(int).tolist() == ref.tolist()


# -- hypothesis property coverage ------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=400,
    ),
    st.integers(min_value=3, max_value=50),
)
def test_lttb_invariants_property(vals, n_out):
    """For ANY series: output indices are a strictly increasing
    subsequence, first/last points always survive, and the output size
    is exactly min(n_out, n)."""
    ts = np.arange(len(vals), dtype="int64") * 1000
    idx = lttb(ts, np.array(vals, dtype="float64"), n_out)
    assert len(idx) == min(n_out, len(vals))
    assert idx[0] == 0 and idx[-1] == len(vals) - 1
    assert np.all(np.diff(idx) > 0)
