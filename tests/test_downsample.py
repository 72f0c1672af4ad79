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


# ---------------------------------------------------------------------------
# O78 — M4 pixel-bucket downsample
# ---------------------------------------------------------------------------

def _m4_input(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    rng = random.Random(7)
    for d in ("a", "b"):
        for i in range(5_000):
            rows.append((d, base + datetime.timedelta(seconds=i * 13), rng.uniform(-5, 5)))
    # single-point series: span 0 must still be well-defined
    rows.append(("single", base, 1.5))
    # duplicate-timestamp series: tie-break must be deterministic
    for v in (3.0, 1.0, 2.0):
        rows.append(("dup", base, v))
    return spark.createDataFrame(rows, "domain string, bucket_ts timestamp, value double")


def test_m4_invariants(spark):
    from fischer_spark.operators.downsample import m4_downsample

    df = _m4_input(spark).cache()
    out = m4_downsample(df, ["domain"], n_px=50).cache()
    pdf = out.toPandas()

    # <= n_px buckets per series; px in [0, n_px)
    per = pdf.groupby("domain").size()
    assert (per <= 50).all()
    assert pdf.px.between(0, 49).all()

    # global first/last samples survive in the edge buckets
    agg = df.groupBy("domain").agg(
        F.min("bucket_ts").alias("t0"), F.max("bucket_ts").alias("t1"),
        F.min("value").alias("vmin"), F.max("value").alias("vmax"),
        F.count("*").alias("n"),
    ).toPandas().set_index("domain")
    for d in ("a", "b"):
        g = pdf[pdf.domain == d]
        assert g[g.px == g.px.min()].t_first.iloc[0] == agg.loc[d].t0
        assert g[g.px == g.px.max()].t_last.iloc[0] == agg.loc[d].t1
        assert g.v_min.min() == agg.loc[d].vmin
        assert g.v_max.max() == agg.loc[d].vmax
        assert g.n_pts.sum() == agg.loc[d].n

    # per-bucket min/max match a brute recompute on bucket membership
    brute = df.filter(F.col("domain") == "a").toPandas()
    t0 = brute.bucket_ts.min(); t1 = brute.bucket_ts.max()
    span = int((t1 - t0).total_seconds() * 1e6) + 1
    brute["px"] = (50 * ((brute.bucket_ts - t0).dt.total_seconds() * 1e6).astype("int64")) // span
    bm = brute.groupby("px").value.agg(["min", "max"])
    ga = pdf[pdf.domain == "a"].set_index("px").sort_index()
    assert (ga.v_min == bm["min"]).all() and (ga.v_max == bm["max"]).all()

    # single-point series: one bucket, all four points equal it
    s = pdf[pdf.domain == "single"]
    assert len(s) == 1 and s.n_pts.iloc[0] == 1
    assert s.v_first.iloc[0] == s.v_last.iloc[0] == s.v_min.iloc[0] == s.v_max.iloc[0] == 1.5

    # duplicate timestamps: first = smallest value, last = largest (ts, value order)
    dup = pdf[pdf.domain == "dup"]
    assert len(dup) == 1
    assert dup.v_first.iloc[0] == 1.0 and dup.v_last.iloc[0] == 3.0
    assert dup.v_min.iloc[0] == 1.0 and dup.v_max.iloc[0] == 3.0


def test_m4_stays_jvm_side(spark):
    """M4 must stay whole-stage-codegen relational ops — no Arrow/Python
    eval node anywhere in the plan (that's LTTB's lane)."""
    from fischer_spark.operators.downsample import m4_downsample

    df = _m4_input(spark)
    plan = m4_downsample(df, ["domain"], n_px=50)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # tiny per-key extents broadcast back; ONE main shuffle on (key, px)
    # shared by the sort, the window and the final aggregate
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 2  # extents agg + (key, px)


def test_lttb_exact_oracle_small_series_passthrough(spark, tmp_path):
    """O111 — the unrolled LTTB oracle's n<=n_out passthrough branch,
    which the driver testdata never exercises (every sf's series has
    >50 minutes): a 20-minute series must come back whole from BOTH
    engines, while a 120-minute series in the same table goes through
    the 48 chained argmax CTEs — and the two engines must agree
    bit-for-bit on every selected row."""
    import duckdb
    import pandas as pd

    from fischer_spark.queries import get_oracles, get_queries
    from tests.oracle_harness import compare

    rng = random.Random(7)
    rows = []
    base = pd.Timestamp("2024-03-01 00:00:00")
    for minute in range(20):  # small series: kept whole
        for _ in range(rng.randint(1, 3)):
            rows.append(("tiny", base + pd.Timedelta(minutes=minute)))
    for minute in range(120):  # big series: unrolled selection path
        for _ in range(rng.randint(1, 9)):
            rows.append(("busy", base + pd.Timedelta(minutes=2 * minute)))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    # µs units: Spark's parquet reader rejects TIMESTAMP(NANOS)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "events.parquet", index=False)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    name = "lttb_exact_events_1m_50"
    sdf = get_queries()[name](spark, str(tmp_path))
    errs = compare(sdf, con, get_oracles()[name], name)
    con.close()
    assert not errs, "\n".join(errs)

    out = sdf.toPandas()
    assert (out.event_type == "tiny").sum() == 20  # whole series kept
    assert (out.event_type == "busy").sum() == 50  # downsampled to n_out
