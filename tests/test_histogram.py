"""Histogram tier family: exact merge associativity, quantile error
bound, partitioning invariance."""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

LO, HI, BINS = 0.0, 100.0, 50
WIDTH = (HI - LO) / BINS


@pytest.fixture(scope="module")
def value_points(spark):
    rng = np.random.default_rng(9)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a" if i % 3 else "b", "m", None,
         base + datetime.timedelta(minutes=i % 2880), float(v))
        for i, v in enumerate(rng.uniform(-5, 110, 6000))  # incl. under/overflow
    ]
    return spark.createDataFrame(
        rows, "domain string, metric string, tag string, bucket_ts timestamp, value double"
    ).cache()


def test_hist_merge_equals_direct(spark, value_points):
    from fischer_spark.operators.histogram import hist_merge, hist_states
    from tests.conftest import assert_df_equal

    via_1h = hist_merge(hist_states(value_points, "1h", LO, HI, BINS), "1d")
    direct = hist_states(value_points, "1d", LO, HI, BINS)
    assert_df_equal(via_1h.drop("tier"), direct.drop("tier"))


def test_hist_partitioning_invariance(spark, value_points):
    from fischer_spark.operators.histogram import hist_states
    from tests.conftest import assert_df_equal

    a = hist_states(value_points, "1h", LO, HI, BINS)
    b = hist_states(value_points.repartition(13), "1h", LO, HI, BINS)
    assert_df_equal(a, b)


def test_hist_quantile_error_bound(spark, value_points):
    """The bin-walk estimate is within one bin width of the true
    rank-quantile for in-range values (the histogram's error contract)."""
    from fischer_spark.operators.histogram import hist_quantile, hist_states

    h = hist_states(value_points, "1d", LO, HI, BINS)
    got = {
        (r["domain"], r["bucket_ts"]): r["quantile"]
        for r in hist_quantile(h, 0.95, LO, HI, BINS).collect()
    }
    pts = value_points.collect()
    by_key: dict = {}
    for r in pts:
        k = (r["domain"], r["bucket_ts"].replace(hour=0, minute=0))
        by_key.setdefault(k, []).append(r["value"])
    assert set(got) == set(by_key)
    for k, vals in by_key.items():
        vals = sorted(vals)
        true_q = vals[int(np.ceil(0.95 * len(vals))) - 1]  # rank-q element
        if LO <= true_q < HI:
            assert abs(got[k] - true_q) <= WIDTH, (k, got[k], true_q)
        else:
            assert got[k] in (LO, HI)


def test_query_range_hist_p95(spark, tmp_path, value_points):
    """query_range_hist serves p95 at a 2-day step from the hist_1d tier
    by exact bin addition — equals computing the histogram at that step
    directly from raw points."""
    from fischer_spark.api import query_range_hist
    from fischer_spark.operators.histogram import hist_quantile, hist_states
    from fischer_spark.sources.storage import ParquetManifestStore
    from pyspark.sql import functions as F
    from tests.conftest import assert_df_equal

    import pytest as _pytest

    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("hist_1d", hist_states(value_points, "1d", LO, HI, BINS))

    got = query_range_hist(
        store, "m", "2024-01-01", "2024-01-10", step_s=2 * 86400, q=0.95,
        lo=LO, hi=HI, n_bins=BINS,
    )
    step_bucket = F.timestamp_seconds(
        (F.unix_timestamp("bucket_ts") / (2 * 86400)).cast("long") * 2 * 86400
    ).alias("bucket_ts")
    direct = hist_quantile(
        hist_states(value_points, "1d", LO, HI, BINS)
        .groupBy("domain", "metric", "tag", step_bucket, "bin")
        .agg(F.sum("bin_cnt").alias("bin_cnt")),
        0.95, LO, HI, BINS,
    )
    assert_df_equal(got, direct)

    with _pytest.raises(ValueError, match="not a multiple"):
        query_range_hist(store, "m", "2024-01-01", "2024-01-10", 90, 0.95, LO, HI, BINS)


def test_query_range_hist_key_encoded_filters_via_dim(spark, tmp_path, value_points):
    """On a key-encoded hist table, label predicates resolve through the
    persisted key_dim (never silently skipped)."""
    from fischer_spark.api import query_range_hist
    from fischer_spark.operators.histogram import hist_states
    from fischer_spark.operators.series import encode_series_keys
    from fischer_spark.sources.storage import ParquetManifestStore

    enc, dim = encode_series_keys(value_points)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("hist_1d", hist_states(enc, "1d", LO, HI, BINS))
    store.append("key_dim", dim)

    all_keys = query_range_hist(
        store, None, "2024-01-01", "2024-01-10", 86400, 0.95, LO, HI, BINS
    )
    only_a = query_range_hist(
        store, "m", "2024-01-01", "2024-01-10", 86400, 0.95, LO, HI, BINS,
        domain="a",
    )
    n_all, n_a = all_keys.count(), only_a.count()
    assert 0 < n_a < n_all  # the domain predicate really narrowed the keys
    # r3: the read surface decodes key_ids back to label sets (consistent
    # with query_range — consumers never see internal ids)
    assert "key_id" not in only_a.columns
    assert {r["domain"] for r in only_a.select("domain").distinct().collect()} == {"a"}


def test_query_range_hist_by_label_pools_bins(spark, tmp_path, value_points):
    """query_range_hist(by=()) pools INTEGER bin counts across series
    before the walk, so the group quantile equals the quantile of the
    pooled values' histogram computed directly — and a key-encoded tier
    decodes through key_dim before grouping."""
    from fischer_spark.api import query_range_hist
    from fischer_spark.operators.histogram import hist_quantile, hist_states
    from fischer_spark.operators.series import encode_series_keys
    from fischer_spark.sources.storage import ParquetManifestStore
    from pyspark.sql import functions as F
    from tests.conftest import assert_df_equal

    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("hist_1d", hist_states(value_points, "1d", LO, HI, BINS))

    got = query_range_hist(
        store, None, "2024-01-01", "2024-01-10", 86400, q=0.95,
        lo=LO, hi=HI, n_bins=BINS, by=(),
    )
    direct = hist_quantile(
        hist_states(value_points, "1d", LO, HI, BINS)
        .groupBy("bucket_ts", "bin")
        .agg(F.sum("bin_cnt").alias("bin_cnt"))
        .withColumn("domain", F.lit(None).cast("string"))
        .withColumn("metric", F.lit(None).cast("string"))
        .withColumn("tag", F.lit(None).cast("string")),
        0.95, LO, HI, BINS,
    )
    assert_df_equal(got, direct)
    # pooled quantile != either per-series quantile in general, and the
    # pooled n is the full corpus count per day
    assert got.agg(F.sum("n")).first()[0] == value_points.count()

    # same answer off a key-encoded tier (decode-then-group path)
    enc, dim = encode_series_keys(value_points)
    store2 = ParquetManifestStore(spark, str(tmp_path / "w2"))
    store2.append("hist_1d", hist_states(enc, "1d", LO, HI, BINS))
    store2.append("key_dim", dim)
    got_enc = query_range_hist(
        store2, None, "2024-01-01", "2024-01-10", 86400, q=0.95,
        lo=LO, hi=HI, n_bins=BINS, by=(),
    )
    assert_df_equal(got_enc, direct)


def test_fraction_consts_pinned():
    """The literals inlined into hist_fraction_1h_events' SQL oracle must
    equal _fraction_consts' output — the oracle can never drift from the
    operator's arithmetic."""
    from fischer_spark.operators.histogram import _fraction_consts
    from fischer_spark.queries_extended import (
        _H_BINS,
        _H_HI,
        _H_LO,
        _HF_BH,
        _HF_BL,
        _HF_CH,
        _HF_CL,
        _HF_HI_V,
        _HF_LO_V,
    )

    assert _fraction_consts(_HF_LO_V, _H_LO, _H_HI, _H_BINS) == (_HF_BL, _HF_CL)
    assert _fraction_consts(_HF_HI_V, _H_LO, _H_HI, _H_BINS) == (_HF_BH, _HF_CH)
    # x == hi degenerates to "everything below overflow", zero interpolation
    assert _fraction_consts(_H_HI, _H_LO, _H_HI, _H_BINS) == (_H_BINS, 0.0)
    with pytest.raises(ValueError):
        _fraction_consts(_H_HI + 1.0, _H_LO, _H_HI, _H_BINS)


def test_hist_fraction_matches_brute(spark, value_points):
    """hist_fraction == the hand-computed bin-mass fraction, and tracks
    the TRUE fraction within the interpolation error bound (one bin of
    mass at each boundary)."""
    from fischer_spark.operators.histogram import hist_fraction, hist_states

    lo_v, hi_v = 10.0, 71.0  # bin 5 coef 0, bin 35 coef 0.5
    h = hist_states(value_points, "1d", LO, HI, BINS)
    got = {
        (r["domain"], r["bucket_ts"]): (r["n"], r["fraction"])
        for r in hist_fraction(h, lo_v, hi_v, LO, HI, BINS).collect()
    }
    rows = value_points.collect()
    import collections

    by_key = collections.defaultdict(list)
    for r in rows:
        day = r["bucket_ts"].replace(hour=0, minute=0, second=0, microsecond=0)
        by_key[(r["domain"], day)].append(r["value"])
    assert set(got) == set(by_key)
    for k, vals in by_key.items():
        n, frac = got[k]
        assert n == len(vals)
        true_frac = sum(1 for v in vals if lo_v <= v < hi_v) / len(vals)
        # interpolation error ≤ the mass of the two boundary bins
        edge_mass = sum(
            1 for v in vals if (10.0 <= v < 12.0) or (70.0 <= v < 72.0)
        ) / len(vals)
        assert abs(frac - true_frac) <= edge_mass + 1e-12, k
    # bound validation
    with pytest.raises(ValueError):
        hist_fraction(h, 50.0, 10.0, LO, HI, BINS)


# --------------------------------------------------------------------------
# hist_avg_stddev (O118): midpoint-mass mean/stddev, hand-computed.
# --------------------------------------------------------------------------

def _hist_rows(spark, rows):
    import datetime as dt

    b = dt.datetime(2024, 1, 1)
    data = [("d", "m", None, b, bin_, cnt) for bin_, cnt in rows]
    return spark.createDataFrame(
        data,
        "domain: string, metric: string, tag: string, "
        "bucket_ts: timestamp, bin: int, bin_cnt: long",
    )


def test_hist_avg_stddev_hand_computed(spark):
    import math

    from fischer_spark.operators.histogram import hist_avg_stddev

    # lo=0, hi=10, 5 bins (w=2): mids 1,3,5,7,9; overflow clamps to 10.
    h = _hist_rows(spark, [(0, 2), (2, 1), (5, 1)])
    r = hist_avg_stddev(h, 0.0, 10.0, 5).collect()[0]
    assert r["n"] == 4
    assert r["avg_est"] == (2 * 1 + 1 * 5 + 1 * 10) / 4  # 4.25
    assert r["stddev_est"] == math.sqrt((2 * 1 + 25 + 100) / 4 - 4.25 * 4.25)


def test_hist_avg_stddev_single_bin_zero_spread(spark):
    from fischer_spark.operators.histogram import hist_avg_stddev

    # all mass in one bin -> stddev exactly 0 (w=2 keeps coefficients
    # exact powers of two, so the clamp isn't even needed).
    h = _hist_rows(spark, [(3, 7)])
    r = hist_avg_stddev(h, 0.0, 10.0, 5).collect()[0]
    assert r["avg_est"] == 7.0 and r["stddev_est"] == 0.0


def test_hist_avg_stddev_underflow_clamps_to_lo(spark):
    from fischer_spark.operators.histogram import hist_avg_stddev

    # underflow mid = lo = 0, overflow mid = hi = 10 -> avg 5, spread 5.
    h = _hist_rows(spark, [(-1, 1), (5, 1)])
    r = hist_avg_stddev(h, 0.0, 10.0, 5).collect()[0]
    assert r["avg_est"] == 5.0 and r["stddev_est"] == 5.0


def test_hist_avg_stddev_merge_invariance(spark):
    from pyspark.sql import functions as F

    from fischer_spark.operators.histogram import hist_avg_stddev

    # pooling two bucket rows of the same bin == one pooled row: the
    # integer moments add, so a merged coarser tier is bit-identical.
    split = _hist_rows(spark, [(1, 3), (1, 4), (4, 2)])
    pooled = (
        split.groupBy("domain", "metric", "tag", "bucket_ts", "bin")
        .agg(F.sum("bin_cnt").alias("bin_cnt"))
    )
    a = hist_avg_stddev(split, 0.0, 10.0, 5).collect()[0]
    b = hist_avg_stddev(pooled, 0.0, 10.0, 5).collect()[0]
    assert (a["avg_est"], a["stddev_est"]) == (b["avg_est"], b["stddev_est"])


# --------------------------------------------------------------------------
# hist_cumulative (O119): classic-Prometheus le export, hand-computed.
# --------------------------------------------------------------------------

def test_hist_cumulative_le_bounds_and_running_counts(spark):
    import math

    from fischer_spark.operators.histogram import hist_cumulative

    # lo=0, hi=10, 5 bins (w=2). Bins -1 (underflow), 0, 3, 5 (overflow).
    h = _hist_rows(spark, [(-1, 2), (0, 3), (3, 4), (5, 1)])
    out = sorted(hist_cumulative(h, 0.0, 10.0, 5).collect(),
                 key=lambda r: r["le"])
    # underflow le = lo (bound of everything below the range)
    assert [(r["le"], r["cum_cnt"]) for r in out[:3]] == [
        (0.0, 2), (2.0, 5), (8.0, 9),
    ]
    assert math.isinf(out[3]["le"]) and out[3]["cum_cnt"] == 10  # +Inf = total


def test_hist_cumulative_monotone_per_bucket(spark):
    from fischer_spark.operators.histogram import hist_cumulative

    h = _hist_rows(spark, [(0, 1), (1, 1), (2, 1), (4, 1)])
    out = sorted(hist_cumulative(h, 0.0, 10.0, 5).collect(),
                 key=lambda r: r["le"])
    cums = [r["cum_cnt"] for r in out]
    assert cums == sorted(cums) and cums[-1] == 4
