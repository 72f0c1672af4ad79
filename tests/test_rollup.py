"""Tier-parity invariants (SURVEY.md §5.2) — the heart of the engine:
continuous aggregates must compose EXACTLY across tiers and be invariant
to partitioning / salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.rollup import (
    rollup_points,
    rollup_points_salted,
    rollup_states,
    tiered_rollups,
    with_derived_stats,
)
from fischer_spark.operators.series import build_series

from tests.conftest import assert_df_equal


@pytest.fixture(scope="module")
def points(pages):
    return build_series(pages).cache()


def test_tier_parity_1m_to_1h(points):
    direct = rollup_points(points, "1h")
    cascaded = rollup_states(rollup_points(points, "1m"), "1h")
    assert_df_equal(direct, cascaded)


def test_tier_parity_1h_to_1d(points):
    direct = rollup_points(points, "1d")
    cascaded = rollup_states(rollup_points(points, "1h"), "1d")
    assert_df_equal(direct, cascaded)


def test_salted_equals_unsalted(points):
    plain = rollup_points(points, "1h")
    salted = rollup_points_salted(points, "1h", salt_k=16)
    assert_df_equal(plain, salted)


def test_partitioning_invariance(points):
    a = rollup_points(points.repartition(3), "1h")
    b = rollup_points(points.repartition(37), "1h")
    assert_df_equal(a, b)


def test_derived_stats_match_native(points):
    """mean/stddev derived from exact states == Spark's native avg/stddev."""
    derived = with_derived_stats(rollup_points(points, "1h")).select(
        "domain", "metric", "tag", "bucket_ts", "mean", "stddev"
    )
    native = (
        points.groupBy(
            "domain", "metric", "tag", F.date_trunc("hour", "bucket_ts").alias("bucket_ts")
        )
        .agg(F.avg("value").alias("mean"), F.stddev_samp("value").alias("stddev"))
    )
    assert_df_equal(derived, native, tol=1e-9)


def test_fixed64_tier_parity_and_partitioning(points):
    """fixed64 long-state impl: exact cascade + partitioning invariance
    (the properties that let AQE re-plan freely without changing a bit)."""
    direct = rollup_points(points, "1h", impl="fixed64")
    cascaded = rollup_states(rollup_points(points, "1m", impl="fixed64"), "1h")
    assert_df_equal(direct, cascaded)
    a = rollup_points(points.repartition(3), "1h", impl="fixed64")
    b = rollup_points(points.repartition(37), "1h", impl="fixed64")
    assert_df_equal(a, b)


def test_fixed64_salted_equals_unsalted(points):
    plain = rollup_points(points, "1h", impl="fixed64")
    salted = rollup_points_salted(points, "1h", salt_k=16, impl="fixed64")
    assert_df_equal(plain, salted)


def test_fixed64_derived_stats_match_decimal(points):
    """Derived mean/stddev agree across state impls.

    Not bit-identical by construction (fixed64 rounds value→6 decimals
    via double·10⁶ HALF_UP, decimal via cast) but any difference is
    ≤1e-6 on the value, far below detector thresholds."""
    keys = ["domain", "metric", "tag", "bucket_ts"]
    dec = with_derived_stats(rollup_points(points, "1h")).select(*keys, "mean", "stddev")
    fix = with_derived_stats(rollup_points(points, "1h", impl="fixed64")).select(
        *keys, "mean", "stddev"
    )
    assert_df_equal(dec, fix, tol=1e-5)


def test_key_id_rollup_matches_string_key_rollup(points):
    """Dictionary-encoded key_id path == string-key path after decode."""
    from fischer_spark.operators.series import (
        decode_series_keys,
        encode_series_keys,
        verify_key_encoding,
    )

    enc, dim = encode_series_keys(points)
    assert verify_key_encoding(dim)
    via_id = decode_series_keys(rollup_points(enc, "1h"), dim).select(
        "domain", "metric", "tag", "bucket_ts", "cnt", "sum", "sum_sq", "min", "max"
    )
    direct = rollup_points(points, "1h").select(
        "domain", "metric", "tag", "bucket_ts", "cnt", "sum", "sum_sq", "min", "max"
    )
    assert_df_equal(via_id, direct)


def test_tiered_cascade_shape(points):
    tiers = tiered_rollups(points, salt_k=8)
    n1m = tiers["1m"].count()
    n1h = tiers["1h"].count()
    n1d = tiers["1d"].count()
    assert n1m >= n1h >= n1d > 0
    # cnt conservation: every tier sums to the same total point count
    tot = points.count()
    for t, df in tiers.items():
        if t == "1m":
            assert df.agg(F.sum("cnt")).collect()[0][0] == tot


def test_refresh_tier_incremental_merge(spark, points, tmp_path):
    """Continuous-aggregate refresh: ingest in two batches split MID-bucket
    (the delta must merge onto an existing partial state), result equals
    the single-batch rollup exactly; only touched buckets were rewritten."""
    from fischer_spark.operators.rollup import refresh_tier
    from fischer_spark.sources.storage import ParquetManifestStore

    cut = points.agg(
        F.timestamp_seconds(
            (F.unix_timestamp(F.min("bucket_ts")) + F.unix_timestamp(F.max("bucket_ts")))
            / 2 + 1801  # off the hour grid → mid-bucket split
        )
    ).collect()[0][0]
    first, second = points.filter(F.col("bucket_ts") < F.lit(cut)), points.filter(
        F.col("bucket_ts") >= F.lit(cut)
    )
    assert first.count() > 0 and second.count() > 0

    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", rollup_points(first, "1h"))
    snap = refresh_tier(store, "rollup_1h", "1h", second)
    assert snap is not None

    assert_df_equal(store.read("rollup_1h"), rollup_points(points, "1h"))

    # the refresh overwrote only the delta's bucket range
    ops = store.snapshots("rollup_1h")
    assert ops[-1]["op"] == "overwrite_range"
    lo = second.agg(F.date_trunc("hour", F.min("bucket_ts"))).collect()[0][0]
    assert str(lo) == ops[-1]["lo"]


def test_bucketize_equals_date_trunc(spark):
    """The integer-arithmetic bucketization (functions/time.py, ~30%
    faster on the volume stage) is identical to date_trunc under the
    engine's pinned-UTC sessions — incl. pre-1970, sub-second, leap-day
    and DST-date inputs (UTC has no DST; that's why it's pinned)."""
    import datetime

    from pyspark.sql import functions as F

    from fischer_spark.functions.time import bucketize
    from fischer_spark.schemas import TIER_TRUNC

    rows = [
        (datetime.datetime(1969, 12, 31, 23, 58, 59, 999999),),
        (datetime.datetime(1970, 1, 1, 0, 0),),
        (datetime.datetime(2024, 2, 29, 23, 59, 59, 500000),),
        (datetime.datetime(2024, 3, 10, 2, 30, 0, 1),),
        (datetime.datetime(2024, 11, 3, 1, 59, 59),),
        (datetime.datetime(2038, 1, 19, 3, 14, 8),),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    for tier, unit in TIER_TRUNC.items():
        bad = df.filter(
            ~F.date_trunc(unit, "ts").eqNullSafe(bucketize("ts", tier))
        ).count()
        assert bad == 0, tier


def test_calendar_tier_parity(points):
    """O77: 1w/1mo/1y calendar states merged from the 1d cascade equal a
    direct calendar aggregation of raw points, bit-for-bit — the same
    exact-state-algebra guarantee the fixed tiers have."""
    from pyspark.sql import functions as F

    from fischer_spark.operators.rollup import rollup_states_calendar

    t1d = rollup_states(rollup_states(rollup_points(points, "1m"), "1h"), "1d")
    for tier, unit in (("1w", "week"), ("1mo", "month"), ("1y", "year")):
        cascaded = rollup_states_calendar(t1d, tier)
        direct = (
            points.groupBy(
                "domain", "metric", "tag",
                F.date_trunc(unit, "bucket_ts").alias("bucket_ts"),
            )
            .agg(
                F.count("value").alias("cnt"),
                F.sum(F.col("value").cast("decimal(28,6)")).alias("sum"),
                F.sum((F.col("value") * F.col("value")).cast("decimal(28,12)")).alias("sum_sq"),
                F.min("value").alias("min"),
                F.max("value").alias("max"),
            )
            .withColumn("tier", F.lit(tier))
            .select("domain", "metric", "tag", "tier", "bucket_ts",
                    "cnt", "sum", "sum_sq", "min", "max")
        )
        assert_df_equal(direct, cascaded)
        # week buckets are Monday-aligned (ISO), not epoch-floor (Thursday)
        if tier == "1w":
            bad = cascaded.filter(F.dayofweek("bucket_ts") != 2).count()
            assert bad == 0


def test_calendar_tier_fixed64_and_unknown(points):
    """Calendar merge infers the fixed64 impl from state columns; unknown
    tiers fail loudly (allowlist, same policy as bucketize)."""
    import pytest as _pt

    from fischer_spark.operators.rollup import rollup_states_calendar

    t1d_f = rollup_states(rollup_points(points, "1h", impl="fixed64"), "1d")
    mo = rollup_states_calendar(t1d_f, "1mo")
    assert "sq_aa" in mo.columns and mo.count() > 0
    with _pt.raises(KeyError):
        rollup_states_calendar(t1d_f, "10d")
