"""O88 archive tier: compressed cold storage of tier STATES.

Pins (1) bit-exact encode→decode round trip for both state impls
(decimal sums up to 28 digits via two-limb encoding; fixed64 longs via
bit-pattern gorilla), (2) the archive_tier retention split — live+cold
together still equal the original tier exactly, so query-range-style
state re-aggregation is unchanged across the hot/cold boundary, and
(3) zone-map pruning: out-of-window chunks are dropped before decode.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fischer_spark.operators.archive import (
    archive_tier,
    decode_state_chunks,
    encode_state_chunks,
    read_tier_with_archive,
)
from fischer_spark.operators.rollup import rollup_points
from fischer_spark.operators.series import build_series, encode_series_keys
from fischer_spark.sources.pages import synth_pages
from fischer_spark.sources.storage import ParquetManifestStore
from tests.conftest import assert_df_equal


def _tier(spark, impl, n=3000, seed=13, encode=False):
    pages = synth_pages(spark, n, seed=seed).selectExpr(
        "parse_url(url, 'HOST') AS domain", "warc_ts",
        "octet_length(html) AS page_bytes", "lang",
    )
    pts = build_series(pages)
    if encode:
        pts, key_dim = encode_series_keys(pts)
        return rollup_points(pts, "1h", impl=impl), key_dim
    return rollup_points(pts, "1h", impl=impl)


def test_roundtrip_decimal_states(spark):
    states = _tier(spark, "decimal")
    chunks = encode_state_chunks(states, chunk_window="1w")
    back = decode_state_chunks(chunks, states.schema)
    assert_df_equal(back, states, tol=0)  # incl. decimal(28,6)/(28,12) sums


def test_roundtrip_fixed64_keyencoded_states(spark):
    states, _ = _tier(spark, "fixed64", encode=True)
    chunks = encode_state_chunks(states, chunk_window="1mo")
    back = decode_state_chunks(chunks, states.schema)
    assert_df_equal(back, states, tol=0)  # long sums/sq + double min/max


def test_roundtrip_huge_decimal_limbs(spark):
    """Decimal sums past int64 (the reason for the two-limb codec):
    plant a state with |unscaled| > 2^64 and round-trip it."""
    from decimal import Decimal

    states = _tier(spark, "decimal").limit(5)
    big = states.withColumn(
        "sum", F.lit("9876543210987654321098.765432").cast("decimal(28,6)")
    ).withColumn(
        "sum_sq",
        F.lit("-1234567890123456.345678901234").cast("decimal(28,12)"),
    )
    back = decode_state_chunks(encode_state_chunks(big), big.schema)
    got = back.select("sum", "sum_sq").distinct().collect()
    # both unscaled values exceed 2^64: 9.87e27 and -1.23e27
    assert got[0]["sum"] == Decimal("9876543210987654321098.765432")
    assert got[0]["sum_sq"] == Decimal("-1234567890123456.345678901234")


def test_archive_tier_split_preserves_queries(spark, tmp_path):
    """archive_tier moves pre-horizon rows to compressed chunks; the
    unioned read equals the original tier bit-for-bit, and a 1d state
    re-aggregation (what query_range does) matches across the
    boundary."""
    from fischer_spark.operators.rollup import rollup_states

    states = _tier(spark, "decimal", n=4000, seed=21)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)

    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    snaps = archive_tier(store, "1h", str(cut), chunk_window="1w")
    assert set(snaps) == {"archive_1h", "rollup_1h"}

    live = store.read("rollup_1h")
    assert live.filter(F.col("bucket_ts") < F.lit(str(cut))).count() == 0
    assert live.count() < states.count()

    merged = read_tier_with_archive(store, "1h")
    assert_df_equal(merged, states, tol=0)

    # downstream state algebra is unchanged across the boundary
    assert_df_equal(
        rollup_states(merged, "1d"), rollup_states(states, "1d"), tol=0
    )


def test_read_window_prunes_chunks_before_decode(spark, tmp_path):
    """A read window past every archived chunk decodes nothing: the
    plan's surviving-chunk count is zero after the stat-column filters
    (and the result is just the live rows)."""
    states = _tier(spark, "decimal", n=2000, seed=5)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    archive_tier(store, "1h", str(cut), chunk_window="1w")

    chunks = store.read("archive_1h")
    surviving = chunks.filter(F.col("t_end") >= F.lit(str(cut))).count()
    assert surviving < chunks.count()  # prune is real at chunk grain

    got = read_tier_with_archive(store, "1h", t_from=str(cut))
    want = states.filter(F.col("bucket_ts") >= F.lit(str(cut)))
    assert_df_equal(got, want, tol=0)


def test_archive_compresses(spark):
    """The archive blobs are materially smaller than the plain int64/
    decimal representation they replace (sanity bound, not a tuning
    target: dod ts + gorilla'd longs on hourly states)."""
    states = _tier(spark, "fixed64", n=6000, seed=9)
    chunks = encode_state_chunks(states, chunk_window="1mo")
    row = chunks.select(
        F.sum(F.octet_length("ts_bytes")).alias("ts_b"),
        F.sum(
            F.aggregate(
                F.map_values("state_bytes"),
                F.lit(0).cast("long"),
                lambda acc, b: acc + F.octet_length(b),
            )
        ).alias("state_b"),
        F.sum("n").alias("n"),
    ).first()
    n = row["n"]
    raw_bytes = n * 8 * (1 + 7)  # ts + 7 fixed64 state columns
    packed = row["ts_b"] + row["state_b"]
    assert packed < raw_bytes * 0.7, (packed, raw_bytes)


def test_archive_tier_rerun_is_idempotent(spark, tmp_path):
    """Re-running archive_tier with the same cutoff must not duplicate
    cold rows (ADVICE r3 medium): the archive side is an overwrite-merge,
    so the second run rewrites identical content and the unioned read
    still equals the original tier exactly."""
    states = _tier(spark, "decimal", n=3000, seed=41)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    archive_tier(store, "1h", str(cut), chunk_window="1w")
    archive_tier(store, "1h", str(cut), chunk_window="1w")  # re-run
    assert_df_equal(read_tier_with_archive(store, "1h"), states, tol=0)


def test_archive_tier_crash_between_commits_repairs(spark, tmp_path):
    """Simulate the failure mode the ADVICE names: the archive commit
    lands but the live shrink doesn't.  Re-running with the same cutoff
    must repair — no double-counted states, live trimmed."""
    states = _tier(spark, "decimal", n=3000, seed=43)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2

    real_ovw = store.overwrite_range
    calls = {"n": 0}

    def crashing(table, *a, **k):
        if table.startswith("rollup_"):
            calls["n"] += 1
            raise RuntimeError("injected crash before live shrink")
        return real_ovw(table, *a, **k)

    store.overwrite_range = crashing
    try:
        archive_tier(store, "1h", str(cut), chunk_window="1w")
    except RuntimeError:
        pass
    store.overwrite_range = real_ovw
    assert calls["n"] == 1  # the crash hit the live-shrink commit
    # cold rows are now BOTH archived and live — the bad state
    # re-run with the same cutoff = the repair path
    archive_tier(store, "1h", str(cut), chunk_window="1w")
    assert store.read("rollup_1h").filter(
        F.col("bucket_ts") < F.lit(str(cut))
    ).count() == 0
    assert_df_equal(read_tier_with_archive(store, "1h"), states, tol=0)


def test_archive_tier_later_cutoff_extends(spark, tmp_path):
    """Periodic archiving: a second run with a LATER cutoff moves only
    the newly cold range; untouched old chunks are not rewritten and
    the union stays exact."""
    states = _tier(spark, "fixed64", n=3000, seed=47)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut1 = lo + (hi - lo) / 3
    cut2 = lo + 2 * (hi - lo) / 3
    archive_tier(store, "1h", str(cut1), chunk_window="1w")
    archive_tier(store, "1h", str(cut2), chunk_window="1w")
    live = store.read("rollup_1h")
    assert live.filter(F.col("bucket_ts") < F.lit(str(cut2))).count() == 0
    assert_df_equal(read_tier_with_archive(store, "1h"), states, tol=0)


def _hist_tier(spark, n=3000, seed=53):
    from fischer_spark.operators.histogram import hist_states
    from fischer_spark.operators.series import build_series

    pages = synth_pages(spark, n, seed=seed).selectExpr(
        "parse_url(url, 'HOST') AS domain", "warc_ts",
        "octet_length(html) AS page_bytes", "lang",
    )
    return hist_states(
        build_series(pages), "1h", lo=0.0, hi=float(1 << 20), n_bins=256
    )


def test_hist_archive_roundtrip_and_boundary_read(spark, tmp_path):
    """The long-form histogram tier (several int rows per bucket)
    archives with the same codec: bit-exact round trip, idempotent
    re-run, and read_tier_with_archive(table_prefix='hist') serves the
    exact pre-archive table across the hot/cold boundary."""
    from fischer_spark.operators.archive import (
        decode_state_chunks as _dec,
        encode_state_chunks as _enc,
    )

    h = _hist_tier(spark)
    back = _dec(_enc(h, chunk_window="1w"), h.schema)
    assert_df_equal(back, h, tol=0)

    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("hist_1h", h)
    lo, hi = h.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    archive_tier(store, "1h", str(cut), chunk_window="1w", table_prefix="hist")
    archive_tier(store, "1h", str(cut), chunk_window="1w", table_prefix="hist")
    assert store.current_snapshot("archive_hist_1h") is not None
    live = store.read("hist_1h")
    assert live.filter(F.col("bucket_ts") < F.lit(str(cut))).count() == 0
    merged = read_tier_with_archive(store, "1h", table_prefix="hist")
    assert_df_equal(merged, h, tol=0)


def test_query_range_hist_include_archive(spark, tmp_path):
    """query_range_hist(include_archive=True) over a half-archived
    hist_1h tier equals the same read over the never-archived tier —
    integer bin counts make the percentile walk bit-identical across
    the boundary."""
    from fischer_spark.api import query_range_hist

    params = (0.0, float(1 << 20), 256)
    h = _hist_tier(spark)
    store_ref = ParquetManifestStore(spark, str(tmp_path / "ref"))
    store_ref.append("hist_1h", h)
    store_cold = ParquetManifestStore(spark, str(tmp_path / "cold"))
    store_cold.append("hist_1h", h)
    lo, hi = h.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    archive_tier(store_cold, "1h", str(cut), chunk_window="1w", table_prefix="hist")

    start, end = "2024-01-01 00:00:00", "2024-12-31 00:00:00"
    want = query_range_hist(
        store_ref, None, start, end, 7200, q=0.95,
        lo=params[0], hi=params[1], n_bins=params[2],
    )
    got = query_range_hist(
        store_cold, None, start, end, 7200, q=0.95,
        lo=params[0], hi=params[1], n_bins=params[2],
        include_archive=True,
    )
    assert_df_equal(got, want, tol=0)
    hot_only = query_range_hist(
        store_cold, None, start, end, 7200, q=0.95,
        lo=params[0], hi=params[1], n_bins=params[2],
    )
    assert hot_only.count() < want.count()


def test_query_range_include_archive(spark, tmp_path):
    """query_range(include_archive=True) over a half-archived 1h tier
    equals query_range over the never-archived tier — the serving
    surface is boundary-agnostic."""
    from fischer_spark.api import query_range

    states = _tier(spark, "decimal", n=3000, seed=31)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()

    store_ref = ParquetManifestStore(spark, str(tmp_path / "ref"))
    store_ref.append("rollup_1h", states)
    store_cold = ParquetManifestStore(spark, str(tmp_path / "cold"))
    store_cold.append("rollup_1h", states)
    cut = lo + (hi - lo) / 2
    archive_tier(store_cold, "1h", str(cut), chunk_window="1w")

    start, end = "2024-01-01 00:00:00", "2024-12-31 00:00:00"
    want = query_range(store_ref, "crawl_rate", start, end, 7200, stat="mean")
    got = query_range(
        store_cold, "crawl_rate", start, end, 7200, stat="mean",
        include_archive=True,
    )
    assert_df_equal(got, want, tol=0)  # bit-exact across the boundary
    # without include_archive the cold half is (correctly) absent
    hot_only = query_range(store_cold, "crawl_rate", start, end, 7200)
    assert hot_only.count() < want.count()


def test_archive_repair_prefers_refreshed_live_state(spark, tmp_path):
    """Late data merged into a bucket BELOW a prior archive cutoff
    (rollup_job's overwrite_range repair path) makes the live tier and
    the archive disagree for that (key, bucket).  The repair merge must
    deterministically keep the REFRESHED live state, never the stale
    archived one (ADVICE r4, medium)."""
    states = _tier(spark, "fixed64", n=3000, seed=59)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", states)
    lo, hi = states.agg(F.min("bucket_ts"), F.max("bucket_ts")).first()
    cut = lo + (hi - lo) / 2
    archive_tier(store, "1h", str(cut), chunk_window="1w")

    # late-data refresh: bump cnt on every already-archived bucket and
    # reinsert those rows into the LIVE tier (what a tier refresh does)
    refreshed = states.filter(F.col("bucket_ts") < F.lit(str(cut))).withColumn(
        "cnt", F.col("cnt") + F.lit(1000000)
    )
    live_now = store.read("rollup_1h").unionByName(refreshed)
    store.overwrite_range(
        "rollup_1h", live_now, "bucket_ts",
        "1900-01-01 00:00:00", "9999-01-01 00:00:00",
    )

    archive_tier(store, "1h", str(cut), chunk_window="1w")  # repair run
    merged = read_tier_with_archive(store, "1h")
    expect = states.filter(F.col("bucket_ts") >= F.lit(str(cut))).unionByName(
        refreshed
    )
    assert_df_equal(merged, expect, tol=0)
    # every archived cold row carries the refreshed cnt, not the stale one
    stale = merged.filter(
        (F.col("bucket_ts") < F.lit(str(cut))) & (F.col("cnt") < 1000000)
    ).count()
    assert stale == 0
