"""§5.7 resume test: kill after stage k, rerun same run_id → identical
outputs, stages < k not recomputed (lineage fragments prove it)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fischer_spark.plans.lineage import read_lineage
from fischer_spark.plans.pipeline import RollupPipeline
from fischer_spark.sources.storage import ParquetManifestStore


@pytest.fixture(scope="module")
def small_pages(pages):
    return pages.filter(
        F.col("domain").isin("d000.example", "d002.example", "d005.example")
    ).select("domain", "warc_ts", F.octet_length("html").alias("page_bytes"), "lang")


def _frag_count(root, run_id, stage):
    d = os.path.join(root, "_lineage", run_id, stage)
    return len([f for f in os.listdir(d) if f.endswith(".json")]) if os.path.isdir(d) else 0


def test_resume_after_crash(spark, tmp_path, small_pages):
    root_a = str(tmp_path / "a")
    root_b = str(tmp_path / "b")

    # uninterrupted reference run
    full = RollupPipeline(spark, ParquetManifestStore(spark, root_a), "run1")
    full.run(small_pages)

    # crashed run: stop after rollup_1h, then resume with same run_id
    crash = RollupPipeline(spark, ParquetManifestStore(spark, root_b), "run1")
    crash.run(small_pages, until="rollup_1h")
    assert set(crash.completed()) == {"series", "rollup_1m", "rollup_1h"}
    frags_before = {
        s: _frag_count(root_b, "run1", s) for s in ("series", "rollup_1m", "rollup_1h")
    }

    resumed = RollupPipeline(spark, ParquetManifestStore(spark, root_b), "run1")
    resumed.run(small_pages)
    assert set(resumed.completed()) == set(full.completed())

    # stages < k were NOT recomputed: no new lineage fragments appeared
    frags_after = {
        s: _frag_count(root_b, "run1", s) for s in ("series", "rollup_1m", "rollup_1h")
    }
    assert frags_after == frags_before

    # outputs identical to the uninterrupted run, every stage
    sa = ParquetManifestStore(spark, root_a)
    sb = ParquetManifestStore(spark, root_b)
    for table in ("series", "rollup_1m", "rollup_1h", "rollup_1d",
                  "zscore_intervals", "seasonal_intervals"):
        da, db = sa.read(table), sb.read(table)
        assert da.count() == db.count(), table
        assert da.exceptAll(db).count() == 0, table
        assert db.exceptAll(da).count() == 0, table


def test_lineage_rows(spark, tmp_path, small_pages):
    root = str(tmp_path / "wh")
    p = RollupPipeline(spark, ParquetManifestStore(spark, root), "runL")
    p.run(small_pages, until="rollup_1m")
    lin = read_lineage(spark, root, "runL")
    rows = lin.collect()
    assert {r.stage for r in rows} == {"series", "rollup_1m"}
    series_rows = lin.filter(F.col("stage") == "series").agg(F.sum("input_rows")).collect()[0][0]
    assert series_rows == ParquetManifestStore(spark, root).read("series").count()
    assert all(r.wall_ms >= 0 for r in rows)


def test_fast_path_pipeline_matches_default(spark, tmp_path, small_pages):
    """impl=fixed64 + encode_keys runs the same DAG and yields hourly
    means within fixed-point tolerance and identical interval counts."""
    root_d = str(tmp_path / "dec")
    root_f = str(tmp_path / "fix")
    RollupPipeline(spark, ParquetManifestStore(spark, root_d), "r1").run(small_pages)
    RollupPipeline(
        spark, ParquetManifestStore(spark, root_f), "r1",
        impl="fixed64", encode_keys=True,
    ).run(small_pages)

    sd = ParquetManifestStore(spark, root_d)
    sf = ParquetManifestStore(spark, root_f)
    # fast-path 1h states carry key_id + long components instead
    d1h, f1h = sd.read("rollup_1h"), sf.read("rollup_1h")
    assert "key_id" in f1h.columns and "sq_aa" in f1h.columns
    assert d1h.count() == f1h.count()

    from fischer_spark.operators.rollup import with_derived_stats
    from fischer_spark.operators.series import decode_series_keys, encode_series_keys

    _, dim = encode_series_keys(sf.read("series"))
    dec = with_derived_stats(d1h).select("domain", "metric", "tag", "bucket_ts", "mean")
    fix = decode_series_keys(with_derived_stats(f1h), dim).select(
        "domain", "metric", "tag", "bucket_ts", "mean"
    )
    joined = dec.alias("a").join(
        fix.alias("b"),
        [F.expr(f"a.{c} <=> b.{c}") for c in ("domain", "metric", "tag", "bucket_ts")],
    )
    assert joined.count() == d1h.count()
    max_diff = joined.agg(
        F.max(F.abs(F.col("a.mean") - F.col("b.mean")))
    ).collect()[0][0]
    assert max_diff < 1e-6

    for table in ("zscore_intervals", "seasonal_intervals"):
        assert sd.read(table).count() == sf.read(table).count(), table


def test_gapfill_pipeline_stage(spark, tmp_path, small_pages):
    """gapfill='locf' inserts the series_filled stage; its rollup equals
    a manual gapfill_locf + rollup, and gap minutes are filled."""
    from fischer_spark.operators.gapfill import gapfill_locf
    from fischer_spark.operators.rollup import rollup_points
    from fischer_spark.operators.series import build_series

    root = str(tmp_path / "g")
    pipe = RollupPipeline(
        spark, ParquetManifestStore(spark, root), "rg", gapfill="locf"
    )
    pipe.run(small_pages, until="rollup_1m")
    assert "series_filled" in pipe.completed()

    store = ParquetManifestStore(spark, root)
    got = store.read("rollup_1m")

    manual = gapfill_locf(build_series(small_pages), "1m")
    manual = manual.filter(F.col("value_filled").isNotNull()).select(
        "domain", "metric", "tag", "bucket_ts",
        F.col("value_filled").alias("value"),
    )
    want = rollup_points(manual, "1m")

    from tests.conftest import assert_df_equal

    assert_df_equal(got.drop("_run_id"), want) if "_run_id" in got.columns else assert_df_equal(got, want)

    # dense: filled 1m rollup has at least as many buckets as unfilled
    unfilled = rollup_points(build_series(small_pages), "1m")
    assert got.count() >= unfilled.count()


def test_hist_pipeline_stage(spark, tmp_path, small_pages):
    """hist=True materializes the percentile tier family: hist_1h from
    raw points, hist_1d by exact merge; p95 readable from either; the
    key-encoded variant selects page_size keys via the persisted dim."""
    from fischer_spark.operators.histogram import hist_merge, hist_quantile, hist_states

    lo, hi, bins = 0.0, float(1 << 20), 256
    root = str(tmp_path / "h")
    pipe = RollupPipeline(
        spark, ParquetManifestStore(spark, root), "rh", hist=True
    )
    pipe.run(small_pages, until="hist_1d")
    store = ParquetManifestStore(spark, root)
    assert {"hist_1h", "hist_1d"} <= set(pipe.completed())

    from fischer_spark.operators.series import build_series
    from tests.conftest import assert_df_equal

    want_pts = build_series(small_pages).filter(F.col("metric") == "page_size")
    want_1h = hist_states(want_pts, "1h", lo, hi, bins)
    assert_df_equal(store.read("hist_1h"), want_1h)
    assert_df_equal(store.read("hist_1d"), hist_merge(want_1h, "1d"))
    assert hist_quantile(store.read("hist_1d"), 0.95, lo, hi, bins).count() > 0

    # key-encoded variant: same histogram rows modulo key representation
    root_f = str(tmp_path / "hf")
    RollupPipeline(
        spark, ParquetManifestStore(spark, root_f), "rhf",
        impl="fixed64", encode_keys=True, hist=True,
    ).run(small_pages, until="hist_1d")
    sf_store = ParquetManifestStore(spark, root_f)
    f1d = sf_store.read("hist_1d")
    assert "key_id" in f1d.columns
    assert f1d.agg(F.sum("bin_cnt")).collect()[0][0] == \
        store.read("hist_1d").agg(F.sum("bin_cnt")).collect()[0][0]


def test_partition_days_pipeline_equivalent_and_pruned(spark, tmp_path, small_pages):
    """partition_days=True commits tier tables day-partitioned; results
    are identical to the unpartitioned run and query_range reads prune
    day directories."""
    from fischer_spark.api import query_range

    root_a, root_b = str(tmp_path / "plain"), str(tmp_path / "days")
    sa, sb = ParquetManifestStore(spark, root_a), ParquetManifestStore(spark, root_b)
    RollupPipeline(spark, sa, "r").run(small_pages)
    RollupPipeline(spark, sb, "r", partition_days=True).run(small_pages)

    entry = sb.snapshots("rollup_1h")[0]
    assert entry["day_col"] == "bucket_ts"
    days = [p for p in os.listdir(entry["path"]) if p.startswith("_day=")]
    assert len(days) > 1

    for table in ("series", "rollup_1m", "rollup_1h", "rollup_1d"):
        assert sa.read(table).exceptAll(sb.read(table)).count() == 0, table
        assert sb.read(table).exceptAll(sa.read(table)).count() == 0, table

    lo, hi = sb.read("rollup_1h").agg(
        F.min("bucket_ts"), F.max("bucket_ts")
    ).first()
    start = str(lo.replace(hour=0, minute=0, second=0, microsecond=0))
    end = str(lo.replace(hour=0) + __import__("datetime").timedelta(days=1))
    a = query_range(sa, "crawl_rate", start, end, 3600)
    b = query_range(sb, "crawl_rate", start, end, 3600)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "_day" in plan  # partition filter reached the scan
