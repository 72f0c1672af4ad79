"""Fluent API: end-to-end chain equals the composed operator calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from fischer_spark.api import Series


def test_fluent_chain_runs(pages):
    out = (
        Series.from_pages(pages, families=("crawl_rate",))
        .rollup("1h")
        .score("zscore", w=24, min_periods=8)
        .intervals(tau=3.0)
    )
    rows = out.df.collect()
    assert len(rows) > 0
    assert {"detector", "interval_start", "peak_score"} <= set(out.df.columns)
    assert all(r.detector == "zscore" for r in rows)


def test_fluent_equals_composed(pages):
    from fischer_spark.operators.detect import zscore_window
    from fischer_spark.operators.rollup import rollup_points, with_derived_stats
    from fischer_spark.operators.series import crawl_rate_series

    from tests.conftest import assert_df_equal

    fluent = (
        Series.from_pages(pages, families=("crawl_rate",))
        .rollup("1h")
        .score("zscore")
        .df
    )
    composed = zscore_window(
        with_derived_stats(rollup_points(crawl_rate_series(pages), "1h")).select(
            "domain", "metric", "tag", "bucket_ts", F.col("mean").alias("value")
        )
    )
    assert_df_equal(fluent, composed)


def test_gapfill_then_seasonal(pages):
    out = (
        Series.from_pages(pages.filter(F.col("domain") == "d003.example"), ("crawl_rate",))
        .rollup("1h")
        .gapfill("linear", tier="1h")
        .score("seasonal")
    )
    assert out.df.count() > 0
