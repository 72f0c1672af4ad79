"""Series algebra: PromQL-style vector matching (operators/binop.py)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from fischer_spark.operators.binop import series_binop

T0 = datetime.datetime(2024, 1, 1)
SCHEMA = "domain string, tag string, bucket_ts timestamp, value double"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_inner_match_and_null_labels(spark):
    """Samples pair on (labels, ts); NULL tag pairs with NULL tag (the
    sentinel convention) instead of vanishing through the equi-join."""
    left = _df(spark, [
        ("a", None, T0, 10.0),
        ("a", "x", T0, 8.0),
        ("b", None, T0, 5.0),          # no right partner -> dropped
    ])
    right = _df(spark, [
        ("a", None, T0, 4.0),
        ("a", "x", T0, 2.0),
    ])
    out = series_binop(left, right, op="div", on=("domain", "tag"))
    got = {(r["domain"], r["tag"]): r["value"] for r in out.collect()}
    assert got == {("a", None): 2.5, ("a", "x"): 4.0}


def test_div_by_zero_is_null(spark):
    left = _df(spark, [("a", None, T0, 3.0)])
    right = _df(spark, [("a", None, T0, 0.0)])
    (r,) = series_binop(left, right, op="div", on=("domain", "tag")).collect()
    assert r["value"] is None


def test_left_match_with_fill(spark):
    """match='left' keeps unmatched left samples; fill stands in for the
    missing right value (the PromQL `or vector(c)` idiom)."""
    left = _df(spark, [("a", None, T0, 3.0), ("b", None, T0, 7.0)])
    right = _df(spark, [("a", None, T0, 2.0)])
    out = series_binop(
        left, right, op="add", on=("domain", "tag"), match="left", fill=0.0
    )
    got = {r["domain"]: r["value"] for r in out.collect()}
    assert got == {"a": 5.0, "b": 7.0}
    # without fill the unmatched result is NULL, the row still present
    out2 = series_binop(
        left, right, op="add", on=("domain", "tag"), match="left"
    )
    got2 = {r["domain"]: r["value"] for r in out2.collect()}
    assert got2["a"] == 5.0 and got2["b"] is None


def test_all_ops_and_timestamp_mismatch(spark):
    t1 = T0 + datetime.timedelta(hours=1)
    left = _df(spark, [("a", None, T0, 6.0), ("a", None, t1, 1.0)])
    right = _df(spark, [("a", None, T0, 3.0)])  # t1 has no partner
    for op, want in (("add", 9.0), ("sub", 3.0), ("mul", 18.0), ("div", 2.0)):
        rows = series_binop(left, right, op=op, on=("domain", "tag")).collect()
        assert len(rows) == 1 and rows[0]["value"] == want

    with pytest.raises(ValueError, match="unknown series binop"):
        series_binop(left, right, op="pow", on=("domain", "tag")).collect()
    with pytest.raises(ValueError, match="unknown match mode"):
        series_binop(left, right, match="outer")


def test_plan_is_single_sort_merge_or_hash_join(spark):
    """One equi-join, no cartesian, no Python in the plan."""
    left = _df(spark, [("a", None, T0, 6.0)])
    right = _df(spark, [("a", None, T0, 3.0)])
    plan = (
        series_binop(left, right, on=("domain", "tag"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" in plan
    assert "Cartesian" not in plan
    assert "PythonUDF" not in plan


def test_fluent_series_binop(pages):
    """Two metric families from the same pages combine per (domain, tag,
    bucket) with the metric name dropped from matching, PromQL-style."""
    from fischer_spark.api import Series

    cr = Series.from_pages(pages, ("crawl_rate",)).rollup("1h")
    ps = Series.from_pages(pages, ("page_size",)).rollup("1h")
    out = cr.binop(ps, "div", new_metric="rate_per_byte")
    assert out.df.columns == ["domain", "metric", "tag", "bucket_ts", "value"]
    rows = out.df.limit(5).collect()
    assert rows and all(r["metric"] == "rate_per_byte" for r in rows)
    # spot-check buckets against the direct division
    a = {(r["domain"], r["bucket_ts"]): r["value"] for r in cr.df.collect()}
    b = {(r["domain"], r["bucket_ts"]): r["value"] for r in ps.df.collect()}
    got = {(r["domain"], r["bucket_ts"]): r["value"] for r in out.df.collect()}
    for k, v in list(got.items())[:20]:
        assert abs(v - a[k] / b[k]) < 1e-12


def test_series_offset_pairs_past_with_present(spark):
    """O79: x / (x offset 1h) — each sample divides by the previous hour's,
    the first hour has no pair; NTZ timestamp type is preserved."""
    import datetime

    from fischer_spark.operators.binop import series_binop, series_offset

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", base + datetime.timedelta(hours=h), float(2**h)) for h in range(5)
    ]
    df = spark.createDataFrame(rows, "domain string, bucket_ts timestamp_ntz, value double")
    shifted = series_offset(df, 3600)
    assert dict(shifted.dtypes)["bucket_ts"] == "timestamp_ntz"
    out = series_binop(df, shifted, op="div", on=("domain",)).collect()
    assert len(out) == 4  # first hour unmatched
    assert all(abs(r["value"] - 2.0) < 1e-12 for r in out)  # doubling series

    # negative offset pairs the FUTURE sample (offset -1h)
    back = series_binop(df, series_offset(df, -3600), op="div", on=("domain",)).collect()
    assert len(back) == 4 and all(abs(r["value"] - 0.5) < 1e-12 for r in back)


def test_grouped_binop_group_left_shape(spark):
    """series_binop_grouped (PromQL group_left): every left sample pairs
    with the one right sample sharing its `on` labels+ts; the output
    carries the LEFT's full label set; NULL tags survive."""
    import datetime

    from fischer_spark.operators.binop import series_binop_grouped

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [
            ("a", "m", "x", t, 3.0),
            ("a", "m", None, t, 1.0),   # NULL tag must pair too
            ("b", "m", "x", t, 5.0),
        ],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("a", t, 4.0), ("b", t, 5.0)],
        "domain string, bucket_ts timestamp, value double",
    )
    out = series_binop_grouped(left, right, op="div", on=("domain",))
    rows = {(r["domain"], r["tag"]): r["value"] for r in out.collect()}
    assert rows == {("a", "x"): 0.75, ("a", None): 0.25, ("b", "x"): 1.0}
    assert set(out.columns) == {"domain", "metric", "tag", "bucket_ts", "value"}


def test_grouped_binop_strict_raises_on_many_right(spark):
    """PromQL's cardinality rule: duplicate right rows per (on, ts) must
    raise in strict mode (execution-time raise_error), not silently
    fan out; strict=False documents the escape hatch."""
    import datetime

    import pytest

    from fischer_spark.operators.binop import series_binop_grouped

    t = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [("a", "m", "x", t, 3.0)],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    dup_right = spark.createDataFrame(
        [("a", t, 4.0), ("a", t, 9.0)],
        "domain string, bucket_ts timestamp, value double",
    )
    with pytest.raises(Exception, match="group_left"):
        series_binop_grouped(left, dup_right, on=("domain",)).collect()
    # non-strict keeps both pairings (caller's explicit choice)
    n = series_binop_grouped(left, dup_right, on=("domain",), strict=False).count()
    assert n == 2


def test_grouped_binop_group_right_mirrors(spark):
    """group="right" (PromQL group_right): the many side is the RIGHT,
    output carries the right's labels, operand order is preserved
    (value = left <op> right), and strictness guards the LEFT side."""
    import datetime

    import pytest

    from fischer_spark.operators.binop import series_binop_grouped

    t = datetime.datetime(2024, 1, 1)
    many = spark.createDataFrame(
        [
            ("a", "m", "x", t, 3.0),
            ("a", "m", None, t, 1.0),
            ("b", "m", "x", t, 5.0),
        ],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    one = spark.createDataFrame(
        [("a", t, 4.0), ("b", t, 5.0)],
        "domain string, bucket_ts timestamp, value double",
    )
    out = series_binop_grouped(
        one, many, op="div", on=("domain",), group="right"
    )
    rows = {(r["domain"], r["tag"]): r["value"] for r in out.collect()}
    # value = LEFT/RIGHT = aggregate/series (inverse of the group_left test)
    assert rows == {("a", "x"): 4.0 / 3.0, ("a", None): 4.0, ("b", "x"): 1.0}
    assert set(out.columns) == {"domain", "metric", "tag", "bucket_ts", "value"}

    # cardinality raise now fires on a duplicated LEFT ("one") side
    dup_one = spark.createDataFrame(
        [("a", t, 4.0), ("a", t, 9.0)],
        "domain string, bucket_ts timestamp, value double",
    )
    with pytest.raises(Exception, match="group_right"):
        series_binop_grouped(
            dup_one, many, on=("domain",), group="right"
        ).collect()
    with pytest.raises(ValueError, match="unknown group side"):
        series_binop_grouped(one, many, on=("domain",), group="outer")
