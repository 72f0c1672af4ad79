"""URL canonicalization (functions/urls.py canonical_url)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fischer_spark.functions.urls import canonical_url

CASES = [
    # scheme/host case, default port, empty path
    ("HTTP://WWW.Example.COM", "http://www.example.com/"),
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    # fragment dropped
    ("http://a.com/p#section-2", "http://a.com/p"),
    # tracking params dropped, rest sorted
    (
        "http://a.com/p?utm_source=x&b=2&a=1&fbclid=abc",
        "http://a.com/p?a=1&b=2",
    ),
    ("http://a.com/p?utm_campaign=x&gclid=1", "http://a.com/p"),
    ("http://a.com/p?z=1&y=2&x=3", "http://a.com/p?x=3&y=2&z=1"),
    # path bytes preserved (no over-merging)
    ("http://a.com/P", "http://a.com/P"),
    ("http://a.com/p/", "http://a.com/p/"),
    # a param NAMED like a tracking prefix but different stays
    ("http://a.com/p?utm=1", "http://a.com/p?utm=1"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    for (src, want), g in zip(CASES, got):
        assert g == want, f"{src!r}: {g!r} != {want!r}"


def test_canonical_url_is_dedup_stable(spark):
    """The four spellings of one page collapse to ONE canonical key;
    a genuinely different page does not merge in."""
    urls = [
        "http://A.com/page?b=2&a=1",
        "HTTP://a.com:80/page?a=1&b=2",
        "http://a.com/page?a=1&utm_source=tw&b=2",
        "http://a.com/page?b=2&a=1#frag",
        "http://a.com/Page?b=2&a=1",  # different path case — different page
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    n = df.select(canonical_url("url").alias("c")).distinct().count()
    assert n == 2


def test_canonical_url_stays_in_codegen(spark):
    df = spark.createDataFrame([("http://a.com/p?x=1",)], "url string")
    plan = (
        df.select(canonical_url("url").alias("c"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


@pytest.mark.parametrize("bad", [None, "not a url", ""])
def test_canonical_url_malformed_is_null_not_crash(spark, bad):
    df = spark.createDataFrame([(bad,)], "url string")
    (r,) = df.select(canonical_url("url").alias("c")).collect()
    assert r["c"] is None or isinstance(r["c"], str)
