"""Generator invariants: determinism across parallelism, planted skew,
gaps, and the text == extract_text(html) byte-identity invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from fischer_spark.functions.text import extract_text, extract_text_bytes
from fischer_spark.sources.pages import synth_pages


def test_deterministic_across_parallelism(spark):
    a = synth_pages(spark, 5_000, seed=7).repartition(2)
    b = synth_pages(spark, 5_000, seed=7).repartition(13)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_zipf_skew_present(pages):
    counts = [r["count"] for r in pages.groupBy("domain").count().orderBy(F.desc("count")).take(2)]
    assert counts[0] > 2 * counts[1]  # hot domain is real


def test_text_byte_identity(pages):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    sample = pages.select("url", "html", "text").limit(500)
    recomputed = sample.withColumn("text2", extract_text("html"))
    assert recomputed.filter(F.col("text") != F.col("text2")).count() == 0
    # and python-side agreement (driver of the frozen spec)
    for r in sample.limit(20).collect():
        assert extract_text_bytes(bytes(r.html)) == r.text


def test_schema(pages):
    assert [f.name for f in pages.schema.fields[:5]] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
