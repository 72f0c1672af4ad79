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


def test_scan_pages_jsonl_modes(spark, tmp_path):
    """JSONL ingest: explicit schema (no inference pass), html cast to
    binary, and the three corrupt-line policies."""
    import pytest as _pytest

    from fischer_spark.sources.pages import scan_pages_jsonl

    p = tmp_path / "pages.jsonl"
    good = [
        '{"url":"https://a.example/1","warc_ts":"2024-01-01T00:00:07.179575",'
        '"html":"<html><body>x</body></html>","text":"x","lang":"en"}',
        '{"url":"https://b.example/2","warc_ts":"2024-01-02 10:00:00",'
        '"html":"<html></html>","text":"","lang":"fr"}',
    ]
    bad = ['{"url": "https://c.example/3", "warc_ts": NOT_JSON']
    p.write_text("\n".join(good + bad) + "\n")

    dropped = scan_pages_jsonl(spark, str(p), corrupt="drop")
    rows = dropped.orderBy("url").collect()
    assert [r["url"] for r in rows] == ["https://a.example/1", "https://b.example/2"]
    assert dict(dropped.dtypes)["html"] == "binary"
    assert bytes(rows[0]["html"]) == b"<html><body>x</body></html>"
    assert rows[0]["warc_ts"].microsecond == 179575

    kept = scan_pages_jsonl(spark, str(p), corrupt="keep")
    assert kept.count() == 3
    quarantined = kept.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert len(quarantined) == 1 and "NOT_JSON" in quarantined[0]["_corrupt_record"]

    with _pytest.raises(Exception, match="Malformed|FAILFAST"):
        scan_pages_jsonl(spark, str(p), corrupt="error").collect()

    with _pytest.raises(ValueError, match="choose drop"):
        scan_pages_jsonl(spark, str(p), corrupt="wat")
