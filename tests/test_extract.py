"""M2 — HTML extraction golden-fixture parity (SURVEY.md §5.1).

The goldens in tests/fixtures/html/ pin extract_text spec v1.  Any change
to fischer_spark/functions/text.py MUST regenerate them in the same commit
— that is the engine's "byte-identical per url" parity surface
(BASELINE.json input_hint) under self-parity rules (SURVEY.md §0.3).
"""

from __future__ import annotations

import pathlib

import pytest
from pyspark.sql import functions as F

from fischer_spark.functions.text import extract_text, extract_text_bytes

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "html"
CASES = sorted(p.stem for p in FIXDIR.glob("*.html"))


@pytest.mark.parametrize("case", CASES)
def test_golden_python(case):
    raw = (FIXDIR / f"{case}.html").read_bytes()
    want = (FIXDIR / f"{case}.txt").read_bytes().decode("utf-8")
    assert extract_text_bytes(raw) == want


def test_golden_spark(spark):
    rows = [
        (c, bytearray((FIXDIR / f"{c}.html").read_bytes()))
        for c in CASES
    ]
    df = spark.createDataFrame(rows, "case string, html binary")
    got = {
        r.case: r.text
        for r in df.withColumn("text", extract_text("html")).collect()
    }
    for c in CASES:
        want = (FIXDIR / f"{c}.txt").read_bytes().decode("utf-8")
        assert got[c] == want, f"case {c}: {got[c]!r} != {want!r}"


def test_null_passthrough(spark):
    df = spark.createDataFrame([(1, None)], "id int, html binary")
    assert df.withColumn("t", extract_text("html")).collect()[0].t is None
