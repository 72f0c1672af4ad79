"""PromQL label_replace / label_join (functions/labels.py): anchored
full-match semantics, capture expansion, no-match-unchanged rule,
NULL-skipping join — all as pure codegen projections."""

from __future__ import annotations


def test_label_replace_semantics(spark):
    from fischer_spark.functions.labels import label_replace

    df = spark.createDataFrame(
        [("clicks", "old"), ("click", "old"), (None, "old")],
        "domain string, family string",
    )
    out = {r["domain"]: r["family"]
           for r in label_replace(df, "family", "$1_ui", "domain",
                                  "(click|view)").collect()}
    # anchored: "clicks" does NOT match "(click|view)"; no match -> prior
    # value kept; NULL src never matches
    assert out == {"clicks": "old", "click": "click_ui", None: "old"}

    # absent dst column: created, NULL where unmatched
    df2 = spark.createDataFrame([("view",), ("error",)], "domain string")
    out2 = {r["domain"]: r["family"]
            for r in label_replace(df2, "family", "$1_ui", "domain",
                                   "(click|view)").collect()}
    assert out2 == {"view": "view_ui", "error": None}


def test_label_join_skips_nulls(spark):
    from fischer_spark.functions.labels import label_join

    df = spark.createDataFrame(
        [("a", "b", "c"), ("a", None, "c")],
        "x string, y string, z string",
    )
    out = sorted(r["j"] for r in label_join(df, "j", ":", "x", "y", "z").collect())
    assert out == ["a:b:c", "a:c"]


def test_label_ops_stay_in_codegen(spark):
    """Both ops are row-local projections: the plan over a plain scan
    has no Exchange and stays in one WholeStageCodegen span."""
    import contextlib
    import io

    from fischer_spark.functions.labels import label_join, label_replace

    df = spark.range(10).selectExpr("CAST(id AS STRING) AS domain")
    out = label_join(
        label_replace(df, "family", "$1_ui", "domain", "(1|2)"),
        "joined", ":", "domain", "family",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
