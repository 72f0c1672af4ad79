"""O113 — unigram-LM log-probability signal: the cross-engine log10
bit-parity assumption PINNED, plus a hand-computed tiny-corpus check."""

from __future__ import annotations

import math
import struct

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"  # the driver's gate scale


def test_unigram_log10_bit_parity(spark):
    """The oracle's hash-safety rests on Spark's Math.log10 and DuckDB's
    std log10 agreeing BIT-FOR-BIT on every distinct count rational in
    the gate data (the fold handles summation order; this pins the
    transcendental).  If a platform/libm change ever breaks this, the
    query must move to rows-only — this test is the tripwire."""
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    duck = con.sql(r"""
      WITH toks AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
                    FROM documents WHERE trim(text) <> ''),
      cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
      tot AS (SELECT sum(c) AS s FROM cnt)
      SELECT DISTINCT c, CAST((SELECT s FROM tot) AS BIGINT) AS s,
             log10(CAST(c AS DOUBLE) / CAST((SELECT s FROM tot) AS DOUBLE)) AS lg
      FROM cnt ORDER BY c
    """).df()
    con.close()
    sdf = spark.createDataFrame(duck[["c", "s"]])
    sp = (
        sdf.select(
            "c",
            F.log10(F.col("c").cast("double") / F.col("s").cast("double")).alias("lg"),
        )
        .toPandas()
        .set_index("c")
        .lg
    )
    assert len(duck) > 5
    for c, d_lg in zip(duck.c, duck.lg):
        s_lg = sp.loc[c]
        assert struct.pack("<d", d_lg) == struct.pack("<d", float(s_lg)), (
            f"log10 bit divergence at count={c}: duck={d_lg!r} spark={s_lg!r}"
        )


def test_unigram_logprob_hand_computed(spark, tmp_path):
    """Tiny corpus with known counts: 'a a b' + 'b c'.
    Corpus counts: a=2, b=2, c=1, total=5."""
    from fischer_spark.queries import get_queries

    pdf = pd.DataFrame({"doc_id": [1, 2], "text": ["a a b", "b c"]})
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    out = {
        r["doc_id"]: r
        for r in get_queries()["unigram_logprob_documents"](
            spark, str(tmp_path)
        ).collect()
    }
    lg = lambda c: math.log10(c / 5)  # noqa: E731
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_logprob10"] == pytest.approx(
        (2 * lg(2) + lg(2)) / 3, abs=1e-12
    )
    assert out[2]["n_tokens"] == 2
    assert out[2]["mean_logprob10"] == pytest.approx((lg(2) + lg(1)) / 2, abs=1e-12)
    # doc 2 uses the rarer vocabulary -> lower (more negative) mean logprob
    assert out[2]["mean_logprob10"] < out[1]["mean_logprob10"]
