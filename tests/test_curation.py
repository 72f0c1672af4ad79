"""Corpus curation capstone (queries_webtext.curate_documents): every
verdict branch fires on a planted corpus, precedence is deterministic,
and verdicts are partitioning-invariant."""

from __future__ import annotations

import pytest


def _planted_docs(spark):
    # doc_ids chosen so none is % 97 == 0 except the explicit eval doc
    base_text = (
        "the quick brown fox jumps over a lazy dog and then the small "
        "red hen walks to town for grain with friends in every field "
        "under open skies during long summer days of quiet warm wind"
    )  # 33 distinct tokens, stopword-rich, > 20 tokens
    eval_text = (
        "alpha beta gamma delta epsilon zeta eta theta of the and to in "
        "is for on with iota kappa lambda mu nu xi omicron pi rho sigma"
    )
    contaminated = eval_text + " tau upsilon phi chi psi omega extra tail"
    rows = [
        (1, "en", base_text),                      # keep
        (2, "en", base_text),                      # exact_dup of 1
        (3, "en", None),                           # empty (NULL)
        (4, "en", "   "),                          # empty (whitespace)
        (5, "en", "only five tokens right here"),  # too_short
        (6, "en", " ".join(["spam"] * 40)),        # repetitive (dup ratio ~0.975)
        (7, "en", " ".join(f"w{i}" for i in range(40))),  # low_stopword (0 stops)
        (97, "en", eval_text),                     # eval_set (97 % 97 == 0)
        (9, "en", contaminated),                   # contaminated (shares 8-shingles)
        (10, "zh", "你好 世界 " * 20),               # CJK: exempt from stopword rule
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.fixture(scope="module")
def verdicts(spark):
    from fischer_spark.queries_webtext import curate_documents

    return {
        r["doc_id"]: r for r in curate_documents(_planted_docs(spark)).collect()
    }


def test_every_branch_fires(verdicts):
    expect = {
        1: "keep",
        2: "exact_dup",
        3: "empty",
        4: "empty",
        5: "too_short",
        6: "repetitive",
        7: "low_stopword",
        97: "eval_set",
        9: "contaminated",
    }
    for doc_id, reason in expect.items():
        assert verdicts[doc_id]["reason"] == reason, (doc_id, verdicts[doc_id])
        assert verdicts[doc_id]["keep"] == (reason == "keep")


def test_cjk_exempt_from_stopword_rule(verdicts):
    # repeated two-token text: dup_token_ratio is high, so the CJK doc
    # drops as repetitive — but NEVER as low_stopword (n_cjk > 0)
    assert verdicts[10]["reason"] == "repetitive"
    assert verdicts[10]["stopword_ratio"] == 0.0


def test_signal_columns(verdicts):
    assert verdicts[3]["n_tokens"] == 0 and verdicts[4]["n_tokens"] == 0
    assert verdicts[6]["dup_token_ratio"] == 1.0 - 1.0 / 40.0
    assert verdicts[9]["n_shared_shingles"] >= 1
    assert verdicts[97]["n_shared_shingles"] == 0  # eval docs never self-match


def test_partitioning_invariance(spark):
    from fischer_spark.queries_webtext import curate_documents
    from tests.conftest import assert_df_equal

    docs = _planted_docs(spark)
    assert_df_equal(curate_documents(docs), curate_documents(docs.repartition(7)))


# --------------------------------------------------------------------------
# chunk_documents (O117): context-window geometry, hand-computed.
# --------------------------------------------------------------------------

def _chunks(spark, texts, **kw):
    from fischer_spark.queries_webtext import chunk_documents

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    out = chunk_documents(df, **kw).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for v in by_doc.values():
        v.sort(key=lambda r: r["chunk_idx"])
    return by_doc


def test_chunk_geometry_small_doc_single_window(spark):
    c = _chunks(spark, ["a b c d e"], chunk_tokens=64, stride=48)[0]
    assert len(c) == 1
    assert (c[0]["tok_start"], c[0]["n_tokens_chunk"], c[0]["n_chunks"]) == (0, 5, 1)
    assert c[0]["chunk_text"] == "a b c d e"


def test_chunk_geometry_overlap_and_truncated_tail(spark):
    # 5 tokens, C=3, S=2 -> windows [0:3] and [2:5]; overlap token "t2".
    c = _chunks(spark, ["t0 t1 t2 t3 t4"], chunk_tokens=3, stride=2)[0]
    assert [(r["tok_start"], r["n_tokens_chunk"]) for r in c] == [(0, 3), (2, 3)]
    assert [r["chunk_text"] for r in c] == ["t0 t1 t2", "t2 t3 t4"]
    # 4 tokens, C=3, S=2 -> second window truncated to 2.
    c = _chunks(spark, ["t0 t1 t2 t3"], chunk_tokens=3, stride=2)[0]
    assert [(r["tok_start"], r["n_tokens_chunk"]) for r in c] == [(0, 3), (2, 2)]


def test_chunk_geometry_exact_boundary_and_blank(spark):
    # exactly C tokens -> one window; C+1 -> two; blank doc -> nothing.
    texts = [" ".join(f"w{i}" for i in range(3)),
             " ".join(f"w{i}" for i in range(4)),
             "   "]
    by = _chunks(spark, texts, chunk_tokens=3, stride=3)
    assert len(by[0]) == 1 and by[0][0]["n_tokens_chunk"] == 3
    assert [(r["tok_start"], r["n_tokens_chunk"]) for r in by[1]] == [(0, 3), (3, 1)]
    assert 2 not in by  # blank dropped
    # full coverage invariant: last window reaches n_tokens_doc exactly
    for doc in by.values():
        last = doc[-1]
        assert last["tok_start"] + last["n_tokens_chunk"] == last["n_tokens_doc"]


def test_chunk_rejects_bad_stride():
    import pytest

    from fischer_spark.queries_webtext import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(None, chunk_tokens=3, stride=4)


# --------------------------------------------------------------------------
# mixture_balance (O120): uniform downsample to the smallest stratum.
# --------------------------------------------------------------------------

def test_mixture_balance_uniform_keeps(spark):
    import os

    from fischer_spark.queries_webtext import mixture_balance_documents

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = mixture_balance_documents(spark, sf).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    m = min(len(v) for v in by_lang.values())
    for lang, rows in by_lang.items():
        kept = [r for r in rows if r["keep"] == 1]
        # every stratum keeps exactly min-stratum-size docs
        assert len(kept) == m, (lang, len(kept), m)
        assert all(r["m_target"] == m and r["n_stratum"] == len(rows) for r in rows)
        assert all(r["rn"] <= m for r in kept)
        # keep_rate is the exact ratio
        assert rows[0]["keep_rate"] == m / len(rows)


def test_mixture_balance_deterministic_across_partitionings(spark):
    import os

    from fischer_spark.queries_webtext import mixture_balance_documents

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    a = {(r["doc_id"], r["keep"]) for r in mixture_balance_documents(spark, sf).collect()}
    b = {
        (r["doc_id"], r["keep"])
        for r in mixture_balance_documents(spark, sf).repartition(7).collect()
    }
    assert a == b


# --------------------------------------------------------------------------
# boilerplate_share (O123): planted cross-document shingle overlap.
# --------------------------------------------------------------------------

def test_boilerplate_share_planted(spark, tmp_path):
    import os

    from fischer_spark.queries_webtext import boilerplate_share_documents

    footer = "copyright acme corp all rights reserved contact us now"  # 9 toks
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta " + footer),
        (2, "one two three four five six seven eight nine ten " + footer),
        (3, "unique words only here nothing shared at all whatsoever kappa"),
        (4, "short"),          # < 8 tokens: no shingles, no row
        (5, "   "),            # blank: dropped
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    # satisfy scan_testdata's directory contract
    out = {r["doc_id"]: r for r in
           boilerplate_share_documents(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3}
    # the 9-token footer contributes 9-8+1 = 2 footer-only 8-gram
    # shingles to each carrier; doc 3 shares nothing
    assert out[1]["n_boilerplate"] == 2 and out[2]["n_boilerplate"] == 2
    assert out[3]["n_boilerplate"] == 0 and out[3]["boilerplate_share"] == 0.0
    for d in (1, 2):
        r = out[d]
        assert r["boilerplate_share"] == r["n_boilerplate"] / r["n_shingles"]
