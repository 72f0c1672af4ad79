"""Round-2 hardening tests (VERDICT/ADVICE r1 items):

- query_range rejects steps no tier divides; serves key-encoded stores
  from the persisted key_dim table WITHOUT scanning the series table.
- refresh_tier rewrites only the touched buckets of a sparse delta.
- store.maybe_compact folds long snapshot chains on a policy.
- sessionize is deterministic under duplicate (user_id, ts) rows.
- lang-ID predicts zh/ja/ko from CJK script classes.
- parameterized MinHash: candidate recall vs exact Jaccard at two
  parameterizations; hot-bucket prune keeps it far from all-pairs.
- the job's default (unsalted) 1m rollup plans exactly one Exchange.
- fixed64 refuses to run with ANSI mode off.
"""

from __future__ import annotations

import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F

from fischer_spark.sources.storage import ParquetManifestStore


# ---------------------------------------------------------------------------
# query_range hardening
# ---------------------------------------------------------------------------

def _mini_store(spark, root, encode=False):
    from fischer_spark.operators.rollup import rollup_points
    from fischer_spark.operators.series import encode_series_keys

    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a.example", "crawl_rate", None, base + datetime.timedelta(minutes=i), float(i % 7 + 1))
        for i in range(600)
    ]
    pts = spark.createDataFrame(
        rows, "domain string, metric string, tag string, bucket_ts timestamp, value double"
    )
    store = ParquetManifestStore(spark, root)
    if encode:
        enc, dim = encode_series_keys(pts)
        store.append("rollup_1h", rollup_points(enc, "1h", impl="fixed64"))
        store.append("key_dim", dim)
    else:
        store.append("rollup_1h", rollup_points(pts, "1h"))
    return store


def test_query_range_rejects_non_tier_step(spark, tmp_path):
    from fischer_spark.api import query_range

    store = _mini_store(spark, str(tmp_path / "w"))
    for bad in (90, 45, 59, 61):
        with pytest.raises(ValueError, match="not a multiple"):
            query_range(store, "crawl_rate", "2024-01-01", "2024-01-02", step_s=bad)


def test_query_range_uses_persisted_key_dim_without_series_scan(spark, tmp_path):
    """A key-encoded store with a persisted key_dim serves query_range with
    NO read of the series table (the VERDICT r1 read-path flaw)."""
    from fischer_spark.api import query_range

    store = _mini_store(spark, str(tmp_path / "w"), encode=True)
    reads: list[str] = []
    orig = store.read
    store.read = lambda table, snapshot_id=None, **kw: (reads.append(table), orig(table, snapshot_id, **kw))[1]

    out = query_range(store, "crawl_rate", "2024-01-01", "2024-01-02", step_s=3600)
    assert out.count() == 10
    assert "series" not in reads
    assert "key_dim" in reads


def test_query_range_clear_error_when_no_dim(spark, tmp_path):
    from fischer_spark.api import query_range
    from fischer_spark.operators.rollup import rollup_points
    from fischer_spark.operators.series import encode_series_keys

    base = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [("a", "m", None, base, 1.0)],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    enc, _ = encode_series_keys(pts)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", rollup_points(enc, "1h"))
    with pytest.raises(ValueError, match="key_dim"):
        query_range(store, "m", "2024-01-01", "2024-01-02", step_s=3600)


# ---------------------------------------------------------------------------
# refresh_tier: O(touched), not O(span)
# ---------------------------------------------------------------------------

def test_refresh_tier_sparse_delta_rewrites_only_touched_buckets(spark, tmp_path):
    from fischer_spark.operators.rollup import refresh_tier, rollup_points

    base = datetime.datetime(2024, 1, 1)
    schema = "domain string, metric string, tag string, bucket_ts timestamp, value double"

    def pt(hour, minute, v):
        return ("a", "m", None, base + datetime.timedelta(hours=hour, minutes=minute), v)

    history = spark.createDataFrame([pt(h, 0, 1.0) for h in range(6)], schema)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1h", rollup_points(history, "1h"))
    before = {r["bucket_ts"]: r.asDict() for r in store.read("rollup_1h").collect()}

    # sparse delta: one late point in hour 0 and one in hour 5 — hours 1-4
    # must be untouched (not rewritten, not lost)
    delta = spark.createDataFrame([pt(0, 30, 3.0), pt(5, 30, 7.0)], schema)
    refresh_tier(store, "rollup_1h", "1h", delta)

    snaps = store.snapshots("rollup_1h")
    ow = [s for s in snaps if s["op"] == "overwrite_range"]
    assert len(ow) == 2, "sparse delta must commit one overwrite per contiguous run"
    spans = sorted((s["lo"], s["hi"]) for s in ow)
    assert spans[0][0].startswith("2024-01-01 00:00") and spans[0][1].startswith("2024-01-01 01:00")
    assert spans[1][0].startswith("2024-01-01 05:00") and spans[1][1].startswith("2024-01-01 06:00")

    after = {r["bucket_ts"]: r.asDict() for r in store.read("rollup_1h").collect()}
    assert set(after) == set(before)
    for h in range(1, 5):
        b = base + datetime.timedelta(hours=h)
        assert after[b] == before[b], f"untouched bucket {b} changed"
    assert after[base]["cnt"] == 2 and float(after[base]["sum"]) == 4.0
    b5 = base + datetime.timedelta(hours=5)
    assert after[b5]["cnt"] == 2 and float(after[b5]["sum"]) == 8.0


# ---------------------------------------------------------------------------
# compaction policy
# ---------------------------------------------------------------------------

def test_maybe_compact_policy(spark, tmp_path):
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    df = spark.range(5).select(F.col("id"), F.lit("x").alias("s"))
    for _ in range(4):
        store.append("t", df)
    assert store.maybe_compact("t", max_snapshots=8) is None  # under policy
    assert len(store.snapshots("t")) == 4
    snap = store.maybe_compact("t", max_snapshots=3)
    assert snap is not None
    assert len(store.snapshots("t")) == 1
    assert store.read("t").count() == 20  # folded content identical


# ---------------------------------------------------------------------------
# sessionize determinism under duplicate (user_id, ts)
# ---------------------------------------------------------------------------

def test_sessionize_duplicate_ts_deterministic(spark, tmp_path):
    from fischer_spark.queries_extended import sessionize_events

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, base, 7),                                  # session 1
        (2, base, 7),                                  # same ts — tie on (user, ts)
        (3, base + datetime.timedelta(minutes=10), 7),
        (4, base + datetime.timedelta(minutes=60), 7),  # gap > 30m → session 2
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    a = sessionize_events(spark, str(tmp_path)).orderBy("session_id").collect()
    b = sessionize_events(spark, str(tmp_path)).orderBy("session_id").collect()
    assert a == b
    assert [r["n_events"] for r in a] == [3, 1]
    assert a[0]["session_start"] == base
    assert a[0]["session_end"] == base + datetime.timedelta(minutes=10)


# ---------------------------------------------------------------------------
# CJK language-ID
# ---------------------------------------------------------------------------

def test_lang_id_cjk_scripts(spark, tmp_path):
    from fischer_spark.queries_webtext import lang_id_documents

    docs = [
        (1, "这是一个测试文档 包含很多中文字符 用于语言识别", "zh", "s", 0),
        (2, "これはテストです 日本語の文書を識別します", "ja", "s", 0),
        (3, "이것은 테스트 문서입니다 한국어 식별", "ko", "s", 0),
        (4, "the cat and the dog is in that house and it is the best", "en", "s", 0),
        (5, "le chat et la souris est dans les maisons des amis", "fr", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r for r in lang_id_documents(spark, str(tmp_path)).collect()}
    assert got[1]["lang_pred"] == "zh" and got[1]["n_han"] > 0
    assert got[2]["lang_pred"] == "ja" and got[2]["n_kana"] > 0
    assert got[3]["lang_pred"] == "ko" and got[3]["n_hangul"] > 0
    assert got[4]["lang_pred"] == "en"
    assert got[5]["lang_pred"] == "fr"


# ---------------------------------------------------------------------------
# parameterized production MinHash: recall vs exact Jaccard
# ---------------------------------------------------------------------------

def _minhash_corpus():
    """40 base docs of 60 words + a near-dup (3 words swapped, J≈0.90)
    for the first 10 — deterministic."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i:03d}" for i in range(400)]
    docs: dict[int, list[str]] = {}
    for i in range(40):
        docs[i] = list(rng.choice(vocab, size=60, replace=False))
    for i in range(10):
        nd = list(docs[i])
        for j in range(3):
            nd[j] = f"x{i:02d}{j}"  # replacement tokens outside vocab
        docs[100 + i] = nd
    return docs


def _exact_jaccard(docs):
    ids = sorted(docs)
    out = {}
    for i, a in enumerate(ids):
        sa = set(docs[a])
        for b in ids[i + 1 :]:
            sb = set(docs[b])
            out[(a, b)] = len(sa & sb) / len(sa | sb)
    return out


@pytest.mark.parametrize(
    "n_hashes,n_bands,min_recall",
    [
        # s-curve at J=0.9: width 4, 16 bands → P≈1-1e-7 per pair (demand all)
        (64, 16, 1.0),
        # width 8, 8 bands → P≈0.989 per pair, ~0.89 for all 10 planted
        # pairs — demand the per-pair rate, not a lucky draw
        (64, 8, 0.9),
    ],
)
def test_minhash_candidates_recall(spark, n_hashes, n_bands, min_recall):
    from fischer_spark.operators.dedup import minhash_candidates

    docs = _minhash_corpus()
    df = spark.createDataFrame(
        [(k, " ".join(v)) for k, v in docs.items()], "doc_id long, text string"
    )
    cands = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidates(
            df, n_hashes=n_hashes, n_bands=n_bands, seed=11
        ).collect()
    }
    jac = _exact_jaccard(docs)
    high = {p for p, j in jac.items() if j >= 0.85}
    assert high, "corpus must contain planted near-dups"
    recall = len(high & cands) / len(high)
    assert recall >= min_recall, f"missed near-dups: {sorted(high - cands)}"
    # and the candidate set is a bounded neighbor set, not all-pairs
    assert len(cands) < len(jac) / 4


def test_minhash_candidates_rejects_bad_bands(spark):
    from fischer_spark.operators.dedup import minhash_candidates

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="must divide"):
        minhash_candidates(df, n_hashes=64, n_bands=7)


# ---------------------------------------------------------------------------
# default 1m rollup plan: exactly one Exchange (unsalted policy)
# ---------------------------------------------------------------------------

def test_unsalted_1m_rollup_single_exchange(spark, tmp_path):
    from fischer_spark.operators.rollup import rollup_points

    base = datetime.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [("a", "m", None, base + datetime.timedelta(seconds=i), 1.0) for i in range(100)],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    pts.write.mode("overwrite").parquet(str(tmp_path / "pts.parquet"))
    src = spark.read.parquet(str(tmp_path / "pts.parquet"))
    plan = rollup_points(src, "1m")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------------------
# fixed64 requires ANSI
# ---------------------------------------------------------------------------

def test_fixed64_requires_ansi(spark):
    from fischer_spark.operators.rollup import rollup_points

    pts = spark.createDataFrame(
        [("a", "m", None, datetime.datetime(2024, 1, 1), 1.0)],
        "domain string, metric string, tag string, bucket_ts timestamp, value double",
    )
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        with pytest.raises(ValueError, match="ansi"):
            rollup_points(pts, "1m", impl="fixed64")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", "true")
    # and it works again with ANSI restored
    assert rollup_points(pts, "1m", impl="fixed64").count() == 1


# ---------------------------------------------------------------------------
# benchmark decontamination: planted overlap is found, clean docs are not
# ---------------------------------------------------------------------------

def test_contamination_check_planted(spark, tmp_path):
    from fischer_spark.queries_webtext import contamination_check_documents

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        # doc_id 0 ≡ 0 mod 97 → the eval/benchmark doc
        (0, bench_text, "en", "s", 0),
        # contaminated: contains the benchmark's 8-token windows verbatim
        (1, "intro words " + bench_text + " trailing words", "en", "s", 0),
        # clean: same vocabulary, different order (no shared 8-gram)
        (2, "kappa iota theta eta zeta epsilon delta gamma beta alpha", "en", "s", 0),
        # too short for any 8-gram
        (3, "alpha beta gamma", "en", "s", 0),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: r["n_shared_shingles"] for r in
           contamination_check_documents(spark, str(tmp_path)).collect()}
    # benchmark text has 10 tokens → 3 shingles of 8; doc 1 contains all 3
    assert got == {1: 3}


# ---------------------------------------------------------------------------
# cascade refresh: late data merged into every tier == full recompute
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("impl", ["decimal", "fixed64"])
def test_refresh_cascade_equals_full_recompute(spark, tmp_path, impl):
    from fischer_spark.operators.rollup import (
        refresh_cascade,
        rollup_points,
        rollup_states,
    )
    from tests.conftest import assert_df_equal

    base = datetime.datetime(2024, 1, 1)
    schema = "domain string, metric string, tag string, bucket_ts timestamp, value double"

    def pt(minutes, v):
        return ("a", "m", None, base + datetime.timedelta(minutes=minutes), v)

    history = spark.createDataFrame(
        [pt(m, float(m % 11 + 1)) for m in range(0, 3000, 3)], schema
    )
    late = spark.createDataFrame(
        [pt(7, 99.0), pt(1441, 3.5), pt(2999, 1.25)], schema  # spans all 3 days? (2 days + edges)
    )
    store = ParquetManifestStore(spark, str(tmp_path / f"w_{impl}"))
    m1 = rollup_points(history, "1m", impl)
    store.append("rollup_1m", m1)
    h1 = rollup_states(store.read("rollup_1m"), "1h")
    store.append("rollup_1h", h1)
    store.append("rollup_1d", rollup_states(store.read("rollup_1h"), "1d"))

    snaps = refresh_cascade(store, late, impl=impl)
    assert snaps["1m"] and snaps["1h"] and snaps["1d"]

    full = history.unionByName(late)
    want_1m = rollup_points(full, "1m", impl)
    want_1h = rollup_states(want_1m, "1h")
    want_1d = rollup_states(want_1h, "1d")
    assert_df_equal(store.read("rollup_1m"), want_1m)
    assert_df_equal(store.read("rollup_1h"), want_1h)
    assert_df_equal(store.read("rollup_1d"), want_1d)


def test_refresh_tier_scattered_delta_span_fallback(spark, tmp_path):
    """A delta fragmented into more contiguous runs than max_runs falls
    back to ONE span commit whose merge still equals a full recompute."""
    from fischer_spark.operators.rollup import refresh_tier, rollup_points
    from tests.conftest import assert_df_equal

    base = datetime.datetime(2024, 1, 1)
    schema = "domain string, metric string, tag string, bucket_ts timestamp, value double"

    def pt(minutes, v):
        return ("a", "m", None, base + datetime.timedelta(minutes=minutes), v)

    history = spark.createDataFrame([pt(m, 1.0) for m in range(0, 200, 2)], schema)
    store = ParquetManifestStore(spark, str(tmp_path / "w"))
    store.append("rollup_1m", rollup_points(history, "1m"))

    # every 4th minute touched → 50 isolated runs > max_runs=8
    late = spark.createDataFrame([pt(m, 5.0) for m in range(0, 200, 4)], schema)
    refresh_tier(store, "rollup_1m", "1m", late, max_runs=8)

    ow = [s for s in store.snapshots("rollup_1m") if s["op"] == "overwrite_range"]
    assert len(ow) == 1  # single span commit, not 50

    want = rollup_points(history.unionByName(late), "1m")
    assert_df_equal(store.read("rollup_1m"), want)
