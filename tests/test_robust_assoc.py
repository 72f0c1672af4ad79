"""Spearman rank correlation (operators/overtime.py spearman_grouped),
Theil-Sen robust slope (operators/trend.py theil_sen_slope), cohort
retention and source entropy registry queries (O125-O128)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from fischer_spark.operators.overtime import spearman_grouped
from fischer_spark.operators.trend import theil_sen_slope


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h)


def _mk(spark, xs, ys):
    rows = [("a", _ts(i), int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(
        rows, "k: string, bucket_ts: timestamp, x: long, y: long"
    )


def test_spearman_monotone_transform_is_one(spark):
    # y = x^3 is a monotone transform: Pearson < 1 but Spearman == 1 exactly
    xs = [1, 2, 3, 4, 5, 6, 7, 8]
    ys = [x**3 for x in xs]
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert r["n"] == 8
    assert abs(r["rho"] - 1.0) < 1e-12


def test_spearman_reversed_is_minus_one(spark):
    xs = [1, 2, 3, 4, 5]
    ys = [50, 40, 30, 20, 10]
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert abs(r["rho"] + 1.0) < 1e-12


def test_spearman_matches_scipy_formula_no_ties(spark):
    # no ties -> rho == 1 - 6*sum(d^2)/(n(n^2-1)), the textbook closed form
    rng = np.random.default_rng(11)
    xs = rng.permutation(100).tolist()
    ys = rng.permutation(100).tolist()
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    rx = np.argsort(np.argsort(xs)) + 1
    ry = np.argsort(np.argsort(ys)) + 1
    d2 = float(((rx - ry) ** 2).sum())
    expect = 1.0 - 6.0 * d2 / (100 * (100**2 - 1))
    assert abs(r["rho"] - expect) < 1e-12


def test_spearman_outlier_bounded(spark):
    # one wild outlier: Pearson collapses toward it, Spearman moves by
    # at most one rank's worth
    xs = list(range(1, 21))
    ys = [2 * x for x in xs]
    ys[-1] = 10**9  # still the max -> identical ranks -> rho stays 1
    r = spearman_grouped(_mk(spark, xs, ys), ["k"], "x", "y").collect()[0]
    assert abs(r["rho"] - 1.0) < 1e-12


def test_spearman_null_on_degenerate(spark):
    r = spearman_grouped(_mk(spark, [5], [7]), ["k"], "x", "y").collect()[0]
    assert r["rho"] is None and r["n"] == 1


def _slope_df(spark, pts):
    rows = [("a", int(h), int(y)) for h, y in pts]
    return spark.createDataFrame(rows, "k: string, h: long, y: long")


def test_theil_sen_clean_line_exact(spark):
    # y = 7x + 3: every pairwise slope is exactly 7.0
    df = _slope_df(spark, [(h, 7 * h + 3) for h in range(24)])
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 7.0
    assert r["n_pairs"] == 24 * 23 // 2


def test_theil_sen_survives_corruption(spark):
    # 24 points on y=5x, then corrupt 6 of them wildly: least squares is
    # destroyed, Theil-Sen still returns exactly 5.0 (median pairwise
    # slope over the 18 clean points dominates: C(18,2)=153 of 276 pairs)
    pts = [(h, 5 * h) for h in range(24)]
    for h in (2, 7, 11, 15, 19, 23):
        pts[h] = (h, 10**7 + h)
    df = _slope_df(spark, pts)
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 5.0


def test_theil_sen_discrete_median_convention(spark):
    # 3 points -> 3 pairwise slopes; median = 2nd smallest = ceil(3/2)=2
    # slopes of (0,0),(1,10),(2,14): (0,1)=10, (1,2)=4, (0,2)=7 -> median 7
    df = _slope_df(spark, [(0, 0), (1, 10), (2, 14)])
    r = theil_sen_slope(df, ["k"]).collect()[0]
    assert r["ts_slope"] == 7.0 and r["n_pairs"] == 3


def test_cohort_retention_planted(spark):
    # u1 first on day0, active day0+day2; u2 first day0 only; u3 first day1,
    # active day1+day2
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES
    import os, tempfile

    d0 = dt.datetime(2024, 3, 1, 10)
    rows = [
        (1, d0, "u1", "view", 1.0, "{}"),
        (2, d0.replace(hour=12), "u2", "view", 1.0, "{}"),
        (3, d0 + dt.timedelta(days=2), "u1", "click", 1.0, "{}"),
        (4, d0 + dt.timedelta(days=1), "u3", "view", 1.0, "{}"),
        (5, d0 + dt.timedelta(days=2), "u3", "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: string, event_type: string,"
        " value: double, props: string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {
            (r["cohort_day"].day, r["day_offset"]): (
                r["active_users"], r["cohort_users"])
            for r in QUERIES["cohort_retention_events"](spark, td).collect()
        }
    assert out[(1, 0)] == (2, 2)   # day-1 cohort: u1,u2 both active day 0
    assert out[(1, 2)] == (1, 2)   # only u1 came back at offset 2
    assert out[(2, 0)] == (1, 1)   # day-2 cohort: u3
    assert out[(2, 1)] == (1, 1)
    assert (1, 1) not in out       # nobody from day-1 cohort active at +1


def test_source_entropy_bounds(spark):
    sf_dir = "/root/testdata/sf0.001"
    import fischer_spark.queries_webtext  # noqa: F401
    from fischer_spark.queries import QUERIES

    rows = QUERIES["source_entropy_documents"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log10(n_sources); top_share in (0, 1]
        assert -1e-12 <= r["entropy10"] <= math.log10(r["n_sources"]) + 1e-12
        assert 0.0 < r["top_share"] <= 1.0
        if r["n_sources"] == 1:
            assert r["entropy10"] == 0.0


# ---------------------------------------------------------------------------
# O129 ACF / O130 Kendall tau-b / O131 Fano factor
# ---------------------------------------------------------------------------

from fischer_spark.operators.overtime import acf_grouped, kendall_grouped


def test_acf_alternating_series(spark):
    # x alternates 10, 20: lag-1 pairs are perfectly anti-correlated,
    # lag-2 pairs perfectly correlated
    xs = [10 if i % 2 == 0 else 20 for i in range(40)]
    df = _mk(spark, xs, xs)  # y unused
    out = {r["lag"]: r for r in
           acf_grouped(df, ["k"], "x", [1, 2]).collect()}
    assert abs(out[1]["acf"] + 1.0) < 1e-12
    assert abs(out[2]["acf"] - 1.0) < 1e-12
    assert out[1]["n"] == 39 and out[2]["n"] == 38


def test_acf_constant_series_null(spark):
    df = _mk(spark, [7] * 10, [7] * 10)
    out = acf_grouped(df, ["k"], "x", [1]).collect()
    assert out[0]["acf"] is None and out[0]["n"] == 9


def test_acf_lag_beyond_series_null(spark):
    df = _mk(spark, [1, 2, 3], [0, 0, 0])
    out = {r["lag"]: r for r in acf_grouped(df, ["k"], "x", [1, 5]).collect()}
    assert out[5]["n"] == 0 and out[5]["acf"] is None
    assert out[1]["n"] == 2


def test_acf_matches_numpy(spark):
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1000, size=200).tolist()
    df = _mk(spark, xs, xs)
    out = {r["lag"]: r["acf"] for r in
           acf_grouped(df, ["k"], "x", [1, 7]).collect()}
    for k in (1, 7):
        a = np.array(xs[k:], dtype=float)
        b = np.array(xs[:-k], dtype=float)
        expect = np.corrcoef(a, b)[0, 1]
        assert abs(out[k] - expect) < 1e-9


def test_kendall_perfect_and_reversed(spark):
    xs = [1, 2, 3, 4, 5, 6]
    r = kendall_grouped(_mk(spark, xs, [x * 3 for x in xs]),
                        ["k"], "x", "y").collect()[0]
    assert r["nc"] == 15 and r["nd"] == 0 and abs(r["tau_b"] - 1.0) < 1e-12
    r = kendall_grouped(_mk(spark, xs, [-x for x in xs]),
                        ["k"], "x", "y").collect()[0]
    assert r["nd"] == 15 and abs(r["tau_b"] + 1.0) < 1e-12


def test_kendall_tie_correction_hand_computed(spark):
    # x = [1, 1, 2], y = [5, 6, 7]: pairs (0,1): dx=0 -> tie_x;
    # (0,2): concordant; (1,2): concordant.
    # n0=3, nc=2, nd=0, n1=1, n2=0 -> tau_b = 2 / sqrt(2*3) = 0.8164965...
    r = kendall_grouped(_mk(spark, [1, 1, 2], [5, 6, 7]),
                        ["k"], "x", "y").collect()[0]
    assert (r["n0"], r["nc"], r["nd"], r["n1"], r["n2"]) == (3, 2, 0, 1, 0)
    assert abs(r["tau_b"] - 2.0 / math.sqrt(6.0)) < 1e-12


def test_kendall_all_tied_null(spark):
    r = kendall_grouped(_mk(spark, [4, 4, 4], [1, 2, 3]),
                        ["k"], "x", "y").collect()[0]
    assert r["tau_b"] is None and r["n1"] == 3


def test_fano_hand_computed(spark):
    # hourly counts [2, 6]: mean 4, sample var 8 -> fano = 2.0 exactly;
    # constant [4,4,4]: var 0 -> fano 0.0
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES
    import os, tempfile

    d0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for h, c in [(0, 2), (1, 6)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(hours=h, minutes=eid % 60),
                         f"u{eid}", "view", 1.0, "{}"))
    for h, c in [(0, 4), (1, 4), (2, 4)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(hours=h, minutes=eid % 60),
                         f"u{eid}", "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: string, event_type: string,"
        " value: double, props: string",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        out = {r["event_type"]: r
               for r in QUERIES["fano_daily_events"](spark, td).collect()}
    assert out["view"]["fano"] == 2.0 and out["view"]["total_events"] == 8
    assert out["click"]["fano"] == 0.0 and out["click"]["n"] == 3


# ---------------------------------------------------------------------------
# O132 seasonal strength / O133 inter-arrival / O134 vocab uniqueness
# ---------------------------------------------------------------------------

import os
import tempfile


def _events_parquet(spark, rows):
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: string, event_type: string,"
        " value: double, props: string",
    )
    td = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(td, "events.parquet"))
    return td


def test_seasonal_strength_extremes(spark):
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES

    d0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # 'pure': count depends ONLY on hour-of-day (h+1 events at hour h,
    # identical across 3 days) -> eta2 == 1
    for day in range(3):
        for h in range(4):
            for _ in range(h + 1):
                eid += 1
                rows.append((eid, d0 + dt.timedelta(days=day, hours=h,
                                                    seconds=eid % 60),
                             f"u{eid}", "pure", 1.0, "{}"))
    # 'none': hod means all equal (2 then 4 alternating BY DAY, same for
    # every hod) -> between-hod variance 0 -> eta2 == 0
    for day in range(2):
        for h in range(4):
            for _ in range(2 if day == 0 else 4):
                eid += 1
                rows.append((eid, d0 + dt.timedelta(days=day, hours=h,
                                                    seconds=eid % 60),
                             f"u{eid}", "none", 1.0, "{}"))
    # 'flat': constant count 3 everywhere -> SST == 0 -> NULL
    for day in range(2):
        for h in range(3):
            for _ in range(3):
                eid += 1
                rows.append((eid, d0 + dt.timedelta(days=day, hours=h,
                                                    seconds=eid % 60),
                             f"u{eid}", "flat", 1.0, "{}"))
    td = _events_parquet(spark, rows)
    out = {r["event_type"]: r
           for r in QUERIES["seasonal_strength_events"](spark, td).collect()}
    assert abs(out["pure"]["eta2"] - 1.0) < 1e-12
    assert abs(out["none"]["eta2"]) < 1e-12
    assert out["flat"]["eta2"] is None


def test_interarrival_hand_computed(spark):
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES

    d0 = dt.datetime(2024, 3, 1)
    # gaps (seconds): 10, 30, 20, 40  -> sorted [10,20,30,40],
    # n=4 -> rn ceil(4/2)=2 -> median 20s; min 10s; max 40s
    offs = [0, 10, 40, 60, 100]
    rows = [(i + 1, d0 + dt.timedelta(seconds=o), f"u{i}", "view", 1.0, "{}")
            for i, o in enumerate(offs)]
    td = _events_parquet(spark, rows)
    r = QUERIES["interarrival_events"](spark, td).collect()[0]
    assert r["n_gaps"] == 4
    assert r["median_gap_us"] == 20_000_000
    assert r["min_gap_us"] == 10_000_000
    assert r["max_gap_us"] == 40_000_000


def test_vocab_uniqueness_planted(spark):
    import fischer_spark.queries_webtext  # noqa: F401
    from fischer_spark.queries import QUERIES

    rows = [
        (1, "the cat sat", "en", "srcA", 11),
        (2, "the dog sat", "en", "srcA", 11),
        (3, "the qwyjibo flurble", "en", "srcB", 19),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long")
    td = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
    out = {r["source"]: r
           for r in QUERIES["vocab_uniqueness_sources"](spark, td).collect()}
    # srcA vocab: {the, cat, sat, dog} — 'the' shared with srcB
    assert out["srcA"]["n_distinct_tokens"] == 4
    assert out["srcA"]["n_unique_tokens"] == 3
    assert out["srcA"]["unique_ratio"] == 0.75
    # srcB vocab: {the, qwyjibo, flurble}
    assert out["srcB"]["n_distinct_tokens"] == 3
    assert out["srcB"]["n_unique_tokens"] == 2


# ---------------------------------------------------------------------------
# O135 Gini user concentration / O136 Zipf slope / O137 click->purchase CCF
# ---------------------------------------------------------------------------


def test_gini_hand_computed(spark):
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES

    d0 = dt.datetime(2024, 3, 1)
    rows, eid = [], 0
    # 'eq': 3 users x 2 events -> gini == 0
    for u in range(3):
        for _ in range(2):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(seconds=eid), f"u{u}",
                         "eq", 1.0, "{}"))
    # 'whale': counts [1, 3] sorted asc -> n=2, sx=4, sum(i*c)=1+6=7,
    # G = (14-12)/8 = 0.25 exactly
    for u, c in [(0, 1), (1, 3)]:
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(seconds=eid), f"w{u}",
                         "whale", 1.0, "{}"))
    # 'solo': one user -> NULL
    eid += 1
    rows.append((eid, d0 + dt.timedelta(seconds=eid), "s0", "solo", 1.0, "{}"))
    td = _events_parquet(spark, rows)
    out = {r["event_type"]: r
           for r in QUERIES["gini_user_concentration_events"](spark, td)
           .collect()}
    assert out["eq"]["gini"] == 0.0 and out["eq"]["n_users"] == 3
    assert out["whale"]["gini"] == 0.25 and out["whale"]["n_events"] == 4
    assert out["solo"]["gini"] is None


def test_ccf_planted_shift(spark):
    import fischer_spark.queries_extended  # noqa: F401
    from fischer_spark.queries import QUERIES

    d0 = dt.datetime(2024, 3, 1)
    clicks = [1, 3, 2, 5]           # hourly click counts at hours 0..3
    rows, eid = [], 0
    for h, c in enumerate(clicks):
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(hours=h, seconds=eid % 60),
                         f"u{eid}", "click", 1.0, "{}"))
    # purchases = the click series shifted one hour later -> CCF peaks
    # EXACTLY at lag 1
    for h, c in enumerate(clicks):
        for _ in range(c):
            eid += 1
            rows.append((eid, d0 + dt.timedelta(hours=h + 1,
                                                seconds=eid % 60),
                         f"u{eid}", "purchase", 1.0, "{}"))
    td = _events_parquet(spark, rows)
    out = {r["lag_h"]: r
           for r in QUERIES["ccf_click_purchase_events"](spark, td).collect()}
    assert out[1]["n"] == 4 and abs(out[1]["r"] - 1.0) < 1e-12
    assert out[0]["n"] == 3 and out[0]["r"] < 0.99  # misaligned overlap
    assert 24 not in out  # no co-observed pairs that far out


def test_zipf_slope_planted(spark):
    import fischer_spark.queries_webtext  # noqa: F401
    from fischer_spark.queries import QUERIES

    rows = [
        # counts aa=4, bb=2 -> ranks 1,2; slope = log10(2/4)/log10(2) = -1
        (1, "aa aa aa aa bb bb", "en", "srcA", 17),
        # single distinct token -> n_ranks == 1 -> NULL slope
        (2, "zz zz zz", "en", "srcB", 8),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long")
    td = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(td, "documents.parquet"))
    out = {r["source"]: r
           for r in QUERIES["zipf_slope_sources"](spark, td).collect()}
    assert out["srcA"]["n_ranks"] == 2
    assert abs(out["srcA"]["zipf_slope"] + 1.0) < 1e-9
    assert out["srcB"]["n_ranks"] == 1 and out["srcB"]["zipf_slope"] is None


def test_knn_label_purity_planted(spark):
    import fischer_spark.queries_webtext  # noqa: F401
    from fischer_spark.queries import QUERIES

    rows = [
        # coherent cluster A
        (0, [1.00, 0.00], "A"),
        (1, [0.99, 0.01], "A"),
        # coherent cluster B
        (2, [0.00, 1.00], "B"),
        (3, [0.01, 0.99], "B"),
        # traitor: labeled A but sits EXACTLY on v2's direction
        (4, [0.00, 1.00], "A"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<float>, label: string")
    td = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(td, "embeddings.parquet"))
    out = {r["label"]: r
           for r in QUERIES["knn_label_purity_embeddings"](spark, td)
           .collect()}
    # A probes {0,1,4}: 0<->1 agree; 4's NN is v2 (cos 1.0, B) -> 2/3
    assert out["A"]["n_probes"] == 3 and out["A"]["n_agree"] == 2
    assert abs(out["A"]["purity"] - 2 / 3) < 1e-12
    # B probes {2,3}: v2's NN is the traitor v4 (cos 1.0, A) -> miss;
    # v3 ties v2/v4 on cos and the vec_id tiebreak picks v2 (B) -> hit
    assert out["B"]["n_probes"] == 2 and out["B"]["n_agree"] == 1
    assert out["B"]["purity"] == 0.5
