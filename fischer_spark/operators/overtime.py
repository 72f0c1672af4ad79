"""PromQL ``*_over_time`` range functions along a series (O112).

``quantile_over_time(q, v[w])`` — the exact φ-quantile of the trailing
``w`` buckets per (series, bucket) — and ``mad_over_time`` (Prometheus'
experimental median-absolute-deviation) share one mechanism: a trailing
ROWS window collects the frame into an array, ``array_sort`` orders it,
and the rank-lerp convention from quantile_exact_1h_events
(``lo + (hi - lo) * (k - floor(k))``, ``k = (n-1)·q``) interpolates.
Everything stays JVM-side (collect_list / array_sort / get are codegen
expressions — no Arrow hop, unlike the smoothing kernels which genuinely
need sequential state).

Scale shape: ONE Exchange on the series key + one in-partition sort —
identical to the z-score detector.  The array is frame-sized (w buckets,
a constant), so memory per row is O(w), independent of series length;
at the 100 TB design point these run on TIER rows (1h: 8.8k rows per
series-year), never raw points.

Hash-safety: run on exact-decimal bucket means (the holt_exact
convention) and the sorted frame is bit-identical cross-engine; the
lerp expression tree is spelled identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["corr_over_time", "frame_quantile", "mad_over_time", "quantile_over_time", "spearman_grouped", "acf_grouped", "kendall_grouped"]


def frame_quantile(arr: Column, q: float) -> Column:
    """Exact rank-lerp quantile of a SORTED array column: with
    ``k = (size-1)·q``, returns ``arr[floor(k)] + (arr[ceil(k)] -
    arr[floor(k)]) · (k - floor(k))`` (0-based).  The identical
    expression evaluates in DuckDB as ``l[floor(k)+1] + (l[ceil(k)+1] -
    l[floor(k)+1]) * (k - floor(k))`` (1-based lists)."""
    k = (F.size(arr) - F.lit(1)).cast("double") * F.lit(q)
    lo = F.get(arr, F.floor(k).cast("int"))
    hi = F.get(arr, F.ceil(k).cast("int"))
    return lo + (hi - lo) * (k - F.floor(k))


def quantile_over_time(
    df: DataFrame,
    keys: list[str],
    qs: dict[str, float],
    w: int,
    ts_col: str = "bucket_ts",
    val_col: str = "value",
) -> DataFrame:
    """One output row per input row, adding ``n`` (frame size) and one
    exact trailing-window quantile column per ``qs`` entry
    (``{"p90": 0.9}`` → column ``p90``).  NULL samples are dropped first
    (PromQL range vectors never contain staleness markers)."""
    clean = df.na.drop(subset=[val_col])
    win = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col(val_col)).over(win))
    out = clean.withColumn("_arr", arr)
    cols = [*keys, ts_col, val_col, F.size("_arr").cast("long").alias("n")]
    cols += [frame_quantile(F.col("_arr"), q).alias(name) for name, q in qs.items()]
    return out.select(*cols)


def mad_over_time(
    df: DataFrame,
    keys: list[str],
    w: int,
    ts_col: str = "bucket_ts",
    val_col: str = "value",
) -> DataFrame:
    """Trailing-window median absolute deviation per (series, bucket):
    ``median(|x_i - median(frame)|)`` with both medians the exact
    rank-lerp q=0.5 — the robust dispersion PromQL exposes as
    ``mad_over_time`` (and the detector family's MAD, windowed along
    time instead of across a seasonal slot).  Same single-Exchange
    shape; the deviation array is rebuilt frame-side with transform()
    (still codegen), so no second window pass is needed."""
    clean = df.na.drop(subset=[val_col])
    win = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    out = clean.withColumn(
        "_arr", F.array_sort(F.collect_list(F.col(val_col)).over(win))
    )
    med = frame_quantile(F.col("_arr"), 0.5)
    out = out.withColumn("_med", med)
    dev = F.array_sort(
        F.transform(F.col("_arr"), lambda x: F.abs(x - F.col("_med")))
    )
    return out.select(
        *keys,
        ts_col,
        val_col,
        F.size("_arr").cast("long").alias("n"),
        F.col("_med").alias("med"),
        frame_quantile(dev, 0.5).alias("mad"),
    )


def corr_over_time(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    w: int,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Trailing-window Pearson correlation between two aligned series
    per key — the windowed complement of the global cross-family
    correlation (corr_count_value_events): does the co-movement between
    two metrics HOLD right now, not merely on average over the corpus.

    Exactness contract: ``x_col``/``y_col`` must be integer-valued
    (counts, cents) — the five windowed moments Σx, Σy, Σx², Σy², Σxy
    then accumulate as exact BIGINTs (order-free under any frame
    evaluation), and

        r = (W·Σxy − Σx·Σy)
            / (sqrt(W·Σx² − (Σx)²) · sqrt(W·Σy² − (Σy)²))

    is computed integer-side except the final division and two
    correctly-rounded sqrts — bit-exact against a SQL oracle replaying
    the same tree.  NULL where either variance term is zero (constant
    window) — no score is honest there.

    Scale shape: ONE Exchange on the series key + an in-partition sort;
    all five moments ride the same trailing ROWS frame (single Window
    node), O(1) state per row."""
    win = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    n = F.count(F.lit(1)).over(win)
    sx = F.sum(x).over(win)
    sy = F.sum(y).over(win)
    sxx = F.sum(x * x).over(win)
    syy = F.sum(y * y).over(win)
    sxy = F.sum(x * y).over(win)
    out = df.select(
        *keys,
        ts_col,
        x_col,
        y_col,
        n.cast("long").alias("n"),
        (n * sxy - sx * sy).alias("_num"),
        (n * sxx - sx * sx).alias("_dx"),
        (n * syy - sy * sy).alias("_dy"),
    )
    r = F.col("_num").cast("double") / (
        F.sqrt(F.col("_dx").cast("double")) * F.sqrt(F.col("_dy").cast("double"))
    )
    return out.select(
        *keys,
        ts_col,
        x_col,
        y_col,
        "n",
        F.when((F.col("_dx") > 0) & (F.col("_dy") > 0), r).alias("corr"),
    )


def spearman_grouped(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Spearman rank correlation between two aligned series per group
    (O125) — the robust complement of ``corr_over_time``: monotone
    co-movement, immune to outliers and to any monotone rescaling of
    either metric (a single spiky hour dominates Pearson; it moves
    Spearman by at most one rank).

    Rank convention: ``row_number`` ordered by ``(value, ts_col)`` —
    competition ranks with a DETERMINISTIC total order (the timestamp
    tie-break), so both engines assign the identical permutation of
    1..n and every downstream moment is an exact BIGINT.  This is the
    standard tie-break-by-time spelling (ties get distinct adjacent
    ranks rather than fractional mid-ranks — documented divergence from
    the fractional-tie textbook form, chosen for cross-engine
    exactness; on continuous-valued buckets ties are measure-zero).

    rho is then Pearson over the two integer rank vectors with the same
    pinned expression tree as ``corr_over_time``:

        rho = (n·Σxy − Σx·Σy)
              / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))

    — exact integer numerators, two correctly-rounded sqrts, one
    division.  NULL when either rank variance is zero (n ≤ 1).

    Scale shape: one Exchange on ``keys`` feeds BOTH rank windows and
    the final aggregate (same partitioning reused across stages — AQE
    collapses them onto one shuffle), state O(1) per row; group size is
    the bucket count per key (24 for daily-over-hourly), a constant."""
    wx = Window.partitionBy(*keys).orderBy(x_col, ts_col)
    wy = Window.partitionBy(*keys).orderBy(y_col, ts_col)
    ranked = df.select(
        *keys,
        F.row_number().over(wx).cast("long").alias("_rx"),
        F.row_number().over(wy).cast("long").alias("_ry"),
    )
    rx, ry = F.col("_rx"), F.col("_ry")
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(rx).alias("_sx"),
        F.sum(ry).alias("_sy"),
        F.sum(rx * rx).alias("_sxx"),
        F.sum(ry * ry).alias("_syy"),
        F.sum(rx * ry).alias("_sxy"),
    )
    n = F.col("n")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    dx = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    rho = num.cast("double") / (
        F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))
    )
    return agg.select(
        *keys,
        "n",
        F.when((dx > 0) & (dy > 0), rho).alias("rho"),
    )


def acf_grouped(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    lags: list[int],
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Autocorrelation function per series (O129): Pearson r between
    x_t and x_{t−k} for each requested lag k over the observed bucket
    sequence — "is this series periodic, and at what period?" (a daily
    cycle shows as a peak at lag 24 on hourly buckets).

    Lag convention: k POSITIONS back in the observed, ordered bucket
    sequence (on gap-free tiers — the design-point input — positions
    == time steps; on gappy series run gap-fill first, documented).

    Exactness contract: integer ``x_col`` ⇒ per-lag moments over the
    overlapping range (n, Σa, Σb, Σa², Σb², Σab) accumulate as exact
    BIGINTs via conditional sums, and each r_k is the pinned two-sqrt
    expression — bit-exact cross-engine.  NULL where the overlap is
    degenerate (either side constant, or n ≤ 1).

    Scale shape: ONE Exchange on the series key feeds one Window node
    (all lag columns share the single in-partition sort) and the final
    aggregate; output long form via an exploded literal struct array —
    all codegen, O(|lags|) state per row."""
    win = Window.partitionBy(*keys).orderBy(ts_col)
    x = F.col(x_col).cast("long")
    lagged = df.select(
        *keys,
        x.alias("_x"),
        *[F.lag(x, k).over(win).alias(f"_l{k}") for k in lags],
    )
    aggs = []
    for k in lags:
        lk = F.col(f"_l{k}")
        present = lk.isNotNull()
        a = F.when(present, F.col("_x"))
        aggs += [
            F.count(lk).alias(f"_n{k}"),
            F.sum(a).alias(f"_sa{k}"),
            F.sum(lk).alias(f"_sb{k}"),
            F.sum(a * F.col("_x")).alias(f"_saa{k}"),
            F.sum(lk * lk).alias(f"_sbb{k}"),
            F.sum(a * lk).alias(f"_sab{k}"),
        ]
    g = lagged.groupBy(*keys).agg(*aggs)

    def r_k(k: int):
        n = F.col(f"_n{k}")
        sa, sb = F.col(f"_sa{k}"), F.col(f"_sb{k}")
        num = n * F.col(f"_sab{k}") - sa * sb
        da = n * F.col(f"_saa{k}") - sa * sa
        db = n * F.col(f"_sbb{k}") - sb * sb
        r = num.cast("double") / (
            F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))
        )
        return F.struct(
            F.lit(k).cast("long").alias("lag"),
            n.cast("long").alias("n"),
            F.when((da > 0) & (db > 0), r).alias("acf"),
        )

    return g.select(
        *keys, F.explode(F.array(*[r_k(k) for k in lags])).alias("_s")
    ).select(*keys, "_s.lag", "_s.n", "_s.acf")


def kendall_grouped(
    df: DataFrame,
    keys: list[str],
    x_col: str,
    y_col: str,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Kendall tau-b rank correlation per group (O130) — the
    concordance member of the association family: the probability-
    scaled excess of concordant over discordant pairs, tie-corrected.
    Where Spearman (rho) weights by rank DISTANCE, tau counts rank
    AGREEMENTS — more robust still, and its pair counts are pure
    integers:

        tau_b = (nc − nd) / sqrt((n0 − n1)(n0 − n2))

    with n0 = n(n−1)/2, n1 = #pairs tied in x, n2 = #pairs tied in y —
    every count an exact BIGINT from ONE pair pass; the only float ops
    are the two correctly-rounded sqrts and one division (pinned).
    NULL when either sqrt argument is zero (all-tied side).

    Scale shape: the theil_sen move — an intra-group self-equi-join on
    ``keys`` (pairs never cross partitions, O(w²) bounded by the
    per-group bucket count) + one partial-aggregated groupBy.  All
    codegen."""
    a = df.select(
        *keys,
        F.col(ts_col).alias("_ta"),
        F.col(x_col).cast("long").alias("_xa"),
        F.col(y_col).cast("long").alias("_ya"),
    )
    b = df.select(
        *keys,
        F.col(ts_col).alias("_tb"),
        F.col(x_col).cast("long").alias("_xb"),
        F.col(y_col).cast("long").alias("_yb"),
    )
    pairs = a.join(b, keys).filter(F.col("_ta") < F.col("_tb"))
    dx = F.col("_xb") - F.col("_xa")
    dy = F.col("_yb") - F.col("_ya")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    g = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        one((dx > 0) & (dy > 0) | (dx < 0) & (dy < 0)).cast("long").alias("nc"),
        one((dx > 0) & (dy < 0) | (dx < 0) & (dy > 0)).cast("long").alias("nd"),
        one(dx == 0).cast("long").alias("n1"),
        one(dy == 0).cast("long").alias("n2"),
    )
    da = F.col("n0") - F.col("n1")
    db = F.col("n0") - F.col("n2")
    tau = (F.col("nc") - F.col("nd")).cast("double") / (
        F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))
    )
    return g.select(
        *keys,
        "n0",
        "nc",
        "nd",
        "n1",
        "n2",
        F.when((da > 0) & (db > 0), tau).alias("tau_b"),
    )
