"""Extended operator surface: simhash dedup, sessionization, interval
overlap consensus (O16), JSON props extraction (O12), approx-distinct.

Same hash-safety rules as queries.py. The simhash here is the
SQL-expressible 16-bit oracle form (bit votes from md5 nibbles); the
production 64-bit numpy form lives in operators/dedup.py (rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fischer_spark.queries import register
from fischer_spark.sources.testdata import scan_testdata

_TOK_SPARK = "split(trim(lower(text)), '\\\\s+')"
_TOK_DUCK = "regexp_split_to_array(trim(lower(text)), '\\s+')"


# --------------------------------------------------------------------------
# O12 — JSON scalar surface on events.props
# --------------------------------------------------------------------------

@register(
    "json_props_events",
    """
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
  FROM events GROUP BY 1
""",
)
def json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --------------------------------------------------------------------------
# sessionization: 30-minute inactivity gaps per user (gaps-and-islands)
# --------------------------------------------------------------------------

@register(
    "sessionize_events",
    """
  WITH e AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ),
  s AS (
    SELECT user_id, ts,
           CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT)
             AS session_id
    FROM e
  )
  SELECT user_id, session_id,
         min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events
  FROM s GROUP BY 1, 2
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    e = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    # Total order: (ts, event_id) — ts alone is not a total order (duplicate
    # (user_id, ts) rows would make session_id partition-order-dependent).
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    s = e.withColumn("session_id", F.sum("new_session").over(wc))
    return s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --------------------------------------------------------------------------
# O16 — interval overlap join: z-score ∩ seasonal consensus intervals.
# Theta join pre-bucketed by key (small interval sets), overlap predicate
# a.start <= b.end AND b.start <= a.end.
# --------------------------------------------------------------------------

_IVALS_CTE = """
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  st AS (
    SELECT domain, bucket_ts, value,
           count(value) OVER w AS n,
           CAST(sum(CAST(value AS DECIMAL(38,18))) OVER w AS DOUBLE) AS s,
           CAST(sum(CAST(value * value AS DECIMAL(38,12))) OVER w AS DOUBLE) AS sq
    FROM pts
    WINDOW w AS (PARTITION BY domain ORDER BY bucket_ts
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
  ),
  zsc AS (
    SELECT domain, bucket_ts, value,
           CASE WHEN n >= 8 AND
                     sqrt(greatest((sq - s*s/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1.0),0.0))
                     > 1e-9 + 1e-7 * abs(s/CAST(n AS DOUBLE))
                THEN (value - s/CAST(n AS DOUBLE))
                     / sqrt(greatest((sq - s*s/CAST(n AS DOUBLE))/(CAST(n AS DOUBLE)-1.0),0.0))
           END AS score
    FROM st
  ),
  sslot AS (
    SELECT domain, hour(bucket_ts) AS hod, dayofweek(bucket_ts)+1 AS dow,
           count(value) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,18))) AS DOUBLE) AS s,
           CAST(sum(CAST(value*value AS DECIMAL(38,12))) AS DOUBLE) AS sq
    FROM pts GROUP BY 1,2,3
  ),
  ssc AS (
    SELECT p.domain, p.bucket_ts, p.value,
           CASE WHEN t.n >= 3 AND
                sqrt(greatest((t.sq - p.value*p.value - (t.s-p.value)*(t.s-p.value)/(CAST(t.n AS DOUBLE)-1.0))/(CAST(t.n AS DOUBLE)-2.0),0.0))
                  > 1e-9 + 1e-7 * abs((t.s-p.value)/(CAST(t.n AS DOUBLE)-1.0))
                THEN (p.value - (t.s-p.value)/(CAST(t.n AS DOUBLE)-1.0))
                     / sqrt(greatest((t.sq - p.value*p.value - (t.s-p.value)*(t.s-p.value)/(CAST(t.n AS DOUBLE)-1.0))/(CAST(t.n AS DOUBLE)-2.0),0.0))
           END AS score
    FROM pts p JOIN sslot t
      ON p.domain = t.domain AND hour(p.bucket_ts) = t.hod
     AND dayofweek(p.bucket_ts)+1 = t.dow
  ),
  z_iv AS (
    SELECT domain, min(bucket_ts) AS i_start, max(bucket_ts) AS i_end
    FROM (
      SELECT *, sum(edge) OVER (PARTITION BY domain ORDER BY bucket_ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM (SELECT domain, bucket_ts, coalesce(abs(score) > 2.0, FALSE) AS a,
                   CASE WHEN coalesce(abs(score) > 2.0, FALSE) AND NOT coalesce(
                     lag(coalesce(abs(score) > 2.0, FALSE)) OVER (PARTITION BY domain ORDER BY bucket_ts), FALSE)
                   THEN 1 ELSE 0 END AS edge
            FROM zsc) f
    ) i WHERE a GROUP BY domain, island
  ),
  s_iv AS (
    SELECT domain, min(bucket_ts) AS i_start, max(bucket_ts) AS i_end
    FROM (
      SELECT *, sum(edge) OVER (PARTITION BY domain ORDER BY bucket_ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM (SELECT domain, bucket_ts, coalesce(abs(score) > 2.0, FALSE) AS a,
                   CASE WHEN coalesce(abs(score) > 2.0, FALSE) AND NOT coalesce(
                     lag(coalesce(abs(score) > 2.0, FALSE)) OVER (PARTITION BY domain ORDER BY bucket_ts), FALSE)
                   THEN 1 ELSE 0 END AS edge
            FROM ssc) f
    ) i WHERE a GROUP BY domain, island
  )
"""


@register(
    "consensus_intervals_events",
    _IVALS_CTE
    + """
  SELECT z.domain,
         greatest(z.i_start, s.i_start) AS overlap_start,
         least(z.i_end, s.i_end) AS overlap_end
  FROM z_iv z JOIN s_iv s
    ON z.domain = s.domain AND z.i_start <= s.i_end AND s.i_start <= z.i_end
""",
)
def consensus_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fischer_spark.operators.detect import (
        anomaly_intervals,
        seasonal_score,
        zscore_window,
    )
    from fischer_spark.queries import _events_hourly_rate

    pts = _events_hourly_rate(spark, sf_dir)
    z = anomaly_intervals(zscore_window(pts, 24, 8), tau=2.0).select(
        "domain",
        F.col("interval_start").alias("z_start"),
        F.col("interval_end").alias("z_end"),
    )
    s = anomaly_intervals(seasonal_score(pts, min_slot_n=3), tau=2.0).select(
        "domain",
        F.col("interval_start").alias("s_start"),
        F.col("interval_end").alias("s_end"),
    )
    j = z.join(s, "domain").filter(
        (F.col("z_start") <= F.col("s_end")) & (F.col("s_start") <= F.col("z_end"))
    )
    return j.select(
        "domain",
        F.greatest("z_start", "s_start").alias("overlap_start"),
        F.least("z_end", "s_end").alias("overlap_end"),
    )


# --------------------------------------------------------------------------
# simhash16 — SQL-expressible simhash: per-bit majority vote over token
# md5 nibbles (bits 0..15 from the first 4 hex digits).
# --------------------------------------------------------------------------

def _bitvote_spark(bit: int) -> str:
    nib, off = divmod(bit, 4)
    return (
        f"aggregate(toks, 0, (acc, t) -> acc + CASE WHEN "
        f"((instr('0123456789abcdef', substring(md5(cast(t as binary)), {nib + 1}, 1)) - 1) "
        f"div {1 << off}) % 2 = 1 THEN 1 ELSE -1 END)"
    )


def _bitvote_duck(bit: int) -> str:
    nib, off = divmod(bit, 4)
    return (
        f"list_aggregate(list_transform(toks, t -> CASE WHEN "
        f"(((strpos('0123456789abcdef', substr(md5(t), {nib + 1}, 1)) - 1) "
        f"// {1 << off}) % 2) = 1 THEN 1 ELSE -1 END), 'sum')"
    )


_SIMHASH_BITS = 16


@register(
    "simhash16_documents",
    f"""
  WITH s AS (
    SELECT doc_id, list_distinct({_TOK_DUCK}) AS toks
    FROM documents WHERE trim(text) <> ''
  )
  SELECT doc_id,
         {' + '.join(f'(CASE WHEN {_bitvote_duck(b)} > 0 THEN {1 << b} ELSE 0 END)' for b in range(_SIMHASH_BITS))}
           AS simhash
  FROM s
""",
)
def simhash16_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scan_testdata(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    s = d.select("doc_id", F.array_distinct(F.expr(_TOK_SPARK)).alias("toks"))
    sim = " + ".join(
        f"(CASE WHEN {_bitvote_spark(b)} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return s.select("doc_id", F.expr(sim).alias("simhash"))


# --------------------------------------------------------------------------
# approx distinct (HLL) — rows-only (sketch internals differ per engine;
# the pytest layer asserts relative error vs exact instead)
# --------------------------------------------------------------------------

@register("approx_distinct_users_events")
def approx_distinct_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )


# --------------------------------------------------------------------------
# mergeable histogram tier + percentile read (operators/histogram.py):
# linear-bin long-form counts — exact integer merge, IEEE-exact binning
# (no log/exp: libm last-ulp differences would break cross-engine
# determinism at bin boundaries).
# --------------------------------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 512.0, 64
_H_W = (_H_HI - _H_LO) / _H_BINS

_H_BIN_SQL = (
    f"CASE WHEN value < {_H_LO} THEN -1 "
    f"WHEN value >= {_H_HI} THEN {_H_BINS} "
    f"ELSE CAST(floor((value - {_H_LO}) / {_H_W}) AS INT) END"
)


@register(
    "hist_1h_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, CAST('event_value' AS VARCHAR) AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('hour', ts) AS bucket_ts, value
    FROM events
  )
  SELECT domain, metric, tag, CAST('1h' AS VARCHAR) AS tier, bucket_ts,
         {_H_BIN_SQL} AS bin, count(*) AS bin_cnt
  FROM pts GROUP BY 1, 2, 3, 4, 5, 6
""",
)
def hist_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fischer_spark.operators.histogram import hist_states
    from fischer_spark.queries import _events_series

    return hist_states(_events_series(spark, sf_dir), "1h", _H_LO, _H_HI, _H_BINS)


@register(
    "hist_p95_1d_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, CAST('event_value' AS VARCHAR) AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('day', ts) AS bucket_ts, value
    FROM events
  ),
  h AS (
    SELECT domain, metric, tag, bucket_ts, {_H_BIN_SQL} AS bin,
           count(*) AS bin_cnt
    FROM pts GROUP BY 1, 2, 3, 4, 5
  ),
  c AS (
    SELECT *,
           sum(bin_cnt) OVER (PARTITION BY domain, bucket_ts ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(bin_cnt) OVER (PARTITION BY domain, bucket_ts) AS total
    FROM h
  ),
  f AS (
    SELECT domain, metric, tag, bucket_ts,
           min(bin) AS qbin, CAST(max(total) AS BIGINT) AS n
    FROM c WHERE cum >= ceil(0.95 * total)
    GROUP BY 1, 2, 3, 4
  )
  SELECT domain, metric, tag, bucket_ts, n,
         CASE WHEN qbin = -1 THEN {_H_LO}
              WHEN qbin >= {_H_BINS} THEN {_H_HI}
              ELSE {_H_LO} + (qbin + 0.5) * {_H_W} END AS quantile
  FROM f
""",
)
def hist_p95_1d_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 per (series key, day) from the CASCADED histogram: 1h states
    merged to 1d by exact integer addition, then the cumulative bin walk
    — exercising both the merge and the read in one gated query (the
    oracle computes the 1d histogram directly; merge associativity makes
    them identical)."""
    from fischer_spark.operators.histogram import hist_merge, hist_quantile, hist_states
    from fischer_spark.queries import _events_series

    h1h = hist_states(_events_series(spark, sf_dir), "1h", _H_LO, _H_HI, _H_BINS)
    h1d = hist_merge(h1h, "1d")
    return hist_quantile(h1d, 0.95, _H_LO, _H_HI, _H_BINS)


# --------------------------------------------------------------------------
# O108 — PromQL histogram_fraction on the linear-bin tier.  The
# interpolation coefficients are PYTHON constants computed once and
# inlined into BOTH the Spark plan and the SQL (shortest-repr float
# literals round-trip exactly), so the only data-dependent inputs are
# exact integer bin counts — hash-safe under any partitioning.
# --------------------------------------------------------------------------

_HF_LO_V, _HF_HI_V = 65.0, 250.0  # bin 8 coef 0.125 / bin 31 coef 0.25
# the literals below are _fraction_consts(_HF_LO_V/_HF_HI_V, ...) inlined;
# tests/test_histogram.py pins the equality so the SQL can never drift
_HF_BL, _HF_CL, _HF_BH, _HF_CH = 8, 0.125, 31, 0.25


@register(
    "hist_fraction_1h_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, CAST('event_value' AS VARCHAR) AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('hour', ts) AS bucket_ts, value
    FROM events
  ),
  h AS (
    SELECT domain, metric, tag, bucket_ts, {_H_BIN_SQL} AS bin,
           count(*) AS bin_cnt
    FROM pts GROUP BY 1, 2, 3, 4, 5
  )
  SELECT domain, metric, tag, bucket_ts,
         CAST(sum(bin_cnt) AS BIGINT) AS n,
         ((CAST(sum(CASE WHEN bin < {_HF_BH} THEN bin_cnt ELSE 0 END) AS DOUBLE)
           + {_HF_CH!r} * CAST(sum(CASE WHEN bin = {_HF_BH} THEN bin_cnt ELSE 0 END) AS DOUBLE))
          - (CAST(sum(CASE WHEN bin < {_HF_BL} THEN bin_cnt ELSE 0 END) AS DOUBLE)
             + {_HF_CL!r} * CAST(sum(CASE WHEN bin = {_HF_BL} THEN bin_cnt ELSE 0 END) AS DOUBLE)))
         / CAST(sum(bin_cnt) AS DOUBLE) AS fraction
  FROM h GROUP BY 1, 2, 3, 4
""",
)
def hist_fraction_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_fraction(65, 250, event_value[1h])``: estimated
    share of observations in [65, 250) per (series key, hour), read from
    the SAME long-form 1h histogram tier the percentile queries serve
    (operators/histogram.py ``hist_fraction`` — one conditional-sum
    groupBy, map-side partial agg, no window)."""
    from fischer_spark.operators.histogram import hist_fraction, hist_states
    from fischer_spark.queries import _events_series

    h1h = hist_states(_events_series(spark, sf_dir), "1h", _H_LO, _H_HI, _H_BINS)
    return hist_fraction(h1h, _HF_LO_V, _HF_HI_V, _H_LO, _H_HI, _H_BINS)


# --------------------------------------------------------------------------
# counter semantics: reset-aware increase/rate (O-counter).  A deterministic
# cumulative counter WITH genuine resets is synthesized from the events
# fixture (integer running sum mod 1000 per user), then the operator must
# recover per-sample increase/rate across the reset boundaries.  Prometheus
# reset rule (public semantics): sample < predecessor ⇒ reset ⇒ increase =
# the raw sample.
# --------------------------------------------------------------------------

@register(
    "counter_rate_events",
    """
  WITH c AS (
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(floor(abs(value) * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) % 1000 AS counter
    FROM events
  ),
  l AS (
    SELECT event_id, user_id, ts, counter,
           lag(counter) OVER w AS prev,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS dt_us
    FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
  SELECT event_id, user_id, ts, counter,
         CASE WHEN prev IS NULL THEN NULL
              WHEN counter >= prev THEN counter - prev
              ELSE counter END AS increase,
         CASE WHEN prev IS NULL OR dt_us <= 0 THEN NULL
              ELSE CAST(CASE WHEN counter >= prev THEN counter - prev
                             ELSE counter END AS DOUBLE)
                   / (CAST(dt_us AS DOUBLE) / 1000000.0) END AS rate
  FROM l
""",
)
def counter_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter increase + rate (operators/counters.py) over a
    synthesized mod-1000 cumulative counter: exact integer arithmetic up
    to the final division, so the oracle comparison is bit-deterministic.
    One window shuffle per series key — the z-score Exchange shape."""
    from fischer_spark.operators.counters import counter_rate

    d = scan_testdata(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step = F.floor(F.abs(F.col("value")) * 100).cast("long")
    c = d.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(step).over(w) % 1000).alias("counter"),
    )
    out = counter_rate(
        c, ["user_id"], ["ts", "event_id"], ts_col="ts", val_col="counter"
    )
    return out.select("event_id", "user_id", "ts", "counter", "increase", "rate")


@register("lttb_events_1m_50")
def lttb_events_1m_50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB shape-preserving downsample (operators/downsample.py) of the
    per-minute mean-value series to 50 points per event_type.  Rows-only
    by design: each bucket's pick depends on the previous bucket's pick,
    so the algorithm is not SQL-expressible; the kernel is pinned
    index-for-index against a naive reference implementation in
    tests/test_downsample.py."""
    from fischer_spark.operators.downsample import lttb_downsample

    d = scan_testdata(spark, sf_dir, "events")
    series = (
        d.groupBy(
            "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        ).agg(F.avg("value").alias("value"))
    )
    return lttb_downsample(
        series, ["event_type"], ts_col="bucket_ts", val_col="value", n_out=50
    )


# --------------------------------------------------------------------------
# O111 — LTTB under a FULL SQL oracle.  The "not SQL-expressible" note on
# lttb_events_1m_50 is about unbounded-length recursion; with n_out FIXED
# (50 points) the selection recurrence is exactly 48 sequential argmax
# steps, so the oracle UNROLLS it into 48 generated chained CTEs — the
# same move the recursive-CTE Holt oracle (O109) made for per-sample
# state, applied to per-bucket state.  Bit-exactness holds because every
# float input is an exactly-representable small integer: values are
# per-minute COUNTS and timestamps are REBASED minute indexes (t - t0),
# so bucket-centroid sums are exact in float64 regardless of summation
# order (numpy's pairwise sum == SQL's sequential sum), and the triangle
# area |(ta-ct)(v-va) - (ta-t)(cv-va)| is the identical IEEE-754
# expression tree in both engines.  Ties on area break to the earlier
# timestamp (np.argmax takes the FIRST max; ORDER BY area DESC, t ASC
# mirrors it) — and tied areas are bit-identical ties, never near-ties.
# --------------------------------------------------------------------------


def _lttb_exact_oracle(n_out: int = 50) -> str:
    """Generate the unrolled LTTB oracle: seed (first point), one chained
    argmax CTE per interior bucket, then the last point; series with
    n <= n_out pass through whole.  Bucket bounds replicate the kernel's
    ``trunc(1 + i*(n-2)/(n_out-2))`` float arithmetic digit-for-digit."""
    nb = n_out - 2  # interior buckets
    head = f"""
  WITH s AS (
    SELECT event_type, date_trunc('minute', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS value
    FROM events GROUP BY 1, 2
  ),
  idx AS (
    SELECT event_type, bucket_ts, value,
           (epoch_us(bucket_ts)
            - min(epoch_us(bucket_ts)) OVER (PARTITION BY event_type))
             // 60000000 AS t,
           row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) - 1
             AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM s
  ),
  big AS MATERIALIZED (SELECT * FROM idx WHERE n > {n_out}),
  bnd AS MATERIALIZED (
    SELECT g.event_type, g.n, r.i,
           CASE WHEN r.i = {nb} THEN g.n - 1
                ELSE CAST(trunc(1.0 + CAST(r.i * (g.n - 2) AS DOUBLE)
                                 / {float(nb)}) AS BIGINT)
           END AS b
    FROM (SELECT DISTINCT event_type, n FROM big) g
    CROSS JOIN (SELECT unnest(generate_series(0, {nb})) AS i) r
  ),
  cent AS MATERIALIZED (
    SELECT nb.event_type, nb.i,
           CAST(sum(b.t) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS ct,
           CAST(sum(b.value) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS cv
    FROM (
      SELECT lo.event_type, lo.i - 1 AS i, lo.b AS nlo,
             CASE WHEN lo.i = {nb} THEN lo.n ELSE hi.b END AS nhi
      FROM bnd lo LEFT JOIN bnd hi
        ON hi.event_type = lo.event_type AND hi.i = lo.i + 1
      WHERE lo.i >= 1
    ) nb
    JOIN big b ON b.event_type = nb.event_type
              AND b.rn >= nb.nlo AND b.rn < nb.nhi
    GROUP BY 1, 2
  ),
  sel0 AS MATERIALIZED (
    SELECT event_type, CAST(t AS DOUBLE) AS ta, CAST(value AS DOUBLE) AS va
    FROM big WHERE rn = 0
  )"""
    picks = []
    for i in range(nb):
        prev = "sel0" if i == 0 else f"pick{i - 1}"
        picks.append(f""",
  pick{i} AS MATERIALIZED (
    SELECT event_type, bucket_ts, value,
           CAST(t AS DOUBLE) AS ta, CAST(value AS DOUBLE) AS va
    FROM (
      SELECT b.event_type, b.bucket_ts, b.value, b.t,
             row_number() OVER (
               PARTITION BY b.event_type
               ORDER BY abs((p.ta - c.ct) * (CAST(b.value AS DOUBLE) - p.va)
                          - (p.ta - CAST(b.t AS DOUBLE)) * (c.cv - p.va))
                          DESC,
                        b.t ASC) AS rk
      FROM big b
      JOIN bnd lo ON lo.event_type = b.event_type AND lo.i = {i}
      JOIN bnd hi ON hi.event_type = b.event_type AND hi.i = {i + 1}
      JOIN {prev} p ON p.event_type = b.event_type
      JOIN cent c ON c.event_type = b.event_type AND c.i = {i}
      WHERE b.rn >= lo.b AND b.rn < hi.b
    ) WHERE rk = 1
  )""")
    tail = [
        f"\n  SELECT event_type, bucket_ts, value FROM idx WHERE n <= {n_out}",
        "  SELECT event_type, bucket_ts, value FROM big WHERE rn = 0",
        *(f"  SELECT event_type, bucket_ts, value FROM pick{i}" for i in range(nb)),
        "  SELECT event_type, bucket_ts, value FROM big WHERE rn = n - 1",
    ]
    return head + "".join(picks) + "\n  UNION ALL\n".join(tail)


@register("lttb_exact_events_1m_50", _lttb_exact_oracle(50))
def lttb_exact_events_1m_50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB (operators/downsample.py) of the per-minute COUNT series per
    event_type to 50 points, under the full driver value gate: the same
    grouped-Arrow kernel as lttb_events_1m_50, but with hash-convention
    inputs — integer counts as values and rebased minute indexes as
    timestamps — so every centroid and triangle area is bit-identical to
    the unrolled oracle's (see _lttb_exact_oracle).  One Exchange on the
    series key; the rebase window shares it."""
    from fischer_spark.operators.downsample import lttb_downsample

    d = scan_testdata(spark, sf_dir, "events")
    series = d.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("value"))
    w = Window.partitionBy("event_type")
    series = (
        series.withColumn("_mn", F.min(F.unix_micros("bucket_ts")).over(w))
        .withColumn("t", F.expr("(unix_micros(bucket_ts) - _mn) div 60000000"))
        .drop("_mn")
    )
    out = lttb_downsample(series, ["event_type"], ts_col="t", val_col="value", n_out=50)
    return out.select("event_type", "bucket_ts", "value")


# --------------------------------------------------------------------------
# O58 — deriv / predict_linear (operators/trend.py)
# --------------------------------------------------------------------------

@register(
    "deriv_predict_events",
    """
  WITH s AS (
    SELECT event_type,
           date_trunc('day', ts) AS bucket_ts,
           epoch_us(ts) - epoch_us(date_trunc('day', ts)) AS x,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
    FROM events
  ),
  g AS (
    SELECT event_type, bucket_ts,
           count(*) AS n,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
           sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
    FROM s GROUP BY 1, 2
  )
  SELECT event_type, bucket_ts, CAST(n AS BIGINT) AS n,
         CASE WHEN n < 2 OR n*sxx - sx*sx = 0 THEN NULL
              ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                   / CAST(n*sxx - sx*sx AS DOUBLE) * 10000.0 END AS slope,
         CASE WHEN n < 2 OR n*sxx - sx*sx = 0 THEN NULL
              ELSE CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
                   + (CAST(n*sxy - sx*sy AS DOUBLE)
                      / CAST(n*sxx - sx*sx AS DOUBLE) * 10000.0)
                     * (90000.0 - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                                  / 1000000.0) END AS predict
  FROM g
""",
)
def deriv_predict_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style deriv()/predict_linear(): per-series per-day least
    squares slope (value units per second) and the fitted value one hour
    past the day bucket (operators/trend.py `linear_trend_exact`).  All
    five regression states accumulate exactly (integer µs × integer
    cents, decimal on the Spark side, HUGEINT in DuckDB); the final
    slope/predict doubles share one expression shape, so the hash gate
    is bit-deterministic.  One partial-aggregated groupBy — a single
    Exchange, no window."""
    from fischer_spark.operators.trend import linear_trend_exact

    d = scan_testdata(spark, sf_dir, "events")
    return linear_trend_exact(
        d,
        ["event_type"],
        F.date_trunc("day", F.col("ts")),
        ts_col="ts",
        val_col="value",
        predict_at_s=90000.0,
    )


# --------------------------------------------------------------------------
# O59 — changes() / resets() counts (operators/counters.py change_flags)
# --------------------------------------------------------------------------

@register(
    "counter_resets_changes_events",
    """
  WITH c AS (
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(floor(abs(value) * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) % 1000 AS counter
    FROM events
  ),
  l AS (
    SELECT user_id, date_trunc('day', ts) AS bucket_ts, counter,
           lag(counter) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev
    FROM c
  )
  SELECT user_id, bucket_ts,
         count(*) AS n,
         CAST(sum(CASE WHEN prev IS NOT NULL AND counter <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS changes,
         CAST(sum(CASE WHEN prev IS NOT NULL AND counter < prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS resets
  FROM l GROUP BY 1, 2
""",
)
def counter_resets_changes_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL changes()/resets() as windowed sums over per-sample flags
    (operators/counters.py `change_flags`) on the same synthesized
    mod-1000 counter as counter_rate_events.  Pure integer arithmetic —
    trivially hash-deterministic.  The flag window and the day groupBy
    share the series-key Exchange."""
    from fischer_spark.operators.counters import change_flags

    d = scan_testdata(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step = F.floor(F.abs(F.col("value")) * 100).cast("long")
    c = d.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(step).over(w) % 1000).alias("counter"),
    )
    flagged = change_flags(c, ["user_id"], ["ts", "event_id"], val_col="counter")
    return (
        flagged.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).alias("bucket_ts")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("changed").cast("long").alias("changes"),
            F.sum("reset").cast("long").alias("resets"),
        )
    )


# --------------------------------------------------------------------------
# O60 — exact windowed quantile (rank-based, deterministic interpolation)
# --------------------------------------------------------------------------

@register(
    "quantile_exact_1h_events",
    """
  WITH r AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts, value,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY value) AS rn,
           count(*) OVER (PARTITION BY event_type, date_trunc('hour', ts))
             AS cnt
    FROM events
  )
  SELECT event_type, bucket_ts, CAST(max(cnt) AS BIGINT) AS n,
         max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN value END)
         + (max(CASE WHEN rn = CAST(ceil(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN value END)
            - max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN value END))
           * (CAST(max(cnt) - 1 AS DOUBLE) * 0.5
              - floor(CAST(max(cnt) - 1 AS DOUBLE) * 0.5)) AS p50,
         max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN value END)
         + (max(CASE WHEN rn = CAST(ceil(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN value END)
            - max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN value END))
           * (CAST(max(cnt) - 1 AS DOUBLE) * 0.95
              - floor(CAST(max(cnt) - 1 AS DOUBLE) * 0.95)) AS p95
  FROM r GROUP BY 1, 2
""",
)
def quantile_exact_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact windowed quantile (p50/p95 per series-hour) with rank-based
    linear interpolation spelled out identically in both engines —
    built-in percentile/quantile_cont aggregates interpolate with
    engine-specific expression shapes, so this is the hash-safe exact
    complement to the approximate histogram read (hist_p95_1d_events).
    One Exchange + one in-partition sort (rank and count windows share
    the partition); the conditional aggregation touches each row once.
    At the 100 TB design point the histogram tiers remain the serving
    path — this is the exact-verification form."""
    d = scan_testdata(spark, sf_dir, "events")
    b = F.date_trunc("hour", F.col("ts"))
    base = d.select("event_type", b.alias("bucket_ts"), "value")
    pw = Window.partitionBy("event_type", "bucket_ts")
    r = base.select(
        "event_type",
        "bucket_ts",
        "value",
        F.row_number().over(pw.orderBy("value")).alias("rn"),
        F.count(F.lit(1)).over(pw).alias("cnt"),
    )

    def _q(q: float):
        k = (F.col("cnt") - 1).cast("double") * F.lit(q)
        lo = F.max(
            F.when(
                F.col("rn") == F.floor(k).cast("long") + 1, F.col("value")
            )
        )
        hi = F.max(
            F.when(
                F.col("rn") == F.ceil(k).cast("long") + 1, F.col("value")
            )
        )
        kk = (F.max("cnt") - 1).cast("double") * F.lit(q)
        return lo + (hi - lo) * (kk - F.floor(kk))

    return r.groupBy("event_type", "bucket_ts").agg(
        F.max("cnt").cast("long").alias("n"),
        _q(0.5).alias("p50"),
        _q(0.95).alias("p95"),
    )


# --------------------------------------------------------------------------
# O61 — exponential smoothing (operators/smooth.py); rows-only by design:
# each sample's state depends on its predecessor's, which SQL cannot
# express without numerically explosive (1-alpha)^-i rescaling.  The
# kernels are pinned against naive reference loops in tests/test_smooth.py.
# --------------------------------------------------------------------------

@register("holt_winters_events_1h")
def holt_winters_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style holt_winters(0.3, 0.1) (double exponential smoothing)
    over the per-hour mean-value series per event_type, plus the EWMA
    baseline column.  Grouped Arrow UDFs — one Exchange on the series
    key; sequential state stays inside the per-series numpy/pandas
    kernel (operators/smooth.py scale note)."""
    from fischer_spark.operators.smooth import ewma, holt

    d = scan_testdata(spark, sf_dir, "events")
    series = d.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.avg("value").alias("value"))
    sm = holt(series, ["event_type"], sf=0.3, tf=0.1)
    ew = ewma(series, ["event_type"], alpha=0.3).select(
        "event_type", "bucket_ts", F.col("smoothed").alias("ewma")
    )
    return sm.join(ew, ["event_type", "bucket_ts"])


# --------------------------------------------------------------------------
# O109 — the Holt recurrence under a FULL SQL oracle via a DuckDB
# recursive CTE.  The r1-r4 "not SQL-expressible" note was about
# closed-form window rescaling (numerically explosive (1-a)^-i factors);
# a recursive CTE sidesteps it: the oracle walks the recurrence sample
# by sample with the IDENTICAL double expression tree the numpy kernel
# evaluates (same literals, same op order, IEEE 754 both sides), and the
# recurrence is a contraction (coefficients < 1), so there is no error
# amplification path.  Input means are exact-decimal (hash convention).
# The rows-only holt_winters_events_1h above keeps the EWMA column
# (pandas' Cython ewm kernel is not op-order replicable in SQL).
# --------------------------------------------------------------------------

@register(
    "holt_exact_events_1h",
    """
  WITH RECURSIVE s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(value) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  n AS (
    SELECT event_type, bucket_ts, value,
           row_number() OVER (PARTITION BY event_type ORDER BY bucket_ts) AS rn,
           lead(value) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS nxt
    FROM s
  ),
  rec AS (
    SELECT event_type, bucket_ts, value, rn,
           value AS level, nxt - value AS trend
    FROM n WHERE rn = 1
    UNION ALL
    SELECT n.event_type, n.bucket_ts, n.value, n.rn,
           0.3 * n.value + (1.0 - 0.3) * (rec.level + rec.trend) AS level,
           0.1 * ((0.3 * n.value + (1.0 - 0.3) * (rec.level + rec.trend))
                  - rec.level)
             + (1.0 - 0.1) * rec.trend AS trend
    FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1
  )
  SELECT event_type, bucket_ts, value, level AS smoothed, trend FROM rec
""",
)
def holt_exact_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """holt_winters(0.3, 0.1) over the exact-decimal per-hour mean series
    per event_type — the same grouped-Arrow kernel as
    holt_winters_events_1h, but with hash-convention inputs so the
    sequential state itself sits under the driver's full value gate.
    Single-sample series get NULL trend (no pair to seed it) on both
    sides; the kernel's NaN is normalized to NULL here."""
    from fischer_spark.operators.smooth import holt

    d = scan_testdata(spark, sf_dir, "events")
    series = d.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count("value").cast("double")
        ).alias("value")
    )
    sm = holt(series, ["event_type"], sf=0.3, tf=0.1)
    return sm.select(
        "event_type",
        "bucket_ts",
        "value",
        "smoothed",
        F.when(F.isnan("trend"), F.lit(None))
        .otherwise(F.col("trend"))
        .alias("trend"),
    )


# --------------------------------------------------------------------------
# O112 — PromQL *_over_time range functions (operators/overtime.py):
# quantile_over_time / mad_over_time as trailing-window array ops, fully
# JVM-side (collect_list + array_sort + the rank-lerp convention), under
# full SQL oracles on exact-decimal hourly means.
# --------------------------------------------------------------------------

_HOURLY_EXACT_MEAN_SQL = """
  s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(value) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  w AS (
    SELECT event_type, bucket_ts, value,
           list_sort(list(value) OVER (
             PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)) AS arr
    FROM s
  )"""


def _lerp_sql(arr: str, q: str) -> str:
    """The frame_quantile expression in DuckDB list form (1-based) —
    textually mirrors operators/overtime.frame_quantile."""
    k = f"CAST(len({arr}) - 1 AS DOUBLE) * {q}"
    lo = f"{arr}[CAST(floor({k}) AS BIGINT) + 1]"
    hi = f"{arr}[CAST(ceil({k}) AS BIGINT) + 1]"
    return f"{lo} + ({hi} - {lo}) * ({k} - floor({k}))"


def _hourly_exact_mean_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scan_testdata(spark, sf_dir, "events")
    return d.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count("value").cast("double")
        ).alias("value")
    )


@register(
    "quantile_over_time_events",
    f"""
  WITH {_HOURLY_EXACT_MEAN_SQL}
  SELECT event_type, bucket_ts, value,
         CAST(len(arr) AS BIGINT) AS n,
         {_lerp_sql('arr', '0.5')} AS p50,
         {_lerp_sql('arr', '0.9')} AS p90
  FROM w
""",
)
def quantile_over_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL quantile_over_time(q, v[24h]) on the hourly series per
    event_type: exact trailing-24-bucket p50/p90 per bucket, entirely
    whole-stage-codegen (no Arrow hop — the frame array is a window
    collect_list, the quantile a rank-lerp over array_sort).  One
    Exchange on the series key shared by the frame window.  The
    along-series complement of quantile_exact_1h_events (within-bucket)
    and vector_quantile (across-series)."""
    from fischer_spark.operators.overtime import quantile_over_time

    series = _hourly_exact_mean_series(spark, sf_dir)
    return quantile_over_time(
        series, ["event_type"], {"p50": 0.5, "p90": 0.9}, w=24
    )


@register(
    "mad_over_time_events",
    f"""
  WITH {_HOURLY_EXACT_MEAN_SQL},
  m AS (
    SELECT event_type, bucket_ts, value, arr,
           {_lerp_sql('arr', '0.5')} AS med
    FROM w
  ),
  d AS (
    SELECT event_type, bucket_ts, value, arr, med,
           list_sort(list_transform(arr, x -> abs(x - med))) AS dev
    FROM m
  )
  SELECT event_type, bucket_ts, value,
         CAST(len(arr) AS BIGINT) AS n,
         med,
         {_lerp_sql('dev', '0.5')} AS mad
  FROM d
""",
)
def mad_over_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL (experimental) mad_over_time(v[24h]): trailing-window
    median absolute deviation per (series, bucket) — the robust
    dispersion for spike detection on gauge series, windowed along time
    (robust_zscore_events is the same statistic across a seasonal
    slot).  The deviation array is rebuilt frame-side with transform()
    so the whole thing stays one window pass, all codegen."""
    from fischer_spark.operators.overtime import mad_over_time

    series = _hourly_exact_mean_series(spark, sf_dir)
    return mad_over_time(series, ["event_type"], w=24)


# --------------------------------------------------------------------------
# O65 — robust (median/MAD) seasonal deviation score
# --------------------------------------------------------------------------

_MED_LERP = """
         max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN {v} END)
         + (max(CASE WHEN rn = CAST(ceil(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN {v} END)
            - max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 THEN {v} END))
           * (CAST(max(cnt) - 1 AS DOUBLE) * 0.5
              - floor(CAST(max(cnt) - 1 AS DOUBLE) * 0.5))
"""


@register(
    "robust_zscore_events",
    f"""
  WITH b AS (
    SELECT event_id, event_type, ts, value, hour(ts) AS slot FROM events
  ),
  r1 AS (
    SELECT *, row_number() OVER (PARTITION BY event_type, slot ORDER BY value) AS rn,
           count(*) OVER (PARTITION BY event_type, slot) AS cnt
    FROM b
  ),
  med AS (
    SELECT event_type, slot, {_MED_LERP.format(v='value')} AS med
    FROM r1 GROUP BY 1, 2
  ),
  d AS (
    SELECT b.*, med.med, abs(b.value - med.med) AS adev
    FROM b JOIN med USING (event_type, slot)
  ),
  r2 AS (
    SELECT *, row_number() OVER (PARTITION BY event_type, slot ORDER BY adev) AS rn,
           count(*) OVER (PARTITION BY event_type, slot) AS cnt
    FROM d
  ),
  mad AS (
    SELECT event_type, slot, {_MED_LERP.format(v='adev')} AS mad
    FROM r2 GROUP BY 1, 2
  )
  SELECT d.event_id, d.event_type, d.ts, d.value, d.slot, d.med, mad.mad,
         CASE WHEN mad.mad > 0
              THEN 0.6745 * (d.value - d.med) / mad.mad END AS score
  FROM d JOIN mad USING (event_type, slot)
""",
)
def robust_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust seasonal deviation (operators/detect.py
    robust_seasonal_score): exact median/MAD per (event_type,
    hour-of-day) slot, score = 0.6745*(x-med)/mad — the outlier-proof
    counterpart of seasonal_scored_events.  Rank-based medians with the
    engine-identical lerp arithmetic (same convention as
    quantile_exact_1h_events), so the gate is hash-deterministic."""
    from fischer_spark.operators.detect import robust_seasonal_score

    d = scan_testdata(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    out = robust_seasonal_score(
        d, ["event_type"], F.hour("ts"), ts_col="ts", val_col="value"
    )
    return out.select(
        "event_id", "event_type", "ts", "value", "slot", "med", "mad", "score"
    )


# --------------------------------------------------------------------------
# O68 — robust anomaly intervals (median/MAD score -> gaps-and-islands)
# --------------------------------------------------------------------------

@register(
    "robust_intervals_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  b AS (SELECT domain, bucket_ts, value, hour(bucket_ts) AS slot FROM pts),
  r1 AS (
    SELECT *, row_number() OVER (PARTITION BY domain, slot ORDER BY value) AS rn,
           count(*) OVER (PARTITION BY domain, slot) AS cnt
    FROM b
  ),
  med AS (
    SELECT domain, slot, {_MED_LERP.format(v='value')} AS med
    FROM r1 GROUP BY 1, 2
  ),
  d AS (
    SELECT b.*, med.med, abs(b.value - med.med) AS adev
    FROM b JOIN med USING (domain, slot)
  ),
  r2 AS (
    SELECT *, row_number() OVER (PARTITION BY domain, slot ORDER BY adev) AS rn,
           count(*) OVER (PARTITION BY domain, slot) AS cnt
    FROM d
  ),
  mad AS (
    SELECT domain, slot, {_MED_LERP.format(v='adev')} AS mad
    FROM r2 GROUP BY 1, 2
  ),
  scored AS (
    SELECT d.domain, d.bucket_ts,
           CASE WHEN mad.mad > 0
                THEN 0.6745 * (d.value - d.med) / mad.mad END AS score
    FROM d JOIN mad USING (domain, slot)
  ),
  flagged AS (
    SELECT domain, bucket_ts, score,
           coalesce(abs(score) > 2.0, FALSE) AS is_anom
    FROM scored
  ),
  edged AS (
    SELECT *, CASE WHEN is_anom AND NOT coalesce(
                 lag(is_anom) OVER (PARTITION BY domain ORDER BY bucket_ts), FALSE)
               THEN 1 ELSE 0 END AS edge
    FROM flagged
  ),
  islands AS (
    SELECT *, sum(edge) OVER (PARTITION BY domain ORDER BY bucket_ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM edged
  )
  SELECT domain AS series_key, min(bucket_ts) AS interval_start,
         max(bucket_ts) AS interval_end,
         max(abs(score)) AS peak_score, CAST(count(*) AS BIGINT) AS n_points
  FROM islands WHERE is_anom
  GROUP BY domain, island
""",
)
def robust_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) scores composed into scored anomaly intervals:
    robust_seasonal_score (O65) -> anomaly_intervals (O28) gaps-and-
    islands on the hourly event-rate series, |score| > 2.  The whole
    chain is the fluent `.rollup('1h').robust_score().intervals(2.0)`
    surface; hash-safe because both engines derive identical doubles
    from identical rank-lerp medians, then compare/flag identically."""
    from fischer_spark.operators.detect import (
        anomaly_intervals,
        robust_seasonal_score,
    )
    from fischer_spark.queries import _events_hourly_rate

    pts = _events_hourly_rate(spark, sf_dir)
    scored = robust_seasonal_score(
        pts, ["domain", "metric", "tag"], F.hour("bucket_ts"),
        ts_col="bucket_ts", val_col="value",
    )
    ivals = anomaly_intervals(scored, tau=2.0, tier="1h", detector="robust_seasonal")
    return ivals.select(
        F.col("domain").alias("series_key"),
        "interval_start",
        "interval_end",
        "peak_score",
        "n_points",
    )


# --------------------------------------------------------------------------
# O69 — stale / absent series detection
# --------------------------------------------------------------------------

@register(
    "stale_series_events",
    """
  WITH last AS (
    SELECT user_id, event_type, max(ts) AS last_ts,
           CAST(count(*) AS BIGINT) AS n_samples
    FROM events GROUP BY 1, 2
  ),
  horizon AS (SELECT max(ts) AS now_ts FROM events)
  SELECT l.user_id, l.event_type, l.last_ts, l.n_samples,
         CAST(floor(CAST(epoch_us(h.now_ts) - epoch_us(l.last_ts) AS DOUBLE)
                    / 3600000000.0) AS BIGINT) AS silent_hours
  FROM last l, horizon h
  WHERE l.last_ts < h.now_ts - INTERVAL 7 DAY
""",
)
def stale_series_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stale-series detection (the PromQL `absent()`/staleness read):
    per (user_id, event_type) series, surface those whose LAST sample is
    older than 7 days before the corpus horizon, with integer
    silent-hours.  Scale shape: one partial-aggregated groupBy for the
    per-series max, one 1-row broadcast cross join for the horizon —
    no window over the full table, no driver collect; exact integer µs
    arithmetic end-to-end (hash-safe)."""
    ev = scan_testdata(spark, sf_dir, "events")
    last = ev.groupBy("user_id", "event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    horizon = ev.agg(F.max("ts").alias("now_ts"))
    j = last.crossJoin(F.broadcast(horizon))
    silent_us = F.unix_micros(F.col("now_ts").cast("timestamp")) - F.unix_micros(
        F.col("last_ts").cast("timestamp")
    )
    return (
        j.filter(F.col("last_ts") < F.col("now_ts") - F.expr("INTERVAL 7 DAYS"))
        .select(
            "user_id", "event_type", "last_ts", "n_samples",
            F.floor(silent_us.cast("double") / F.lit(3600000000.0))
            .cast("bigint").alias("silent_hours"),
        )
    )


# --------------------------------------------------------------------------
# O70 — series algebra (PromQL vector matching): error ratio per user-day
# --------------------------------------------------------------------------

@register(
    "series_ratio_events",
    """
  WITH e AS (
    SELECT user_id, date_trunc('day', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'error' GROUP BY 1, 2
  ),
  c AS (
    SELECT user_id, date_trunc('day', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events WHERE event_type = 'click' GROUP BY 1, 2
  )
  SELECT e.user_id, e.bucket_ts,
         CASE WHEN c.value <> 0 THEN e.value / c.value END AS value
  FROM e JOIN c USING (user_id, bucket_ts)
""",
)
def series_ratio_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series algebra (operators/binop.py series_binop): errors-per-click
    ratio per (user_id, day) — PromQL ``errors / on(user_id) clicks``
    one-to-one vector matching.  Both sides are exact integer counts, so
    the single division is hash-deterministic; samples pair on (label,
    timestamp) through one equi-join."""
    from fischer_spark.operators.binop import series_binop

    ev = scan_testdata(spark, sf_dir, "events")

    def daily(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_ts"))
            .agg(F.count(F.lit(1)).cast("double").alias("value"))
        )

    out = series_binop(
        daily("error"), daily("click"), op="div", on=("user_id",)
    )
    return out.select("user_id", "bucket_ts", "value")


@register("hw_seasonal_events_1h")
def hw_seasonal_events_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters TRIPLE smoothing (operators/smooth.py
    holt_winters_seasonal, m=24 hour-of-day season) over the per-hour
    mean-value series per event_type: one-step-ahead `fitted` plus
    level/trend/season states.  Rows-only by design (recursive seasonal
    state is not SQL-expressible); the kernel is pinned against an
    independent reference recurrence and a convergence property in
    tests/test_smooth.py."""
    from fischer_spark.operators.smooth import holt_winters_seasonal

    d = scan_testdata(spark, sf_dir, "events")
    series = d.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.avg("value").alias("value"))
    return holt_winters_seasonal(series, ["event_type"], m=24)


# --------------------------------------------------------------------------
# O74 — series-cardinality monitor (label-set explosion guard)
# --------------------------------------------------------------------------

@register(
    "series_cardinality_events",
    """
  SELECT date_trunc('day', ts) AS bucket_ts,
         CAST(count(DISTINCT user_id || '\\x1f' || event_type) AS BIGINT) AS n_series,
         CAST(count(*) AS BIGINT) AS n_samples
  FROM events GROUP BY 1
""",
)
def series_cardinality_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-cardinality monitor: distinct active label sets per day —
    THE operational guard for a TSDB (label explosions kill index and
    rollup shuffle alike; Prometheus exposes the same count as
    prometheus_tsdb_head_series).  Exact form for the gate; at 100 TB
    the same query runs with approx_count_distinct (documented dial).
    The distinct key concatenates labels with an unprintable separator
    so ('ab','c') never collides with ('a','bc') in either engine."""
    ev = scan_testdata(spark, sf_dir, "events")
    key = F.concat_ws("\x1f", F.col("user_id").cast("string"), F.col("event_type"))
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("bucket_ts"))
        .agg(
            F.count_distinct(key).alias("n_series"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


# --------------------------------------------------------------------------
# O76 — ordered funnel conversion (view -> click -> purchase)
# --------------------------------------------------------------------------

@register(
    "funnel_conversion_events",
    """
  WITH firsts AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
    FROM events GROUP BY 1
  )
  SELECT
    CAST(count(*) AS BIGINT) AS n_users,
    CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_view,
    CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
             THEN 1 ELSE 0 END) AS BIGINT) AS stage_click,
    CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click
             THEN 1 ELSE 0 END) AS BIGINT) AS stage_purchase
  FROM firsts
""",
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose FIRST view precedes their first click
    precedes their first purchase — the strict-order conversion count
    (a later-stage event before the earlier stage does not convert).
    One partial-aggregated groupBy per user + one global fold: two
    Exchanges total, no window, exact integers (hash-safe).  NULL
    comparisons are naturally strict: t_click > t_view is NULL (false)
    when either stage is missing — identical semantics in both engines."""
    ev = scan_testdata(spark, sf_dir, "events")

    def first_of(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        one(viewed).alias("stage_view"),
        one(clicked).alias("stage_click"),
        one(purchased).alias("stage_purchase"),
    )


# --------------------------------------------------------------------------
# O78 — M4 visualization downsample (pixel-bucket first/last/min/max)
# --------------------------------------------------------------------------

@register(
    "m4_events_64px",
    """
  WITH pts AS (
    SELECT event_type AS domain, ts, value FROM events
  ),
  ext AS (
    SELECT domain, min(epoch_us(ts)) AS t0, max(epoch_us(ts)) AS t1
    FROM pts GROUP BY 1
  ),
  b AS (
    SELECT p.domain, p.ts, p.value,
           (64 * (epoch_us(p.ts) - e.t0)) // (e.t1 - e.t0 + 1) AS px
    FROM pts p JOIN ext e USING (domain)
  ),
  w AS (
    SELECT domain, px, value,
           first_value(ts)    OVER win AS t_first,
           first_value(value) OVER win AS v_first,
           last_value(ts)     OVER win AS t_last,
           last_value(value)  OVER win AS v_last
    FROM b
    WINDOW win AS (PARTITION BY domain, px ORDER BY ts, value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
  )
  SELECT domain, px,
         min(t_first) AS t_first, min(v_first) AS v_first,
         min(t_last)  AS t_last,  min(v_last)  AS v_last,
         min(value) AS v_min, max(value) AS v_max,
         CAST(count(*) AS BIGINT) AS n_pts
  FROM w GROUP BY 1, 2
""",
)
def m4_events_64px(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsample (O78) of each event_type's raw value series to 64
    pixel buckets — the JVM-only dashboard read path (operators/
    downsample.py m4_downsample; LTTB is the Arrow-UDF alternative and
    stays rows-only).  Exact integer-µs pixel math and (ts, value)
    tie-ordering make every output column hash-safe."""
    from fischer_spark.operators.downsample import m4_downsample

    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("domain"),
        F.col("ts").alias("bucket_ts"),
        "value",
    )
    return m4_downsample(pts, ["domain"], n_px=64)


# --------------------------------------------------------------------------
# O79 — PromQL offset: week-over-week comparison via time-shifted binop
# --------------------------------------------------------------------------

@register(
    "wow_ratio_events",
    """
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  prev AS (
    SELECT domain, bucket_ts + INTERVAL 7 DAY AS bucket_ts, value
    FROM pts
  )
  SELECT p.domain, p.bucket_ts,
         CASE WHEN q.value <> 0 THEN p.value / q.value END AS value
  FROM pts p JOIN prev q USING (domain, bucket_ts)
""",
)
def wow_ratio_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``rate / (rate offset 7d)`` (O79): week-over-week ratio of
    the hourly event rate per event_type — series_offset re-stamps last
    week's samples +7d so series_binop's (label, ts) equi-join pairs them
    with this week's.  Counts are exact integers, the single division is
    hash-deterministic; one shuffle per side on the shared join key."""
    from fischer_spark.operators.binop import series_binop, series_offset

    ev = scan_testdata(spark, sf_dir, "events")
    rate = ev.groupBy(
        F.col("event_type").alias("domain"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    out = series_binop(
        rate, series_offset(rate, 7 * 86_400), op="div", on=("domain",)
    )
    return out.select("domain", "bucket_ts", "value")


# --------------------------------------------------------------------------
# O80 — alert rule evaluation with a `for` duration (ALERTS surface)
# --------------------------------------------------------------------------

@register(
    "alerts_for_events",
    """
  WITH pts AS (
    SELECT event_type AS domain, 'event_rate' AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 4
  ),
  hot AS (
    SELECT domain, metric, tag, bucket_ts,
           epoch_us(bucket_ts) // 3600000000 AS idx,
           row_number() OVER (PARTITION BY domain ORDER BY bucket_ts) AS rn
    FROM pts WHERE value >= 3
  )
  SELECT domain, metric, tag,
         'high_rate' AS alertname,
         CASE WHEN count(*) * 3600 >= 10800 THEN 'firing' ELSE 'pending' END AS state,
         min(bucket_ts) AS starts_at,
         CASE WHEN count(*) * 3600 >= 10800
              THEN min(bucket_ts) + INTERVAL 3 HOUR END AS fires_at,
         max(bucket_ts) AS ends_at,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM hot GROUP BY domain, metric, tag, idx - rn
""",
)
def alerts_for_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alerting read (O80): `event_rate >= 3 for 3h` per event_type on
    the hourly tier — pending/firing islands whose timer RESETS on any
    hour where the rate dipped or the bucket is missing (bucket-index −
    row_number islanding; anomaly_intervals' row-consecutive islanding
    would wrongly bridge quiet gaps).  All outputs are exact integers /
    timestamps — hash-safe."""
    from fischer_spark.operators.detect import alert_for_intervals

    ev = scan_testdata(spark, sf_dir, "events")
    rate = (
        ev.groupBy(
            F.col("event_type").alias("domain"),
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("metric", F.lit("event_rate"))
        .withColumn("tag", F.lit(None).cast("string"))
    )
    return alert_for_intervals(
        rate, F.col("value") >= 3, tier="1h", for_s=3 * 3600, alertname="high_rate"
    )


# --------------------------------------------------------------------------
# O84 — cross-series aggregation + topk (PromQL `sum by ()` / `topk`)
# --------------------------------------------------------------------------

@register(
    "topk_series_events",
    """
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  tot AS (
    SELECT bucket_ts, CAST(sum(value) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n_series
    FROM pts GROUP BY 1
  ),
  ranked AS (
    SELECT domain, bucket_ts, value,
           row_number() OVER (PARTITION BY bucket_ts
                              ORDER BY value DESC, domain) AS rk
    FROM pts
  )
  SELECT r.bucket_ts, r.domain, r.value, r.rk, t.total, t.n_series,
         r.value / t.total AS share
  FROM ranked r JOIN tot t USING (bucket_ts)
  WHERE r.rk <= 3
""",
)
def topk_series_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL cross-series reads (O84): `topk(3, rate)` joined with
    `sum(rate)` per bucket — the top-3 event types each hour plus their
    share of the total.  Rank ties break on the domain label (PromQL
    leaves ties unspecified; an engine that hash-gates its results
    cannot).  Counts are exact; value/total is one deterministic double
    division.  Scale shape: both the rank window and the total agg key
    on bucket_ts — at N buckets this is perfectly parallel, and the
    WindowGroupLimit pushes the k-filter below the shuffle."""
    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.groupBy(
        F.col("event_type").alias("domain"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    tot = pts.groupBy("bucket_ts").agg(
        F.sum("value").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_series"),
    )
    w = Window.partitionBy("bucket_ts").orderBy(F.desc("value"), "domain")
    ranked = pts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    return ranked.join(tot, "bucket_ts").select(
        "bucket_ts", "domain", "value", "rk", "total", "n_series",
        (F.col("value") / F.col("total")).alias("share"),
    )


# --------------------------------------------------------------------------
# O86 — PromQL subquery: outer *_over_time over an inner stepped series
# (`max_over_time(rate(x[5m])[1h:5m])`).  The engine form composes two
# query_range passes (api.subquery_range); this fixture-level form pins
# the two-level bucketing semantics against DuckDB.
# --------------------------------------------------------------------------

@register(
    "subquery_max_rate_events",
    """
  WITH inner5 AS (
    SELECT event_type,
           CAST(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT))
                AS TIMESTAMP) AS bucket5,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(count(*) AS DOUBLE) / 300.0 AS rate
    FROM events GROUP BY 1, 2
  )
  SELECT event_type,
         CAST(to_timestamp(CAST(floor(epoch(bucket5) / 3600) * 3600 AS BIGINT))
              AS TIMESTAMP) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_samples,
         max(rate) AS max_rate,
         min(rate) AS min_rate,
         CAST(sum(cnt) AS BIGINT) AS total_events
  FROM inner5 GROUP BY 1, 2
""",
)
def subquery_max_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL subquery (O86): the inner query evaluates an event-rate at a
    5-minute step, the outer takes max/min_over_time per hour — the
    `max_over_time(rate(x[5m])[1h:5m])` shape dashboards use for "worst
    5-minute burst each hour".  The inner rate is an exact BIGINT count
    over one double division (hash-deterministic); the outer max/min act
    on those doubles identically in both engines.  Scale shape: two
    stacked partial-aggregated groupBys — the second keys on a strict
    coarsening of the first, so AQE coalesces it into the same Exchange
    lineage; no window, no raw re-scan (the engine form reads tier
    states, see api.subquery_range)."""
    ev = scan_testdata(spark, sf_dir, "events")
    b5 = F.timestamp_seconds(
        (F.unix_timestamp("ts") / 300).cast("long") * 300
    ).alias("bucket5")
    inner = ev.groupBy("event_type", b5).agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.count(F.lit(1)).cast("double") / 300.0).alias("rate"),
    )
    b1h = F.timestamp_seconds(
        (F.unix_timestamp("bucket5") / 3600).cast("long") * 3600
    ).alias("bucket_ts")
    return inner.groupBy("event_type", b1h).agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.max("rate").alias("max_rate"),
        F.min("rate").alias("min_rate"),
        F.sum("cnt").alias("total_events"),
    )


# --------------------------------------------------------------------------
# O87 — cross-family correlation: Pearson r between two series families
# over shared time buckets, exact-integer moment accumulation.
# --------------------------------------------------------------------------

@register(
    "corr_count_value_events",
    """
  WITH h AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
  ),
  m AS (
    SELECT event_type,
           CAST(count(*) AS HUGEINT) AS n,
           sum(CAST(x AS HUGEINT)) AS sx,
           sum(CAST(y AS HUGEINT)) AS sy,
           sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
           sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
           sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
    FROM h GROUP BY 1
  )
  SELECT event_type, CAST(n AS BIGINT) AS n_buckets,
         CASE WHEN n < 2 OR n*sxx - sx*sx = 0 OR n*syy - sy*sy = 0 THEN NULL
              ELSE CAST(n*sxy - sx*sy AS DOUBLE)
                   / sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                   / sqrt(CAST(n*syy - sy*sy AS DOUBLE)) END AS pearson_r
  FROM m ORDER BY 1
""",
)
def corr_count_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family Pearson correlation (O87): per event_type, the
    correlation between hourly event COUNT and hourly integer-scaled
    value SUM across the shared hour buckets — the "does volume move
    with value?" read fischer-style dashboards overlay two families
    for.  All six moments (n, Σx, Σy, Σx², Σy², Σxy) accumulate as
    exact integers (decimal(38,0) in Spark, HUGEINT in DuckDB); the
    final r is two correctly-rounded sqrts and one division over those
    exact integers, so the hash gate is bit-deterministic — this is why
    the built-in F.corr/corr() (running-mean float accumulators,
    order-dependent) is NOT used.  Scale shape: two stacked
    partial-aggregated groupBys on coarsening keys, one Exchange
    lineage, no window."""
    ev = scan_testdata(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("y"),
    )
    m = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = (n * F.col("sxx") - sx * sx).cast("double")
    vy = (n * F.col("syy") - sy * sy).cast("double")
    cov = (n * F.col("sxy") - sx * sy).cast("double")
    r = F.when(
        (n < 2) | (vx == 0.0) | (vy == 0.0), F.lit(None).cast("double")
    ).otherwise(cov / F.sqrt(vx) / F.sqrt(vy))
    return m.select(
        "event_type", F.col("n").cast("long").alias("n_buckets"),
        r.alias("pearson_r"),
    )


# --------------------------------------------------------------------------
# O88 — archive tier codec through the driver gate: tier states survive a
# Gorilla/d-o-d archive round trip bit-exactly, so the decoded rollup
# hashes equal against the plain raw-aggregation oracle.
# --------------------------------------------------------------------------

@register(
    "archive_roundtrip_1h_events",
    """
    WITH states AS (
      SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
             count(value) AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS sq,
             min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY 1, 2
    )
  SELECT domain AS series_key, bucket_ts, cnt,
         CAST(s AS DOUBLE) AS sum_v, min_v, max_v,
         CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean,
         CASE WHEN cnt < 2 THEN NULL ELSE
           sqrt(greatest((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0), 0.0))
         END AS stddev_v
  FROM states
""",
)
def archive_roundtrip_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Archive-tier codec (O88, operators/archive.py) under the oracle
    hash gate: the 1h tier states are encoded into compressed archive
    chunks (dod timestamps; gorilla over int64 bit patterns for cnt;
    two-limb int64 streams for the decimal(28,*) exact sums) and decoded
    back, then served through the same derived-stat projection as
    rollup_1h_events.  The oracle aggregates raw directly — a hash match
    therefore proves the archive round trip is bit-exact end-to-end
    (timestamps, counts, 28-digit decimal sums, double min/max), not
    just approximately right.  Scale shape: one groupBy to states, one
    applyInPandas shuffle to chunk, one mapInPandas decode — the cold
    read path exactly as production serves it."""
    from fischer_spark.operators.archive import (
        decode_state_chunks,
        encode_state_chunks,
    )
    from fischer_spark.queries import _derived_select, _events_series
    from fischer_spark.operators.rollup import rollup_points

    states = rollup_points(_events_series(spark, sf_dir), "1h")
    back = decode_state_chunks(
        encode_state_chunks(states, chunk_window="1w"), states.schema
    )
    return _derived_select(back)


@register(
    "quantile_across_series_events",
    """
  WITH pts AS (
    SELECT event_type AS domain,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
           date_trunc('hour', ts) AS bucket_ts, CAST(count(*) AS DOUBLE) AS v
    FROM events GROUP BY 1, 2, 3
  ),
  r AS (
    SELECT bucket_ts, v,
           row_number() OVER (PARTITION BY bucket_ts ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY bucket_ts) AS cnt
    FROM pts
  )
  SELECT bucket_ts, CAST(max(cnt) AS BIGINT) AS n,
         max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN v END)
         + (max(CASE WHEN rn = CAST(ceil(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN v END)
            - max(CASE WHEN rn = CAST(floor(CAST(cnt - 1 AS DOUBLE) * 0.95) AS BIGINT) + 1 THEN v END))
           * (CAST(max(cnt) - 1 AS DOUBLE) * 0.95
              - floor(CAST(max(cnt) - 1 AS DOUBLE) * 0.95)) AS value
  FROM r GROUP BY 1
""",
)
def quantile_across_series_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``quantile(0.95, rate) by ()`` (api.vector_quantile): the
    exact p95 ACROSS the 10 (event_type, parity) hourly-rate series per
    bucket — the remaining member of PromQL's vector-aggregation family
    (sum/avg/min/max/count/stddev compose via by=-state-merge; topk via
    O84; this is quantile).  Rank interpolation spelled identically in
    both engines (the O60 convention), one Exchange on the bucket shared
    by windows and the final aggregation."""
    from fischer_spark.api import vector_quantile
    from fischer_spark.sources.testdata import scan_testdata

    ev = scan_testdata(spark, sf_dir, "events")
    series = (
        ev.groupBy(
            F.col("event_type").alias("domain"),
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("tag"),
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("metric", F.lit("event_rate"))
    )
    return vector_quantile(series, 0.95, by=()).select("bucket_ts", "n", "value")


@register(
    "hist_p95_by_label_events",
    f"""
  WITH pts AS (
    SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
           date_trunc('day', ts) AS bucket_ts, value
    FROM events
  ),
  h AS (
    SELECT tag, bucket_ts, {_H_BIN_SQL} AS bin, count(*) AS bin_cnt
    FROM pts GROUP BY 1, 2, 3
  ),
  c AS (
    SELECT *,
           sum(bin_cnt) OVER (PARTITION BY tag, bucket_ts ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(bin_cnt) OVER (PARTITION BY tag, bucket_ts) AS total
    FROM h
  ),
  f AS (
    SELECT tag, bucket_ts, min(bin) AS qbin, CAST(max(total) AS BIGINT) AS n
    FROM c WHERE cum >= ceil(0.95 * total)
    GROUP BY 1, 2
  )
  SELECT tag AS label, bucket_ts, n,
         CASE WHEN qbin = -1 THEN {_H_LO}
              WHEN qbin >= {_H_BINS} THEN {_H_HI}
              ELSE {_H_LO} + (qbin + 0.5) * {_H_W} END AS quantile
  FROM f
""",
)
def hist_p95_by_label_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile vector aggregation (query_range_hist's ``by=`` surface):
    1h histogram states keyed on (event_type, parity tag) have their
    INTEGER bin counts summed across the dropped event_type dimension
    into per-(tag, day) pooled histograms before the cumulative walk —
    so the group p95 is exactly the p95 of the pooled underlying values
    (averaging per-series quantiles has no such meaning).  The oracle
    pools raw directly per (parity, day); hash match proves cross-series
    bin merging composes exactly with the tier cascade."""
    from fischer_spark.operators.histogram import hist_quantile, hist_states
    from fischer_spark.sources.testdata import scan_testdata

    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("domain"),
        F.lit("event_value").alias("metric"),
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("tag"),
        F.col("ts").alias("bucket_ts"),
        "value",
    )
    h1h = hist_states(pts, "1h", _H_LO, _H_HI, _H_BINS)
    # `by (tag)` at a 1d step: sum bin counts across (domain, metric)
    pooled = (
        h1h.groupBy(
            "tag", F.date_trunc("day", "bucket_ts").alias("bucket_ts"), "bin"
        )
        .agg(F.sum("bin_cnt").alias("bin_cnt"))
        .withColumn("domain", F.lit(None).cast("string"))
        .withColumn("metric", F.lit(None).cast("string"))
    )
    qd = hist_quantile(pooled, 0.95, _H_LO, _H_HI, _H_BINS)
    return qd.select(F.col("tag").alias("label"), "bucket_ts", "n", "quantile")


@register(
    "share_of_domain_events",
    """
  WITH l AS (
    SELECT event_type AS domain, CAST('event_rate' AS VARCHAR) AS metric,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
           date_trunc('hour', ts) AS bucket_ts, CAST(count(*) AS DOUBLE) AS v
    FROM events GROUP BY 1, 2, 3, 4
  ),
  r AS (SELECT domain, bucket_ts, sum(v) AS tot FROM l GROUP BY 1, 2)
  SELECT l.domain, l.metric, l.tag, l.bucket_ts,
         CASE WHEN r.tot <> 0 THEN l.v / r.tot END AS value
  FROM l JOIN r USING (domain, bucket_ts)
""",
)
def share_of_domain_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL many-to-one vector matching (``l / on(domain) group_left
    sum by (domain)(l)`` — operators/binop.series_binop_grouped): each
    (domain, parity-tag) hourly rate divided by its domain total; the
    result carries the left's full label set per group_left semantics,
    and the strict mode's cardinality guard rides the plan (the right
    side is unique per (domain, bucket) by construction here).  One
    window on the small aggregated side + one equi-join — no Python,
    no second scan of the fine series."""
    from fischer_spark.operators.binop import series_binop_grouped
    from fischer_spark.sources.testdata import scan_testdata

    ev = scan_testdata(spark, sf_dir, "events")
    left = (
        ev.groupBy(
            F.col("event_type").alias("domain"),
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("tag"),
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("metric", F.lit("event_rate"))
    )
    right = left.groupBy("domain", "bucket_ts").agg(F.sum("value").alias("value"))
    return series_binop_grouped(
        left, right, op="div", on=("domain",), carry=("domain", "metric", "tag")
    )


@register(
    "agg_by_label_events",
    """
    WITH states AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
             CAST(to_timestamp(CAST(floor(epoch(ts) / 7200) * 7200 AS BIGINT)) AS TIMESTAMP) AS bucket_ts,
             count(value) AS cnt,
             sum(CAST(value AS DECIMAL(28,6))) AS s,
             sum(CAST(value * value AS DECIMAL(28,12))) AS sq,
             min(value) AS min_v, max(value) AS max_v
      FROM events GROUP BY 1, 2
    )
    SELECT tag AS label, bucket_ts, cnt,
           CAST(s AS DOUBLE) AS sum_v, min_v, max_v,
           CAST(s AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean,
           CASE WHEN cnt < 2 THEN NULL ELSE
             sqrt(greatest((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                  / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0), 0.0))
           END AS stddev_v
    FROM states
""",
)
def agg_by_label_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL vector aggregation by a label dimension (query_range's
    ``by=`` surface, api.py): per-series 1h tier states — keyed on
    (event_type, tag=user parity), 10 series — are MERGED BY EXACT STATE
    ADDITION across the dropped event_type dimension at a 2h step,
    ``sum/count/min/max/mean/stddev by (tag)``.  The oracle aggregates
    raw directly per (parity, 2h); a hash match proves cross-SERIES
    state merging is the same exact algebra as cross-TIER merging —
    the property the ``by=``/``without=`` API composes onto tier reads
    (tests additionally pin query_range(by=('domain',)) == a rollup
    keyed on domain alone, bit-for-bit)."""
    from fischer_spark.operators.rollup import (
        _state_aggs,
        rollup_points,
        with_derived_stats,
    )

    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.select(
        F.col("event_type").alias("domain"),
        F.lit("event_value").alias("metric"),
        F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("tag"),
        F.col("ts").alias("bucket_ts"),
        "value",
    )
    t1h = rollup_points(pts, "1h")  # 1h states per (domain, metric, tag)
    step = F.timestamp_seconds(
        (F.unix_timestamp("bucket_ts") / 7200).cast("long") * 7200
    ).alias("bucket_ts")
    # `by (tag)`: drop domain/metric from the grouping — state addition
    # across series, exactly what query_range(by=("tag",)) performs
    merged = t1h.groupBy("tag", step).agg(*_state_aggs("decimal"))
    d = with_derived_stats(merged)
    return d.select(
        F.col("tag").alias("label"), "bucket_ts", "cnt",
        F.col("sum").cast("double").alias("sum_v"),
        F.col("min").alias("min_v"), F.col("max").alias("max_v"),
        "mean", F.col("stddev").alias("stddev_v"),
    )


@register(
    "archive_roundtrip_hist_1h_events",
    """
    SELECT event_type AS series_key, date_trunc('hour', ts) AS bucket_ts,
           CASE WHEN value < 0.0 THEN -1
                WHEN value >= 100.0 THEN 25
                ELSE CAST(floor((value - 0.0) / 4.0) AS INTEGER) END AS bin,
           count(*) AS bin_cnt
    FROM events WHERE value IS NOT NULL
    GROUP BY 1, 2, 3
""",
)
def archive_roundtrip_hist_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-tier archive codec under the oracle hash gate (the
    percentile-family analogue of archive_roundtrip_1h_events): the 1h
    long-form histogram states — several (bin, count) rows per bucket,
    int32 bin indices, int64 counts — are encoded into compressed
    archive chunks (dod over duplicate-heavy timestamps; gorilla'd
    int64 bit patterns for bins and counts) and decoded back.  The
    oracle re-derives the binning from raw with the same IEEE-exact
    floor arithmetic (lo=0, hi=100, 25 bins, width exactly 4.0), so a
    hash match proves the long-form archive round trip is bit-exact —
    which is what lets --archive cover the percentile surface and
    query_range_hist(include_archive=True) read across the hot/cold
    boundary without approximation."""
    from fischer_spark.operators.archive import (
        decode_state_chunks,
        encode_state_chunks,
    )
    from fischer_spark.operators.histogram import hist_states
    from fischer_spark.queries import _events_series

    h = hist_states(_events_series(spark, sf_dir), "1h", lo=0.0, hi=100.0, n_bins=25)
    back = decode_state_chunks(
        encode_state_chunks(h, chunk_window="1w"), h.schema
    )
    return back.select(
        F.col("domain").alias("series_key"), "bucket_ts", "bin", "bin_cnt"
    )


# --------------------------------------------------------------------------
# O101 — PromQL long-tail completions on the O84/O91/O98 machinery:
# bottomk, count_values, irate/idelta, label_replace/label_join, and the
# mirrored group_right matching (VERDICT r4 next #2/#4).
# --------------------------------------------------------------------------

@register(
    "bottomk_series_events",
    """
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  tot AS (
    SELECT bucket_ts, CAST(sum(value) AS DOUBLE) AS total,
           CAST(count(*) AS BIGINT) AS n_series
    FROM pts GROUP BY 1
  ),
  ranked AS (
    SELECT domain, bucket_ts, value,
           row_number() OVER (PARTITION BY bucket_ts
                              ORDER BY value ASC, domain) AS rk
    FROM pts
  )
  SELECT r.bucket_ts, r.domain, r.value, r.rk, t.total, t.n_series,
         r.value / t.total AS share
  FROM ranked r JOIN tot t USING (bucket_ts)
  WHERE r.rk <= 3
""",
)
def bottomk_series_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``bottomk(3, rate)`` (O101): O84's rank flipped ascending —
    the three QUIETEST event types each hour plus their share of the
    total.  Ties break on the domain label, same determinism convention
    as topk.  Scale shape identical to topk_series_events: rank window
    and total agg both key on bucket_ts, WindowGroupLimit pushes the
    k-filter below the shuffle."""
    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.groupBy(
        F.col("event_type").alias("domain"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))
    tot = pts.groupBy("bucket_ts").agg(
        F.sum("value").cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_series"),
    )
    w = Window.partitionBy("bucket_ts").orderBy(F.asc("value"), "domain")
    ranked = pts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 3)
    return ranked.join(tot, "bucket_ts").select(
        "bucket_ts", "domain", "value", "rk", "total", "n_series",
        (F.col("value") / F.col("total")).alias("share"),
    )


@register(
    "count_values_events",
    """
  WITH pts AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS value
    FROM events GROUP BY 1, 2
  )
  SELECT bucket_ts, value, CAST(count(*) AS BIGINT) AS n_series
  FROM pts GROUP BY 1, 2
""",
)
def count_values_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``count_values("value", v)`` (O101): how many series share
    each exact sample value per bucket — here, how many event types had
    the same hourly event count (value histograms over a vector; the
    cardinality/`le`-style read).  Exact BIGINTs throughout, hash-safe.
    Scale shape: two stacked partial-aggregated groupBys; the second
    keys on (bucket, value) — higher cardinality than the first, but
    each group is tiny and the map-side combine keeps the shuffle at
    one row per distinct (bucket, value) per task."""
    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("value"))
    return pts.groupBy("bucket_ts", "value").agg(
        F.count(F.lit(1)).alias("n_series")
    )


@register(
    "irate_events",
    """
  WITH s AS (
    SELECT event_type, ts, event_id, value,
           lag(value) OVER w AS pv,
           lag(epoch_us(ts)) OVER w AS pus,
           epoch_us(ts) AS us
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
  ),
  lastrow AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts, value, pv, us, pus,
           row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM s
  )
  SELECT event_type, bucket_ts,
         CASE WHEN pv IS NOT NULL AND us - pus > 0 THEN
           (CASE WHEN value >= pv THEN value - pv ELSE value END)
           / (CAST(us - pus AS DOUBLE) / 1000000.0) END AS irate,
         value - pv AS idelta
  FROM lastrow WHERE rn = 1
""",
)
def irate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``irate()`` / ``idelta()`` (O101): per (series, hour), the
    instant rate/delta between the bucket's LAST sample and its series
    predecessor — wherever that predecessor falls, exactly PromQL's
    "last two samples in the range" (operators/counters.py
    instant_transforms).  irate is reset-aware (a drop means the counter
    restarted from 0); idelta is the plain gauge difference.  Elapsed
    time is integer microseconds with one double division — hash-safe.
    Scale shape: the lag window and the keep-last window both hash on
    event_type (the second refines by bucket), so one Exchange serves
    both; deterministic ordering ties break on event_id."""
    from fischer_spark.operators.counters import instant_transforms

    ev = scan_testdata(spark, sf_dir, "events")
    inst = instant_transforms(
        ev, ["event_type"], ["ts", "event_id"], ts_col="ts", val_col="value"
    ).withColumn("bucket_ts", F.date_trunc("hour", "ts"))
    w = Window.partitionBy("event_type", "bucket_ts").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        inst.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", "bucket_ts", "irate", "idelta")
    )


@register(
    "label_ops_events",
    r"""
  WITH pts AS (
    SELECT event_type AS domain, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
  )
  SELECT domain, bucket_ts, n,
         CASE WHEN regexp_matches(domain, '^(?:(click|view))$')
              THEN regexp_replace(domain, '^(?:(click|view))$', '\1_ui')
              END AS family,
         concat_ws(':', domain,
           CASE WHEN regexp_matches(domain, '^(?:(click|view))$')
                THEN regexp_replace(domain, '^(?:(click|view))$', '\1_ui')
                END) AS joined
  FROM pts
""",
)
def label_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``label_replace`` + ``label_join`` (O101,
    functions/labels.py): derive a ``family`` label from the domain via
    an anchored capture-group regex (UI events get ``<type>_ui``; others
    keep their absent/NULL family, per PromQL's no-match = unchanged
    rule), then join (domain, family) into one routing key.  Pure
    codegen projections — zero extra Exchanges over the underlying
    aggregation."""
    from fischer_spark.functions.labels import label_join, label_replace

    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.groupBy(
        F.col("event_type").alias("domain"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("n"))
    out = label_replace(pts, "family", "$1_ui", "domain", "(click|view)")
    out = label_join(out, "joined", ":", "domain", "family")
    return out.select("domain", "bucket_ts", "n", "family", "joined")


@register(
    "share_of_type_right_events",
    """
  WITH r AS (
    SELECT event_type AS domain, CAST('event_rate' AS VARCHAR) AS metric,
           CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tag,
           date_trunc('hour', ts) AS bucket_ts, CAST(count(*) AS DOUBLE) AS v
    FROM events GROUP BY 1, 2, 3, 4
  ),
  l AS (SELECT domain, bucket_ts, sum(v) AS tot FROM r GROUP BY 1, 2)
  SELECT r.domain, r.metric, r.tag, r.bucket_ts, l.tot / r.v AS value
  FROM r JOIN l USING (domain, bucket_ts)
""",
)
def share_of_type_right_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ONE-TO-MANY matching (``sum by (domain)(l) / on(domain)
    group_right l`` — series_binop_grouped(group="right"), O101): the
    domain total divided by each (domain, parity-tag) series — the
    many side is on the RIGHT, the result carries the right's label
    set, and operand order is preserved (total/series, the inverse
    share).  Strictness guards the LEFT (aggregate) side.  Same
    one-window + one-equi-join shape as the group_left oracle."""
    from fischer_spark.operators.binop import series_binop_grouped

    ev = scan_testdata(spark, sf_dir, "events")
    right = (
        ev.groupBy(
            F.col("event_type").alias("domain"),
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd").alias("tag"),
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("metric", F.lit("event_rate"))
    )
    left = right.groupBy("domain", "bucket_ts").agg(F.sum("value").alias("value"))
    return series_binop_grouped(
        left, right, op="div", on=("domain",),
        carry=("domain", "metric", "tag"), group="right",
    )


# --------------------------------------------------------------------------
# O114 — PromQL rate()/increase() with REAL window-boundary extrapolation
# (promql/functions.go extrapolatedRate, public semantics).  The exact
# per-sample transforms above deliberately skip extrapolation (it is a
# presentation-layer estimate); this is the explicit opt-in that matches
# what a Prometheus graph shows.  Synthesized mod-1000 counter, hourly
# windows, every double op in a pinned order shared with the oracle.
# --------------------------------------------------------------------------

@register(
    "rate_extrapolated_events",
    """
  WITH c AS (
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(floor(abs(value) * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) % 1000 AS counter
    FROM events
  ),
  one AS (
    SELECT user_id, ts, counter FROM (
      SELECT user_id, ts, counter,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
      FROM c) WHERE rn = 1
  ),
  s AS (
    SELECT user_id, date_trunc('hour', ts) AS bucket_ts, counter,
           epoch_us(ts) AS us,
           epoch_us(date_trunc('hour', ts)) AS bus,
           lag(counter) OVER w AS pv
    FROM one
    WINDOW w AS (PARTITION BY user_id, date_trunc('hour', ts) ORDER BY ts)
  ),
  g AS (
    SELECT user_id, bucket_ts,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN pv IS NULL THEN NULL
                         WHEN counter >= pv THEN counter - pv
                         ELSE counter END) AS BIGINT) AS raw,
           min(us) AS us_first, max(us) AS us_last,
           arg_min(counter, us) AS v_first,
           min(bus) AS bus0
    FROM s GROUP BY 1, 2
  ),
  e AS (
    SELECT user_id, bucket_ts, n, raw,
           CAST(us_last - us_first AS DOUBLE) / 1000000.0 AS sampled,
           CAST(us_first - bus0 AS DOUBLE) / 1000000.0 AS d_start_raw,
           CAST(bus0 + 3600000000 - us_last AS DOUBLE) / 1000000.0 AS d_end_raw,
           v_first
    FROM g WHERE n >= 2 AND us_last > us_first
  ),
  t AS (
    SELECT *, sampled / CAST(n - 1 AS DOUBLE) AS avg_iv,
           (sampled / CAST(n - 1 AS DOUBLE)) * 1.1 AS thresh
    FROM e
  ),
  d AS (
    SELECT user_id, bucket_ts, n, raw, sampled,
           CASE WHEN raw > 0 AND v_first >= 0
                THEN least(
                  CASE WHEN d_start_raw >= thresh THEN avg_iv / 2.0
                       ELSE d_start_raw END,
                  sampled * (CAST(v_first AS DOUBLE) / CAST(raw AS DOUBLE)))
                ELSE CASE WHEN d_start_raw >= thresh THEN avg_iv / 2.0
                          ELSE d_start_raw END END AS d_start,
           CASE WHEN d_end_raw >= thresh THEN avg_iv / 2.0
                ELSE d_end_raw END AS d_end
    FROM t
  )
  SELECT user_id, bucket_ts, n, raw,
         CAST(raw AS DOUBLE) * ((sampled + d_start + d_end) / sampled)
           AS increase_ext,
         CAST(raw AS DOUBLE) * (((sampled + d_start + d_end) / sampled)
                                / 3600.0) AS rate_ext
  FROM d
""",
)
def rate_extrapolated_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``rate(counter[1h])`` / ``increase(counter[1h])`` with the
    genuine Prometheus boundary extrapolation (O114,
    operators/counters.py extrapolated_rate): per (user, hour), the
    reset-aware in-window increase scaled by
    ``(sampled + d_start + d_end) / sampled`` with the average-interval
    snap rule and the counter time-to-zero cap.  Hourly windows over the
    synthesized mod-1000 counter (one deterministic sample per (user,
    ts): the max-event_id row — PromQL series have unique timestamps).
    Integer microseconds until the pinned double divisions, so the
    oracle replays the identical IEEE754 op sequence.  Scale shape: the
    in-bucket lag window and the groupBy hash on the same (user, bucket)
    columns — one Exchange serves both."""
    from fischer_spark.operators.counters import extrapolated_rate

    d = scan_testdata(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    step = F.floor(F.abs(F.col("value")) * 100).cast("long")
    c = d.select(
        "event_id",
        "user_id",
        "ts",
        (F.sum(step).over(w) % 1000).alias("counter"),
    )
    wd = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    one = (
        c.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "counter")
    )
    b = one.withColumn("bucket_ts", F.date_trunc("hour", "ts"))
    return extrapolated_rate(
        b, ["user_id"], "bucket_ts", 3600, ts_col="ts", val_col="counter"
    )


# --------------------------------------------------------------------------
# O115 — Tukey-fence IQR outliers (Tukey 1977 box-plot rule): the
# non-parametric member of the detector family.  Hourly event counts per
# (event_type, day); exact rank-lerp q1/q3 over the day's 24 values;
# fences at 1.5*IQR.  Integer values keep the lerp/fence doubles on the
# pinned expression tree both engines.
# --------------------------------------------------------------------------

@register(
    "iqr_outliers_events",
    f"""
  WITH pts AS (
    SELECT event_type, date_trunc('day', ts) AS day_ts,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS value
    FROM events GROUP BY 1, 2, 3
  ),
  g AS (
    SELECT event_type, day_ts, list_sort(list(value)) AS arr
    FROM pts GROUP BY 1, 2
  ),
  q AS (
    SELECT event_type, day_ts, CAST(len(arr) AS BIGINT) AS n,
           {_lerp_sql('arr', '0.25')} AS q1,
           {_lerp_sql('arr', '0.75')} AS q3
    FROM g
  )
  SELECT p.event_type, p.day_ts, p.bucket_ts, p.value, q.n,
         q.q1, q.q3, q.q3 - q.q1 AS iqr,
         q.q1 - 1.5 * (q.q3 - q.q1) AS lo_fence,
         q.q3 + 1.5 * (q.q3 - q.q1) AS hi_fence,
         CASE WHEN CAST(p.value AS DOUBLE) < q.q1 - 1.5 * (q.q3 - q.q1)
                OR CAST(p.value AS DOUBLE) > q.q3 + 1.5 * (q.q3 - q.q1)
              THEN 1 ELSE 0 END AS is_outlier
  FROM pts p JOIN q USING (event_type, day_ts)
""",
)
def iqr_outliers_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence IQR outliers (O115, operators/detect.py
    iqr_outliers): hourly event-count series flagged against the exact
    q1/q3 fences of their own (event_type, day) — the non-parametric
    complement to zscore_events_1h (no normality assumption; robust to
    the skew hot domains put in rate series).  Values are exact BIGINT
    counts, so the only doubles are the shared lerp/fence expressions —
    bit-exact cross-engine.  Scale shape: one Exchange on (series, day),
    partition-frame collect_list over 24 values, all codegen (the Spark
    side fuses the quantile into the same window pass; the oracle
    spells it as a grouped join — same rows either way)."""
    from fischer_spark.operators.detect import iqr_outliers

    ev = scan_testdata(spark, sf_dir, "events")
    pts = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").alias("day_ts"),
        F.date_trunc("hour", "ts").alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("value"))
    return iqr_outliers(pts, ["event_type", "day_ts"], ts_col="bucket_ts")


# --------------------------------------------------------------------------
# O116 — PromQL scalar vector functions (functions/scalars.py): clamp /
# clamp_min / clamp_max / sgn / round(v, to_nearest) over the hourly
# exact-decimal mean series.  Pure codegen expressions, zero shuffles
# past the rollup; the round inverse literal is computed once in Python
# so both engines replay the identical three float ops.
# --------------------------------------------------------------------------

@register(
    "scalar_fns_events",
    f"""
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(value) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  )
  SELECT event_type, bucket_ts, value,
         greatest(50.0, least(200.0, value)) AS clamped,
         greatest(100.0, value) AS clamped_min,
         least(100.0, value) AS clamped_max,
         CASE WHEN value - 100.0 > 0 THEN 1.0
              WHEN value - 100.0 < 0 THEN -1.0
              ELSE 0.0 END AS sign_dev,
         CAST(floor(value * 2.0 + 0.5) AS DOUBLE) / 2.0 AS rounded_half
  FROM s
""",
)
def scalar_fns_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL scalar functions (O116, functions/scalars.py): clamp to
    [50, 200], one-sided clamps at 100, sgn of the deviation from 100,
    and round to the nearest 0.5 — each the public promql/functions.go
    definition as a pure codegen column expression over the hourly
    exact-decimal mean series (no shuffle beyond the rollup's own).
    clamp picks one of two bit-identical doubles (greatest/least);
    round replays floor(v*inv + 0.5)/inv with the Python-computed
    inverse literal — deterministic both engines."""
    from fischer_spark.functions.scalars import (
        clamp,
        clamp_max,
        clamp_min,
        round_to,
        sgn,
    )

    series = _hourly_exact_mean_series(spark, sf_dir)
    v = F.col("value")
    return series.select(
        "event_type",
        "bucket_ts",
        "value",
        clamp(v, 50.0, 200.0).alias("clamped"),
        clamp_min(v, 100.0).alias("clamped_min"),
        clamp_max(v, 100.0).alias("clamped_max"),
        sgn(v - F.lit(100.0)).alias("sign_dev"),
        round_to(v, 0.5).alias("rounded_half"),
    )


# --------------------------------------------------------------------------
# O118 — PromQL histogram_avg / histogram_stddev on the hist tier
# (operators/histogram.py hist_avg_stddev): midpoint-mass mean/stddev
# with exact BIGINT moment sums (integer weights u = 2*bin+1, clamped
# under/overflow), doubles only in the pinned closing expressions.
# --------------------------------------------------------------------------

@register(
    "hist_avg_1h_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, CAST('event_value' AS VARCHAR) AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('hour', ts) AS bucket_ts, value
    FROM events
  ),
  h AS (
    SELECT domain, metric, tag, bucket_ts, {_H_BIN_SQL} AS bin,
           count(*) AS bin_cnt
    FROM pts GROUP BY 1, 2, 3, 4, 5
  ),
  g AS (
    SELECT domain, metric, tag, bucket_ts,
           CAST(sum(bin_cnt) AS BIGINT) AS n,
           CAST(sum(bin_cnt * (CASE WHEN bin = -1 THEN 0
                                    WHEN bin >= {_H_BINS} THEN {2 * _H_BINS}
                                    ELSE bin * 2 + 1 END)) AS BIGINT) AS s1,
           CAST(sum(bin_cnt * (CASE WHEN bin = -1 THEN 0
                                    WHEN bin >= {_H_BINS} THEN {2 * _H_BINS}
                                    ELSE bin * 2 + 1 END)
                            * (CASE WHEN bin = -1 THEN 0
                                    WHEN bin >= {_H_BINS} THEN {2 * _H_BINS}
                                    ELSE bin * 2 + 1 END)) AS BIGINT) AS s2
    FROM h GROUP BY 1, 2, 3, 4
  )
  SELECT domain, metric, tag, bucket_ts, n,
         0.0 + 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           AS avg_est,
         sqrt(greatest(
           (0.0 + 0.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
            + 16.0 * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)))
           - (0.0 + 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             * (0.0 + 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))),
           0.0)) AS stddev_est
  FROM g
""",
)
def hist_avg_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL ``histogram_avg`` / ``histogram_stddev`` (O118,
    operators/histogram.py hist_avg_stddev): per (series key, hour),
    the midpoint-mass mean and stddev estimates read from the SAME
    long-form 1h histogram tier as the percentile/fraction queries —
    exact integer moment sums, pinned closing doubles, one
    conditional-sum groupBy with map-side partial agg."""
    from fischer_spark.operators.histogram import hist_avg_stddev, hist_states
    from fischer_spark.queries import _events_series

    h1h = hist_states(_events_series(spark, sf_dir), "1h", _H_LO, _H_HI, _H_BINS)
    return hist_avg_stddev(h1h, _H_LO, _H_HI, _H_BINS)


# --------------------------------------------------------------------------
# O119 — classic-Prometheus cumulative bucket export (operators/
# histogram.py hist_cumulative): the long-form tier as metric_bucket
# {le=...} rows — the federation/Grafana-heatmap read.
# --------------------------------------------------------------------------

@register(
    "hist_cumulative_1h_events",
    f"""
  WITH pts AS (
    SELECT event_type AS domain, CAST('event_value' AS VARCHAR) AS metric,
           CAST(NULL AS VARCHAR) AS tag,
           date_trunc('hour', ts) AS bucket_ts, value
    FROM events
  ),
  h AS (
    SELECT domain, metric, tag, bucket_ts, {_H_BIN_SQL} AS bin,
           count(*) AS bin_cnt
    FROM pts GROUP BY 1, 2, 3, 4, 5
  )
  SELECT domain, metric, tag, bucket_ts,
         CASE WHEN bin >= {_H_BINS} THEN CAST('infinity' AS DOUBLE)
              ELSE 0.0 + CAST(bin + 1 AS DOUBLE) * 8.0 END AS le,
         CAST(sum(bin_cnt) OVER (PARTITION BY domain, metric, tag, bucket_ts
                                 ORDER BY bin ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_cnt
  FROM h
""",
)
def hist_cumulative_1h_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative le-bucket export (O119, operators/histogram.py
    hist_cumulative): the 1h histogram tier rendered as classic
    Prometheus metric_bucket{le=...} rows (overflow bin = le=+Inf,
    IEEE infinity both engines).  Exact integer running counts, one
    window on the tier's own (key, bucket) Exchange."""
    from fischer_spark.operators.histogram import hist_cumulative, hist_states
    from fischer_spark.queries import _events_series

    h1h = hist_states(_events_series(spark, sf_dir), "1h", _H_LO, _H_HI, _H_BINS)
    return hist_cumulative(h1h, _H_LO, _H_HI, _H_BINS)


# --------------------------------------------------------------------------
# O121 — CUSUM change-point detector (Page 1954): accumulates small
# persistent mean shifts the z-score/seasonal detectors structurally
# miss.  Sequential state under the FULL oracle via the holt_exact
# recursive-CTE move: the CTE replays the kernel's exact double op
# sequence ((x − target) + prev − k, then max with 0).
# --------------------------------------------------------------------------

_CUSUM_K = 25.0   # ~0.75 sigma of the hourly deviations (sigma~33)
_CUSUM_H = 150.0  # ~4.5 sigma decision interval (ARL-style tuning)


@register(
    "cusum_events",
    f"""
  WITH RECURSIVE s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(value) AS DOUBLE) AS value
    FROM events GROUP BY 1, 2
  ),
  mu AS (
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
             / CAST(count(value) AS DOUBLE) AS target
    FROM events GROUP BY 1
  ),
  n AS (
    SELECT s.event_type, s.bucket_ts, s.value, mu.target,
           row_number() OVER (PARTITION BY s.event_type
                              ORDER BY s.bucket_ts) AS rn
    FROM s JOIN mu USING (event_type)
  ),
  rec AS (
    SELECT event_type, bucket_ts, value, target, rn,
           greatest(0.0, 0.0 + (value - target) - {_CUSUM_K!r}) AS sp,
           greatest(0.0, 0.0 - (value - target) - {_CUSUM_K!r}) AS sn
    FROM n WHERE rn = 1
    UNION ALL
    SELECT n.event_type, n.bucket_ts, n.value, n.target, n.rn,
           greatest(0.0, rec.sp + (n.value - n.target) - {_CUSUM_K!r}) AS sp,
           greatest(0.0, rec.sn - (n.value - n.target) - {_CUSUM_K!r}) AS sn
    FROM n JOIN rec ON n.event_type = rec.event_type AND n.rn = rec.rn + 1
  )
  SELECT event_type, bucket_ts, value, target, sp, sn,
         CASE WHEN sp > {_CUSUM_H!r} OR sn > {_CUSUM_H!r} THEN 1 ELSE 0 END
           AS alarm
  FROM rec
""",
)
def cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scores (O121, operators/detect.py
    cusum_scores) on the hourly exact-decimal mean series per
    event_type, in-control target = the series' exact-decimal global
    mean (broadcast join), k=25 (~0.75 sigma of the hourly deviations) / h=150 (~4.5 sigma)
    shared literals — the standard ARL-style CUSUM tuning, alarming on
    ~1-4%% of buckets at both test SFs instead of saturating.
    Sequential recurrence ⇒ grouped Arrow kernel (ONE series-key
    Exchange); the DuckDB recursive CTE replays the identical double op
    sequence, so even the accumulated state is bit-exact cross-engine
    (the holt_exact move)."""
    from fischer_spark.operators.detect import cusum_scores

    d = scan_testdata(spark, sf_dir, "events")
    series = d.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count("value").cast("double")
        ).alias("value")
    )
    target = d.groupBy("event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
            / F.count("value").cast("double")
        ).alias("target")
    )
    j = series.join(F.broadcast(target), "event_type")
    return cusum_scores(
        j, ["event_type"], k=_CUSUM_K, h=_CUSUM_H
    ).select("event_type", "bucket_ts", "value", "target", "sp", "sn", "alarm")


# --------------------------------------------------------------------------
# O122 — rolling cross-family Pearson correlation (operators/overtime.py
# corr_over_time): trailing 24h window, exact BIGINT moments (counts ×
# integer cents), r one pinned double expression — the windowed
# complement of corr_count_value_events.
# --------------------------------------------------------------------------

@register(
    "corr_over_time_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(floor(abs(value) * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2
  ),
  m AS (
    SELECT event_type, bucket_ts, x, y,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(x) OVER w AS BIGINT) AS sx,
           CAST(sum(y) OVER w AS BIGINT) AS sy,
           CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
           CAST(sum(y * y) OVER w AS BIGINT) AS syy,
           CAST(sum(x * y) OVER w AS BIGINT) AS sxy
    FROM s
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                 ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
  )
  SELECT event_type, bucket_ts, x, y, n,
         CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
           CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         END AS corr
  FROM m
""",
)
def corr_over_time_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-bucket Pearson correlation between the hourly event
    COUNT and the hourly integer-cents VALUE volume per event_type
    (O122, operators/overtime.py corr_over_time) — "is rate still
    tracking volume this day?", the windowed form of the global
    corr_count_value_events.  Both inputs exact integers, so the five
    trailing moments are exact BIGINTs and r is one pinned double
    expression — bit-exact cross-engine.  One Exchange on the series
    key; all five moments share a single Window node."""
    from fischer_spark.operators.overtime import corr_over_time

    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.floor(F.abs(F.col("value")) * 100).cast("long")).alias("y"),
    )
    return corr_over_time(s, ["event_type"], "x", "y", w=24)


# --------------------------------------------------------------------------
# O124 — rolling exact distinct users (sliding DAU/WAU): trailing
# 24-bucket distinct-user count per series, entirely as codegen array
# ops (collect_set per bucket, flatten+distinct over the frame).
# Set sizes are order-free integers — hash-safe by construction.
# --------------------------------------------------------------------------

@register(
    "rolling_distinct_users_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           list(DISTINCT user_id) AS us
    FROM events GROUP BY 1, 2
  )
  SELECT event_type, bucket_ts,
         CAST(len(us) AS BIGINT) AS hourly_users,
         CAST(len(list_distinct(flatten(list(us) OVER w))) AS BIGINT)
           AS rolling_users,
         CAST(count(*) OVER w AS BIGINT) AS n_buckets
  FROM s
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
""",
)
def rolling_distinct_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24h exact distinct users per event_type (O124) — the
    sliding DAU/WAU read every product dashboard wants and plain
    tier states cannot answer (distinct does not sum across buckets).
    Mechanism: per-bucket collect_set (the only shuffle — the series
    key Exchange), then flatten + array_distinct over a trailing ROWS
    frame, all whole-stage-codegen array expressions; counts are
    order-free exact integers, so the oracle matches regardless of set
    order.  Frame memory is O(w x per-bucket distinct) — bounded, and
    at the 100 TB design point this runs on per-bucket user SETS (the
    cardinality-reduced tier), never raw events.  The exact complement
    of approx_distinct_users_events' HLL sketch."""
    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.collect_set("user_id").alias("us"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-23, Window.currentRow)
    )
    return s.select(
        "event_type",
        "bucket_ts",
        F.size("us").cast("long").alias("hourly_users"),
        F.size(F.array_distinct(F.flatten(F.collect_list("us").over(win))))
        .cast("long")
        .alias("rolling_users"),
        F.count(F.lit(1)).over(win).cast("long").alias("n_buckets"),
    )


# --------------------------------------------------------------------------
# O125 — daily Spearman rank correlation (operators/overtime.py
# spearman_grouped): per (event_type, day), rank the 24 hourly counts
# and the 24 hourly cents-volumes, Pearson over the integer ranks.
# --------------------------------------------------------------------------

@register(
    "spearman_daily_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(floor(abs(value) * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2, 3
  ),
  r AS (
    SELECT event_type, day,
           CAST(row_number() OVER (PARTITION BY event_type, day
                                   ORDER BY x, bucket_ts) AS BIGINT) AS rx,
           CAST(row_number() OVER (PARTITION BY event_type, day
                                   ORDER BY y, bucket_ts) AS BIGINT) AS ry
    FROM s
  ),
  m AS (
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rx) AS BIGINT) AS sx, CAST(sum(ry) AS BIGINT) AS sy,
           CAST(sum(rx * rx) AS BIGINT) AS sxx,
           CAST(sum(ry * ry) AS BIGINT) AS syy,
           CAST(sum(rx * ry) AS BIGINT) AS sxy
    FROM r GROUP BY 1, 2
  )
  SELECT event_type, day, n,
         CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
           CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         END AS rho
  FROM m
""",
)
def spearman_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Spearman rank correlation between hourly event COUNT and
    hourly integer-cents VALUE volume per event_type (O125,
    operators/overtime.py spearman_grouped) — the robust sibling of
    corr_over_time_events: a single spiky hour moves it by at most one
    rank.  Ranks are row_number over (value, bucket_ts) — a
    deterministic total order, so both engines assign the identical
    1..n permutation and every moment is an exact BIGINT; rho is the
    pinned two-sqrt expression.  One Exchange on (event_type, day)
    feeds both rank windows and the final aggregate."""
    from fischer_spark.operators.overtime import spearman_grouped

    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.floor(F.abs(F.col("value")) * 100).cast("long")).alias("y"),
    )
    return spearman_grouped(s, ["event_type", "day"], "x", "y")


# --------------------------------------------------------------------------
# O126 — Theil–Sen robust daily trend (operators/trend.py
# theil_sen_slope): median of the 276 pairwise hourly slopes per day.
# --------------------------------------------------------------------------

@register(
    "theil_sen_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           CAST(date_part('hour', ts) AS BIGINT) AS h,
           CAST(sum(CAST(floor(abs(value) * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2, 3
  ),
  pairs AS (
    SELECT a.event_type, a.day,
           CAST(b.y - a.y AS DOUBLE) / CAST(b.h - a.h AS DOUBLE) AS slope,
           a.h AS xi, b.h AS xj
    FROM s a JOIN s b
      ON a.event_type = b.event_type AND a.day = b.day AND a.h < b.h
  ),
  ranked AS (
    SELECT event_type, day, slope,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY slope, xi, xj) AS rn,
           CAST(count(*) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
    FROM pairs
  )
  SELECT event_type, day, slope AS ts_slope, n AS n_pairs
  FROM ranked
  WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0) AS INT)
""",
)
def theil_sen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope of the hourly cents-volume series per
    (event_type, day) (O126, operators/trend.py theil_sen_slope): the
    DISCRETE median (lower-middle element under the (slope, xi, xj)
    total order — no interpolation arithmetic to diverge) of all 276
    pairwise slopes over the day's 24 integer-hour buckets.  Integer
    inputs ⇒ each slope is one exact subtraction pair + one double
    division; the intra-group self-join keys ON the group, so pairs
    never cross partitions and w=24 bounds the quadratic.  The robust
    complement of deriv_predict_events' least-squares fit."""
    from fischer_spark.operators.trend import theil_sen_slope

    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.hour(F.col("ts")).cast("long").alias("h"),
    ).agg(F.sum(F.floor(F.abs(F.col("value")) * 100).cast("long")).alias("y"))
    return theil_sen_slope(s, ["event_type", "day"], "h", "y")


# --------------------------------------------------------------------------
# O127 — cohort retention matrix: users bucketed by first-seen day,
# distinct-active counts at each day offset — exact integers throughout.
# --------------------------------------------------------------------------

@register(
    "cohort_retention_events",
    """
  WITH firsts AS (
    SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
    FROM events GROUP BY 1
  ),
  activity AS (
    SELECT DISTINCT e.user_id, f.cohort_day,
           CAST((epoch(date_trunc('day', e.ts)) - epoch(f.cohort_day))
                / 86400 AS BIGINT) AS day_offset
    FROM events e JOIN firsts f USING (user_id)
  ),
  sizes AS (
    SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
    FROM firsts GROUP BY 1
  )
  SELECT a.cohort_day, a.day_offset,
         CAST(count(*) AS BIGINT) AS active_users,
         min(s.cohort_users) AS cohort_users
  FROM activity a JOIN sizes s USING (cohort_day)
  GROUP BY 1, 2
""",
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (O127): users bucketed by FIRST-seen day,
    then for each (cohort_day, day_offset) the exact distinct count of
    cohort members active that day, alongside the cohort's size — the
    classic retention triangle every growth dashboard reads, and a
    shape tier states cannot answer (distinct does not sum).  All
    columns are exact integers — hash-safe by construction.  Scale
    shape: one user-keyed partial-aggregated groupBy (firsts), one
    user-keyed equi-join back (co-partitioned with the groupBy — AQE
    reuses the Exchange), DISTINCT collapses to per-(user, day) rows
    BEFORE the matrix aggregate, and the sizes join is a broadcast
    (cohort days are few).  No window, no Python."""
    ev = scan_testdata(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    firsts = ev.groupBy("user_id").agg(F.min(day).alias("cohort_day"))
    activity = (
        ev.select("user_id", day.alias("day"))
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            ((F.unix_seconds(F.col("day")) - F.unix_seconds(F.col("cohort_day")))
             / 86400).cast("long").alias("day_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    return (
        activity.join(F.broadcast(sizes), "cohort_day")
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.count(F.lit(1)).cast("long").alias("active_users"),
            F.min("cohort_users").alias("cohort_users"),
        )
    )


# --------------------------------------------------------------------------
# O129 — autocorrelation function (operators/overtime.py acf_grouped):
# per event_type, Pearson r between the hourly count series and itself
# at lags 1/2/3/6/12/24 — the periodicity read (a daily cycle peaks at
# lag 24).  Oracle generated per-lag, mirroring the conditional-sum
# moments exactly.
# --------------------------------------------------------------------------

_ACF_LAGS = [1, 2, 3, 6, 12, 24]


def _acf_oracle(lags: list[int]) -> str:
    lag_cols = ",\n           ".join(
        f"lag(x, {k}) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS l{k}"
        for k in lags
    )
    moments = ",\n           ".join(
        f"CAST(count(l{k}) AS BIGINT) AS n{k},\n           "
        f"CAST(sum(CASE WHEN l{k} IS NOT NULL THEN x END) AS BIGINT) AS sa{k},\n           "
        f"CAST(sum(l{k}) AS BIGINT) AS sb{k},\n           "
        f"CAST(sum(CASE WHEN l{k} IS NOT NULL THEN x * x END) AS BIGINT) AS saa{k},\n           "
        f"CAST(sum(l{k} * l{k}) AS BIGINT) AS sbb{k},\n           "
        f"CAST(sum(CASE WHEN l{k} IS NOT NULL THEN x END * l{k}) AS BIGINT) AS sab{k}"
        for k in lags
    )
    arms = "\n  UNION ALL\n".join(
        f"""  SELECT event_type, CAST({k} AS BIGINT) AS lag, n{k} AS n,
         CASE WHEN n{k} * saa{k} - sa{k} * sa{k} > 0
               AND n{k} * sbb{k} - sb{k} * sb{k} > 0 THEN
           CAST(n{k} * sab{k} - sa{k} * sb{k} AS DOUBLE)
           / (sqrt(CAST(n{k} * saa{k} - sa{k} * sa{k} AS DOUBLE))
              * sqrt(CAST(n{k} * sbb{k} - sb{k} * sb{k} AS DOUBLE)))
         END AS acf
  FROM m"""
        for k in lags
    )
    return f"""
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
  ),
  l AS (
    SELECT event_type, x,
           {lag_cols}
    FROM s
  ),
  m AS (
    SELECT event_type,
           {moments}
    FROM l GROUP BY 1
  )
{arms}
"""


@register("acf_events", _acf_oracle(_ACF_LAGS))
def acf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series per event_type
    at lags 1/2/3/6/12/24 (O129, operators/overtime.py acf_grouped) —
    the periodicity diagnostic behind the seasonal detectors: a strong
    lag-24 peak is WHY seasonal_profile conditions on hour-of-day.
    Integer counts ⇒ all per-lag moments exact BIGINTs (conditional
    sums over the overlap), each r the pinned two-sqrt expression.  One
    series-key Exchange feeds one shared Window (all six lag columns
    ride one sort) + the aggregate; long form via exploded literal
    structs — all codegen."""
    from fischer_spark.operators.overtime import acf_grouped

    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("x"))
    return acf_grouped(s, ["event_type"], "x", _ACF_LAGS)


# --------------------------------------------------------------------------
# O130 — Kendall tau-b (operators/overtime.py kendall_grouped): the
# concordance member of the association family, per (event_type, day).
# --------------------------------------------------------------------------

@register(
    "kendall_daily_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x,
           CAST(sum(CAST(floor(abs(value) * 100) AS BIGINT)) AS BIGINT) AS y
    FROM events GROUP BY 1, 2, 3
  ),
  p AS (
    SELECT a.event_type, a.day,
           b.x - a.x AS dx, b.y - a.y AS dy
    FROM s a JOIN s b
      ON a.event_type = b.event_type AND a.day = b.day
     AND a.bucket_ts < b.bucket_ts
  ),
  g AS (
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN (dx > 0 AND dy > 0) OR (dx < 0 AND dy < 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS nc,
           CAST(sum(CASE WHEN (dx > 0 AND dy < 0) OR (dx < 0 AND dy > 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS nd,
           CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n2
    FROM p GROUP BY 1, 2
  )
  SELECT event_type, day, n0, nc, nd, n1, n2,
         CASE WHEN n0 - n1 > 0 AND n0 - n2 > 0 THEN
           CAST(nc - nd AS DOUBLE)
           / (sqrt(CAST(n0 - n1 AS DOUBLE)) * sqrt(CAST(n0 - n2 AS DOUBLE)))
         END AS tau_b
  FROM g
""",
)
def kendall_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between hourly count and hourly cents volume per
    (event_type, day) (O130, operators/overtime.py kendall_grouped) —
    completes the association family: Pearson (linear, O122), Spearman
    (monotone-by-rank-distance, O125), tau (monotone-by-concordance,
    tie-corrected exactly).  Every pair count an exact BIGINT from one
    intra-group self-equi-join pass; tau_b is the pinned two-sqrt
    expression over pure integers.  The pair join keys ON the group —
    pairs never cross partitions, w=24 bounds the quadratic."""
    from fischer_spark.operators.overtime import kendall_grouped

    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.floor(F.abs(F.col("value")) * 100).cast("long")).alias("y"),
    )
    return kendall_grouped(s, ["event_type", "day"], "x", "y")


# --------------------------------------------------------------------------
# O131 — Fano factor (index of dispersion): variance-to-mean of hourly
# counts per (event_type, day) — the burstiness scalar (Poisson ⇒ 1;
# hot-domain crawl bursts push it well above).
# --------------------------------------------------------------------------

@register(
    "fano_daily_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2, 3
  ),
  m AS (
    SELECT event_type, day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM s GROUP BY 1, 2
  )
  SELECT event_type, day, n, sx AS total_events,
         CASE WHEN n > 1 AND sx > 0 THEN
           CAST(n * sxx - sx * sx AS DOUBLE) / CAST((n - 1) * sx AS DOUBLE)
         END AS fano
  FROM m
""",
)
def fano_daily_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion) of hourly event counts per
    (event_type, day) (O131): sample-variance / mean, the burstiness
    scalar — 1 for a Poisson arrival process, >1 for bursty traffic
    (the hot-domain crawl-burst smell the salted rollup path guards
    against), <1 for rate-limited/uniform flows.  Algebra folds
    s²/mean into ONE pinned division over exact BIGINTs:
    (n·Σx² − (Σx)²) / ((n−1)·Σx).  Two stacked partial-aggregated
    groupBys (hour pre-agg, then day) — no window, no Python, NULL
    where undefined (n ≤ 1 or zero mean)."""
    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
    ).agg(F.count(F.lit(1)).alias("x"))
    x = F.col("x").cast("long")
    m = s.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    fano = (n * sxx - sx * sx).cast("double") / ((n - 1) * sx).cast("double")
    return m.select(
        "event_type",
        "day",
        "n",
        sx.alias("total_events"),
        F.when((n > 1) & (sx > 0), fano).alias("fano"),
    )


# --------------------------------------------------------------------------
# O132 — seasonal strength (one-way ANOVA eta² of the hour-of-day
# factor): WHAT FRACTION of hourly-count variance the seasonal profile
# explains — the "should you even run the seasonal detector here?"
# diagnostic.
# --------------------------------------------------------------------------

@register(
    "seasonal_strength_events",
    """
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(date_part('hour', ts) AS BIGINT) AS hod,
           CAST(count(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2, 3
  ),
  hod AS (
    SELECT event_type, hod,
           CAST(count(*) AS BIGINT) AS nh,
           CAST(sum(x) AS BIGINT) AS sh
    FROM s GROUP BY 1, 2
  ),
  terms AS (
    SELECT event_type,
           CAST(sh * sh AS DOUBLE) / CAST(nh AS DOUBLE) AS t
    FROM hod
  ),
  tot AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM s GROUP BY 1
  ),
  ssb AS (
    SELECT event_type,
           list_reduce(list_sort(list(t)), (a, b) -> a + b) AS sb
    FROM terms GROUP BY 1
  )
  SELECT tot.event_type, tot.n,
         CASE WHEN tot.n * tot.sxx - tot.sx * tot.sx > 0 THEN
           (CAST(tot.n AS DOUBLE) * ssb.sb
            - CAST(tot.sx AS DOUBLE) * CAST(tot.sx AS DOUBLE))
           / CAST(tot.n * tot.sxx - tot.sx * tot.sx AS DOUBLE)
         END AS eta2
  FROM tot JOIN ssb USING (event_type)
""",
)
def seasonal_strength_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal strength (O132): one-way ANOVA eta² of the hour-of-day
    factor on hourly counts per event_type — the fraction of variance
    the seasonal profile explains (eta²→1: strongly diurnal, run the
    seasonal detector; eta²→0: the profile is noise, prefer the rolling
    z-score).  Quantifies the assumption seasonal_profile_events bakes
    in.  Float contract: per-hod terms Sh²/nh are one division each
    from exact BIGINTs, folded in SORTED order (the source-entropy
    move); eta² is one pinned closing expression over those plus exact
    integer totals.  Scale shape: hourly pre-agg, then two tiny stacked
    aggs (24 hods × types) + a broadcast-sized join — no window, no
    Python."""
    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
        F.hour(F.col("ts")).cast("long").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("x"))
    x = F.col("x").cast("long")
    hod = s.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("nh"),
        F.sum(x).alias("sh"),
    )
    # integer-side product then ONE cast, mirroring the oracle's
    # CAST(sh * sh AS DOUBLE) (exact for sh < 3e9)
    terms = hod.select(
        "event_type",
        ((F.col("sh") * F.col("sh")).cast("double")
         / F.col("nh").cast("double")).alias("t"),
    )
    ssb = terms.groupBy("event_type").agg(
        F.aggregate(
            F.array_sort(F.collect_list("t")), F.lit(0.0), lambda a, v: a + v
        ).alias("sb")
    )
    tot = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sst = n * sxx - sx * sx
    eta2 = (
        n.cast("double") * F.col("sb") - sx.cast("double") * sx.cast("double")
    ) / sst.cast("double")
    return tot.join(F.broadcast(ssb), "event_type").select(
        "event_type", "n", F.when(sst > 0, eta2).alias("eta2")
    )


# --------------------------------------------------------------------------
# O133 — inter-arrival gap statistics: the cadence read (discrete
# median + exact extremes of per-type event gaps in integer µs).
# --------------------------------------------------------------------------

@register(
    "interarrival_events",
    """
  WITH g AS (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY event_type ORDER BY ts, event_id) AS gap_us,
           ts, event_id
    FROM events
  ),
  ng AS (
    SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us, ts, event_id
    FROM g WHERE gap_us IS NOT NULL
  ),
  r AS (
    SELECT event_type, gap_us,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY gap_us, ts, event_id) AS rn,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM ng
  ),
  med AS (
    SELECT event_type, n AS n_gaps, gap_us AS median_gap_us
    FROM r WHERE rn = CAST(ceil(CAST(n AS DOUBLE) / 2.0) AS INT)
  ),
  agg AS (
    SELECT event_type,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM ng GROUP BY 1
  )
  SELECT med.event_type, med.n_gaps, med.median_gap_us,
         agg.min_gap_us, agg.max_gap_us
  FROM med JOIN agg USING (event_type)
""",
)
def interarrival_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap statistics per event_type (O133): the cadence
    read — discrete median (the theil_sen selection convention: the
    ceil(n/2)-th element under the (gap, ts, event_id) total order — no
    interpolation to diverge) plus exact min/max of consecutive-event
    gaps in integer microseconds.  The stream-side analogue of
    Prometheus' scrape-interval estimation (rate()'s extrapolation
    window assumes a cadence; this measures it), and the stale_series
    threshold picker.  All integers — hash-safe.  Scale shape: one
    series-key Exchange + in-partition sort shared by the lag window
    and the rank window; extremes are a partial-aggregated groupBy;
    final join broadcast (one row per type)."""
    ev = scan_testdata(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))
         - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
         ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    rw = Window.partitionBy("event_type").orderBy("gap_us", "ts", "event_id")
    cw = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(cw).cast("long").alias("n"),
    )
    med = r.filter(
        F.col("rn") == F.ceil(F.col("n").cast("double") / 2.0).cast("int")
    ).select(
        "event_type",
        F.col("n").alias("n_gaps"),
        F.col("gap_us").alias("median_gap_us"),
    )
    agg = g.groupBy("event_type").agg(
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    return med.join(F.broadcast(agg), "event_type")


# --------------------------------------------------------------------------
# O135 — Gini coefficient of per-user activity: how concentrated is
# each event family on its heaviest users — the engagement-inequality
# read behind the salted hot-key rollup path (a high-Gini family is
# exactly where the skew handling earns its keep).
# --------------------------------------------------------------------------

@register(
    "gini_user_concentration_events",
    """
  WITH s AS (
    SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
  ),
  r AS (
    SELECT event_type, c,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY c, user_id) AS BIGINT) AS i
    FROM s
  )
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(c) AS BIGINT) AS n_events,
         CASE WHEN count(*) > 1 AND sum(c) > 0 THEN
           CAST(2 * sum(i * c) - (count(*) + 1) * sum(c) AS DOUBLE)
           / CAST(count(*) * sum(c) AS DOUBLE)
         END AS gini
  FROM r GROUP BY 1
""",
)
def gini_user_concentration_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event counts per event_type (O135):
    0 = every user equally active, ->1 = a few whales generate nearly
    all events.  The engagement-concentration scalar motivating the
    salted hot-key path the same way Fano (O131) motivates it in time:
    a high-Gini family has skewed shuffle keys BY MEASUREMENT.  Uses
    the rank identity G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))
    over ascending-sorted counts — every term an exact BIGINT under a
    pinned (c, user_id) total order (ties commute: equal c makes
    sum(i*c) invariant to rank order within the tie block), ONE closing
    division.  Scale shape: user-keyed partial-aggregated groupBy, one
    series-key Exchange + in-partition sort for the rank window, final
    tiny agg — no join, no Python."""
    ev = scan_testdata(spark, sf_dir, "events")
    s = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("c", "user_id")
    r = s.select(
        "event_type", "c", F.row_number().over(w).cast("long").alias("i")
    )
    n = F.count(F.lit(1)).cast("long")
    sx = F.sum("c").cast("long")
    sic = F.sum(F.col("i") * F.col("c")).cast("long")
    gini = (
        (F.lit(2) * sic - (n + F.lit(1)) * sx).cast("double")
        / (n * sx).cast("double")
    )
    return r.groupBy("event_type").agg(
        n.alias("n_users"),
        sx.alias("n_events"),
        F.when((n > 1) & (sx > 0), gini).alias("gini"),
    )


# --------------------------------------------------------------------------
# O137 — lead/lag cross-correlation between the click and purchase
# hourly-count series: WHICH horizon couples the two funnels — the
# cross-series member of the association family (ACF O129 is the
# self-correlation special case).
# --------------------------------------------------------------------------

_CCF_LAGS = [0, 1, 2, 3, 6, 12, 24]


@register(
    "ccf_click_purchase_events",
    f"""
  WITH s AS (
    SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
           CAST(count(*) AS BIGINT) AS x
    FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1, 2
  ),
  c AS (SELECT bucket_ts, x FROM s WHERE event_type = 'click'),
  p AS (SELECT bucket_ts, x AS y FROM s WHERE event_type = 'purchase'),
  l AS (SELECT unnest([{', '.join(str(k) for k in _CCF_LAGS)}]) AS lag_h),
  j AS (
    SELECT l.lag_h, c.x, p.y
    FROM l JOIN c ON true
    JOIN p ON p.bucket_ts = c.bucket_ts + to_hours(l.lag_h)
  ),
  m AS (
    SELECT lag_h,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy
    FROM j GROUP BY 1
  )
  SELECT CAST(lag_h AS BIGINT) AS lag_h, n,
         CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
           CAST(n * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
         END AS r
  FROM m
""",
)
def ccf_click_purchase_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between the click and purchase hourly
    count series at lead lags 0/1/2/3/6/12/24 h (O137): Pearson r of
    (clicks at t, purchases at t+k) over co-observed hour pairs — the
    lead/lag-discovery read ("purchases trail clicks by WHICH horizon")
    that picks the as-of tolerance and the funnel window; ACF (O129) is
    the x==y special case of this.  Integer counts => all six moments
    exact BIGINTs; each r the pinned two-sqrt closing expression, NULL
    on degenerate variance.  Scale shape: one hourly pre-agg (one
    Exchange), the lag fan-out is a 7-way literal explode on the
    bucket-count rows (cardinality = hours x 7, never events), the
    purchase side joins BROADCAST (one row per hour); final tiny
    per-lag agg — all codegen, no Python."""
    ev = scan_testdata(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    c = s.filter(F.col("event_type") == "click").select("bucket_ts", "x")
    p = s.filter(F.col("event_type") == "purchase").select(
        F.col("bucket_ts").alias("p_ts"), F.col("x").alias("y")
    )
    lagged = c.select(
        F.explode(F.array(*[F.lit(k) for k in _CCF_LAGS])).alias("lag_h"),
        "bucket_ts",
        "x",
    ).withColumn(
        "tgt", F.expr("timestampadd(HOUR, lag_h, bucket_ts)")
    )
    j = lagged.join(F.broadcast(p), lagged["tgt"] == p["p_ts"])
    n = F.count(F.lit(1)).cast("long")
    sx = F.sum("x").cast("long")
    sy = F.sum("y").cast("long")
    sxy = F.sum(F.col("x") * F.col("y")).cast("long")
    sxx = F.sum(F.col("x") * F.col("x")).cast("long")
    syy = F.sum(F.col("y") * F.col("y")).cast("long")
    m = j.groupBy(F.col("lag_h").cast("long").alias("lag_h")).agg(
        n.alias("n"), sx.alias("sx"), sy.alias("sy"),
        sxy.alias("sxy"), sxx.alias("sxx"), syy.alias("syy"),
    )
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
    )
    return m.select(
        "lag_h", "n", F.when((vx > 0) & (vy > 0), r).alias("r")
    )
