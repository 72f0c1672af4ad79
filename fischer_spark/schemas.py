"""Fixed, declared schemas for every table the engine touches.

Nothing is inferred at runtime — schema inference over a 10^12-document
table is a full scan. SURVEY.md §1.3.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# §1.1 source data model: the Common-Crawl-style pages table (BASELINE.json
# input_hint: url:string, warc_ts:timestamp, html:binary, text:string,
# lang:string).
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# §1.2.1 canonical long/narrow series-point form. The struct key mirrors the
# Prometheus data model fischer consumes (label set + [ts, value] samples),
# flattened to fixed columns so Catalyst can partition/prune on them.
# ---------------------------------------------------------------------------
SERIES_POINT_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),  # crawl_rate|page_size|lang_mix
        T.StructField("tag", T.StringType(), True),  # e.g. lang for lang_mix
        T.StructField("bucket_ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# §1.2.2 algebraic rollup state row, per (series key, tier, bucket).
# cnt/min/max compose exactly; sum and sum_sq are carried as DECIMAL(38,6) /
# DECIMAL(38,12) so tier re-aggregation is exact and order-free (SURVEY.md §7
# hard-part 1, option (a)); mean/stddev are derived at read time.
# ---------------------------------------------------------------------------
ROLLUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("tier", T.StringType(), False),  # 1m|1h|1d
        T.StructField("bucket_ts", T.TimestampType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("sum", T.DecimalType(38, 6), True),
        T.StructField("sum_sq", T.DecimalType(38, 12), True),
        T.StructField("min", T.DoubleType(), True),
        T.StructField("max", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# §1.2.3 compressed chunk struct: delta-of-delta timestamps + Gorilla XOR
# values, one row per (series key, chunk window).  stat_* are zone-map
# pruning stats over the compressed blob.
# ---------------------------------------------------------------------------
CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("t_start", T.TimestampType(), False),
        T.StructField("t_end", T.TimestampType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("ts_codec", T.StringType(), False),  # "dod-v1"
        T.StructField("val_codec", T.StringType(), False),  # "gorilla-v1"
        T.StructField("ts_bytes", T.BinaryType(), False),
        T.StructField("val_bytes", T.BinaryType(), False),
        T.StructField("stat_min", T.DoubleType(), True),
        T.StructField("stat_max", T.DoubleType(), True),
        T.StructField("stat_cnt", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# §1.2.4 scored anomaly interval, per (series key, tier, detector).
# ---------------------------------------------------------------------------
ANOMALY_INTERVAL_SCHEMA = T.StructType(
    [
        T.StructField("domain", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("tag", T.StringType(), True),
        T.StructField("tier", T.StringType(), False),
        T.StructField("detector", T.StringType(), False),  # zscore|seasonal
        T.StructField("interval_start", T.TimestampType(), False),
        T.StructField("interval_end", T.TimestampType(), False),
        T.StructField("peak_score", T.DoubleType(), False),
        T.StructField("mean_score", T.DoubleType(), False),
        T.StructField("n_points", T.LongType(), False),
    ]
)

# ---------------------------------------------------------------------------
# §1.2.5 per-partition lineage / metrics row (BASELINE.json north_rule:
# "per-partition lineage + metrics").
# ---------------------------------------------------------------------------
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_rows", T.LongType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)

TIERS = ("1m", "1h", "1d")
TIER_TRUNC = {"1m": "minute", "1h": "hour", "1d": "day"}
# retention horizon per tier (seconds); None = keep forever. SURVEY §2 O5.
TIER_RETENTION_S = {"raw": 7 * 86400, "1m": 30 * 86400, "1h": 365 * 86400, "1d": None}
