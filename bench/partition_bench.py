"""Measure day-partitioned tier reads vs unpartitioned (O73).

Builds the SAME 30-day rollup_1h tier table twice — one plain commit,
one day-partitioned commit — then times a 2-day query_range window on
each (min of N alternated reps, fresh actions).  The partitioned read
should touch ~2/30 of the files via PartitionFilters; the unpartitioned
read relies on parquet row-group stats alone (which only help if files
are time-clustered — here rows are written time-shuffled, the honest
worst case for an append-heavy ingest).

Run: python bench/partition_bench.py [n_keys] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from fischer_spark.api import query_range
    from fischer_spark.sources.storage import ParquetManifestStore

    # 30 days x 24 h x n_keys hourly states, written TIME-SHUFFLED
    # (repartition by key hash) like an append-heavy ingest would
    n_hours = 30 * 24
    rows = (
        spark.range(n_keys * n_hours)
        .select(
            F.concat(F.lit("d"), (F.col("id") % n_keys).cast("string")).alias("domain"),
            F.lit("crawl_rate").alias("metric"),
            F.lit(None).cast("string").alias("tag"),
            F.lit("1h").alias("tier"),
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("id") / n_keys).cast("long") * 3600
            ).alias("bucket_ts"),
            (F.col("id") % 97).cast("long").alias("cnt"),
            (F.col("id") % 1000).cast("decimal(28,6)").alias("sum"),
            (F.col("id") % 1000).cast("decimal(28,12)").alias("sum_sq"),
            (F.col("id") % 13).cast("double").alias("min"),
            (F.col("id") % 131).cast("double").alias("max"),
        )
        .repartition(32, "domain")
    )
    root = tempfile.mkdtemp(prefix="pb_")
    plain = ParquetManifestStore(spark, root + "/plain")
    days = ParquetManifestStore(spark, root + "/days")
    plain.append("rollup_1h", rows)
    days.append("rollup_1h", rows, day_col="bucket_ts")

    start, end = "2024-01-10 00:00:00", "2024-01-12 00:00:00"

    def run(store) -> float:
        t0 = time.perf_counter()
        n = query_range(store, "crawl_rate", start, end, 3600).count()
        assert n == n_keys * 48, n
        return time.perf_counter() - t0

    def scan(store) -> float:
        # isolates the SCAN: how much of the table must be read to find
        # the window's rows (the part that grows with table age)
        t0 = time.perf_counter()
        n = (
            store.read("rollup_1h", t_from=start, t_to=end)
            .filter((F.col("bucket_ts") >= start) & (F.col("bucket_ts") < end))
            .count()
        )
        assert n == n_keys * 48, n
        return time.perf_counter() - t0

    t_plain = t_days = s_plain = s_days = float("inf")
    for _ in range(reps):  # alternate to share any cache/contention window
        t_plain = min(t_plain, run(plain))
        t_days = min(t_days, run(days))
        s_plain = min(s_plain, scan(plain))
        s_days = min(s_days, scan(days))
    print(
        json.dumps(
            {
                "metric": "partition_pruned_range_read",
                "n_tier_rows": n_keys * n_hours,
                "window_days": 2,
                "table_days": 30,
                "query_range_unpartitioned_sec": round(t_plain, 3),
                "query_range_day_partitioned_sec": round(t_days, 3),
                "query_range_speedup": round(t_plain / t_days, 2),
                "scan_unpartitioned_sec": round(s_plain, 3),
                "scan_day_partitioned_sec": round(s_days, 3),
                "scan_speedup": round(s_plain / s_days, 2),
                "reps": reps,
            }
        )
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
