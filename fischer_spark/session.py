"""SparkSession factory with the engine's required configuration.

Every knob here is a scale decision (SURVEY.md §4.2):
- Arrow on: all Python boundary crossings are columnar batches.
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- UTC session timezone: bucketization (date_trunc/hour/dayofweek) must be
  deterministic and must agree with the DuckDB oracle, which operates on
  naive (timezone-less) parquet timestamps.
- shuffle.partitions sized to local cores; on a real cluster this is
  superseded by AQE's coalescing against `advisoryPartitionSizeInBytes`.
- ANSI mode pinned ON: the fixed64 rollup state impl (operators/rollup.py)
  relies on ANSI overflow errors instead of silent long wraparound. Spark 4
  defaults ANSI on, but legacy cluster confs commonly disable it — pinning
  here makes fixed64 safe on any deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fischer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver convention),
    falling back to ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from fischer_spark.deploy import ensure_shipped

    ensure_shipped(spark)
    return spark
