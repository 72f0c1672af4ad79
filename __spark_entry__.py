"""Driver contract for the spark-graft builder (PySpark target).

entry()       — flagship: hourly crawl-rate z-score anomaly intervals over
                the events fixture at sf0.001.
queries()     — one callable per implemented operator (SURVEY.md §2),
                registered in fischer_spark.queries*.
oracle_sql()  — matching DuckDB SQL per query (omitted only for ops that
                are not SQL-expressible; those get rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fischer_spark.queries import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fischer_spark.queries import zscore_events_1h

    return zscore_events_1h(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()
