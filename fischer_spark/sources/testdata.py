"""O2 — readers for the driver-provided parquet tables (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def scan_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table. Column pruning + predicate pushdown
    are Catalyst's job — callers just select/filter."""
    if name not in TESTDATA_TABLES:
        raise ValueError(f"unknown testdata table {name!r}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
