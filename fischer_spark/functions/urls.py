"""O8 — URL parsing into series-key parts, all JVM-side built-ins.

domain is the primary series key and the hot-key skew unit (BASELINE.json
north_star: "explicit salt-based skew handling for hot domains").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add domain / tld / path_depth columns derived from ``url_col``.

    Stays inside whole-stage codegen: parse_url + regexp + size/split only.
    """
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    return (
        df.withColumn("domain", host)
        .withColumn("tld", F.regexp_extract(host, r"\.([^.]+)$", 1))
        .withColumn(
            "path_depth",
            F.size(F.split(F.regexp_replace(path, r"^/|/$", ""), "/"))
            - F.when(F.regexp_replace(path, r"^/|/$", "") == "", 1).otherwise(0),
        )
    )
