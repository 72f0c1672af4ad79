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


# tracking params dropped by canonicalization — the public "tracking
# query parameter" families (Google Analytics utm_*, Google/Facebook/
# Microsoft click ids). Kept as a named constant so dedup jobs and tests
# share one definition.
TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|mc_eid|igshid)$"


def canonical_url(url_col) -> "F.Column":
    """Canonical form of a URL for exact-dedup keying — the standard
    Common-Crawl-pipeline normalization, entirely in whole-stage
    codegen (no UDF):

    1. scheme and host lowercased; explicit default port dropped
       (``:80`` http / ``:443`` https)
    2. fragment dropped (never reaches the server)
    3. tracking query params dropped (TRACKING_PARAM_RE), remaining
       params SORTED byte-wise so param order never splits a dedup key
    4. path kept byte-exact except a bare trailing ``/`` on an empty
       path normalizes to ``/`` (http://a.com == http://a.com/)

    Deliberately NOT done (documented): percent-encoding case folding
    and ``/../`` resolution — both can change server-side meaning;
    canonicalization must never merge two genuinely different pages.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # try_parse_url: NULL on malformed input instead of an ANSI-mode
    # INVALID_URL error — a crawl ALWAYS contains junk URLs and one bad
    # row must not kill a 100 TB dedup job (result is NULL, filterable)
    scheme = F.lower(F.try_parse_url(no_frag, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(no_frag, F.lit("HOST")))
    port = F.try_parse_url(no_frag, F.lit("AUTHORITY"))
    # AUTHORITY carries host[:port]; extract the explicit port if any
    port_str = F.regexp_extract(port, r":(\d+)$", 1)
    keep_port = (
        (port_str != "")
        & ~((scheme == "http") & (port_str == "80"))
        & ~((scheme == "https") & (port_str == "443"))
    )
    path_raw = F.try_parse_url(no_frag, F.lit("PATH"))
    path = F.when(
        (path_raw == "") | path_raw.isNull(), F.lit("/")
    ).otherwise(path_raw)
    query = F.try_parse_url(no_frag, F.lit("QUERY"))
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.regexp_extract(kv, r"^([^=]*)", 1).rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port_str)).otherwise(F.lit("")),
        path,
        F.when(
            query.isNotNull() & (qcanon != ""), F.concat(F.lit("?"), qcanon)
        ).otherwise(F.lit("")),
    )
