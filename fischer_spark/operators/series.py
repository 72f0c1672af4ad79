"""M3 — series builders: pages table → canonical long series-point form.

Three mandated series families (BASELINE.json north_star):
- crawl_rate: pages per (domain, minute)           [tag = NULL]
- page_size:  bytes of html per capture            [tag = NULL, raw ts]
- lang_mix:   per-minute share per (domain, lang)  [tag = lang]

All three are pure built-in column algebra — one shuffle each (the
groupBy), no UDFs.  lang_mix's share derives from exact counts, so the
value is a ratio of integers: deterministic under any partitioning
(SURVEY.md §7 hard-part 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fischer_spark.functions.time import bucketize, is_ntz

KEY_COLS = ["domain", "metric", "tag"]
SERIES_COLS = ["domain", "metric", "tag", "bucket_ts", "value"]


def crawl_rate_series(pages: DataFrame) -> DataFrame:
    """Pages per (domain, minute). Requires a `domain` column (with_url_parts)."""
    return (
        pages.groupBy("domain", bucketize("warc_ts", "1m", is_ntz(pages, "warc_ts")).alias("bucket_ts"))
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("metric", F.lit("crawl_rate"))
        .withColumn("tag", F.lit(None).cast("string"))
        .select(*SERIES_COLS)
    )


def page_size_series(pages: DataFrame) -> DataFrame:
    """html bytes per capture — raw-granularity points (ts = warc_ts).
    Uses a pre-projected `page_bytes` column when present so callers can
    drop the (huge) html payload before caching/shuffling."""
    size_col = (
        F.col("page_bytes") if "page_bytes" in pages.columns else F.octet_length("html")
    )
    return pages.select(
        F.col("domain"),
        F.lit("page_size").alias("metric"),
        F.lit(None).cast("string").alias("tag"),
        F.col("warc_ts").alias("bucket_ts"),
        size_col.cast("double").alias("value"),
    )


def lang_mix_series(pages: DataFrame) -> DataFrame:
    """Per-minute language share per (domain, lang): exact count ratio."""
    counts = pages.groupBy(
        "domain", bucketize("warc_ts", "1m", is_ntz(pages, "warc_ts")).alias("bucket_ts"), "lang"
    ).agg(F.count(F.lit(1)).alias("n"))
    # share = lang count / bucket total; the window repartitions on a prefix
    # of the groupBy keys so AQE coalesces it cheaply
    total = F.sum("n").over(Window.partitionBy("domain", "bucket_ts"))
    return (
        counts.withColumn("value", (F.col("n") / total).cast("double"))
        .withColumn("metric", F.lit("lang_mix"))
        .withColumnRenamed("lang", "tag")
        .select(*SERIES_COLS)
    )


def encode_series_keys(points: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dictionary-encode the (domain, metric, tag) key triple into one
    long ``key_id`` — the standard TSDB series-id pattern (Gorilla /
    Prometheus keep label sets out of the sample hot path the same way).

    Carrying one long instead of three strings through scan → partial-agg
    map → shuffle → state tables cuts per-row bytes and allocation; the
    rollup operators group by ``key_id`` automatically when present.

    key_id = xxhash64(key triple): stateless and deterministic (no extra
    shuffle to assign ids; re-runs and different partitionings agree).
    Collision odds for K keys ≈ K²/2⁶⁵: ~3·10⁻⁴ at K = 10⁸ domains.
    ``verify_key_encoding`` checks injectivity on the (small) dim table —
    run it once per ingest at scale; on a detected collision, fall back
    to dense ids from the dim table (row_number over the dim).

    Returns (encoded points without the string keys, key dim table).

    CACHING NOTE: both outputs share the input's lineage. If the input
    is an unmaterialized computation (e.g. build_series over raw pages),
    cache it before materializing BOTH outputs, or the dim's distinct
    will recompute the whole upstream (measured: the dim materialization
    silently re-ran a 24s series build in the bench pipeline).
    """
    enc = points.withColumn("key_id", F.xxhash64(*KEY_COLS))
    dim = enc.select("key_id", *KEY_COLS).distinct()
    return enc.drop(*KEY_COLS).select("key_id", "bucket_ts", "value"), dim


def verify_key_encoding(dim: DataFrame) -> bool:
    """True iff key_id is injective over the dim table (no hash collision)."""
    n = dim.count()
    return dim.select("key_id").distinct().count() == n


def decode_series_keys(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Join the string key triple back onto key_id rows (broadcast — the
    dim is orders of magnitude smaller than any state table)."""
    return df.join(F.broadcast(dim), "key_id", "left")


def build_series(pages: DataFrame, families: tuple[str, ...] = ("crawl_rate", "page_size", "lang_mix")) -> DataFrame:
    """Union of the requested series families in canonical long form."""
    builders = {
        "crawl_rate": crawl_rate_series,
        "page_size": page_size_series,
        "lang_mix": lang_mix_series,
    }
    dfs = [builders[f](pages) for f in families]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out
