"""O1/O3 — pages-table scan + deterministic synthetic generator.

`synth_pages` builds the Common-Crawl-style pages table (FIXTURES.md §1)
entirely from distributed column expressions over ``spark.range(n)`` —
no driver-side data, no randomness source other than xxhash64(id, seed),
so any (n, seed) pair reproduces bit-identical output at any parallelism.
That determinism is what makes the two-parallelism scaling benchmark and
the partitioning-invariance tests meaningful (SURVEY.md §5.8, §6).

Planted signal (FIXTURES.md §1 "planted anomalies"):
- zipfian domain draw (s=1.2) → real hot-domain skew for O18 salting;
- domain d000: crawl-rate spike on day 5, hours 10-14;
- domain d001: page-size ×4 level shift from day 9 on;
- domain d002: business-hours arrival profile, broken (uniform) on day 11;
- whole missing hours (domain_idx % 7 == 3, hours 2-3 UTC) for gap-fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fischer_spark.functions.text import extract_text

N_DOMAINS = 100
ZIPF_S = 1.2
BASE_TS = "2024-01-01 00:00:00"
DAYS = 14
LANGS = ["en", "fr", "es", "zh", "de"]

SPIKE_DOMAIN_IDX = 0  # crawl-rate spike day 5
SHIFT_DOMAIN_IDX = 1  # page-size level shift from day 9
SEASONAL_DOMAIN_IDX = 2  # broken seasonality day 11


def _domains() -> list[str]:
    return [f"d{i:03d}.example" for i in range(N_DOMAINS)]


def _zipf_cdf(n: int, s: float) -> list[float]:
    w = [1.0 / (i + 1) ** s for i in range(n)]
    tot = sum(w)
    acc, out = 0.0, []
    for x in w:
        acc += x / tot
        out.append(acc)
    return out


def _u(h, mod: int = 1_000_000):
    """Uniform [0,1) from a hash column."""
    return F.pmod(h, F.lit(mod)) / float(mod)


def synth_pages(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic pages table: (url, warc_ts, html, text, lang).

    Fully distributed: ``spark.range`` + column exprs; the only Python
    boundary is the frozen-spec extract_text pandas UDF that fills `text`
    (so text == extract_text(html) holds by construction).
    """
    domains = F.array(*[F.lit(d) for d in _domains()])
    cdf = F.array(*[F.lit(c) for c in _zipf_cdf(N_DOMAINS, ZIPF_S)])

    df = spark.range(n)
    h = lambda k: F.xxhash64(F.col("id"), F.lit(seed), F.lit(k))  # noqa: E731

    # -- domain: zipfian via CDF walk (100 JVM-side comparisons per row)
    u_dom = _u(h(1))
    df = df.withColumn(
        "domain_idx",
        F.aggregate(
            cdf,
            F.lit(0),
            lambda acc, x: acc + F.when(x < u_dom, F.lit(1)).otherwise(F.lit(0)),
        ),
    )
    # crawl-rate spike: 1 in 37 rows re-routed to the spike domain
    df = df.withColumn("is_spike", F.pmod(h(2), F.lit(37)) == 0)
    df = df.withColumn(
        "domain_idx",
        F.when(F.col("is_spike"), F.lit(SPIKE_DOMAIN_IDX)).otherwise(F.col("domain_idx")),
    )
    df = df.withColumn("domain", F.element_at(domains, F.col("domain_idx") + 1))

    # -- timestamp: day uniform over DAYS; hour shaped per domain profile
    df = df.withColumn("day", F.pmod(h(3), F.lit(DAYS)).cast("int"))
    df = df.withColumn(
        "day", F.when(F.col("is_spike"), F.lit(5)).otherwise(F.col("day"))
    )
    business_hour = (F.pmod(h(4), F.lit(11)) + 8).cast("int")  # 8..18
    any_hour = F.pmod(h(4), F.lit(24)).cast("int")
    df = df.withColumn(
        "hour",
        F.when(F.col("is_spike"), (F.pmod(h(4), F.lit(5)) + 10).cast("int"))
        .when(
            (F.col("domain_idx") == SEASONAL_DOMAIN_IDX) & (F.col("day") != 11),
            business_hour,
        )
        .when(F.col("domain_idx") == SEASONAL_DOMAIN_IDX, any_hour)
        .otherwise(any_hour),
    )
    df = df.withColumn("minute", F.pmod(h(5), F.lit(60)).cast("int"))
    df = df.withColumn("second", F.pmod(h(6), F.lit(60)).cast("int"))
    df = df.withColumn(
        "warc_ts",
        F.to_timestamp(F.lit(BASE_TS))
        + F.make_dt_interval(
            F.col("day"), F.col("hour"), F.col("minute"), F.col("second")
        ),
    )
    # whole missing hours → gap-fill signal
    df = df.filter(
        ~((F.pmod(F.col("domain_idx"), F.lit(7)) == 3) & F.col("hour").isin(2, 3))
    )

    # -- url: bounded page population per domain → repeat captures over time
    pages_per_domain = 200
    df = df.withColumn("page_id", F.pmod(h(7), F.lit(pages_per_domain)).cast("int"))
    df = df.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.col("domain"),
            F.lit("/p/"),
            F.col("page_id").cast("string"),
        ),
    )

    # -- html: template; body length lognormal-ish per domain, ×4 level shift
    u_len = _u(h(8))
    base_k = (F.pmod(F.col("domain_idx") * 7919, F.lit(40)) + 5).cast("double")
    k = (base_k * (0.5 + 3.0 * u_len * u_len)).cast("int") + 1
    k = F.when(
        (F.col("domain_idx") == SHIFT_DOMAIN_IDX) & (F.col("day") >= 9), k * 4
    ).otherwise(k)
    vocab = F.array(
        *[
            F.lit(w)
            for w in (
                "lorem", "ipsum", "dolor", "sit", "amet", "crawl", "spark",
                "rollup", "series", "anomaly", "gorilla", "parquet",
            )
        ]
    )
    word = lambda kk: F.element_at(vocab, F.pmod(h(kk), F.lit(12)).cast("int") + 1)  # noqa: E731
    title = F.concat(F.col("domain"), F.lit(" page "), F.col("page_id").cast("string"))
    body = F.concat_ws(
        " ",
        word(9),
        word(10),
        word(11),
        F.rtrim(F.repeat(F.concat(word(12), F.lit(" ")), k)),
    )
    df = df.withColumn(
        "html",
        F.concat(
            F.lit("<html><head><title>"),
            title,
            F.lit("</title><style>body{margin:0}</style></head><body><h1>"),
            title,
            F.lit("</h1><p>"),
            body,
            F.lit("</p><script>var x=1;</script></body></html>"),
        ).cast("binary"),
    )
    df = df.withColumn("text", extract_text(F.col("html")))

    # -- lang: per-domain primary with 20% mixture noise
    primary = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), F.pmod(F.col("domain_idx"), F.lit(5)) + 1
    )
    noise = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), F.pmod(h(13), F.lit(5)).cast("int") + 1
    )
    df = df.withColumn(
        "lang", F.when(F.pmod(h(14), F.lit(10)) < 2, noise).otherwise(primary)
    )

    return df.select("url", "warc_ts", "html", "text", "lang")


def scan_pages(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """O1 — read a pages table; select early so Parquet only decodes the
    requested columns (html is the huge one — never scan it implicitly)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


PAGES_JSONL_SCHEMA = (
    "url string, warc_ts timestamp, html string, text string, lang string"
)


def scan_pages_jsonl(
    spark: SparkSession,
    path: str,
    corrupt: str = "drop",
    columns: list[str] | None = None,
) -> DataFrame:
    """O1b — ingest a JSON-lines pages dump (the common landing format
    for Common-Crawl-style extractions before they become columnar).

    Schema is EXPLICIT, never inferred: schema inference on JSON is a
    full extra pass over the data — at 100 TB that is a second scan
    before the first useful byte.  ``html`` arrives as a JSON string
    and is cast to binary to match the parquet pages contract.

    Malformed lines (``corrupt=``):
      - ``"drop"``  (default): quarantine-filtered out; the pipeline
        proceeds on clean rows only,
      - ``"keep"``: retained with all fields NULL plus the raw line in
        ``_corrupt_record`` for a dead-letter sink,
      - ``"error"``: FAILFAST — the job dies on the first bad line.
    """
    if corrupt not in ("drop", "keep", "error"):
        raise ValueError(f"corrupt={corrupt!r}; choose drop|keep|error")
    reader = (
        spark.read.schema(PAGES_JSONL_SCHEMA + ", _corrupt_record string")
        .option("timestampFormat", "yyyy-MM-dd['T'][' ']HH:mm:ss[.SSSSSS]")
        .option(
            "mode", "FAILFAST" if corrupt == "error" else "PERMISSIVE"
        )
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    df = reader.json(path)
    if corrupt == "drop":
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    elif corrupt == "error":
        df = df.drop("_corrupt_record")  # FAILFAST dies before it could fill
    out_cols = columns or df.columns
    proj = [
        F.col("html").cast("binary").alias("html") if c == "html" else F.col(c)
        for c in out_cols
    ]
    return df.select(*proj)
