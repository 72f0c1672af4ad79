"""Contract queries (SURVEY.md §2 'contract' rows): the relational surface
a reference user exercises — equi/semi/anti/as-of joins, ranking windows,
set ops, cube/rollup, distinct — each DuckDB-oracle-paired.

Hash-safety rules are the same as queries.py: decimal-exact sums, no bare
double aggregation.  Join strategy notes are on each query: dimension
tables are broadcast (no shuffle of the fact side beyond its own agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fischer_spark.queries import register
from fischer_spark.sources.testdata import scan_testdata

_DEC = "decimal(28,6)"


# --------------------------------------------------------------------------
# O12/O17 scalar+agg surface — TPC-H Q1-shaped pricing summary
# --------------------------------------------------------------------------

@register(
    "tpch_q1ish",
    """
  SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
  GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = scan_testdata(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# O13 equi-join chain with broadcast dims — revenue per nation
# --------------------------------------------------------------------------

@register(
    "revenue_by_nation",
    """
  SELECT n_name AS nation, r_name AS region,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
         count(*) AS n_items
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
""",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem⋈orders is the only real shuffle; customer/nation/region are
    broadcast so the probe side streams through without exchange."""
    li = scan_testdata(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = scan_testdata(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = scan_testdata(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = scan_testdata(spark, sf_dir, "nation")
    r = scan_testdata(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# O29/O30 ranking window + per-group top-k
# --------------------------------------------------------------------------

@register(
    "top_customers_per_nation",
    """
  WITH spend AS (
    SELECT c_nationkey, c_custkey, c_name,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total_spend
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY 1, 2, 3
  ),
  ranked AS (
    SELECT n_name AS nation, c_name, total_spend,
           row_number() OVER (PARTITION BY c_nationkey
                              ORDER BY total_spend DESC, c_custkey) AS rnk
    FROM spend JOIN nation ON c_nationkey = n_nationkey
  )
  SELECT nation, c_name, total_spend, rnk FROM ranked WHERE rnk <= 3
""",
)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = scan_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    o = scan_testdata(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    n = scan_testdata(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    spend = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias("total_spend"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("total_spend"), F.col("c_custkey")
    )
    return (
        spend.join(F.broadcast(n), spend.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(F.col("n_name").alias("nation"), "c_name", "total_spend", "rnk")
    )


# --------------------------------------------------------------------------
# O15 semi / anti joins
# --------------------------------------------------------------------------

@register(
    "customers_without_orders",
    """
  SELECT c_custkey, c_name FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = scan_testdata(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = scan_testdata(spark, sf_dir, "orders").select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "orders_in_region_semi",
    """
  SELECT o_orderpriority, count(*) AS n_orders FROM orders
  WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY 1
""",
)
def orders_in_region_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = scan_testdata(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = scan_testdata(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = scan_testdata(spark, sf_dir, "nation")
    r = scan_testdata(spark, sf_dir, "region")
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    return (
        o.join(F.broadcast(asia_cust), o.o_custkey == asia_cust.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# O31 set ops
# --------------------------------------------------------------------------

@register(
    "clickers_not_purchasers",
    """
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT
  SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def clickers_not_purchasers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.distinct().exceptAll(buys.distinct())


# --------------------------------------------------------------------------
# O20 distinct / O21 rollup report
# --------------------------------------------------------------------------

@register(
    "distinct_users_per_type",
    """
  SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
  FROM events GROUP BY 1
""",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "rollup_report_documents",
    """
  SELECT coalesce(source, '<all>') AS source_g,
         coalesce(lang, '<all>') AS lang_g,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM documents GROUP BY ROLLUP (source, lang)
""",
)
def rollup_report_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = scan_testdata(spark, sf_dir, "documents")
    return (
        d.rollup("source", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source_g"),
            F.coalesce("lang", F.lit("<all>")).alias("lang_g"),
            "n_docs",
            "total_chars",
        )
    )


# --------------------------------------------------------------------------
# O14 as-of join — most recent prior click per purchase, per user.
# Spark has no native as-of: union the two streams, LOCF the click ts over
# a per-user ordered window, keep purchases. DuckDB oracles it natively.
# --------------------------------------------------------------------------

@register(
    "asof_click_before_purchase",
    """
  SELECT p.event_id, p.user_id, p.ts,
         c.ts AS last_click_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = scan_testdata(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    tagged = ev.filter(F.col("event_type").isin("purchase", "click"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("_is_purchase").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # clicks sort before purchases at equal ts (ASOF >= allows same-ts click)
    out = (
        tagged.withColumn("_is_purchase", (F.col("event_type") == "purchase").cast("int"))
        .withColumn(
            "_click_ts", F.when(F.col("event_type") == "click", F.col("ts"))
        )
        .withColumn("last_click_ts", F.last("_click_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    return out.select("event_id", "user_id", "ts", "last_click_ts")
