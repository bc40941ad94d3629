"""Beyond-parity engine queries: window functions, top-k, set ops,
single-pass validation, and TPC-H-style bench heads — each with a
bit-exact DuckDB oracle (see registry docstring for the determinism
rules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.functions import money_sum
from dagster_etl_spark.functions import scaled_long, scaled_long_sql
from dagster_etl_spark.operators.windows import rank_topk, sessionize, with_lag_gap
from dagster_etl_spark.registry import register
from dagster_etl_spark.sources.fixtures import load_table
from dagster_etl_spark.validation import DataValidator

# ---------------------------------------------------------------------------
# §2.6 — sorts / limits / top-k

_TOP_ORACLE = """
SELECT o_custkey,
       CAST(SUM(CAST(round((o_totalprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spent,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_spent DESC, o_custkey
LIMIT 10
"""


@register(
    "top_customers",
    oracle=_TOP_ORACLE,
    tags=("scale", "topk"),
    doc="Global top-k: exact decimal spend per customer, deterministic "
    "tiebreak; Spark executes as partial TakeOrdered, no full sort.",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(money_sum("o_totalprice", "total_spent"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("total_spent").desc(), F.col("o_custkey"))
        .limit(10)
    )


_RANK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
)
WHERE rn <= 3
"""


@register(
    "order_rank_window",
    oracle=_RANK_ORACLE,
    tags=("scale", "window", "bench"),
    doc="Per-group top-k via row_number (rank-limit pushdown, no global sort).",
)
def q_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return rank_topk(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_cols=("o_custkey",),
        order_cols=(F.col("o_totalprice").desc(), F.col("o_orderkey")),
        k=3,
    )


_LAG_ORACLE = """
SELECT event_id, user_id, event_type,
       LAG(event_type) OVER w AS prev_event_type,
       date_diff('second', LAG(ts) OVER w, ts) AS gap_seconds
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register(
    "events_lag",
    oracle=_LAG_ORACLE,
    tags=("scale", "window"),
    doc="lead/lag with integer-second gaps, unique tiebreak on event_id.",
)
def q_events_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    return with_lag_gap(
        ev, partition_col="user_id", ts_col="ts", tiebreak_col="event_id",
        lag_cols=("event_type",),
    ).select("event_id", "user_id", "event_type", "prev_event_type", "gap_seconds")


_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         date_diff('second', LAG(ts) OVER w, ts) AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), flagged AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM gaps
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM flagged
GROUP BY user_id, session_seq
"""


@register(
    "sessionize",
    oracle=_SESSION_ORACLE,
    tags=("scale", "window", "bench"),
    doc="Batch sessionization (30-min gap), twin of streaming session window.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sessionize(ev, user_col="user_id", ts_col="ts", tiebreak_col="event_id")


# ---------------------------------------------------------------------------
# §2.6 set ops — anti join

_NO_ORDERS_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@register(
    "customers_without_urgent_orders",
    oracle=_NO_ORDERS_ORACLE,
    tags=("scale", "join"),
    doc="Left-anti join (the upsert writer's core primitive, standalone).",
)
def q_customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.9 — validation suite as a single-pass report

_VALIDATION_ORACLE = """
SELECT 'not_null' AS rule, 'l_orderkey' AS "column",
       COUNT(*) FILTER (l_orderkey IS NULL) = 0 AS passed,
       CAST(COUNT(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS failed_count,
       '' AS message
FROM lineitem
UNION ALL
SELECT 'range', 'l_quantity',
       COUNT(*) FILTER (l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) = 0,
       CAST(COUNT(*) FILTER (l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) AS BIGINT),
       '[1, 30]'
FROM lineitem
UNION ALL
SELECT 'values_in', 'l_returnflag',
       COUNT(*) FILTER (l_returnflag IS NOT NULL AND l_returnflag NOT IN ('N','A')) = 0,
       CAST(COUNT(*) FILTER (l_returnflag IS NOT NULL AND l_returnflag NOT IN ('N','A')) AS BIGINT),
       ''
FROM lineitem
UNION ALL
SELECT 'regex', 'l_linestatus',
       COUNT(*) FILTER (l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[OF]$')) = 0,
       CAST(COUNT(*) FILTER (l_linestatus IS NOT NULL AND NOT regexp_matches(l_linestatus, '^[OF]$')) AS BIGINT),
       '^[OF]$'
FROM lineitem
UNION ALL
SELECT 'unique', 'l_orderkey',
       (COUNT(*) - (COUNT(DISTINCT l_orderkey)
         + CASE WHEN COUNT(*) FILTER (l_orderkey IS NULL) > 0 THEN 1 ELSE 0 END)) = 0,
       CAST(COUNT(*) - (COUNT(DISTINCT l_orderkey)
         + CASE WHEN COUNT(*) FILTER (l_orderkey IS NULL) > 0 THEN 1 ELSE 0 END) AS BIGINT),
       ''
FROM lineitem
"""


@register(
    "validation_report",
    oracle=_VALIDATION_ORACLE,
    tags=("scale", "validation"),
    doc="DataValidator rule suite compiled to ONE aggregate scan "
    "(reference runs one pandas scan per rule).",
)
def q_validation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        DataValidator(li)
        .check_not_null("l_orderkey")
        .check_range("l_quantity", 1, 30)
        .check_values_in("l_returnflag", ["N", "A"])
        .check_regex("l_linestatus", "[OF]$")
        .check_unique("l_orderkey")
        .report_df(spark, with_samples=False)
    )


# ---------------------------------------------------------------------------
# TPC-H-style bench heads (exercise scan+agg and the full join tree)

_PRICING_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
  CAST(SUM(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
  CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register(
    "pricing_summary",
    oracle=_PRICING_ORACLE,
    tags=("scale", "agg", "bench"),
    doc="TPC-H Q1-shaped pricing summary; filter reaches the parquet scan "
    "(PushedFilters), sums exact via decimal.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.functions import twostage_money_sums

    li = load_table(spark, sf_dir, "lineitem")
    disc = "(l_extendedprice * (1 - l_discount))"
    charge = f"({disc} * (1 + l_tax))"
    # whole-table rollup with ~6 groups: the few-group shape where a
    # single group's int64 fixed-point sum could overflow at extreme
    # scale — so this goes through the two-stage (keys, partition)
    # BIGINT -> DECIMAL(38,0) merge, which is bit-identical (exact
    # integer addition) and keeps the decimal path off the data
    base = twostage_money_sums(
        li.filter("l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'"),
        keys=["l_returnflag", "l_linestatus"],
        money={
            "sum_qty": ("l_quantity", 2),
            "sum_base_price": ("l_extendedprice", 2),
            "sum_disc_price": (disc, 6),
            "sum_charge": (charge, 6),
        },
        count_alias="count_order",
    )
    return base.selectExpr(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "sum_qty / count_order AS avg_qty",
        "count_order",
    )


_REGIONAL_ORACLE = """
SELECT
  n.n_name,
  CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register(
    "regional_revenue",
    oracle=_REGIONAL_ORACLE,
    tags=("scale", "join", "bench"),
    doc="TPC-H Q5-shaped star join: dims broadcast, one shuffle for the "
    "fact-fact join, exact decimal revenue.",
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter("r_name = 'ASIA'")

    dims = F.broadcast(
        customer.join(F.broadcast(nation), F.expr("c_nationkey = n_nationkey"))
        .join(F.broadcast(region), F.expr("n_regionkey = r_regionkey"))
        .select("c_custkey", "n_name")
    )
    fact = li.join(orders, F.expr("l_orderkey = o_orderkey"))
    return (
        fact.join(dims, F.expr("o_custkey = c_custkey"))
        .groupBy("n_name")
        .agg(
            F.expr(
                "CAST(SUM("
                + scaled_long_sql("(l_extendedprice * (1 - l_discount))", 6)
                + ") AS DOUBLE) / 1000000.0D"
            ).alias("revenue"),
            F.expr("COUNT(1)").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.6): intersect / except over customer keysets.

_SEGMENT_SETOPS_ORACLE = """
SELECT o_custkey, 'both' AS segment FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
UNION ALL
SELECT o_custkey, 'urgent_only' AS segment FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'
)
"""


@register(
    "customer_segment_setops",
    oracle=_SEGMENT_SETOPS_ORACLE,
    tags=("scale", "setops"),
    doc="Set operations: customers ordering in both urgent and low "
    "priorities (intersect) vs urgent-only (except), union-tagged.",
)
def q_customer_segment_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    low = orders.filter(F.col("o_orderpriority") == "5-LOW").select("o_custkey").distinct()
    both = urgent.intersect(low).withColumn("segment", F.lit("both"))
    only = urgent.exceptAll(low).withColumn("segment", F.lit("urgent_only"))
    return both.unionByName(only)


# ---------------------------------------------------------------------------
# Window frames (ROWS BETWEEN): per-customer rolling spend.

_ROLLING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(round((o_totalprice) * 100) AS BIGINT)) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS rolling_spend
FROM orders
"""


@register(
    "rolling_customer_spend",
    oracle=_ROLLING_ORACLE,
    tags=("scale", "window"),
    doc="Window frame aggregation: 3-order moving spend per customer "
    "(ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), decimal-exact, "
    "deterministic (date, orderkey) ordering.",
)
def q_rolling_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(scaled_long("o_totalprice", 2)).over(w).cast("double") / 1e2)
        .alias("rolling_spend"),
    )


# ---------------------------------------------------------------------------
# JSON scalar functions + exact percentiles (absent from the reference —
# SURVEY §2.5 — but table stakes for an events pipeline).

_JSON_PROPS_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n,
       CAST(quantile_cont(value, 0.5) AS DOUBLE) AS median_value
FROM events
GROUP BY event_type
"""


@register(
    "events_json_percentiles",
    oracle=_JSON_PROPS_ORACLE,
    tags=("scale", "json"),
    doc="JSON extraction (get_json_object, JVM-side jackson) + exact "
    "interpolated median per event type.",
)
def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").cast("double").alias("median_value"),
    )


# ---------------------------------------------------------------------------
# Classic analytic shapes: unshipped-order priority (TPC-H Q3-like) and
# returned-item customer ranking (Q10-like).

_SHIPPING_PRIORITY_ORACLE = """
SELECT l.l_orderkey,
       CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS revenue,
       o.o_orderdate
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate < DATE '1995-03-15' AND l.l_shipdate > DATE '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register(
    "shipping_priority",
    oracle=_SHIPPING_PRIORITY_ORACLE,
    tags=("scale", "join", "topk"),
    doc="TPC-H Q3 shape: date-bracketed fact join, decimal-exact revenue, "
    "deterministic top-10.",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > "1995-03-15"
    )
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg((F.sum(rev).cast("double") / 1e6).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


_RETURNED_ITEMS_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS revenue
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "returned_item_customers",
    oracle=_RETURNED_ITEMS_ORACLE,
    tags=("scale", "join", "topk"),
    doc="TPC-H Q10 shape: 4-way join (two broadcast dims), returned-line "
    "filter pushed to the scan, decimal-exact revenue top-20.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(rev).cast("double") / 1e6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


_LATE_SHIPMENT_ORACLE = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 90
)
GROUP BY o.o_orderpriority
"""


@register(
    "late_shipment_priority",
    oracle=_LATE_SHIPMENT_ORACLE,
    tags=("scale", "join", "semi"),
    doc="TPC-H Q4 shape: per-priority count of orders with at least one "
    "line shipped >90 days after the order date — a left_semi join with "
    "a compound (equi + range) condition, so each order is counted once "
    "no matter how many late lines it has.",
)
def q_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (
        F.to_date(li.l_shipdate) > F.date_add(F.to_date(orders.o_orderdate), 90)
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_SHIPPING_MIX_ORACLE = """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY l.l_linestatus
"""


@register(
    "priority_shipping_mix",
    oracle=_SHIPPING_MIX_ORACLE,
    tags=("scale", "join", "conditional-agg"),
    doc="TPC-H Q12 shape: one-year shipdate bracket (pushed to the "
    "scan), fact-fact join, then a two-way conditional count by line "
    "status — single pass, no second join or pivot.",
)
def q_priority_shipping_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= "1996-01-01")
        & (F.to_date("l_shipdate") < "1997-01-01")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


_PROMO_ORACLE = """
WITH f AS (
  SELECT
    CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                  THEN CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END) AS DOUBLE) / 1000000.0 AS promo_revenue,
    CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
      AS total_revenue
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       CAST(100 AS DOUBLE) * promo_revenue / total_revenue AS promo_share_pct
FROM f
"""


@register(
    "promo_revenue_share",
    oracle=_PROMO_ORACLE,
    tags=("scale", "join", "ratio"),
    doc="TPC-H Q14 shape: promo revenue share over a quarter — broadcast "
    "part-dim join, decimal-exact conditional sums, and the ratio taken "
    "in double identically on both engines.",
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= "1996-01-01")
        & (F.to_date("l_shipdate") < "1996-04-01")
    )
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    zero = F.lit(0).cast("bigint")
    agg = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        (F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
        .cast("double") / 1e6)
        .alias("promo_revenue"),
        (F.sum(rev).cast("double") / 1e6).alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100).cast("double") * F.col("promo_revenue") / F.col("total_revenue"))
        .alias("promo_share_pct"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register(
    "revenue_cube",
    oracle=_CUBE_ORACLE,
    tags=("scale", "agg", "cube"),
    doc="CUBE over (returnflag, linestatus): all four grouping levels in "
    "one pass with partial aggregation; grouping_id disambiguates "
    "rolled-up NULLs from data NULLs, bit-compatible with DuckDB's "
    "GROUPING().",
)
def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(rev).cast("double") / 1e6).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy gates: approximate aggregates (the 100 TB substitutes
# for exact countDistinct / percentile) checked against the exact answer
# inside the SAME query, so the driver's hash gate fails if the sketch
# machinery regresses. The oracle recomputes the exact side in SQL and
# asserts the bound constant TRUE — the reference has no sketches at
# all (single-process pandas never needs them; at cluster scale they
# replace two-phase exact distinct with one mergeable pass).

_APPROX_DISTINCT_ORACLE = """
SELECT COUNT(DISTINCT o_custkey) AS exact_custs,
       COUNT(DISTINCT o_orderpriority) AS exact_priorities,
       TRUE AS custs_within_5pct,
       TRUE AS priorities_exact
FROM orders
"""


@register(
    "approx_distinct_gate",
    oracle=_APPROX_DISTINCT_ORACLE,
    tags=("scale", "sketch"),
    doc="HLL++ approx_count_distinct vs exact: the 2% rsd sketch must "
    "land within a 5% band of the true distinct-customer count (rsd "
    "is a standard deviation, not a bound — the margin absorbs normal "
    "excursions; measured error 0.4% at sf0.01) and exactly on tiny "
    "cardinalities. HLL registers merge by max — order-independent, "
    "so the sketch itself is deterministic on fixed data.",
)
def q_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    exact = F.countDistinct("o_custkey")
    approx = F.approx_count_distinct("o_custkey", rsd=0.02)
    return o.agg(
        exact.alias("exact_custs"),
        F.countDistinct("o_orderpriority").alias("exact_priorities"),
        (F.abs(approx - exact) <= exact * 0.05).alias("custs_within_5pct"),
        (
            F.approx_count_distinct("o_orderpriority", rsd=0.05)
            == F.countDistinct("o_orderpriority")
        ).alias("priorities_exact"),
    )


_APPROX_QUANTILE_ORACLE = """
SELECT event_type,
       CAST(quantile_cont(value, 0.5) AS DOUBLE) AS exact_p50,
       TRUE AS approx_within_band
FROM events
GROUP BY event_type
"""


@register(
    "approx_quantile_gate",
    oracle=_APPROX_QUANTILE_ORACLE,
    tags=("scale", "sketch"),
    doc="approx_percentile (Greenwald-Khanna, mergeable) vs exact "
    "interpolated median per event type: the sketch median must land "
    "within the band of values spanning 2% of ranks around the true "
    "median (rank-error bound, the guarantee GK actually makes).",
)
def q_approx_quantile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").cast("double").alias("exact_p50"),
        (
            F.abs(
                F.expr("approx_percentile(value, 0.5, 100)")
                - F.expr("percentile(value, 0.5)")
            )
            # rank-error eps ~ 1/accuracy = 1%; allow 2% of ranks, which
            # for a value distribution maps to a quantile band
            <= F.abs(
                F.expr("percentile(value, 0.52)") - F.expr("percentile(value, 0.48)")
            )
        ).alias("approx_within_band"),
    )


# ---------------------------------------------------------------------------
# Change-history shapes (operators/history.py): CDC latest-per-key
# compaction and SCD2 interval construction — the two states adjacent
# to the reference's latest-state-only upsert (trino.py:165-225).

_LATEST_ORDER_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""


@register(
    "latest_order_per_customer",
    oracle=_LATEST_ORDER_ORACLE,
    tags=("scale", "window", "history"),
    doc="CDC-compaction shape: latest row per key via one window pass "
    "(QUALIFY ROW_NUMBER() = 1), deterministic (date, orderkey) "
    "tiebreak, single key-partitioned shuffle.",
)
def q_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.history import latest_per_key

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    return latest_per_key(
        orders, keys=["o_custkey"], order_by=["o_orderdate", "o_orderkey"]
    )


_SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(ts) OVER w AS prev_ts,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), kept AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_type,
       CAST(floor(epoch(ts)) AS BIGINT) AS valid_from_s,
       CAST(floor(epoch(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
         AS valid_to_s
FROM kept
"""


@register(
    "scd2_user_event_type",
    oracle=_SCD2_ORACLE,
    tags=("scale", "window", "history"),
    doc="SCD2 interval build: collapse each user's event-type change "
    "feed into validity intervals (valid_from/valid_to, NULL = "
    "current); null-safe change detection, both window passes share "
    "one exchange+sort. Registered projection emits epoch seconds: "
    "pandas compares datetime64[ns] vs [us] columns by raw int64 when "
    "NaT is present, so a nullable timestamp column would false-fail "
    "the canonicalizer (nullable BIGINT is proven safe — events_lag).",
)
def q_scd2_user_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.history import scd2_intervals

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return scd2_intervals(
        ev, keys=["user_id"], ts_col="ts", attr_cols=["event_type"],
        tiebreak=["event_id"],
    ).selectExpr(
        "user_id",
        "event_type",
        "unix_timestamp(valid_from) AS valid_from_s",
        "unix_timestamp(valid_to) AS valid_to_s",
    )


_SALTED_JOIN_ORACLE = """
SELECT o.o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
"""


@register(
    "salted_join_revenue",
    oracle=_SALTED_JOIN_ORACLE,
    tags=("scale", "join", "skew"),
    doc="Skew-salted join equivalence, driver-visible: the hot-key-"
    "splitting salted join (operators/skew.py — large side salted, "
    "small side replicated salt times) must produce exactly the plain "
    "join's rows; the oracle is the unsalted SQL join. The salt "
    "column never escapes, so results are salt- and RNG-independent.",
)
def q_salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS l_orderkey", "o_orderpriority"
    )
    rev = scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    return (
        salted_join(li, orders, on=["l_orderkey"], salt=8)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum(rev).cast("double") / 1e6).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18/Q16/Q22 shapes: HAVING-gated semi-aggregation, distinct
# counts over an excluded-attribute join, and scalar-subquery +
# anti-join segment stats.

_BIG_ORDERS_ORACLE = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(round((l_quantity) * 100) AS BIGINT)) AS DOUBLE) / 100.0 > 300
)
SELECT c.c_custkey, c.c_name, b.l_orderkey AS o_orderkey, b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register(
    "large_order_customers",
    oracle=_BIG_ORDERS_ORACLE,
    tags=("scale", "agg", "join"),
    doc="TPC-H Q18 shape: orders whose total quantity clears a HAVING "
    "threshold, joined back to customers — the aggregate feeds the "
    "join as a (small) filtered relation, so only qualifying orders "
    "shuffle onward.",
)
def q_large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(money_sum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "sum_qty")
    )


_SUPPLIER_DIVERSITY_ORACLE = """
SELECT p.p_brand, p.p_size, COUNT(DISTINCT l.l_suppkey) AS n_supp
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
GROUP BY p.p_brand, p.p_size
"""


@register(
    "supplier_diversity",
    oracle=_SUPPLIER_DIVERSITY_ORACLE,
    tags=("scale", "agg", "join"),
    doc="TPC-H Q16 shape: distinct supplier count per part attribute "
    "group with an excluded brand — broadcast dim join + two-phase "
    "distinct aggregate.",
)
def q_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") != "Brand#45")
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n_supp"))
    )


_RICH_NO_LOW_ORACLE = """
WITH thr AS (
  SELECT (CAST(SUM(CAST(round((c_acctbal) * 100) AS BIGINT)) AS DOUBLE) / 100.0)
           / COUNT(c_acctbal) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_mktsegment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(round((c.c_acctbal) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_bal
FROM customer c, thr
WHERE c.c_acctbal > thr.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '5-LOW'
  )
GROUP BY c.c_mktsegment
"""


@register(
    "rich_customers_without_low_orders",
    oracle=_RICH_NO_LOW_ORACLE,
    tags=("scale", "join", "subquery"),
    doc="TPC-H Q22 shape: scalar-subquery threshold (exact fixed-point "
    "mean, broadcast as a 1-row relation — never a driver collect) + "
    "anti join against low-priority orders, segment-level rollup.",
)
def q_rich_customers_without_low_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    low = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "5-LOW")
        .select("o_custkey")
    )
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                (F.sum(scaled_long("c_acctbal", 2)).cast("double") / 1e2)
                / F.count("c_acctbal")
            ).alias("avg_bal")
        )
    )
    rich = cust.join(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    return (
        rich.join(low, rich.c_custkey == low.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            money_sum("c_acctbal", "sum_bal"),
        )
    )


_JSON_FLATTEN_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket
FROM events
WHERE CAST(json_extract(props, '$.k') AS BIGINT) IS NOT NULL
"""


@register(
    "events_json_flatten",
    oracle=_JSON_FLATTEN_ORACLE,
    tags=("scale", "json"),
    doc="Schema-declared JSON flattening: from_json parses props into "
    "a typed struct ONCE per row (vs one jackson walk per "
    "get_json_object call), fields project as native columns.",
)
def q_events_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load_table(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    return (
        ev.withColumn("_p", F.from_json("props", schema))
        .select(
            "event_id",
            F.col("_p.k").alias("k"),
            (F.col("_p.k") % 10).alias("k_bucket"),
        )
        .filter(F.col("k").isNotNull())
    )


_PRIORITY_BASKET_ORACLE = """
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


@register(
    "customer_priority_baskets",
    oracle=_PRIORITY_BASKET_ORACLE,
    tags=("scale", "agg", "nested"),
    doc="Nested-output aggregation: distinct order priorities per "
    "customer as a SORTED set (collect_set is partition-order-"
    "nondeterministic; array_sort restores a canonical form both "
    "engines agree on). Registered projection joins the set to a "
    "string — the driver canonicalizer cannot sort list columns.",
)
def q_customer_priority_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Round 3: event-analytics parity ops — ordered funnel + cohort retention.

_FUNNEL_ORACLE = """
WITH u AS (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
v AS (SELECT user_id, MIN(ts) AS t_view FROM events
      WHERE user_id IS NOT NULL AND event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1)
SELECT (SELECT COUNT(*) FROM u) AS n_users,
       (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchase_after_click
"""


@register(
    "funnel_conversion",
    oracle=_FUNNEL_ORACLE,
    tags=("scale", "agg", "join"),
    doc="Ordered conversion funnel (view -> click -> purchase, each "
    "step strictly after the previous step's first occurrence): one "
    "conditional-min aggregate per stage, user-level stage frames "
    "joined back onto events ON user_id — every stage shuffles on the "
    "same key, so the exchanges are reused and no per-user frame is "
    "ever broadcast (user cardinality is unbounded at 100 TB; AQE "
    "still picks broadcast when a stage frame is actually small). "
    "Integer counts only, engine-exact.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    t_view = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    t_click = (
        ev.join(t_view, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).alias("t_click")
        )
    )
    t_purchase = (
        ev.join(t_click, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).alias("t_purchase")
        )
    )
    stages = (
        t_view.join(t_click, "user_id", "full")
        .join(t_purchase, "user_id", "full")
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    )


_COHORT_ORACLE = """
WITH e AS (
  SELECT user_id, date_trunc('week', ts) AS week
  FROM events WHERE user_id IS NOT NULL
),
f AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY 1),
a AS (SELECT DISTINCT user_id, week FROM e)
SELECT CAST(floor(epoch(f.cohort_week)) AS BIGINT) AS cohort_week_s,
       CAST(floor(epoch(a.week)) AS BIGINT) AS week_s,
       COUNT(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2
"""


@register(
    "cohort_retention",
    oracle=_COHORT_ORACLE,
    tags=("scale", "agg", "join"),
    doc="Cohort retention matrix: users cohorted by first-activity "
    "week (date_trunc week = Monday in both engines), counted per "
    "(cohort_week, activity_week). Distinct + min aggregates on "
    "user_id, cohort frame joined on the same key (per-user, so never "
    "broadcast — AQE upgrades the join when it is genuinely small); weeks "
    "emitted as epoch-second BIGINTs (canonicalizer-safe).",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .selectExpr("user_id", "date_trunc('week', ts) AS week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .selectExpr(
            "unix_timestamp(cohort_week) AS cohort_week_s",
            "unix_timestamp(week) AS week_s",
            "n_users",
        )
    )


_TABLE_DIFF_ORACLE = """
SELECT o_orderkey, 'missing_right' AS status FROM orders
WHERE o_orderkey % 101 != 5 AND o_orderkey % 97 = 0
UNION ALL
SELECT o_orderkey, 'missing_left' AS status FROM orders
WHERE o_orderkey % 101 = 5 AND o_orderkey % 97 != 0
UNION ALL
SELECT o_orderkey, 'different' AS status FROM orders
WHERE o_orderkey % 101 != 5 AND o_orderkey % 97 != 0 AND o_orderkey % 89 = 1
"""


@register(
    "table_diff_reconcile",
    oracle=_TABLE_DIFF_ORACLE,
    tags=("scale", "join"),
    doc="Row-level table reconciliation (operators/reconcile.py): both "
    "sides reduce to (key, md5 row digest) before a full-outer "
    "hash join, so the shuffle carries two columns regardless of table "
    "width and output size equals the drift. The fixture plants "
    "deletions (key%97=0), insertions (key%101=5) and a value "
    "mutation (key%89=1) into two views of orders; the oracle derives "
    "the expected diff from those rules — ground truth independent of "
    "the digest encoding.",
)
def q_table_diff_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.reconcile import table_diff

    orders = load_table(spark, sf_dir, "orders")
    left = orders.filter(F.col("o_orderkey") % 101 != 5)
    right = orders.filter(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 1, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    return table_diff(left, right, ["o_orderkey"])


_EXACT_PCT_ORACLE = """
SELECT event_type,
       COUNT(value) AS n,
       CAST(quantile_cont(value, 0.5) AS DOUBLE) AS med,
       CAST(quantile_cont(value, 0.9) AS DOUBLE) AS p90
FROM events WHERE value IS NOT NULL
GROUP BY event_type
"""


@register(
    "value_percentiles_exact",
    oracle=_EXACT_PCT_ORACLE,
    tags=("scale", "agg"),
    doc="EXACT per-group percentiles (linear interpolation on the "
    "sorted group): Spark `percentile` == DuckDB `quantile_cont` "
    "bit-for-bit (verified incl. interpolated values). The exact "
    "complement of approx_quantile_gate — per-group sort state, so at "
    "100 TB reserve it for bounded groups and use the approx sketch "
    "for wide rollups.",
)
def q_value_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        F.expr("CAST(percentile(value, 0.5) AS DOUBLE)").alias("med"),
        F.expr("CAST(percentile(value, 0.9) AS DOUBLE)").alias("p90"),
    )


_TYPE_MAP_ORACLE = """
WITH per AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ',' ORDER BY event_type)
         AS type_counts
FROM per GROUP BY user_id
"""


@register(
    "user_event_type_map",
    oracle=_TYPE_MAP_ORACLE,
    tags=("scale", "agg"),
    doc="MapType aggregation (§1.2 nested-type parity): per-user "
    "event_type -> count built with map_from_entries over a "
    "sort_array'd collect_list (collect_list order is "
    "nondeterministic under parallelism — the sort is what makes the "
    "map reproducible), rendered through map_entries to a "
    "canonicalizer-safe sorted string.",
)
def q_user_event_type_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("user_id").agg(
        F.expr(
            "concat_ws(',', transform("
            "  map_entries(map_from_entries(sort_array(collect_list(struct(event_type, n))))),"
            "  e -> concat(e.key, ':', CAST(e.value AS STRING))))"
        ).alias("type_counts")
    )


_FUZZY_ORACLE = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 8
"""


@register(
    "fuzzy_part_pairs",
    oracle=_FUZZY_ORACLE,
    tags=("scale", "join"),
    doc="Blocked fuzzy matching (entity resolution): equi-join on "
    "blocking keys (brand, size) generates candidates — the shuffle is "
    "on the block key, never all-pairs — then Levenshtein verifies "
    "within blocks only (both engines compute the identical integer "
    "edit distance). The blocking-then-verify shape is the same "
    "candidates-then-exact pattern as the MinHash pipeline, on string "
    "keys instead of shingle hashes.",
)
def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    a = part.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("name_a"),
        "p_brand", "p_size",
    )
    b = part.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("name_b"),
        "p_brand", "p_size",
    )
    return (
        a.join(b, on=["p_brand", "p_size"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit_dist") <= 8)
        .select("id_a", "id_b", "edit_dist")
    )


_MAJOR_SUPPLIERS_ORACLE = """
WITH rev AS (
  SELECT l_suppkey, SUM(CAST(round((l_extendedprice) * 100) AS BIGINT)) AS r100
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey,
       CAST(r100 AS DOUBLE) / 100.0 AS supplier_revenue
FROM rev
WHERE CAST(r100 AS DOUBLE) > (SELECT CAST(SUM(r100) AS DOUBLE) FROM rev) * 0.0015
"""


@register(
    "major_suppliers",
    oracle=_MAJOR_SUPPLIERS_ORACLE,
    tags=("scale", "agg"),
    doc="TPC-H Q11 shape — value concentration against a global scalar: "
    "suppliers whose revenue exceeds 0.15% of total. The scalar total "
    "is the exact BIGINT sum of the per-supplier fixed-point sums "
    "(associative, so it equals the whole-table sum), broadcast onto "
    "the grouped frame as a 1-row cross join — Catalyst's scalar-"
    "subquery plan, no second scan of lineitem.",
)
def q_major_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(scaled_long("l_extendedprice", 2)).alias("r100")
    )
    total = rev.agg(F.sum("r100").alias("t100"))
    return (
        rev.crossJoin(F.broadcast(total))
        .filter(F.col("r100").cast("double") > F.col("t100").cast("double") * 0.0015)
        .select(
            "l_suppkey",
            (F.col("r100").cast("double") / 100.0).alias("supplier_revenue"),
        )
    )


_PCTRANK_ORACLE = """
SELECT o_orderkey, o_orderpriority,
       CAST(percent_rank() OVER w AS DOUBLE) AS pr,
       CAST(cume_dist() OVER w AS DOUBLE) AS cd,
       nth_value(o_orderkey, 2) OVER w AS second_key
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
"""


@register(
    "order_price_window_stats",
    oracle=_PCTRANK_ORACLE,
    tags=("scale", "window"),
    doc="Relative-rank window functions (completes the window "
    "inventory): percent_rank, cume_dist, nth_value over a total order "
    "(totalprice, orderkey tiebreak — unique ordering makes the rank "
    "ratios engine-exact doubles). One exchange+sort per partition "
    "key, shared by all three functions.",
)
def q_order_price_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).cast("double").alias("pr"),
        F.cume_dist().over(w).cast("double").alias("cd"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


# final derivation shared verbatim by both engines: every input is an
# exact integer aggregate cast to double, and each +,-,*,/,sqrt is an
# IEEE-defined op — identical text => identical doubles.
_MOMENT_DERIVE = """
  n,
  CAST(CAST(sx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS DOUBLE) AS mean_qty,
  CAST((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) / 10000.0 AS DOUBLE) AS var_qty,
  CAST((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE) * CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       AS DOUBLE) AS corr_qty_price
"""

_MOMENTS_ORACLE = f"""
WITH m AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(x) AS sx,
         SUM(x * x) AS sx2,
         SUM(y) AS sy,
         SUM(CAST(y AS HUGEINT) * y) AS sy2,
         SUM(x * y) AS sxy
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem)
  GROUP BY l_returnflag
)
SELECT l_returnflag, {_MOMENT_DERIVE} FROM m
"""


@register(
    "lineitem_moment_stats",
    oracle=_MOMENTS_ORACLE,
    tags=("scale", "agg"),
    doc="Reproducible statistical aggregates (mean / sample variance / "
    "correlation): built-in stddev/corr accumulate doubles in "
    "partition order and are NOT run-stable on a cluster, so the "
    "moments are accumulated as EXACT fixed-point integers (the one "
    "sum that can exceed int64, sum(y^2), rides DECIMAL/HUGEINT) and "
    "the statistics derive from them in double arithmetic shared "
    "verbatim with the oracle — order-independent and engine-exact.",
)
def q_lineitem_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    from dagster_etl_spark.functions import scaled_long

    base = li.select(
        "l_returnflag",
        scaled_long("l_quantity", 2).alias("x"),
        scaled_long("l_extendedprice", 2).alias("y"),
    )
    m = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("x * x")).alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("sy2"),
        F.sum(F.expr("x * y")).alias("sxy"),
    )
    return m.selectExpr("l_returnflag", *_MOMENT_DERIVE.strip().split(",\n"))


_TOP_REVENUE_SUPPLIERS_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round((l_extendedprice * (1 - l_discount)) * 1000000)
                       AS BIGINT)) AS BIGINT) AS rev_scaled
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
), mx AS (
  SELECT MAX(rev_scaled) AS max_rev FROM rev
)
SELECT s.s_suppkey, s.s_name,
       CAST(r.rev_scaled AS DOUBLE) / 1000000.0 AS total_revenue
FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey CROSS JOIN mx
WHERE r.rev_scaled = mx.max_rev
"""


@register(
    "top_revenue_suppliers",
    oracle=_TOP_REVENUE_SUPPLIERS_ORACLE,
    tags=("scale", "agg", "subquery"),
    doc="TPC-H Q15 shape (top supplier by windowed revenue): the "
    "correlated `revenue = (SELECT MAX ...)` predicate decorrelated "
    "into a 1-row broadcast max over the revenue aggregate — ties "
    "kept, as in the spec. Revenue compared on the exact BIGINT "
    "fixed-point sum, so the max-equality never sits on a float "
    "boundary; the supplier dim is broadcast.",
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'"
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            scaled_long(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
        ).alias("rev_scaled")
    )
    mx = rev.agg(F.max("rev_scaled").alias("max_rev"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_scaled") == F.col("max_rev"))
        .join(F.broadcast(sup), rev.l_suppkey == sup.s_suppkey)
        .selectExpr(
            "s_suppkey",
            "s_name",
            "CAST(rev_scaled AS DOUBLE) / 1000000.0 AS total_revenue",
        )
    )


_SOLE_FAILED_SUPPLIER_ORACLE = """
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R') r1
  ON r1.l_suppkey = s.s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = r1.l_orderkey
      AND l2.l_suppkey <> r1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = r1.l_orderkey
      AND l3.l_suppkey <> r1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_suppkey, s.s_name
"""


@register(
    "sole_failed_supplier",
    oracle=_SOLE_FAILED_SUPPLIER_ORACLE,
    tags=("scale", "join", "subquery"),
    doc="TPC-H Q21 shape (suppliers who ALONE failed multi-supplier "
    "orders; returnflag 'R' stands in for the fixture's missing "
    "commit/receipt dates): the EXISTS / NOT-EXISTS pair decorrelated "
    "into ONE aggregation over distinct (order, supplier, failed) "
    "tuples — per order, a failing supplier counts iff the order has "
    "other suppliers (n_supp >= 2) and no other failer (n_failed == "
    "1). The oracle keeps the textbook correlated form, proving the "
    "single-pass rewrite equivalent.",
)
def q_sole_failed_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("failed")
    )
    stats = per.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("failed").alias("n_failed"),
    )
    sole = (
        per.filter(F.col("failed") == 1)
        .join(stats, on="l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_failed") == 1))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(F.broadcast(sup), sole.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
