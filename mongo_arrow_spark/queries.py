"""The engine's query battery: every entry is (Spark impl, DuckDB oracle).

This is the demonstration surface for SURVEY §2: TPC-H-style relational
queries written Spark-first, MQL pipelines run through the translator
(proving the reference's delegated query language works on Catalyst), and
the LLM-pipeline extension operators. The driver executes each ``queries()``
callable at sf0.01 and hash-matches it against ``oracle_sql()`` in DuckDB.

Determinism contract (what makes hash-matching possible):
- Money sums go through exact DECIMAL(18,2/4) arithmetic in BOTH engines,
  then round+cast to double — no float-summation-order flake.
- Top-k selections order by the exact (decimal/int) keys with unique
  tie-breaks before limiting, so the selected SET is engine-independent.
- Averages/ratios are rounded to 4 decimals (error ~1e-12 ≪ 1e-4).
- Counts cast to BIGINT on both sides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongo_arrow_spark.api import aggregate
from mongo_arrow_spark.operators import dedup, multimodal, similarity, text
from mongo_arrow_spark.session import read_documents_parquet

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_documents_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _dec(col, scale=2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _disc_price():
    """Exact decimal l_extendedprice*(1-l_discount), DECIMAL(18,4)."""
    return (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")


_SQL_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


def _money(c):
    return F.round(c.cast("double"), 2)


# =====================================================================
# TPC-H-style core (Spark-first DataFrame plans)
# =====================================================================


@query(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           ROUND(CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 2) AS sum_disc_price,
           ROUND(CAST(SUM(CAST({_SQL_DISC_PRICE} * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    """TPC-H Q1. One scan, hash agg with map-side partials; only the
    (returnflag × linestatus ≤ 6 groups) shuffle. reference delegates this
    shape to mongod's $group (SURVEY 2.E)."""
    li = _t(spark, sf_dir, "lineitem")
    charge = (_disc_price() * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))).cast(
        "decimal(18,6)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            _money(F.sum(_dec("l_extendedprice"))).alias("sum_base_price"),
            _money(F.sum(_disc_price())).alias("sum_disc_price"),
            _money(F.sum(charge)).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


@query(
    "q03_shipping_priority",
    f"""
    WITH r AS (
      SELECT l_orderkey,
             SUM({_SQL_DISC_PRICE}) AS rev,
             o_orderdate
      FROM customer JOIN orders ON c_custkey = o_custkey
                    JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-03-15'
        AND l_shipdate > TIMESTAMP '1996-03-15'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY rev DESC, l_orderkey LIMIT 10
    )
    SELECT l_orderkey, ROUND(CAST(rev AS DOUBLE), 2) AS revenue, o_orderdate FROM r
    """,
)
def q03(spark, sf_dir):
    """TPC-H Q3. customer is the small dim → broadcast; lineitem⋈orders is
    the one real shuffle; top-10 via TakeOrdered on the exact decimal."""
    cst = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1996-03-15"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1996-03-15"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cst, orders.o_custkey == cst.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey", _money(F.col("rev")).alias("revenue"), "o_orderdate"
        )
    )


@query(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, ROUND(CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 2) AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q05(spark, sf_dir):
    """TPC-H Q5. region/nation/supplier/customer broadcast; the fact-fact
    join (lineitem⋈orders) is the only large shuffle."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cst = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cst, orders.o_custkey == cst.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (cst.c_nationkey == sup.s_nationkey),
        )
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_money(F.sum(_disc_price())).alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    """
    SELECT ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06(spark, sf_dir):
    """TPC-H Q6: pure scan+filter+agg — every predicate reaches the parquet
    reader (PushedFilters), projection prunes to 4 columns."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(_money(F.sum(rev)).alias("revenue"))
    )


@query(
    "q10_returned_items",
    f"""
    WITH r AS (
      SELECT c_custkey, c_name, n_name, SUM({_SQL_DISC_PRICE}) AS rev
      FROM customer JOIN orders ON c_custkey = o_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY rev DESC, c_custkey LIMIT 20
    )
    SELECT c_custkey, c_name, n_name, ROUND(CAST(rev AS DOUBLE), 2) AS revenue FROM r
    """,
)
def q10(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cst = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cst, orders.o_custkey == cst.c_custkey)
        .join(F.broadcast(nation), cst.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).alias("rev"))
        .orderBy(F.col("rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "n_name", _money(F.col("rev")).alias("revenue"))
    )


@query(
    "q14_promo_effect",
    f"""
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC_PRICE}
                                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14(spark, sf_dir):
    """TPC-H Q14: part is broadcast; conditional decimal aggregation."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    part = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 300
    """,
)
def q18(spark, sf_dir):
    """TPC-H Q18 shape: orders whose lineitems sum past a quantity
    threshold. Quantity sums are whole numbers → exact in double.

    Classic Q18 plan: pre-aggregate lineitem by l_orderkey and apply the
    HAVING threshold BEFORE any join — the > 300 filter keeps a tiny
    fraction of orders, so the subsequent joins move a sliver of each
    fact table. No broadcast hints: customer is fact-sized at real scale
    factors (sf100 → 15 M rows); AQE picks broadcast when the filtered
    side actually fits."""
    cst = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cst, orders.o_custkey == cst.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice").cast("double"), 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "q_rollup_orders",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM orders
    GROUP BY ROLLUP (yr, o_orderpriority)
    """,
)
def q_rollup(spark, sf_dir):
    """ROLLUP over (year, priority) — a capability MQL lacks entirely
    (SURVEY 2.E 'grouping sets'): subtotals + grand total in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            "o_orderpriority",
            "o_totalprice",
        )
        .rollup("yr", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("total"),
        )
    )


@query(
    "q_topk_per_brand",
    """
    SELECT p_brand, p_partkey, ROUND(CAST(p_retailprice AS DOUBLE), 2) AS price, rn
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                  ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
      FROM part)
    WHERE rn <= 3
    """,
)
def q_topk_per_brand(spark, sf_dir):
    """Top-k per group: the window + row_number pattern (MQL
    $setWindowFields/$topN shape) with a unique tie-break."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round(F.col("p_retailprice").cast("double"), 2).alias("price"),
            "rn",
        )
    )


@query(
    "q_customers_without_orders",
    """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
)
def q_anti_join(spark, sf_dir):
    """Anti-join (MQL: $lookup + $match size 0; Spark: left_anti — no
    array materialization, broadcast-able)."""
    cst = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    nation = _t(spark, sf_dir, "nation")
    return (
        cst.join(orders, cst.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cst.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


@query(
    "q_events_hourly",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_hourly(spark, sf_dir):
    """Tumbling-window batch aggregation over the event stream table —
    the batch twin of the Structured Streaming windowed agg."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        _money(F.sum(_dec("value"))).alias("total_value"),
    )


@query(
    "q_events_json",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_events_json(spark, sf_dir):
    """Semi-structured props column: JSON path extraction JVM-side
    (get_json_object) — the document-data capability of the reference's
    BSON model (SURVEY 2.E json row)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long"))
        .cast("long")
        .alias("sum_k"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@query(
    "q_window_running_sum",
    """
    SELECT event_id, user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running
    FROM events
    """,
)
def q_window_running(spark, sf_dir):
    """Running sum per user ordered by time — decimal-exact prefix sums so
    both engines agree bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(_dec("value")).over(w).cast("double"), 2).alias("running"),
    )


@query(
    "q_window_lag_gap",
    """
    SELECT o_orderkey, o_custkey,
           CAST(date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def q_window_lag(spark, sf_dir):
    """$shift/lag equivalent: days since the customer's previous order."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
        )
        .cast("long")
        .alias("gap_days"),
    )
