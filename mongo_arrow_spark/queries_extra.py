"""Additional capability queries: set operations, pivot, cube, distinct
counts, array higher-order functions — Spark capabilities beyond MQL's
surface (SURVEY 2.E notes several as 'free capability wins')."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_arrow_spark.api import aggregate
from mongo_arrow_spark.queries import _t, query


@query(
    "q_distinct_counts",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_distinct_counts(spark, sf_dir):
    """COUNT DISTINCT: expand+two-phase agg in Spark (exact); the approx
    path (approx_count_distinct/HLL) is the 100TB default — kept out of the
    oracle since sketches are engine-specific."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )


@query(
    "q_pivot_status",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS DOUBLE) AS qty_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_status(spark, sf_dir):
    """Pivot: one shuffle, conditional aggregation per pivot value (the
    plan Spark emits for an explicit values list — never the two-pass
    distinct-discovery variant at scale)."""
    out = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
    )
    return out.select(
        "l_returnflag",
        F.coalesce(F.col("F"), F.lit(0.0)).cast("double").alias("qty_F"),
        F.coalesce(F.col("O"), F.lit(0.0)).cast("double").alias("qty_O"),
    )


@query(
    "q_cube_counts",
    """
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_counts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


@query(
    "q_setops_customers",
    """
    SELECT 'intersect' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      INTERSECT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997)
    UNION ALL
    SELECT 'except' AS op, o_custkey FROM (
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
      EXCEPT
      SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997)
    """,
)
def q_setops(spark, sf_dir):
    """INTERSECT + EXCEPT — absent from MQL (SURVEY 2.E set ops row).
    One battery entry covers both DISTINCT set operations; `op` tags
    which branch each row came from."""
    orders = _t(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    inter = y96.intersect(y97).select(F.lit("intersect").alias("op"), "o_custkey")
    # subtract == EXCEPT DISTINCT semantics, matches SQL EXCEPT
    exc = y96.subtract(y97).select(F.lit("except").alias("op"), "o_custkey")
    return inter.unionAll(exc)


@query(
    "q_exists_semi",
    """
    SELECT o_orderkey FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
    """,
)
def q_exists_semi(spark, sf_dir):
    """EXISTS → left_semi join (no array materialization, broadcastable)."""
    orders = _t(spark, sf_dir, "orders")
    big = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 50)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey")


@query(
    "mql_array_hof",
    """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS BIGINT) AS n_long_words,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS total_chars,
           array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',') AS first3
    FROM documents
    """,
)
def mql_array_hof(spark, sf_dir):
    """$filter/$map/$reduce/$sortArray/$slice as one pipeline — the MQL
    array higher-order surface on real data."""
    return aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {"$addFields": {"words": {"$split": ["$text", " "]}}},
            {
                "$project": {
                    "_id": 0,
                    "doc_id": 1,
                    "n_long_words": {
                        "$toLong": {
                            "$size": {
                                "$filter": {
                                    "input": "$words",
                                    "as": "w",
                                    "cond": {"$gt": [{"$strLenCP": "$$w"}, 5]},
                                }
                            }
                        }
                    },
                    "total_chars": {
                        "$toLong": {
                            "$reduce": {
                                "input": {
                                    "$map": {
                                        "input": "$words",
                                        "as": "w",
                                        "in": {"$strLenCP": "$$w"},
                                    }
                                },
                                "initialValue": 0,
                                "in": {"$add": ["$$value", "$$this"]},
                            }
                        }
                    },
                    "first3": {
                        "$reduce": {
                            "input": {
                                "$slice": [
                                    {
                                        "$sortArray": {
                                            "input": {
                                                "$setUnion": "$words"
                                            },
                                            "sortBy": 1,
                                        }
                                    },
                                    3,
                                ]
                            },
                            "initialValue": "",
                            "in": {
                                "$cond": [
                                    {"$eq": ["$$value", ""]},
                                    "$$this",
                                    {"$concat": ["$$value", ",", "$$this"]},
                                ]
                            },
                        }
                    },
                }
            },
        ],
    )


@query(
    "mql_percentiles",
    """
    SELECT l_returnflag,
           ROUND(median(l_quantity), 4) AS med_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def mql_percentiles(spark, sf_dir):
    """$median/$percentile accumulators (MQL 7.0) → Spark exact
    percentile with linear interpolation (matches quantile_cont)."""
    return aggregate(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$group": {
                    "_id": "$l_returnflag",
                    "med_qty": {"$median": {"input": "$l_quantity"}},
                    # one accumulator for both quantiles = ONE per-group
                    # value buffer for l_extendedprice instead of two
                    "pp": {
                        "$percentile": {
                            "input": "$l_extendedprice", "p": [0.25, 0.75]
                        }
                    },
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "l_returnflag": "$_id",
                    "med_qty": {"$round": ["$med_qty", 4]},
                    "p25_price": {"$round": [{"$arrayElemAt": ["$pp", 0]}, 4]},
                    "p75_price": {"$round": [{"$arrayElemAt": ["$pp", 1]}, 4]},
                }
            },
        ],
    )


@query("q_approx_distinct")  # rows-only: HLL sketch values are engine-specific
def q_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HLL): the 100TB default for distinct counts
    — merge-commutative sketches, one narrow shuffle. Exact twin is
    q_distinct_counts (oracle-checked); this documents the approx path."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
        )
    )


@query(
    "q_events_props_map",
    """
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(v AS BIGINT)) AS BIGINT) AS total
    FROM (SELECT unnest(map_keys(CAST(props AS MAP(VARCHAR, BIGINT)))) AS k,
                 unnest(map_values(CAST(props AS MAP(VARCHAR, BIGINT)))) AS v
          FROM (SELECT CAST(props AS JSON) AS props FROM events))
    GROUP BY k
    """,
)
def q_events_props_map(spark, sf_dir):
    """Semi-structured props as a real MapType (the engine improvement over
    the reference's dynamic-key structs, SURVEY §1.2): from_json to map,
    explode entries, aggregate per key."""
    ev = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("total"),
        )
    )


@query(
    "q_quarterly_trend",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS actives
    FROM orders GROUP BY yr, qtr
    """,
)
def q_quarterly_trend(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("o_custkey").cast("long").alias("actives"),
    )
