"""Queries expressed as MQL pipelines and run through the translator.

Each of these is what a reference (PyMongoArrow) user would pass as the
``pipeline`` argument (reference api.py:216-217); here it executes on
Catalyst via mongo_arrow_spark.mql and hash-matches an ANSI-SQL oracle —
the proof that the delegated query surface survived the move.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_arrow_spark.api import aggregate
from mongo_arrow_spark.queries import _t, query


@query(
    "mql_match_project",
    """
    SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE) * 1.1, 4) AS taxed,
           CASE WHEN o_totalprice >= 200000 THEN 'big' ELSE 'small' END AS size_class
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 150000
    """,
)
def mql_match_project(spark, sf_dir):
    """find-style $match + computed $project — the reference's own flagship
    test shape ({"$multiply": [...]}, test_arrow.py:140-156)."""
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderstatus": "F", "o_totalprice": {"$gt": 150000}}},
            {
                "$project": {
                    "o_orderkey": 1,
                    # round at 4 decimals: the true product has 3-decimal
                    # scale, so no rounding midpoint exists and MQL's
                    # half-even agrees with the oracle's half-up
                    "taxed": {
                        "$round": [{"$multiply": [{"$toDouble": "$o_totalprice"}, 1.1]}, 4]
                    },
                    "size_class": {
                        "$cond": [
                            {"$gte": ["$o_totalprice", 200000]},
                            "big",
                            "small",
                        ]
                    },
                }
            },
        ],
    )


@query(
    "mql_group_accumulators",
    """
    SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS total_qty,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def mql_group_accumulators(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "lineitem"),
        [
            {
                "$group": {
                    "_id": "$l_returnflag",
                    "total_qty": {"$sum": "$l_quantity"},
                    "avg_disc": {"$avg": "$l_discount"},
                    "first_ship": {"$min": "$l_shipdate"},
                    "last_ship": {"$max": "$l_shipdate"},
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "l_returnflag": "$_id",
                    "total_qty": {"$toDouble": "$total_qty"},
                    "avg_disc": {"$round": ["$avg_disc", 4]},
                    "first_ship": 1,
                    "last_ship": 1,
                    "n": {"$toLong": "$n"},
                }
            },
        ],
    )


@query(
    "mql_unwind_wordcount",
    """
    SELECT word, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    GROUP BY word
    """,
)
def mql_unwind_wordcount(spark, sf_dir):
    """$unwind (explode) word count over documents — flatten stage of
    SURVEY 2.E."""
    return aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {"$project": {"_id": 0, "words": {"$split": ["$text", " "]}}},
            {"$unwind": "$words"},
            {"$group": {"_id": "$words", "n": {"$sum": 1}}},
            {
                "$project": {
                    "_id": 0,
                    "word": "$_id",
                    "n": {"$toLong": "$n"},
                }
            },
        ],
    )


@query(
    "mql_lookup_join",
    """
    SELECT o_orderkey, c_name,
           ROUND(CAST(o_totalprice AS DOUBLE), 2) AS o_totalprice
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    """,
)
def mql_lookup_join(spark, sf_dir):
    """$lookup → grouped-foreign-side left join; $unwind flattens the 1:1
    match back out (the fan-out-free plan described in pipeline.py)."""
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_totalprice": {"$gt": 400000}}},
            {
                "$lookup": {
                    "from": "customer",
                    "localField": "o_custkey",
                    "foreignField": "c_custkey",
                    "as": "cust",
                }
            },
            {"$unwind": "$cust"},
            {
                "$project": {
                    "_id": 0,
                    "o_orderkey": 1,
                    "c_name": "$cust.c_name",
                    "o_totalprice": {
                        "$round": [{"$toDouble": "$o_totalprice"}, 2]
                    },
                }
            },
        ],
        collections={"customer": _t(spark, sf_dir, "customer")},
    )


@query(
    "mql_union_with",
    """
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT o_orderstatus FROM orders WHERE o_totalprice > 350000
      UNION ALL
      SELECT o_orderstatus FROM orders WHERE o_totalprice < 50000
    ) GROUP BY o_orderstatus
    """,
)
def mql_union_with(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return aggregate(
        orders,
        [
            {"$match": {"o_totalprice": {"$gt": 350000}}},
            {"$project": {"_id": 0, "o_orderstatus": 1}},
            {
                "$unionWith": {
                    "coll": "orders",
                    "pipeline": [
                        {"$match": {"o_totalprice": {"$lt": 50000}}},
                        {"$project": {"_id": 0, "o_orderstatus": 1}},
                    ],
                }
            },
            {"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}},
            {"$project": {"_id": 0, "o_orderstatus": "$_id", "n": {"$toLong": "$n"}}},
        ],
        collections={"orders": orders},
    )


@query(
    "mql_window_rank",
    """
    SELECT o_custkey, o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
)
def mql_window_rank(spark, sf_dir):
    """$setWindowFields $rank — per-customer top-3 orders."""
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$o_custkey",
                    "sortBy": {"o_totalprice": -1, "o_orderkey": 1},
                    "output": {"rnk": {"$rank": {}}},
                }
            },
            {"$match": {"rnk": {"$lte": 3}}},
            {
                "$project": {
                    "_id": 0,
                    "o_custkey": 1,
                    "o_orderkey": 1,
                    "price": {"$round": [{"$toDouble": "$o_totalprice"}, 2]},
                    "rnk": {"$toLong": "$rnk"},
                }
            },
        ],
    )


@query(
    "mql_window_moving_avg",
    """
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM events
    """,
)
def mql_window_moving_avg(spark, sf_dir):
    """$setWindowFields documents-frame moving average (3-row window)."""
    return aggregate(
        _t(spark, sf_dir, "events"),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$user_id",
                    "sortBy": {"ts": 1, "event_id": 1},
                    "output": {
                        "mov_avg": {
                            "$avg": "$value",
                            "window": {"documents": [-2, "current"]},
                        }
                    },
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "event_id": 1,
                    "user_id": 1,
                    "mov_avg": {"$round": ["$mov_avg", 4]},
                }
            },
        ],
    )


@query(
    "mql_bucket",
    """
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, ROUND(AVG(o_totalprice), 4) AS avg_price
    FROM (SELECT CASE
            WHEN o_totalprice >= 0 AND o_totalprice < 100000 THEN 0
            WHEN o_totalprice >= 100000 AND o_totalprice < 200000 THEN 100000
            WHEN o_totalprice >= 200000 AND o_totalprice < 300000 THEN 200000
            WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 300000
            ELSE 400000 END AS bucket, o_totalprice
          FROM orders)
    GROUP BY bucket
    """,
)
def mql_bucket(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$bucket": {
                    "groupBy": "$o_totalprice",
                    "boundaries": [0, 100000, 200000, 300000, 400000],
                    "default": 400000,
                    "output": {
                        "n": {"$sum": 1},
                        "avg_price": {"$avg": "$o_totalprice"},
                    },
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "bucket": "$_id",
                    "n": {"$toLong": "$n"},
                    "avg_price": {"$round": ["$avg_price", 4]},
                }
            },
        ],
    )


@query(
    "mql_group_by_month",
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mth,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
    FROM orders GROUP BY yr, mth
    """,
)
def mql_group_by_month(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$group": {
                    "_id": {
                        "yr": {"$year": "$o_orderdate"},
                        "mth": {"$month": "$o_orderdate"},
                    },
                    "n": {"$sum": 1},
                    "total": {"$sum": {"$toDecimal": "$o_totalprice"}},
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "yr": {"$toLong": "$_id.yr"},
                    "mth": {"$toLong": "$_id.mth"},
                    "n": {"$toLong": "$n"},
                    "total": {"$round": [{"$toDouble": "$total"}, 2]},
                }
            },
        ],
    )


@query(
    "mql_string_ops",
    """
    SELECT c_custkey, upper(c_name) AS name_upper,
           CAST(length(c_name) AS BIGINT) AS name_len,
           substr(c_name, 10, 5) AS id_part,
           c_custkey % 7 AS key_mod
    FROM customer
    """,
)
def mql_string_ops(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$project": {
                    "_id": 0,
                    "c_custkey": 1,
                    "name_upper": {"$toUpper": "$c_name"},
                    "name_len": {"$toLong": {"$strLenCP": "$c_name"}},
                    "id_part": {"$substrCP": ["$c_name", 9, 5]},
                    "key_mod": {"$mod": ["$c_custkey", 7]},
                }
            }
        ],
    )


@query(
    "mql_switch_tiers",
    """
    SELECT tier, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                      WHEN c_acctbal < 3000 THEN 'low'
                      WHEN c_acctbal < 7000 THEN 'mid'
                      ELSE 'high' END AS tier
          FROM customer)
    GROUP BY tier
    """,
)
def mql_switch_tiers(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$addFields": {
                    "tier": {
                        "$switch": {
                            "branches": [
                                {"case": {"$lt": ["$c_acctbal", 0]}, "then": "debt"},
                                {"case": {"$lt": ["$c_acctbal", 3000]}, "then": "low"},
                                {"case": {"$lt": ["$c_acctbal", 7000]}, "then": "mid"},
                            ],
                            "default": "high",
                        }
                    }
                }
            },
            {"$sortByCount": "$tier"},
            {"$project": {"_id": 0, "tier": "$_id", "n": {"$toLong": "$count"}}},
        ],
    )


@query(
    "mql_facet",
    """
    SELECT
      (SELECT to_json(list(struct_pack(_id := _id, n := n) ORDER BY _id))
       FROM (SELECT o_orderstatus AS _id, CAST(COUNT(*) AS BIGINT) AS n
             FROM orders GROUP BY 1)) AS by_status,
      (SELECT to_json(list(struct_pack(_id := _id, n := n) ORDER BY _id))
       FROM (SELECT o_orderpriority AS _id, CAST(COUNT(*) AS BIGINT) AS n
             FROM orders GROUP BY 1)) AS by_priority
    """,
)
def mql_facet(spark, sf_dir):
    """$facet: two summaries of one pass in a single result document.

    The facet arrays are sorted (collect_list order is shuffle-dependent)
    and serialized with to_json so the driver's canonicalizer gets hashable
    string cells; DuckDB's to_json emits the identical compact encoding.
    """
    out = aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$facet": {
                    "by_status": [
                        {"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}},
                        {"$sort": {"_id": 1}},
                    ],
                    "by_priority": [
                        {"$group": {"_id": "$o_orderpriority", "n": {"$sum": 1}}},
                        {"$sort": {"_id": 1}},
                    ],
                }
            }
        ],
    )
    return out.select(
        F.to_json(F.array_sort("by_status")).alias("by_status"),
        F.to_json(F.array_sort("by_priority")).alias("by_priority"),
    )


@query("mql_sample")  # rows-only: random content, deterministic row count
def mql_sample(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [{"$sample": {"size": 100, "seed": 42}}, {"$project": {"_id": 0, "o_orderkey": 1}}],
    )


@query(
    "mql_sort_skip_limit",
    """
    SELECT o_orderkey, ROUND(CAST(o_totalprice AS DOUBLE), 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10
    """,
)
def mql_sort_skip_limit(spark, sf_dir):
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {"$sort": {"o_totalprice": -1, "o_orderkey": 1}},
            {"$skip": 10},
            {"$limit": 50},
            {
                "$project": {
                    "_id": 0,
                    "o_orderkey": 1,
                    "price": {"$round": [{"$toDouble": "$o_totalprice"}, 2]},
                }
            },
        ],
    )


@query(
    "mql_vector_search",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND((1 + list_sum(list_transform(list_zip(embedding, qv),
                     p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
             / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) / 2, 4)
           AS score
    FROM embeddings, q
    ORDER BY score DESC, vec_id LIMIT 10
    """,
)
def mql_vector_search(spark, sf_dir):
    """Atlas $vectorSearch stage (ENN, Atlas cosine score normalization
    (1+cos)/2) + $meta score projection — the reference reaches this only
    through an Atlas server."""
    emb = _t(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return aggregate(
        emb,
        [
            {
                "$vectorSearch": {
                    "path": "embedding",
                    "queryVector": [float(x) for x in qv],
                    "limit": 10,
                    # exact ENN so the hash oracle holds; the ANN path
                    # (numCandidates sans exact) is pinned by its own
                    # recall@10 test instead of a value hash
                    "exact": True,
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "vec_id": 1,
                    "score": {"$round": [{"$meta": "vectorSearchScore"}, 4]},
                }
            },
        ],
    )


@query(
    "mql_search_text",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END) AS df2
      FROM toks
    )
    SELECT doc_id,
           ROUND(len(list_filter(t, w -> w = 'spark')) * ln(n * 1.0 / df1)
               + len(list_filter(t, w -> w = 'window')) * ln(n * 1.0 / df2), 4)
             AS score
    FROM toks, stats
    WHERE len(list_filter(t, w -> w = 'spark')) * ln(n * 1.0 / df1)
        + len(list_filter(t, w -> w = 'window')) * ln(n * 1.0 / df2) > 0
    """,
)
def mql_search_text(spark, sf_dir):
    """Atlas $search text operator (tf·ln(N/df) ranking) + $meta
    searchScore projection, all matching docs."""
    return aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {"$search": {"text": {"query": "spark window", "path": "text"}}},
            {
                "$project": {
                    "_id": 0,
                    "doc_id": 1,
                    "score": {"$round": [{"$meta": "searchScore"}, 4]},
                }
            },
        ],
    )


@query(
    "mql_window_calculus",
    """
    WITH sub AS (SELECT user_id, ts, value FROM events WHERE user_id < 20),
    lagged AS (
      SELECT user_id, ts, value,
             lag(value) OVER w AS pv,
             epoch(ts) - epoch(lag(ts) OVER w) AS dts
      FROM sub
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    )
    SELECT user_id,
           ROUND(CAST(value AS DOUBLE), 4) AS value,
           ROUND((value - pv) / NULLIF(dts / 3600.0, 0), 4) AS rate,
           ROUND(COALESCE(SUM((value + pv) * dts / 7200.0)
             OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0), 4)
             AS area
    FROM lagged
    """,
)
def mql_window_calculus(spark, sf_dir):
    """$derivative (2-doc frame) + $integral (running trapezoid sum) over
    the events stream — the time-series calculus window ops."""
    ev = _t(spark, sf_dir, "events")
    return aggregate(
        ev.filter(F.col("user_id") < 20),
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$user_id",
                    "sortBy": {"ts": 1},
                    "output": {
                        "rate": {
                            "$derivative": {"input": "$value", "unit": "hour"},
                            "window": {"documents": [-1, "current"]},
                        },
                        "area": {
                            "$integral": {"input": "$value", "unit": "hour"},
                            "window": {"documents": ["unbounded", "current"]},
                        },
                    },
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "user_id": 1,
                    "value": {"$round": [{"$toDouble": "$value"}, 4]},
                    "rate": {"$round": ["$rate", 4]},
                    "area": {"$round": ["$area", 4]},
                }
            },
        ],
    )


@query(
    "mql_geo_near",
    """
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 360 - 180 AS DOUBLE) AS lng,
             CAST((c_custkey * 7) % 170 - 85 AS DOUBLE) AS lat
      FROM customer
    ),
    scored AS (
      SELECT c_custkey,
             2 * 6378137.0 * asin(least(1.0, sqrt(
               pow(sin((radians(lat) - radians(48.85)) / 2), 2)
               + cos(radians(48.85)) * cos(radians(lat))
                 * pow(sin((radians(lng) - radians(2.35)) / 2), 2)
             ))) AS d
      FROM pts
    )
    SELECT c_custkey, ROUND(d, 1) AS dist_m
    FROM scored
    WHERE d <= 2000000
    ORDER BY d, c_custkey
    """,
)
def mql_geo_near(spark, sf_dir):
    """$geoNear (spherical haversine, no index needed) over synthetic
    lat/lng derived from customer keys; 2000 km radius, nearest-first."""
    cst = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.array(
            (F.col("c_custkey") % 360 - 180).cast("double"),
            ((F.col("c_custkey") * 7) % 170 - 85).cast("double"),
        ).alias("location"),
    )
    out = aggregate(
        cst,
        [
            {
                "$geoNear": {
                    "near": [2.35, 48.85],
                    "key": "location",
                    "distanceField": "dist_m",
                    "maxDistance": 2_000_000,
                }
            }
        ],
    )
    return out.select(
        "c_custkey", F.round("dist_m", 1).alias("dist_m")
    )


@query(
    "mql_json_schema",
    """
    SELECT c_custkey, c_acctbal
    FROM customer
    WHERE c_name IS NOT NULL AND c_acctbal >= 5000 AND c_mktsegment LIKE 'B%'
    ORDER BY c_custkey
    """,
)
def mql_json_schema(spark, sf_dir):
    """$jsonSchema validator-as-filter (draft-4 subset): required +
    typed/bounded properties compile to one pushable boolean Column. The
    reference forwards $jsonSchema to the server; no nulls in TPC-H
    customer, so pass-on-null semantics agree with the SQL oracle."""
    return aggregate(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$match": {
                    "$jsonSchema": {
                        "required": ["c_name"],
                        "properties": {
                            "c_acctbal": {"minimum": 5000},
                            "c_mktsegment": {"pattern": "^B", "type": "string"},
                        },
                    }
                }
            },
            {"$project": {"_id": 0, "c_custkey": 1, "c_acctbal": 1}},
            {"$sort": {"c_custkey": 1}},
        ],
    )


@query(
    "mql_bitwise_group",
    """
    SELECT k, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
    FROM (SELECT o_orderkey & 15 AS k, xor(o_orderkey, 255) & 63 AS x
          FROM orders)
    GROUP BY k ORDER BY k
    """,
)
def mql_bitwise_group(spark, sf_dir):
    """$bitAnd/$bitXor in $project position feeding a $group — native
    Column bitwise operators, whole-stage codegen end to end."""
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {
                "$project": {
                    "_id": 0,
                    "k": {"$bitAnd": ["$o_orderkey", 15]},
                    "x": {"$bitAnd": [{"$bitXor": ["$o_orderkey", 255]}, 63]},
                }
            },
            {"$group": {"_id": "$k", "n": {"$sum": 1}, "sx": {"$sum": "$x"}}},
            {"$project": {"_id": 0, "k": "$_id", "n": 1, "sx": 1}},
            {"$sort": {"k": 1}},
        ],
    )


@query(
    "mql_rank_fusion",
    """
    -- the fused collection is documents ⋈ embeddings (a $rankFusion doc
    -- must carry both text and embedding); at sf0.1 embeddings is the
    -- smaller table, so the lexical corpus is the JOINED id set — an
    -- oracle over all documents scores a different corpus (caught by the
    -- round-5 full-oracle sweep at sf0.1)
    WITH corpus AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN list_contains(t, 'window') THEN 1 ELSE 0 END) AS df2
      FROM toks
    ),
    lex_scored AS (
      SELECT doc_id,
             len(list_filter(t, w -> w = 'spark')) * ln(n * 1.0 / df1)
           + len(list_filter(t, w -> w = 'window')) * ln(n * 1.0 / df2) AS s
      FROM toks, stats
      WHERE len(list_filter(t, w -> w = 'spark')) > 0
         OR len(list_filter(t, w -> w = 'window')) > 0
    ),
    lex AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM lex_scored ORDER BY r LIMIT 20
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    sem_scored AS (
      SELECT vec_id AS doc_id,
             (1 + list_sum(list_transform(list_zip(embedding, qv),
                 p -> CAST(struct_extract(p, 1) AS DOUBLE) * CAST(struct_extract(p, 2) AS DOUBLE)))
               / (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))) / 2 AS s
      FROM embeddings, q
    ),
    sem AS (
      SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
      FROM sem_scored ORDER BY r LIMIT 20
    )
    SELECT COALESCE(l.doc_id, m.doc_id) AS _id,
           ROUND(COALESCE(2.0 / (60 + l.r), 0) + COALESCE(1.0 / (60 + m.r), 0), 6)
             AS score
    FROM lex l FULL JOIN sem m ON l.doc_id = m.doc_id
    """,
)
def mql_rank_fusion(spark, sf_dir):
    """Hybrid $rankFusion over $search + $vectorSearch, RRF replayed by
    the oracle as two ranked CTEs full-joined. Deterministic ranks via an
    explicit score/_id sort inside each sub-pipeline (TF-IDF scores tie
    whenever token counts tie, so _id tiebreak is load-bearing)."""
    docs = _t(spark, sf_dir, "documents").withColumnRenamed("doc_id", "_id")
    emb = _t(spark, sf_dir, "embeddings").withColumnRenamed("vec_id", "_id")
    base = docs.join(emb, "_id")
    qv = [
        float(x)
        for x in _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .first()["embedding"]
    ]
    return aggregate(
        base,
        [
            {
                "$rankFusion": {
                    "input": {
                        "pipelines": {
                            "lexical": [
                                {"$search": {"text": {"query": "spark window",
                                                      "path": "text"}}},
                                {"$set": {"s": {"$meta": "searchScore"}}},
                                {"$sort": {"s": -1, "_id": 1}},
                                {"$limit": 20},
                            ],
                            "semantic": [
                                {"$vectorSearch": {"path": "embedding",
                                                   "queryVector": qv,
                                                   "limit": 20,
                                                   "exact": True}},
                                {"$set": {"s": {"$meta": "vectorSearchScore"}}},
                                {"$sort": {"s": -1, "_id": 1}},
                            ],
                        }
                    },
                    "combination": {"weights": {"lexical": 2.0}},
                }
            },
            {"$project": {"_id": 1,
                          "score": {"$round": [{"$meta": "score"}, 6]}}},
        ],
    )


@query(
    "mql_search_meta",
    """
    SELECT
      (SELECT CAST(COUNT(*) AS BIGINT) FROM documents WHERE n_chars >= 50)
        AS match_count,
      (SELECT to_json(list(struct_pack(_id := _id, count := cnt)
                           ORDER BY cnt DESC, _id))
       FROM (SELECT lang AS _id, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM documents WHERE n_chars >= 50 AND lang IS NOT NULL
             GROUP BY 1 ORDER BY cnt DESC, _id LIMIT 3)) AS lang_buckets,
      (SELECT to_json(list(struct_pack(_id := _id, count := cnt) ORDER BY ord))
       FROM (SELECT CASE WHEN n_chars < 200 THEN '50'
                         WHEN n_chars < 400 THEN '200'
                         ELSE 'other' END AS _id,
                    CASE WHEN n_chars < 200 THEN 0
                         WHEN n_chars < 400 THEN 1
                         ELSE 2 END AS ord,
                    CAST(COUNT(*) AS BIGINT) AS cnt
             FROM documents WHERE n_chars >= 50
             GROUP BY 1, 2)) AS size_buckets
    """,
)
def mql_search_meta(spark, sf_dir):
    """$searchMeta: facet metadata (count + string/number facet buckets)
    for a range operator, flattened to JSON cells for the canonicalizer
    (the mql_facet precedent). Bucket order is deterministic by
    construction: string facets sort count desc/_id asc, number facets
    keep boundary order with the default bucket last."""
    out = aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {
                "$searchMeta": {
                    "facet": {
                        "operator": {"range": {"path": "n_chars", "gte": 50}},
                        "facets": {
                            "langs": {
                                "type": "string",
                                "path": "lang",
                                "numBuckets": 3,
                            },
                            "sizes": {
                                "type": "number",
                                "path": "n_chars",
                                "boundaries": [50, 200, 400],
                                "default": "other",
                            },
                        },
                    }
                }
            }
        ],
    )
    return out.select(
        F.col("count.lowerBound").alias("match_count"),
        F.to_json(F.col("facet.langs.buckets")).alias("lang_buckets"),
        F.to_json(F.col("facet.sizes.buckets")).alias("size_buckets"),
    )


@query(
    "mql_densify_fill",
    """
    WITH base AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    b AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
          FROM base GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
      FROM b
    ),
    j AS (
      SELECT g.event_type, g.hour, base.n
      FROM grid g LEFT JOIN base USING (event_type, hour)
    )
    SELECT event_type, hour,
           last_value(n IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY hour
             ROWS UNBOUNDED PRECEDING) AS n
    FROM j
    """,
)
def mql_densify_fill(spark, sf_dir):
    """$densify (per-partition hourly grid) + $fill locf — the gap-filled
    time series every monitoring/feature pipeline derives. Grid rows are
    generated with the partition keys (distributed); locf is one
    partitioned window."""
    return aggregate(
        _t(spark, sf_dir, "events"),
        [
            {
                "$group": {
                    "_id": {
                        "t": "$event_type",
                        "h": {"$dateTrunc": {"date": "$ts", "unit": "hour"}},
                    },
                    "n": {"$sum": 1},
                }
            },
            {
                "$project": {
                    "event_type": "$_id.t",
                    "hour": "$_id.h",
                    "n": 1,
                    "_id": 0,
                }
            },
            {
                "$densify": {
                    "field": "hour",
                    "partitionByFields": ["event_type"],
                    "range": {"step": 1, "unit": "hour", "bounds": "partition"},
                }
            },
            {
                "$fill": {
                    "partitionBy": "$event_type",
                    "sortBy": {"hour": 1},
                    "output": {"n": {"method": "locf"}},
                }
            },
        ],
    )


@query(
    "mql_graph_lookup",
    """
    WITH RECURSIVE e AS (
      SELECT c_custkey,
             CASE WHEN c_custkey = 0 THEN NULL
                  ELSE c_custkey // 2 END AS parent
      FROM customer
    ),
    chain(origin, cur) AS (
      SELECT e.c_custkey, p.c_custkey
      FROM e JOIN e p ON e.parent = p.c_custkey
      UNION ALL
      SELECT c.origin, p.c_custkey
      FROM chain c JOIN e x ON c.cur = x.c_custkey
                   JOIN e p ON x.parent = p.c_custkey
    )
    SELECT e.c_custkey, CAST(COALESCE(a.cnt, 0) AS BIGINT) AS n_ancestors
    FROM e LEFT JOIN (SELECT origin, COUNT(*) AS cnt FROM chain GROUP BY 1) a
      ON e.c_custkey = a.origin
    """,
)
def mql_graph_lookup(spark, sf_dir):
    """$graphLookup over a synthetic binary-tree hierarchy (parent =
    custkey/2): per-customer ancestor count, oracle = recursive CTE.
    O(log n) iterative joins with visited-set cycle safety."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        # custkey 0 is the root: 0 // 2 = 0 would self-loop the hierarchy
        # (the engine's visited set terminates on cycles; the recursive-CTE
        # oracle must never see one)
        F.when(F.col("c_custkey") == 0, F.lit(None))
        .otherwise(F.floor(F.col("c_custkey") / 2))
        .cast("long")
        .alias("parent"),
    )
    out = aggregate(
        cust,
        [
            {
                "$graphLookup": {
                    "from": "hier",
                    "startWith": "$parent",
                    "connectFromField": "parent",
                    "connectToField": "c_custkey",
                    "as": "chain",
                }
            }
        ],
        collections={"hier": cust},
    )
    return out.select(
        "c_custkey", F.size("chain").cast("long").alias("n_ancestors")
    )


@query(
    "mql_search_fuzzy",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    stats AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN len(list_filter(t, w -> levenshtein(w, 'joinn') <= 1)) > 0
                 THEN 1 ELSE 0 END) AS df1,
             SUM(CASE WHEN len(list_filter(t, w -> levenshtein(w, 'scann') <= 1)) > 0
                 THEN 1 ELSE 0 END) AS df2
      FROM toks
    )
    SELECT doc_id,
           ROUND(len(list_filter(t, w -> levenshtein(w, 'joinn') <= 1))
                   * ln(n * 1.0 / df1)
               + len(list_filter(t, w -> levenshtein(w, 'scann') <= 1))
                   * ln(n * 1.0 / df2), 4) AS score
    FROM toks, stats
    WHERE len(list_filter(t, w -> levenshtein(w, 'joinn') <= 1)) > 0
       OR len(list_filter(t, w -> levenshtein(w, 'scann') <= 1)) > 0
    """,
)
def mql_search_fuzzy(spark, sf_dir):
    """$search text with fuzzy matching: the misspelled query terms
    ('joinn', 'scann') match nothing exactly — every hit comes through the
    edit-distance predicate, and document frequencies are computed under
    that same predicate. DuckDB's levenshtein() reproduces the scoring
    exactly, so the fuzzy path is hash-oracle-graded, not just pytest."""
    return aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {
                "$search": {
                    "text": {
                        "query": "joinn scann",
                        "path": "text",
                        "fuzzy": {"maxEdits": 1},
                    }
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "doc_id": 1,
                    "score": {"$round": [{"$meta": "searchScore"}, 4]},
                }
            },
        ],
    )


@query(
    "mql_search_near",
    """
    SELECT o_orderkey,
           ROUND(50000.0 / (50000.0 + ABS(o_totalprice - 150000.0)), 4)
             AS score
    FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey % 20 = 0
    """,
)
def mql_search_near(spark, sf_dir):
    """$search near: hyperbolic pivot-decay scoring over a numeric path —
    closed-form, so the score column is exactly SQL-reproducible."""
    return aggregate(
        _t(spark, sf_dir, "orders"),
        [
            {"$match": {"o_orderkey": {"$mod": [20, 0]}}},
            {
                "$search": {
                    "near": {
                        "path": "o_totalprice",
                        "origin": 150000.0,
                        "pivot": 50000.0,
                    }
                }
            },
            {
                "$project": {
                    "_id": 0,
                    "o_orderkey": 1,
                    "score": {"$round": [{"$meta": "searchScore"}, 4]},
                }
            },
        ],
    )


@query(
    "mql_search_autocomplete",
    """
    SELECT doc_id FROM documents
    WHERE len(list_filter(string_split(text, ' '), w -> w LIKE 'quer%')) > 0
    """,
)
def mql_search_autocomplete(spark, sf_dir):
    """$search autocomplete: token-prefix matching, reproduced by a SQL
    LIKE over the same tokenization."""
    return aggregate(
        _t(spark, sf_dir, "documents"),
        [
            {"$search": {"autocomplete": {"query": "quer", "path": "text"}}},
            {"$project": {"_id": 0, "doc_id": 1}},
        ],
    )


@query(
    "mql_lookup_topn",
    """
    SELECT c_custkey, o_orderkey, o_orderdate
    FROM customer, LATERAL (
      SELECT o_orderkey, o_orderdate FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 3
    )
    """,
)
def mql_lookup_topn(spark, sf_dir):
    """Correlated $lookup with a trailing $sort+$limit — MQL's
    top-N-per-row idiom ("latest 3 orders per customer"). The reference
    forwards this pipeline verbatim to mongod (reference api.py:252),
    which evaluates it once PER OUTER DOCUMENT; the translator peels the
    trailing cardinality run off the equi-join rewrite and replays it
    per outer row as array_sort + slice on the collected match array
    (pipeline.py:_split_cardinality_suffix), so the per-row limit is
    exact — verified here against DuckDB's LATERAL ORDER BY/LIMIT."""
    return aggregate(
        _t(spark, sf_dir, "customer"),
        [
            {
                "$lookup": {
                    "from": "orders",
                    "let": {"ck": "$c_custkey"},
                    "pipeline": [
                        {"$match": {"$expr": {"$eq": ["$o_custkey", "$$ck"]}}},
                        {"$sort": {"o_orderdate": -1, "o_orderkey": -1}},
                        {"$limit": 3},
                    ],
                    "as": "recent",
                }
            },
            {"$unwind": "$recent"},
            {
                "$project": {
                    "_id": 0,
                    "c_custkey": 1,
                    "o_orderkey": "$recent.o_orderkey",
                    "o_orderdate": "$recent.o_orderdate",
                }
            },
        ],
        collections={"orders": _t(spark, sf_dir, "orders")},
    )
