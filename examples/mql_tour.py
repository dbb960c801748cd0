#!/usr/bin/env python
"""Tour of the MQL surface the engine executes natively — the stages the
reference can only reach through a MongoDB/Atlas server, here compiled to
Catalyst plans (inspect any of them with ``coll.explain``).

Run: python examples/mql_tour.py [sf_dir]
"""

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mongo_arrow_spark as mas
from mongo_arrow_spark.session import get_spark, load_tables
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("mql-tour")
    t = load_tables(spark, sf_dir)

    docs = mas.Collection(t["documents"], "documents", collections=t)
    print("== $search (Atlas text operator, tf·idf ranking, $meta score)")
    print(
        docs.aggregate_pandas_all(
            [
                {"$search": {"compound": {
                    "must": [{"text": {"query": "spark", "path": "text"}}],
                    "should": [{"text": {"query": "window join", "path": "text"}}],
                }}},
                {"$limit": 3},
                {"$project": {"_id": 0, "doc_id": 1,
                              "score": {"$round": [{"$meta": "searchScore"}, 3]}}},
            ]
        )
    )

    emb = mas.Collection(t["embeddings"], "embeddings", collections=t)
    qv = [float(x) for x in t["embeddings"].filter("vec_id = 0").first()["embedding"]]
    print("== $vectorSearch (ENN, Atlas cosine score normalization)")
    print(
        emb.aggregate_pandas_all(
            [
                {"$vectorSearch": {"path": "embedding", "queryVector": qv,
                                   "limit": 3, "numCandidates": 100}},
                {"$project": {"_id": 0, "vec_id": 1,
                              "score": {"$round": [{"$meta": "vectorSearchScore"}, 4]}}},
            ]
        )
    )

    print("== $geoNear + $geoWithin (spherical haversine, no index)")
    cities = mas.Collection(
        spark.createDataFrame(
            [("paris", [2.35, 48.85]), ("london", [-0.13, 51.51]),
             ("berlin", [13.40, 52.52]), ("nyc", [-74.0, 40.71])],
            ["city", "location"],
        ),
        "cities",
    )
    print(
        cities.aggregate_pandas_all(
            [
                {"$geoNear": {"near": [2.35, 48.85], "key": "location",
                              "distanceField": "km",
                              "distanceMultiplier": 0.001}},
                {"$project": {"_id": 0, "city": 1, "km": {"$round": ["$km", 0]}}},
            ]
        )
    )

    print("== $setWindowFields calculus ($derivative / $integral / $locf)")
    ev = mas.Collection(t["events"], "events", collections=t)
    print(
        ev.aggregate_pandas_all(
            [
                {"$match": {"user_id": {"$lt": 2}}},
                {"$setWindowFields": {
                    "partitionBy": "$user_id", "sortBy": {"ts": 1},
                    "output": {
                        "rate": {"$derivative": {"input": "$value", "unit": "hour"},
                                  "window": {"documents": [-1, "current"]}},
                        "total": {"$integral": {"input": "$value", "unit": "hour"},
                                   "window": {"documents": ["unbounded", "current"]}},
                    }}},
                {"$limit": 4},
                {"$project": {"_id": 0, "user_id": 1,
                              "rate": {"$round": ["$rate", 2]},
                              "total": {"$round": ["$total", 2]}}},
            ]
        )
    )

    print("== $function / $accumulator with Python callables")
    orders = mas.Collection(t["orders"], "orders", collections=t)
    print(
        orders.aggregate_pandas_all(
            [
                {"$group": {"_id": "$o_orderstatus",
                            "geo_mean_price": {"$accumulator": {
                                "init": lambda: (0.0, 0),
                                "accumulate": lambda s, v: (s[0] + math.log(v), s[1] + 1),
                                "finalize": lambda s: round(math.exp(s[0] / s[1]), 2),
                                "input": "$o_totalprice",
                                "lang": "python", "returnType": "double"}}}},
                {"$sort": {"_id": 1}},
            ]
        )
    )

    print("== $jsonSchema validator-as-filter + projection $slice")
    cust = mas.Collection(t["customer"], "customer")
    print(
        cust.find_pandas_all(
            {"$jsonSchema": {
                "required": ["c_name"],
                "properties": {"c_acctbal": {"minimum": 8000},
                                "c_mktsegment": {"pattern": "^B"}}}},
            projection={"c_custkey": 1, "c_acctbal": 1}, limit=3,
        )
    )

    print("== $rankFusion: hybrid lexical + vector search (RRF)")
    emb = t["embeddings"].withColumnRenamed("vec_id", "_id")
    base = t["documents"].withColumnRenamed("doc_id", "_id").join(emb, "_id")
    qv = [float(x) for x in
          t["embeddings"].filter(F.col("vec_id") == 3).first()["embedding"]]
    hybrid = mas.Collection(base, "docs")
    print(
        hybrid.aggregate_pandas_all(
            [
                {"$rankFusion": {"input": {"pipelines": {
                    "lexical": [
                        {"$search": {"text": {"query": "spark window",
                                               "path": "text"}}},
                        {"$limit": 10},
                    ],
                    "semantic": [
                        {"$vectorSearch": {"path": "embedding",
                                            "queryVector": qv,
                                            "limit": 10, "exact": True}},
                    ],
                }}, "combination": {"weights": {"semantic": 1.5}}}},
                {"$project": {"_id": 1,
                              "score": {"$round": [{"$meta": "score"}, 5]}}},
                {"$limit": 5},
            ]
        )
    )

    print("== $dateTrunc binSize: 6-hour rollup bins")
    ev2 = mas.Collection(t["events"], "events")
    print(
        ev2.aggregate_pandas_all(
            [
                {"$group": {"_id": {"$dateTrunc": {"date": "$ts",
                                                    "unit": "hour",
                                                    "binSize": 6}},
                            "n": {"$sum": 1}}},
                {"$sort": {"_id": 1}}, {"$limit": 4},
            ]
        )
    )


if __name__ == "__main__":
    main()

