#!/usr/bin/env python
"""Walkthrough of the engine surface on the bundled corpus.

Run: python examples/quickstart.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mongo_arrow_spark as mas
from mongo_arrow_spark.operators import dedup, similarity, text
from mongo_arrow_spark.operators.timeseries import asof_join
from mongo_arrow_spark.session import get_spark, load_tables
from mongo_arrow_spark.sources import register


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("quickstart")
    tables = load_tables(spark, sf_dir)
    register(spark)

    print("== reference-style find (filter + projection + sort + limit)")
    coll = mas.Collection(tables["orders"], "orders", collections=tables)
    print(
        coll.find_pandas_all(
            {"o_totalprice": {"$gt": 300000}},
            projection={"o_orderkey": 1, "o_totalprice": 1},
            sort=[("o_totalprice", -1)],
            limit=3,
        )
    )

    print("== MQL aggregation pipeline on Catalyst")
    print(
        coll.aggregate_pandas_all(
            [
                {"$match": {"o_orderstatus": "F"}},
                {
                    "$group": {
                        "_id": "$o_orderpriority",
                        "n": {"$sum": 1},
                        "avg_price": {"$avg": "$o_totalprice"},
                    }
                },
                {"$sort": {"_id": 1}},
            ]
        )
    )

    print("== $lookup + $setWindowFields")
    top = coll.aggregate(
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$o_custkey",
                    "sortBy": {"o_totalprice": -1},
                    "output": {"rnk": {"$rank": {}}},
                }
            },
            {"$match": {"rnk": 1}},
            {
                "$lookup": {
                    "from": "customer",
                    "localField": "o_custkey",
                    "foreignField": "c_custkey",
                    "as": "cust",
                }
            },
            {"$limit": 3},
        ]
    )
    top.show(3, truncate=60)

    print("== near-dup detection (exact Jaccard over shingle index)")
    dedup.ngram_jaccard_pairs(tables["documents"], threshold=0.3).show(5)

    print("== similarity search (brute-force cosine top-5)")
    qvec = tables["embeddings"].first()["embedding"]
    similarity.cosine_topk(tables["embeddings"], list(qvec), k=5).show()

    print("== text quality + TF-IDF search")
    text.quality_metrics(tables["documents"]).select(
        "doc_id", "n_tokens", "stopword_ratio"
    ).show(3)
    text.tfidf_search(tables["documents"], ["spark", "shuffle"], k=3).show()

    print("== as-of join (purchases -> latest prior click)")
    ev = tables["events"]
    purchases = ev.filter(ev.event_type == "purchase")
    clicks = ev.filter(ev.event_type == "click").select("user_id", "ts", "value")
    asof_join(purchases, clicks, by="user_id", right_cols=["value"]).select(
        "event_id", "user_id", "ts", "value_asof"
    ).show(3)


if __name__ == "__main__":
    main()
