#!/usr/bin/env python
"""Tour of the native Atlas-$search surface: every operator the engine
implements, on a small inline corpus — text (exact + fuzzy), phrase,
autocomplete, near, range/equals/exists/wildcard/in/regex, queryString,
moreLikeThis, embeddedDocument, compound, BM25 scoring, $searchMeta.

Run: python examples/search_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_arrow_spark.mql import apply_pipeline
from mongo_arrow_spark.session import get_spark


def show(title, df, n=5):
    print(f"\n== {title}")
    for r in df.limit(n).collect():
        print("  ", r.asDict())


def main() -> None:
    spark = get_spark("search-tour", shuffle_partitions=4)
    docs = spark.createDataFrame(
        [
            (1, "distributed query engines process columnar data", 120.0,
             [{"sku": "A1", "qty": 5}]),
            (2, "a quick tour of quoted query plans", 80.0,
             [{"sku": "B2", "qty": 1}]),
            (3, "gardening tips for quiet spring mornings", 200.0,
             [{"sku": "A1", "qty": 9}]),
            (4, "columnar engines and the art of the scan", 150.0,
             [{"sku": "C3", "qty": 4}]),
        ],
        "id int, body string, price double, items array<struct<sku:string,qty:int>>",
    )

    def search(spec, project=("id",)):
        pipe = [{"$search": spec}, {"$limit": 10},
                {"$project": {p: 1 for p in project} | {"_id": 0}}]
        return apply_pipeline(docs, pipe)

    show("text (exact)", search({"text": {"query": "columnar", "path": "body"}}))
    show("text + fuzzy (maxEdits 1: 'colunar')",
         search({"text": {"query": "colunar", "path": "body",
                          "fuzzy": {"maxEdits": 1}}}))
    show("text + BM25 scoring",
         apply_pipeline(docs, [
             {"$search": {"text": {"query": "query engines", "path": "body"},
                          "scoring": "bm25"}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1,
                           "score": {"$round": [{"$meta": "searchScore"}, 3]}}},
         ]))
    show("phrase", search({"phrase": {"query": "query engines", "path": "body"}}))
    show("autocomplete 'qu'", search({"autocomplete": {"query": "qu", "path": "body"}}))
    show("near price 100 (pivot 50)",
         apply_pipeline(docs, [
             {"$search": {"near": {"path": "price", "origin": 100, "pivot": 50}}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1,
                           "score": {"$round": [{"$meta": "searchScore"}, 3]}}},
         ]))
    show("queryString", search({"queryString": {
        "query": "body:columnar AND NOT body:gardening", "defaultPath": "body"}}))
    show("moreLikeThis", search({"moreLikeThis": {
        "like": {"body": "columnar query data"}, "path": "body"}}))
    show("embeddedDocument (sku A1 AND qty>=5 on the SAME item)",
         search({"embeddedDocument": {
             "path": "items",
             "operator": {"compound": {"must": [
                 {"equals": {"path": "items.sku", "value": "A1"}},
                 {"range": {"path": "items.qty", "gte": 5}},
             ]}}}}))
    show("compound (must text, mustNot wildcard)",
         search({"compound": {
             "must": [{"text": {"query": "engines", "path": "body"}}],
             "mustNot": [{"wildcard": {"path": "body", "query": "*garden*"}}],
         }}))
    show("$searchMeta count",
         apply_pipeline(docs, [{"$searchMeta": {
             "text": {"query": "columnar", "path": "body"}}}]))

    # ---- round-5 surface: options + geo
    show("sort by stored field (price desc) instead of score",
         apply_pipeline(docs, [
             {"$search": {"exists": {"path": "body"},
                          "sort": {"price": -1}}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1, "price": 1}},
         ]))
    show("count option + $$SEARCH_META in a later stage",
         apply_pipeline(docs, [
             {"$search": {"text": {"query": "engines", "path": "body"},
                          "count": {"type": "total"}}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1,
                           "total": "$$SEARCH_META.count.total"}},
         ]))
    show("highlight passages",
         apply_pipeline(docs, [
             {"$search": {"text": {"query": "columnar", "path": "body"},
                          "highlight": {"path": "body"}}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1,
                           "hl": {"$meta": "searchHighlights"}}},
         ]))
    geo = spark.createDataFrame(
        [(1, "bistro near the louvre", [2.34, 48.86]),
         (2, "pub by the thames", [-0.12, 51.50]),
         (3, "biergarten am spree", [13.41, 52.52])],
        "id int, body string, location array<double>",
    )
    show("compound text + geoWithin circle (400 km around Paris)",
         apply_pipeline(geo, [
             {"$search": {"compound": {
                 "must": [{"exists": {"path": "body"}}],
                 "filter": [{"geoWithin": {
                     "path": "location",
                     "circle": {"center": {"type": "Point",
                                           "coordinates": [2.35, 48.85]},
                                "radius": 400_000}}}],
             }}},
             {"$limit": 10},
             {"$project": {"_id": 0, "id": 1, "body": 1}},
         ]))


if __name__ == "__main__":
    main()
