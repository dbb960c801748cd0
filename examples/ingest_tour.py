#!/usr/bin/env python
"""Tour of the ingest/export surface: every dump shape a MongoDB shop
actually has — mongodump ``.bson`` (plain and ``--gzip``), mongoexport
Extended-JSON ``.jsonl``, schemaless typed inference, declared schemas,
and the three writer modes (jsonl, extendedJson, bson) — round-tripped
through the documents source.

Run: python examples/ingest_tour.py
"""

import datetime
import decimal
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongo_arrow_spark.api import write
from mongo_arrow_spark.bson_codec import encode_document
from mongo_arrow_spark.bson_values import ObjectId, Decimal128
from mongo_arrow_spark.session import get_spark
from mongo_arrow_spark.sources import register


def show(title, df, n=3):
    print(f"\n== {title}")
    df.printSchema()
    for r in df.limit(n).collect():
        print("  ", r.asDict())


def main() -> None:
    spark = get_spark("ingest-tour", shuffle_partitions=4)
    register(spark)
    root = tempfile.mkdtemp(prefix="ingest_tour_")

    docs = [
        {
            "_id": ObjectId("%024x" % (i + 1)),
            "name": f"item-{i}",
            "price": Decimal128(decimal.Decimal("19.99") + i),
            "when": datetime.datetime(2024, 6, 1 + i, 12, 0, 0),
            "qty": 10 + i,
        }
        for i in range(3)
    ]

    # --- mongodump --gzip shape: length-prefixed BSON, gzipped
    dump = os.path.join(root, "dump.bson.gz")
    with gzip.open(dump, "wb") as fh:
        for d in docs:
            fh.write(encode_document(d))
    df = spark.read.format("documents").load(dump)
    show("mongodump --gzip (.bson.gz), schemaless typed inference", df)

    # --- mongoexport shape: Extended JSON v2 .jsonl
    export = os.path.join(root, "export.jsonl")
    with open(export, "w") as fh:
        for i, d in enumerate(docs):
            fh.write(json.dumps({
                "_id": {"$oid": str(d["_id"])},
                "name": d["name"],
                "price": {"$numberDecimal": str(d["price"].to_decimal())},
                "when": {"$date": d["when"].isoformat() + "Z"},
                "qty": {"$numberLong": str(d["qty"])},
            }) + "\n")
    ext = spark.read.format("documents").load(export)
    show("mongoexport Extended JSON v2 (.jsonl) — same typed columns", ext)

    # --- filters push into the scan (pre-Arrow, per the plan contract)
    filtered = ext.filter("qty >= 11").select("name", "qty")
    show("pushed filter over the export", filtered)

    # --- writer modes round-trip
    out_ext = os.path.join(root, "out_extjson")
    write(ext.drop("_id", "price"), out_ext, format="documents",
          spark=spark, extendedJson="true")
    back = spark.read.format("documents").load(out_ext)
    show("extendedJson writer round-trip (timestamps stay typed)", back)

    out_bson = os.path.join(root, "out_bson")
    write(ext.drop("_id", "price"), out_bson, format="documents",
          spark=spark, fileFormat="bson")
    show("bson writer round-trip (mongodump-format output)",
         spark.read.format("documents").load(out_bson))

    out_gz = os.path.join(root, "out_gz")
    write(ext.drop("_id", "price", "when"), out_gz, format="documents",
          spark=spark, compression="gzip")
    print("\n== gzip writer part files:",
          sorted(p for p in os.listdir(out_gz) if p.startswith("part-")))
    print("rows back:",
          spark.read.format("documents").load(out_gz).count())


if __name__ == "__main__":
    main()
