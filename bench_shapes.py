#!/usr/bin/env python
"""Reference-parity benchmark shapes (mongo-arrow benchmarks/benchmarks.py):
ReadSmall / ReadLarge / ReadArray / ReadDocument / ReadExtension and the
insert (write) equivalents at N_DOCS=20000 — measuring the engine's
materialization paths (toArrow / toPandas / numpy dict) the way the
reference's asv suite measures find_*_all conversion.

Prints one JSON line: {"shapes": {name: {path: sec}}, "n_docs": 20000}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = 20_000
LARGE = 20  # reference LARGE_DOC_SIZE / EMBEDDED_OBJECT_SIZE (benchmarks.py:41-44)


def build_frames(spark):
    from pyspark.sql import functions as F

    base = spark.range(N_DOCS).withColumnRenamed("id", "x")
    small = base.withColumn("y", F.col("x").cast("double") * 1.5)
    large = base.select(
        *[(F.col("x") * F.lit(i)).cast("double").alias(f"a{i}") for i in range(LARGE)]
    )
    array = small.withColumn(
        "emb",
        F.transform(
            F.sequence(F.lit(0), F.lit(LARGE - 1)),
            lambda i: i.cast("double") + F.col("x"),
        ),
    )
    document = small.withColumn(
        "emb",
        F.struct(
            *[
                (F.col("x") + F.lit(i)).cast("double").alias(f"a{i}")
                for i in range(LARGE)
            ]
        ),
    )
    extension = base.select(
        F.col("x").cast("decimal(38,6)").alias("x"),
        F.encode(F.col("x").cast("string"), "UTF-8").alias("y"),
    )
    return {
        "read_small": small,
        "read_large": large,
        "read_array": array,
        "read_document": document,
        "read_extension": extension,
    }


def main() -> None:
    from mongo_arrow_spark.session import get_spark

    spark = get_spark("bench_shapes")
    out: dict = {}
    tmp = "/tmp/mongo_arrow_spark_bench_shapes"
    for name, df in build_frames(spark).items():
        df = df.cache()
        df.count()
        timings = {}
        t0 = time.perf_counter()
        table = df.toArrow()
        timings["to_arrow"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        pdf = df.toPandas()
        timings["to_pandas"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        numpy_dict = {
            n: table[n].to_numpy(zero_copy_only=False) for n in table.column_names
        }
        timings["to_numpy"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(os.path.join(tmp, name))
        timings["write_parquet"] = round(time.perf_counter() - t0, 3)
        del table, pdf, numpy_dict
        df.unpersist()
        out[name] = timings
    print(json.dumps({"shapes": out, "n_docs": N_DOCS}))


if __name__ == "__main__":
    main()
