#!/usr/bin/env python
"""Experiment (r15, guide §1): response of the link-tier / regex-heavy
keys to the _spread fan-out target. The r14 `_spread` always fans to
defaultParallelism (32 here); the driver measured q_extract_links 0.37x
and q_link_graph 0.42x, and their 8-core runs were ~3x faster. This
sweeps the round-robin target to find the actual response curve before
choosing the work-aware policy."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from mongo_arrow_spark.session import get_spark  # noqa: E402

spark = get_spark("exp_spread")
spark.range(1).count()

import mongo_arrow_spark.operators.similarity as sim  # noqa: E402
from mongo_arrow_spark.battery import QUERIES  # noqa: E402


def make_spread(target):
    if target is None:
        return lambda df: df

    def f(df):
        if df.rdd.getNumPartitions() < target:
            return df.repartition(target)
        return df

    return f


KEYS = [
    "q_extract_links",
    "q_link_graph",
    "q_extract_meta",
    "q_extract_links_base",
    "q_crawl_frontier",
    "q_canonical_dedup",
    "lang_id_trigram",
]

results = {}
for target in [None, 2, 4, 8, 16, 32]:
    sim._spread = make_spread(target)
    for k in KEYS:
        fn = QUERIES[k]
        spark.sparkContext.setJobDescription(f"{k}@spread={target}")
        fn(spark, SF).collect()  # warm-up
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).collect()
            best = min(best, time.perf_counter() - t0)
        results.setdefault(k, {})[str(target)] = round(best, 3)
        print(f"{k} target={target}: {best:.3f}", flush=True)

import json  # noqa: E402

print(json.dumps(results, indent=1))
