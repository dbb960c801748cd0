#!/usr/bin/env python
"""sf1 scaling sweep: replicate sf0.1 ×10 (≈6 M lineitem / 50 k docs),
run the driver-graded 50-query window once at both scales, print the
wall-clock table for SCALE.md.

Replication methodology (same as the round-4 8-family sweep, SCALE.md
"Measured scaling"): each table unions 10 copies with replica-offset
keys (FK-consistent: orders/lineitem/customer/part/supplier offsets
match), text payloads perturbed per replica (a trailing " r<i>" token)
so dedup families face realistic near-dup structure instead of
degenerate 10-way exact duplicates, embeddings perturbed by a tiny
id-derived delta for the same reason. region/nation stay single-copy
(real dimension tables don't scale with the fact tables).

Usage:
    python examples/scale_sweep.py [--build-only] [--queries q1,q2]
Writes the sf1 corpus to /tmp/mas_sf1 (idempotent; delete to rebuild).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/mas_sf1"
OFF = 10_000_000  # key offset per replica; far above any sf0.1 key

#: key columns offset per replica, per table (FK-consistent)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["region", "nation"]


def build(spark) -> str:
    from mongo_arrow_spark.session import read_documents_parquet

    if os.path.exists(os.path.join(SF1, "_READY")):
        return SF1
    os.makedirs(SF1, exist_ok=True)
    for name in SINGLE_COPY:
        read_documents_parquet(spark, f"{SF01}/{name}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SF1}/{name}.parquet")
    for name, keys in KEY_COLS.items():
        base = read_documents_parquet(spark, f"{SF01}/{name}.parquet")
        # one distributed union of 10 key-offset replicas
        rep = None
        for r in range(10):
            c = base
            for k in keys:
                c = c.withColumn(k, F.col(k) + F.lit(r * OFF))
            if name == "documents":
                # perturb payload so replicas are near-dups, not exact
                c = c.withColumn(
                    "text",
                    F.when(F.lit(r) == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(f" r{r}"))
                    ),
                )
            if name == "embeddings":
                delta = (F.col("vec_id") % 97).cast("double") * 1e-4
                c = c.withColumn(
                    "embedding",
                    F.transform("embedding", lambda x: (x + delta).cast("float")),
                )
            rep = c if rep is None else rep.unionAll(c)
        rep.write.mode("overwrite").parquet(f"{SF1}/{name}.parquet")
    open(os.path.join(SF1, "_READY"), "w").close()
    return SF1


def main() -> None:
    from mongo_arrow_spark.battery import ORACLES, QUERIES
    from mongo_arrow_spark.session import get_spark

    spark = get_spark("scale_sweep")
    spark.range(1).count()
    build(spark)
    if "--build-only" in sys.argv:
        return
    names = [n for n in QUERIES if n in ORACLES][:50]
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    rows = []
    for name in names:
        fn = QUERIES[name]
        walls = {}
        for label, sf_dir in (("sf0.1", SF01), ("sf1", SF1)):
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                walls[label] = time.perf_counter() - t0
            except Exception as exc:  # keep sweeping; report the failure
                walls[label] = float("nan")
                print(f"# {name} @ {label}: {type(exc).__name__}: {exc}",
                      file=sys.stderr)
        import math

        exp = (
            math.log10(walls["sf1"] / walls["sf0.1"])
            if walls["sf0.1"] > 0 and not any(map(math.isnan, walls.values()))
            else float("nan")
        )
        rows.append((name, walls["sf0.1"], walls["sf1"], exp))
        print(f"{name}\t{walls['sf0.1']:.2f}\t{walls['sf1']:.2f}\t{exp:.2f}",
              flush=True)
    print("\n| query | sf0.1 | sf1 (10×) | exp |")
    print("|---|---|---|---|")
    for name, a, b, e in sorted(rows, key=lambda r: -r[3]):
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {e:.2f} |")


if __name__ == "__main__":
    main()
