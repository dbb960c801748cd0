#!/usr/bin/env python
"""Measure ensemble_rank's checkpoint footprint: r9 full-width chained
form vs the r10 slim (id, key) form (r9 verdict "what's wrong #2").

Both forms are run over the same wide scored frame (payload text +
three integer signals); after each, the bytes held by the
localCheckpoint blocks (memory + disk) are read from the JVM's RDD
storage info. The r9 form re-checkpoints the ENTIRE running frame once
per ranking pass (N+1 corpus-width copies, each carrying the payload
and every previously appended rank column); the r10 form checkpoints
two-column (id, key) projections and joins the bounded rank columns
back on id.

Run: python examples/ensemble_ckpt_bytes.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import selection
from mongo_arrow_spark.session import get_spark, load_tables


def _rdd_bytes(spark) -> int:
    return sum(
        i.memSize() + i.diskSize()
        for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    )


def _settled_rdd_bytes(spark) -> int:
    """Spark's ContextCleaner frees checkpoint blocks asynchronously
    (after a JVM GC notices the RDD is unreachable) — re-baselining
    right after a Python `del` races it and can subtract blocks that
    vanish mid-measurement (r10 review fix). Nudge both collectors,
    then poll until two consecutive readings agree."""
    import time

    spark.sparkContext._jvm.System.gc()
    prev = _rdd_bytes(spark)
    for _ in range(20):
        time.sleep(0.5)
        cur = _rdd_bytes(spark)
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ensemble-ckpt-bytes")
    docs = load_tables(spark, sf_dir)["documents"]
    scored = docs.select(
        "doc_id",
        "text",
        "lang",
        F.length("text").cast("long").alias("s1"),
        (F.col("doc_id") % 97).cast("long").alias("s2"),
        (F.col("doc_id") % 31).cast("long").alias("s3"),
    )
    cols = ["s1", "s2", "s3"]

    # --- r10 slim form (the shipped ensemble_rank)
    base = _settled_rdd_bytes(spark)
    out_new = selection.ensemble_rank(scored, cols)
    n_new = out_new.count()
    new_bytes = _rdd_bytes(spark) - base

    # --- r9 full-width form, replicated inline for the comparison:
    # chain assign_global_rank over the running (widening) frame
    import gc

    del out_new
    gc.collect()
    base = _settled_rdd_bytes(spark)
    out = scored
    for c in cols:
        out = selection.assign_global_rank(
            out, [F.col(c).desc(), F.col("doc_id").asc()],
            rank_col=f"__rank_{c}",
        )
    wsum = None
    for c in cols:
        term = F.col(f"__rank_{c}") * F.lit(1)
        wsum = term if wsum is None else wsum + term
    out = out.withColumn("__wsum", wsum.cast("long"))
    out = selection.assign_global_rank(
        out, [F.col("__wsum").asc(), F.col("doc_id").asc()],
        rank_col="ens_rank",
    )
    n_old = out.count()
    old_bytes = _rdd_bytes(spark) - base

    assert n_new == n_old
    assert new_bytes > 0 and old_bytes > 0, (new_bytes, old_bytes)
    mb = 1024 * 1024
    print(
        f"rows={n_new} signals={len(cols)}  "
        f"r9 full-width checkpoints: {old_bytes / mb:.1f} MiB  "
        f"r10 slim checkpoints: {new_bytes / mb:.1f} MiB  "
        f"reduction: {old_bytes / max(new_bytes, 1):.1f}x"
    )


if __name__ == "__main__":
    main()
