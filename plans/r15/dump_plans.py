#!/usr/bin/env python
"""Dump .explain('formatted') for the r14-touched queries.

Usage: python dump_plans.py <suffix> <outdir> [query ...]

Runs from whatever repo root is on sys.path[0] (so a worktree at the
pre-optimization commit produces the *_before.txt plans and HEAD the
*_after.txt ones). Plans are captured at sf0.1 — the driver's bench
scale — with the same session the bench uses.
"""
import io
import os
import sys
from contextlib import redirect_stdout

suffix, outdir = sys.argv[1], sys.argv[2]
names = sys.argv[3:]

sys.path.insert(0, os.getcwd())  # run with cwd = the repo/worktree to plan

from mongo_arrow_spark.battery import QUERIES  # noqa: E402
from mongo_arrow_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("plan-dump")

for name in names:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(outdir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")
