#!/usr/bin/env python
"""Version-aware decontamination (r10): pin the holdout at a release.

The reproducibility story the versioning tier exists for: eval/holdout
sets are themselves released over time (a benchmark adds problems, fixes
leaks, retires items). Decontaminating "against the holdout" is not a
well-defined operation unless it names a VERSION — and with the holdout
committed through `operators.versioning`, re-running the gate against
`read_version(v)` reproduces the exact kept-set months later, even
after the holdout has moved on to v+1.

Flow:
  1. commit holdout v1; commit holdout v2 (v1 plus newly added items)
  2. hard gate:  decontaminate(train, read_version(holdout, v))
  3. soft score: ngram_novelty(train, read_version(holdout, v))
  4. prove reproducibility: re-reading v1 after v2 exists yields the
     byte-identical kept-set and scores (asserted, not just printed)

Run: python examples/version_decontam.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import dedup, text, versioning
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="version_decontam_")
    spark = get_spark("version-decontam")
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text", "lang"
    )

    # training corpus vs a versioned holdout: v1 = every 13th doc;
    # v2 adds every 17th (the benchmark's next release)
    train = docs.filter((F.col("doc_id") % 13 != 0) & (F.col("doc_id") % 17 != 0))
    hold_v1 = docs.filter(F.col("doc_id") % 13 == 0)
    hold_v2 = docs.filter(
        (F.col("doc_id") % 13 == 0) | (F.col("doc_id") % 17 == 0)
    )
    vpath = f"{out}/holdout"
    m1 = versioning.write_version(hold_v1, vpath)
    m2 = versioning.write_version(hold_v2, vpath)
    print(
        f"holdout releases: v1 {m1['n_rows']} docs; "
        f"v2 +{m2['added']} docs ({m2['n_rows']} total)"
    )

    def gate(version: int):
        holdout = versioning.read_version(spark, vpath, version)
        # no max_df cap here: the monotonicity asserted below ("a larger
        # holdout gates at least as strictly") is only a theorem without
        # the posting-frequency cap — growing the holdout can push a
        # shared gram OVER a cap and weaken the gate (r10 review fix).
        # At real scale pass max_df and drop the monotonicity
        # expectation; it trades exactness for the bounded posting join.
        kept = dedup.decontaminate(train, holdout, n=3, threshold=0.5)
        nov = text.ngram_novelty(train, holdout, n=3)
        return kept, nov

    kept1, nov1 = gate(1)
    n_train = train.count()
    n_kept1 = kept1.count()
    low1 = nov1.filter(F.col("novelty") < 0.5).count()
    print(
        f"vs holdout v1: kept {n_kept1}/{n_train} training docs; "
        f"{low1} docs score novelty < 0.5"
    )

    kept2, nov2 = gate(2)
    n_kept2 = kept2.count()
    low2 = nov2.filter(F.col("novelty") < 0.5).count()
    print(
        f"vs holdout v2: kept {n_kept2}/{n_train} training docs; "
        f"{low2} docs score novelty < 0.5 "
        f"(v2 added items -> gates at least as strict: "
        f"{n_kept2} <= {n_kept1}, {low2} >= {low1})"
    )
    assert n_kept2 <= n_kept1 and low2 >= low1

    # reproducibility: v1's gate replays bit-identically AFTER v2 exists
    kept1b, nov1b = gate(1)
    kept_ids = sorted(r["doc_id"] for r in kept1.select("doc_id").collect())
    kept_ids_b = sorted(r["doc_id"] for r in kept1b.select("doc_id").collect())
    assert kept_ids == kept_ids_b, "kept-set not reproducible at pinned v1"
    s1 = sorted(map(tuple, nov1.collect()))
    s1b = sorted(map(tuple, nov1b.collect()))
    assert s1 == s1b, "novelty scores not reproducible at pinned v1"
    print(
        f"reproducibility: v1 gate replayed after v2 exists -> "
        f"identical kept-set ({len(kept_ids)} ids) and identical "
        f"novelty scores ({len(s1)} rows)"
    )
    print(f"artifacts under {out}")


if __name__ == "__main__":
    main()
