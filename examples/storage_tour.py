#!/usr/bin/env python
"""The storage tier (r9): dedup-aware layout + versioned releases.

1. **Content-addressed store**: the corpus splits into a payload-free
   manifest and one row per DISTINCT payload, both bucketed on the
   digest — duplication stops costing disk, and reconstruction is a
   zero-exchange bucket join.
2. **Versioned releases**: commit the corpus, re-release it with edits
   (a takedown, a re-crawl, a dedup re-run) as a digest-diff DELTA,
   time-travel back to any release, and audit what changed between two
   releases with the snapshot-diff report.
3. **Gated releases (r10)**: every commit runs a declarative data
   contract (expectations) plus a row-drift band — a release that
   fails its contract or silently lost rows never becomes visible.

Run: python examples/storage_tour.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import expectations as E
from mongo_arrow_spark.operators import layout, versioning
from mongo_arrow_spark.session import get_spark, load_tables


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="storage_tour_")
    spark = get_spark("storage-tour")
    docs = load_tables(spark, sf_dir)["documents"].select(
        "doc_id", "text", "lang"
    )

    # 1. content-addressed store — duplicate payloads stored once
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )  # a corpus with 2x exact duplication
    for t in ("tour_payloads", "tour_manifest"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    stats = layout.write_content_addressed(
        doubled, "tour", ["text", "lang"], path=f"{out}/cas"
    )
    back = layout.read_content_addressed(spark, "tour")
    print(
        f"content-addressed: {stats['n_rows']} rows -> "
        f"{stats['n_payloads']} stored payloads "
        f"(dedup_ratio {stats['dedup_ratio']}); "
        f"reconstruction rows = {back.count()}"
    )

    # 2. versioned releases: v1 full, v2 = takedown + edits (delta only)
    # — every commit behind the same release contract + a ±20 % row band
    contract = [
        E.not_null("doc_id"),
        E.unique("doc_id"),
        E.not_null("text"),
        E.row_count(min_rows=1),
    ]
    vpath = f"{out}/versions"
    m1 = versioning.write_version(docs, vpath, expect=contract)
    v2 = docs.filter(F.col("doc_id") % 97 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat("text", F.lit(" [edited]"))
        ).otherwise(F.col("text")),
    )
    m2 = versioning.write_version(
        v2, vpath, expect=contract, max_row_delta_frac=0.2
    )
    # a contract-violating release (NULL payloads) is refused, store
    # untouched — this is the gate, not a post-hoc report
    try:
        versioning.write_version(
            v2.withColumn("text", F.lit(None).cast("string")),
            vpath,
            expect=contract,
        )
        raise AssertionError("gate should have refused the release")
    except E.ExpectationError as ex:
        print(f"gate refused a bad release: {str(ex)[:72]}…")
    print(
        f"releases: v1 full={m1['n_rows']} rows; "
        f"v2 delta added={m2['added']} removed={m2['removed']} "
        f"(n_rows={m2['n_rows']})"
    )
    t1 = versioning.read_version(spark, vpath, 1).count()
    t2 = versioning.read_version(spark, vpath, 2).count()
    print(f"time travel: v1 reads {t1} rows, v2 reads {t2} rows")
    rep = {
        r["status"]: r["n_docs"]
        for r in versioning.version_diff_report(spark, vpath, 1, 2).collect()
    }
    print(f"diff report v1->v2: {rep}")
    print(f"artifacts under {out}")


if __name__ == "__main__":
    main()
