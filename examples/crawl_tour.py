#!/usr/bin/env python
"""The crawl path end-to-end (r10): a Common-Crawl-shaped archive in,
trainer-ready text out.

1. **Archive**: HTML pages land as WARC response records
   (gzip-membered ``.warc.gz``, one archive per partition).
2. **Ingest**: ``spark.read.format("warc")`` — typed records, HTTP
   envelopes stripped, Arrow batches.
3. **Extract**: ``text.html_to_text`` — JVM-side regexp chain (no
   UDF), head/script/style/comment/tag removal + entity unescape.
4. **URL tier** (r11): canonicalize + URL-dedup + per-domain cap —
   the refetched shard is dropped on its URL alone, before any
   payload comparison (the CCNet/C4/RefinedWeb order).
5. **Screen**: language-ID + quality metrics + exact dedup, the
   standard front gate before anything expensive runs.
6. **Contract**: the extracted corpus must pass its expectations
   before it ships as a versioned release.

Run: python examples/crawl_tour.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import (
    dedup,
    expectations as E,
    text,
    url,
    versioning,
)
from mongo_arrow_spark.session import get_spark, load_tables
from mongo_arrow_spark.sources import register_warc, write_warc


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="crawl_tour_")
    spark = get_spark("crawl-tour")
    docs = load_tables(spark, sf_dir)["documents"]

    # 1. fabricate the crawl: each doc becomes an HTML page in a WARC
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>t</title></head><body><p>"),
            F.col("text"),
            F.lit("</p><!-- chrome --></body></html>"),
        ).alias("text"),
    )
    # a duplicated shard, as crawls always have — refetched under a
    # MESSY variant of the same URL (tracking params, default port,
    # uppercase host), so URL-dedup alone can catch it
    pages = pages.withColumn(
        "url",
        F.concat(
            F.lit("https://www.example.org/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    pages = pages.unionByName(
        pages.limit(50).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            F.concat(
                F.lit("HTTPS://WWW.Example.ORG:443/doc/"),
                F.col("doc_id").cast("string"),
                F.lit("/?utm_source=refetch"),
            ).alias("url"),
        )
    )
    archive = f"{out}/archive"
    # index=True: .cdxj sidecars make splits offset-exact (and phantom-
    # proof) and give every record an O(1) provenance pointer
    write_warc(pages.repartition(4), archive, uri_col="url", index=True)
    n_archives = len(
        [f for f in os.listdir(archive) if f.endswith(".warc.gz")]
    )

    # 2-3. ingest + extract
    register_warc(spark)
    crawled = (
        spark.read.format("warc")
        .load(archive + "/*.warc.gz")
        .select(
            F.regexp_extract("record_id", r"urn:mas:(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("target_uri").alias("url"),
            text.html_to_text(F.col("payload")).alias("text"),
            "source_file",
            "source_offset",
        )
    )
    print(f"ingested {crawled.count()} pages from {n_archives} archives")

    # provenance: any curated row points straight back at its archive
    # bytes — the training-data audit path
    from mongo_arrow_spark.sources import read_warc_record

    one = crawled.orderBy("doc_id").first()
    fetched = read_warc_record(
        os.path.join(archive, one["source_file"]), one["source_offset"]
    )
    assert fetched["record_id"] == f"<urn:mas:{one['doc_id']}>"
    print(
        f"provenance: doc {one['doc_id']} -> "
        f"{one['source_file']}@{one['source_offset']} fetched OK"
    )

    # 4. URL tier FIRST (the CCNet/C4 order): canonicalize + URL-dedup
    # catches the refetched shard without touching any payload, then a
    # per-domain cap bounds source dominance
    url_kept = url.cap_per_domain(
        url.url_dedup(crawled, "url"), "url", n=1_000_000
    )
    print(
        "after URL dedup + domain cap:", url_kept.count(),
        "domains:", url_kept.select(
            url.registered_domain(url.url_host(F.col("url")))
        ).distinct().count(),
    )

    # 5. screen: lang-id, quality, exact content dedup
    screened = url_kept.withColumn("lang", text.lang_id("text"))
    kept = dedup.exact_dedup(screened, text_col="text")
    print(
        "after exact dedup:", kept.count(),
        "langs:", sorted(
            r["lang"] for r in kept.select("lang").distinct().collect()
        ),
    )

    # 6. contract-gated release of the extracted corpus
    contract = [
        E.not_null("doc_id"),
        E.unique("doc_id"),
        E.not_null("text"),
        E.satisfies("non_empty_text", "length(text) > 0"),
        E.row_count(min_rows=1),
    ]
    meta = versioning.write_version(
        kept.select("doc_id", "text"), f"{out}/release", expect=contract
    )
    print(
        f"release v{meta['version']} committed: {meta['n_rows']} rows "
        f"(contract recorded: "
        f"{len(versioning.contract_report(f'{out}/release', 1))} rules)"
    )
    print(f"artifacts under {out}")


if __name__ == "__main__":
    main()
