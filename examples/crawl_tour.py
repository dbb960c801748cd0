#!/usr/bin/env python
"""The crawl path end-to-end (r10): a Common-Crawl-shaped archive in,
trainer-ready text out.

1. **Archive**: HTML pages land as WARC response records
   (gzip-membered ``.warc.gz``, one archive per partition).
2. **Ingest**: ``spark.read.format("warc")`` — typed records, HTTP
   envelopes stripped, Arrow batches.
3. **Transcode + extract** (r12): ``encoding.decode_payload`` sniffs
   the charset (HTTP header → <meta> probe → heuristic) and
   transcodes legacy-encoded pages to UTF-8, then ``text.html_to_text``
   — a JVM-side regexp chain (no UDF) — strips the markup.
3.5. **Link graph** (r13): ``sniff_mime`` types payloads from magic
   bytes (headers lie), ``extract_links`` resolves outlinks,
   ``link_host_edges`` aggregates the host graph, and the
   integer-exact PageRank ranks host authority — the crawl-frontier
   prioritization signal.
4. **URL tier** (r11): canonicalize + URL-dedup + per-domain cap —
   the refetched shard is dropped on its URL alone, before any
   payload comparison (the CCNet/C4/RefinedWeb order).
5. **Screen** (r12): trigram language-ID over ~50 languages
   (broadcast profile join) feeds CCNet per-language perplexity
   terciles; quality metrics + exact dedup complete the front gate.
6. **Contract**: the extracted corpus must pass its expectations
   before it ships as a versioned release.
7. **WET export** (r12): the curated text ships as ``.warc.wet.gz``
   conversion records carrying WARC-Refers-To + source-offset
   provenance — interchange with pipelines that consume ``.wet``.

Run: python examples/crawl_tour.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import (
    dedup,
    encoding,
    expectations as E,
    graph,
    langid,
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
            # outlinks (r13): one in-site relative link and one
            # cross-site link per page — the raw material for the
            # link-graph stage below
            F.lit('</p><a href="/doc/'),
            ((F.col("doc_id") + 1) % 500).cast("string"),
            F.lit('">next</a><a href="https://partner'),
            (F.col("doc_id") % 3).cast("string"),
            F.lit('.example.net/x">ref</a><!-- chrome --></body></html>'),
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

    # 2-3. ingest + transcode + extract: decode_payload makes legacy-
    # encoded pages (windows-125x/Shift-JIS/GBK/...) safe BEFORE
    # extraction — a UTF-8-assumed cast would mojibake them through
    # lang-ID, quality and dedup
    register_warc(spark)
    raw = spark.read.format("warc").load(archive + "/*.warc.gz")
    crawled = (
        raw
        .select(
            F.regexp_extract("record_id", r"urn:mas:(\d+)", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("target_uri").alias("url"),
            # content-type routed (r12 verdict #6): text/plain records
            # pass through verbatim; HTML extracts as before
            text.extract_text(
                encoding.decode_payload("payload", "http_content_type"),
                "http_content_type",
            ).alias("text"),
            "source_file",
            "source_offset",
        )
    )
    print(f"ingested {crawled.count()} pages from {n_archives} archives")

    # 3.5 link graph (r13): type payloads from MAGIC BYTES (headers
    # lie — sniff_mime routes binary junk out before any text work),
    # extract + resolve outlinks, aggregate the host-level edge table
    # (one partial-agg shuffle), and rank host authority with the
    # integer-exact PageRank — the crawl-frontier prioritization
    # signal
    html_only = raw.withColumn(
        "mime", encoding.sniff_mime("payload")
    ).filter(F.col("mime") == "text/html")
    edges = url.link_host_edges(html_only, "payload", "target_uri")
    ranked_hosts = graph.pagerank(
        edges.filter(F.col("src_host") != F.col("dst_host")),
        iters=3,
        src_col="src_host",
        dst_col="dst_host",
        weight_col="n_links",
    )
    top = ranked_hosts.orderBy(F.desc("rank")).limit(3).collect()
    print(
        "host graph:", edges.count(), "edges; top hosts:",
        [(r[0], r["rank"]) for r in top],
    )

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
        url.url_dedup(url.filter_urls(crawled, "url"), "url"),
        "url",
        n=1_000_000,
    )
    print(
        "after URL dedup + domain cap:", url_kept.count(),
        "domains:", url_kept.select(
            url.registered_domain(url.url_host(F.col("url")))
        ).distinct().count(),
    )

    # 5. screen: trigram lang-ID (r12 — broadcast profile join, the
    # bucket key CCNet tiers on), exact content dedup, then per-language
    # perplexity terciles fed by the PREDICTED language
    langs = langid.identify_language(url_kept, "text", id_col="doc_id")
    screened = url_kept.join(langs, "doc_id")
    kept = dedup.exact_dedup(screened, text_col="text")
    print(
        "after exact dedup:", kept.count(),
        "langs:", sorted(
            r["lang_pred"]
            for r in kept.select("lang_pred").distinct().collect()
        ),
    )
    scored = kept.withColumn(
        "logprob",
        F.length("text").cast("double") / (text.token_count("text") + 1),
    )
    tiers = text.perplexity_buckets(scored, by="lang_pred")
    print(
        "per-language perplexity tiers:",
        sorted(
            (r["ppl_bucket"], r["n"])
            for r in tiers.groupBy("ppl_bucket").agg(
                F.count("*").alias("n")
            ).collect()
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
    # 7. WET export: curated text as conversion records, provenance
    # headers pointing at the exact source-archive bytes
    from mongo_arrow_spark.sources import write_wet

    wet_dir = f"{out}/wet"
    write_wet(
        kept.select(
            "doc_id",
            "text",
            F.concat(
                F.lit("<urn:mas:"), F.col("doc_id").cast("string"),
                F.lit(">"),
            ).alias("src_id"),
            "source_file",
            "source_offset",
        ).repartition(2),
        wet_dir,
        refers_to_col="src_id",
        source_file_col="source_file",
        source_offset_col="source_offset",
        index=True,
    )
    wet_back = (
        spark.read.format("warc")
        .option("warcTypes", "conversion")
        .load(wet_dir)
    )
    assert wet_back.count() == kept.count()
    print(
        f"WET export: {wet_back.count()} conversion records "
        f"(refers_to + source-offset provenance)"
    )
    print(f"artifacts under {out}")


if __name__ == "__main__":
    main()
