#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Covers every operator class: scan+agg, multi-join, window, MQL-translated,
dedup (exact + LSH), similarity, text, multimodal.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q18_large_orders",
    "q_rollup_orders",
    "q_events_hourly",
    "q_window_running_sum",
    "mql_group_accumulators",
    "mql_window_rank",
    "mql_unwind_wordcount",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_bruteforce_topk",
    "sim_knn_join",
    "text_token_stats",
    "text_quality",
    "multimodal_decode",
    "text_search_tfidf",
    "ts_asof_join",
    "skew_salted_group",
    "mql_percentiles",
    # round-2 corpus ops (keys added r2 — diff per-query vs r1, not totals)
    "text_repetition",
    "dedup_components",
    "decontaminate_pairs",
    "chunk_tokens",
    # round-4 additions (keys added r4)
    "cdc_apply",
    "cdc_watch_stream",
    "pack_sequences",
    "shuffle_corpus",
    "semantic_dedup",
    "duplicate_spans",
    "bloom_ingest_gate",
    "profile_sketches",
    # round-5 addition: compressed dump ingest (gzip corpus materialized
    # once in the warm-up; timed runs measure the whole-file decode path)
    "q_scan_gzip_dump",
    # round-6 additions (keys added r6 — diff per-query vs r5, not
    # totals): incremental near-dup ingest gate (index build + band-key
    # probe), leakage-safe cluster split (pairs → components → md5
    # label), corpus drift (token-distribution JS terms)
    "neardup_ingest_gate",
    "cluster_safe_split",
    "corpus_drift",
    # hive-partitioned scan with listing-level pruning (corpus
    # materialized once in the warm-up; timed runs measure pruned reads)
    "q_scan_partitioned",
    # round-7 additions (keys added r7 — diff per-query vs r6, not
    # totals): per-outer-row $lookup top-N, real-header multimodal
    # decode replaces the fake-codec timing under the same key, and the
    # banded near-dup representative that replaced the posting join in
    # the graded window (dedup_ngram_jaccard stays keyed for cross-round
    # comparison of the two forms)
    "mql_lookup_topn",
    "dedup_banded_jaccard",
    # round-7 second wave: supervised NB token-logodds classifier
    # (fit + broadcast-model scoring) and DSIR importance resampling
    # (hashed-bucket ratios + Gumbel-top-k)
    "quality_nb_classifier",
    "dsir_resample",
    # round-7 third wave: bigram stupid-backoff LM (fit two TakeOrdered
    # model cuts + broadcast-join scoring) and quality-aware canonical
    # survivor selection (components + payload-free argmax)
    "text_bigram_logprob",
    "dedup_canonical",
    # round-8 addition: the composed curation pipeline (now the product
    # surface for the selection tier; fuzzy stage re-based on banded
    # candidates this round — dedup_canonical and cluster_safe_split
    # likewise, so expect their r7→r8 per-key deltas to reflect the
    # generator swap, not drift)
    "curate_corpus",
    # round-8 fourth wave (keys added r8 — diff per-query vs r8-prior
    # rounds' shared keys, not totals): token-budget cut (distributed
    # prefix sum, graded) and BPE fit+apply end-to-end (word-count
    # reduction + Arrow-batched encode)
    "select_token_budget",
    "tok_bpe_stats",
    # round-8 sixth wave: CCNet cross-corpus paragraph dedup (graded
    # rotation — segment explode → min-struct winner → ordered
    # reassembly; the one reassembly shuffle carries only survivors)
    "dedup_paragraphs",
    # deterministic quantized k-means (fit k=4 x 2 Lloyd steps + assign;
    # per-iteration shuffle is k x (d+1) longs, assignment map-only)
    "cluster_kmeans",
    # round-9: the session-3 families promoted into the graded window
    # (r8 verdict items 1+6) — first-reading numbers, diff vs SCALE.md's
    # x10 tables rather than earlier rounds' totals
    "graph_pagerank",
    "corpus_diff",
    "select_kcenter",
    "select_mmr",
    "pack_shards",
    "mix_interleave",
    # round-9 waves (parked oracles, 3-scale green): first-reading
    # headline numbers so BENCH tracks them through the drift anchors
    "quality_ensemble",
    "sim_hard_negatives",
    "pack_bucket_batches",
    "tok_pack_pipeline",
    "corpus_time_travel",
    # round-10: the IVF corpus×corpus form is now the hard-negatives
    # REPRESENTATIVE (r9 verdict #2). The benched key is the PRUNED
    # scale configuration (auto cell count + n_probe=4 — recall-pinned
    # in pytest); the exactness endpoint (sim_hard_negatives_ivf,
    # n_probe == n_clusters, hash-graded in the driver window) is all
    # pairs BY CONSTRUCTION and read a one-time 51.0 s at sf0.1
    # (BASELINE.md r10) — benching the brute-equivalent dial top every
    # round would dominate the battery total without measuring the
    # operator's scale posture. The brute key above stays for
    # cross-round comparison, with its anchors now the fixed bounded
    # list (expect its r9→r10 delta to reflect the anchor-contract
    # change, not drift).
    "sim_hard_negatives_ivf_pruned",
    "text_ngram_novelty",
    "layout_content_addressed",
    # round-10 session waves (parked oracles, 3-scale green):
    # data-contract report (one aggregate pass + FK anti-join), the
    # grouped per-language form, and the numeric PSI drift histogram
    "contract_check",
    "contract_by_group",
    "drift_numeric",
    # round-10 session-3: the crawl path — WARC archive round-trip and
    # the composed HTML-extraction chain (both parked oracles, 3-scale
    # green; scan-family siblings of q_scan_gzip_dump above)
    "q_scan_warc",
    "q_scan_warc_html",
    # round-11: the URL tier (keys added r11 — first-reading numbers):
    # canonicalization over a full-table messy-variant construction and
    # the per-registered-domain cap (map-only expression chains; the
    # cap's one shuffle moves pre-cut rows through WindowGroupLimit)
    "url_canonicalize",
    "url_domain_cap",
    # main-content extraction (boilerplate containers + segment filter
    # on top of the q_scan_warc_html chain — expect it to read a bit
    # above that key: same archive decode plus the HOF segment pass)
    "q_scan_warc_main",
    # streaming crawl ingest (same fixture as q_scan_warc through the
    # StreamExecution route — expect the streaming machinery constant
    # on top of that key)
    "q_crawl_stream",
    # round-12 (keys added r12 — first-reading numbers): charset
    # transcode (Arrow-batched pandas_udf projection), trigram lang-ID
    # (broadcast profile join + partial-agg shuffle), and the curation
    # pipeline with the URL tier enabled (expect it near curate_corpus
    # plus the map-only stage-0 chain)
    "q_decode_charset",
    "lang_id_trigram",
    "curate_corpus_url",
    # round-13 (keys added r13 — first-reading numbers): the composed
    # crawl transcode chain (archive scan + Content-Encoding undo +
    # charset transcode + routed extraction — expect it above
    # q_scan_warc_html: same scan plus the pandas_udf transcode),
    # outlink extraction + host-graph aggregation (map-side extraction,
    # one partial-agg shuffle), and magic-byte MIME sniffing (pure
    # codegen projection — expect it near the q01 floor)
    "q_crawl_transcode",
    "q_extract_links",
    "q_link_graph",
    "q_sniff_mime",
    # robots politeness gate: two tiny windows + one host equi-join —
    # expect it near the URL-tier floor
    "q_robots_gate",
    # frontier composition: extraction map-side + one distinct + one
    # url anti-join + the robots host join
    "q_crawl_frontier",
    # second wave: sitemap parse (split+transform), canonical-link
    # dedup (one groupBy argmax), fetch-wave scheduling (per-host
    # window) — all expected near the URL-tier floor
    "q_sitemap_frontier",
    "q_canonical_dedup",
    "q_fetch_schedule",
    # round-14 (keys added r14 — first-reading numbers): base-href
    # resolution (same map-only HOF chain as q_extract_links plus one
    # regexp_extract for the base tag), politeness-aware scheduling
    # (q_fetch_schedule plus the bounded per-host delay join), host
    # authority (link_host_edges feeding 3 weighted pagerank
    # iterations — expect it near graph_pagerank plus the extraction
    # map), and page-metadata extraction (five regexp_extract
    # projections — expect it near the URL-tier floor). NOTE for
    # cross-round diffs: q_canonical_dedup swapped its join-back for a
    # min_by struct-carry and q_robots_gate its expand+agg for a
    # rule-array HOF this round — expect their r13→r14 deltas to
    # reflect the plan change, not drift.
    "q_extract_links_base",
    "q_fetch_schedule_polite",
    "q_host_authority",
    "q_extract_meta",
]


def _anchor_probe(spark) -> float:
    """Fixed JVM-only no-op anchor (r6 verdict item 5): a pure
    whole-stage-codegen sum over spark.range, no I/O, no Python — its
    wall time moves only with host load. Timed at bench start/middle/
    end so per-query comparisons across rounds can be read through a
    MEASURED drift column instead of post-hoc anchor arguments."""
    import time as _t

    # min-of-3 over 500M rows: the old min-of-2/200M probe ran ~0.1 s,
    # small enough that scheduler jitter alone read as tens of percent
    # "drift" — a twitchy anchor makes the r11 spread bound misfire
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        spark.range(500_000_000).selectExpr("sum(id) AS s").collect()
        best = min(best, _t.perf_counter() - t0)
    return round(best, 3)


_DISK_PROBE_BUF = None


def _disk_probe() -> float:
    """Disk-sensitive drift anchor (r15, the r14 verdict's bench item):
    min-of-3 timed 64 MiB write+fsync to the same filesystem the bench's
    artifact-writing keys use. The CPU anchor is blind to disk
    contention — r14's first end-of-round capture had artifact keys
    inflated 2-4x (corpus_time_travel x2.0, multimodal_decode x4.3)
    while the codegen-sum anchor read flat — so disk-poisoned captures
    now self-describe the way CPU-poisoned ones already do. fsync makes
    the write hit the device instead of the page cache; the buffer is
    random bytes so a compressing filesystem can't short-circuit it.
    The probe writes to tempfile's default TMPDIR deliberately — that
    is the same place the bench's artifact keys write (the shape sinks
    and version stores all go through tempfile.mkdtemp), so the probe
    shares their filesystem by construction."""
    import tempfile
    import time as _t

    global _DISK_PROBE_BUF
    if _DISK_PROBE_BUF is None:
        _DISK_PROBE_BUF = os.urandom(1 << 22)  # 4 MiB
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        fd, path = tempfile.mkstemp(prefix="bench_disk_probe_")
        try:
            with os.fdopen(fd, "wb") as fh:
                for _ in range(16):  # 64 MiB total
                    fh.write(_DISK_PROBE_BUF)
                fh.flush()
                os.fsync(fh.fileno())
        finally:
            os.unlink(path)
        best = min(best, _t.perf_counter() - t0)
    return round(best, 3)


def _run_headline(spark, sf_dir: str, repeat: int):
    """One full pass over the headline queries with bracketing drift
    anchors. Returns (timings, drift) — the caller applies the
    spread-bound policy."""
    from mongo_arrow_spark.battery import QUERIES

    drift = {"start": _anchor_probe(spark), "disk_start": _disk_probe()}
    timings: dict[str, float] = {}
    for i, name in enumerate(HEADLINE):
        if i == len(HEADLINE) // 2:
            drift["mid"] = _anchor_probe(spark)
            drift["disk_mid"] = _disk_probe()
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # warm-up
        best = float("inf")
        for _ in range(repeat):
            start = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - start)
            del rows
        timings[name] = round(best, 3)
    drift["end"] = _anchor_probe(spark)
    drift["disk_end"] = _disk_probe()
    cpu = [drift["start"], drift["mid"], drift["end"]]
    lo, hi = min(cpu), max(cpu)
    drift["spread_pct"] = round(100.0 * (hi - lo) / lo, 1) if lo else 0.0
    dsk = [drift["disk_start"], drift["disk_mid"], drift["disk_end"]]
    lo, hi = min(dsk), max(dsk)
    drift["disk_spread_pct"] = (
        round(100.0 * (hi - lo) / lo, 1) if lo else 0.0
    )
    return timings, drift


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from mongo_arrow_spark.session import get_spark

    spark = get_spark("bench")
    # warm the JVM + parquet footers with a trivial action
    spark.range(1).count()

    # asv-style repeat discipline: one warm-up (codegen + broadcast build),
    # then min of REPEAT timed runs — the min is the least-noise estimator
    # on a shared host (stragglers from neighbor load inflate mean/max)
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    _anchor_probe(spark)  # warm the codegen path once

    # self-policing drift bound (r10 verdict #2): a capture whose anchor
    # spread exceeds the bound is host-load-poisoned — per-key deltas
    # read through it are attribution noise, and r10's committed record
    # (+229.9% spread, cdc_watch_stream 2.78→5.55 s with untouched code)
    # proved a poisoned capture CAN become the round record. Policy:
    # re-run the whole headline pass (up to MAX_ATTEMPTS), keep the
    # attempt with the smallest spread; if even the best attempt exceeds
    # the bound, the emitted line carries "drift_exceeded": true so the
    # record is self-describing instead of silently trusted.
    bound = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_SPREAD_PCT", "75"))
    # the disk probe gets its own (looser) bound: fsync latency on a
    # shared host is intrinsically twitchier than the codegen sum, and
    # the point is to catch the 2-4x artifact-key poisonings, not 1.5x
    # jitter (r15; quiet-window probe spread measured ~10-60%)
    disk_bound = float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_DISK_SPREAD_PCT", "150")
    )
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))

    def _score(d):
        # normalized worst offender across both anchors: <= 1.0 means
        # every spread is inside its bound. A zero/negative bound means
        # "always exceeded" (the pre-r15 semantics), not a crash.
        return max(
            d["spread_pct"] / bound if bound > 0 else float("inf"),
            d["disk_spread_pct"] / disk_bound
            if disk_bound > 0
            else float("inf"),
        )

    attempts = []
    for _ in range(max_attempts):
        timings, drift = _run_headline(spark, sf_dir, repeat)
        attempts.append((_score(drift), timings, drift))
        if _score(drift) <= 1.0:
            break
    score, timings, drift = min(attempts, key=lambda a: a[0])
    drift["attempts"] = len(attempts)
    drift["max_spread_pct"] = bound
    drift["max_disk_spread_pct"] = disk_bound
    drift_exceeded = score > 1.0

    # Slow-tail re-timing (r11 verdict #6): the min-of-REPEAT inside one
    # pass draws its samples seconds apart, so a multi-second key whose
    # pass landed in a load window keeps a poisoned min and swings
    # ×1.5-3 between same-code captures. Re-time every key that read
    # over the threshold AFTER the attempt loop (minutes later — a
    # temporally decorrelated draw) and keep the overall min. Only the
    # slow tail re-runs, so the extra wall cost is bounded.
    slow_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_SEC", "2"))
    slow_reps = int(os.environ.get("SPARK_GRAFT_BENCH_SLOW_REPEAT", "2"))
    if slow_reps > 0:
        from mongo_arrow_spark.battery import QUERIES as _Q

        retimed = []
        pre_retime: dict[str, float] = {}
        for name, t in timings.items():
            if t <= slow_thresh:
                continue
            best = t
            for _ in range(slow_reps):
                t0 = time.perf_counter()
                _Q[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            if best < t:
                retimed.append(name)
                pre_retime[name] = t
            timings[name] = round(best, 3)
        drift["slow_retimed"] = len(retimed)
        if retimed:
            # the final per-key numbers now partly come from the retime
            # window, so the drift verdict must describe that window
            # too: keep the pre-retime values alongside, bracket the
            # retime pass with its own anchor probe, and recompute
            # spread/exceeded over ALL probes so the shipped verdict is
            # consistent with the shipped timings (r12 ADVICE fix).
            drift["pre_retime"] = pre_retime
            drift["retime_anchor"] = _anchor_probe(spark)
            drift["disk_retime_anchor"] = _disk_probe()
            probes = [
                v
                for k, v in drift.items()
                if k in ("start", "mid", "end", "retime_anchor")
            ]
            lo, hi = min(probes), max(probes)
            drift["attempt_spread_pct"] = drift["spread_pct"]
            drift["spread_pct"] = (
                round(100.0 * (hi - lo) / lo, 1) if lo else 0.0
            )
            dprobes = [
                v
                for k, v in drift.items()
                if k
                in ("disk_start", "disk_mid", "disk_end", "disk_retime_anchor")
            ]
            lo, hi = min(dprobes), max(dprobes)
            drift["attempt_disk_spread_pct"] = drift["disk_spread_pct"]
            drift["disk_spread_pct"] = (
                round(100.0 * (hi - lo) / lo, 1) if lo else 0.0
            )
            drift_exceeded = (
                drift["spread_pct"] > bound
                or drift["disk_spread_pct"] > disk_bound
            )

    # reference-shape microbenches (BASELINE.md:26 — ReadSmall/Large/Array/
    # Document/Extension at N_DOCS=20k) in the same JSON line so the next
    # round can gate x1.3 regressions per shape, like the reference's asv.
    import time as _time

    from bench_shapes import build_frames

    import shutil
    import tempfile

    from mongo_arrow_spark.api import write as _write

    from mongo_arrow_spark.sources import register

    register(spark)
    shapes: dict[str, dict[str, float]] = {}
    wdir = tempfile.mkdtemp(prefix="bench_write_")
    # warm the Python worker pool once so the first timed shape doesn't
    # absorb executor-side interpreter startup
    _write(
        spark.range(64).coalesce(2),
        os.path.join(wdir, "__warm"),
        format="documents",
        spark=spark,
    )
    def timed(fn, reps):
        # same discipline as the queries: one warm-up, then min-of-reps
        # (shapes were single-shot cold runs through r2 — the source of
        # most of the round-over-round shape drift)
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = _time.perf_counter()
            fn()
            best = min(best, _time.perf_counter() - t0)
        return round(best, 3)

    # the shape loop reads through its own drift anchor (r7 verdict item
    # 8): anchor samples bracket the loop so the 2×-of-baseline shape
    # claim is drift-adjusted exactly like the headline queries
    shape_drift = {"start": _anchor_probe(spark)}
    frames = build_frames(spark)
    for i, (name, df) in enumerate(frames.items()):
        if i == len(frames) // 2:
            shape_drift["mid"] = _anchor_probe(spark)
        df = df.cache()
        df.count()
        shapes[name] = {
            "to_arrow": timed(df.toArrow, repeat),
            "to_pandas": timed(df.toPandas, repeat),
            # insert-path parity (reference asv insert benchmarks): the
            # documents JSONL sink via api.write
            "write_docs": timed(
                lambda: _write(
                    df, os.path.join(wdir, name), format="documents", spark=spark
                ),
                repeat,
            ),
        }
        df.unpersist()
    shutil.rmtree(wdir, ignore_errors=True)
    shape_drift["end"] = _anchor_probe(spark)
    lo, hi = min(shape_drift.values()), max(shape_drift.values())
    shape_drift["spread_pct"] = (
        round(100.0 * (hi - lo) / lo, 1) if lo else 0.0
    )
    shapes["drift"] = shape_drift

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "drift": drift,
        "shapes": shapes,
        "n_docs": 20_000,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if drift_exceeded:
        payload["drift_exceeded"] = True
    # The driver records only the LAST 2000 chars of stdout and parses
    # the final JSON line — with 60+ query keys the one-line dump blew
    # past that window, truncating the leading keys and leaving
    # BENCH_r*.json "parsed": null (r9 verdict #8). Two-part fix: the
    # FULL payload always lands in BENCH_FULL.json at the repo root
    # (committed per round, so every key survives), and the printed line
    # is shrunk to fit the capture — queries ordered slowest-first, and
    # if the line still exceeds the window the fastest keys are elided
    # into "queries_elided" (count; their values are in the file).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL.json"),
        "w",
    ) as fh:
        json.dump(payload, fh, indent=1)
    by_cost = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)
    )
    line = {**payload, "queries": by_cost, "full": "BENCH_FULL.json"}
    line.pop("shapes", None)  # shape timings live in the file
    s = json.dumps(line, separators=(",", ":"))
    while len(s) > 1900 and len(by_cost) > 1:
        by_cost.pop(next(reversed(by_cost)))
        line["queries"] = by_cost
        line["queries_elided"] = len(timings) - len(by_cost)
        s = json.dumps(line, separators=(",", ":"))
    print(s)


if __name__ == "__main__":
    main()
