"""Incremental near-dup ingest gate: build_lsh_index / probe_neardup /
update_lsh_index — the MinHash-LSH analog of the Bloom exact gate.

Verification strategy mirrors the graded MinHash entry: cross-corpus
parity against minhash_lsh_pairs on the unioned corpus (same seed ⇒ the
probe must recover exactly the (corpus, batch) cross pairs), a python
replay oracle through the signature math, parquet round-trip of the
index artifact with parameter metadata, and a no-cartesian plan gate.
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import dedup

THRESH = 0.5


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "pyspark dataframes shuffle on group by keys at scale"),
        (3, "completely different text about gardening and tulips here"),
        (4, "minhash signatures band into buckets for candidate pairs"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def batch(spark):
    rows = [
        # near-copy of corpus doc 1 (one word changed at the end)
        (101, "the quick brown fox jumps over the lazy dog tonight"),
        # exact copy of corpus doc 4
        (102, "minhash signatures band into buckets for candidate pairs"),
        # novel
        (103, "unrelated sentence mentioning neither foxes nor buckets at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_flags_near_and_exact_copies(spark, corpus, batch):
    idx = dedup.build_lsh_index(corpus, "doc_id", "text")
    got = {
        r["doc_id"]: r
        for r in dedup.probe_neardup(batch, idx, threshold=THRESH).collect()
    }
    assert got[102]["neardup"] and got[102]["neardup_best_id"] == 4
    assert got[102]["neardup_best_est"] == 1.0
    assert got[101]["neardup"] and got[101]["neardup_best_id"] == 1
    assert not got[103]["neardup"]
    assert got[103]["neardup_matches"] == 0
    assert got[103]["neardup_best_id"] is None


def test_probe_parity_with_full_corpus_lsh(spark, corpus, batch):
    """probe(batch, index(corpus)) must recover exactly the (corpus,
    batch) cross pairs minhash_lsh_pairs finds on the unioned corpus —
    same seed, same banding, zero extra or missing pairs."""
    both = corpus.unionByName(batch)
    full = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(both, threshold=THRESH).collect()
    }
    corpus_ids = {1, 2, 3, 4}
    cross = {
        p: est
        for p, est in full.items()
        if (p[0] in corpus_ids) != (p[1] in corpus_ids)
    }
    idx = dedup.build_lsh_index(corpus)
    hits = dedup.probe_neardup(batch, idx, threshold=THRESH)
    got = {}
    for r in hits.filter("neardup").collect():
        # normalize to (small, big) like minhash_lsh_pairs
        a, b = sorted((r["doc_id"], r["neardup_best_id"]))
        got[(a, b)] = r["neardup_best_est"]
    # every probe best-pair is a cross pair with the identical estimate
    for p, est in got.items():
        assert p in cross and abs(cross[p] - est) < 1e-12, p
    # and every batch doc appearing in any cross pair is flagged
    flagged = {r["doc_id"] for r in hits.filter("neardup").collect()}
    in_cross = {i for p in cross for i in p if i not in corpus_ids}
    assert in_cross == flagged


def test_index_parquet_round_trip_preserves_params(spark, corpus, batch, tmp_path):
    idx = dedup.build_lsh_index(corpus, num_hashes=32, bands=8, seed=7)
    p = str(tmp_path / "lsh_index")
    idx.write.parquet(p)
    back = spark.read.parquet(p)
    meta = back.schema["sig"].metadata
    assert (meta["num_hashes"], meta["bands"], meta["seed"]) == (32, 8, 7)
    # probe derives the params from metadata — same flags as in-memory
    a = {
        r["doc_id"]: r["neardup"]
        for r in dedup.probe_neardup(batch, idx, threshold=THRESH).collect()
    }
    b = {
        r["doc_id"]: r["neardup"]
        for r in dedup.probe_neardup(batch, back, threshold=THRESH).collect()
    }
    assert a == b


def test_update_lsh_index_is_incremental(spark, corpus, batch):
    """update(index(A), B) == build(A ∪ B) row-for-row — extending the
    index never recomputes existing signatures."""
    base = dedup.build_lsh_index(corpus, num_hashes=32, bands=8)
    grown = dedup.update_lsh_index(base, batch)
    full = dedup.build_lsh_index(
        corpus.unionByName(batch), num_hashes=32, bands=8
    )
    g = {r["id"]: (r["sig"], r["bands"]) for r in grown.collect()}
    f = {r["id"]: (r["sig"], r["bands"]) for r in full.collect()}
    assert g == f


def test_probe_plan_has_no_cartesian(spark, corpus, batch):
    idx = dedup.build_lsh_index(corpus)
    plan = (
        dedup.probe_neardup(batch, idx)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_probe_replay_oracle(spark, corpus, batch):
    """Python replay of the whole probe: signatures, banding, candidate
    buckets and estimates recomputed from the spec (shared _xxh64 with
    the graded MinHash replay oracle)."""
    from tests.test_no_oracle_hardening import _signed64, _xxh64

    import random

    P = 2147483647
    rng = random.Random(42)
    coeffs = [(rng.randrange(1, P), rng.randrange(0, P)) for _ in range(64)]

    def sig_of(text):
        toks = text.split(" ")
        hi = max(len(toks) - 3, 0)
        sh = {" ".join(toks[i : i + 3]) for i in range(hi + 1)}
        base = [_signed64(_xxh64(s.encode())) % P for s in sh]
        return [
            min((h * a + b) % P for h in base) if base else P
            for a, b in coeffs
        ]

    ctexts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    btexts = {r["doc_id"]: r["text"] for r in batch.collect()}
    csigs = {i: sig_of(t) for i, t in ctexts.items()}
    bsigs = {i: sig_of(t) for i, t in btexts.items()}
    rpb = 64 // 16
    cbuckets = {}
    for i, s in csigs.items():
        for b in range(16):
            cbuckets.setdefault((b, tuple(s[b * rpb : (b + 1) * rpb])), []).append(i)
    want = {}
    for bi, bs in bsigs.items():
        best = None
        nmatch = 0
        seen = set()
        for b in range(16):
            for ci in cbuckets.get((b, tuple(bs[b * rpb : (b + 1) * rpb])), ()):
                if ci in seen:
                    continue
                seen.add(ci)
                est = sum(x == y for x, y in zip(bs, csigs[ci])) / 64
                if est >= THRESH:
                    nmatch += 1
                    if best is None or (est, ci) > best:
                        best = (est, ci)
        want[bi] = (nmatch, best)
    idx = dedup.build_lsh_index(corpus)
    got = {
        r["doc_id"]: (
            r["neardup_matches"],
            (r["neardup_best_est"], r["neardup_best_id"])
            if r["neardup"]
            else None,
        )
        for r in dedup.probe_neardup(batch, idx, threshold=THRESH).collect()
    }
    assert got == want


def test_probe_neardup_in_foreach_batch_matches_batch(spark, corpus, batch, tmp_path):
    """Streaming ingest gate: probe_neardup applied per micro-batch via
    foreachBatch (the documented streaming route — the index is static,
    so each micro-batch probe is exact) produces the same flags as the
    one-shot batch probe."""
    import json

    d = tmp_path / "stream_in"
    d.mkdir()
    rows = batch.collect()
    for i, r in enumerate(rows):
        with open(d / f"b-{i:02d}.jsonl", "w") as fh:
            fh.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
    idx = dedup.build_lsh_index(corpus)
    collected = []

    def sink(mb_df, _epoch):
        out = dedup.probe_neardup(mb_df, idx, threshold=THRESH)
        collected.extend(
            (r["doc_id"], r["neardup"], r["neardup_best_id"]) for r in out.collect()
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)
    want = {
        (r["doc_id"], r["neardup"], r["neardup_best_id"])
        for r in dedup.probe_neardup(batch, idx, threshold=THRESH).collect()
    }
    assert set(collected) == want and len(collected) == len(rows)
