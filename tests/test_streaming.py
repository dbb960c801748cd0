"""Streaming tests: documents stream source → watermark/window/session/
stateful ops, validated against batch equivalents (availableNow trigger +
memory sink keeps it deterministic)."""

import json
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from mongo_arrow_spark.streaming import (
    read_document_stream,
    running_totals_stateful,
    sessionized,
    stream_dedup_within_watermark,
    windowed_aggregate,
)

SCHEMA_DDL = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, spark, tables):
    """Split the events table into 4 jsonl 'arrival' files."""
    d = tmp_path_factory.mktemp("stream")
    ev = tables["events"].orderBy("event_id").collect()
    chunk = max(1, len(ev) // 4)
    for i in range(4):
        rows = ev[i * chunk : (i + 1) * chunk if i < 3 else len(ev)]
        if not rows:
            continue
        with open(d / f"batch-{i:04d}.jsonl", "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"].isoformat(),
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                            "value": r["value"],
                        }
                    )
                    + "\n"
                )
    return str(d)


def _run_stream(spark, df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_source_counts(spark, stream_dir, tables):
    stream = read_document_stream(spark, stream_dir, SCHEMA_DDL)
    assert stream.isStreaming
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, stream, name)
    assert out.count() == tables["events"].count()


def test_windowed_aggregate_matches_batch(spark, stream_dir, tables):
    stream = read_document_stream(spark, stream_dir, SCHEMA_DDL)
    agg = windowed_aggregate(stream, window="1 hour", keys=["event_type"])
    name = f"t_{uuid.uuid4().hex[:8]}"
    # complete mode: append would hold back windows the watermark hasn't
    # passed at end-of-stream (correct streaming behavior, wrong for a
    # final-state comparison)
    out = _run_stream(spark, agg, name, mode="complete").collect()
    batch = (
        tables["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = {(r["window_start"], r["event_type"]): r["n"] for r in out}
    want = {(r["h"], r["event_type"]): r["n"] for r in batch}
    assert got == want


def test_session_window_runs(spark, stream_dir):
    stream = read_document_stream(spark, stream_dir, SCHEMA_DDL)
    sess = sessionized(stream, gap="30 minutes")
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, sess, name, mode="complete")
    assert out.count() > 0
    row = out.first()
    assert row["session_end"] > row["session_start"]


def test_stream_dedup(spark, stream_dir, tmp_path):
    # duplicate one arrival file wholesale → dedup must restore the count
    dup_dir = tmp_path / "dup"
    shutil.copytree(stream_dir, dup_dir)
    files = sorted(dup_dir.glob("*.jsonl"))
    shutil.copy(files[0], dup_dir / "zz-dup.jsonl")
    stream = read_document_stream(spark, str(dup_dir), SCHEMA_DDL)
    dedup = stream_dedup_within_watermark(stream, ["event_id"], watermark="10 days")
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, dedup, name)
    n_with_dups = sum(1 for f in dup_dir.glob("*.jsonl") for _ in open(f))
    assert out.count() < n_with_dups
    assert out.select("event_id").distinct().count() == out.count()


def test_running_totals_stateful(spark, stream_dir, tables):
    stream = read_document_stream(spark, stream_dir, SCHEMA_DDL)
    totals = running_totals_stateful(stream)
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, totals, name, mode="update")
    # last update per user must equal the batch totals
    batch = (
        tables["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    want = {r["user_id"]: r["n_events"] for r in batch}
    got = {}
    for r in out.collect():  # memory sink appends every update; keep max
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_events"])
    assert got == want


def test_corpus_ops_compose_with_streams(spark, tmp_path):
    """The corpus quality/PII/chunk/split operators are pure projections,
    so they must compose with readStream unchanged — streaming filter
    pipelines are how these run in production ingest."""
    import uuid as _uuid

    from mongo_arrow_spark.operators import quality

    d = tmp_path / "docs_stream"
    d.mkdir()
    with open(d / "b0.jsonl", "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": ("contact a@b.com now " + "word " * 60).strip()}) + "\n")
        fh.write(json.dumps({"doc_id": 2, "text": "short"}) + "\n")
    stream = read_document_stream(spark, str(d), "doc_id bigint, text string")
    assert stream.isStreaming
    flagged = quality.gopher_quality_flags(stream, min_tokens=10)
    redacted = flagged.withColumn("text", quality.pii_redact("text"))
    out = quality.train_split(redacted, id_col="doc_id")
    name = f"corpus_stream_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["doc_id"]: r for r in spark.table(name).collect()}
    assert rows[1]["q_keep"] is True and rows[2]["q_keep"] is False
    assert "[PII]" in rows[1]["text"] and "@" not in rows[1]["text"]
    assert rows[1]["split"] in ("train", "val", "test")


def test_sessionize_stateful_timers(spark, stream_dir, tables):
    """transformWithStateInPandas sessionization: with a zero gap every
    key's timer expires between microbatches, emitting sessions whose
    totals equal the batch aggregates.

    Skips when google.protobuf is absent: Spark 4's transformWithState
    state-server protocol needs it, it isn't in this container, and
    installs are disallowed — the operator validates automatically once
    the wheel lands (same contract as the polars mirror)."""
    pytest.importorskip("google.protobuf")
    from mongo_arrow_spark.streaming import sessionize_stateful

    stream = read_document_stream(spark, stream_dir, SCHEMA_DDL)
    sessions = sessionize_stateful(stream, gap_seconds=0)
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, sessions, name)
    got = {
        r["user_id"]: r
        for r in out.groupBy("user_id")
        .agg(
            F.sum("n_events").alias("n"),
            F.min("session_start").alias("t0"),
            F.max("session_end").alias("t1"),
        )
        .collect()
    }
    batch = (
        tables["events"]
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
        .collect()
    )
    want = {r["user_id"]: r for r in batch}
    # every key that got flushed matches its batch totals; keys whose
    # timer never fired before shutdown may be absent (append semantics)
    assert got, "no sessions emitted"
    for uid, row in got.items():
        assert row["n"] == want[uid]["n"]
        assert row["t0"] == want[uid]["t0"] and row["t1"] == want[uid]["t1"]


def test_stream_reads_bson_and_gzip_arrivals(spark, tmp_path):
    """The streaming source lists mongodump-shaped (.bson, .bson.gz) and
    gzipped jsonl arrivals alongside plain jsonl — one growing dump
    directory, four arrival formats, one stream."""
    import gzip

    from mongo_arrow_spark.bson_codec import encode_document

    d = tmp_path / "arrivals"
    d.mkdir()
    with open(d / "a.jsonl", "w") as fh:
        fh.write(json.dumps({"k": 1}) + "\n")
    with gzip.open(d / "b.jsonl.gz", "wt") as fh:
        fh.write(json.dumps({"k": 2}) + "\n")
    with open(d / "c.bson", "wb") as fh:
        fh.write(encode_document({"k": 3}))
    with gzip.open(d / "e.bson.gz", "wb") as fh:
        fh.write(encode_document({"k": 4}))
    stream = read_document_stream(spark, str(d), "k bigint")
    name = f"t_{uuid.uuid4().hex[:8]}"
    out = _run_stream(spark, stream, name)
    assert sorted(r["k"] for r in out.collect()) == [1, 2, 3, 4]


def test_pq_encode_streaming_parity(spark, tmp_path):
    """pq_encode with a PREFIT model is a map-only literal projection —
    append-legal, so it composes with readStream unchanged and a finite
    replay equals the batch encoding row-for-row (the scorer-parity
    contract: the model is driver state, nothing re-fits per batch)."""
    from mongo_arrow_spark.operators.similarity import fit_pq, pq_encode

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    model = fit_pq(emb, m=8, codes=4, iters=1, dim=64)

    d = tmp_path / "emb_stream"
    d.mkdir()
    rows = emb.select("vec_id", "embedding").limit(60).collect()
    for b in range(3):  # three arrival files
        with open(d / f"b{b}.jsonl", "w") as fh:
            for r in rows[b * 20:(b + 1) * 20]:
                fh.write(json.dumps(
                    {"vec_id": r["vec_id"],
                     "embedding": [float(x) for x in r["embedding"]]}
                ) + "\n")
    stream = read_document_stream(
        spark, str(d), "vec_id bigint, embedding array<float>"
    )
    out = pq_encode(stream, model)
    name = f"pq_stream_{uuid.uuid4().hex[:8]}"
    _run_stream(spark, out, name)
    got = {r["vec_id"]: list(r["pq_codes"]) for r in spark.table(name).collect()}
    batch_df = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in rows],
        "vec_id long, embedding array<float>",
    )
    want = {r["vec_id"]: list(r["pq_codes"])
            for r in pq_encode(batch_df, model).collect()}
    assert got == want and len(got) == 60
