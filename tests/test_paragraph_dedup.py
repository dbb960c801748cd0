"""Round-8 sixth wave: cross-corpus paragraph dedup (CCNet, Wenzek et
al. 2020 §4.1 — the reference has no corpus ops; this extends the
training-data tier).

The graded oracle (``dedup_paragraphs`` in queries_ops.py) pins the
exact first-occurrence semantics against DuckDB; these pin the
invariants the oracle can't see: NULL/empty-document behavior under
both ``drop_empty`` modes, within-document duplicate removal,
normalized-key collisions, pass-through of non-text columns, and
determinism under repartitioning.
"""

import pyspark.sql.functions as F
import pytest

from mongo_arrow_spark.operators.dedup import dedup_paragraphs

ROWS = [
    (1, "alpha beta\n\nshared para one\n\ngamma", "a"),
    (2, "shared para one\n\ndelta\n\nshared para one", "b"),
    (3, "shared para one", "c"),
    (4, None, "d"),
    (5, "", "e"),
    (6, "Shared Para ONE!\n\nunique tail", "f"),
]
SCHEMA = "doc_id long, text string, src string"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_first_occurrence_wins_and_later_copies_vanish(docs):
    got = {r["doc_id"]: r["text"] for r in dedup_paragraphs(docs).collect()}
    # winner doc keeps the paragraph in place
    assert got[1] == "alpha beta\n\nshared para one\n\ngamma"
    # later doc loses the cross-corpus copy AND its own second copy
    assert got[2] == "delta"
    # fully-deduplicated / NULL / empty docs vanish under drop_empty
    assert set(got) == {1, 2, 6}
    # raw mode: different bytes survive
    assert got[6] == "Shared Para ONE!\n\nunique tail"


def test_drop_empty_false_keeps_hollow_docs(docs):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(docs, drop_empty=False).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6}
    assert got[3] == ""  # every paragraph was a duplicate
    assert got[4] is None  # NULL text passes through as NULL
    assert got[5] == ""  # empty text stays empty


def test_normalized_key_folds_mirror_edits(docs):
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(docs, normalized=True).collect()
    }
    # "Shared Para ONE!" normalizes into doc 1's winner → only the tail
    # survives, and the WINNER's raw form is what remains in doc 1
    assert got[6] == "unique tail"
    assert got[1] == "alpha beta\n\nshared para one\n\ngamma"


def test_other_columns_pass_through(docs):
    out = dedup_paragraphs(docs)
    assert set(out.columns) == {"doc_id", "text", "src"}
    assert {r["src"] for r in out.collect()} == {"a", "b", "f"}


def test_deterministic_under_repartitioning(docs):
    a = {(r["doc_id"], r["text"]) for r in dedup_paragraphs(docs).collect()}
    b = {
        (r["doc_id"], r["text"])
        for r in dedup_paragraphs(docs.repartition(7)).collect()
    }
    assert a == b


def test_custom_separator_single_newline(spark):
    df = spark.createDataFrame(
        [(1, "x\ny\nz"), (2, "y\nw")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text"]
        for r in dedup_paragraphs(df, sep=r"\n+", join_sep="\n").collect()
    }
    assert got == {1: "x\ny\nz", 2: "w"}


# ------------------------------------------------- incremental ingest gate


def test_paragraph_gate_two_batches_equals_global(spark):
    """Batch-by-batch gate + index update == one global dedup_paragraphs
    when batches arrive in id order (the gate's documented invariant)."""
    from mongo_arrow_spark.operators.dedup import (
        build_paragraph_index,
        dedup_paragraphs,
        paragraph_ingest_gate,
        update_paragraph_index,
    )

    rows = [
        (1, "aa bb\n\nshared one\n\ncc"),
        (2, "shared one\n\ndd ee"),
        (3, "ff gg\n\nshared two"),
        (4, "shared two\n\nshared one\n\nhh"),
        (5, "shared one"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (r["doc_id"], r["text"]) for r in dedup_paragraphs(df).collect()
    }

    b1 = df.filter(F.col("doc_id") <= 2)
    b2 = df.filter(F.col("doc_id") > 2)
    idx = build_paragraph_index(b1.limit(0))  # empty standing index
    got = set()
    for batch in (b1, b2):
        gated = paragraph_ingest_gate(batch, idx)
        got |= {(r["doc_id"], r["text"]) for r in gated.collect()}
        idx = update_paragraph_index(idx, batch)
    assert got == want


def test_index_update_keeps_first_provenance(spark):
    from mongo_arrow_spark.operators.dedup import (
        build_paragraph_index,
        update_paragraph_index,
    )

    b1 = spark.createDataFrame(
        [(10, "alpha\n\nbeta")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(20, "beta\n\ngamma")], "doc_id long, text string"
    )
    idx = update_paragraph_index(build_paragraph_index(b1), b2)
    got = {r["digest"]: (r["first_id"], r["first_pos"]) for r in idx.collect()}
    assert len(got) == 3
    # 'beta' collided: the STANDING entry (doc 10, pos 1) wins
    import hashlib

    beta = hashlib.md5(b"beta").hexdigest()
    assert got[beta] == (10, 1)


def test_strip_known_paragraphs_streaming(spark, tmp_path):
    """foreachBatch strip against a static index snapshot: one-batch
    replay == batch strip (the documented streaming contract — the
    reassembly groupBy makes the op batch-per-micro-batch, so it runs
    in the sink, not on the raw stream)."""
    import json as _json
    import uuid as _uuid

    from mongo_arrow_spark.operators.dedup import (
        build_paragraph_index,
        strip_known_paragraphs,
    )
    from mongo_arrow_spark.streaming import read_document_stream

    standing = spark.createDataFrame(
        [(1, "known para\n\nalso known")], "doc_id long, text string"
    )
    idx = build_paragraph_index(standing)
    batch_rows = [
        {"doc_id": 10, "text": "fresh stuff\n\nknown para"},
        {"doc_id": 11, "text": "also known"},
    ]
    d = tmp_path / "pstream"
    d.mkdir()
    with open(d / "b0.jsonl", "w") as fh:
        for r in batch_rows:
            fh.write(_json.dumps(r) + "\n")
    stream = read_document_stream(spark, str(d), "doc_id bigint, text string")
    name = f"t_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE TABLE {name} (doc_id bigint, text string) USING parquet")

    def sink(batch_df, _bid):
        strip_known_paragraphs(batch_df, idx).write.insertInto(name)

    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["doc_id"], r["text"]) for r in spark.table(name).collect()}
    assert got == {(10, "fresh stuff")}
    spark.sql(f"DROP TABLE {name}")


# ------------------------------------------------------ property (random)


def test_paragraph_dedup_matches_python_reference_random(spark):
    """Randomized differential: dedup_paragraphs over random corpora ==
    a pure-python first-occurrence reference (beyond the DuckDB oracle:
    covers empty paragraphs, hollow docs, and both drop_empty modes)."""
    import random
    import re

    rng = random.Random(80801)
    alphabet = ["aa", "bb", "cc", "dd", "ee ff", "gg hh ii", ""]

    def ref(rows, drop_empty):
        seen, out = set(), {}
        for doc_id, text in sorted(rows):
            if text is None:
                if not drop_empty:
                    out[doc_id] = None
                continue
            kept = []
            for par in re.split(r"\n{2,}", text):
                if par.strip() == "" or par in seen:
                    continue
                seen.add(par)
                kept.append(par)
            if kept:
                out[doc_id] = "\n\n".join(kept)
            elif not drop_empty:
                out[doc_id] = ""
        return out

    for trial in range(8):
        rows = []
        for doc_id in range(rng.randint(1, 10)):
            if rng.random() < 0.1:
                rows.append((doc_id, None))
            else:
                pars = [
                    rng.choice(alphabet)
                    for _ in range(rng.randint(0, 6))
                ]
                rows.append((doc_id, "\n\n".join(pars)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        for drop_empty in (True, False):
            got = {
                r["doc_id"]: r["text"]
                for r in dedup_paragraphs(df, drop_empty=drop_empty).collect()
            }
            assert got == ref(rows, drop_empty), (trial, drop_empty, rows)
