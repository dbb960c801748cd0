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
