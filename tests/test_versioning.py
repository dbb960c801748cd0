"""Corpus versioning: delta-only writes, time-travel reads, checkpoint
fold origins, and the commit/contract guards."""

import os

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import versioning as V

from conftest import SF_DIR  # noqa: F401  (spark fixture wiring)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _snap(df):
    return {(r["doc_id"], r["text"], r["lang"]) for r in df.collect()}


def test_version_chain_round_trips_every_version(spark, tmp_path):
    p = str(tmp_path / "corpus")
    v1 = [(1, "a", "en"), (2, "b", "en"), (3, "c", "de")]
    v2 = [(1, "a", "en"), (2, "B!", "en"), (4, "d", "fr")]  # chg 2, del 3, add 4
    v3 = [(1, "a", "en"), (2, "B!", "en"), (4, "d", "fr"), (5, "e", "en")]
    m1 = V.write_version(_frame(spark, v1), p)
    m2 = V.write_version(_frame(spark, v2), p)
    m3 = V.write_version(_frame(spark, v3), p)
    assert (m1["version"], m2["version"], m3["version"]) == (1, 2, 3)
    assert m1["checkpoint"] and not m2["checkpoint"]
    # delta accounting: v2 = 1 changed (rem+add) + 1 removed + 1 added
    assert (m2["added"], m2["removed"]) == (2, 2)
    assert (m3["added"], m3["removed"]) == (1, 0)
    for v, rows in ((1, v1), (2, v2), (3, v3)):
        assert _snap(V.read_version(spark, p, v)) == set(rows)
    assert _snap(V.read_version(spark, p)) == set(v3)  # latest default
    # storage is delta-only: v2 wrote exactly 2 payload rows
    added = spark.read.parquet(os.path.join(p, "v=2", "added"))
    assert added.count() == 2
    assert not os.path.exists(os.path.join(p, "v=2", "full"))


def test_checkpoint_becomes_fold_origin(spark, tmp_path):
    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b2", "en")]), p)
    m3 = V.write_version(
        _frame(spark, [(1, "a", "en"), (2, "b2", "en"), (3, "c", "de")]),
        p,
        checkpoint=True,
    )
    assert m3["checkpoint"]
    v4 = [(1, "a", "en"), (3, "c", "de")]
    V.write_version(_frame(spark, v4), p)
    # v4 folds from the v3 checkpoint, not v1 — physical proof: with the
    # pre-checkpoint versions moved away, v4 still reconstructs
    import shutil

    for v in (1, 2):
        shutil.move(os.path.join(p, f"v={v}"), os.path.join(p, f"hide{v}"))
    try:
        assert _snap(V.read_version(spark, p, 4)) == set(v4)
    finally:
        for v in (1, 2):
            shutil.move(
                os.path.join(p, f"hide{v}"), os.path.join(p, f"v={v}")
            )
    # old versions still reconstruct
    assert _snap(V.read_version(spark, p, 2)) == {
        (1, "a", "en"),
        (2, "b2", "en"),
    }


def test_null_payload_and_null_vs_empty_change_detection(spark, tmp_path):
    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, None, "en"), (2, "x", "en")]), p)
    # NULL -> '' IS a change (null-tagged digest)
    m2 = V.write_version(_frame(spark, [(1, "", "en"), (2, "x", "en")]), p)
    assert (m2["added"], m2["removed"]) == (1, 1)
    assert _snap(V.read_version(spark, p, 1)) == {(1, None, "en"), (2, "x", "en")}
    assert _snap(V.read_version(spark, p, 2)) == {(1, "", "en"), (2, "x", "en")}
    # identical re-release commits an EMPTY delta
    m3 = V.write_version(_frame(spark, [(1, "", "en"), (2, "x", "en")]), p)
    assert (m3["added"], m3["removed"]) == (0, 0)
    assert _snap(V.read_version(spark, p, 3)) == _snap(V.read_version(spark, p, 2))


def test_guards(spark, tmp_path):
    p = str(tmp_path / "corpus")
    with pytest.raises(ValueError, match="no committed versions"):
        V.read_version(spark, p)
    with pytest.raises(ValueError, match="duplicate"):
        V.write_version(
            _frame(spark, [(1, "a", "en"), (1, "b", "en")]), p
        )
    V.write_version(_frame(spark, [(1, "a", "en")]), p)
    with pytest.raises(ValueError, match="not committed"):
        V.read_version(spark, p, 7)
    with pytest.raises(ValueError, match="contract"):
        V.write_version(
            _frame(spark, [(1, "a", "en")]), p, payload_cols=["text"]
        )
    with pytest.raises(ValueError, match="payload_cols"):
        # an id-only frame has nothing to version
        V.write_version(
            spark.createDataFrame([(1,)], "doc_id long"),
            str(tmp_path / "x"),
        )


def test_null_id_rejected(spark, tmp_path):
    """A NULL id would silently fall out of every delta's semi-join —
    rejected at commit instead (r9 review fix)."""
    p = str(tmp_path / "corpus")
    df = spark.createDataFrame(
        [(None, "a", "en"), (2, "b", "en")],
        "doc_id long, text string, lang string",
    )
    with pytest.raises(ValueError, match="NULL"):
        V.write_version(df, p)


def test_digest_is_prefix_free(spark, tmp_path):
    """Payload values containing the join byte must not conflate: the
    length-prefixed serialization keeps ('a\\x001b','c') ≠ ('a','b\\x001c')
    — a change between them commits a real delta (r9 review fix)."""
    p = str(tmp_path / "corpus")
    V.write_version(
        _frame(spark, [(1, "a\x001b", "c")]), p
    )
    m2 = V.write_version(_frame(spark, [(1, "a", "b\x001c")]), p)
    assert (m2["added"], m2["removed"]) == (1, 1)
    assert _snap(V.read_version(spark, p, 2)) == {(1, "a", "b\x001c")}


def test_version_diff_report(spark, tmp_path):
    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    V.write_version(
        _frame(spark, [(1, "a", "en"), (2, "B", "en"), (3, "c", "de")]), p
    )
    rep = {
        r["status"]: r["n_docs"]
        for r in V.version_diff_report(spark, p, 1, 2).collect()
    }
    assert rep.get("added") == 1
    assert rep.get("changed") == 1
    assert rep.get("unchanged") == 1
    assert "removed" not in rep or rep["removed"] == 0


def test_compact_version_becomes_fold_origin(spark, tmp_path):
    """compact_version materializes a synthetic checkpoint at an
    existing version: reads of it and later versions fold from there
    (proved physically — pre-compaction dirs hidden), older versions
    still reconstruct, and compaction is idempotent."""
    import shutil

    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    V.write_version(_frame(spark, [(1, "a2", "en"), (2, "b", "en")]), p)
    v3 = [(1, "a2", "en"), (3, "c", "de")]
    V.write_version(_frame(spark, v3), p)
    m = V.compact_version(spark, p, 3)
    assert m["checkpoint"] and m["version"] == 3
    assert m == V.compact_version(spark, p, 3)  # idempotent
    v4 = v3 + [(4, "d", "fr")]
    V.write_version(_frame(spark, v4), p)
    for v in (1, 2):
        shutil.move(os.path.join(p, f"v={v}"), os.path.join(p, f"hide{v}"))
    try:
        assert _snap(V.read_version(spark, p, 3)) == set(v3)
        assert _snap(V.read_version(spark, p, 4)) == set(v4)
    finally:
        for v in (1, 2):
            shutil.move(
                os.path.join(p, f"hide{v}"), os.path.join(p, f"v={v}")
            )
    assert _snap(V.read_version(spark, p, 2)) == {
        (1, "a2", "en"),
        (2, "b", "en"),
    }
