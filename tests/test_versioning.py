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


def test_meta_commit_is_atomic_and_damage_is_contained(spark, tmp_path):
    """Crash-safety of the commit protocol (r9 verdict #4): a truncated
    _meta.json neither wedges list_versions nor becomes visible as a
    committed version; an orphaned commit temp file is invisible; and
    the store recovers by committing over the damaged slot."""
    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    # simulate a crash mid-commit of v2 under the OLD (truncating-write)
    # protocol: data written, meta half-written
    vdir = os.path.join(p, "v=2")
    os.makedirs(vdir)
    _frame(spark, [(3, "c", "de")]).write.parquet(
        os.path.join(vdir, "added")
    )
    with open(os.path.join(vdir, "_meta.json"), "w") as fh:
        fh.write('{"payload_cols": ["te')  # truncated mid-dump
    with pytest.warns(RuntimeWarning, match="corrupt version meta"):
        versions = V.list_versions(p)
    assert [m["version"] for m in versions] == [1]  # damage contained
    assert _snap(V.read_version(spark, p)) == {(1, "a", "en"), (2, "b", "en")}
    # an orphaned temp file from a crash BEFORE os.replace is invisible
    with open(os.path.join(p, ".v=9._meta.tmp"), "w") as fh:
        fh.write('{"half": tru')
    assert [m["version"] for m in V.list_versions(p)] == [1]
    # the store recovers: the next commit takes the damaged v2 slot
    m2 = V.write_version(_frame(spark, [(1, "a", "en"), (4, "d", "fr")]), p)
    assert m2["version"] == 2
    assert _snap(V.read_version(spark, p, 2)) == {(1, "a", "en"), (4, "d", "fr")}


def test_damaged_mid_chain_version_fails_reads_above_it(spark, tmp_path):
    """Deltas COMPOSE: a version whose meta is damaged (external — the
    commit protocol is atomic) must fail reconstructions ABOVE it
    loudly instead of silently folding without its added/removed (r10
    review fix); reads at/below the surviving fold origin still work,
    and restoring the meta repairs everything."""
    p = str(tmp_path / "corpus")
    V.write_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    V.write_version(_frame(spark, [(1, "a", "en"), (3, "c", "de")]), p)
    V.write_version(_frame(spark, [(1, "a", "en"), (5, "e", "fr")]), p)
    meta_p = os.path.join(p, "v=2", "_meta.json")
    good_meta = open(meta_p).read()
    with open(meta_p, "w") as fh:
        fh.write(good_meta[: len(good_meta) // 2])
    with pytest.warns(RuntimeWarning, match="corrupt version meta"):
        with pytest.raises(ValueError, match="missing or have corrupt"):
            V.read_version(spark, p, 3)
    with pytest.warns(RuntimeWarning, match="corrupt version meta"):
        assert _snap(V.read_version(spark, p, 1)) == {
            (1, "a", "en"),
            (2, "b", "en"),
        }
    with open(meta_p, "w") as fh:
        fh.write(good_meta)
    assert _snap(V.read_version(spark, p, 3)) == {
        (1, "a", "en"),
        (5, "e", "fr"),
    }


def test_append_version_upsert_and_noop(spark, tmp_path):
    """append_version commits an INCREMENT: new ids add, changed ids
    replace (removed+re-added), identical rows skip, and an
    already-applied batch is an idempotent no-op (no empty version)."""
    p = str(tmp_path / "corpus")
    m1 = V.append_version(_frame(spark, [(1, "a", "en"), (2, "b", "en")]), p)
    assert m1["version"] == 1 and m1["checkpoint"]  # first commit = full
    batch = _frame(spark, [(2, "B!", "en"), (3, "c", "de")])  # chg 2, add 3
    m2 = V.append_version(batch, p)
    assert (m2["added"], m2["removed"], m2["n_rows"]) == (2, 1, 3)
    want = {(1, "a", "en"), (2, "B!", "en"), (3, "c", "de")}
    assert _snap(V.read_version(spark, p)) == want
    # v1 still reconstructs — appends never rewrite history
    assert _snap(V.read_version(spark, p, 1)) == {(1, "a", "en"), (2, "b", "en")}
    # replaying the same batch commits nothing
    assert V.append_version(batch, p) is None
    assert [m["version"] for m in V.list_versions(p)] == [1, 2]
    # contract guards carry over from write_version
    with pytest.raises(ValueError, match="contract"):
        V.append_version(
            _frame(spark, [(9, "z", "en")]), p, payload_cols=["text"]
        )
    with pytest.raises(ValueError, match="id_col"):
        V.append_version(
            spark.createDataFrame(
                [(9, "z", "en")], "other_id long, text string, lang string"
            ),
            p,
            id_col="other_id",
        )


def test_stream_of_batches_equals_one_batch_commit(spark, tmp_path):
    """write_version_stream parity (r9 verdict #6): streaming N
    microbatches leaves the latest reconstruction identical to ONE batch
    write_version of the same rows, and compact_every folds a synthetic
    checkpoint while the stream runs."""
    import pandas as pd

    sdir = tmp_path / "incoming"
    sdir.mkdir()
    batches = [
        [(1, "a", "en"), (2, "b", "en")],
        [(3, "c", "de"), (4, "d", "fr")],
        [(5, "e", "en"), (6, "f", "de")],
    ]
    for i, rows in enumerate(batches):
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
            str(sdir / f"b{i}.parquet")
        )
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(sdir))
    )
    store = str(tmp_path / "store")
    q = V.write_version_stream(
        stream,
        store,
        id_col="doc_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
        compact_every=2,
    )
    q.awaitTermination(300)
    all_rows = [r for b in batches for r in b]
    batch_store = str(tmp_path / "batch_store")
    V.write_version(_frame(spark, all_rows), batch_store)
    assert _snap(V.read_version(spark, store)) == _snap(
        V.read_version(spark, batch_store)
    )
    versions = V.list_versions(store)
    assert len(versions) == 3  # one per non-empty microbatch
    # compact_every=2 folded a synthetic checkpoint at v2
    assert [m["checkpoint"] for m in versions] == [True, True, False]


def test_stream_intra_batch_duplicate_ids(spark, tmp_path):
    """Within ONE microbatch a duplicate id is ambiguous: by default the
    commit raises (loud failure, not an arbitrary winner); with seq_col
    the max-sequence row per id wins deterministically and seq_col is
    dropped from the committed payload (r10 review fix)."""
    import pandas as pd

    sdir = tmp_path / "incoming"
    sdir.mkdir()
    # one file -> one microbatch carrying doc_id=1 twice
    pd.DataFrame(
        [(1, "old", "en", 10), (1, "new", "en", 20), (2, "b", "en", 5)],
        columns=["doc_id", "text", "lang", "seq"],
    ).to_parquet(str(sdir / "b0.parquet"))

    def start(store, **kw):
        stream = spark.readStream.schema(
            "doc_id long, text string, lang string, seq long"
        ).parquet(str(sdir))
        return V.write_version_stream(
            stream,
            store,
            id_col="doc_id",
            checkpoint_dir=str(tmp_path / f"ckpt_{len(kw)}"),
            **kw,
        )

    # default: the ambiguous batch fails the query loudly
    q = start(str(tmp_path / "store_fail"))
    with pytest.raises(Exception, match="duplicate"):
        q.awaitTermination(120)
    # seq_col: last write (max seq) per id wins, seq dropped from payload
    start(str(tmp_path / "store_ok"), seq_col="seq").awaitTermination(120)
    got = _snap(V.read_version(spark, str(tmp_path / "store_ok")))
    assert got == {(1, "new", "en"), (2, "b", "en")}


# ------------------------------------------ r11: distribution drift gates


def _corpus(spark, n, length_mul=1, word="alpha"):
    return spark.createDataFrame(
        [(i, f"{word} " * (3 * length_mul) + f"doc {i}", 10 * length_mul)
         for i in range(n)],
        "doc_id long, text string, n_chars long",
    )


def test_write_version_max_psi_gate(spark, tmp_path):
    p = str(tmp_path / "psi")
    V.write_version(_corpus(spark, 60), p)
    shifted = _corpus(spark, 60, length_mul=5)
    with pytest.raises(ValueError, match=r"PSI\(n_chars\)"):
        V.write_version(shifted, p, max_psi={"n_chars": 0.1})
    # refusal leaves the store untouched
    assert [m["version"] for m in V.list_versions(p)] == [1]
    # a loose bound (or an un-shifted release) commits
    V.write_version(shifted, p, max_psi={"n_chars": 1e9})
    assert [m["version"] for m in V.list_versions(p)] == [1, 2]
    # steady distribution passes a tight bound
    V.write_version(
        _corpus(spark, 55, length_mul=5), p, max_psi={"n_chars": 0.1}
    )
    assert [m["version"] for m in V.list_versions(p)] == [1, 2, 3]


def test_write_version_max_js_gate(spark, tmp_path):
    p = str(tmp_path / "js")
    V.write_version(_corpus(spark, 50, word="alpha"), p)
    swapped = _corpus(spark, 50, word="omega")
    with pytest.raises(ValueError, match=r"JS\(text\)"):
        V.write_version(swapped, p, max_js=0.05)
    assert [m["version"] for m in V.list_versions(p)] == [1]
    V.write_version(swapped, p, max_js=10.0)
    assert [m["version"] for m in V.list_versions(p)] == [1, 2]
    # identical vocabulary passes a tight bound
    V.write_version(_corpus(spark, 52, word="omega"), p, max_js=0.05)
    assert len(V.list_versions(p)) == 3


def test_append_version_drift_gate_and_first_commit_noop(spark, tmp_path):
    p = str(tmp_path / "app")
    # first commit: gate is a no-op (nothing to drift from)
    V.append_version(_corpus(spark, 40), p, max_psi={"n_chars": 0.01})
    assert [m["version"] for m in V.list_versions(p)] == [1]
    # drifted batch refused, store untouched
    bad = spark.createDataFrame(
        [(1000 + i, "x", 500) for i in range(40)],
        "doc_id long, text string, n_chars long",
    )
    with pytest.raises(ValueError, match="PSI"):
        V.append_version(bad, p, max_psi={"n_chars": 0.1})
    assert [m["version"] for m in V.list_versions(p)] == [1]
    # in-distribution batch commits
    V.append_version(
        _corpus(spark, 45), p, max_psi={"n_chars": 0.1}
    )
    assert [m["version"] for m in V.list_versions(p)] == [1, 2]
