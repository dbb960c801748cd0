"""Distributed BPE: fit against an independent reference implementation,
greedy-apply vs sequential-rule equivalence, invertibility, artifacts.

The fit oracle is a from-scratch Counter-based trainer over the same
corpus pulled via pandas (different data path, different code), compared
merge-for-merge; the apply oracle applies the learned rules in fit order
(the subword-nmt algorithm) while the engine's encoder runs the greedy
lowest-rank loop — bit-equality pins the classic equivalence of the two.
"""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import tokenizer as tk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return tk.fit_bpe(docs, num_merges=60, max_fit_words=5000)


def _reference_fit(texts, num_merges, max_fit_words, min_pair_count=2):
    wc = Counter()
    for t in texts:
        if t:
            for w in t.split(" "):
                if w:
                    wc[w] += 1
    top = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:max_fit_words]
    vocab = {tuple(list(w) + [tk.END_OF_WORD]): c for w, c in top}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for s, c in vocab.items():
            for p in zip(s, s[1:]):
                pc[p] += c
        if not pc:
            break
        best, bc = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < min_pair_count:
            break
        merges.append(best)
        vocab = {
            tuple(_seq_merge_once(list(s), best)): c for s, c in vocab.items()
        }
    return merges


def _seq_merge_once(sym, pair):
    a, b = pair
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _seq_apply(word, merges):
    sym = list(word) + [tk.END_OF_WORD]
    for pair in merges:
        sym = _seq_merge_once(sym, pair)
    return sym


def test_fit_matches_independent_reference(docs, model):
    texts = [r["text"] for r in docs.select("text").collect()]
    ref = _reference_fit(texts, 60, 5000)
    assert list(model.merges) == ref


def test_fit_deterministic(docs, model):
    again = tk.fit_bpe(docs, num_merges=60, max_fit_words=5000)
    assert again.merges == model.merges


def test_greedy_apply_equals_sequential_rules(docs, model):
    rows = tk.bpe_pieces(docs.limit(300), model).select(
        "text", "pieces"
    ).collect()
    assert rows
    for r in rows:
        exp = [
            p
            for w in (r["text"] or "").split(" ")
            if w
            for p in _seq_apply(w, model.merges)
        ]
        assert list(r["pieces"]) == exp


def test_pieces_invertible_and_null_passthrough(spark, model):
    df = spark.createDataFrame(
        [(1, "the merger remerged"), (2, None), (3, ""), (4, "  a  b ")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r["pieces"]
        for r in tk.bpe_pieces(df, model).collect()
    }
    joined = "".join(rows[1]).replace(tk.END_OF_WORD, " ").strip()
    assert joined == "the merger remerged"
    assert rows[2] is None
    assert rows[3] == []  # empty text → zero pieces, not NULL
    # repeated separators collapse: only real words are encoded
    assert "".join(rows[4]).replace(tk.END_OF_WORD, " ").split() == ["a", "b"]


def test_token_count_matches_pieces(docs, model):
    out = (
        tk.bpe_token_count(tk.bpe_pieces(docs.limit(50), model), model)
        .select(F.size("pieces").alias("n"), "n_bpe_tokens")
        .collect()
    )
    assert all(r["n"] == r["n_bpe_tokens"] for r in out)


def test_fit_vocab_cut_warns(docs):
    with pytest.warns(UserWarning, match="vocabulary cut"):
        tk.fit_bpe(docs.limit(100), num_merges=5, max_fit_words=10)


def test_fit_min_pair_count_stops_early(spark):
    df = spark.createDataFrame(
        [(1, "ab ab ab cd")], "doc_id bigint, text string"
    )
    m = tk.fit_bpe(df, num_merges=50, max_fit_words=100, min_pair_count=2)
    # only pairs inside "ab" recur ≥2 (weighted by word count); "cd"
    # appears once — the loop stops well short of 50 rules
    assert 0 < len(m.merges) < 50


def test_artifact_round_trip(spark, docs, model, tmp_path):
    path = str(tmp_path / "bpe")
    tk.save_bpe(model, spark, path)
    loaded = tk.load_bpe(spark, path)
    assert loaded == model
    a = tk.bpe_pieces(docs.limit(40), model).select("pieces").collect()
    b = tk.bpe_pieces(docs.limit(40), loaded).select("pieces").collect()
    assert [r["pieces"] for r in a] == [r["pieces"] for r in b]


def test_load_rejects_foreign_parquet(spark, tmp_path):
    p = str(tmp_path / "not_bpe")
    spark.range(3).withColumn("rank", F.col("id").cast("int")).write.parquet(p)
    with pytest.raises(ValueError, match="not a save_bpe artifact"):
        tk.load_bpe(spark, p)


def test_pack_sequences_by_bpe_counts(docs, model):
    """pack_sequences(n_tokens_col=...) packs by the tokenizer-true
    counts: offsets/seq ids derive from the BPE column, not whitespace."""
    from mongo_arrow_spark.operators import packing

    counted = tk.bpe_token_count(docs.limit(100), model)
    packed = packing.pack_sequences(
        counted, seq_len=256, n_streams=4, n_tokens_col="n_bpe_tokens"
    )
    joined = packed.join(
        counted.select("doc_id", "n_bpe_tokens"), "doc_id"
    )
    assert joined.filter("n_tokens != n_bpe_tokens").count() == 0
    assert packed.filter("seq_offset < 0 or seq_offset >= 256").count() == 0
