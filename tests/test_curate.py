"""curate(): the composed corpus pipeline.

The end-to-end hash oracle lives in the battery (curate_corpus). These
tests pin the stage semantics the oracle can't see: toggles, chunk-path
provenance, funnel report, and the subset/monotonicity relations between
stages.
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.curate import curate, curation_report
from mongo_arrow_spark.operators.quality import gopher_quality_flags


@pytest.fixture(scope="module")
def docs(tables):
    return tables["documents"].select("doc_id", "text")


def test_quality_gate_applied(spark, docs):
    out = curate(docs, jaccard_threshold=None, redact_pii=False)
    flags = gopher_quality_flags(docs, "text", min_tokens=20)
    n_pass = flags.filter("q_keep").count()
    assert 0 < out.count() <= n_pass


def test_fuzzy_stage_only_removes(docs):
    no_fuzzy = curate(docs, jaccard_threshold=None)
    fuzzy = curate(docs, jaccard_threshold=0.3, max_df=100)
    assert fuzzy.count() <= no_fuzzy.count()
    # fuzzy survivors are a subset of the exact-dedup output
    extra = fuzzy.select("doc_id").exceptAll(no_fuzzy.select("doc_id"))
    assert extra.count() == 0


def test_decontaminate_drops_near_matches(docs):
    holdout = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    plain = curate(corpus, jaccard_threshold=None)
    decon = curate(
        corpus, holdout, jaccard_threshold=None, decontaminate_threshold=0.5
    )
    assert decon.count() <= plain.count()


def test_split_column_and_proportions(docs):
    out = curate(docs, jaccard_threshold=None, train=0.5, val=0.25)
    counts = dict(out.groupBy("split").count().collect())
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / total == pytest.approx(0.5, abs=0.1)


def test_chunk_path_carries_split(docs):
    out = curate(
        docs, jaccard_threshold=None, chunk_size=16, stride=16
    )
    assert {"doc_id", "chunk_id", "chunk_text", "n_chunk_tokens", "split"} <= set(
        out.columns
    )
    # every chunk's doc carries exactly one split value
    assert (
        out.groupBy("doc_id")
        .agg(F.countDistinct("split").alias("k"))
        .filter("k > 1")
        .count()
        == 0
    )
    assert out.agg(F.max("n_chunk_tokens")).first()[0] <= 16


def test_pii_redaction_toggle(spark):
    df = spark.createDataFrame(
        [(1, "a" * 30 + " contact me at bob@example.com please " + "b" * 30)],
        "doc_id bigint, text string",
    )
    red = curate(
        df,
        jaccard_threshold=None,
        min_tokens=1,
        max_symbol_word_ratio=1.0,
        max_mean_word_len=100.0,
    )
    raw = curate(
        df,
        jaccard_threshold=None,
        min_tokens=1,
        max_symbol_word_ratio=1.0,
        max_mean_word_len=100.0,
        redact_pii=False,
    )
    assert "[PII]" in red.first()["text"]
    assert "bob@example.com" in raw.first()["text"]


def test_curation_report_funnel(docs):
    out = curate(docs, jaccard_threshold=None)
    rep = curation_report(docs, out).first()
    assert rep["n_input"] == docs.count()
    assert rep["n_output"] == out.count() == rep["n_docs"]
    assert rep["n_train"] + rep["n_val"] + rep["n_test"] == rep["n_output"]


def test_strip_spans_stage_shrinks_or_keeps_text(docs):
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    stripped = curate(
        docs, jaccard_threshold=None, redact_pii=False, strip_spans_k=5
    )
    assert stripped.count() == base.count()  # strips text, never drops rows
    import pyspark.sql.functions as F

    joined = (
        base.select("doc_id", F.length("text").alias("a"))
        .join(stripped.select("doc_id", F.length("text").alias("b")), "doc_id")
    )
    assert joined.filter(F.col("b") > F.col("a")).count() == 0
    assert joined.filter(F.col("b") < F.col("a")).count() > 0


def test_semantic_stage_drops_only_embedded_dupes(tables, docs):
    emb = tables["embeddings"]
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    sem = curate(
        docs,
        jaccard_threshold=None,
        redact_pii=False,
        embeddings=emb,
        semantic_threshold=0.2,
        semantic_bits=6,
    )
    assert 0 < sem.count() < base.count()
    # docs with no embedding row must pass through untouched
    import pyspark.sql.functions as F

    no_emb = base.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_anti"
    )
    if no_emb.count():
        assert (
            no_emb.join(sem.select("doc_id"), "doc_id", "left_semi").count()
            == no_emb.count()
        )


def test_pack_stage_assigns_every_row(docs):
    out = curate(
        docs, jaccard_threshold=None, redact_pii=False, pack_seq_len=128
    )
    assert {"stream", "seq_id", "seq_offset"} <= set(out.columns)
    assert out.filter("seq_offset < 0 or seq_offset >= 128").count() == 0


def test_pack_after_chunking_packs_chunks(docs):
    out = curate(
        docs,
        jaccard_threshold=None,
        redact_pii=False,
        chunk_size=64,
        stride=64,
        pack_seq_len=128,
    )
    assert {"chunk_id", "stream", "seq_id", "seq_offset"} <= set(out.columns)
    # every chunk row got exactly one packing assignment
    base = curate(
        docs, jaccard_threshold=None, redact_pii=False, chunk_size=64, stride=64
    )
    assert out.count() == base.count()


def test_quality_filter_threshold(docs):
    from mongo_arrow_spark.operators.quality import quality_filter, quality_score

    import pyspark.sql.functions as F

    scored = quality_score(docs)
    kept = quality_filter(docs, threshold=0.5)
    expected = scored.filter(F.col("q_score") >= 0.5).count()
    assert kept.count() == expected


def test_curate_stream_matches_batch_projection_stages(spark, tmp_path, docs):
    """Streaming curate == batch curate restricted to the streaming-safe
    stages (quality gate, exact dedup, redact, split) on a finite replay."""
    import json as _json

    from mongo_arrow_spark.operators.curate import curate_stream
    from mongo_arrow_spark.streaming import read_document_stream

    d = tmp_path / "docs_stream"
    d.mkdir()
    rows = docs.collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(d / f"batch-{i}.jsonl", "w") as fh:
            for r in chunk:
                fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    stream = read_document_stream(spark, str(d), "doc_id bigint, text string")
    out = curate_stream(stream, ts_col=None)
    import uuid as _uuid

    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {name}")

    want = curate(docs, jaccard_threshold=None)  # batch, same stages
    assert got.count() == want.count()
    j = got.select("doc_id", F.col("text").alias("a"), F.col("split").alias("sa")).join(
        want.select("doc_id", F.col("text").alias("b"), F.col("split").alias("sb")),
        "doc_id",
    )
    assert j.filter((F.col("a") != F.col("b")) | (F.col("sa") != F.col("sb"))).count() == 0


def test_curate_every_stage_composes(tables, docs):
    """All optional stages on at once: fuzzy dedup + span strip + semantic
    dedup + decontamination + redact + chunk + pack in one lazy program."""
    holdout = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    out = curate(
        corpus,
        holdout=holdout,
        jaccard_threshold=0.3,
        max_df=100,
        strip_spans_k=6,
        embeddings=tables["embeddings"],
        semantic_threshold=0.2,
        semantic_bits=6,
        chunk_size=64,
        stride=64,
        pack_seq_len=128,
        pack_streams=4,
    )
    rows = out.count()
    assert rows > 0
    assert {"doc_id", "chunk_id", "chunk_text", "split", "stream", "seq_id",
            "seq_offset"} <= set(out.columns)
    # chunks pack tightly: offsets in range, streams within bound
    assert out.filter("seq_offset < 0 or seq_offset >= 128").count() == 0
    assert out.filter("stream < 0 or stream >= 4").count() == 0


def test_boilerplate_stage_in_curate(spark):
    banner = "subscribe to our newsletter today friends"
    rows = [
        (i, f"real document body number {i} with plenty of words here\n{banner}")
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate(
        df, jaccard_threshold=None, redact_pii=False, boilerplate_min_df=3,
        min_tokens=5,
    )
    assert out.count() == 5
    assert out.filter(F.col("text").contains(banner)).count() == 0


def test_curate_bloom_gate_batch(spark, docs):
    """Stage 2b: docs whose payload exists in the standing corpus are
    dropped; genuinely novel docs survive."""
    from mongo_arrow_spark.operators.membership import build_bloom_index

    standing = docs.filter(F.col("doc_id") % 3 == 0)
    index = build_bloom_index(standing, "text", num_bits=1 << 20)
    out = curate(
        docs,
        jaccard_threshold=None,
        redact_pii=False,
        bloom_index=index,
        bloom_num_bits=1 << 20,
    )
    # nothing surviving may carry a standing-corpus payload (no FNs)
    leaked = out.join(standing.select("text"), "text", "left_semi").count()
    assert leaked == 0
    # docs not in the standing corpus mostly survive (quality gate aside)
    assert out.count() > 0


def test_curate_stream_bloom_gate(spark, tmp_path, docs):
    """Streaming stage 2b (stream-static row-wise probe): the replayed
    stream drops standing-corpus payloads, keeps novel ones."""
    import json as _json
    import uuid as _uuid

    from mongo_arrow_spark.operators.curate import curate_stream
    from mongo_arrow_spark.operators.membership import build_bloom_index
    from mongo_arrow_spark.streaming import read_document_stream

    standing = docs.filter(F.col("doc_id") % 3 == 0)
    index = build_bloom_index(standing, "text", num_bits=1 << 20)

    d = tmp_path / "docs_stream_bloom"
    d.mkdir()
    with open(d / "batch-0.jsonl", "w") as fh:
        for r in docs.limit(200).collect():
            fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    stream = read_document_stream(spark, str(d), "doc_id bigint, text string")
    out = curate_stream(
        stream,
        ts_col=None,
        redact_pii=False,
        bloom_index=index,
        bloom_num_bits=1 << 20,
    )
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(f"SELECT * FROM {name}")
    leaked = got.join(standing.select("text"), "text", "left_semi").count()
    assert leaked == 0
    assert got.count() > 0


def test_nb_gate_stage_toggles_and_passthrough(spark, docs):
    """r8: the NB classifier gate is a pure filter — output columns ==
    input columns, survivors a subset, gate off == identity."""
    from mongo_arrow_spark.operators import quality

    labeled = docs.withColumn("pos", F.col("doc_id") % 2 == 0)
    model = quality.fit_token_logodds(labeled, "pos")
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    gated = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        nb_model=model, nb_min_logodds=0.0,
    )
    assert gated.columns == base.columns
    assert 0 < gated.count() < base.count()
    extra = gated.select("doc_id").exceptAll(base.select("doc_id"))
    assert extra.count() == 0


def test_dsir_stage_selects_k_and_passthrough(spark, docs):
    """r8: DSIR selection inside curate() draws exactly k rows from the
    cleaned pool under a prefit model, deterministic across runs, and is
    pass-through on columns (log_importance dropped)."""
    from mongo_arrow_spark.operators import quality

    target = docs.filter(F.col("doc_id") % 3 == 0)
    model = quality.fit_bucket_ratios(docs, target, buckets=256)
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    picked = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        dsir_model=model, dsir_k=25,
    )
    assert picked.columns == base.columns
    assert picked.count() == 25
    again = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        dsir_model=model, dsir_k=25,
    )
    a = {r["doc_id"] for r in picked.select("doc_id").collect()}
    b = {r["doc_id"] for r in again.select("doc_id").collect()}
    assert a == b  # seeded Gumbel-top-k: same draw every run


def test_dsir_model_without_k_raises(spark, docs):
    from mongo_arrow_spark.operators import quality

    model = quality.fit_bucket_ratios(docs, docs.limit(5), buckets=64)
    with pytest.raises(ValueError, match="dsir_k"):
        curate(docs, jaccard_threshold=None, dsir_model=model)


def test_every_stage_composes_with_selection_models(tables, docs):
    """The r8 composability superset: all prior stages PLUS the NB gate
    and DSIR selection in one lazy program."""
    from mongo_arrow_spark.operators import quality

    holdout = docs.filter(F.col("doc_id") % 17 == 0)
    corpus = docs.filter(F.col("doc_id") % 17 != 0)
    labeled = corpus.withColumn("pos", F.col("doc_id") % 2 == 0)
    nb = quality.fit_token_logodds(labeled, "pos")
    dsir = quality.fit_bucket_ratios(corpus, corpus.limit(50), buckets=256)
    out = curate(
        corpus,
        holdout=holdout,
        jaccard_threshold=0.3,
        strip_spans_k=6,
        embeddings=tables["embeddings"],
        semantic_threshold=0.2,
        semantic_bits=6,
        nb_model=nb,
        nb_min_logodds=-10.0,
        dsir_model=dsir,
        dsir_k=40,
        chunk_size=64,
        stride=64,
        pack_seq_len=128,
        pack_streams=4,
    )
    rows = out.count()
    assert rows > 0
    assert {"doc_id", "chunk_id", "chunk_text", "split", "stream", "seq_id",
            "seq_offset"} <= set(out.columns)


def test_select_with_models_streaming_parity(spark, tmp_path, docs):
    """r8 streaming parity for the scorers: curate_stream +
    select_with_models in foreachBatch over a ONE-batch finite replay
    equals the batch path with the same prefit models (per-micro-batch
    top-k == global top-k exactly when the replay is one batch)."""
    import json as _json
    import uuid as _uuid

    from mongo_arrow_spark.operators import quality
    from mongo_arrow_spark.operators.curate import (
        curate_stream,
        select_with_models,
    )
    from mongo_arrow_spark.streaming import read_document_stream

    labeled = docs.withColumn("pos", F.col("doc_id") % 2 == 0)
    nb = quality.fit_token_logodds(labeled, "pos")
    dsir = quality.fit_bucket_ratios(
        docs, docs.filter(F.col("doc_id") % 3 == 0), buckets=256
    )

    d = tmp_path / "docs_stream_models"
    d.mkdir()
    with open(d / "batch-0.jsonl", "w") as fh:
        for r in docs.collect():
            fh.write(
                _json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n"
            )

    stream = read_document_stream(spark, str(d), "doc_id bigint, text string")
    gated_stream = curate_stream(stream, ts_col=None)
    name = f"t_{_uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {name} (doc_id bigint, text string, split string) "
        "USING parquet"
    )

    def sink(batch_df, _bid):
        select_with_models(
            batch_df, nb_model=nb, nb_min_logodds=0.0,
            dsir_model=dsir, dsir_k=20,
        ).write.insertInto(name)

    q = (
        gated_stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name).collect()

    from mongo_arrow_spark.operators.curate import curate

    want = select_with_models(
        curate(docs, jaccard_threshold=None),
        nb_model=nb, nb_min_logodds=0.0, dsir_model=dsir, dsir_k=20,
    ).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)
    spark.sql(f"DROP TABLE {name}")


def test_select_with_models_ensemble_stage_batch_local(spark, docs):
    """r10: the rank-fusion ensemble stage in select_with_models —
    pass-through columns, equality with a direct ensemble_rank top-n on
    the same frame, and the DOCUMENTED batch-local semantics: per-batch
    winners are ranked within their batch, so the union of two batches'
    top-n differs from the global top-2n when the batches are skewed."""
    from mongo_arrow_spark.operators.curate import select_with_models
    from mongo_arrow_spark.operators.selection import ensemble_rank

    scored = docs.select(
        "doc_id",
        "text",
        F.length("text").cast("long").alias("s_len"),
        (F.col("doc_id") % 17).cast("long").alias("s_mod"),
    )
    out = select_with_models(
        scored, ensemble_cols=["s_len", "s_mod"], ensemble_top_n=25
    )
    assert out.columns == scored.columns  # pass-through contract
    want = {
        r["doc_id"]
        for r in ensemble_rank(scored, ["s_len", "s_mod"])
        .filter(F.col("ens_rank") <= 25)
        .collect()
    }
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == want
    # batch-local: a skewed split ranks within each batch — the union
    # of per-batch top-25s is NOT the global top-50
    b1 = scored.filter(F.col("s_len") >= 200)  # long docs batch
    b2 = scored.filter(F.col("s_len") < 200)
    per_batch = set()
    for b in (b1, b2):
        per_batch |= {
            r["doc_id"]
            for r in select_with_models(
                b, ensemble_cols=["s_len", "s_mod"], ensemble_top_n=25
            ).select("doc_id").collect()
        }
    global_50 = {
        r["doc_id"]
        for r in ensemble_rank(scored, ["s_len", "s_mod"])
        .filter(F.col("ens_rank") <= 50)
        .collect()
    }
    assert per_batch != global_50  # documented divergence, by design


def test_ingest_gate_all_stages(spark, docs):
    """r8 ingest_gate: standing Bloom + LSH artifacts plus prefit models
    guard an incoming batch; the corpus never re-joins; accepted rows
    pass every individual gate; the LSH index grows by the accepted."""
    from mongo_arrow_spark.operators import dedup, membership, quality
    from mongo_arrow_spark.operators.curate import ingest_gate

    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    bloom = membership.build_bloom_index(corpus, key_col="text",
                                         num_bits=1 << 20)
    lsh = dedup.build_lsh_index(corpus, "doc_id", "text").cache()
    nb = quality.fit_token_logodds(
        docs.withColumn("pos", F.col("doc_id") % 3 == 0), "pos"
    )
    accepted, updated, _pars = ingest_gate(
        batch,
        bloom_index=bloom,
        bloom_num_bits=1 << 20,
        lsh_index=lsh,
        neardup_threshold=0.3,
        nb_model=nb,
        nb_min_logodds=-100.0,  # permissive: gate mechanics, not tuning
    )
    n_acc = accepted.count()
    assert 0 < n_acc < batch.count()
    assert accepted.columns == batch.columns  # pass-through contract
    # every accepted doc independently clears the near-dup probe
    again = dedup.probe_neardup(accepted, lsh, threshold=0.3)
    assert again.filter("neardup").count() == 0
    # the returned index holds corpus + accepted signatures
    assert updated.count() == lsh.count() + n_acc


def test_ingest_gate_no_artifacts_is_exact_dedup_plus_quality(spark, docs):
    from mongo_arrow_spark.operators import dedup
    from mongo_arrow_spark.operators.curate import ingest_gate

    batch = docs.limit(100)
    accepted, updated, updated_pars = ingest_gate(batch)
    assert updated is None and updated_pars is None
    want = dedup.exact_dedup(
        curate(batch, jaccard_threshold=None, redact_pii=False)
        .drop("split"),
        "doc_id", "text",
    )
    assert accepted.count() == want.count()


def test_lm_tier_stage_keeps_fractions_and_passthrough(spark, docs):
    """r8: the CCNet perplexity-tier stage drops the tail tier
    (batch-relative terciles), passes columns through, and keeps ~2/3
    of rows with the default keep set."""
    from mongo_arrow_spark.operators import text as text_ops

    from mongo_arrow_spark.operators.curate import curate

    lm = text_ops.fit_ngram_lm(docs, vocab_size=500, bigram_size=1000)
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    tiered = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        lm_model=lm, lm_exact=True,
    )
    assert tiered.columns == base.columns
    n_base, n_tiered = base.count(), tiered.count()
    assert 0 < n_tiered < n_base
    assert abs(n_tiered - 2 * n_base / 3) <= max(3, 0.05 * n_base)
    extra = tiered.select("doc_id").exceptAll(base.select("doc_id"))
    assert extra.count() == 0
    lm.unpersist()


def test_score_ngram_lm_zero_token_doc_kept(spark):
    from mongo_arrow_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string",
    )
    lm = text_ops.fit_ngram_lm(docs, vocab_size=10, bigram_size=10)
    batch = spark.createDataFrame(
        [(3, "alpha beta"), (4, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_tokens"], r["logprob"])
           for r in text_ops.score_ngram_lm(batch, lm).collect()}
    assert got[4] == (0, lm.oov_lp)
    assert got[3][0] == 2
    lm.unpersist()


def test_cap_stage_bounds_groups_and_passthrough(spark, docs):
    """r8 per-group cap stage: with a tiny cap every lang bucket holds at
    most cap_n survivors; cap off → stage is the identity (same rows)."""
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    # group by a real column: re-attach lang from the source table
    src = docs.sparkSession.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    capped = curate(
        docs.join(src, "doc_id").select("doc_id", "text", "lang"),
        jaccard_threshold=None,
        redact_pii=False,
        cap_group_col="lang",
        cap_n=3,
    )
    per_group = capped.groupBy("lang").count().collect()
    assert per_group and all(r["count"] <= 3 for r in per_group)
    # survivors are a subset of the uncapped pipeline's
    assert capped.count() <= base.count()


def test_token_budget_stage_respects_budget(spark, docs):
    """r8 budget stage: the curated corpus's exact whitespace-token total
    stays within the budget, and the stage only removes rows."""
    base = curate(docs, jaccard_threshold=None, redact_pii=False)
    budget = 5_000
    cut = curate(
        docs,
        jaccard_threshold=None,
        redact_pii=False,
        token_budget=budget,
    )
    total = cut.select(
        F.sum(F.size(F.split("text", " ", -1))).alias("t")
    ).first()["t"]
    assert total is not None and total <= budget
    assert 0 < cut.count() < base.count()
    assert set(cut.columns) == set(base.columns)  # helpers dropped


def test_cap_and_budget_compose_with_all_stages(tables, docs):
    """Caps + budget slot into the full composed pipeline."""
    holdout = docs.filter(F.col("doc_id") % 17 == 0)
    src = docs.sparkSession.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    corpus = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .join(src, "doc_id")
        .select("doc_id", "text", "lang")
    )
    out = curate(
        corpus,
        holdout=holdout,
        jaccard_threshold=0.3,
        cap_group_col="lang",
        cap_n=50,
        token_budget=20_000,
        chunk_size=64,
        stride=64,
    )
    assert out.count() > 0
    assert {"doc_id", "chunk_id", "split"} <= set(out.columns)


def test_paragraph_dedup_stage_in_curate(spark):
    shared = "this shared paragraph appears in every single document body"
    rows = [
        (
            i,
            f"unique opening line for document number {i} right here\n\n"
            f"{shared}\n\n"
            f"unique closing line for document number {i} as well",
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = curate(
        df,
        jaccard_threshold=None,
        redact_pii=False,
        paragraph_dedup=True,
        min_tokens=5,
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {0, 1, 2, 3}
    # the shared paragraph survives only in the min-id document
    assert sum(shared in t for t in got.values()) == 1
    assert shared in got[0]
    # off by default: stage is a no-op unless asked for
    out2 = curate(
        df, jaccard_threshold=None, redact_pii=False, min_tokens=5
    )
    assert all(
        shared in r["text"] for r in out2.collect()
    ), "paragraph_dedup must default off"


def test_semantic_stage_with_kmeans_model(tables, docs):
    """Deterministic k-means cells slot into curate()'s semantic stage."""
    from mongo_arrow_spark.operators.clustering import kmeans_fit

    emb = tables["embeddings"]
    m = kmeans_fit(emb, k=4, iters=1)
    base = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        embeddings=emb, semantic_threshold=0.2,
    )
    km = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        embeddings=emb, semantic_threshold=0.2, semantic_kmeans_model=m,
    )
    n_nosem = curate(docs, jaccard_threshold=None, redact_pii=False).count()
    n_base, n_km = base.count(), km.count()
    assert n_km > 0
    # both variants actually prune relative to the no-semantic pipeline;
    # the cell geometry differs, so survivors needn't be equal
    assert n_base < n_nosem and n_km < n_nosem
    # determinism: re-running with the same model gives identical ids
    km2 = curate(
        docs, jaccard_threshold=None, redact_pii=False,
        embeddings=emb, semantic_threshold=0.2, semantic_kmeans_model=m,
    )
    assert {r["doc_id"] for r in km.select("doc_id").collect()} == {
        r["doc_id"] for r in km2.select("doc_id").collect()
    }


def test_mix_stage_downsample_and_upsample(spark, docs):
    src = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang")
    corpus = docs.join(src, "doc_id").select("doc_id", "text", "lang")
    base = curate(corpus, jaccard_threshold=None, redact_pii=False)
    n_base = base.count()

    down = curate(
        corpus, jaccard_threshold=None, redact_pii=False,
        mix_weights={"en": 0.5, "de": 0.5}, mix_key="lang",
    )
    langs = {r["lang"] for r in down.select("lang").distinct().collect()}
    assert langs <= {"en", "de"}  # unweighted domains dropped
    assert down.count() <= n_base

    up = curate(
        corpus, jaccard_threshold=None, redact_pii=False,
        mix_weights={"en": 1.0, "de": 1.0}, mix_key="lang",
        mix_mode="upsample", mix_total=512,
    )
    got = {
        r["lang"]: r["n"]
        for r in up.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == {"en": 256, "de": 256}
    assert "epoch" in up.columns and "split" in up.columns

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mix_total"):
        curate(
            corpus, jaccard_threshold=None, redact_pii=False,
            mix_weights={"en": 1.0}, mix_key="lang", mix_mode="upsample",
        )
    with _pytest.raises(ValueError, match="mix_mode"):
        curate(
            corpus, jaccard_threshold=None, redact_pii=False,
            mix_weights={"en": 1.0}, mix_key="lang", mix_mode="nope",
        )


def test_audit_stage_counts(docs):
    """Opt-in audit (r8 session 3): per-stage survivor counts land in
    the caller's dict, monotone non-increasing through the filtering
    stages, and the audited run returns the identical corpus."""
    audit = {}
    plain = curate(docs, jaccard_threshold=0.3, redact_pii=False)
    audited = curate(docs, jaccard_threshold=0.3, redact_pii=False,
                     audit=audit)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, audited.collect())
    )
    assert list(audit) == ["input", "quality_gate", "exact_dedup",
                           "fuzzy_dedup"]
    counts = list(audit.values())
    assert counts == sorted(counts, reverse=True)
    assert audit["fuzzy_dedup"] == plain.count()
    # stages that didn't run leave no key
    assert "bloom_gate" not in audit and "chunk" not in audit


def test_audit_covers_optional_stages(docs):
    audit = {}
    curate(
        docs,
        jaccard_threshold=None,
        cap_group_col=None,
        token_budget=5000,
        chunk_size=64,
        redact_pii=False,
        audit=audit,
    ).count()
    assert list(audit) == ["input", "quality_gate", "exact_dedup",
                           "token_budget", "chunk"]


def test_ingest_gate_paragraph_stage_batchwise_equals_global(spark):
    """r8 verdict item #5: the standing paragraph index behind the one
    ingest_gate call — batch-by-batch gating + returned-index updates
    equals one global dedup_paragraphs when batches arrive in id order
    (the test_paragraph_dedup equivalence, composed through the door),
    and the index grows by exactly the admitted digests."""
    from mongo_arrow_spark.operators.curate import ingest_gate
    from mongo_arrow_spark.operators.dedup import (
        build_paragraph_index,
        dedup_paragraphs,
    )

    rows = [
        (1, "aa bb\n\nshared one\n\nuniq c1"),
        (2, "shared one\n\ndd ee"),
        (3, "ff gg\n\nshared two\n\nuniq c3"),
        (4, "shared two\n\nshared one\n\nuniq c4"),
        (5, "shared one\n\nuniq c5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        (r["doc_id"], r["text"]) for r in dedup_paragraphs(df).collect()
    }

    idx = build_paragraph_index(df.limit(0))  # empty standing index
    got = set()
    for lo, hi in ((1, 2), (3, 5)):
        batch = df.filter(F.col("doc_id").between(lo, hi))
        before = {r["digest"] for r in idx.collect()}
        accepted, _lsh, idx = ingest_gate(
            batch, paragraph_index=idx, min_tokens=None
        )
        got |= {(r["doc_id"], r["text"]) for r in accepted.collect()}
        # the index grows by EXACTLY the admitted (cleaned) paragraphs'
        # digests — recording pre-strip text would add extra digests
        admitted = {
            r["digest"] for r in build_paragraph_index(accepted).collect()
        }
        assert {r["digest"] for r in idx.collect()} == before | admitted
    assert got == want
    # the final index holds every distinct paragraph of the corpus
    assert idx.count() == build_paragraph_index(df).count()


def test_curate_ensemble_stage(spark):
    """curate(ensemble_cols=) fuses signal columns and keeps the top-n
    by Borda rank; disabled by default (None) the output is unchanged —
    the stage-toggle composability contract."""
    rows = [
        (i, " ".join(["the word"] * (20 + i)), 100 + i, "en", "s")
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long, lang string, source string"
    )
    base = curate(df, redact_pii=False, jaccard_threshold=None)
    out = curate(
        df,
        redact_pii=False,
        jaccard_threshold=None,
        ensemble_cols=["n_chars"],
        ensemble_top_n=5,
    )
    assert out.count() == 5
    # top-5 by the single signal = the 5 largest n_chars survivors
    want = sorted(
        (r["n_chars"] for r in base.collect()), reverse=True
    )[:5]
    assert sorted((r["n_chars"] for r in out.collect()), reverse=True) == want
    # columns unchanged (rank scaffolding dropped)
    assert set(out.columns) == set(base.columns)


def test_ngram_novelty_contract(spark):
    """Zero-gram docs (short / NULL text) are kept with NULL novelty;
    counts are exact on a hand-computable corpus."""
    from mongo_arrow_spark.operators.text import ngram_novelty

    ref = spark.createDataFrame(
        [(100, "a b c d")], "doc_id long, text string"
    )  # reference trigrams: {a b c, b c d}
    docs = spark.createDataFrame(
        [
            (1, "a b c x"),   # trigrams {a b c, b c x}: 1 unseen
            (2, "a b"),       # too short: 0 grams, NULL novelty
            (3, None),        # NULL text: 0 grams, NULL novelty
            (4, "p q r"),     # {p q r}: fully novel
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_unseen"], r["novelty"])
        for r in ngram_novelty(docs, ref, n=3).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (0, 0, None),
        3: (0, 0, None),
        4: (1, 1, 1.0),
    }


def test_curate_url_tier_runs_first(spark):
    """url_col engages the URL tier before any text-side stage: messy
    refetch variants collapse on the canonical URL, the per-domain cap
    bounds source dominance, and the audit shows both stages."""
    rows = []
    for i in range(12):
        rows.append(
            (i, "good text with enough plain words to pass the gate "
                "and some more filler words here " + str(i),
             f"https://www.site{i % 2}.com/p/{i}")
        )
    # messy refetches of the first 4 docs: same canonical URL
    for i in range(4):
        rows.append(
            (100 + i, "refetched body text that is entirely different",
             f"HTTPS://WWW.Site{i % 2}.COM:443/p/{i}?utm_source=x")
        )
    df = spark.createDataFrame(rows, "doc_id long, text string, url string")
    audit: dict = {}
    out = curate(
        df,
        url_col="url",
        url_domain_cap_n=4,
        jaccard_threshold=None,
        redact_pii=False,
        min_tokens=3,
        audit=audit,
    )
    assert audit["input"] == 16
    assert audit["url_dedup"] == 12  # the 4 refetches died on URL alone
    assert audit["url_domain_cap"] == 8  # 2 domains x 4
    kept = {r["doc_id"] for r in out.collect()}
    assert kept <= set(range(12)) and len(kept) == 8


def test_lang_id_col_and_per_language_lm_tiers(spark):
    """r12: curate(lang_id_col=) attaches the trigram lang-ID after the
    URL tier, and lm_by= keys the CCNet perplexity terciles PER
    LANGUAGE. Survivors must equal a manual replay (identify_language →
    score_ngram_lm → perplexity_buckets(by=lang) → lm_keep filter)."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.operators.curate import curate
    from mongo_arrow_spark.operators.langid import identify_language
    from mongo_arrow_spark.operators import text as text_ops

    en = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a quiet library near the river stays open late on weekends",
        "children like to play in the park after school with friends",
        "we went to the market to buy fresh bread and sweet fruit",
        "the old clock on the wall strikes twelve every single night",
        "students read many books because they want to learn history",
    ]
    fr = [
        "les enfants aiment jouer au parc après l'école avec leurs amis",
        "nous sommes allés au marché pour acheter du pain frais",
        "le soleil se lève le matin au-dessus des hautes montagnes",
        "elle veut étudier à l'université l'année prochaine à paris",
        "pendant les vacances nous visitons souvent de petits villages",
        "les étudiants lisent beaucoup de livres pour mieux comprendre",
    ]
    rows = [(i, t) for i, t in enumerate(en + fr)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = text_ops.fit_ngram_lm(df, text_col="text")
    try:
        out = curate(
            df,
            min_tokens=3,
            jaccard_threshold=None,
            decontaminate_threshold=None,
            redact_pii=False,
            lang_id_col="lang_pred",
            lm_model=lm,
            lm_by="lang_pred",
            lm_keep=("middle", "head"),
            lm_exact=True,
        )
        got = sorted(r["doc_id"] for r in out.collect())
        # manual replay
        tagged = df.join(
            identify_language(df, "text", id_col="doc_id",
                              out_col="lang_pred"),
            "doc_id",
        )
        scored = text_ops.score_ngram_lm(tagged, lm).join(
            tagged.select("doc_id", "lang_pred"), "doc_id"
        )
        tiers = text_ops.perplexity_buckets(
            scored, score_col="logprob", by="lang_pred", exact=True
        )
        want = sorted(
            r["doc_id"]
            for r in tiers.filter(
                F.col("ppl_bucket").isin(["middle", "head"])
            ).collect()
        )
        assert got == want and 0 < len(got) < len(rows)
        # the lang column rides the output frame
        langs = {r["lang_pred"] for r in out.select("lang_pred").collect()}
        assert langs == {"en", "fr"}
        # per-language tiers differ from the global cut for at least
        # one document (the point of lm_by)
        gtiers = text_ops.perplexity_buckets(
            scored, score_col="logprob", exact=True
        )
        gwant = sorted(
            r["doc_id"]
            for r in gtiers.filter(
                F.col("ppl_bucket").isin(["middle", "head"])
            ).collect()
        )
        if gwant == want:
            import pytest as _pytest

            _pytest.skip("fixture produced identical global/per-lang cuts")
    finally:
        lm.unpersist()


def test_decode_and_langid_streaming_parity(spark, tmp_path):
    """r12 verdict #4 — streaming parity for the r12 crawl tier.
    Lambda shape (stated in the curate_stream/ingest_gate docstrings):
    ``decode_payload`` is row-local, so it applies to the RAW stream
    before the gate; ``identify_language`` is a per-doc aggregation,
    so it runs inside foreachBatch via ``ingest_gate(lang_id_col=)``.
    A THREE-micro-batch finite replay (maxFilesPerTrigger=1) must
    equal the batch path over the union exactly — per-doc locality
    means batch boundaries cannot change any prediction."""
    import uuid as _uuid

    from mongo_arrow_spark.operators import encoding
    from mongo_arrow_spark.operators.curate import ingest_gate

    sents = {
        "fr": "le chat dort près du feu pendant que la pluie tombe dehors et que nous lisons des livres ensemble dans la maison chaude",
        "de": "im winter sitzen wir am feuer und lesen gemeinsam bücher während draußen der regen fällt und der wind weht",
        "es": "en invierno nos sentamos junto al fuego y leemos libros juntos mientras la lluvia cae afuera de la casa",
        "ru": "зимой мы сидим у огня и вместе читаем книги пока на улице идёт дождь и дует холодный ветер над рекой",
        "el": "τον χειμώνα καθόμαστε δίπλα στη φωτιά και διαβάζουμε βιβλία μαζί ενώ έξω πέφτει η βροχή και φυσάει",
        "cs": "v zimě sedíme u ohně a společně čteme knihy zatímco venku prší a fouká studený vítr nad řekou",
    }
    codecs_by_lang = {
        "fr": "cp1252", "de": "iso-8859-15", "es": "cp850",
        "ru": "koi8-r", "el": "iso-8859-7", "cs": "cp1250",
    }
    rows = []
    for i, (lang, sent) in enumerate(sorted(sents.items())):
        codec = codecs_by_lang[lang]
        rows.append(
            (
                i,
                sent.encode(codec),
                f"text/plain; charset={codec}",
                lang,
            )
        )
    base = spark.createDataFrame(
        rows, "doc_id long, payload binary, ctype string, want_lang string"
    )

    def pipeline(df):
        decoded = df.withColumn(
            "text", encoding.decode_payload("payload", "ctype")
        ).select("doc_id", "text", "want_lang")
        accepted, _, _ = ingest_gate(
            decoded, min_tokens=5, lang_id_col="lang_pred"
        )
        return accepted

    # batch path over the union
    want = sorted(tuple(r) for r in pipeline(base).collect())

    # streaming path: one parquet file per micro-batch
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    for b in range(3):
        part = base.filter(F.col("doc_id") % 3 == b)
        stage = str(tmp_path / f"stage{b}")
        part.coalesce(1).write.mode("overwrite").parquet(stage)
        import os as _os

        pf = next(
            f for f in _os.listdir(stage) if f.endswith(".parquet")
        )
        dest = str(in_dir / f"b{b}.parquet")
        _os.replace(_os.path.join(stage, pf), dest)
        _os.utime(dest, (1_600_000_000 + b, 1_600_000_000 + b))
    stream = (
        spark.readStream.schema(
            "doc_id long, payload binary, ctype string, want_lang string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    # decode_payload on the RAW stream — append-legal projection
    decoded_stream = stream.withColumn(
        "text", encoding.decode_payload("payload", "ctype")
    ).select("doc_id", "text", "want_lang")
    name = f"t_{_uuid.uuid4().hex[:8]}"
    spark.sql(
        f"CREATE TABLE {name} (doc_id bigint, text string, "
        "want_lang string, lang_pred string) USING parquet"
    )

    def sink(batch_df, _bid):
        accepted, _, _ = ingest_gate(
            batch_df, min_tokens=5, lang_id_col="lang_pred"
        )
        accepted.write.insertInto(name)

    q = (
        decoded_stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(tuple(r) for r in spark.table(name).collect())
    spark.sql(f"DROP TABLE {name}")
    assert got == want
    # and the tier did real work: mojibake-free decode + right langs
    by_id = {t[0]: t for t in got}
    assert len(by_id) == 6
    for t in got:
        assert t[3] == t[2], t  # lang_pred == want_lang
        assert "�" not in t[1]
