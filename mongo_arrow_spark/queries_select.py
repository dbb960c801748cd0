"""Battery queries for the selection tier: token-budget cut, per-group
caps, and BPE token accounting.

``select_token_budget`` carries an exact window-cumsum oracle (the
one-task SQL form the distributed prefix-sum must reproduce
bit-for-bit). ``cap_per_group`` has an exact row_number oracle and parks
below the graded window (rationale in battery.py). ``tok_bpe_stats`` is
rows-only by nature — BPE's iterative merge loop is not expressible in
one SQL statement; the bit-exact independent-reference oracle runs in
tests/test_tokenizer.py instead.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import packing as packing_ops
from mongo_arrow_spark.operators import selection, tokenizer
from mongo_arrow_spark.queries import _t, query
from mongo_arrow_spark.queries_ops import _md5_bucket_sql

# integer "englishness" score: exact in both engines, no float-ordering
# hazard in the total order the budget cut ranks by
_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]
_SW_SQL = "', '".join(_STOPWORDS)


@query(
    "select_token_budget",
    f"""
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('{_SW_SQL}')))::BIGINT AS sw
      FROM documents
    ), c AS (
      SELECT doc_id, sw, n_tokens,
             SUM(n_tokens) OVER (ORDER BY sw DESC, doc_id)::BIGINT
               AS cum_tokens
      FROM t
    )
    SELECT doc_id, sw, n_tokens, cum_tokens FROM c
    WHERE cum_tokens <= (SELECT SUM(n_tokens)::BIGINT FROM t) * 2 // 5
    ORDER BY doc_id
    """,
)
def q_select_token_budget(spark, sf_dir):
    """Token-budget selection (r8): "keep the best 40 % of the corpus's
    tokens" — documents ranked by an integer quality score (stopword
    hits, the englishness proxy), greedy prefix under the budget.

    The engine computes the exact global running total with a
    distributed prefix sum (range partition → per-partition subtotals →
    broadcast offsets → parallel per-partition window); the oracle is
    the naive one-task ``SUM() OVER (ORDER BY ...)``. Hash-equality IS
    the proof that the parallel plan reproduces the sequential
    semantics. Budget is derived from the corpus total with integer
    arithmetic so both engines cut at the identical token."""
    from mongo_arrow_spark.operators.text import stopword_hits

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        stopword_hits("text", _STOPWORDS).cast("long").alias("sw"),
    )
    total = int(
        docs.agg(F.sum(F.size(F.split("text", " ", -1)))).first()[0]
    )
    out = selection.select_token_budget(
        docs, total * 2 // 5, score_col="sw", id_col="doc_id"
    )
    return out.select("doc_id", "sw", "n_tokens", "cum_tokens").orderBy(
        "doc_id"
    )


@query(
    "cap_per_group",
    """
    SELECT source, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents) WHERE rk <= 25
    ORDER BY source, doc_id
    """,
)
def q_cap_per_group(spark, sf_dir):
    """Per-domain cap (r8): at most 25 documents per source, best
    (longest) first — the RefinedWeb/C4 anti-domination stage. One hash
    shuffle on the group key + row_number cut; exact oracle."""
    docs = _t(spark, sf_dir, "documents")
    out = selection.cap_per_group(
        docs,
        "source",
        25,
        order_by=[F.desc("n_chars"), F.asc("doc_id")],
    )
    return out.select("source", "doc_id", "n_chars").orderBy(
        "source", "doc_id"
    )


@query("tok_bpe_stats")  # rows-only: BPE's merge loop isn't one-SQL-statement
def q_tok_bpe_stats(spark, sf_dir):
    """BPE tokenizer fit + apply end-to-end (r8): fit 80 merges on the
    corpus word-frequency table (one scan, driver loop on the bounded
    top-4096 cut), then count exact BPE tokens per language. Bit-exact
    fit/apply oracles vs an independent reference implementation run in
    tests/test_tokenizer.py; here the driver pins rows+schema and that
    the full fit→apply→aggregate composition executes. The apply is a
    compute-heavy Python projection, so the corpus is repartitioned
    first (single-file parquet reads as ONE split otherwise)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    model = tokenizer.fit_bpe(
        docs, num_merges=80, max_fit_words=4096
    )
    counted = tokenizer.bpe_token_count(docs.repartition(8), model)
    return (
        counted.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        )
        .orderBy("lang")
    )


@query(
    "budget_per_group",
    f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(text, ' '))::BIGINT AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('{_SW_SQL}')))::BIGINT AS sw
      FROM documents
    ), c AS (
      SELECT doc_id, lang, sw, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY sw DESC, doc_id)::BIGINT
               AS cum_tokens
      FROM t
    )
    SELECT doc_id, lang, sw, n_tokens, cum_tokens FROM c
    WHERE cum_tokens <= 4000
    ORDER BY lang, doc_id
    """,
)
def q_budget_per_group(spark, sf_dir):
    """Per-language token budgets (r8): within each language keep the
    best-scoring prefix under 4 000 tokens — the stratified budget cut.
    One hash shuffle on the group key; each group's cumsum window runs
    in parallel. Exact window-cumsum oracle."""
    from mongo_arrow_spark.operators.text import stopword_hits

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "text",
        stopword_hits("text", _STOPWORDS).cast("long").alias("sw"),
    )
    out = selection.select_token_budget_per_group(
        docs, 4000, "lang", score_col="sw", id_col="doc_id"
    )
    return out.select(
        "doc_id", "lang", "sw", "n_tokens", "cum_tokens"
    ).orderBy("lang", "doc_id")


# Engine artifacts (BPE counts, the time-travel store, the
# content-addressed store) live under a PER-PROCESS mkdtemp root:
# mode-0700 and unpredictable, so no symlink/pre-creation hazard on
# shared hosts, no cross-process race when two harnesses grade
# concurrently at different sfs, and no stale bytes from a previous run
# at a different sf (r10 advice fix — the paths were fixed /tmp
# literals before). Removed at interpreter exit (after all grading —
# oracles read the artifacts mid-process), so repeated runs don't
# accumulate corpus-sized temp dirs.
import atexit as _atexit
import shutil as _shutil

_ART_DIR = tempfile.mkdtemp(prefix="mas_artifacts_")
_atexit.register(_shutil.rmtree, _ART_DIR, ignore_errors=True)

# tokenizer-true packing (r9): the oracle can't recompute BPE (iterative
# merge loop), but BPE counts are DETERMINISTIC given the fit — so the
# engine materializes its counts as a parquet artifact at a path FIXED
# FOR THIS PROCESS and BOTH engines derive the downstream (budget cut →
# packing) from the identical bytes. The artifact is rewritten on every
# query invocation (the oracle string is rendered once at import, so the
# path can't carry an sf tag), and the harness always runs the Spark
# query before its oracle — the sequencing contract the gzip-dump
# precedent also relies on. That contract is PER-PROCESS, which the
# mkdtemp root now enforces rather than merely documents. The counts
# themselves are bit-exact-pinned vs an independent reference in
# tests/test_tokenizer.py; THIS entry grades that the tokenizer-true
# composition (counts → prefix-sum cut → stream packing) reproduces the
# sequential SQL semantics.
_BPE_COUNTS_PATH = os.path.join(_ART_DIR, "bpe_budget_counts")


def _bpe_counts_artifact(spark, sf_dir: str) -> str:
    """Fit BPE on the corpus and write exact per-doc token counts —
    overwritten per call so the artifact always reflects ``sf_dir``."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    model = tokenizer.fit_bpe(docs, num_merges=80, max_fit_words=4096)
    # encode at session parallelism (r14): the Arrow-batched encoder is
    # the per-row-heavy stage and a fixed 8-way repartition capped it at
    # a quarter of the local cores; the artifact CONTENT is partition-
    # independent (per-doc rows, both engines consume the row set)
    par = spark.sparkContext.defaultParallelism
    counted = tokenizer.bpe_token_count(docs.repartition(par), model)
    (
        counted.select(
            "doc_id",
            F.coalesce("n_bpe_tokens", F.lit(0))
            .cast("long")
            .alias("n_bpe_tokens"),
        )
        .write.mode("overwrite")
        .parquet(_BPE_COUNTS_PATH)
    )
    return _BPE_COUNTS_PATH


@query(
    "tok_pack_pipeline",
    f"""
    WITH bpe AS (
      SELECT doc_id, CAST(n_bpe_tokens AS BIGINT) AS n_tokens
      FROM read_parquet('{_BPE_COUNTS_PATH}/*.parquet')
    ), t AS (
      SELECT d.doc_id, b.n_tokens,
             CASE WHEN d.text IS NULL THEN -1
                  ELSE len(list_filter(string_split(d.text, ' '),
                           w -> w IN ('{_SW_SQL}')))::BIGINT END AS sw
      FROM documents d JOIN bpe b USING (doc_id)
    ), c AS (
      SELECT doc_id, sw, n_tokens,
             SUM(n_tokens) OVER (ORDER BY sw DESC, doc_id)::BIGINT
               AS cum_tokens
      FROM t
    ), kept AS (
      SELECT doc_id, n_tokens FROM c
      WHERE cum_tokens <= (SELECT SUM(n_tokens)::BIGINT FROM t) * 2 // 5
    ), s AS (
      SELECT doc_id, n_tokens,
             md5('pack' || CAST(doc_id AS VARCHAR)) AS h,
             {_md5_bucket_sql('pack', 8)} AS stream
      FROM kept
    ), p AS (
      SELECT doc_id, n_tokens, stream,
             SUM(n_tokens) OVER (PARTITION BY stream ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS e
      FROM s
    )
    SELECT doc_id, stream,
           CAST(FLOOR((e - n_tokens) / 256) AS BIGINT) AS seq_id,
           CAST((e - n_tokens) % 256 AS BIGINT) AS seq_offset,
           n_tokens
    FROM p ORDER BY doc_id
    """,
)
def q_tok_pack_pipeline(spark, sf_dir):
    """Tokenizer-true packing end-to-end (r9, verdict item 7): exact BPE
    counts → "best 40 % of the corpus's BPE tokens" budget cut →
    GPT-style stream packing, composed as a real trainer pipeline would
    run it (``bpe_token_count`` → ``select_token_budget(token_col=)`` →
    ``pack_sequences(n_tokens_col=)``). The engine materializes its BPE
    counts as a parquet artifact (see ``_bpe_counts_artifact``) and
    reads them back, so the oracle consumes byte-identical counts and
    hash-equality grades the full downstream composition — the
    distributed prefix-sum cut and the per-stream offset windows —
    against the naive one-task SQL. Whitespace counts undercount
    morphology-rich text, so sequences packed by them overflow the real
    context window; this is the path that doesn't."""
    from mongo_arrow_spark.operators.text import stopword_hits

    path = _bpe_counts_artifact(spark, sf_dir)
    counts = spark.read.parquet(path)
    scored = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.when(F.col("text").isNull(), F.lit(-1))
            .otherwise(stopword_hits("text", _STOPWORDS))
            .cast("long")
            .alias("sw"),
        )
        .join(counts, "doc_id")
    )
    # the budget total reads the counts ARTIFACT alone (r14): the join
    # with documents is 1:1 (one count row per doc_id), so the sum is
    # identical — and the totals action no longer pays the stopword
    # scan + join it doesn't need
    total = int(counts.agg(F.sum("n_bpe_tokens")).first()[0])
    kept = selection.select_token_budget(
        scored, total * 2 // 5, score_col="sw", token_col="n_bpe_tokens"
    )
    packed = packing_ops.pack_sequences(
        kept, seq_len=256, n_streams=8, n_tokens_col="n_tokens"
    )
    return packed.select(
        "doc_id", "stream", "seq_id", "seq_offset", "n_tokens"
    ).orderBy("doc_id")


@query(
    "quality_ensemble",
    f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN -1
                  ELSE len(list_filter(string_split(text, ' '),
                           w -> w IN ('{_SW_SQL}')))::BIGINT END AS sw,
             COALESCE(n_chars, -1)::BIGINT AS nc,
             CASE WHEN text IS NULL THEN -1
                  ELSE len(list_distinct(string_split(text, ' ')))::BIGINT
                  END AS dw
      FROM documents
    ), r AS (
      SELECT doc_id, sw, nc, dw,
             row_number() OVER (ORDER BY sw DESC, doc_id)::BIGINT AS rank_sw,
             row_number() OVER (ORDER BY nc DESC, doc_id)::BIGINT AS rank_nc,
             row_number() OVER (ORDER BY dw DESC, doc_id)::BIGINT AS rank_dw
      FROM s
    ), e AS (
      SELECT doc_id, sw, nc, dw, rank_sw, rank_nc, rank_dw,
             (2 * rank_sw + rank_nc + rank_dw)::BIGINT AS wsum
      FROM r
    )
    SELECT doc_id, sw, nc, dw, rank_sw, rank_nc, rank_dw, wsum,
           row_number() OVER (ORDER BY wsum, doc_id)::BIGINT AS ens_rank
    FROM e ORDER BY doc_id
    """,
)
def q_quality_ensemble(spark, sf_dir):
    """Rank-fusion quality ensemble (r9): three integer quality signals
    — stopword hits (englishness), character length, distinct-word
    count — each exactly globally ranked, Borda-fused with weights
    2:1:1, and the fused key exactly ranked again. The engine runs four
    chained distributed prefix ranks (range partition → bounded offsets
    → parallel windows, never a one-task global window); the oracle is
    the naive four-window SQL. NULL text pins every signal to −1 on
    both sides (the engines disagree on NULL sort position)."""
    docs = _t(spark, sf_dir, "documents")
    from mongo_arrow_spark.operators.text import stopword_hits

    scored = docs.select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(-1))
        .otherwise(stopword_hits("text", _STOPWORDS))
        .cast("long")
        .alias("sw"),
        F.coalesce("n_chars", F.lit(-1)).cast("long").alias("nc"),
        F.when(F.col("text").isNull(), F.lit(-1))
        .otherwise(F.size(F.array_distinct(F.split("text", " ", -1))))
        .cast("long")
        .alias("dw"),
    )
    out = selection.ensemble_rank(
        scored, ["sw", "nc", "dw"], weights=[2, 1, 1], id_col="doc_id"
    )
    return out.select(
        "doc_id",
        "sw",
        "nc",
        "dw",
        F.col("__rank_sw").alias("rank_sw"),
        F.col("__rank_nc").alias("rank_nc"),
        F.col("__rank_dw").alias("rank_dw"),
        F.col("__wsum").alias("wsum"),
        "ens_rank",
    ).orderBy("doc_id")


def _interleave_sql(cols, bits):
    return " + ".join(
        f"((({c} // {1 << b}) % 2) * {1 << (b * len(cols) + i)})"
        for i, c in enumerate(cols)
        for b in range(bits)
    )


@query(
    "layout_zorder",
    f"""
    WITH k AS (
      SELECT (l_suppkey % 256) AS sx, (l_partkey % 256) AS py,
             l_extendedprice
      FROM lineitem
    ), z AS (
      SELECT {_interleave_sql(('sx', 'py'), 8)} AS zkey, l_extendedprice
      FROM k
    )
    SELECT (zkey // 4096) AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zkey) AS BIGINT) AS zmin,
           CAST(MAX(zkey) AS BIGINT) AS zmax,
           CAST(SUM(l_extendedprice) AS DECIMAL(18,2)) AS sum_price
    FROM z GROUP BY 1 ORDER BY 1
    """,
)
def q_layout_zorder(spark, sf_dir):
    """Z-order layout key (r8): Morton-interleave two fact-table key
    ranks and aggregate per curve segment — the clustering key
    ``write_zordered`` range-partitions output files by. The interleave
    is pure engine-portable integer arithmetic, so every key (and the
    per-segment rollup) matches DuckDB bit-for-bit; the file-level
    pruning efficacy this buys is measured in tests/test_layout.py."""
    from mongo_arrow_spark.operators import layout

    li = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_suppkey") % 256).cast("long").alias("sx"),
        (F.col("l_partkey") % 256).cast("long").alias("py"),
        "l_extendedprice",
    )
    z = li.withColumn("zkey", layout.interleave_bits(["sx", "py"], bits=8))
    return (
        z.groupBy((F.col("zkey") / 4096).cast("long").alias("zbucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("zkey").cast("long").alias("zmin"),
            F.max("zkey").cast("long").alias("zmax"),
            F.sum("l_extendedprice").cast("decimal(18,2)").alias("sum_price"),
        )
        .orderBy("zbucket")
    )


@query(
    "layout_content_addressed",
    """
    WITH s AS (
      SELECT doc_id, text, lang FROM documents
      UNION ALL
      SELECT doc_id + 10000000, text, lang FROM documents
    )
    SELECT doc_id, text, lang,
           COUNT(*) OVER (PARTITION BY text, lang)::BIGINT AS n_copies
    FROM s ORDER BY doc_id
    """,
)
def q_layout_content_addressed(spark, sf_dir):
    """Content-addressed store round-trip (r10 — r9 verdict #3): a
    mirrored-crawl corpus (every payload ingested twice under new ids —
    the CommonCrawl-snapshot duplication shape) is split into the
    one-row-per-distinct-digest payload table + the payload-free
    manifest (``write_content_addressed``), then reconstructed through
    the ZERO-EXCHANGE bucketed join (``read_content_addressed``,
    plan-gated in tests/test_layout.py) with the per-payload copy count
    attached from the MANIFEST side alone. Hash-equality vs the base
    table proves the round-trip is lossless — including the null-tagged
    digest deciding payload identity — and that the dedup accounting
    (``n_copies``; ``dedup_ratio`` = its mean) is exact: SQL's
    ``PARTITION BY payload`` groups exactly where the prefix-free digest
    groups. Catalog-safety: table names are per-sf (md5 tag) so
    concurrent sf grades never collide, and the data lands as EXTERNAL
    tables under the per-process artifact root — a managed table here
    would orphan its warehouse directory across sessions (the in-memory
    catalog forgets the table, the directory persists, and the next
    session's saveAsTable refuses the location; hit live in the r10
    bench)."""
    import hashlib

    from mongo_arrow_spark.operators import layout

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    name = f"mas_cas_{tag}"
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    mirrored = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
    )
    layout.write_content_addressed(
        mirrored,
        name,
        payload_cols=["text", "lang"],
        id_cols=["doc_id"],
        path=os.path.join(_ART_DIR, f"cas_{tag}"),
    )
    recon = layout.read_content_addressed(spark, name)
    man = spark.table(f"{name}_manifest")
    copies = man.groupBy("__digest").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    )
    per_doc = man.join(copies, "__digest").select("doc_id", "n_copies")
    return recon.join(per_doc, "doc_id").select(
        "doc_id", "text", "lang", "n_copies"
    ).orderBy("doc_id")


@query(
    "mix_upsample",
    r"""
    WITH w(lang, wt) AS (VALUES ('en', 4.0), ('de', 1.0), ('es', 1.0),
                                ('fr', 1.0), ('zh', 1.0)),
    counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    plan AS (
      SELECT c.lang, c.n,
             CAST(floor(2048 * wt / (SELECT SUM(wt) FROM w)) AS BIGINT)
               AS target
      FROM counts c JOIN w USING (lang)
    ), fr_ AS (
      SELECT lang, n, target // n AS nfull, target % n AS rem FROM plan
    ), ranked AS (
      SELECT d.doc_id, d.lang,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5('mix:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rk
      FROM documents d JOIN fr_ USING (lang)
    ), expanded AS (
      SELECT r.doc_id, r.lang,
             unnest(range(f.nfull + CASE WHEN r.rk <= f.rem THEN 1 ELSE 0 END))
               AS epoch
      FROM ranked r JOIN fr_ f USING (lang)
    )
    SELECT doc_id, lang, CAST(epoch AS BIGINT) AS epoch FROM expanded
    """,
)
def q_mix_upsample(spark, sf_dir):
    """Data-recipe upsampling (r8 seventh wave — the LLaMA-style
    "epochs per source" mix): each domain contributes exactly
    floor(w_k·N) rows by repeating its documents whole-epochs plus an
    md5-ranked fractional prefix; every copy carries its epoch index.
    Weights are dyadic (4:1:1:1:1 over 2048) so the float target
    arithmetic is exact in both engines. Plan: K-row driver plan +
    literal-map sized explode + one per-domain rank window (parallel by
    domain, cap_per_group's shape) — payloads shuffle once."""
    docs = _t(spark, sf_dir, "documents")
    out = selection.upsample_to_mix(
        docs,
        {"en": 4.0, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0},
        n_total=2048,
        key_col="lang",
    )
    return out.select(
        "doc_id", "lang", F.col("epoch").cast("long").alias("epoch")
    )


@query(
    "curriculum_rank",
    f"""
    WITH scored AS (
      -- NULL text scores -1 EXPLICITLY on both sides: the engines
      -- disagree on where a NULL score sorts (Spark ASC = NULLS FIRST,
      -- DuckDB ASC = NULLS LAST), so an un-pinned NULL would land the
      -- row at opposite ends of the total order (r8 review fix)
      SELECT doc_id,
             CASE WHEN text IS NULL THEN -1
                  ELSE len(list_filter(string_split(text, ' '),
                           w -> w IN ('{_SW_SQL}')))::BIGINT END AS score
      FROM documents
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score ASC, doc_id ASC) AS BIGINT)
             AS rank
    FROM scored
    """,
)
def q_curriculum_rank(spark, sf_dir):
    """Curriculum ordering (r8 seventh wave): exact global rank over
    (easiness score, id) via the distributed prefix-rank — range
    partition + bounded per-partition counts + parallel row_number —
    hash-matched against the one-task SQL window it replaces. The rank
    column is the trainer's replay cursor / shard key."""
    from mongo_arrow_spark.operators.text import stopword_hits

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(-1))
        .otherwise(stopword_hits("text", _STOPWORDS))
        .cast("long")
        .alias("score"),
    )
    return selection.assign_global_rank(
        scored, [F.col("score").asc(), F.col("doc_id").asc()], rank_col="rank"
    )


# ---------------------------------------------------------------------------
# diversity tier (r8 eighth wave): greedy k-center + MMR. The oracles are
# GENERATED chained-CTE unrollings of the identical greedy stages — every
# distance/score is integer math on 1e-4-quantized vectors (the
# cluster_kmeans machinery), so hash-equality proves the distributed
# greedy loop (bounded two-stage argmax per step, no corpus window)
# reproduces the sequential semantics bit-for-bit.

_DIM = 64  # embeddings.parquet vector width (TESTDATA.md)


def _dk_q(group: str | None = None) -> str:
    """Shared quantize CTE: the kmeans_fit corrupt-vector contract
    (NULL / NULL-element vectors out, 1e-4 floor-quantize)."""
    g = f", {group}" if group else ""
    gf = f" AND {group} IS NOT NULL" if group else ""
    return f"""q AS (
      SELECT vec_id{g},
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS qv
      FROM embeddings
      WHERE embedding IS NOT NULL AND vec_id IS NOT NULL
        AND len(list_filter(embedding, x -> x IS NULL)) = 0
        AND len(embedding) = {_DIM}{gf}
    )"""


def _dk_dist(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        f" j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j]))) AS BIGINT)"
    )


def _dk_dot(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {_DIM + 1}),"
        f" j -> {a}[j] * {b}[j])) AS BIGINT)"
    )


def _kcenter_sql(k: int) -> str:
    """Unrolled global greedy k-center: s{r} picks, d{r} running dmin."""
    parts = [_dk_q()]
    parts.append(
        """s1 AS MATERIALIZED (
      SELECT vec_id, qv, CAST(NULL AS BIGINT) AS gain
      FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
    )"""
    )
    parts.append(
        f"""d1 AS MATERIALIZED (
      SELECT q.vec_id, q.qv, {_dk_dist('q.qv', 's.qv')} AS dmin
      FROM q CROSS JOIN s1 s
    )"""
    )
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
      SELECT vec_id, qv, dmin AS gain FROM d{r - 1}
      WHERE vec_id NOT IN ({prev})
      ORDER BY dmin DESC, vec_id LIMIT 1
    )"""
        )
        if r < k:
            parts.append(
                f"""d{r} AS MATERIALIZED (
      SELECT d.vec_id, d.qv,
             LEAST(d.dmin, {_dk_dist('d.qv', 's.qv')}) AS dmin
      FROM d{r - 1} d CROSS JOIN s{r} s
    )"""
            )
    sel = "\n    UNION ALL ".join(
        f"SELECT vec_id, CAST({r} AS BIGINT) AS sel_rank, gain FROM s{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {sel} ORDER BY sel_rank"


def _kcenter_grouped_sql(k: int, group: str) -> str:
    """Unrolled PER-GROUP greedy k-center (row_number per group replaces
    the global TOP 1; the dmin update LEFT JOINs the per-group pick so
    exhausted groups keep their dmin — the operator's contract)."""
    parts = [_dk_q(group)]
    parts.append(
        f"""s1 AS MATERIALIZED (
      SELECT {group}, vec_id, qv, CAST(NULL AS BIGINT) AS gain FROM (
        SELECT *, row_number() OVER (PARTITION BY {group}
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn FROM q
      ) WHERE rn = 1
    )"""
    )
    parts.append(
        f"""d1 AS MATERIALIZED (
      SELECT q.vec_id, q.{group}, q.qv, {_dk_dist('q.qv', 's.qv')} AS dmin
      FROM q JOIN s1 s USING ({group})
    )"""
    )
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
      SELECT {group}, vec_id, qv, dmin AS gain FROM (
        SELECT *, row_number() OVER (PARTITION BY {group}
          ORDER BY dmin DESC, vec_id) AS rn
        FROM d{r - 1} WHERE vec_id NOT IN ({prev})
      ) WHERE rn = 1
    )"""
        )
        if r < k:
            parts.append(
                f"""d{r} AS MATERIALIZED (
      SELECT d.vec_id, d.{group}, d.qv,
             CASE WHEN s.qv IS NULL THEN d.dmin
                  ELSE LEAST(d.dmin, {_dk_dist('d.qv', 's.qv')}) END AS dmin
      FROM d{r - 1} d LEFT JOIN s{r} s USING ({group})
    )"""
            )
    sel = "\n    UNION ALL ".join(
        f"SELECT vec_id, {group}, CAST({r} AS BIGINT) AS sel_rank, gain"
        f" FROM s{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH " + ",\n    ".join(parts) + f"\n    {sel}"
        f" ORDER BY {group}, sel_rank"
    )


def _mmr_sql(k: int, lam_num: int = 1, lam_den: int = 2) -> str:
    """Unrolled MMR with the md5-min row's vector as the query: rel is
    the integer dot product; the objective stays in integer numerator
    form lam_num*rel - (lam_den-lam_num)*smax."""
    mu = lam_den - lam_num
    parts = [_dk_q()]
    parts.append(
        """qv0 AS MATERIALIZED (
      SELECT qv FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
    )"""
    )
    parts.append(
        f"""r AS MATERIALIZED (
      SELECT q.vec_id, q.qv, {_dk_dot('q.qv', 'v.qv')} AS rel
      FROM q CROSS JOIN qv0 v
    )"""
    )
    parts.append(
        f"""s1 AS MATERIALIZED (
      SELECT vec_id, qv, rel, CAST({lam_num} * rel AS BIGINT) AS score
      FROM r ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    )
    parts.append(
        f"""m1 AS MATERIALIZED (
      SELECT r.vec_id, r.qv, r.rel, {_dk_dot('r.qv', 's.qv')} AS smax
      FROM r CROSS JOIN s1 s
    )"""
    )
    for r in range(2, k + 1):
        prev = " UNION ALL ".join(
            f"SELECT vec_id FROM s{i}" for i in range(1, r)
        )
        parts.append(
            f"""s{r} AS MATERIALIZED (
      SELECT vec_id, qv, rel,
             CAST({lam_num} * rel - {mu} * smax AS BIGINT) AS score
      FROM m{r - 1}
      WHERE vec_id NOT IN ({prev})
      ORDER BY {lam_num} * rel - {mu} * smax DESC, vec_id LIMIT 1
    )"""
        )
        if r < k:
            parts.append(
                f"""m{r} AS MATERIALIZED (
      SELECT m.vec_id, m.qv, m.rel,
             GREATEST(m.smax, {_dk_dot('m.qv', 's.qv')}) AS smax
      FROM m{r - 1} m CROSS JOIN s{r} s
    )"""
            )
    sel = "\n    UNION ALL ".join(
        f"SELECT vec_id, CAST({r} AS BIGINT) AS sel_rank, score FROM s{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(parts) + f"\n    {sel} ORDER BY sel_rank"


@query(
    "pack_bucket_batches",
    """
    WITH t AS (
      SELECT doc_id,
             COALESCE(len(string_split(text, ' ')), 0)::BIGINT AS n_tokens,
             md5('batch' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), b AS (
      SELECT doc_id, n_tokens, h, (n_tokens // 64)::BIGINT AS len_bucket
      FROM t
    ), c AS (
      SELECT doc_id, n_tokens, len_bucket,
             (SUM(n_tokens) OVER (PARTITION BY len_bucket
                ORDER BY h, doc_id) - n_tokens)::BIGINT AS excl
      FROM b
    )
    SELECT doc_id, n_tokens, len_bucket, (excl // 600)::BIGINT AS batch_id
    FROM c ORDER BY doc_id
    """,
)
def q_pack_bucket_batches(spark, sf_dir):
    """Length-bucketed dynamic batching (r9): documents bucketed by
    ``n_tokens div 64`` and cut into ~600-token batches per bucket under
    the md5 order — the fairseq ``--max-tokens`` scheme as one plan.
    The engine runs the grouped distributed prefix sum (the giant
    short-doc bucket spans many range partitions and cumsums in
    parallel); the oracle is the naive one-task-per-bucket window."""
    from mongo_arrow_spark.operators import packing

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = packing.bucket_batches(docs, capacity=600, bucket_width=64)
    return out.select(
        "doc_id", "n_tokens", "len_bucket", "batch_id"
    ).orderBy("doc_id")


def _hard_neg_sql(k: int, anchor_pred: str) -> str:
    return f"""
    WITH {_dk_q('label')}, a AS (
      SELECT * FROM q WHERE {anchor_pred}
    ), p AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             b.vec_id AS neg_id, {_dk_dot('a.qv', 'b.qv')} AS qdot
      FROM a JOIN q b
        ON a.label <> b.label AND a.vec_id <> b.vec_id
    ), r AS (
      SELECT anchor_id, anchor_label, neg_id, qdot,
             row_number() OVER (PARTITION BY anchor_id
               ORDER BY qdot DESC, neg_id)::BIGINT AS neg_rank
      FROM p
    )
    SELECT anchor_id, anchor_label, neg_id, qdot, neg_rank
    FROM r WHERE neg_rank <= {k}
    ORDER BY anchor_id, neg_rank
    """


# the brute form's contract is a BOUNDED anchor set (a labeled seed or
# an eval batch that broadcasts) — the battery entry now uses a fixed
# literal id list rather than a corpus-proportional predicate, so the
# entry users copy matches the operator's contract (r9 verdict #2);
# ids all exist at every sf (vec_id 0–499 everywhere, TESTDATA.md)
_HN_ANCHOR_IDS = [0, 49, 98, 147, 196, 245, 294, 343, 392, 441]


@query(
    "sim_hard_negatives",
    _hard_neg_sql(5, f"vec_id IN ({', '.join(map(str, _HN_ANCHOR_IDS))})"),
)
def q_sim_hard_negatives(spark, sf_dir):
    """Hard-negative mining, bounded-anchor form (r9; anchors fixed in
    r10): for each of 10 FIXED anchor ids, the 5 most-similar corpus
    rows with a DIFFERENT label — integer dot products on the 1e-4
    quantize carrier, so the oracle reproduces every score and rank
    exactly. Anchors broadcast (the operator's documented contract —
    for corpus-sized anchor sets see ``sim_hard_negatives_ivf``); the
    corpus streams once; the per-anchor cut is the WindowGroupLimit
    pre-cut shape."""
    from mongo_arrow_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id").isin(_HN_ANCHOR_IDS))
    return similarity.hard_negatives(anchors, emb, k=5).orderBy(
        "anchor_id", "neg_rank"
    )


@query("sim_hard_negatives_ivf", _hard_neg_sql(3, "TRUE"))
def q_sim_hard_negatives_ivf(spark, sf_dir):
    """Corpus×corpus hard-negative mining through the IVF route (r10,
    the graded representative — r9 verdict #2): EVERY row mines its own
    3 cross-label negatives, the contrastive-pretraining shape where the
    brute broadcast contract no longer holds. Candidates meet on a cell
    EQUI-join (plan-gated in tests/test_plans.py: no
    BroadcastNestedLoopJoin, no CartesianProduct anywhere in the
    executed plan), with per-anchor probing over the bounded
    (cell × label) eligibility table. Graded at the brute-identical
    ``n_probe == n_clusters`` dial setting so the DuckDB oracle is
    EXACT (the same cross-label top-k SQL, all rows as anchors); the
    pruned-probe settings are recall-pinned (≥ 0.85) and
    probe-monotonicity-pinned in tests/test_pq.py — the dial runs all
    the way to exact, and THIS entry hash-grades that endpoint through
    the full IVF machinery (fit → cell assignment → eligibility →
    probe → equi-join → top-k)."""
    from mongo_arrow_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives_ivf(
        emb, emb, k=3, n_clusters=8, n_probe=8
    ).orderBy("anchor_id", "neg_rank")


@query("sim_hard_negatives_ivf_pruned")
def q_sim_hard_negatives_ivf_pruned(spark, sf_dir):
    """The SCALE configuration of corpus×corpus hard-negative mining —
    the benched representative (rows-only: the pruned probe is not
    SQL-replayable; its recall is pinned ≥ 0.85 in pytest and the
    exactness endpoint of the same machinery is hash-graded by
    ``sim_hard_negatives_ivf``). ``n_clusters="auto"`` holds cell size
    ~constant (the SCALE.md linear-work contract: candidates per anchor
    = n_probe × cell size, bounded) and ``n_probe=4`` prunes the
    candidate space — at sf0.1 this reads ~an eighth of the exact
    endpoint's pairs and the gap widens with corpus size (51.5 s vs
    340.8 s at ×10, SCALE.md)."""
    from mongo_arrow_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    return similarity.hard_negatives_ivf(
        emb, emb, k=3, n_clusters="auto", target_cell_rows=64, n_probe=4
    ).orderBy("anchor_id", "neg_rank")


@query("select_kcenter", _kcenter_sql(8))
def q_select_kcenter(spark, sf_dir):
    """Greedy k-center coreset (r8 eighth wave): 8 embeddings spanning
    the space, selected by farthest-point traversal. Each greedy step in
    the engine is a bounded two-stage partial agg (max gain, then min-id
    argmax) + a map-only dmin update with the new center compiled in as
    literals; the oracle unrolls the identical 8 stages as chained CTEs.
    Integer-exact (quantized distances), hence hash-gradeable."""
    from mongo_arrow_spark.operators import diversity

    emb = _t(spark, sf_dir, "embeddings")
    return diversity.kcenter_select(emb, 8).select(
        "vec_id", "sel_rank", "gain"
    )


@query("select_kcenter_grouped", _kcenter_grouped_sql(3, "label"))
def q_select_kcenter_grouped(spark, sf_dir):
    """Per-group k-center (r8): 3 diverse representatives per label —
    the stratified-coreset shape (per-language / per-cluster annotation
    budgets). The grouped update is a broadcast ≤G-row join instead of
    compiled literals; groups advance independently."""
    from mongo_arrow_spark.operators import diversity

    emb = _t(spark, sf_dir, "embeddings")
    return diversity.kcenter_select(emb, 3, group_col="label").select(
        "vec_id", "label", "sel_rank", "gain"
    )


@query("select_mmr", _mmr_sql(8))
def q_select_mmr(spark, sf_dir):
    """Maximal marginal relevance (r8): 8 rows relevant to a query
    vector (the md5-min row's embedding — engine-reproducible) but
    mutually non-redundant, λ = 1/2 kept as an exact integer rational.
    Seed is the max-relevance row; every later pick maximizes
    lam_num·rel − (lam_den−lam_num)·max_sim_to_selected."""
    from mongo_arrow_spark.operators import diversity

    emb = _t(spark, sf_dir, "embeddings")
    qrow = (
        emb.filter(
            F.col("embedding").isNotNull()
            & F.col("vec_id").isNotNull()
            & F.forall("embedding", lambda x: x.isNotNull())
            & (F.size("embedding") == _DIM)
        )
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .select("embedding")
        .first()
    )
    return diversity.mmr_select(
        emb, 8, query_vec=list(qrow["embedding"])
    ).select("vec_id", "sel_rank", "score")


@query(
    "pack_shards",
    """
    WITH t AS (
      SELECT doc_id,
             COALESCE(len(string_split(text, ' ')), 0)::BIGINT AS n_tokens,
             md5('shard' || CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    ), c AS (
      SELECT doc_id, n_tokens,
             (SUM(n_tokens) OVER (ORDER BY h, doc_id)
              - n_tokens)::BIGINT AS excl
      FROM t
    )
    SELECT doc_id, n_tokens, (excl // 5000)::BIGINT AS shard
    FROM c ORDER BY doc_id
    """,
)
def q_pack_shards(spark, sf_dir):
    """Token-balanced shard assignment (r8 tenth wave): shard i holds
    the docs whose exclusive running token total (under the md5 shuffle
    order) lands in [i·5000, (i+1)·5000) — the trainer-facing closing
    op: equal-TOKEN output shards regardless of document-length skew.
    The engine's running total is the distributed prefix sum (range
    partition → bounded offsets → per-partition windows, never a
    single-task global window); the oracle is the one-task SQL cumsum.
    Hash-equality proves the parallel plan reproduces the sequential
    semantics."""
    from mongo_arrow_spark.operators import packing

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = packing.assign_token_shards(docs, 5000, id_col="doc_id")
    return out.select("doc_id", "n_tokens", "shard").orderBy("doc_id")


@query(
    "mix_interleave",
    """
    WITH kept AS (
      SELECT doc_id, source,
             CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 1
                         WHEN 'src2' THEN 2 END AS w
      FROM documents WHERE source IN ('src0', 'src1', 'src2')
    ), pos AS (
      SELECT doc_id, source, w,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5('interleave' || CAST(doc_id AS VARCHAR)),
                        doc_id) - 1 AS pos
      FROM kept
    ), vt AS (
      -- stride = lcm(3,1,2)=6 over each weight: exact smallest-integer
      -- virtual times (src0->2, src1->6, src2->3)
      SELECT doc_id, source, pos,
             ((pos + 1) * (6 // w))::BIGINT AS vt
      FROM pos
    )
    SELECT doc_id, source, pos::BIGINT AS pos, vt,
           row_number() OVER (ORDER BY vt, source, pos)::BIGINT
             AS train_order
    FROM vt ORDER BY doc_id
    """,
)
def q_mix_interleave(spark, sf_dir):
    """Stride-scheduled source interleave (r8 twelfth wave): three
    domains at 3:1:2 into one deterministic training order where EVERY prefix carries
    the recipe proportions to within one row per source (a hash shuffle
    of the mixed corpus is only binomially local). The engine's global
    order is the distributed prefix rank (never a one-task window); the
    oracle is the naive one-task row_number over the identical integer
    virtual times."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    out = selection.interleave_sources(
        docs,
        {"src0": 3, "src1": 1, "src2": 2},
        source_col="source",
        id_col="doc_id",
    )
    return out.select(
        "doc_id",
        "source",
        F.col("pos").cast("long").alias("pos"),
        "vt",
        "train_order",
    ).orderBy("doc_id")


@query(
    "corpus_time_travel",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text,
           lang
    FROM documents
    WHERE doc_id % 3 <> 0 AND doc_id % 5 <> 0
    ORDER BY doc_id
    """,
)
def q_corpus_time_travel(spark, sf_dir):
    """Corpus versioning round-trip (r9): release v1 = two thirds of the
    corpus; release v2 = v1 minus the %5 ids, with the %7 texts edited —
    committed as a digest-diff delta (added/changed payloads + removed
    ids only) and READ BACK through the fold (v1 full ∪ delta). The
    oracle recomputes v2 directly from the base table, so hash-equality
    proves the delta commit + time-travel reconstruction is lossless —
    including the null-tagged change detection deciding what entered
    the delta. The store is wiped per invocation (versions accumulate
    otherwise)."""
    import shutil

    from mongo_arrow_spark.operators import versioning as V

    path = os.path.join(_ART_DIR, "time_travel_store")
    shutil.rmtree(path, ignore_errors=True)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    v1 = docs.filter(F.col("doc_id") % 3 != 0)
    v2 = v1.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat("text", F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    V.write_version(v1, path)
    V.write_version(v2, path)
    return V.read_version(spark, path, 2).orderBy("doc_id")


@query(
    "corpus_version_stream",
    """
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 AND doc_id % 5 = 0
                THEN text || ' rev' ELSE text END AS text,
           lang
    FROM documents ORDER BY doc_id
    """,
)
def q_corpus_version_stream(spark, sf_dir):
    """Streaming release commits (r10 — r9 verdict #6): three
    microbatches of a REAL file stream (`maxFilesPerTrigger=1`) flow
    through ``write_version_stream`` — batch 1 and 2 partition the
    corpus, batch 3 REVISES the %15 ids of batch 1 (upsert: removed +
    re-added in that version's delta) — and the latest time-travel
    reconstruction is read back. The oracle recomputes the final state
    from the base table, so hash-equality proves the foreachBatch
    append path (per-batch digest probe restricted to the batch's ids,
    no corpus-sized materialization per commit) composes to exactly the
    batch semantics. The store and stream inputs live under the
    per-process artifact root; per-invocation subdirs keep re-runs
    independent."""
    import uuid

    from mongo_arrow_spark.operators import versioning as V

    run = os.path.join(_ART_DIR, f"vstream_{uuid.uuid4().hex[:8]}")
    in_dir = os.path.join(run, "incoming")
    os.makedirs(in_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    batches = [
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        docs.filter((F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 5 == 0))
        .withColumn("text", F.concat("text", F.lit(" rev"))),
    ]
    for i, b in enumerate(batches):
        # one file per microbatch; a trailing rename makes the file
        # visible to the stream listing atomically
        tmp = os.path.join(run, f"stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        dest = os.path.join(in_dir, f"b{i}.parquet")
        os.replace(os.path.join(tmp, part), dest)
        # strictly increasing mtimes: FileStreamSource orders pending
        # files by timestamp, and the revision batch MUST land after
        # the rows it revises (last-wins), so don't leave the order to
        # filesystem timestamp granularity
        os.utime(dest, (1_600_000_000 + i, 1_600_000_000 + i))
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    store = os.path.join(run, "store")
    q = V.write_version_stream(
        stream, store, id_col="doc_id",
        checkpoint_dir=os.path.join(run, "ckpt"),
    )
    q.awaitTermination(300)
    return V.read_version(spark, store).orderBy("doc_id")


@query(
    "text_ngram_novelty",
    """
    WITH refd AS (
      SELECT DISTINCT unnest(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' ')))
        AS g
      FROM documents WHERE doc_id % 2 = 0
    ), d AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))))
        AS g
      FROM documents WHERE doc_id % 2 = 1
    ), f AS (
      SELECT d.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_ngrams,
             CAST(SUM(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unseen
      FROM d LEFT JOIN refd r USING (g)
      GROUP BY d.doc_id
    )
    SELECT b.doc_id,
           COALESCE(f.n_ngrams, 0)::BIGINT AS n_ngrams,
           COALESCE(f.n_unseen, 0)::BIGINT AS n_unseen,
           CASE WHEN COALESCE(f.n_ngrams, 0) > 0
                THEN ROUND(f.n_unseen / f.n_ngrams, 6) + 0.0 END AS novelty
    FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) b
    LEFT JOIN f USING (doc_id)
    ORDER BY b.doc_id
    """,
)
def q_text_ngram_novelty(spark, sf_dir):
    """Per-doc trigram novelty (r9): odd-id documents scored against the
    even-id half as the reference corpus — distinct-trigram counts,
    unseen counts, and the novelty fraction, exactly reproduced by the
    naive SQL (string-keyed gram join both sides; NULL novelty pinned
    for gram-less docs)."""
    from mongo_arrow_spark.operators import text as text_ops

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return text_ops.ngram_novelty(batch, ref, n=3).orderBy("doc_id")
