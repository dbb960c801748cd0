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

from pyspark.sql import functions as F

from mongo_arrow_spark.operators import selection, tokenizer
from mongo_arrow_spark.queries import _t, query

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
      -- NULL text scores -1 EXPLICITLY on both sides: Spark's size()
      -- and DuckDB's len() disagree on NULL (-1 vs NULL) and ASC
      -- ordering would place the row at opposite ends (r8 review fix)
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
