"""One-pass dataset profiling: per-column null fraction, distinct
estimate, min/max — the audit a training-data pipeline runs before and
after every filter stage.

Single aggregation over one scan (every metric is a Spark aggregate
expression, partial-aggregated map-side), then a constant-width unpivot
on the driver-side 1-row result. No per-column passes, no shuffle beyond
the one global agg — the same plan at 100 TB, where "profile the table"
must not mean "scan it 4× per column".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType,
    T.LongType,
    T.DoubleType,
    T.FloatType,
    T.ShortType,
    T.DecimalType,
)


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all non-nested columns) into a long
    table (column, n_nulls, n_distinct_approx, min_value, max_value) —
    min/max stringified so mixed column types share one schema.

    ``n_distinct_approx`` is HyperLogLog++ (merge-commutative sketch, the
    scale path); exact distinct would be one shuffle per column.
    """
    names = columns or [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
    ]
    if not names:
        raise ValueError("no profileable columns")
    total = F.count(F.lit(1)).alias("__total")
    aggs = [total]
    for c in names:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.approx_count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    parts = []
    for c in names:
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct_approx"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
        )
    return (
        row.select(F.col("__total"), F.explode(F.array(*parts)).alias("p"))
        .select(
            F.col("p.column").alias("column"),
            F.col("__total").cast("long").alias("n_rows"),
            "p.n_nulls",
            "p.n_distinct_approx",
            "p.min_value",
            "p.max_value",
        )
    )


def numeric_summary(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Numeric five-figure summary per column: mean, stddev, min, max,
    and exact median — long format. Same single-aggregation shape; the
    exact median buffers per column (use profile() + approx quantiles at
    raw scale)."""
    names = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    ]
    if not names:
        raise ValueError("no numeric columns")
    aggs = []
    for c in names:
        col = F.col(c).cast("double")
        aggs += [
            F.avg(col).alias(f"__avg_{c}"),
            F.stddev_samp(col).alias(f"__sd_{c}"),
            F.min(col).alias(f"__mn_{c}"),
            F.max(col).alias(f"__mx_{c}"),
            F.median(col).alias(f"__md_{c}"),
        ]
    row = df.agg(*aggs)
    parts = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__avg_{c}").alias("mean"),
            F.col(f"__sd_{c}").alias("stddev"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
            F.col(f"__md_{c}").alias("median"),
        )
        for c in names
    ]
    return row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")


# ----------------------------------------------------------- sketch tier
#
# Mergeable Datasketches artifacts (Spark 4 SQL builtins): the
# incremental path for profiling a corpus that never stops growing. Build
# one sketch row per (batch, column) as data arrives — per day, per
# source, per ingest — persist the artifact table, and merge sketches
# instead of rescanning history. Merging is register-wise (HLL) /
# compaction (KLL): O(sketch bytes), corpus-size-independent. The same
# artifacts answer cross-corpus questions (overlap estimation via
# inclusion-exclusion on HLL unions) without ever joining the corpora.


def sketch_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    batch_col: str | None = None,
    lg_k: int = 14,
) -> DataFrame:
    """Sketch artifact rows: (batch, column, n_rows, n_nulls, hll, kll).

    ``hll`` is an HLL++ distinct sketch (lg_k configurable accuracy/size);
    ``kll`` a KLL quantile sketch for numeric columns (null otherwise).
    One aggregation pass regardless of column count; group by
    ``batch_col`` to emit per-batch artifacts for later merging.
    """
    names = columns or [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType))
        and f.name != batch_col
    ]
    if not names:
        raise ValueError("no profileable columns")
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, _NUMERIC)
    }
    # hll_sketch_agg accepts int/long/string/binary only — everything
    # else (double, timestamp, bool, decimal) sketches its string form
    hashable = {
        f.name
        for f in df.schema.fields
        if isinstance(
            f.dataType, (T.IntegerType, T.LongType, T.StringType, T.BinaryType)
        )
    }
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in names:
        col = F.col(c)
        hcol = col if c in hashable else col.cast("string")
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.hll_sketch_agg(hcol, lg_k).alias(f"__hll_{c}"),
        ]
        if c in numeric:
            aggs.append(
                F.kll_sketch_agg_double(col.cast("double")).alias(f"__kll_{c}")
            )
    grouped = df.groupBy(
        *( [F.col(batch_col).alias("batch")] if batch_col else [F.lit("__all__").alias("batch")] )
    ).agg(*aggs)
    parts = []
    for c in names:
        kll = (
            F.col(f"__kll_{c}")
            if c in numeric
            else F.lit(None).cast("binary")
        )
        parts.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"__hll_{c}").alias("hll"),
                kll.alias("kll"),
            )
        )
    return grouped.select(
        "batch", F.col("__total").cast("long").alias("n_rows"),
        F.explode(F.array(*parts)).alias("p"),
    ).select("batch", "p.column", "n_rows", "p.n_nulls", "p.hll", "p.kll")


def merge_sketch_profiles(profiles: DataFrame) -> DataFrame:
    """Fold per-batch sketch rows into one row per column.

    HLL merges through the native ``hll_union_agg``. KLL has no aggregate
    merge builtin, so the per-batch sketches (one small binary per batch
    — bounded by batch count, not data size) fold pairwise through
    ``kll_sketch_merge_double`` inside a single HOF reduce.
    """
    merged = profiles.groupBy("column").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("n_nulls").cast("long").alias("n_nulls"),
        F.hll_union_agg("hll").alias("hll"),
        F.collect_list("kll").alias("__klls"),  # collect_list drops nulls
    )
    folded = F.when(
        F.size("__klls") > 0,
        F.aggregate(
            F.slice("__klls", 2, 2_000_000_000),
            F.col("__klls")[0],
            lambda acc, x: F.kll_sketch_merge_double(acc, x),
        ),
    )
    return merged.withColumn("kll", folded).drop("__klls")


def sketch_estimates(
    merged: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Decode merged sketches: (column, n_rows, n_nulls, n_distinct_approx,
    q_0.5, ...). Quantile columns are null for non-numeric columns."""
    cols = [
        "column",
        "n_rows",
        "n_nulls",
        F.hll_sketch_estimate("hll").cast("long").alias("n_distinct_approx"),
    ]
    for q in quantiles:
        cols.append(
            F.when(
                F.col("kll").isNotNull(),
                F.kll_sketch_get_quantile_double("kll", F.lit(float(q))),
            ).alias(f"q_{q}")
        )
    return merged.select(*cols)


def estimate_overlap(
    merged_a: DataFrame, merged_b: DataFrame, column: str
) -> DataFrame:
    """Estimate |A ∩ B| for one column across two corpora from their
    sketch artifacts alone — inclusion-exclusion over the HLL union:
    ``|A| + |B| − |A ∪ B|``. No corpus is scanned, nothing joins; this
    is the O(bytes) screen you run BEFORE deciding to pay for an exact
    decontamination join at 100 TB."""
    a = merged_a.filter(F.col("column") == column).select(
        F.col("hll").alias("hll_a")
    )
    b = merged_b.filter(F.col("column") == column).select(
        F.col("hll").alias("hll_b")
    )
    return a.crossJoin(b).select(
        F.lit(column).alias("column"),
        F.hll_sketch_estimate("hll_a").cast("long").alias("n_distinct_a"),
        F.hll_sketch_estimate("hll_b").cast("long").alias("n_distinct_b"),
        F.greatest(
            (
                F.hll_sketch_estimate("hll_a")
                + F.hll_sketch_estimate("hll_b")
                - F.hll_sketch_estimate(F.hll_union("hll_a", "hll_b"))
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_overlap_approx"),
    )


def corpus_card(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str | None = "lang",
    exact: bool = True,
) -> DataFrame:
    """One-row dataset card for a document corpus — the summary a
    training-data pipeline publishes with every snapshot (Datasheets /
    Dolma-style): volume, length distribution, exact-duplication rate,
    and language concentration. With ``exact=True`` every number is
    exact (no sketches), so the card is oracle-gradeable and diffable
    across snapshots.

    Columns: ``n_docs``, ``n_tokens``, ``n_chars``, ``mean_tokens``,
    ``p50_tokens`` (median), ``exact_dup_fraction``
    (1 − distinct md5(text)/docs; NULL texts count as ONE duplicate
    class via a sentinel digest, the ``snapshot_diff`` convention — an
    all-NULL corpus reports n−1 duplicates, not a spurious 1.0 — r8
    advice), and — when ``lang_col`` is given — ``n_langs``,
    ``top_lang``, ``top_lang_fraction``.

    Plan: ONE scan feeding a single global aggregate (count/sum/
    percentile/count_distinct partial-aggregate map-side; the exact
    distinct-digest count is the one real shuffle) plus, for the
    language mode, a lang-cardinality groupBy whose result is rows =
    languages. At 100 TB this is two aggregations over one read — never
    a per-metric pass. Memory bound: the exact ``percentile`` buffers
    every per-doc token count in one reducer (~8 bytes/doc — fine to
    ~1 B docs, a single-task hazard beyond); pass ``exact=False`` for
    ``percentile_approx`` (mergeable sketch, no single-task stage — the
    100 TB dial, same as ``perplexity_buckets``)."""
    from mongo_arrow_spark.operators.text import token_count

    base = df.select(
        F.col(text_col).alias("__t"),
        token_count(text_col).cast("long").alias("__nt"),
        F.length(text_col).cast("long").alias("__nc"),
        *( [F.col(lang_col).alias("__lang")] if lang_col else [] ),
    )
    p50 = (
        F.expr("percentile(__nt, 0.5)")
        if exact
        else F.expr("percentile_approx(__nt, 0.5, 10000)")
    )
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("n_tokens"),
        F.sum("__nc").cast("long").alias("n_chars"),
        (F.sum("__nt") / F.count(F.lit(1))).cast("double").alias("mean_tokens"),
        p50.cast("double").alias("p50_tokens"),
        (
            1.0
            - F.countDistinct(F.coalesce(F.md5("__t"), F.lit("__null__")))
            / F.count(F.lit(1))
        ).cast("double").alias("exact_dup_fraction"),
    )
    if not lang_col:
        return agg
    langs = (
        base.groupBy("__lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            # deterministic mode: max by (count, lang) — ties break to
            # the lexicographically LAST language, same in SQL
            F.max(F.struct(F.col("n"), F.col("__lang"))).alias("__m"),
            F.sum("n").alias("__tot"),
        )
        .select(
            "n_langs",
            F.col("__m.__lang").alias("top_lang"),
            (F.col("__m.n") / F.col("__tot")).cast("double").alias(
                "top_lang_fraction"
            ),
        )
    )
    return agg.crossJoin(langs)


def numeric_drift(
    left: DataFrame,
    right: DataFrame,
    column: str,
    n_buckets: int = 16,
    bounds: tuple | None = None,
) -> DataFrame:
    """Population-stability report for a numeric column between two
    corpora (a release and its successor, a fresh crawl vs the standing
    corpus): a fixed-width histogram over SHARED bounds, per-bucket
    fractions on both sides, and each bucket's PSI contribution —
    ``sum(psi_term)`` is the population stability index (the industry
    screen: ≳0.1 moderate shift, ≳0.2 major). The numeric sibling of
    ``text.corpus_drift`` (lexical JS): catches a crawl whose document
    LENGTHS or quality scores moved even when its vocabulary did not.

    Bucketing is INTEGER-exact for integral columns — ``bucket =
    clamp(((x - lo) * n) div (hi - lo + 1), 0, n-1)`` in pure int64
    arithmetic, so the per-bucket counts (and the exact fractions built
    from them) are engine-portable and hash-gradeable; fractional
    columns use ``floor((x - lo) · n / (hi - lo))`` in double math
    (``x == hi`` clamps into the last bucket; float-boundary rows are
    the usual cross-engine hazard). NULLs are excluded on both sides
    (``not_null`` is the expectations tier's business). ``bounds``
    overrides the shared ``(lo, hi)``; by default they come from one
    bounded min/max aggregate over each side.

    PSI term: ``(frac_right - frac_left) * ln((frac_right + ε) /
    (frac_left + ε))``, ε = 1e-6 — the standard smoothed form, ≥ 0,
    finite on empty buckets.

    Plan at 100 TB: one min/max agg per side (1-row, broadcast back as
    the shared bounds — the repo's 1-row stats-frame crossJoin
    pattern), one groupBy(bucket) count per side (map-side partial,
    ≤ n_buckets rows shuffle), a full-outer join on the bucket id and
    a broadcast of the two 1-row totals. Payloads never shuffle."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    c = F.col(column)
    sides = [
        df.filter(c.isNotNull()).select(c.alias("__x"))
        for df in (left, right)
    ]
    if bounds is not None:
        lo_lit, hi_lit = bounds
        bframe = None
    else:
        mm = [
            s.agg(
                F.min("__x").alias(f"__lo_{i}"),
                F.max("__x").alias(f"__hi_{i}"),
            )
            for i, s in enumerate(sides)
        ]
        bframe = (
            mm[0]
            .join(mm[1])  # 1×1 rows
            .select(
                F.least("__lo_0", "__lo_1").alias("__lo"),
                F.greatest("__hi_0", "__hi_1").alias("__hi"),
            )
        )
    # the int64 `div` path needs integral operands EVERYWHERE it
    # touches — both sides' column AND any caller-supplied bounds
    # (a float bound against a long column used to crash the analyzer
    # with a div-requires-BIGINT mismatch)
    int_types = (T.LongType, T.IntegerType, T.ShortType)
    integral = all(
        isinstance(df.schema[column].dataType, int_types)
        for df in (left, right)
    ) and (
        bounds is None
        or all(isinstance(b, int) and not isinstance(b, bool) for b in bounds)
    )
    hists = []
    for i, s in enumerate(sides):
        if bframe is not None:
            s = s.join(F.broadcast(bframe))  # 1-row stats frame
        else:
            s = s.withColumns(
                {"__lo": F.lit(lo_lit), "__hi": F.lit(hi_lit)}
            )
        if integral:
            # pure int64 arithmetic (`div`, not `/` — Spark's `/` on
            # longs is DOUBLE division): engine-portable, hash-exact.
            # span = hi-lo+1 covers the inclusive integer range, so
            # raw < n_buckets without clamping; the clamp only guards
            # caller-supplied bounds narrower than the data
            raw = F.expr(
                f"((__x - __lo) * {int(n_buckets)})"
                " div (__hi - __lo + 1)"
            )
        else:
            span = F.col("__hi").cast("double") - F.col("__lo").cast(
                "double"
            )
            raw = F.when(span > 0, F.floor(
                (F.col("__x").cast("double") - F.col("__lo"))
                * F.lit(n_buckets)
                / span
            )).otherwise(F.lit(0))
        bucket = F.least(
            F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)
        ).cast("int")
        hists.append(
            s.select(bucket.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias(f"n_{i}"))
        )
    from pyspark.sql import Window

    j = (
        hists[0]
        .join(hists[1], "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_0", F.lit(0)).cast("long").alias("n_left"),
            F.coalesce("n_1", F.lit(0)).cast("long").alias("n_right"),
        )
    )
    # totals via a whole-frame window over the JOINED histogram —
    # ≤ n_buckets rows, so the single-partition window is bounded and
    # each input side is scanned exactly once (a separate total agg
    # would re-run the scan feeding the histogram)
    w = Window.partitionBy()
    fl = F.col("n_left").cast("double") / F.greatest(
        F.sum("n_left").over(w), F.lit(1)
    ).cast("double")
    fr = F.col("n_right").cast("double") / F.greatest(
        F.sum("n_right").over(w), F.lit(1)
    ).cast("double")
    eps = F.lit(1e-6)
    return (
        j.select(
            "bucket",
            "n_left",
            "n_right",
            fl.alias("frac_left"),
            fr.alias("frac_right"),
            ((fr - fl) * F.log((fr + eps) / (fl + eps))).alias(
                "psi_term"
            ),
        )
        .orderBy("bucket")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level diff between two corpus snapshots: one row per
    status — ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (both, md5(text) differs — NULL text treated as its own
    digest value, so NULL→text and text→NULL count as changes),
    ``unchanged`` — with doc and token counts per side. The companion
    to ``corpus_card`` (what IS a snapshot) and ``corpus_drift`` (how
    the token distribution moved): what you read before promoting a
    re-crawl, after an ingest-gate run, or to audit a curation change.

    Precondition: ids are UNIQUE within each snapshot (the corpus id
    contract every op in this repo assumes; run ``exact_dedup`` on the
    id first if a pre-dedup re-crawl may repeat them) — a duplicated id
    multiplies through the full-outer join and inflates its status
    counts by the duplication factor.

    Plan: both sides reduce to (id, digest, n_tokens) projections, ONE
    full-outer hash join on the id, then a 4-row aggregate — no
    payloads shuffle beyond the 16-byte digests; at 100 TB this is the
    cheapest exact statement of "what changed".
    """
    from mongo_arrow_spark.operators.text import token_count

    def side(df, tag):
        return df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.md5(F.col(text_col)), F.lit("__null__")).alias(
                f"dg_{tag}"
            ),
            F.coalesce(token_count(text_col).cast("long"), F.lit(0)).alias(
                f"tok_{tag}"
            ),
        )

    j = side(old, "old").join(side(new, "new"), "id", "full_outer")
    status = (
        F.when(F.col("dg_old").isNull(), F.lit("added"))
        .when(F.col("dg_new").isNull(), F.lit("removed"))
        .when(F.col("dg_old") != F.col("dg_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.withColumn("status", status)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.coalesce("tok_old", F.lit(0)))
            .cast("long")
            .alias("tokens_old"),
            F.sum(F.coalesce("tok_new", F.lit(0)))
            .cast("long")
            .alias("tokens_new"),
        )
        .orderBy("status")
    )
