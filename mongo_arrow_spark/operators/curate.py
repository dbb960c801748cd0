"""End-to-end corpus curation: the composed training-data pipeline.

Every large-scale pretraining corpus goes through the same sequence —
quality filter → exact dedup → fuzzy dedup → decontaminate → redact →
split → chunk (C4, Gopher/MassiveText, RefinedWeb, Dolma all publish
variants of it). Each stage exists in this engine as a first-class
operator; ``curate`` composes them into ONE lazy DataFrame program so
Catalyst plans the whole pipeline together: filters run scan-side before
any shuffle, stages that are pure projections (quality flags, PII
redaction, split assignment, chunking) fuse into the surrounding
whole-stage-codegen spans, and the only exchanges are the ones the
algorithms irreducibly need (the dedup digest agg, the shingle posting
join, the component propagation, the decontamination anti-join).

Shuffle census at 100 TB (why the stage ORDER is what it is): quality
filtering is free and typically drops 30–60 % of raw web text, so it runs
first and every downstream shuffle moves only survivors; exact dedup
shuffles 24-byte (digest, id) pairs, never payloads; fuzzy dedup and
decontamination shuffle 8-byte hashed shingle keys; the final
split+chunk pass is map-only. Payload bytes cross the wire zero times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import dedup as dedup_ops
from mongo_arrow_spark.operators import quality as quality_ops


def curate(
    df: DataFrame,
    holdout: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    # quality gate (Gopher-style bounds; see quality.gopher_quality_flags)
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    # fuzzy dedup (None threshold disables the fuzzy stage)
    jaccard_n: int = 3,
    jaccard_threshold: float | None = 0.3,
    max_df: int | None = 1000,
    # decontamination vs the holdout corpus
    decontaminate_threshold: float = 0.8,
    # PII
    redact_pii: bool = True,
    # split + chunk
    train: float = 0.8,
    val: float = 0.1,
    split_salt: str = "split",
    chunk_size: int | None = None,
    stride: int | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns the curated corpus (or, when
    ``chunk_size`` is set, the curated CHUNKS with ``chunk_id``/``n_tokens``
    provenance), each row tagged with its ``split``.

    Deterministic end to end: quality bounds are closed-form, dedup
    winners are min-id, split assignment is md5-hash — the whole pipeline
    is reproducible row-for-row across engines and re-runs (graded
    against a single DuckDB SQL oracle in the battery).

    Stages other than connected components stay lazy; fuzzy dedup's
    component propagation is iterative (O(log n) rounds of driver-side
    convergence checks — see dedup.connected_components), so calling this
    with ``jaccard_threshold`` set triggers those bounded actions.
    """
    # 1. quality gate — pure projection + filter, runs scan-side
    flagged = quality_ops.gopher_quality_flags(
        df,
        text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        max_mean_word_len=max_mean_word_len,
        min_mean_word_len=min_mean_word_len,
        max_symbol_word_ratio=max_symbol_word_ratio,
    )
    kept = flagged.filter(F.col("q_keep")).select(df.columns)

    # 2. exact dedup — digest+id shuffle only
    kept = dedup_ops.exact_dedup(kept, id_col, text_col)

    # 3. fuzzy dedup — candidate pairs → components → min-id survivors
    if jaccard_threshold is not None:
        pairs = dedup_ops.ngram_jaccard_pairs(
            kept,
            id_col=id_col,
            text_col=text_col,
            n=jaccard_n,
            threshold=jaccard_threshold,
            max_df=max_df,
        )
        comps = dedup_ops.connected_components(pairs)
        kept = dedup_ops.dedup_survivors(kept, comps, id_col)

    # 4. decontamination — drop train docs near-matching any holdout doc
    if holdout is not None:
        kept = dedup_ops.decontaminate(
            kept,
            holdout,
            id_col=id_col,
            text_col=text_col,
            n=jaccard_n,
            threshold=decontaminate_threshold,
            max_df=max_df,
        )

    # 5. PII redaction — regex projection
    if redact_pii:
        kept = kept.withColumn(text_col, quality_ops.pii_redact(text_col))

    # 6. deterministic split assignment — md5 projection
    kept = quality_ops.train_split(
        kept, id_col=id_col, train=train, val=val, salt=split_salt
    )

    # 7. chunking — posexplode of token windows
    if chunk_size is not None:
        carry = [c for c in kept.columns if c not in (id_col, text_col)]
        chunks = quality_ops.chunk_tokens(
            kept,
            id_col=id_col,
            text_col=text_col,
            chunk_size=chunk_size,
            stride=stride or chunk_size,
        )
        kept = chunks.join(kept.select(id_col, *carry), id_col)
    return kept


def curation_report(
    df: DataFrame,
    curated: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One-row funnel summary: input docs, surviving docs/chunks, and the
    per-split breakdown — the numbers a pipeline run reports to its
    operator. Two count aggs, no payload movement."""
    total = df.select(F.count(F.lit(1)).cast("long").alias("n_input"))
    split_col = "split" if "split" in curated.columns else None
    out = curated.agg(
        F.count(F.lit(1)).cast("long").alias("n_output"),
        F.countDistinct(id_col).cast("long").alias("n_docs"),
        *(
            [
                F.sum(F.when(F.col(split_col) == s, 1).otherwise(0))
                .cast("long")
                .alias(f"n_{s}")
                for s in ("train", "val", "test")
            ]
            if split_col
            else []
        ),
    )
    return total.crossJoin(out)
