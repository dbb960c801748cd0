"""Distributed Bloom-filter membership index: the incremental-ingest gate.

The 100 TB pattern this serves: a corpus has already been deduplicated
once; new batches arrive continuously. Re-joining every batch against the
full corpus is a corpus-sized shuffle per batch. Instead, build a Bloom
index over the corpus's content fingerprints ONCE (output is ~``num_bits
/ 64`` rows — millions of longs, not billions of documents), then probe
each incoming batch against the index with a join that only moves the
batch and the index, never the corpus.

Guarantees (classic Bloom semantics, pinned by tests):
- **No false negatives**: every key that was inserted probes as
  ``maybe_member = true``. A ``false`` probe is definitely new — safe to
  admit without any further check.
- **Bounded false positives**: a key never inserted probes ``true`` with
  probability ≈ ``(1 - exp(-k*n/m))**k`` (``n`` inserted keys, ``m`` =
  ``num_bits``, ``k`` = ``num_hashes``). FP hits can be resolved by an
  exact check against only the flagged sliver, not the whole corpus.

Scale design:
- Positions come from Kirsch-Mitzenmacher double hashing — two seeded
  ``xxhash64`` passes per key, ``k`` derived positions, all JVM-side
  expressions (no Python on data).
- Build is one explode(k) + groupBy(word) + ``bit_or`` aggregation:
  a single shuffle of (long, long) pairs, partial-aggregated map-side.
- Probe is a left join on ``word`` (uniform hash keys — no skew) followed
  by a per-row all-positions-set check. With default sizing the index is
  far under ``spark.sql.autoBroadcastJoinThreshold`` territory only for
  small corpora; at cluster scale the join shuffles the batch's (k
  positions) and the index once, both tiny next to the corpus.

Reference parity note: the reference (pymongoarrow) has no membership
surface — dedup there is delegated to server-side queries; this operator
is part of the engine's training-data-pipeline tier (SURVEY.md §2
extension block), like dedup/similarity/quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed seeds: probes are only meaningful against an index built with the
# same (seeds, num_bits, num_hashes) triple. Deterministic by design.
_SEED_A = 0x51_5EED
_SEED_B = 0xB10_0F


def _digest(col):
    """Deterministic, null-safe, collision-free content digest for
    join-back keys: NULL encodes as the 1-char tag ``n``; every value
    encodes as ``v:`` + its string cast. The tag byte makes NULL
    unconfusable with ANY value (including ``\\x00`` or the empty
    string), and the string cast makes non-string key columns legal
    md5 inputs."""
    return F.md5(
        F.concat(
            F.when(col.isNull(), F.lit("n")).otherwise(F.lit("v:")),
            F.coalesce(col.cast("string"), F.lit("")),
        )
    )


def _positions(col, num_bits: int, num_hashes: int):
    """Array of ``num_hashes`` bit positions for a key column.

    Kirsch-Mitzenmacher: pos_i = (h1 + i*h2) mod m, with h1/h2 two
    seeded xxhash64 passes. Both hashes are reduced mod m BEFORE the
    affine combination so the arithmetic never wraps a long — Spark 4
    runs ANSI mode by default, where silent wraparound is an error.
    Safe for any num_bits·num_hashes < 2^62.
    """
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(col, F.lit(_SEED_A)), m)
    h2 = F.pmod(F.xxhash64(col, F.lit(_SEED_B)), m)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.pmod(h1 + i.cast("long") * h2, m),
    )


def _word_and_bit():
    """(word, bit) projection over a non-negative ``pos`` column.

    shiftleft's shift amount must be a column-side int expression, so this
    goes through F.expr rather than the python-int-only F.shiftleft API.
    """
    return [
        (F.col("pos") / 64).cast("long").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
    ]


def build_bloom_index(
    df: DataFrame,
    key_col: str = "text",
    *,
    num_bits: int = 1 << 27,
    num_hashes: int = 5,
) -> DataFrame:
    """Fold a corpus into a Bloom bit table: (word long, bits long).

    ``word`` = position // 64, ``bits`` = OR of ``1 << (position % 64)``
    over every inserted key. Sparse: at most ``min(n*k, num_bits/64)``
    rows. Persist it (parquet) and reuse across batches; rebuilding is
    one corpus pass, probing is index-sized.

    Size ``num_bits`` ≈ 10–15 bits per expected key for ~1 % FP at k=5
    (m/n = 10 → ~0.9 %). At 10^11 corpus keys that is ~1.5 Tbit =
    ~24 G rows of longs worst-case — still 3 orders of magnitude under
    the corpus payload, and the build shuffle moves only (long, long).
    """
    pos = _positions(F.col(key_col), num_bits, num_hashes)
    return (
        df.select(F.explode(F.array_distinct(pos)).alias("pos"))
        .select(_word_and_bit())
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def probe_bloom(
    df: DataFrame,
    index: DataFrame,
    key_col: str = "text",
    *,
    num_bits: int = 1 << 27,
    num_hashes: int = 5,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe a batch against a Bloom index built with the same parameters.

    Returns ``df`` plus a boolean ``out_col``: ``false`` ⇒ the key was
    definitely never inserted (admit without further checks); ``true`` ⇒
    inserted OR a false positive (route the sliver to an exact check).

    Plan: explode the batch's k positions, left-join the bit table on
    ``word`` (uniform keys), test each position's bit, then AND them back
    per input row. The corpus itself is never touched.

    The join-back is keyed on ``md5(key_col)`` — a *deterministic* content
    digest, never ``monotonically_increasing_id``: the probe subtree is
    evaluated once per join branch, and after an upstream shuffle the
    partition-internal row order (hence any positional id) can diverge
    between branches / task retries, silently attaching verdicts to the
    wrong rows at cluster scale. The verdict is a pure function of the
    key, so identical keys legitimately share one digest row. The digest
    (``_digest``) is null-safe AND collision-free — NULL gets its own
    tagged encoding, distinct from every value including the literal
    ``\\x00`` string — so non-string keys work and NULL keys join back
    to the same ``xxhash64(NULL)``-position verdict the build side gave
    them rather than silently coalescing to false or sharing a verdict
    row with a sentinel-valued key.
    """
    probe = df.withColumn("__bloom_key", _digest(F.col(key_col)))
    exploded = probe.select(
        "__bloom_key",
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"),
    ).select("__bloom_key", *_word_and_bit())
    hits = (
        exploded.join(index, "word", "left")
        .select(
            "__bloom_key",
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("bit")) != 0)
            ).alias("set"),
        )
        .groupBy("__bloom_key")
        .agg(F.min("set").alias(out_col))
    )
    return (
        probe.join(hits, "__bloom_key", "left")
        .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(False)))
        .drop("__bloom_key")
    )


def bloom_false_positive_rate(
    n_keys: int, num_bits: int = 1 << 27, num_hashes: int = 5
) -> float:
    """Expected FP probability for sizing decisions: (1 - e^{-kn/m})^k."""
    import math

    return (1.0 - math.exp(-num_hashes * n_keys / float(num_bits))) ** num_hashes


def probe_bloom_rowwise(
    df: DataFrame,
    index: DataFrame,
    key_col: str = "text",
    *,
    num_bits: int = 1 << 27,
    num_hashes: int = 5,
    out_col: str = "maybe_member",
    broadcast: bool = True,
) -> DataFrame:
    """Streaming-safe probe: k stream-static left joins, no aggregation.

    ``probe_bloom``'s explode → groupBy → join-back shape is the right
    batch plan (one join regardless of k) but is illegal on a stream
    (the join-back is a stream-stream self-join). This variant keeps
    every check row-local: each of the k positions joins the bit table
    independently and the verdict is a row-level AND — projections and
    stream-static left joins only, valid in append mode.

    With ``broadcast=True`` (default) the bit table ships to executors
    once per micro-batch: at the default sizing (2^27 bits) the index
    is ≤ 32 MB — well inside broadcast range. Set ``broadcast=False``
    for very large indexes; the k shuffle joins still beat re-joining
    the corpus.
    """
    m = F.lit(num_bits)
    h1 = F.pmod(F.xxhash64(F.col(key_col), F.lit(_SEED_A)), m)
    h2 = F.pmod(F.xxhash64(F.col(key_col), F.lit(_SEED_B)), m)
    src = F.broadcast(index) if broadcast else index
    out = df
    flags = []
    for i in range(num_hashes):
        out = (
            out.withColumn(
                f"__bp{i}", F.pmod(h1 + F.lit(i).cast("long") * h2, m)
            )
            .withColumn(f"__bw{i}", (F.col(f"__bp{i}") / 64).cast("long"))
            .withColumn(
                f"__bb{i}",
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % 64 AS INT))"
                ),
            )
        )
        idx_i = src.select(
            F.col("word").alias(f"__iw{i}"), F.col("bits").alias(f"__ib{i}")
        )
        out = out.join(idx_i, out[f"__bw{i}"] == idx_i[f"__iw{i}"], "left")
        flags.append(
            F.col(f"__ib{i}").isNotNull()
            & (F.col(f"__ib{i}").bitwiseAND(F.col(f"__bb{i}")) != 0)
        )
    verdict = flags[0]
    for fl in flags[1:]:
        verdict = verdict & fl
    out = out.withColumn(out_col, verdict)
    drop = [
        f"__{p}{i}" for i in range(num_hashes) for p in ("bp", "bw", "bb", "iw", "ib")
    ]
    return out.drop(*drop)


def probe_and_verify(
    df: DataFrame,
    index: DataFrame,
    corpus: DataFrame,
    key_col: str = "text",
    *,
    num_bits: int = 1 << 27,
    num_hashes: int = 5,
    out_col: str = "is_member",
    broadcast: bool = True,
) -> DataFrame:
    """Zero-loss membership: Bloom probe, then an EXACT check of only the
    flagged sliver against the corpus. ``out_col`` is exact — no false
    positives, no false negatives.

    Plan: rows probing ``false`` are definitely new (Bloom guarantee) and
    skip the corpus entirely. The flagged sliver (~FP-rate × batch plus
    true members) is md5-digested and **broadcast** by default; the
    corpus streams once through a broadcast semi-join projecting only its
    digest — the corpus is scanned (column-pruned) but NEVER shuffled,
    and nothing batch-sized joins anything corpus-sized. Use when the
    FP-sliver loss of ``probe_bloom``+drop is not acceptable; at 100 TB
    the cost over the plain probe is one digest-column corpus scan per
    batch.

    ``broadcast=True`` assumes the sliver is FP-rate-sized. In
    re-submission-heavy ingest (most of the batch IS a member) the
    sliver approaches batch size — pass ``broadcast=False`` there to let
    the exact check run as a shuffle semi-join instead of forcing a
    batch-sized broadcast onto every executor.
    """
    _maybe_bc = F.broadcast if broadcast else (lambda d: d)
    probed = probe_bloom(
        df, index, key_col, num_bits=num_bits, num_hashes=num_hashes,
        out_col="__bloom_maybe",
    )
    sliver = probed.filter(F.col("__bloom_maybe")).select(
        _digest(F.col(key_col)).alias("__digest")
    ).distinct()
    confirmed = (
        corpus.select(_digest(F.col(key_col)).alias("__digest"))
        .join(_maybe_bc(sliver), "__digest", "left_semi")
        .distinct()
    )
    out = (
        probed.withColumn("__digest", _digest(F.col(key_col)))
        .join(
            _maybe_bc(confirmed.withColumn("__hit", F.lit(True))),
            "__digest",
            "left",
        )
        .withColumn(
            out_col,
            F.col("__bloom_maybe") & F.coalesce(F.col("__hit"), F.lit(False)),
        )
        .drop("__digest", "__hit", "__bloom_maybe")
    )
    return out
