"""Time-series operators: as-of join, range bucketing.

As-of join is the canonical "operator Spark lacks" (SURVEY §7 custom-op
list): implemented as a composition of built-ins — tag + union + windowed
last-ignoreNulls — one shuffle on (by, ts), no UDF, no range-explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts within the same ``by`` group (backward as-of).

    Plan: tag both sides, unionByName, one window sorted by (ts, side)
    per group, ``last(..., ignoreNulls)`` carries the latest right values
    forward, then keep left rows. Exactly one shuffle on the group key —
    compare to the naive range-join (quadratic in matches per key).
    Right side sorts before left at equal timestamps (ties match).
    """
    by = [by] if isinstance(by, str) else list(by)
    right_cols = right_cols or [
        c for c in right.columns if c not in by and c != right_ts
    ]
    lhs = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rhs = right.select(
        *by,
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("__side", F.lit(0)).withColumn("__ts", F.col("__rts"))
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]
    unioned = unioned.withColumn(f"{right_ts}{suffix}__src", F.col("__rts"))
    out = unioned
    for c in right_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    out = out.withColumn(
        f"{right_ts}{suffix}",
        F.last(F.col(f"{right_ts}{suffix}__src"), ignorenulls=True).over(w),
    )
    return (
        out.filter(F.col("__side") == 1)
        .drop("__side", "__ts", "__rts", f"{right_ts}{suffix}__src")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Range (interval) join: every ``points`` row pairs with every
    ``intervals`` row satisfying ``start <= ts < end`` (and equal ``by``
    keys when given) — the classic "events inside maintenance windows /
    sessions / incident windows" operator Spark has no native form of
    (a raw inequality join plans as BroadcastNestedLoop/cartesian).

    Plan (scale-safe): time is quantized into ``bucket_seconds`` epochs;
    each point carries its ONE bucket, each interval explodes to the
    buckets it covers, and candidates come from an EQUI-join on
    (``by``…, bucket) with the exact ``start <= ts < end`` refinement
    after. Shuffle mass is |points| + |intervals| × ceil(span/bucket)
    rows — never |points|·|intervals| — and each qualifying pair is
    produced exactly once (a point has exactly one bucket), so no
    dedup pass. Pick ``bucket_seconds`` near the median interval span:
    larger buckets fatten candidate lists, smaller ones fatten the
    interval explosion. Bucketing is on ``unix_micros`` so sub-second
    boundaries land in the right epoch; the end bound stays exclusive.

    ``how``: ``inner`` (matches only) or ``left`` (points with no
    qualifying interval keep NULL interval columns; the no-match side is
    recovered by an anti-join on the full point row, so ``left``
    requires point rows to be distinct). Point and interval column
    names must be disjoint apart from ``by``.

    Streaming: ``inner`` over STREAMING points and a static interval
    table is append-legal as-is (projection + stream-static equi-join +
    filter — streaming == batch parity pinned in tests); ``left`` needs
    the anti-join, so run it inside ``foreachBatch``.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(by)
    if clash:
        raise ValueError(
            f"point/interval column names must be disjoint: {sorted(clash)}"
        )
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    bucket_us = int(bucket_seconds) * 1_000_000

    def epoch_us(df, col):
        # unix_micros rejects TIMESTAMP_NTZ; timestampdiff from the NTZ
        # epoch is the timezone-free equivalent (no session-tz shift, so
        # no DST seam can split an interval's bucket covering)
        if dict(df.dtypes)[col] == "timestamp_ntz":
            return F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
            )
        return F.unix_micros(F.col(col))

    p = points.withColumn(
        "__b", F.floor(epoch_us(points, point_ts) / F.lit(bucket_us))
    )
    iv = (
        intervals.where(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(
                        epoch_us(intervals, start_col) / F.lit(bucket_us)
                    ),
                    # end is exclusive: the last covered epoch holds the
                    # last instant strictly BEFORE end
                    F.floor(
                        (epoch_us(intervals, end_col) - 1) / F.lit(bucket_us)
                    ),
                )
            ),
        )
    )
    matched = p.join(iv, [*by, "__b"]).where(
        (F.col(start_col) <= F.col(point_ts))
        & (F.col(point_ts) < F.col(end_col))
    ).drop("__b")
    if how == "inner":
        return matched
    ivcols = [c for c in intervals.columns if c not in by]
    # null-safe anti-join: plain column-list equality would treat a
    # NULL attribute as unequal to itself, re-emitting every matched
    # NULL-bearing point as a spurious unmatched row
    lhs = p.drop("__b").alias("__l")
    rhs = matched.select(*points.columns).alias("__r")
    cond = None
    for c in points.columns:
        eq = F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}"))
        cond = eq if cond is None else (cond & eq)
    unmatched = lhs.join(rhs, cond, "left_anti")
    for c in ivcols:
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(dict(intervals.dtypes)[c])
        )
    return matched.unionByName(unmatched)


def downsample(
    df: DataFrame,
    ts_col: str = "ts",
    every: str = "1 hour",
    keys: list[str] | tuple = (),
    aggs: dict | None = None,
    fill: str | None = None,
) -> DataFrame:
    """Hypertable-style rollup: fixed ``every`` time buckets per key with
    aggregates, optionally densified to a gap-free bucket grid.

    - ``aggs``: alias → aggregate Column (default ``{"n": count(*)}``).
    - ``fill=None``: only buckets with data (a plain windowed groupBy —
      one shuffle, partial-agg map-side).
    - ``fill="zero"``: per key, every bucket between its min and max
      appears; empty buckets carry 0 (the count/sum semantics).
    - ``fill="locf"``: empty buckets carry the previous bucket's values
      (gauge semantics) — one extra window pass.

    The dense grid is ``sequence(min_bucket, max_bucket, every)`` per
    key — grid size is (span / every) rows per key, independent of event
    count, so densify cost stays trivial next to the rollup shuffle at
    any scale. Composes with $densify/$fill in MQL pipelines
    (mql/pipeline.py); this is the operator-library spelling.
    """
    keys = list(keys)
    aggs = aggs or {"n": F.count(F.lit(1)).cast("long")}
    bucket = F.window(F.col(ts_col), every)["start"].alias("bucket")
    out = df.groupBy(*keys, bucket).agg(
        *[c.alias(a) for a, c in aggs.items()]
    )
    if fill is None:
        return out
    if fill not in ("zero", "locf"):
        raise ValueError("fill must be None, 'zero' or 'locf'")
    grid = (
        out.groupBy(*keys)
        .agg(F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
        .select(
            *keys,
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"interval {every}")
                )
            ).alias("bucket"),
        )
    )
    joined = grid.join(out, [*keys, "bucket"], "left")
    if fill == "zero":
        return joined.fillna(0, subset=list(aggs))
    w = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for a in aggs:
        joined = joined.withColumn(a, F.last(a, ignorenulls=True).over(w))
    return joined


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant aggregation: phase 1 aggregates on (keys, random
    salt) — hot keys split across ``salt`` reducers — phase 2 merges the
    partials on keys alone. Results identical to a plain groupBy (sums and
    counts are reassociative); the win is bounded reducer load at 100 TB
    when one key holds a large share of rows.
    """
    salted = df.withColumn("__salt", (F.rand(42) * salt).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(src).alias(f"__s_{alias}") for alias, src in sum_cols.items()],
        F.count(F.lit(1)).alias("__c"),
    )
    aggs = [
        F.sum(f"__s_{alias}").alias(alias) for alias in sum_cols
    ]
    if count_alias:
        aggs.append(F.sum("__c").cast("long").alias(count_alias))
    return phase1.groupBy(*keys).agg(*aggs)
