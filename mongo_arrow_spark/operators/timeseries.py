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
