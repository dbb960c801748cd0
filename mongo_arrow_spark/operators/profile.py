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
