"""Bucketed (hash-partitioned, co-located) table storage.

The 100 TB join problem: `orders ⋈ lineitem` on orderkey shuffles BOTH
fact tables every time the join runs. Bucketing pays that shuffle once at
write time — each table is hash-partitioned into N buckets on the join
key and optionally sorted within buckets — after which every join or
aggregation on the bucket key is exchange-free: Spark's bucketed scan
reports `HashPartitioning(key, N)` as its output partitioning, Catalyst
sees the join's required distribution already satisfied, and the
SortMergeJoin (or bucket-local hash aggregate) runs with ZERO Exchange
operators. At 1000 executors this converts the dominant repeated cost of
a fact-fact join into a one-time layout decision.

The reference engine delegates physical layout to the server's storage
engine (collections + indexes); bucketed parquet tables are the Spark
counterpart of "create the index once, every query benefits"
(reference: bindings/python/pymongoarrow/api.py — find/aggregate assume
server-side layout). This module is therefore new capability, not parity.

Rules to get the exchange-free plan (enforced/validated here):

- both sides bucketed on the SAME columns with the SAME bucket count
  (mismatched counts: Spark 3.1+ can still avoid one side's shuffle via
  bucket coalescing when one count divides the other);
- the join keys must be exactly the bucket columns (a superset introduces
  an Exchange);
- ``spark.sql.sources.bucketing.enabled`` must be true (default);
- bucket pruning: an equality filter on the bucket column scans 1/N of
  the files — visible as ``SelectedBucketsCount`` in the scan node.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str] | str,
    num_buckets: int = 32,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
    file_format: str = "parquet",
) -> None:
    """Persist ``df`` as an external bucketed table at ``path``.

    One shuffle now (hash on ``bucket_cols`` into ``num_buckets`` files per
    write task's partition), zero shuffles for every later join/agg on
    those columns. ``sort_cols`` additionally sorts within each bucket so
    sort-merge joins skip their per-task sort too.

    ``num_buckets`` sizing at scale: target bucket files of 100 MB–1 GB —
    for a 100 TB table that is O(100k) buckets, NOT 32; the local default
    is small only because the test corpus is. Bucket counts should be
    chosen once per key domain so all co-joining tables agree.
    """
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = (
        df.write.format(file_format)
        .mode(mode)
        .option("path", os.path.abspath(path))
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the scan carries the bucket layout as
    its output partitioning (this is what lets Catalyst elide Exchanges —
    a plain ``spark.read.parquet(path)`` of the same files would NOT)."""
    return spark.table(table)


def bucket_spec(spark: SparkSession, table: str) -> dict:
    """Bucketing metadata of a saved table: columns, count, sort columns."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: r.data_type for r in rows}
    spec = {
        "num_buckets": int(info.get("Num Buckets", "0") or 0),
        "bucket_cols": _parse_cols(info.get("Bucket Columns", "")),
        "sort_cols": _parse_cols(info.get("Sort Columns", "")),
    }
    return spec


def _parse_cols(s: str) -> list[str]:
    # DESCRIBE renders e.g. [`o_orderkey`]
    return [c.strip(" `") for c in s.strip("[]").split(",") if c.strip(" `")]


def colocated_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key.

    This is a plain ``.join`` — the value is the *contract*: callers use
    it where they are asserting co-location, and the plan-shape test pins
    that the physical plan contains no Exchange. If an Exchange appears,
    the layout rules above were violated (different bucket counts, key
    superset, bucketing disabled) and the assertion in the test catches
    the regression rather than silently paying a 100 TB shuffle.
    """
    return left.join(right, on=on, how=how)
