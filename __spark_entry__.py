"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 shape) at sf0.001.
``queries()`` exposes the full battery (TPC-H-style + MQL-translated +
extension operators); ``oracle_sql()`` the DuckDB equivalents. See
mongo_arrow_spark/queries*.py for the determinism contract that makes
hash-matching work (decimal-exact money sums, unique top-k tie-breaks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongo_arrow_spark.battery import ORACLES, QUERIES


def _configure(spark: SparkSession) -> SparkSession:
    # the driver passes its own session; the corpus needs the ns-timestamp
    # legacy conf (events.ts is parquet TIMESTAMP(NANOS))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        # Spark 4.1 hard-raises at scan init if a python data source reader
        # implements pushFilters() while this conf is false; the documents
        # source only attaches the method when pushdown=true is requested,
        # but set it anyway so any session the driver passes can opt in.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # parity with session.get_spark: MQL $mergeObjects is last-wins
        spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    except Exception:
        pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are rows-only."""
    return dict(ORACLES)
