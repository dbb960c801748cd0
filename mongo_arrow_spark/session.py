"""SparkSession bootstrap tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configuration is chosen so
the same code scales to a multi-executor cluster: AQE on (runtime re-plan,
skew-join splitting, partition coalescing), Arrow transfer on (every
pandas/UDF boundary is Arrow-batched), shuffle partitions sized to the
parallelism rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_spark(
    app_name: str = "mongo_arrow_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # driver corpus stores events.ts as TIMESTAMP(NANOS); Spark has no
        # nanos type — read as long and convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        # local corpus files are ~1-10 MB; split small so local[N] scans in
        # parallel (production keeps the 128 MB default — row groups of
        # real 100 TB tables are sized for it)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _ns_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (nanosAsLong conf); we restore TimestampType at µs resolution
    (footer-only check, driver-side, O(1))."""
    import pyarrow.parquet as pq

    try:
        schema = pq.ParquetFile(path).schema_arrow
    except Exception:
        return []
    return [f.name for f in schema if str(f.type) == "timestamp[ns]"]


def read_documents_parquet(spark: SparkSession, path: str):
    """Read a parquet file, restoring ns-timestamp columns to TimestampType."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    for col in _ns_timestamp_cols(path):
        # integer `div`, NOT `/`: float division of ~1e18 ns loses the
        # last microsecond (53-bit mantissa) — truncate exactly like
        # DuckDB's ns→µs conversion
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict:
    """Load the driver corpus as a name->DataFrame dict and register temp views."""
    out = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = read_documents_parquet(spark, path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
