"""Streaming transformations over change-stream-shaped document streams.

Scale notes:
- Every aggregation is keyed and watermarked → state store size is bounded
  by (keys × watermark horizon), not stream length; use the RocksDB state
  store provider on real clusters.
- ``stream_dedup_within_watermark`` is the streaming twin of the batch
  exact-dedup operator: state holds one digest per doc inside the horizon.
- ``running_totals_stateful`` shows the applyInPandasWithState extension
  point for operators Spark lacks natively.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mongo_arrow_spark.sources import register


def read_document_stream(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    **options,
) -> DataFrame:
    """readStream from a growing directory of JSON-lines document files via
    the registered ``documents`` source (change-stream shape: each new file
    is a microbatch of change events)."""
    register(spark)
    reader = (
        spark.readStream.format("documents")
        .option("declaredSchema", schema_ddl)
        .option("path", path)
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling/sliding window counts+sums with late-data watermark."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), *(keys or []))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *(keys or []),
            "n",
            "total_value",
        )
    )


def sessionized(
    stream: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (gap-based) per key — MQL has no equivalent; Spark's
    session_window handles merge/extend in the state store."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key,
            "n_events",
            "total_value",
        )
    )


def stream_dedup(stream: DataFrame, cols: list[str]) -> DataFrame:
    """Exact streaming dedup on key columns — unbounded state; prefer the
    watermarked variant for long-running jobs."""
    return stream.dropDuplicates(cols)


def stream_dedup_within_watermark(
    stream: DataFrame, cols: list[str], ts_col: str = "ts", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming exact dedup with bounded state: duplicates arriving within
    the watermark horizon are dropped; state expires with the watermark."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(cols)


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals_stateful(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-key running
    event count + value total carried across microbatches — the extension
    point for operators with no built-in (custom sketches, CDC merge,
    decaying counters)."""

    def update(
        key_tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key_tuple[0]], "n_events": [n], "total_value": [total]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stateful(
    stream: DataFrame,
    key: str = "user_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Session windows as a custom stateful operator on Spark 4's
    ``transformWithStateInPandas`` — the successor extension point to
    applyInPandasWithState, with typed state variables and TIMERS: a
    session closes (and emits one summary row) when no event for its key
    arrives within ``gap_seconds`` of processing time, instead of waiting
    for the next event of that key to notice the gap.

    Output per closed session: (key, n_events, total_value,
    session_start, session_end). State per key is one 4-tuple regardless
    of session length — at cluster scale this is the RocksDB-backed path
    for sketches/CDC-merge/decaying-counter operators that built-in
    session windows (``sessionized``) can't express.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("t0", T.TimestampType()),
            T.StructField("t1", T.TimestampType()),
        ]
    )

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState("session", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            n, total = 0, 0.0
            t0 = t1 = None
            if self.state.exists():
                n, total, t0, t1 = self.state.get()
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                total += float(pdf["value"].sum())
                # state serialization takes python datetimes, not
                # pandas.Timestamp
                lo = pdf["ts"].min().to_pydatetime()
                hi = pdf["ts"].max().to_pydatetime()
                t0 = lo if t0 is None else min(t0, lo)
                t1 = hi if t1 is None else max(t1, hi)
            self.state.update((n, total, t0, t1))
            # re-arm the inactivity timer: fires gap_seconds after the
            # latest batch containing this key (materialize the listing
            # first — deleting while the iterator streams corrupts the
            # state-server protocol)
            for old in list(self.handle.listTimers()):
                self.handle.deleteTimer(old)
            self.handle.registerTimer(
                timer_values.getCurrentProcessingTimeInMs() + gap_seconds * 1000
            )
            return iter(())  # emission happens on timer expiry

        def handleExpiredTimer(self, key, timer_values, expired_timer_info):
            if self.state.exists():
                n, total, t0, t1 = self.state.get()
                self.state.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "n_events": [n],
                        "total_value": [total],
                        "session_start": [t0],
                        "session_end": [t1],
                    }
                )

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
