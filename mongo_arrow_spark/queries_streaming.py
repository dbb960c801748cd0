"""Streaming battery entries: the windowed stream aggregate, executed with
an availableNow trigger over a jsonl replay of the events table, checked
against the batch SQL oracle — streaming results must equal batch results
on the same data (the correctness bar for any streaming engine)."""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import functions as F

from mongo_arrow_spark.queries import _t, query
from mongo_arrow_spark.operators import similarity
from mongo_arrow_spark.operators import text as text_ops


def _events_jsonl_dir(spark, sf_dir: str) -> str:
    """Materialize events as 4 jsonl arrival files (idempotent per sf_dir).

    Executor-side: repartitionByRange(4, event_id) → the engine's own
    ``documents`` sink writes one jsonl part per range. Nothing flows
    through the driver — at 100 TB the arrival replay is a distributed
    write, not a driver materialization."""
    from mongo_arrow_spark.sources import register

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    d = f"/tmp/mas_stream_{tag}"
    marker = os.path.join(d, "_READY")
    if os.path.exists(marker):
        return d
    register(spark)
    (
        _t(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .repartitionByRange(4, "event_id")
        .write.format("documents")
        .mode("overwrite")
        .save(d)
    )
    open(marker, "w").close()
    return d


@query(
    "streaming_hourly_counts",
    """
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_hourly(spark, sf_dir):
    """Structured Streaming microbatch replay == batch aggregation: the
    watermarked windowed count over the stream hash-matches the batch SQL
    oracle on identical data."""
    from mongo_arrow_spark.streaming import read_document_stream, windowed_aggregate

    d = _events_jsonl_dir(spark, sf_dir)
    stream = read_document_stream(
        spark,
        d,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    agg = windowed_aggregate(stream, window="1 hour", keys=["event_type"])
    name = f"mas_stream_{uuid.uuid4().hex[:8]}"
    (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )
    return spark.table(name).select(
        "window_start", "event_type", F.col("n").cast("long").alias("n")
    )


@query(
    "text_search_tfidf",
    """
    WITH stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN list_contains(string_split(text,' '), 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
             CAST(SUM(CASE WHEN list_contains(string_split(text,' '), 'shuffle') THEN 1 ELSE 0 END) AS DOUBLE) AS df1
      FROM documents)
    SELECT doc_id, score FROM (
      SELECT doc_id,
             ROUND(
               (CASE WHEN df0 > 0 THEN len(list_filter(string_split(text,' '), w -> w = 'spark')) * ln(n / df0) ELSE 0 END) +
               (CASE WHEN df1 > 0 THEN len(list_filter(string_split(text,' '), w -> w = 'shuffle')) * ln(n / df1) ELSE 0 END),
             4) AS score
      FROM documents, stats)
    WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT 10
    """,
)
def q_text_search(spark, sf_dir):
    """TF-IDF keyword ranking — the $text replacement (SURVEY 2.E)."""
    return text_ops.tfidf_search(
        _t(spark, sf_dir, "documents"), ["spark", "shuffle"], k=10
    )


@query("sim_ivf_topk")  # rows-only: KMeans cell boundaries are model state
def q_sim_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return similarity.ivf_topk(emb, list(qvec), k=10, n_clusters=8, n_probe=2).select(
        "vec_id", F.round("score", 4).alias("score")
    )
