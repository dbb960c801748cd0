"""Time-series + skew-operator battery entries, oracle-checked: the as-of
join against DuckDB's native ASOF JOIN, and the salted aggregation against
the plain GROUP BY it must equal."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_arrow_spark.operators.timeseries import asof_join, salted_group_agg
from mongo_arrow_spark.queries import _t, query


@query(
    "ts_asof_join",
    """
    SELECT p.event_id, p.user_id,
           c.event_id AS click_id,
           ROUND(CAST(c.value AS DOUBLE), 2) AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof(spark, sf_dir):
    """Backward as-of join: each purchase gets the user's most recent
    prior click — checked against DuckDB's native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("event_id_asof").alias("click_id"),
        F.round(F.col("value_asof").cast("double"), 2).alias("click_value"),
    )


@query(
    "ts_session_windows",
    """
    WITH lagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events),
    islands AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
      FROM lagged)
    SELECT user_id, MIN(ts) AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM islands GROUP BY user_id, sid
    """,
)
def q_session_windows(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): Spark's native
    session_window vs the classic gaps-and-islands SQL — identical
    sessions. MQL has no equivalent (SURVEY 2.E streaming row)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )


@query(
    "skew_salted_group",
    """
    SELECT event_type,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_salted(spark, sf_dir):
    """Two-phase salted aggregation == plain GROUP BY (the oracle): salt
    splits hot keys in phase 1, phase 2 merges partials."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "__dec", F.col("value").cast("decimal(18,2)")
    )
    out = salted_group_agg(
        ev, ["event_type"], {"total": "__dec"}, count_alias="n", salt=8
    )
    return out.select(
        "event_type",
        F.round(F.col("total").cast("double"), 2).alias("total"),
        "n",
    )


@query(
    "ts_downsample",
    """
    WITH rolled AS (
      SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 4) AS total
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
      FROM rolled GROUP BY 1
    ),
    grid AS (
      SELECT s.event_type, g.b AS bucket
      FROM spans s, LATERAL unnest(generate_series(s.lo, s.hi,
                                                   INTERVAL 1 HOUR)) AS g(b)
    )
    SELECT g.event_type, g.bucket,
           COALESCE(r.n, 0) AS n, COALESCE(r.total, 0) AS total
    FROM grid g LEFT JOIN rolled r
      ON g.event_type = r.event_type AND g.bucket = r.bucket
    ORDER BY g.event_type, g.bucket
    """,
)
def q_downsample(spark, sf_dir):
    """Hypertable rollup: hourly buckets per event type, count + sum,
    densified to a gap-free grid with zero fill — checked against a
    generate_series + left-join DuckDB oracle."""
    from mongo_arrow_spark.operators.timeseries import downsample

    ev = _t(spark, sf_dir, "events")
    out = downsample(
        ev,
        ts_col="ts",
        every="1 hour",
        keys=["event_type"],
        aggs={
            "n": F.count(F.lit(1)).cast("long"),
            "total": F.round(F.sum("value"), 4),
        },
        fill="zero",
    )
    return out.select("event_type", "bucket", "n", "total").orderBy(
        "event_type", "bucket"
    )


@query(
    "ts_range_join",
    """
    WITH win AS (
      SELECT event_id AS err_id, user_id, ts AS win_start,
             ts + INTERVAL 30 MINUTE AS win_end
      FROM events WHERE event_type = 'error'
    ),
    clicks AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT w.err_id, w.user_id,
           CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks,
           ROUND(CAST(COALESCE(SUM(c.value), 0.0) AS DOUBLE), 2)
             AS click_value
    FROM win w LEFT JOIN clicks c
      ON c.user_id = w.user_id
     AND c.ts >= w.win_start AND c.ts < w.win_end
    GROUP BY w.err_id, w.user_id
    """,
)
def q_ts_range_join(spark, sf_dir):
    """Range (interval) join, r8: each user's error opens a 30-minute
    incident window; the same user's clicks inside [ts, ts+30m) are
    counted and summed. The operator quantizes time into epochs and
    equi-joins on (user, epoch) — a raw inequality join would plan as a
    nested loop — so shuffle mass is points + intervals×2 rows. Oracle =
    DuckDB's native inequality join."""
    from mongo_arrow_spark.operators.timeseries import range_join

    ev = _t(spark, sf_dir, "events")
    windows = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("win_end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id"),
        F.col("value").alias("c_value"),
    )
    joined = range_join(
        clicks, windows, point_ts="c_ts", start_col="win_start",
        end_col="win_end", by="user_id", bucket_seconds=1800, how="inner",
    )
    matched = joined.groupBy("err_id", "user_id").agg(
        F.count("c_id").cast("long").alias("n_clicks"),
        F.round(F.sum("c_value").cast("double"), 2).alias("click_value"),
    )
    # LEFT semantics of the oracle: windows with zero clicks carry 0
    return (
        windows.select("err_id", "user_id")
        .join(matched, ["err_id", "user_id"], "left")
        .fillna({"n_clicks": 0, "click_value": 0.0})
    )
