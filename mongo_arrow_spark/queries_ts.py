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
