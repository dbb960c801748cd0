"""Aggregated query battery: importing this module registers every query.

``QUERIES``/``ORACLES`` are shared registries defined in queries.py;
queries_mql.py and queries_ops.py add to them at import time.
"""

from mongo_arrow_spark.queries import ORACLES, QUERIES
import mongo_arrow_spark.queries_extra  # noqa: F401 — set ops/pivot/cube/HOFs
import mongo_arrow_spark.queries_mql  # noqa: F401 — registers MQL queries
import mongo_arrow_spark.queries_ops  # noqa: F401 — registers operator queries
import mongo_arrow_spark.queries_streaming  # noqa: F401 — streaming + tfidf + ivf
import mongo_arrow_spark.queries_ts  # noqa: F401 — as-of join + salted agg

__all__ = ["QUERIES", "ORACLES"]
