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

# The driver grades only the FIRST 50 registered queries. Expose the
# battery with every oracle-backed entry first (stable registration order)
# and rows-only entries at the tail, so no oracle is silently dropped.
# tests/test_battery.py pins the invariant (≤50 oracle-backed, all within
# the graded window).
QUERIES = {
    **{n: f for n, f in QUERIES.items() if n in ORACLES},
    **{n: f for n, f in QUERIES.items() if n not in ORACLES},
}

__all__ = ["QUERIES", "ORACLES"]
