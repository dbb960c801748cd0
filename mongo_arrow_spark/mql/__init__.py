"""MQL → Catalyst translation layer.

The reference forwards MQL verbatim to the MongoDB server
(reference api.py:175 find ``query``, api.py:252 aggregate ``pipeline``);
the server plans and executes. Here the same language is compiled to
DataFrame transformations so Catalyst/Tungsten plan and execute —
declarative in, declarative out, no hand-scheduled operators.
"""

from mongo_arrow_spark.mql.expressions import translate_expr
from mongo_arrow_spark.mql.match import translate_match
from mongo_arrow_spark.mql.pipeline import apply_pipeline

__all__ = ["translate_expr", "translate_match", "apply_pipeline"]
