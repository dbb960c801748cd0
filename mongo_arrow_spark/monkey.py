"""patch_all(): graft the engine API onto pyspark DataFrame.

The reference grafts its eight find/aggregate methods onto
``pymongo.Collection`` (reference monkey.py:19-40) so users call
``coll.find_arrow_all(...)`` directly. Our host object is the DataFrame:

    >>> from mongo_arrow_spark.monkey import patch_all
    >>> patch_all()
    >>> df.mql_find({"x": {"$gt": 2}})            # lazy DataFrame
    >>> df.mql_aggregate([...]).toPandas()
    >>> df.find_arrow_all({"x": 1})               # pyarrow.Table

Method names carry an ``mql_`` prefix for the lazy forms to avoid clashing
with existing DataFrame attrs; the terminal ``*_all`` forms keep the
reference's exact names (DataFrame has no such attributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mongo_arrow_spark import api


def patch_all() -> None:
    DataFrame.mql_find = lambda self, query=None, **kw: api.find(self, query, **kw)
    DataFrame.mql_aggregate = lambda self, pipeline, **kw: api.aggregate(
        self, pipeline, **kw
    )
    for name in (
        "find_arrow_all",
        "find_pandas_all",
        "find_numpy_all",
        "find_polars_all",
    ):
        fn = getattr(api, name)
        setattr(
            DataFrame,
            name,
            (lambda f: lambda self, query=None, **kw: f(self, query, **kw))(fn),
        )
    for name in (
        "aggregate_arrow_all",
        "aggregate_pandas_all",
        "aggregate_numpy_all",
        "aggregate_polars_all",
    ):
        fn = getattr(api, name)
        setattr(
            DataFrame,
            name,
            (lambda f: lambda self, pipeline, **kw: f(self, pipeline, **kw))(fn),
        )
