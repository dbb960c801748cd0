"""API-surface tests: exporters, schema enforcement (allow_invalid),
monkey-patched DataFrame methods — reference test layers 3 (round-trip
across output formats, test_arrow.py/test_pandas.py/test_numpy.py)."""

import numpy as np
import pytest

import mongo_arrow_spark as mas
from mongo_arrow_spark.monkey import patch_all


@pytest.fixture(scope="module")
def coll(spark, tables):
    return mas.Collection(tables["orders"], "orders", collections=tables)


def test_find_arrow_all(coll, tables):
    t = coll.find_arrow_all({"o_orderstatus": "F"})
    assert t.num_rows == tables["orders"].filter("o_orderstatus='F'").count()
    assert t.column_names == tables["orders"].columns


def test_find_numpy_all(coll):
    d = coll.find_numpy_all({"o_orderkey": {"$lt": 100}})
    assert isinstance(d["o_totalprice"], np.ndarray)
    assert d["o_totalprice"].dtype == np.float64
    assert len(d["o_orderkey"]) == coll.find({"o_orderkey": {"$lt": 100}}).count()


def test_find_polars_all_gated(coll):
    pytest.importorskip("polars")
    pl_df = coll.find_polars_all({"o_orderkey": {"$lt": 10}})
    assert pl_df.height == 10


def test_schema_strict_vs_allow_invalid(spark):
    df = spark.createDataFrame([("1",), ("nope",)], "v string")
    schema = mas.Schema({"v": int})
    # permissive: invalid value nulls out (reference allow_invalid=True)
    rows = mas.find(df, schema=schema, allow_invalid=True).collect()
    assert [r["v"] for r in rows] == [1, None]
    # strict: ANSI cast raises at execution (reference default raises)
    with pytest.raises(Exception):
        mas.find(df, schema=schema).collect()


def test_schema_missing_field_null_column(spark, tables):
    schema = mas.Schema({"o_orderkey": int, "not_there": float})
    out = mas.find(tables["orders"], schema=schema, limit=3)
    assert out.columns == ["o_orderkey", "not_there"]
    assert all(r["not_there"] is None for r in out.collect())


def test_monkey_patch(spark, tables):
    patch_all()
    df = tables["orders"]
    assert df.mql_find({"o_orderkey": {"$lt": 5}}).count() == 5
    t = df.aggregate_arrow_all(
        [{"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}}]
    )
    assert t.num_rows == 3


def test_write_tabulars(spark, tmp_path):
    import pandas as pd

    res = mas.write(
        pd.DataFrame({"a": [1, 2, 3]}), str(tmp_path / "t1"), spark=spark
    )
    assert res.inserted_count == 3
    res2 = mas.write(
        {"a": np.array([1.0, 2.0])}, str(tmp_path / "t2"), spark=spark
    )
    assert res2.inserted_count == 2
    assert spark.read.parquet(str(tmp_path / "t1")).count() == 3


def test_ipc_roundtrip(spark, tables, tmp_path):
    from mongo_arrow_spark.api import read_ipc, write_ipc

    src = tables["nation"].select("n_nationkey", "n_name")
    p = str(tmp_path / "nation.arrow")
    n = write_ipc(src, p)
    assert n == src.count()
    back = read_ipc(spark, p)
    assert sorted(r["n_name"] for r in back.collect()) == sorted(
        r["n_name"] for r in src.collect()
    )


def test_collection_explain_shows_pushdown(spark, tables):
    import mongo_arrow_spark as mas

    coll = mas.Collection(tables["orders"], "orders", collections=tables)
    plan = coll.explain(
        query={"o_totalprice": {"$gt": 300000}},
        projection={"o_orderkey": 1},
    )
    assert "PushedFilters" in plan and "GreaterThan(o_totalprice" in plan
    agg_plan = coll.explain(
        pipeline=[{"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}}],
        mode="simple",
    )
    assert "HashAggregate" in agg_plan


def test_distinct_max_values_cap(spark, tables):
    import mongo_arrow_spark as mas

    coll = mas.Collection(tables["orders"], "orders")
    # low cardinality under the default cap: works
    statuses = coll.distinct("o_orderstatus")
    assert 1 <= len(statuses) <= 3
    # high cardinality over an explicit cap: hard error, not truncation
    with pytest.raises(ValueError, match="max_values"):
        coll.distinct("o_orderkey", max_values=10)
    # explicit opt-out collects everything
    all_keys = coll.distinct("o_orderkey", max_values=None)
    assert len(all_keys) == tables["orders"].select("o_orderkey").distinct().count()


def test_aggregate_let_option(spark, tables):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    out = aggregate(
        tables["orders"],
        [
            {"$match": {"$expr": {"$gt": ["$o_totalprice", "$$cutoff"]}}},
            {"$project": {"_id": 0, "o_orderkey": 1,
                          "tag": "$$label",
                          "scaled": {"$multiply": ["$o_totalprice", "$$ratio"]}}},
        ],
        let={"cutoff": 450000, "label": "$big", "ratio": 2},
    )
    rows = out.collect()
    want = tables["orders"].filter("o_totalprice > 450000").count()
    assert len(rows) == want > 0
    # a bound string literal must NOT be re-read as a field path
    assert all(r["tag"] == "$big" for r in rows)
    assert all(abs(r["scaled"] - 2 * 0) >= 0 for r in rows)
    # unbound $$vars still raise; dotted refs into let bindings are rejected
    with pytest.raises(MQLTranslationError):
        aggregate(tables["orders"],
                  [{"$project": {"x": "$$nope"}}]).columns
    with pytest.raises(MQLTranslationError):
        aggregate(tables["orders"], [{"$project": {"x": "$$v.f"}}],
                  let={"v": {"f": 1}})
