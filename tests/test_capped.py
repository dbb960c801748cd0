"""Capped-collection / $natural-order semantics (reference
test_pymongoarrow.py:66-78): retention cap + insertion-order reads."""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.api import CappedCollection, find, natural_order

from conftest import SF_DIR


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def test_capped_retains_newest(spark, orders):
    total = orders.count()
    cap = 100
    coll = CappedCollection(orders, cap, "orders_capped")
    assert total > cap, "test corpus must exceed the cap"
    # data was capped — mirror of the reference's shape assertion
    table = coll.find_arrow_all({}, projection={"o_orderkey": 1})
    assert table.shape == (cap, 1)
    # retained rows are the NEWEST in natural (scan) order
    all_keys = [r["o_orderkey"] for r in natural_order(orders)
                .orderBy("__natural__").select("o_orderkey").collect()]
    assert table.column("o_orderkey").to_pylist() == all_keys[-cap:]


def test_capped_find_filter_preserves_natural_order(spark, orders):
    coll = CappedCollection(orders, 200)
    pdf = coll.find_pandas_all(
        {"o_orderstatus": "F"}, projection={"o_orderkey": 1, "o_orderstatus": 1}
    )
    assert (pdf["o_orderstatus"] == "F").all()
    # reverse natural order flips the frame
    rev = coll.find_pandas_all(
        {"o_orderstatus": "F"},
        projection={"o_orderkey": 1, "o_orderstatus": 1},
        sort=[("$natural", -1)],
    )
    assert list(rev["o_orderkey"]) == list(pdf["o_orderkey"])[::-1]


def test_natural_sort_on_plain_df(spark, orders):
    out = find(orders.limit(50), sort=[("$natural", 1)])
    assert "__natural__" not in out.columns  # internal column is stripped
    assert out.count() == 50


def test_natural_mixed_sort_rejected(spark, orders):
    with pytest.raises(ValueError, match="natural"):
        find(orders, sort=[("$natural", 1), ("o_orderkey", 1)]).count()
