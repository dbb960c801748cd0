"""Polars extension-dtype mirror (polars_types.py). The polars wheel is
absent in this container (installs disallowed), so the typed-path tests
skip automatically and validate the day the environment gains the wheel;
the gating behavior itself is testable everywhere."""

import pytest

from mongo_arrow_spark import polars_types as plt


def test_module_imports_without_polars():
    """The module must import cleanly with or without polars, and the
    registration helper must report capability honestly."""
    got = plt.register_polars_extension_types()
    assert got in (True, False)
    if not plt.HAVE_POLARS:
        assert got is False


def test_extension_classes_when_polars_present():
    pl = pytest.importorskip("polars")
    if not plt._HAVE_EXTENSION_API:
        pytest.skip("this polars build lacks the extension-type API")
    assert plt.register_polars_extension_types() is True
    oid = plt.PolarsObjectId()
    assert oid == plt.PolarsObjectId()
    assert oid != plt.PolarsCode()
    assert oid.ext_name() == "mongo_arrow_spark.objectid"
    assert plt.PolarsCode().ext_storage() == pl.String
    assert plt.PolarsDecimal128().ext_storage() == pl.Binary


def test_find_polars_all_typed_roundtrip(spark, tables):
    pytest.importorskip("polars")
    from mongo_arrow_spark.api import find_polars_all

    out = find_polars_all(
        tables["orders"],
        {"o_totalprice": {"$gt": 300000}},
        projection={"o_orderkey": 1, "o_totalprice": 1},
    )
    assert out.height == (
        tables["orders"].filter("o_totalprice > 300000").count()
    )
    assert set(out.columns) == {"o_orderkey", "o_totalprice"}


def test_apply_bson_dtypes_tags_tagged_columns(spark):
    pl = pytest.importorskip("polars")
    if not plt._HAVE_EXTENSION_API:
        pytest.skip("this polars build lacks the extension-type API")
    from pyspark.sql import types as T

    from mongo_arrow_spark.bson_types import METADATA_KEY

    struct = T.StructType(
        [
            T.StructField(
                "oid", T.BinaryType(), metadata={METADATA_KEY: "objectid"}
            ),
            T.StructField("plain", T.LongType()),
        ]
    )
    pldf = pl.DataFrame({"oid": [b"a" * 12], "plain": [1]})
    typed = plt.apply_bson_dtypes(pldf, struct)
    assert typed["oid"].dtype == plt.PolarsObjectId()
    assert typed["plain"].dtype == pldf["plain"].dtype
