"""Type-system parity tests: tz contract (reference F7 / test_datetime.py),
write auto-casts (api.py:626-648), cursor-option warn-and-drop
(api.py:164-170), Schema round-trips."""

import datetime as dt
import warnings

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import mongo_arrow_spark as mas


def test_session_tz_instant_preserved(spark):
    """Reference F7: stored-UTC instants must be instant-equal when the
    session tz changes (values re-render, the instant doesn't move)."""
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))], "id int, ts timestamp"
    )
    utc_val = df.select(F.unix_timestamp("ts")).first()[0]
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "US/Pacific")
        pac_val = df.select(F.unix_timestamp("ts")).first()[0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    assert utc_val == pac_val


def test_ms_truncation_contract(spark):
    """BSON datetimes are ms-resolution (reference lib.pyx:612-615); the
    engine's documented truncation is date_trunc to millisecond."""
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 0, 123456),)], "ts timestamp"
    )
    out = df.select(F.date_trunc("millisecond", "ts").alias("ms")).first()[0]
    assert out.microsecond == 123000


def test_write_auto_convert(spark, tmp_path):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), 1.5)],
        T.StructType(
            [
                T.StructField("d", T.DateType()),
                T.StructField("f", T.FloatType()),
            ]
        ),
    )
    mas.write(df, str(tmp_path / "ac"), spark=spark)
    back = spark.read.parquet(str(tmp_path / "ac"))
    assert isinstance(back.schema["d"].dataType, T.TimestampType)
    assert isinstance(back.schema["f"].dataType, T.DoubleType)
    # opt-out keeps original types (reference auto_convert=False)
    mas.write(df, str(tmp_path / "raw"), spark=spark, auto_convert=False)
    raw = spark.read.parquet(str(tmp_path / "raw"))
    assert isinstance(raw.schema["d"].dataType, T.DateType)


def test_cursor_options_warned_dropped(tables):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = mas.find(tables["orders"], {"o_orderkey": {"$lt": 5}}, batch_size=7)
        assert out.count() == 5
    assert any("batch_size" in str(x.message) for x in w)
    with pytest.raises(TypeError):
        mas.find(tables["orders"], {}, not_an_option=1)


def test_schema_arrow_roundtrip():
    import pyarrow as pa

    s = mas.Schema({"a": int, "b": pa.float64(), "c": [str]})
    arrow = s.to_arrow()
    s2 = mas.Schema.from_arrow(arrow)
    assert s2.to_struct_type() == s.to_struct_type()


def test_schema_nested_rules():
    s = mas.Schema({"doc": {"x": int, "y": {"z": str}}, "arr": [float]})
    st = s.to_struct_type()
    assert isinstance(st["doc"].dataType, T.StructType)
    assert isinstance(st["doc"].dataType["y"].dataType, T.StructType)
    assert st["arr"].dataType == T.ArrayType(T.DoubleType())
    with pytest.raises(mas.SchemaError):
        mas.Schema({"bad": [int, str]})  # 2-element list (types.py:316-318)


def test_per_field_tz_override_matrix(spark):
    """Ported shape of the reference tz matrix (test_datetime.py:103-168):
    (1) schema timestamp(ms, tz) → arrow column typed timestamp[ms, tz];
    (2) two different requested tzs present the SAME instants;
    (3) plain datetime type id → naive timestamp, UTC wall clock."""
    import pyarrow as pa

    from mongo_arrow_spark.api import find_arrow_all, find_pandas_all
    from mongo_arrow_spark.schema import Schema

    times = [
        dt.datetime(2024, 3, 15, 10, 30, 45),
        dt.datetime(2023, 12, 31, 23, 59, 59),
    ]
    df = spark.createDataFrame(
        [(1, times[0]), (2, times[1])], "id int, data timestamp"
    )

    schema_west = Schema({"id": pa.int32(), "data": pa.timestamp("ms", tz="US/Pacific")})
    t_west = find_arrow_all(df, schema=schema_west, sort=[("id", 1)])
    assert t_west.schema.types == [pa.int32(), pa.timestamp("ms", tz="US/Pacific")]

    schema_east = Schema({"id": pa.int32(), "data": pa.timestamp("ms", tz="US/Eastern")})
    t_east = find_arrow_all(df, schema=schema_east, sort=[("id", 1)])
    assert t_east.schema.types == [pa.int32(), pa.timestamp("ms", tz="US/Eastern")]

    # the instants are identical regardless of requested presentation tz
    west_vals = t_west["data"].to_pylist()
    east_vals = t_east["data"].to_pylist()
    assert all(w == e for w, e in zip(west_vals, east_vals))
    # and the wall clock genuinely differs by the tz offset
    assert all(w.utcoffset() != e.utcoffset() for w, e in zip(west_vals, east_vals))

    # plain datetime type id: naive timestamp, values are the UTC wall clock
    schema_dt = Schema({"id": pa.int32(), "data": dt.datetime})
    t_naive = find_arrow_all(df, schema=schema_dt, sort=[("id", 1)])
    assert t_naive["data"].type.tz is None
    assert t_naive["data"].to_pylist() == times

    # pandas path carries the tz too
    pdf = find_pandas_all(df, schema=schema_west, sort=[("id", 1)])
    assert str(pdf["data"].dt.tz) in ("US/Pacific", "America/Los_Angeles")


def test_tz_override_marker_spelling(spark):
    """bt.Datetime(tz=...) is the non-pyarrow spelling of the override."""
    from mongo_arrow_spark import bson_types as bt
    from mongo_arrow_spark.api import find_arrow_all
    from mongo_arrow_spark.schema import Schema

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 12, 0, 0))], "id int, data timestamp"
    )
    t = find_arrow_all(df, schema=Schema({"id": int, "data": bt.Datetime(tz="UTC")}))
    assert str(t["data"].type) == "timestamp[ms, tz=UTC]"
