"""BSON-flavored logical type markers (reference types.py:87-221).

The reference registers four Arrow *extension* types (ObjectId, Decimal128,
Binary-with-subtype, Code) over physical binary/string storage. Spark's
Python API has no extension-type registry, so we follow SURVEY §1.4: carry
the physical Spark type and tag the column via metadata; these marker
classes are the user-facing spelling accepted by ``Schema``.

| marker      | Spark physical type      | reference                  |
|-------------|--------------------------|----------------------------|
| ObjectId    | BinaryType (12 bytes)    | types.py:87-107            |
| Decimal128  | DecimalType(38, 6)       | types.py:117-137           |
| Binary(st)  | BinaryType + subtype tag | types.py:148-182           |
| Code        | StringType + tag         | types.py:189-209           |
| Int64       | LongType                 | bson.Int64 in types.py     |
"""

from __future__ import annotations

from pyspark.sql import types as T

METADATA_KEY = "mongo_arrow_spark.bson_type"
TZ_KEY = "mongo_arrow_spark.tz"
TS_UNIT_KEY = "mongo_arrow_spark.ts_unit"


class _BsonMarker:
    """Base for BSON logical-type markers usable as Schema type ids."""

    spark_type: T.DataType
    bson_name: str

    def __init_subclass__(cls, **kw):
        super().__init_subclass__(**kw)

    @classmethod
    def metadata(cls) -> dict:
        return {METADATA_KEY: cls.bson_name}


class ObjectId(_BsonMarker):
    spark_type = T.BinaryType()
    bson_name = "objectid"


class Decimal128(_BsonMarker):
    """Decimal128 logical type. As a bare class: DecimalType(38, 6).

    Parametrized (reference round-2 fidelity fixes, SURVEY §7 "What's
    hard" #6):
    - ``Decimal128(precision, scale)`` — configurable Spark decimal, for
      corpora whose values exceed 6 decimal places.
    - ``Decimal128(raw=True)`` — lossless 16-byte BID carrier
      (BinaryType physical): any 34-digit coefficient, full exponent
      range, NaN/±Inf — byte-for-byte what the reference keeps
      (lib.pyx:740-762). Decode/encode via
      :mod:`mongo_arrow_spark.bson_values`.
    """

    spark_type = T.DecimalType(38, 6)
    bson_name = "decimal128"

    def __init__(self, precision: int = 38, scale: int = 6, raw: bool = False):
        self.raw = raw
        self.spark_type = (
            T.BinaryType() if raw else T.DecimalType(precision, scale)
        )

    def metadata(self) -> dict:  # type: ignore[override]
        return {METADATA_KEY: "decimal128[bid]" if self.raw else "decimal128"}


class Code(_BsonMarker):
    spark_type = T.StringType()
    bson_name = "code"


class Int64(_BsonMarker):
    spark_type = T.LongType()
    bson_name = "int64"


class Datetime(_BsonMarker):
    """Timestamp with a per-field timezone/unit override (reference
    ``timestamp(ms, tz)`` schema spelling, lib.pyx:147-150 /
    test_datetime.py:103-168): storage stays a UTC-instant
    TimestampType; exports re-present the column in ``tz`` at ``unit``.
    ``Datetime()`` (no tz) is the plain naive-ms spelling."""

    spark_type = T.TimestampType()
    bson_name = "datetime"

    def __init__(self, tz: str | None = None, unit: str = "ms"):
        self.tz = tz
        self.unit = unit

    def metadata(self) -> dict:  # type: ignore[override]
        out = {METADATA_KEY: self.bson_name, TS_UNIT_KEY: self.unit}
        if self.tz:
            out[TZ_KEY] = str(self.tz)
        return out


class Binary(_BsonMarker):
    """Parametrized by subtype: ``Binary(10)`` — matches reference usage
    ``Binary(b"123", 10)`` (test_arrow.py fixtures)."""

    spark_type = T.BinaryType()
    bson_name = "binary"

    def __init__(self, subtype: int = 0):
        self.subtype = subtype

    def metadata(self) -> dict:  # type: ignore[override]
        return {METADATA_KEY: f"binary[{self.subtype}]"}
