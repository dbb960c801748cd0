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
    spark_type = T.DecimalType(38, 6)
    bson_name = "decimal128"


class Code(_BsonMarker):
    spark_type = T.StringType()
    bson_name = "code"


class Int64(_BsonMarker):
    spark_type = T.LongType()
    bson_name = "int64"


class Binary(_BsonMarker):
    """Parametrized by subtype: ``Binary(10)`` — matches reference usage
    ``Binary(b"123", 10)`` (test_arrow.py fixtures)."""

    spark_type = T.BinaryType()
    bson_name = "binary"

    def __init__(self, subtype: int = 0):
        self.subtype = subtype

    def metadata(self) -> dict:  # type: ignore[override]
        return {METADATA_KEY: f"binary[{self.subtype}]"}
