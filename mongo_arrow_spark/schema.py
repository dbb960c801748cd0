"""User-facing Schema (reference schema.py + types.py normalization rules).

Accepts the same shapes the reference does (types.py:246-260, :307-327):
python builtins (int/float/str/bool/datetime), BSON-ish markers
(mongo_arrow_spark.bson_types), pyarrow DataTypes, Spark DataTypes and DDL
strings; nested ``dict`` → struct, one-element ``list`` → array.

Adds ``to_struct_type()`` (the Spark-native output) and keeps
``_get_projection()`` parity (reference schema.py:68-85) — the dotted-path
inclusion map our document source uses for projection pushdown.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import types as T

from mongo_arrow_spark import bson_types as bt
from mongo_arrow_spark.errors import SchemaError

try:  # pyarrow is an optional spelling for type ids
    import pyarrow as pa
except ImportError:  # pragma: no cover
    pa = None

_PY_TYPES = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    bool: T.BooleanType(),
    bytes: T.BinaryType(),
    # plain datetime == BSON datetime: naive ms presentation
    # (reference test_datetime.py case 4) — normalize_type special-cases
    # it to the Datetime() marker so exports drop Spark's UTC tag
    _dt.datetime: T.TimestampType(),
    _dt.date: T.DateType(),
}

# bson scalar classes (pymongo's or our fallbacks) as type ids
from mongo_arrow_spark import bson_values as bv  # noqa: E402

_SCALAR_MARKERS = {
    bv.ObjectId: bt.ObjectId,
    bv.Decimal128: bt.Decimal128,
    bv.Binary: bt.Binary(0),
    bv.Code: bt.Code,
    bv.Int64: bt.Int64,
}


def _from_arrow(at) -> T.DataType:
    import pyarrow.types as pat

    if pat.is_int32(at):
        return T.IntegerType()
    if pat.is_int64(at):
        return T.LongType()
    if pat.is_float64(at):
        return T.DoubleType()
    if pat.is_float32(at):
        return T.FloatType()
    if pat.is_string(at) or pat.is_large_string(at):
        return T.StringType()
    if pat.is_boolean(at):
        return T.BooleanType()
    if pat.is_timestamp(at):
        return T.TimestampType()
    if pat.is_date(at):
        return T.DateType()
    if pat.is_decimal(at):
        return T.DecimalType(at.precision, at.scale)
    if pat.is_binary(at) or pat.is_large_binary(at) or pat.is_fixed_size_binary(at):
        return T.BinaryType()
    if pat.is_null(at):
        return T.NullType()
    if pat.is_list(at) or pat.is_large_list(at):
        return T.ArrayType(_from_arrow(at.value_type))
    if pat.is_struct(at):
        return T.StructType(
            [T.StructField(f.name, _from_arrow(f.type), True) for f in at]
        )
    raise SchemaError(f"unsupported arrow type: {at}")


def normalize_type(type_id) -> tuple[T.DataType, dict]:
    """type id → (Spark type, column metadata). Reference types.py:307-327."""
    meta: dict = {}
    if isinstance(type_id, T.DataType):
        return type_id, meta
    if isinstance(type_id, str):
        try:
            return T._parse_datatype_string(type_id), meta
        except Exception as exc:
            raise SchemaError(f"bad DDL type {type_id!r}: {exc}") from exc
    if isinstance(type_id, type) and issubclass(type_id, bt._BsonMarker):
        type_id = type_id()  # bare class == default-parametrized marker
    if isinstance(type_id, bt._BsonMarker):
        # marker instances: Binary(subtype), Decimal128(precision,
        # scale) / Decimal128(raw=True), or defaults from a bare class
        return type_id.spark_type, type_id.metadata()
    if isinstance(type_id, type) and type_id in _SCALAR_MARKERS:
        # reference parity: bson scalar classes double as type ids
        # (reference Schema({"_id": ObjectId}), types.py:246-260)
        return normalize_type(_SCALAR_MARKERS[type_id])
    # dict/list type-ids are unhashable — branch before the map lookup
    if not isinstance(type_id, (dict, list)) and type_id in _PY_TYPES:
        if type_id is _dt.datetime:
            m = bt.Datetime()
            return m.spark_type, m.metadata()
        return _PY_TYPES[type_id], meta
    if pa is not None and isinstance(type_id, pa.DataType):
        import pyarrow.types as pat

        if pat.is_timestamp(type_id):
            # reference spelling timestamp(unit, tz): per-field tz
            # override carried as column metadata (lib.pyx:147-150)
            return (
                T.TimestampType(),
                bt.Datetime(tz=type_id.tz, unit=type_id.unit).metadata(),
            )
        return _from_arrow(type_id), meta
    if isinstance(type_id, dict):
        return (
            T.StructType(
                [
                    T.StructField(k, normalize_type(v)[0], True, normalize_type(v)[1] or None)
                    for k, v in type_id.items()
                ]
            ),
            meta,
        )
    if isinstance(type_id, list):
        if len(type_id) != 1:
            raise SchemaError(
                "list type ids must have exactly one element "
                "(reference types.py:316-318)"
            )
        inner, _ = normalize_type(type_id[0])
        return T.ArrayType(inner), meta
    raise SchemaError(f"unsupported type identifier: {type_id!r}")


class Schema:
    """Mapping of field name → type id (reference schema.py:21-53)."""

    def __init__(self, schema: dict):
        if not isinstance(schema, dict):
            raise SchemaError("schema must be a dict of name -> type id")
        self.typemap = schema
        fields = []
        for name, type_id in schema.items():
            dt, meta = normalize_type(type_id)
            fields.append(T.StructField(name, dt, True, meta or None))
        self.struct = T.StructType(fields)

    def to_struct_type(self) -> T.StructType:
        return self.struct

    @classmethod
    def from_struct_type(cls, struct: T.StructType) -> "Schema":
        self = cls.__new__(cls)
        self.typemap = {f.name: f.dataType for f in struct.fields}
        self.struct = struct
        return self

    # reference schema.py:92-109 round-trips via pyarrow.Schema
    @classmethod
    def from_arrow(cls, aschema) -> "Schema":
        return cls({f.name: f.type for f in aschema})

    def to_arrow(self):
        if pa is None:  # pragma: no cover
            raise SchemaError("pyarrow not available")
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.struct)

    def _get_projection(self) -> dict:
        """Dotted-path inclusion map (reference schema.py:68-85):
        ``{"_id": False, "a.b": True}`` — `_id` excluded unless declared."""
        out: dict[str, bool] = {}
        if "_id" not in self.typemap:
            out["_id"] = False

        def walk(prefix: str, dt: T.DataType):
            if isinstance(dt, T.StructType):
                for f in dt.fields:
                    walk(f"{prefix}.{f.name}", f.dataType)
            elif isinstance(dt, T.ArrayType):
                walk(prefix, dt.elementType)
            else:
                out[prefix] = True

        for f in self.struct.fields:
            walk(f.name, f.dataType)
        return out

    def __eq__(self, other):
        return isinstance(other, Schema) and self.struct == other.struct

    def __repr__(self):
        return f"Schema({self.typemap!r})"
