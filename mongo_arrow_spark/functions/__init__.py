"""Column functions for BSON-flavored logical types.

The reference's extension types (ObjectId/Decimal128/Binary/Code,
types.py:87-221) carry extra semantics over their physical storage; these
helpers give Spark columns the same affordances — all JVM-side expressions,
usable anywhere a Column is.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def objectid_hex(col: Column | str) -> Column:
    """binary(12) ObjectId → 24-char lowercase hex string (the canonical
    string form, reference ObjectIdArray._box_scalar → bson.ObjectId)."""
    return F.lower(F.hex(col))


def objectid_from_hex(col: Column | str) -> Column:
    """24-char hex string → binary(12) ObjectId payload."""
    return F.unhex(col)


def objectid_timestamp(col: Column | str) -> Column:
    """ObjectId's leading 4 bytes are a unix timestamp (BSON spec) —
    extract as TimestampType. Useful for time-range pruning on _id."""
    secs = F.conv(F.substring(F.hex(col), 1, 8), 16, 10).cast("long")
    return F.timestamp_seconds(secs)


def objectid_generate(counter: Column | str) -> Column:
    """Deterministic ObjectId-shaped id from a numeric column: timestamp
    zeroed, remaining 8 bytes from the counter — for synthetic keys with
    ObjectId's sortability/shape (NOT globally unique across tables)."""
    c = F.col(counter) if isinstance(counter, str) else counter
    return F.unhex(F.concat(F.lit("00000000"), F.lpad(F.hex(c.cast("long")), 16, "0")))


def decimal128(col: Column | str, scale: int = 6) -> Column:
    """Declare a column as the Decimal128 logical type (DecimalType(38,s)
    physical, reference types.py:117-137)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(38,{scale})")


def binary_with_subtype(col: Column | str, subtype: int) -> Column:
    """Binary(subtype) carrier: prefix the payload with its 1-byte subtype
    (reference stores subtype in serialized extension metadata; a prefix
    byte survives any storage format)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.unhex(F.lpad(F.lit(format(subtype, "x")), 2, "0")), c)


def binary_subtype(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.hex(F.substring(c, 1, 1)), 16, 10).cast("int")


def binary_payload(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 2, F.octet_length(c) - 1)
