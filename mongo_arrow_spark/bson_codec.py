"""Pure-Python BSON document codec from the public BSON spec
(bsonspec.org, version 1.1).

The reference's core kernel is BSON-stream decode into Arrow builders
(reference lib.pyx:296-311 process_bson_stream); its Python surface uses
the ``bson`` package (pymongo). This module removes that dependency for
the ``.bson`` read path: a spec-complete decoder plus a fixture-grade
encoder, returning the same scalar types the rest of the engine already
round-trips (``bson_values.ObjectId/Binary/Code/Decimal128`` — which
resolve to pymongo's own classes when that package is installed).

Decoding is strict about framing (length prefixes, NUL terminators,
trailing byte) and raises ``ValueError`` on corruption — the analog of
the reference's invalid-stream errors (reference test_bson.py:83-99).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import struct
from typing import Any, BinaryIO, Iterator

from mongo_arrow_spark.bson_values import (
    Binary,
    Code,
    Decimal128,
    ObjectId,
)

__all__ = [
    "Regex",
    "Timestamp",
    "MinKey",
    "MaxKey",
    "decode_document",
    "decode_file_iter",
    "encode_document",
]

_EPOCH = _dt.datetime(1970, 1, 1)


class Regex:
    """BSON regular expression (type 0x0B): pattern + option flags."""

    __slots__ = ("pattern", "flags")

    def __init__(self, pattern: str, flags: str = ""):
        self.pattern = pattern
        self.flags = flags

    def __repr__(self):
        return f"Regex({self.pattern!r}, {self.flags!r})"

    def __eq__(self, other):
        if isinstance(other, Regex):
            return (self.pattern, self.flags) == (other.pattern, other.flags)
        return NotImplemented

    def __hash__(self):
        return hash((self.pattern, self.flags))


class Timestamp:
    """BSON internal timestamp (type 0x11): seconds + increment."""

    __slots__ = ("time", "inc")

    def __init__(self, time: int, inc: int):
        self.time = int(time)
        self.inc = int(inc)

    def __repr__(self):
        return f"Timestamp({self.time}, {self.inc})"

    def __eq__(self, other):
        if isinstance(other, Timestamp):
            return (self.time, self.inc) == (other.time, other.inc)
        return NotImplemented

    def __hash__(self):
        return hash((self.time, self.inc))


class MinKey:
    def __repr__(self):
        return "MinKey()"

    def __eq__(self, other):
        return isinstance(other, MinKey)

    def __hash__(self):
        return hash("MinKey")


class MaxKey:
    def __repr__(self):
        return "MaxKey()"

    def __eq__(self, other):
        return isinstance(other, MaxKey)

    def __hash__(self):
        return hash("MaxKey")


# ------------------------------------------------------------------ decode


def _read_cstring(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b"\x00", pos)
    return data[pos:end].decode("utf-8"), end + 1


def _read_string(data: bytes, pos: int) -> tuple[str, int]:
    (n,) = struct.unpack_from("<i", data, pos)
    if n < 1:
        raise ValueError(f"invalid BSON string length {n} at byte {pos}")
    start = pos + 4
    if data[start + n - 1] != 0:
        raise ValueError(f"BSON string missing NUL terminator at byte {pos}")
    return data[start : start + n - 1].decode("utf-8"), start + n


def _decode_element(data: bytes, pos: int, etype: int) -> tuple[Any, int]:
    if etype == 0x01:  # double
        return struct.unpack_from("<d", data, pos)[0], pos + 8
    if etype == 0x02:  # string
        return _read_string(data, pos)
    if etype == 0x03:  # embedded document
        return decode_document(data, pos)
    if etype == 0x04:  # array — a doc with "0","1",... keys
        doc, pos = decode_document(data, pos)
        return list(doc.values()), pos
    if etype == 0x05:  # binary
        (n,) = struct.unpack_from("<i", data, pos)
        subtype = data[pos + 4]
        start = pos + 5
        payload = data[start : start + n]
        if subtype == 0x02:  # old binary: payload carries its own length
            (inner,) = struct.unpack_from("<i", payload, 0)
            payload = payload[4 : 4 + inner]
        return Binary(payload, subtype), start + n
    if etype == 0x06:  # undefined (deprecated)
        return None, pos
    if etype == 0x07:  # ObjectId
        return ObjectId(data[pos : pos + 12]), pos + 12
    if etype == 0x08:  # bool
        return data[pos] == 1, pos + 1
    if etype == 0x09:  # UTC datetime, int64 millis
        (ms,) = struct.unpack_from("<q", data, pos)
        return _EPOCH + _dt.timedelta(milliseconds=ms), pos + 8
    if etype == 0x0A:  # null
        return None, pos
    if etype == 0x0B:  # regex — two cstrings
        pattern, pos = _read_cstring(data, pos)
        flags, pos = _read_cstring(data, pos)
        return Regex(pattern, flags), pos
    if etype == 0x0C:  # DBPointer (deprecated): string + 12-byte id
        ref, pos = _read_string(data, pos)
        return {"$ref": ref, "$id": ObjectId(data[pos : pos + 12])}, pos + 12
    if etype == 0x0D:  # JavaScript code
        code, pos = _read_string(data, pos)
        return Code(code), pos
    if etype == 0x0E:  # symbol (deprecated) → str
        return _read_string(data, pos)
    if etype == 0x0F:  # code with scope
        (total,) = struct.unpack_from("<i", data, pos)
        code, p = _read_string(data, pos + 4)
        scope, p2 = decode_document(data, p)
        if p2 != pos + total:
            raise ValueError(f"code_w_scope length mismatch at byte {pos}")
        return Code(code, scope), p2
    if etype == 0x10:  # int32
        return struct.unpack_from("<i", data, pos)[0], pos + 4
    if etype == 0x11:  # internal timestamp: uint32 inc, uint32 time
        inc, t = struct.unpack_from("<II", data, pos)
        return Timestamp(t, inc), pos + 8
    if etype == 0x12:  # int64
        return struct.unpack_from("<q", data, pos)[0], pos + 8
    if etype == 0x13:  # decimal128, 16-byte BID
        return Decimal128.from_bid(data[pos : pos + 16]), pos + 16
    if etype == 0xFF:
        return MinKey(), pos
    if etype == 0x7F:
        return MaxKey(), pos
    raise ValueError(f"unknown BSON element type 0x{etype:02X} at byte {pos}")


def decode_document(data: bytes, pos: int = 0) -> tuple[dict, int]:
    """Decode one document starting at ``pos``; returns (doc, end_pos)."""
    if len(data) - pos < 5:
        raise ValueError(f"truncated BSON document at byte {pos}")
    (size,) = struct.unpack_from("<i", data, pos)
    end = pos + size
    if size < 5 or end > len(data):
        raise ValueError(f"invalid BSON document length {size} at byte {pos}")
    if data[end - 1] != 0:
        raise ValueError(f"BSON document missing trailing NUL at byte {end - 1}")
    doc: dict = {}
    p = pos + 4
    while p < end - 1:
        etype = data[p]
        key, p = _read_cstring(data, p + 1)
        doc[key], p = _decode_element(data, p, etype)
    if p != end - 1:
        raise ValueError(f"BSON document overran its length at byte {p}")
    return doc, end


def decode_file_iter(fh: BinaryIO) -> Iterator[dict]:
    """Stream length-prefixed documents from a .bson dump (mongodump
    format: concatenated documents, no container framing)."""
    while True:
        prefix = fh.read(4)
        if not prefix:
            return
        if len(prefix) < 4:
            raise ValueError("truncated BSON stream (partial length prefix)")
        (size,) = struct.unpack("<i", prefix)
        if size < 5:
            raise ValueError(f"invalid BSON document length {size}")
        rest = fh.read(size - 4)
        if len(rest) < size - 4:
            raise ValueError("truncated BSON stream (document shorter than length)")
        doc, _ = decode_document(prefix + rest, 0)
        yield doc


# ------------------------------------------------------------------ encode


def _encode_value(key: bytes, value: Any) -> bytes:
    if isinstance(value, bool):  # before int — bool is an int subclass
        return b"\x08" + key + (b"\x01" if value else b"\x00")
    if isinstance(value, float):
        return b"\x01" + key + struct.pack("<d", value)
    if isinstance(value, Binary):
        payload = bytes(value)
        return (
            b"\x05" + key + struct.pack("<i", len(payload))
            + bytes([value.subtype]) + payload
        )
    if isinstance(value, (bytes, bytearray)):
        return b"\x05" + key + struct.pack("<i", len(value)) + b"\x00" + bytes(value)
    if isinstance(value, Code):
        if value.scope is not None:
            body = _encode_string(str(value)) + encode_document(value.scope)
            return b"\x0f" + key + struct.pack("<i", len(body) + 4) + body
        return b"\x0d" + key + _encode_string(str(value))
    if isinstance(value, str):
        return b"\x02" + key + _encode_string(value)
    if isinstance(value, int):
        if -(2**31) <= value < 2**31:
            return b"\x10" + key + struct.pack("<i", value)
        return b"\x12" + key + struct.pack("<q", value)
    if value is None:
        return b"\x0a" + key
    if isinstance(value, _dt.datetime):
        if value.tzinfo is not None:
            value = value.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        ms = round((value - _EPOCH).total_seconds() * 1000)
        return b"\x09" + key + struct.pack("<q", ms)
    if isinstance(value, ObjectId):
        return b"\x07" + key + value.binary
    if isinstance(value, Decimal128):
        return b"\x13" + key + value.bid
    if isinstance(value, Timestamp):
        return b"\x11" + key + struct.pack("<II", value.inc, value.time)
    if isinstance(value, Regex):
        return (
            b"\x0b" + key
            + value.pattern.encode("utf-8") + b"\x00"
            + value.flags.encode("utf-8") + b"\x00"
        )
    if isinstance(value, MinKey):
        return b"\xff" + key
    if isinstance(value, MaxKey):
        return b"\x7f" + key
    if isinstance(value, _decimal.Decimal):
        return b"\x13" + key + Decimal128(value).bid
    if isinstance(value, dict):
        return b"\x03" + key + encode_document(value)
    if isinstance(value, (list, tuple)):
        arr = {str(i): v for i, v in enumerate(value)}
        return b"\x04" + key + encode_document(arr)
    raise TypeError(f"cannot encode {type(value).__name__} to BSON")


def _encode_string(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack("<i", len(raw) + 1) + raw + b"\x00"


def encode_document(doc: dict) -> bytes:
    """Encode a dict as one BSON document (fixture/round-trip grade)."""
    body = b"".join(
        _encode_value(str(k).encode("utf-8") + b"\x00", v) for k, v in doc.items()
    )
    return struct.pack("<i", len(body) + 5) + body + b"\x00"
