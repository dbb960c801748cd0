"""Scalar value types for the four BSON logical types, plus the
Decimal128 BID codec.

The reference hands back ``bson`` package scalars (ObjectId, Decimal128,
Binary, Code) from its pandas/polars exports. When ``bson`` (pymongo) is
installed we re-export those classes so values interoperate with pymongo
code; otherwise the pure-Python fallbacks below implement the same public
surface from the BSON spec / IEEE 754-2008 decimal128 (both public).

``decimal128_to_bid`` / ``decimal128_from_bid`` implement the Binary
Integer Decimal encoding losslessly — any 34-digit coefficient, full
exponent range, ±0, ±Inf, NaN — mirroring the reference's raw-16-byte
carrier (reference lib.pyx:740-762, types.py:117-137).
"""

from __future__ import annotations

import decimal
import os
import struct
import threading
import time

__all__ = [
    "ObjectId",
    "Binary",
    "Code",
    "Decimal128",
    "Int64",
    "decimal128_to_bid",
    "decimal128_from_bid",
    "HAVE_BSON",
]

_EXP_BIAS = 6176
_MAX_EXP = 6111  # biased max 0x2FFF
_MIN_EXP = -6176
_COEFF_LIMIT = 10**34
_LOW_MASK = 0xFFFFFFFFFFFFFFFF

# decimal128 needs 34 significant digits; keep a dedicated context so we
# never inherit a narrower caller context. Emin/Emax are IEEE *adjusted*
# exponents (±6143/6144); with prec=34 the coefficient-exponent window is
# exactly [-6176, 6111] (Etiny = Emin - prec + 1).
_DEC128_CTX = decimal.Context(
    prec=34, Emin=-6143, Emax=6144, rounding=decimal.ROUND_HALF_EVEN
)


def decimal128_to_bid(value: decimal.Decimal) -> bytes:
    """Encode a Decimal as 16 little-endian BID bytes (BSON's wire form).

    Raises ValueError when the value cannot be represented exactly
    (coefficient over 34 digits or exponent out of range after clamping).
    """
    sign = 1 if value.is_signed() else 0
    if value.is_nan():
        high = 0x7E00000000000000 if value.is_snan() else 0x7C00000000000000
        return struct.pack("<QQ", 0, high | (sign << 63))
    if value.is_infinite():
        return struct.pack("<QQ", 0, 0x7800000000000000 | (sign << 63))
    _, digits, exponent = value.as_tuple()
    coeff = int("".join(map(str, digits)))
    # clamp into the representable exponent window without losing digits
    while exponent < _MIN_EXP:
        if coeff == 0:
            exponent = _MIN_EXP
            break
        if coeff % 10:
            raise ValueError(f"exponent {exponent} below decimal128 range")
        coeff //= 10
        exponent += 1
    while exponent > _MAX_EXP:
        if coeff >= _COEFF_LIMIT // 10 and coeff != 0:
            raise ValueError(f"exponent {exponent} above decimal128 range")
        coeff *= 10
        exponent -= 1
        if coeff == 0:
            exponent = _MAX_EXP
            break
    if coeff >= _COEFF_LIMIT:
        raise ValueError("coefficient exceeds 34 decimal digits")
    biased = exponent + _EXP_BIAS
    high = (sign << 63) | (biased << 49) | (coeff >> 64)
    return struct.pack("<QQ", coeff & _LOW_MASK, high)


def decimal128_from_bid(data: bytes) -> decimal.Decimal:
    """Decode 16 little-endian BID bytes to a Decimal (lossless)."""
    if len(data) != 16:
        raise ValueError("BID value must be exactly 16 bytes")
    low, high = struct.unpack("<QQ", data)
    sign = "-" if high >> 63 else ""
    if high & 0x7800000000000000 == 0x7800000000000000:
        if high & 0x7C00000000000000 == 0x7C00000000000000:
            return _DEC128_CTX.create_decimal(sign + "NaN")
        return _DEC128_CTX.create_decimal(sign + "Infinity")
    if high & 0x6000000000000000 == 0x6000000000000000:
        # non-canonical large-significand form: value is zero (BSON spec)
        exponent = ((high >> 47) & 0x3FFF) - _EXP_BIAS
        return decimal.Decimal(f"{sign}0E{exponent}")
    exponent = ((high >> 49) & 0x3FFF) - _EXP_BIAS
    coeff = ((high & ((1 << 49) - 1)) << 64) | low
    return decimal.Decimal(f"{sign}{coeff}E{exponent}")


try:  # pragma: no cover - exercised only where pymongo is installed
    from bson import Binary, Code, Decimal128, Int64, ObjectId

    HAVE_BSON = True
except ImportError:
    HAVE_BSON = False

    _oid_lock = threading.Lock()
    _oid_counter = int.from_bytes(os.urandom(3), "big")
    _oid_random = os.urandom(5)

    class ObjectId:
        """12-byte BSON ObjectId: 4-byte seconds + 5-byte process random
        + 3-byte counter (BSON spec)."""

        __slots__ = ("_binary",)

        def __init__(self, oid=None):
            if oid is None:
                self._binary = self._generate()
            elif isinstance(oid, ObjectId):
                self._binary = oid._binary
            elif isinstance(oid, (bytes, bytearray)):
                if len(oid) != 12:
                    raise ValueError("ObjectId must be exactly 12 bytes")
                self._binary = bytes(oid)
            elif isinstance(oid, str):
                if len(oid) != 24:
                    raise ValueError("ObjectId hex string must be 24 chars")
                self._binary = bytes.fromhex(oid)
            else:
                raise TypeError(f"cannot build ObjectId from {type(oid).__name__}")

        @staticmethod
        def _generate() -> bytes:
            global _oid_counter
            with _oid_lock:
                _oid_counter = (_oid_counter + 1) & 0xFFFFFF
                count = _oid_counter
            return (
                struct.pack(">I", int(time.time()))
                + _oid_random
                + count.to_bytes(3, "big")
            )

        @property
        def binary(self) -> bytes:
            return self._binary

        @property
        def generation_time(self):
            import datetime as _dt

            secs = struct.unpack(">I", self._binary[:4])[0]
            return _dt.datetime.fromtimestamp(secs, tz=_dt.timezone.utc)

        def __str__(self) -> str:
            return self._binary.hex()

        def __repr__(self) -> str:
            return f"ObjectId('{self}')"

        def __eq__(self, other):
            if isinstance(other, ObjectId):
                return self._binary == other._binary
            return NotImplemented

        def __ne__(self, other):
            if isinstance(other, ObjectId):
                return self._binary != other._binary
            return NotImplemented

        def __lt__(self, other):
            if isinstance(other, ObjectId):
                return self._binary < other._binary
            return NotImplemented

        def __le__(self, other):
            if isinstance(other, ObjectId):
                return self._binary <= other._binary
            return NotImplemented

        def __gt__(self, other):
            if isinstance(other, ObjectId):
                return self._binary > other._binary
            return NotImplemented

        def __ge__(self, other):
            if isinstance(other, ObjectId):
                return self._binary >= other._binary
            return NotImplemented

        def __hash__(self):
            return hash(self._binary)

    class Binary(bytes):
        """bytes with a BSON binary subtype tag."""

        _subtype: int

        def __new__(cls, data, subtype: int = 0):
            if not 0 <= int(subtype) <= 255:
                raise ValueError("subtype must be in [0, 255]")
            self = super().__new__(cls, data)
            self._subtype = int(subtype)
            return self

        @property
        def subtype(self) -> int:
            return self._subtype

        def __repr__(self):
            return f"Binary({bytes(self)!r}, {self._subtype})"

        def __eq__(self, other):
            if isinstance(other, Binary):
                return (
                    self._subtype == other._subtype and bytes(self) == bytes(other)
                )
            # match pymongo: plain bytes compare equal on payload when
            # subtype is 0
            if isinstance(other, bytes):
                return self._subtype == 0 and bytes(self) == other
            return NotImplemented

        def __ne__(self, other):
            eq = self.__eq__(other)
            return eq if eq is NotImplemented else not eq

        def __hash__(self):
            return hash((bytes(self), self._subtype))

    class Code(str):
        """str carrying JavaScript code, with an optional scope mapping."""

        _scope: dict | None

        def __new__(cls, code, scope=None):
            self = super().__new__(cls, code)
            if scope is not None and not isinstance(scope, dict):
                raise TypeError("scope must be a dict or None")
            self._scope = scope
            return self

        @property
        def scope(self) -> dict | None:
            return self._scope

        def __repr__(self):
            return f"Code({str(self)!r}, {self._scope!r})"

    class Int64(int):
        """int tagged as a BSON 64-bit integer."""

        __slots__ = ()

    class Decimal128:
        """IEEE 754-2008 decimal128 value over the 16-byte BID carrier."""

        __slots__ = ("_bid",)

        def __init__(self, value):
            if isinstance(value, (bytes, bytearray)):
                if len(value) != 16:
                    raise ValueError("Decimal128 bytes must be 16 long")
                self._bid = bytes(value)
            elif isinstance(value, decimal.Decimal):
                self._bid = decimal128_to_bid(value)
            elif isinstance(value, str):
                self._bid = decimal128_to_bid(_DEC128_CTX.create_decimal(value))
            elif isinstance(value, Decimal128):
                self._bid = value._bid
            else:
                raise TypeError(
                    f"cannot build Decimal128 from {type(value).__name__}"
                )

        @classmethod
        def from_bid(cls, value: bytes) -> "Decimal128":
            return cls(bytes(value))

        @property
        def bid(self) -> bytes:
            return self._bid

        def to_decimal(self) -> decimal.Decimal:
            return decimal128_from_bid(self._bid)

        def __str__(self) -> str:
            d = self.to_decimal()
            if d.is_nan():
                return "NaN"
            return str(d)

        def __repr__(self):
            return f"Decimal128('{self}')"

        def __eq__(self, other):
            if isinstance(other, Decimal128):
                return self._bid == other._bid
            return NotImplemented

        def __ne__(self, other):
            if isinstance(other, Decimal128):
                return self._bid != other._bid
            return NotImplemented

        def __hash__(self):
            return hash(self._bid)
