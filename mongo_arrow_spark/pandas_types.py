"""Registered pandas extension dtypes for the four BSON logical types.

The reference ships ExtensionDtype/ExtensionArray implementations so
``find_pandas_all`` round-trips dtype identity (reference
pandas_types.py:228-361): an ObjectId column comes back as
``bson_ObjectId`` holding ObjectId scalars, not raw bytes. This module is
the Spark engine's counterpart; scalars come from
:mod:`mongo_arrow_spark.bson_values` (pymongo's ``bson`` when installed,
spec-faithful fallbacks otherwise).

Arrays are object-ndarray-backed (values are rich Python scalars, the
same storage the reference uses). Conformance is pinned by running
pandas' own extension test suite in ``tests/pandas_types/``, the same
gate the reference uses (reference test/pandas_types/*).
"""

from __future__ import annotations

import numbers
import re
from typing import Any

import numpy as np
import pandas as pd
from pandas.api.extensions import (
    ExtensionArray,
    ExtensionDtype,
    register_extension_dtype,
)
from pandas.core.indexers import check_array_indexer

try:  # pandas 3.0 readonly-view protocol (reference pandas_types.py:35-40)
    from pandas.core.indexers import getitem_returns_view
except ImportError:  # pandas < 3.0: __getitem__ always copies

    def getitem_returns_view(arr, key):  # noqa: ARG001
        return False

from mongo_arrow_spark.bson_values import Binary, Code, Decimal128, ObjectId

__all__ = [
    "BSONDtype",
    "BSONArray",
    "PandasObjectId",
    "PandasObjectIdArray",
    "PandasDecimal128",
    "PandasDecimal128Array",
    "PandasBinary",
    "PandasBinaryArray",
    "PandasCode",
    "PandasCodeArray",
]


class BSONDtype(ExtensionDtype):
    """Common behavior for the BSON extension dtypes."""

    na_value = np.nan

    @property
    def name(self) -> str:
        return f"bson_{self.type.__name__}"

    @classmethod
    def construct_from_string(cls, string: str):
        if not isinstance(string, str):
            raise TypeError(
                f"'construct_from_string' expects a string, got {type(string)}"
            )
        inst = cls()
        if string != inst.name:
            raise TypeError(f"Cannot construct a '{cls.__name__}' from '{string}'")
        return inst


def _is_na(val: Any) -> bool:
    if val is None or val is pd.NA:
        return True
    return isinstance(val, float) and np.isnan(val)


class BSONArray(ExtensionArray):
    """Object-ndarray-backed extension array of one BSON scalar type."""

    _dtype_class: type[BSONDtype]

    def __init__(self, values, dtype=None, copy: bool = False):
        dtype = dtype or self._dtype_class()
        scalar_type = dtype.type
        if not isinstance(values, np.ndarray):
            raise TypeError("values must be a numpy array")
        for v in values:
            if not _is_na(v) and not isinstance(v, scalar_type):
                raise ValueError(
                    f"values must be {scalar_type.__name__} or NA, got {v!r}"
                )
        self._data = values.copy() if copy else values
        self._dtype = dtype

    # -- construction ----------------------------------------------------
    @classmethod
    def _from_sequence(cls, scalars, *, dtype=None, copy: bool = False):
        data = np.empty(len(scalars), dtype=object)
        data[:] = list(scalars)
        return cls(data, dtype=dtype, copy=copy)

    @classmethod
    def _from_factorized(cls, values, original):
        return cls(np.asarray(values, dtype=object), dtype=original.dtype)

    @classmethod
    def _concat_same_type(cls, to_concat):
        parts = [np.asarray(a._data, dtype=object) for a in to_concat]
        if parts:
            return cls(np.concatenate(parts), dtype=to_concat[0].dtype)
        return cls(np.array([], dtype=object))

    # -- core interface ---------------------------------------------------
    @property
    def dtype(self):
        return self._dtype

    @property
    def nbytes(self) -> int:
        return self._data.nbytes

    def __len__(self) -> int:
        return len(self._data)

    def __getitem__(self, item):
        if isinstance(item, numbers.Integral):
            # scalars here are immutable BSON value objects — no view
            # aliasing to guard
            return self._data[int(item)]
        key = check_array_indexer(self, item)
        result = type(self)(self._data[key], dtype=self._dtype)
        if getitem_returns_view(self, key):
            # pandas 3.0: the sliced array shares our buffer — carry the
            # readonly flag forward so writes through the view are
            # refused like the base array's would be
            result._readonly = getattr(self, "_readonly", False)
        return result

    def __setitem__(self, item, value):
        if getattr(self, "_readonly", False):
            raise ValueError("Cannot modify read-only array")
        scalar_type = self._dtype.type
        if isinstance(item, numbers.Integral):
            if not _is_na(value) and not isinstance(value, scalar_type):
                raise ValueError(
                    f"value must be {scalar_type.__name__} or NA, got {value!r}"
                )
            self._data[int(item)] = value
            return
        key = check_array_indexer(self, item)
        if hasattr(value, "__iter__") and not isinstance(value, (str, bytes)):
            vals = np.empty(len(value), dtype=object)
            vals[:] = list(value)
            bad = [v for v in vals if not _is_na(v) and not isinstance(v, scalar_type)]
        else:
            vals = value
            bad = [] if _is_na(value) or isinstance(value, scalar_type) else [value]
        if bad:
            raise ValueError(
                f"value must be {scalar_type.__name__} or NA, got {bad[0]!r}"
            )
        self._data[key] = vals

    def __array__(self, dtype=None, copy=None) -> np.ndarray:
        if copy:
            return np.array(self._data, dtype=dtype)
        return self._data if dtype is None else self._data.astype(dtype)

    def __eq__(self, other):  # elementwise, pandas EA contract
        return self._data == other

    def __ne__(self, other):
        return self._data != other

    def isna(self) -> np.ndarray:
        return np.array([_is_na(v) for v in self._data], dtype=bool)

    def take(self, indices, *, allow_fill: bool = False, fill_value=None):
        indices = np.asarray(indices, dtype="int64")
        if allow_fill:
            if fill_value is None:
                fill_value = self.dtype.na_value
            if len(indices) and indices.min() < -1:
                raise ValueError("invalid negative index for take with allow_fill")
            if len(self) == 0 and (indices != -1).any():
                raise IndexError("cannot do a non-empty take from an empty axes")
            if len(indices) and len(self) and indices.max() >= len(self):
                raise IndexError("index out of bounds for take")
            out = np.empty(len(indices), dtype=object)
            for i, loc in enumerate(indices):
                out[i] = fill_value if loc == -1 else self._data[loc]
        else:
            if len(self) == 0 and len(indices):
                raise IndexError("cannot do a non-empty take from an empty axes")
            out = self._data.take(indices)
        return type(self)(out, dtype=self._dtype)

    def copy(self):
        return type(self)(self._data.copy(), dtype=self._dtype)

    def unique(self):
        seen: dict = {}
        for v in self._data:
            if _is_na(v):
                seen.setdefault("__na__", self.dtype.na_value)
            else:
                seen.setdefault(v, v)
        return self._from_sequence(list(seen.values()), dtype=self._dtype)


@register_extension_dtype
class PandasObjectId(BSONDtype):
    """dtype ``bson_ObjectId``: 12-byte BSON object ids."""

    type = ObjectId

    @classmethod
    def construct_array_type(cls):
        return PandasObjectIdArray


class PandasObjectIdArray(BSONArray):
    _dtype_class = PandasObjectId


@register_extension_dtype
class PandasDecimal128(BSONDtype):
    """dtype ``bson_Decimal128``: IEEE 754-2008 decimal128 values."""

    type = Decimal128

    @classmethod
    def construct_array_type(cls):
        return PandasDecimal128Array


class PandasDecimal128Array(BSONArray):
    _dtype_class = PandasDecimal128


@register_extension_dtype
class PandasBinary(BSONDtype):
    """dtype ``bson_Binary[subtype]``: bytes with a BSON subtype tag."""

    type = Binary

    def __init__(self, subtype: int = 0):
        self._subtype = int(subtype)

    @property
    def subtype(self) -> int:
        return self._subtype

    @property
    def name(self) -> str:
        return f"bson_Binary[{self._subtype}]"

    @classmethod
    def construct_array_type(cls):
        return PandasBinaryArray

    @classmethod
    def construct_from_string(cls, string: str):
        if not isinstance(string, str):
            raise TypeError(
                f"'construct_from_string' expects a string, got {type(string)}"
            )
        m = re.fullmatch(r"bson_Binary\[(\d+)\]", string)
        if not m:
            raise TypeError(f"Cannot construct a '{cls.__name__}' from '{string}'")
        return cls(int(m.group(1)))


class PandasBinaryArray(BSONArray):
    _dtype_class = PandasBinary

    def __eq__(self, other):
        if isinstance(other, Binary):
            other = np.array(other, dtype=object)
        return super().__eq__(other)

    def __ne__(self, other):
        if isinstance(other, Binary):
            other = np.array(other, dtype=object)
        return super().__ne__(other)


@register_extension_dtype
class PandasCode(BSONDtype):
    """dtype ``bson_Code``: JavaScript code strings."""

    type = Code

    @classmethod
    def construct_array_type(cls):
        return PandasCodeArray


class PandasCodeArray(BSONArray):
    _dtype_class = PandasCode

    def __init__(self, values, dtype=None, copy: bool = False):
        # pandas string-casts values in some paths; re-wrap as Code —
        # but only when needed, so slices stay views of the parent data
        if any(
            isinstance(v, str) and not isinstance(v, Code) for v in values
        ):
            rewrapped = np.empty(len(values), dtype=object)
            for i, v in enumerate(values):
                rewrapped[i] = (
                    Code(v) if isinstance(v, str) and not isinstance(v, Code) else v
                )
            values = rewrapped
        super().__init__(values, dtype=dtype, copy=copy)

    def __eq__(self, other):
        if isinstance(other, Code):
            other = np.array(other, dtype=object)
        return super().__eq__(other)

    def __ne__(self, other):
        if isinstance(other, Code):
            other = np.array(other, dtype=object)
        return super().__ne__(other)
