"""Fixtures feeding pandas' extension conformance suite for the four
BSON dtypes. One parametrized `dtype` fixture drives every conformance
module; value factories produce distinct, sortable scalars."""

import decimal

import numpy as np
import pytest

from mongo_arrow_spark.bson_values import Binary, Code, Decimal128, ObjectId
from mongo_arrow_spark.pandas_types import (
    PandasBinary,
    PandasCode,
    PandasDecimal128,
    PandasObjectId,
)

_COUNTER = {"n": 0}


def _next() -> int:
    _COUNTER["n"] += 1
    return _COUNTER["n"]


_FACTORIES = {
    "objectid": (PandasObjectId, lambda: ObjectId(format(_next(), "024x"))),
    "decimal128": (
        PandasDecimal128,
        lambda: Decimal128(decimal.Decimal(_next()) / 100),
    ),
    "binary": (
        lambda: PandasBinary(10),
        lambda: Binary(_next().to_bytes(8, "big"), 10),
    ),
    "code": (PandasCode, lambda: Code(f"function f{_next():06d}() {{}}")),
}


@pytest.fixture(params=sorted(_FACTORIES))
def bson_kind(request):
    return request.param


@pytest.fixture
def dtype(bson_kind):
    ctor, _ = _FACTORIES[bson_kind]
    return ctor()


@pytest.fixture
def make_datum(bson_kind):
    return _FACTORIES[bson_kind][1]


def _array(dtype, values):
    arr_type = type(dtype).construct_array_type()
    data = np.empty(len(values), dtype=object)
    data[:] = values
    return arr_type(data, dtype=dtype)


@pytest.fixture
def data(dtype, make_datum):
    return _array(dtype, [make_datum() for _ in range(100)])


@pytest.fixture
def data_missing(dtype, make_datum):
    return _array(dtype, [np.nan, make_datum()])


@pytest.fixture
def data_for_sorting(dtype, make_datum):
    a, b, c = make_datum(), make_datum(), make_datum()
    return _array(dtype, [b, c, a])  # B < C, A < B


@pytest.fixture
def data_missing_for_sorting(dtype, make_datum):
    a, b = make_datum(), make_datum()
    return _array(dtype, [b, np.nan, a])


@pytest.fixture
def data_for_grouping(dtype, make_datum):
    a, b, c = make_datum(), make_datum(), make_datum()
    return _array(dtype, [b, b, np.nan, np.nan, a, a, b, c])


@pytest.fixture
def na_cmp():
    return lambda x, y: (
        (x is None or (isinstance(x, float) and np.isnan(x)))
        and (y is None or (isinstance(y, float) and np.isnan(y)))
    )
