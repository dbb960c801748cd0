"""pandas' own extension-suite conformance for the BSON dtypes — the
same base-class scope the reference runs against its pandas types
(reference test/pandas_types/test_objectid.py:71-103)."""

import pytest

try:
    from pandas.tests.extension import base
except ImportError:  # pragma: no cover
    pytest.skip("pandas test extras unavailable", allow_module_level=True)


class TestDtype(base.BaseDtypeTests):
    def test_is_not_string_type(self, data):
        super().test_is_not_string_type(data)

    def test_is_not_object_type(self, data):
        super().test_is_not_object_type(data)


class TestInterface(base.BaseInterfaceTests):
    pass


class TestConstructors(base.BaseConstructorsTests):
    pass


class TestGetitem(base.BaseGetitemTests):
    pass


class TestSetitem(base.BaseSetitemTests):
    pass


class TestIndex(base.BaseIndexTests):
    pass


class TestMissing(base.BaseMissingTests):
    pass
