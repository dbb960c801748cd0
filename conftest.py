"""Root conftest: load pandas' own extension-suite fixtures so
tests/pandas_types/ can run the upstream conformance battery against the
BSON extension dtypes (the same gate the reference uses —
reference test/conftest.py loads the identical plugin)."""

try:
    import pandas  # noqa: F401

    pytest_plugins = ["pandas.tests.extension.conftest"]
except ImportError:  # pragma: no cover
    pass
