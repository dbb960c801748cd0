"""Exception hierarchy (reference: bindings/python/pymongoarrow/errors.py)."""

from __future__ import annotations


class MongoArrowSparkError(Exception):
    """Base for all engine errors (reference errors.py:24 PyMongoArrowError)."""


class MQLTranslationError(MongoArrowSparkError):
    """An MQL query/pipeline construct could not be translated to Spark."""


class SchemaError(MongoArrowSparkError):
    """Invalid schema specification (reference types.py:307-327 raises
    ValueError for unsupported type identifiers)."""


class ArrowWriteError(MongoArrowSparkError):
    """Bulk-write failure carrying structured details
    (reference errors.py:27-47).

    ``details`` mirrors the reference shape: ``writeErrors`` (list of
    per-row errors with absolute indexes) and ``nInserted``.
    """

    def __init__(self, details: dict):
        self.details = details
        super().__init__(details)
