"""Write result (reference result.py:18-31)."""

from __future__ import annotations


class ArrowWriteResult:
    def __init__(self, result_document: dict):
        self.raw_result = result_document

    @property
    def inserted_count(self) -> int:
        return self.raw_result.get("insertedCount", 0)

    def __repr__(self):
        return f"ArrowWriteResult({self.raw_result!r})"
