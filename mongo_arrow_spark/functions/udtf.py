"""Python UDTF extension point (SURVEY §2.E, last row).

The engine's third user-extension surface, alongside Arrow-batched pandas
UDFs (``streaming/events.py``) and stateful processors: Spark 4's Python
user-defined TABLE functions — one input row in, any number of typed rows
out, usable from SQL via ``LATERAL`` after :func:`register_udtfs`.

The reference has no counterpart (its pipelines are MQL delegated to
mongod, api.py:252 — users cannot add operators); this module is the
engine-native answer to "I need a row-expanding operator the built-ins
don't have".

Scale note: like every Python-on-data path, UDTFs are the SLOW lane —
per-row Python dispatch. The shipped examples exist to pin the extension
point's contract (``unwind_json`` is proven row-equivalent to the
``explode`` plan the engine actually uses for ``$unwind``,
mql/pipeline.py:519); production operators should stay with built-ins
unless semantics genuinely require Python.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, element string")
class UnwindJson:
    """``$unwind`` as a table function: one output row per element of a
    JSON-encoded array, with its index (``includeArrayIndex``
    semantics). Null/empty arrays yield no rows, like ``$unwind``'s
    default (preserveNullAndEmptyArrays=false)."""

    def eval(self, arr: str):
        if arr is None:
            return
        parsed = json.loads(arr)
        if not isinstance(parsed, list):
            return
        for i, e in enumerate(parsed):
            yield i, e if isinstance(e, str) else json.dumps(e)


@udtf(returnType="gram string")
class WordNgrams:
    """Word n-gram shingles of a text column — the tokenize step of the
    Jaccard dedup family as a reusable table function."""

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        words = text.split()
        for i in range(max(0, len(words) - n + 1)):
            yield (" ".join(words[i : i + n]),)


def register_udtfs(spark, use_arrow: bool = False) -> None:
    """Register the engine UDTFs for SQL use:

    >>> register_udtfs(spark)
    >>> spark.sql("SELECT d.doc_id, g.gram FROM docs d, "
    ...           "LATERAL word_ngrams(d.text, 3) g")

    ``use_arrow=True`` registers Arrow-optimized variants (rows cross the
    Python boundary in Arrow batches instead of pickled one-by-one — the
    same lever pandas UDFs pull); identical output, pinned by tests.
    """
    if use_arrow:
        spark.udtf.register(
            "unwind_json",
            udtf(UnwindJson.func, returnType=UnwindJson.returnType,
                 useArrow=True),
        )
        spark.udtf.register(
            "word_ngrams",
            udtf(WordNgrams.func, returnType=WordNgrams.returnType,
                 useArrow=True),
        )
        return
    spark.udtf.register("unwind_json", UnwindJson)
    spark.udtf.register("word_ngrams", WordNgrams)
