"""Document-shape utilities: flatten nested structs to dotted-path columns
and re-nest them — the reference's dotted-path builder model
(lib.pyx:227-241 keys like ``a.b``, re-assembled in context.py:61-91)
exposed as reversible DataFrame transforms. Useful when exporting document
data to flat consumers (BI, CSV) and re-importing."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten(df: DataFrame, sep: str = ".") -> DataFrame:
    """Struct columns → one column per leaf, named by dotted path.
    Arrays are left intact (the reference keeps list boundaries too)."""
    cols = []

    def walk(prefix: str, dt: T.DataType, ref):
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f"{prefix}{sep}{f.name}", f.dataType, ref.getField(f.name))
        else:
            cols.append(ref.alias(prefix))

    for field in df.schema.fields:
        walk(field.name, field.dataType, F.col(f"`{field.name}`"))
    return df.select(*cols)


def nest(df: DataFrame, sep: str = ".") -> DataFrame:
    """Inverse of :func:`flatten`: dotted-path columns → nested structs."""
    tree: dict = {}
    for name in df.columns:
        parts = name.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = F.col(f"`{name}`")

    def build(node):
        if not isinstance(node, dict):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return df.select(
        *[
            (build(v).alias(k) if isinstance(v, dict) else v.alias(k))
            for k, v in tree.items()
        ]
    )
