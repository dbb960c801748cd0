"""Polars extension-dtype mirrors of the BSON logical types.

The reference registers polars extension types for ObjectId / Code /
Decimal128 / Binary (reference polars_types.py:32-70, registration
types.py:217-221) so polars exports keep BSON type identity. This module
is the counterpart for this engine: the same four dtypes over the same
storage (Binary for ObjectId/Decimal128/Binary, String for Code), named
under the ``mongo_arrow_spark.`` namespace.

Everything is import-gated: the polars wheel is optional (and absent in
some deployments), and polars' extension-type API itself is
version-gated (the reference guards on ``hasattr(pl,
"register_extension_type")`` — so do we). When either gate fails the
helpers degrade to no-ops and ``find_polars_all`` still returns plain
storage-typed frames.
"""

from __future__ import annotations

try:
    import polars as pl
except ImportError:  # pragma: no cover - exercised where polars is absent
    pl = None

HAVE_POLARS = pl is not None

#: BSON tag (bson_types.METADATA_KEY value) → extension class, filled at
#: class-definition time below when the polars API allows it.
_EXTENSION_FOR_TAG: dict[str, type] = {}

_HAVE_EXTENSION_API = bool(
    pl is not None
    and hasattr(getattr(pl, "datatypes", None), "BaseExtension")
    and hasattr(pl, "register_extension_type")
)

if _HAVE_EXTENSION_API:

    def _make_ext(cls_name: str, short: str, storage_name: str, tags: list[str]):
        """Build one extension dtype class; a factory (vs four hand-written
        classes) keeps name/storage/tag wiring in one table."""

        def __init__(self) -> None:
            base.__init__(
                self,
                name=f"mongo_arrow_spark.{short}",
                storage=getattr(pl, storage_name),
            )

        def __repr__(self) -> str:
            return cls_name

        def _string_repr(self) -> str:
            return short

        def __eq__(self, other) -> bool:
            return type(other) is type(self)

        base = pl.datatypes.BaseExtension
        cls = type(
            cls_name,
            (base,),
            {
                "__init__": __init__,
                "__repr__": __repr__,
                "_string_repr": _string_repr,
                "__eq__": __eq__,
                "__hash__": lambda self: hash(cls_name),
            },
        )
        for t in tags:
            _EXTENSION_FOR_TAG[t] = cls
        return cls

    PolarsObjectId = _make_ext("PolarsObjectId", "objectid", "Binary", ["objectid"])
    PolarsCode = _make_ext("PolarsCode", "code", "String", ["code"])
    PolarsDecimal128 = _make_ext(
        "PolarsDecimal128", "decimal128", "Binary", ["decimal128", "decimal128[bid]"]
    )
    PolarsBinary = _make_ext("PolarsBinary", "binary", "Binary", [])


_registered = False


def register_polars_extension_types() -> bool:
    """Register the dtypes with polars (idempotent). Returns whether the
    extension API is present and registration happened — callers use the
    bool to decide between typed and storage-typed output."""
    global _registered
    if not _HAVE_EXTENSION_API:
        return False
    if not _registered:
        pl.register_extension_type("mongo_arrow_spark.objectid", PolarsObjectId)
        pl.register_extension_type("mongo_arrow_spark.code", PolarsCode)
        pl.register_extension_type("mongo_arrow_spark.decimal128", PolarsDecimal128)
        pl.register_extension_type("mongo_arrow_spark.binary", PolarsBinary)
        _registered = True
    return True


def apply_bson_dtypes(pldf, struct):
    """Re-dtype BSON-tagged columns of a polars frame to the registered
    extension dtypes (the polars analog of api._bson_dtype_frame). No-op
    when polars lacks the extension API or a cast is refused — the frame
    then keeps the storage types, which is the reference's own behavior
    on old polars."""
    import re as _re

    if not register_polars_extension_types():
        return pldf
    from mongo_arrow_spark.bson_types import METADATA_KEY

    for f in struct.fields:
        tag = (f.metadata or {}).get(METADATA_KEY)
        if not tag or f.name not in pldf.columns:
            continue
        cls = _EXTENSION_FOR_TAG.get(tag)
        if cls is None and _re.fullmatch(r"binary(?:\[\d+\])?", tag):
            cls = _EXTENSION_FOR_TAG.get("__binary__", None) or globals().get(
                "PolarsBinary"
            )
        if cls is None:
            continue
        try:
            pldf = pldf.with_columns(pl.col(f.name).cast(cls()))
        except Exception:
            pass  # cast refused by this polars version: keep storage type
    return pldf
