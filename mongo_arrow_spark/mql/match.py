"""MQL find-filter (query document) → Catalyst predicate Column.

The reference forwards the ``query`` dict verbatim to the server
(reference api.py:175); its own tests exercise ``{"_id": {"$gt": 2}}``
(test_arrow.py:125) and ``$eq`` (test_arrow.py:1225). Here the query
document becomes a boolean Column so Catalyst pushes it into the scan
(PushedFilters on parquet).

Semantics notes vs MongoDB:
- Spark has no missing-vs-null distinction; ``$exists: true`` maps to
  IS NOT NULL and a missing field at read time is a null column.
- ``$eq: None`` matches null (MQL: null or missing) — same effect here.
- ``$ne`` uses null-safe inequality (MQL's $ne matches missing fields).
"""

from __future__ import annotations

from functools import reduce as _reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from mongo_arrow_spark.errors import MQLTranslationError
from mongo_arrow_spark.mql.expressions import translate_expr


def translate_match(query: dict | None) -> Column:
    if query is None or query == {}:
        return F.lit(True)
    if isinstance(query, Column):
        return query
    if not isinstance(query, dict):
        raise MQLTranslationError(f"match query must be a dict, got {query!r}")
    preds = []
    for key, value in query.items():
        if key == "$and":
            preds.append(_reduce(lambda a, b: a & b, map(translate_match, value)))
        elif key == "$or":
            preds.append(_reduce(lambda a, b: a | b, map(translate_match, value)))
        elif key == "$nor":
            preds.append(~_reduce(lambda a, b: a | b, map(translate_match, value)))
        elif key == "$expr":
            preds.append(translate_expr(value))
        elif key == "$comment":
            continue
        elif key == "$sampleRate":
            preds.append(F.rand() < float(value))
        elif key == "$text":
            preds.append(_text_predicate(value))
        elif key.startswith("$"):
            raise MQLTranslationError(f"unsupported top-level operator: {key}")
        else:
            preds.append(_field_predicate(F.col(key), value))
    return _reduce(lambda a, b: a & b, preds)


def _text_predicate(value: dict) -> Column:
    """Top-level ``$text``: OR-of-terms whole-word containment. MQL
    resolves the searched field from the collection's text index; this
    engine has no index catalog, so the field defaults to ``text`` and is
    overridable with the ``$path`` extension key. Case-insensitive unless
    ``$caseSensitive``; no stemming (documented delta — MQL stems by
    index language)."""
    if not isinstance(value, dict) or "$search" not in value:
        raise MQLTranslationError('$text requires {"$search": "..."}')
    field = value.get("$path", "text")
    col = F.col(field)
    if not value.get("$caseSensitive", False):
        col = F.lower(col)
    terms = [
        t if value.get("$caseSensitive", False) else t.lower()
        for t in str(value["$search"]).split()
    ]
    toks = F.split(col, r" ", -1)
    return _reduce(
        lambda a, b: a | b,
        [F.array_contains(toks, F.lit(t)) for t in terms],
    )


#: MQL regex options → Python/Java inline flags. ``l`` (locale-dependent
#: \w) has no JVM equivalent and is rejected rather than ignored.
_REGEX_OPTION_FLAGS = {"i": "i", "m": "m", "s": "s", "x": "x"}


def _fold_regex_options(value: dict) -> dict:
    """Fold ``$options`` into ``$regex`` as inline flags: {"$regex": "^a",
    "$options": "i"} → {"$regex": "(?i)^a"}. MQL evaluates the pair as one
    case-insensitive match; translating them as separate predicates would
    silently run case-sensitive."""
    opts = value.get("$options", "")
    flags = []
    for ch in opts:
        if ch not in _REGEX_OPTION_FLAGS:
            raise MQLTranslationError(f"unsupported $options flag: {ch!r}")
        flags.append(_REGEX_OPTION_FLAGS[ch])
    folded = {k: v for k, v in value.items() if k != "$options"}
    if flags:
        folded["$regex"] = f"(?{''.join(flags)})" + value["$regex"]
    return folded


def _field_predicate(col: Column, value) -> Column:
    if isinstance(value, dict) and any(k.startswith("$") for k in value):
        if "$options" in value:
            if "$regex" not in value:
                raise MQLTranslationError("$options requires $regex")
            value = _fold_regex_options(value)
        preds = [_field_op(col, op, arg) for op, arg in value.items()]
        return _reduce(lambda a, b: a & b, preds)
    if value is None:
        return col.isNull()
    return col == F.lit(value)


def _field_op(col: Column, op: str, arg) -> Column:
    if op == "$eq":
        return col.isNull() if arg is None else col == F.lit(arg)
    if op == "$ne":
        # MQL $ne matches docs where the field is missing/null too
        return ~col.eqNullSafe(F.lit(arg))
    if op == "$gt":
        return col > F.lit(arg)
    if op == "$gte":
        return col >= F.lit(arg)
    if op == "$lt":
        return col < F.lit(arg)
    if op == "$lte":
        return col <= F.lit(arg)
    if op == "$in":
        if any(v is None for v in arg):
            non_null = [v for v in arg if v is not None]
            return col.isNull() | col.isin(*non_null)
        return col.isin(*arg)
    if op == "$nin":
        return ~(col.isNull() | col.isin(*[v for v in arg if v is not None])) if any(
            v is None for v in arg
        ) else (~col.isin(*arg) | col.isNull())
    if op == "$exists":
        return col.isNotNull() if arg else col.isNull()
    if op == "$regex":
        return col.rlike(arg)
    if op == "$mod":
        d, r = arg
        return col % F.lit(d) == F.lit(r)
    if op == "$size":
        return F.size(col) == F.lit(arg)
    if op == "$all":
        return _reduce(
            lambda a, b: a & b, [F.array_contains(col, F.lit(v)) for v in arg]
        )
    if op == "$elemMatch":

        def body(x):
            if all(o.startswith("$") for o in arg):
                # operator form: predicates over the element itself
                # (routes through _field_predicate so $options folds)
                return _field_predicate(x, arg)
            preds = [
                _field_predicate(x.getField(o), a) for o, a in arg.items()
            ]
            return _reduce(lambda a, b: a & b, preds)

        return F.exists(col, body)
    if op == "$not":
        return ~_field_predicate(col, arg)
    if op == "$type":
        return _type_predicate(col, arg)
    if op == "$geoWithin":
        return _geo_within(col, arg)
    if op in ("$near", "$nearSphere"):
        # MQL $near also SORTS results via the geo index; a filter
        # predicate can't express ordering, so this matches the
        # $minDistance/$maxDistance ball only (documented delta — use the
        # $geoNear stage for sorted-by-distance results)
        if isinstance(arg, dict) and "$geometry" in arg:
            lng0, lat0 = arg["$geometry"]["coordinates"]
            max_d = arg.get("$maxDistance")
            min_d = arg.get("$minDistance")
        else:
            raise MQLTranslationError(
                f"{op} requires {{$geometry: {{coordinates: [lng, lat]}}}}"
            )
        preds = []
        if max_d is not None:
            preds.append(
                _geo_within(
                    col,
                    {"$centerSphere": [[lng0, lat0], float(max_d) / 6378137.0]},
                )
            )
        if min_d is not None:
            preds.append(
                ~_geo_within(
                    col,
                    {"$centerSphere": [[lng0, lat0], float(min_d) / 6378137.0]},
                )
            )
        if not preds:
            return F.lit(True)
        return _reduce(lambda a, b: a & b, preds)
    if op in ("$bitsAllSet", "$bitsAnySet", "$bitsAllClear", "$bitsAnyClear"):
        mask = (
            _reduce(lambda a, b: a | b, (1 << p for p in arg))
            if isinstance(arg, (list, tuple))
            else int(arg)
        )
        masked = col.cast("long").bitwiseAND(F.lit(mask))
        if op == "$bitsAllSet":
            return masked == F.lit(mask)
        if op == "$bitsAnySet":
            return masked != F.lit(0)
        if op == "$bitsAllClear":
            return masked == F.lit(0)
        return masked != F.lit(mask)  # $bitsAnyClear
    raise MQLTranslationError(f"unsupported field operator: {op}")


def _geo_within(col: Column, arg: dict) -> Column:
    """$geoWithin over [lng, lat] array columns: ``$centerSphere``
    ([[lng, lat], radius_radians], spherical haversine like $geoNear) and
    ``$box`` ([[minLng, minLat], [maxLng, maxLat]], flat bounds). Pure
    codegen'd trig/compare — no index, exact per-row evaluation."""
    lng, lat = (
        F.element_at(col, 1).cast("double"),
        F.element_at(col, 2).cast("double"),
    )
    if "$centerSphere" in arg:
        (c_lng, c_lat), radius_rad = arg["$centerSphere"]
        rlat0 = F.lit(float(c_lat) * 3.141592653589793 / 180)
        rlng0 = F.lit(float(c_lng) * 3.141592653589793 / 180)
        rlat, rlng = F.radians(lat), F.radians(lng)
        a = (
            F.pow(F.sin((rlat - rlat0) / 2), 2)
            + F.cos(rlat0) * F.cos(rlat) * F.pow(F.sin((rlng - rlng0) / 2), 2)
        )
        central_angle = 2 * F.asin(F.least(F.lit(1.0), F.sqrt(a)))
        return central_angle <= F.lit(float(radius_rad))
    if "$box" in arg:
        (x1, y1), (x2, y2) = arg["$box"]
        return (
            (lng >= F.lit(min(x1, x2)))
            & (lng <= F.lit(max(x1, x2)))
            & (lat >= F.lit(min(y1, y2)))
            & (lat <= F.lit(max(y1, y2)))
        )
    raise MQLTranslationError(
        "$geoWithin supports $centerSphere and $box shapes"
    )


#: MQL $type aliases / BSON type numbers → Spark type-name predicates
#: (typeof() names). Only types the engine's data model carries.
_TYPE_ALIASES = {
    "double": "double", 1: "double",
    "string": "string", 2: "string",
    "object": "struct", 3: "struct",
    "array": "array", 4: "array",
    "binData": "binary", 5: "binary",
    "bool": "boolean", 8: "boolean",
    "date": "timestamp", 9: "timestamp",
    "int": "int", 16: "int",
    "long": "bigint", 18: "bigint",
    "decimal": "decimal", 19: "decimal",
    "null": "null", 10: "null",
}


def _type_predicate(col: Column, arg) -> Column:
    """$type: match by runtime type name. Spark columns are statically
    typed, so typeof() is constant per column — the predicate is exact
    for the engine's data model (a VariantType column would carry the
    per-row dynamism; the corpus model doesn't use it). "null" matches
    null values, mirroring MQL's BSON-null type."""
    wanted = arg if isinstance(arg, (list, tuple)) else [arg]
    names = []
    for w in wanted:
        if w == "number":
            names += ["double", "int", "bigint", "decimal", "float", "smallint"]
            continue
        if w not in _TYPE_ALIASES:
            raise MQLTranslationError(f"unsupported $type: {w!r}")
        names.append(_TYPE_ALIASES[w])
    preds = []
    for n in names:
        if n == "null":
            preds.append(col.isNull())
        elif n == "decimal":
            preds.append(F.typeof(col).startswith("decimal") & col.isNotNull())
        else:
            preds.append((F.typeof(col) == F.lit(n)) & col.isNotNull())
    return _reduce(lambda a, b: a | b, preds)
