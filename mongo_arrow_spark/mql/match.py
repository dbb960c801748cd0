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
            # MQL coerces the expression result to truthiness (false, 0,
            # null → drop). try_cast keeps boolean expressions untouched
            # (Catalyst folds the no-op cast, so pushdown survives) and
            # maps numerics through 0-falsy; types with no boolean cast
            # (arrays, structs, free-form strings — truthy in mongod)
            # become null → dropped, the documented delta.
            preds.append(translate_expr(value).try_cast("boolean"))
        elif key == "$comment":
            continue
        elif key == "$sampleRate":
            preds.append(F.rand() < float(value))
        elif key == "$text":
            preds.append(_text_predicate(value))
        elif key == "$jsonSchema":
            preds.append(_json_schema_predicate(value, None))
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
    ignored = {"$language", "$diacriticSensitive"} & set(value)
    if ignored:
        import warnings

        warnings.warn(
            f"$text options {sorted(ignored)} are accepted but ignored: "
            "no stemming/diacritic folding without an index language"
        )
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
        return F.exists(col, lambda x: elem_match_predicate(x, arg))
    if op == "$not":
        return ~_field_predicate(col, arg)
    if op == "$type":
        return _type_predicate(col, arg)
    if op == "$jsonSchema":
        return col.isNull() | _json_schema_predicate(arg, col)
    if op == "$geoWithin":
        return _geo_within(col, arg)
    if op == "$geoIntersects":
        # for point columns intersect ≡ within (boundary-inclusive modulo
        # ray-casting edge ties); geometry-vs-geometry needs a geo lib
        if not isinstance(arg, dict) or "$geometry" not in arg:
            raise MQLTranslationError("$geoIntersects requires $geometry")
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


def elem_match_predicate(x: Column, arg: dict) -> Column:
    """$elemMatch body over one array element — shared by the match
    predicate (F.exists) and the find-projection operator (F.filter)."""
    if all(o.startswith("$") for o in arg):
        # operator form: predicates over the element itself
        # (routes through _field_predicate so $options folds)
        return _field_predicate(x, arg)
    preds = [_field_predicate(x.getField(o), a) for o, a in arg.items()]
    return _reduce(lambda a, b: a & b, preds)


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
    if "$center" in arg:
        # legacy flat circle: euclidean distance in degree space
        (c_lng, c_lat), radius = arg["$center"]
        d2 = F.pow(lng - F.lit(float(c_lng)), 2) + F.pow(
            lat - F.lit(float(c_lat)), 2
        )
        return d2 <= F.lit(float(radius) ** 2)
    if "$polygon" in arg:
        return _point_in_ring(lng, lat, arg["$polygon"])
    if "$geometry" in arg:
        geom = arg["$geometry"]
        if geom.get("type") != "Polygon":
            raise MQLTranslationError(
                "$geoWithin $geometry supports Polygon (use $centerSphere "
                "for circles)"
            )
        outer, *holes = geom["coordinates"]
        pred = _point_in_ring(lng, lat, outer)
        for hole in holes:
            pred = pred & ~_point_in_ring(lng, lat, hole)
        return pred
    raise MQLTranslationError(
        "$geoWithin supports $centerSphere, $box, $center, $polygon and "
        "$geometry Polygon shapes"
    )


def _point_in_ring(lng: Column, lat: Column, vertices) -> Column:
    """Ray-casting point-in-polygon over LITERAL vertices: the driver-side
    loop unrolls each edge into one XOR term, so the whole test is a single
    codegen'd boolean expression — no UDF, no geo library. Planar in
    lng/lat space (the documented delta vs the server's spherical winding
    for $geometry polygons; exact for the legacy flat $polygon)."""
    verts = [tuple(map(float, v)) for v in vertices]
    if len(verts) >= 2 and verts[0] == verts[-1]:
        verts = verts[:-1]  # GeoJSON rings repeat the first vertex
    if len(verts) < 3:
        raise MQLTranslationError("polygon needs at least 3 distinct vertices")
    inside = F.lit(False)
    for i, (x1, y1) in enumerate(verts):
        x2, y2 = verts[(i + 1) % len(verts)]
        if y1 == y2:
            continue  # horizontal edge never crosses a horizontal ray
        straddles = (F.lit(y1) > lat) != (F.lit(y2) > lat)
        x_at_lat = F.lit((x2 - x1) / (y2 - y1)) * (lat - F.lit(y1)) + F.lit(x1)
        inside = inside != (straddles & (lng < x_at_lat))  # boolean XOR
    return inside


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


#: JSON-Schema draft-4 ``type`` names → the engine's $type aliases.
_JSON_TYPE_TO_BSON = {
    "object": "object",
    "array": "array",
    "string": "string",
    "boolean": "bool",
    "null": "null",
    "number": "number",
}

_SCHEMA_ANNOTATIONS = frozenset(("title", "description"))


def _json_schema_predicate(schema: dict, col: Column | None) -> Column:
    """MQL ``$jsonSchema`` (draft-4 subset, the keywords the server
    accepts) → one boolean Column. ``col is None`` means the root
    document, where properties resolve to top-level columns.

    Null≡missing is this engine's documented contract, so every keyword
    except ``required`` passes on null fields (JSON Schema: constraints
    only bind when the property is present), and ``required`` is the
    presence check. Unknown keywords raise — the server rejects them too.
    """
    if not isinstance(schema, dict):
        raise MQLTranslationError("$jsonSchema must be a document")
    preds = []
    sub = (lambda f: F.col(f)) if col is None else (lambda f: col.getField(f))
    for kw, arg in schema.items():
        if kw in _SCHEMA_ANNOTATIONS:
            continue
        if kw == "required":
            preds += [sub(f).isNotNull() for f in arg]
        elif kw == "properties":
            for f, s in arg.items():
                c = sub(f)
                preds.append(c.isNull() | _json_schema_predicate(s, c))
        elif kw in ("bsonType", "type"):
            if col is None:
                continue  # the root is always a document
            wanted = arg if isinstance(arg, (list, tuple)) else [arg]
            if kw == "type":
                mapped = []
                for w in wanted:
                    if w == "integer":
                        mapped += ["int", "long"]
                    elif w not in _JSON_TYPE_TO_BSON:
                        raise MQLTranslationError(f"unsupported type: {w!r}")
                    else:
                        mapped.append(_JSON_TYPE_TO_BSON[w])
                wanted = mapped
            preds.append(_type_predicate(col, wanted))
        elif kw == "enum":
            preds.append(_require(col, kw).isin(*arg))
        elif kw == "minimum":
            c = _require(col, kw)
            preds.append(
                c > F.lit(arg) if schema.get("exclusiveMinimum") else c >= F.lit(arg)
            )
        elif kw == "maximum":
            c = _require(col, kw)
            preds.append(
                c < F.lit(arg) if schema.get("exclusiveMaximum") else c <= F.lit(arg)
            )
        elif kw in ("exclusiveMinimum", "exclusiveMaximum"):
            continue  # folded into minimum/maximum (draft-4 boolean form)
        elif kw == "multipleOf":
            preds.append(_require(col, kw) % F.lit(arg) == F.lit(0))
        elif kw == "pattern":
            preds.append(_require(col, kw).rlike(arg))
        elif kw == "minLength":
            preds.append(F.length(_require(col, kw)) >= F.lit(arg))
        elif kw == "maxLength":
            preds.append(F.length(_require(col, kw)) <= F.lit(arg))
        elif kw == "minItems":
            preds.append(F.size(_require(col, kw)) >= F.lit(arg))
        elif kw == "maxItems":
            preds.append(F.size(_require(col, kw)) <= F.lit(arg))
        elif kw == "uniqueItems":
            c = _require(col, kw)
            preds.append(
                F.size(F.array_distinct(c)) == F.size(c) if arg else F.lit(True)
            )
        elif kw == "items":
            if not isinstance(arg, dict):
                raise MQLTranslationError("$jsonSchema items must be a schema")
            preds.append(
                F.forall(
                    _require(col, kw),
                    lambda x: x.isNull() | _json_schema_predicate(arg, x),
                )
            )
        elif kw == "allOf":
            preds += [_json_schema_predicate(s, col) for s in arg]
        elif kw == "anyOf":
            preds.append(
                _reduce(
                    lambda a, b: a | b,
                    [_json_schema_predicate(s, col) for s in arg],
                )
            )
        elif kw == "oneOf":
            hits = [
                _json_schema_predicate(s, col).cast("int") for s in arg
            ]
            preds.append(_reduce(lambda a, b: a + b, hits) == F.lit(1))
        elif kw == "not":
            inner = _json_schema_predicate(arg, col)
            # null still passes (missing fields match any `not`); coalesce
            # keeps a null inner verdict from poisoning the negation
            preds.append(~F.coalesce(inner, F.lit(False)))
        else:
            raise MQLTranslationError(f"unsupported $jsonSchema keyword: {kw}")
    if not preds:
        return F.lit(True)
    return _reduce(lambda a, b: a & b, preds)


def _require(col: Column | None, kw: str) -> Column:
    if col is None:
        raise MQLTranslationError(
            f"$jsonSchema keyword {kw!r} applies to a property, not the root"
        )
    return col


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
