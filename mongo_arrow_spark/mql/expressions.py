"""MQL aggregation expressions → Catalyst Columns.

Every ``$``-operator maps to a JVM-side ``pyspark.sql.functions`` expression,
so translated pipelines stay inside whole-stage codegen — no Python UDFs on
this path. This is the language the reference exposes through its pipeline
passthrough (reference api.py:216-217, the sole constructed expression being
``$multiply`` in its tests, test_arrow.py:145).

Scale note: translation is purely structural (driver-side, O(expression
size)); the produced plan is whatever Catalyst makes of the equivalent
DataFrame expression, identical to hand-written ``F.*`` code.
"""

from __future__ import annotations

import datetime as _dt
import re as _re
from functools import reduce as _reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from mongo_arrow_spark.errors import MQLTranslationError

_OPS: dict = {}


def _op(*names):
    def deco(fn):
        for n in names:
            _OPS[n] = fn
        return fn

    return deco


def translate_expr(expr, env: dict | None = None) -> Column:
    """Translate one MQL aggregation expression to a Column.

    ``env`` maps ``$$variable`` names (from $filter/$map/$reduce/$let) to
    Columns.
    """
    env = env or {}
    if isinstance(expr, Column):
        return expr
    if isinstance(expr, str):
        if expr.startswith("$$"):
            path = expr[2:]
            root, _, rest = path.partition(".")
            if root in env:
                col = env[root]
                for part in rest.split(".") if rest else []:
                    col = col.getField(part)
                return col
            if root == "ROOT" and "ROOT" not in env:
                raise MQLTranslationError(
                    "$$ROOT is only available inside stages that bind it"
                )
            if root == "SEARCH_META":
                # bound as a hidden column by $search when its `count`
                # option is present (Atlas semantics: SEARCH_META is
                # populated by the preceding $search stage)
                col = F.col("__SEARCH_META")
                for part in rest.split(".") if rest else []:
                    col = col.getField(part)
                return col
            raise MQLTranslationError(f"unbound MQL variable: {expr}")
        if expr.startswith("$"):
            # a field path is shorthand for $$CURRENT.<path>; $redact
            # rebinds CURRENT per document level so paths resolve into
            # the subdocument being evaluated
            base = env.get("CURRENT")
            if base is not None:
                col = base
                for part in expr[1:].split("."):
                    col = col.getField(part)
                return col
            return F.col(expr[1:])
        return F.lit(expr)
    if expr is None or isinstance(expr, (bool, int, float, _dt.date, _dt.datetime)):
        return F.lit(expr)
    if isinstance(expr, (list, tuple)):
        return F.array(*[translate_expr(e, env) for e in expr])
    if isinstance(expr, dict):
        if len(expr) == 1:
            ((op, args),) = expr.items()
            if isinstance(op, str) and op.startswith("$"):
                fn = _OPS.get(op)
                if fn is None:
                    raise MQLTranslationError(f"unsupported MQL operator: {op}")
                return fn(args, env)
        # document literal with (possibly computed) fields → struct
        return F.struct(
            *[translate_expr(v, env).alias(k) for k, v in expr.items()]
        )
    raise MQLTranslationError(f"cannot translate expression: {expr!r}")


def _many(args, env, min_n=1):
    if not isinstance(args, (list, tuple)):
        args = [args]
    if len(args) < min_n:
        raise MQLTranslationError(f"expected >= {min_n} args, got {args!r}")
    return [translate_expr(a, env) for a in args]


def _pair(args, env):
    cols = _many(args, env, 2)
    if len(cols) != 2:
        raise MQLTranslationError(f"expected exactly 2 args, got {args!r}")
    return cols


# ---------------------------------------------------------------- arithmetic


@_op("$add")
def _add(args, env):
    return _reduce(lambda a, b: a + b, _many(args, env))


@_op("$subtract")
def _subtract(args, env):
    a, b = _pair(args, env)
    return a - b


@_op("$multiply")
def _multiply(args, env):
    return _reduce(lambda a, b: a * b, _many(args, env))


@_op("$divide")
def _divide(args, env):
    a, b = _pair(args, env)
    return a / b


@_op("$mod")
def _mod(args, env):
    a, b = _pair(args, env)
    return a % b


@_op("$abs")
def _abs(args, env):
    return F.abs(translate_expr(args, env))


@_op("$ceil")
def _ceil(args, env):
    return F.ceil(translate_expr(args, env))


@_op("$floor")
def _floor(args, env):
    return F.floor(translate_expr(args, env))


@_op("$round")
def _round(args, env):
    # MQL rounds half-to-even; F.round is half-up, F.bround is half-even
    if isinstance(args, (list, tuple)) and len(args) == 2:
        return F.bround(translate_expr(args[0], env), int(args[1]))
    return F.bround(translate_expr(args, env), 0)


@_op("$trunc")
def _trunc(args, env):
    if isinstance(args, (list, tuple)) and len(args) == 2:
        col, place = translate_expr(args[0], env), int(args[1])
    else:
        col, place = translate_expr(args, env), 0
    factor = 10**place
    scaled = col * F.lit(factor)
    return (
        F.when(col >= 0, F.floor(scaled)).otherwise(F.ceil(scaled)) / F.lit(factor)
    )


@_op("$sqrt")
def _sqrt(args, env):
    return F.sqrt(translate_expr(args, env))


@_op("$pow")
def _pow(args, env):
    a, b = _pair(args, env)
    return F.pow(a, b)


@_op("$exp")
def _exp(args, env):
    return F.exp(translate_expr(args, env))


@_op("$ln")
def _ln(args, env):
    return F.log(translate_expr(args, env))


@_op("$log10")
def _log10(args, env):
    return F.log10(translate_expr(args, env))


@_op("$log")
def _log(args, env):
    num, base = _pair(args, env)
    return F.log(num) / F.log(base)


# ----------------------------------------------------------------- bitwise
# (MongoDB 6.3+: integer-only operands, null in → null out; Spark's native
# bitwise operators type-coerce int/long exactly like MQL's int→long widening)


@_op("$bitAnd")
def _bit_and(args, env):
    return _reduce(lambda a, b: a.bitwiseAND(b), _many(args, env))


@_op("$bitOr")
def _bit_or(args, env):
    return _reduce(lambda a, b: a.bitwiseOR(b), _many(args, env))


@_op("$bitXor")
def _bit_xor(args, env):
    return _reduce(lambda a, b: a.bitwiseXOR(b), _many(args, env))


@_op("$bitNot")
def _bit_not(args, env):
    if isinstance(args, (list, tuple)):
        if len(args) != 1:
            raise MQLTranslationError("$bitNot takes exactly one argument")
        args = args[0]
    return F.bitwise_not(translate_expr(args, env))


# ---------------------------------------------------------------- comparison


@_op("$eq")
def _eq(args, env):
    a, b = _pair(args, env)
    return a == b


@_op("$ne")
def _ne(args, env):
    a, b = _pair(args, env)
    return a != b


@_op("$gt")
def _gt(args, env):
    a, b = _pair(args, env)
    return a > b


@_op("$gte")
def _gte(args, env):
    a, b = _pair(args, env)
    return a >= b


@_op("$lt")
def _lt(args, env):
    a, b = _pair(args, env)
    return a < b


@_op("$lte")
def _lte(args, env):
    a, b = _pair(args, env)
    return a <= b


@_op("$cmp")
def _cmp(args, env):
    a, b = _pair(args, env)
    return (
        F.when(a < b, F.lit(-1)).when(a > b, F.lit(1)).otherwise(F.lit(0))
    )


# ------------------------------------------------------------------- logical


def _truthy(col: Column) -> Column:
    """MQL boolean coercion for condition positions: false, 0, null are
    falsy; other numerics truthy. ``try_cast`` keeps boolean expressions
    untouched (the no-op cast folds away); the null-coalesce makes a null
    operand behave as ``false`` exactly like mongod, so e.g.
    ``{$and: [null, true]}`` is false, not null. Types with no boolean
    cast (arrays/structs/free-form strings — truthy in mongod) coerce to
    null → false: the engine's documented delta."""
    return F.coalesce(col.try_cast("boolean"), F.lit(False))


@_op("$and")
def _and(args, env):
    # operands coerce to truthiness first — `&` on raw ints would be
    # BITWISE in Spark (3 & 4 == 0), silently wrong for MQL logic
    return _reduce(lambda a, b: a & b, [_truthy(c) for c in _many(args, env)])


@_op("$or")
def _or(args, env):
    return _reduce(lambda a, b: a | b, [_truthy(c) for c in _many(args, env)])


@_op("$not")
def _not(args, env):
    (a,) = _many(args, env)
    return ~_truthy(a)


# --------------------------------------------------------------- conditional


@_op("$cond")
def _cond(args, env):
    if isinstance(args, dict):
        c, t, e = args["if"], args["then"], args["else"]
    else:
        c, t, e = args
    return F.when(_truthy(translate_expr(c, env)), translate_expr(t, env)).otherwise(
        translate_expr(e, env)
    )


@_op("$ifNull")
def _if_null(args, env):
    return F.coalesce(*_many(args, env, 2))


@_op("$switch")
def _switch(args, env):
    col = None
    for branch in args["branches"]:
        case = _truthy(translate_expr(branch["case"], env))
        then = translate_expr(branch["then"], env)
        col = F.when(case, then) if col is None else col.when(case, then)
    if "default" in args:
        col = col.otherwise(translate_expr(args["default"], env))
    return col


@_op("$coalesce")  # engine extension (SQL COALESCE; MQL spells it $ifNull)
def _coalesce(args, env):
    return F.coalesce(*_many(args, env))


@_op("$literal")
def _literal(args, env):
    return F.lit(args)


@_op("$let")
def _let(args, env):
    inner = dict(env)
    for name, val in args.get("vars", {}).items():
        inner[name] = translate_expr(val, env)
    return translate_expr(args["in"], inner)


# -------------------------------------------------------------------- string


@_op("$concat")
def _concat(args, env):
    return F.concat(*_many(args, env))


@_op("$toLower")
def _to_lower(args, env):
    return F.lower(translate_expr(args, env))


@_op("$toUpper")
def _to_upper(args, env):
    return F.upper(translate_expr(args, env))


@_op("$strLenCP")
def _strlen(args, env):
    return F.length(translate_expr(args, env))


@_op("$strLenBytes")
def _strlen_bytes(args, env):
    return F.octet_length(translate_expr(args, env))


@_op("$substrCP", "$substr", "$substrBytes")
def _substr(args, env):
    s, start, length = (translate_expr(a, env) for a in args)
    # MQL is 0-based; Spark substring is 1-based
    return F.substring(s, start + F.lit(1), length)


@_op("$split")
def _split(args, env):
    s, delim = args
    if not isinstance(delim, str):
        raise MQLTranslationError("$split delimiter must be a string literal")
    # MQL splits on a literal delimiter; quote it for Java regex
    return F.split(translate_expr(s, env), _re.escape(delim), -1)


@_op("$trim")
def _trim(args, env):
    inp = translate_expr(args["input"], env)
    if "chars" in args:
        return F.btrim(inp, F.lit(args["chars"]))
    return F.trim(inp)


def _char_class(chars: str) -> str:
    """Java-regex character class matching any char of ``chars``
    (re.escape is valid inside a class)."""
    return "[" + "".join(_re.escape(c) for c in chars) + "]"


@_op("$ltrim")
def _ltrim(args, env):
    inp = translate_expr(args["input"], env)
    if "chars" in args:
        if not isinstance(args["chars"], str):
            raise MQLTranslationError("$ltrim chars must be a string literal")
        return F.regexp_replace(inp, "^" + _char_class(args["chars"]) + "+", "")
    return F.ltrim(inp)


@_op("$rtrim")
def _rtrim(args, env):
    inp = translate_expr(args["input"], env)
    if "chars" in args:
        if not isinstance(args["chars"], str):
            raise MQLTranslationError("$rtrim chars must be a string literal")
        return F.regexp_replace(inp, _char_class(args["chars"]) + "+$", "")
    return F.rtrim(inp)


@_op("$regexMatch")
def _regex_match(args, env):
    inp = translate_expr(args["input"], env)
    regex = args["regex"]
    opts = args.get("options", "")
    if "i" in opts:
        regex = "(?i)" + regex
    return inp.rlike(regex)


@_op("$replaceAll")
def _replace_all(args, env):
    inp = translate_expr(args["input"], env)
    return F.replace(
        inp,
        translate_expr(args["find"], env),
        translate_expr(args["replacement"], env),
    )


@_op("$replaceOne")
def _replace_one(args, env):
    inp = translate_expr(args["input"], env)
    find, repl = args["find"], args["replacement"]
    if not isinstance(find, str):
        raise MQLTranslationError("$replaceOne find must be a string literal")
    pos = F.instr(inp, find)
    before = F.substring(inp, F.lit(1), pos - F.lit(1))
    after = F.substring(
        inp, pos + F.lit(len(find)), F.length(inp)
    )
    return F.when(pos > 0, F.concat(before, translate_expr(repl, env), after)).otherwise(
        inp
    )


def _index_search(args, env):
    """Shared [string, substring, start?, end?] unpack for $indexOf*."""
    s = translate_expr(args[0], env)
    sub = translate_expr(args[1], env)
    start = (
        translate_expr(args[2], env).cast("int") if len(args) > 2 else F.lit(0)
    )
    end = translate_expr(args[3], env).cast("int") if len(args) > 3 else None
    return s, sub, start, end


@_op("$indexOfCP")
def _index_of_cp(args, env):
    """0-based code-point index of the first occurrence in [start, end).

    ``position(sub, s, pos)`` is the JVM char-based search; the occurrence
    must fit wholly inside the range, matching the server's scan of
    s[start:end]."""
    s, sub, start, end = _index_search(args, env)
    loc = F.call_function("position", sub, s, start + F.lit(1))
    idx = loc - F.lit(1)
    hit = loc > 0
    if end is not None:
        hit = hit & (idx + F.length(sub) <= end)
    return F.when(s.isNull(), F.lit(None)).otherwise(
        F.when(hit, idx).otherwise(F.lit(-1))
    )


@_op("$indexOfBytes")
def _index_of_bytes(args, env):
    """0-based BYTE index of the first occurrence, ranges in bytes.

    UTF-8 is self-synchronizing — a valid needle can only match at char
    boundaries — so the char-based ``position`` finds the same occurrences;
    the byte offset is the octet length of the prefix before the match. The
    byte-range start is mapped to a char position by decoding the first
    ``start`` bytes (boundary-aligned starts, as the server requires)."""
    s, sub, start, end = _index_search(args, env)
    char_start = F.length(F.substring(s.cast("binary"), 1, start).cast("string"))
    loc = F.call_function("position", sub, s, char_start + F.lit(1))
    idx = F.octet_length(F.substring(s, F.lit(1), loc - F.lit(1)))
    hit = (loc > 0) & (idx >= start)
    if end is not None:
        hit = hit & (idx + F.octet_length(sub) <= end)
    return F.when(s.isNull(), F.lit(None)).otherwise(
        F.when(hit, idx).otherwise(F.lit(-1))
    )


# ---------------------------------------------------------------------- date


@_op("$year")
def _year(args, env):
    return F.year(_date_arg(args, env))


@_op("$month")
def _month(args, env):
    return F.month(_date_arg(args, env))


@_op("$dayOfMonth")
def _day_of_month(args, env):
    return F.dayofmonth(_date_arg(args, env))


@_op("$hour")
def _hour(args, env):
    return F.hour(_date_arg(args, env))


@_op("$minute")
def _minute(args, env):
    return F.minute(_date_arg(args, env))


@_op("$second")
def _second(args, env):
    return F.second(_date_arg(args, env))


@_op("$millisecond")
def _millisecond(args, env):
    # cast: unix_micros rejects TIMESTAMP_NTZ; NTZ reads as session-UTC
    # instants under the engine's tz contract
    c = _date_arg(args, env).cast("timestamp")
    return (F.unix_micros(c) / 1000 % 1000).cast("int")


@_op("$dayOfWeek")
def _day_of_week(args, env):
    # both MQL and Spark use 1 = Sunday
    return F.dayofweek(_date_arg(args, env))


@_op("$dayOfYear")
def _day_of_year(args, env):
    return F.dayofyear(_date_arg(args, env))


@_op("$isoWeek")
def _iso_week(args, env):
    return F.weekofyear(_date_arg(args, env))


@_op("$week")
def _week(args, env):
    # MQL $week: Sunday-start weeks, days before the year's first Sunday
    # are week 0 (strftime %U). floor((yday0 + 7 - sunday0_dow) / 7) with
    # 0-based day-of-year and 0=Sunday day-of-week.
    d = _date_arg(args, env)
    return F.floor(
        (F.dayofyear(d) - 1 + 7 - (F.dayofweek(d) - 1)) / 7
    ).cast("int")


def _date_arg(args, env):
    if isinstance(args, dict) and "date" in args:
        return translate_expr(args["date"], env)
    return translate_expr(args, env)


_MQL_DATE_FMT = {
    "%Y": "yyyy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%M": "mm",
    "%S": "ss",
    "%L": "SSS",
    "%j": "DDD",
    "%%": "%",
}


@_op("$dateToString")
def _date_to_string(args, env):
    fmt = args.get("format", "%Y-%m-%dT%H:%M:%S.%LZ")
    for mql, spark in _MQL_DATE_FMT.items():
        fmt = fmt.replace(mql, spark)
    return F.date_format(translate_expr(args["date"], env), fmt)


_TRUNC_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}

#: first <weekday> on or before the server's 2000-01-01 anchor (a Saturday)
_WEEK_ANCHORS = {
    "monday": "1999-12-27", "tuesday": "1999-12-28",
    "wednesday": "1999-12-29", "thursday": "1999-12-30",
    "friday": "1999-12-31", "saturday": "2000-01-01",
    "sunday": "1999-12-26",
}


@_op("$dateTrunc")
def _date_trunc(args, env):
    """``binSize == 1`` delegates to date_trunc; wider bins reproduce the
    server's anchoring at 2000-01-01T00:00:00 (startOfWeek-shifted for
    week units). Fixed-width units bin in integer microseconds — a
    floored modulus, no doubles (unix-micros magnitudes overflow a double
    mantissa); month-based units bin in month counts and rebuild via
    add_months. Session-UTC, like every date op here (C7 contract)."""
    bin_size = int(args.get("binSize", 1))
    unit = args["unit"]
    d = translate_expr(args["date"], env).cast("timestamp")
    if bin_size == 1 and unit != "week":
        return F.date_trunc(unit, d)
    if bin_size < 1:
        raise MQLTranslationError("$dateTrunc binSize must be a positive int")
    if unit in _TRUNC_UNIT_US:
        if unit == "week":
            start = str(args.get("startOfWeek", "sunday")).lower()
            if start not in _WEEK_ANCHORS:
                raise MQLTranslationError(f"bad startOfWeek: {start!r}")
            anchor = _WEEK_ANCHORS[start]
        else:
            anchor = "2000-01-01"
        anchor_us = F.unix_micros(F.to_timestamp(F.lit(anchor)))
        width = F.lit(bin_size * _TRUNC_UNIT_US[unit])
        off = F.unix_micros(d) - anchor_us
        floored = off - ((off % width) + width) % width  # floor to bin, sign-safe
        return F.timestamp_micros(floored + anchor_us)
    if unit in ("month", "quarter", "year"):
        per = {"month": 1, "quarter": 3, "year": 12}[unit] * bin_size
        months = (F.year(d) - F.lit(2000)) * 12 + F.month(d) - F.lit(1)
        binned = months - ((months % per) + per) % per
        return F.to_timestamp(F.add_months(F.lit("2000-01-01"), binned))
    raise MQLTranslationError(f"$dateTrunc unit {unit!r} unsupported")


_INTERVAL_SLOT = {
    "year": 0,
    "month": 1,
    "week": 2,
    "day": 3,
    "hour": 4,
    "minute": 5,
    "second": 6,
}


@_op("$dateAdd")
def _date_add(args, env):
    unit = args["unit"]
    if unit not in _INTERVAL_SLOT:
        raise MQLTranslationError(f"$dateAdd unit {unit} unsupported")
    amount = translate_expr(args["amount"], env)
    slots = [F.lit(0)] * 7
    slots[_INTERVAL_SLOT[unit]] = amount
    return translate_expr(args["startDate"], env) + F.make_interval(*slots)


@_op("$dateSubtract")
def _date_subtract(args, env):
    unit = args["unit"]
    if unit not in _INTERVAL_SLOT:
        raise MQLTranslationError(f"$dateSubtract unit {unit} unsupported")
    amount = translate_expr(args["amount"], env)
    slots = [F.lit(0)] * 7
    slots[_INTERVAL_SLOT[unit]] = amount
    return translate_expr(args["startDate"], env) - F.make_interval(*slots)


@_op("$dateDiff")
def _date_diff(args, env):
    start = translate_expr(args["startDate"], env)
    end = translate_expr(args["endDate"], env)
    unit = args["unit"]
    if unit == "day":
        # MQL counts date-boundary crossings
        return F.datediff(F.to_date(end), F.to_date(start)).cast("long")
    return F.timestamp_diff(unit, start, end)


@_op("$toDate")
def _to_date(args, env):
    return translate_expr(args, env).cast("timestamp")


# --------------------------------------------------------------------- array


@_op("$size")
def _size(args, env):
    return F.size(translate_expr(args, env))


@_op("$arrayElemAt")
def _array_elem_at(args, env):
    arr_e, idx_e = args
    arr = translate_expr(arr_e, env)
    if isinstance(idx_e, int):
        if idx_e < 0:
            # both -1-based from the end; null OOB
            return F.try_element_at(arr, F.lit(idx_e))
        return F.get(arr, F.lit(idx_e))  # 0-based like MQL
    # runtime index: branch on sign so computed negatives also count
    # from the end (MQL semantics), not silently null out
    idx = translate_expr(idx_e, env)
    return F.when(idx < 0, F.try_element_at(arr, idx)).otherwise(F.get(arr, idx))


@_op("$first")
def _first_elem(args, env):
    return F.get(translate_expr(args, env), 0)


@_op("$last")
def _last_elem(args, env):
    return F.try_element_at(translate_expr(args, env), F.lit(-1))


@_op("$slice")
def _slice(args, env):
    if len(args) == 2:
        arr, n = translate_expr(args[0], env), args[1]
        if isinstance(n, int) and n < 0:
            return F.slice(arr, F.size(arr) + F.lit(n) + 1, F.lit(-n))
        return F.slice(arr, 1, n)
    arr = translate_expr(args[0], env)
    pos, n = args[1], args[2]
    # MQL position is 0-based (negative = from end); Spark slice is 1-based
    pos_col = translate_expr(pos, env)
    start = F.when(pos_col >= 0, pos_col + 1).otherwise(F.size(arr) + pos_col + 1)
    return F.slice(arr, start, translate_expr(n, env))


@_op("$concatArrays")
def _concat_arrays(args, env):
    return F.concat(*_many(args, env))


@_op("$in")
def _in(args, env):
    elem, arr = args
    return F.array_contains(translate_expr(arr, env), translate_expr(elem, env))


@_op("$indexOfArray")
def _index_of_array(args, env):
    arr, val = args[0], args[1]
    return (
        F.array_position(translate_expr(arr, env), translate_expr(val, env)) - 1
    ).cast("int")


@_op("$filter")
def _filter(args, env):
    var = args.get("as", "this")
    cond = args["cond"]

    def body(x):
        inner = dict(env)
        inner[var] = x
        inner.setdefault("this", x)
        return _truthy(translate_expr(cond, inner))

    col = F.filter(translate_expr(args["input"], env), body)
    if "limit" in args:
        col = F.slice(col, 1, translate_expr(args["limit"], env))
    return col


@_op("$map")
def _map(args, env):
    var = args.get("as", "this")
    in_expr = args["in"]

    def body(x):
        inner = dict(env)
        inner[var] = x
        inner.setdefault("this", x)
        return translate_expr(in_expr, inner)

    return F.transform(translate_expr(args["input"], env), body)


@_op("$reduce")
def _reduce_op(args, env):
    in_expr = args["in"]

    def merge(acc, x):
        inner = dict(env)
        inner["value"] = acc
        inner["this"] = x
        return translate_expr(in_expr, inner)

    return F.aggregate(
        translate_expr(args["input"], env),
        translate_expr(args["initialValue"], env),
        merge,
    )


@_op("$zip")
def _zip(args, env):
    return F.arrays_zip(*_many(args["inputs"], env))


@_op("$range")
def _range(args, env):
    if len(args) == 2:
        start, end, step = args[0], args[1], 1
    else:
        start, end, step = args
    if not all(isinstance(a, int) for a in (start, end, step)):
        raise MQLTranslationError("$range supports integer literals only")
    # MQL excludes the end point; Spark sequence is inclusive
    if (step > 0 and start >= end) or (step < 0 and start <= end):
        return F.array().cast("array<int>")
    last = end - 1 if step > 0 else end + 1
    return F.sequence(F.lit(start), F.lit(last), F.lit(step))


@_op("$reverseArray")
def _reverse_array(args, env):
    return F.reverse(translate_expr(args, env))


@_op("$sortArray")
def _sort_array(args, env):
    inp = translate_expr(args["input"], env)
    by = args.get("sortBy", 1)
    if by in (1, -1):
        return F.sort_array(inp, asc=by == 1)
    if isinstance(by, dict):
        # sort array-of-structs by fields: comparator over getField chains
        def cmp(left, right):
            out = F.lit(0)
            for fld, direction in reversed(list(by.items())):
                l, r = left.getField(fld), right.getField(fld)
                lo, hi = (-1, 1) if direction == 1 else (1, -1)
                out = (
                    F.when(l < r, F.lit(lo)).when(l > r, F.lit(hi)).otherwise(out)
                )
            return out

        return F.array_sort(inp, cmp)
    raise MQLTranslationError(f"bad $sortArray sortBy: {by!r}")


@_op("$isArray")
def _is_array(args, env):
    (a,) = _many(args if isinstance(args, list) else [args], env)
    return F.typeof(a).startswith("array")


@_op("$arrayAvg")  # engine extensions for array math ($avg over array in MQL)
def _array_avg(args, env):
    arr = translate_expr(args, env)
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ) / F.size(arr)


# ------------------------------------------------------- array math (MQL $sum
# and friends double as accumulators; in expression position they fold arrays)


@_op("$sum")
def _sum_expr(args, env):
    if isinstance(args, (list, tuple)):
        return _reduce(lambda a, b: a + b, _many(args, env))
    arr = translate_expr(args, env)
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


@_op("$avg")
def _avg_expr(args, env):
    arr = translate_expr(args, env)
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    ) / F.size(arr)


@_op("$max")
def _max_expr(args, env):
    if isinstance(args, (list, tuple)) and len(args) > 1:
        return F.greatest(*_many(args, env))
    return F.array_max(translate_expr(args, env))


@_op("$min")
def _min_expr(args, env):
    if isinstance(args, (list, tuple)) and len(args) > 1:
        return F.least(*_many(args, env))
    return F.array_min(translate_expr(args, env))


def _numeric_array(args, env):
    """Non-null doubles from an array expression (MQL stats expressions
    ignore non-numeric members; nulls are the Spark analogue)."""
    arr = translate_expr(args, env)
    return F.filter(arr, lambda x: x.isNotNull()).cast("array<double>")


def _std_dev(args, env, sample):
    vals = _numeric_array(args, env)
    n = F.size(vals)
    s = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x)
    ss = F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x * x)
    mean = s / n
    if sample:
        # null below 2 members, like the server
        return F.when(
            n >= 2, F.sqrt(F.greatest((ss - n * mean * mean) / (n - 1), F.lit(0.0)))
        )
    return F.when(n >= 1, F.sqrt(F.greatest(ss / n - mean * mean, F.lit(0.0))))


@_op("$stdDevPop")
def _std_dev_pop_expr(args, env):
    return _std_dev(args, env, sample=False)


@_op("$stdDevSamp")
def _std_dev_samp_expr(args, env):
    return _std_dev(args, env, sample=True)


def _nearest_rank(sorted_vals, n, p):
    """Smallest member with at least p·n members ≤ it (the server's
    nearest-rank percentile definition)."""
    idx = F.greatest(F.ceil(F.lit(float(p)) * n), F.lit(1)).cast("int")
    return F.try_element_at(sorted_vals, idx)


@_op("$percentile")
def _percentile_expr(args, env):
    """Expression (array-input) form: {input, p: [..], method}. Exact
    nearest-rank over the sorted array — the t-digest approximation only
    matters at accumulator scale, where the $group path handles it."""
    if not isinstance(args, dict) or "input" not in args or "p" not in args:
        raise MQLTranslationError("$percentile requires {input, p, method}")
    ps = args["p"]
    if not isinstance(ps, (list, tuple)) or not all(
        isinstance(p, (int, float)) and 0 < p < 1 for p in ps
    ):
        raise MQLTranslationError("$percentile p must be constants in (0, 1)")
    vals = F.array_sort(_numeric_array(args["input"], env))
    n = F.size(vals)
    return F.when(n >= 1, F.array(*[_nearest_rank(vals, n, p) for p in ps]))


@_op("$median")
def _median_expr(args, env):
    if not isinstance(args, dict) or "input" not in args:
        raise MQLTranslationError("$median requires {input, method}")
    vals = F.array_sort(_numeric_array(args["input"], env))
    n = F.size(vals)
    return F.when(n >= 1, _nearest_rank(vals, n, 0.5))


@_op("$binarySize")
def _binary_size(args, env):
    return F.octet_length(translate_expr(args, env)).cast("long")


@_op("$bsonSize")
def _bson_size(args, env):
    """Byte size of a document column when encoded as BSON, computed with
    the engine's own spec codec (bson_codec.py) inside an Arrow-batched
    pandas UDF — Python on data, but this op is intrinsically about the
    BSON wire form, which no Catalyst expression models."""
    import pandas as _pd
    import warnings as _warnings

    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    from mongo_arrow_spark.bson_codec import encode_document

    def size(s):
        # struct columns arrive as a pandas DataFrame (one col per field)
        if isinstance(s, _pd.DataFrame):
            recs = s.to_dict("records")
            return _pd.Series(
                [float(len(encode_document(r))) for r in recs], index=s.index
            )
        return s.map(
            lambda d: None if d is None else float(len(encode_document(dict(d))))
        )

    with _warnings.catch_warnings():
        _warnings.simplefilter("ignore")
        udf = pandas_udf(size, returnType="double", functionType=PandasUDFType.SCALAR)
    return udf(translate_expr(args, env)).cast("long")


@_op("$tsSecond")
def _ts_second(args, env):
    # BSON internal timestamps carry as struct<time:long, inc:long> (the
    # .bson read path decodes type 0x11 into that shape)
    return translate_expr(args, env).getField("time").cast("long")


@_op("$tsIncrement")
def _ts_increment(args, env):
    return translate_expr(args, env).getField("inc").cast("long")


@_op("$strcasecmp")
def _strcasecmp(args, env):
    a, b = _pair(args, env)
    la, lb = F.lower(a), F.lower(b)
    return F.when(la < lb, F.lit(-1)).when(la > lb, F.lit(1)).otherwise(F.lit(0))


@_op("$rand")
def _rand(args, env):
    return F.rand()


@_op("$degreesToRadians")
def _deg2rad(args, env):
    return F.radians(translate_expr(args, env))


@_op("$radiansToDegrees")
def _rad2deg(args, env):
    return F.degrees(translate_expr(args, env))


@_op("$sin")
def _sin(args, env):
    return F.sin(translate_expr(args, env))


@_op("$cos")
def _cos(args, env):
    return F.cos(translate_expr(args, env))


@_op("$tan")
def _tan(args, env):
    return F.tan(translate_expr(args, env))


@_op("$atan2")
def _atan2(args, env):
    a, b = _pair(args, env)
    return F.atan2(a, b)


# ------------------------------------------------------------------ set ops


@_op("$setUnion")
def _set_union(args, env):
    cols = _many(args, env)
    return F.array_distinct(F.concat(*cols) if len(cols) > 1 else cols[0])


@_op("$setIntersection")
def _set_intersection(args, env):
    return _reduce(F.array_intersect, _many(args, env, 2))


@_op("$setDifference")
def _set_difference(args, env):
    a, b = _pair(args, env)
    return F.array_except(a, b)


@_op("$setEquals")
def _set_equals(args, env):
    a, b = _pair(args, env)
    return F.sort_array(F.array_distinct(a)) == F.sort_array(F.array_distinct(b))


@_op("$setIsSubset")
def _set_is_subset(args, env):
    a, b = _pair(args, env)
    return F.size(F.array_except(a, b)) == 0


@_op("$allElementsTrue")
def _all_elements_true(args, env):
    (a,) = _many(args, env)
    return F.forall(a, lambda x: x.cast("boolean"))


@_op("$anyElementTrue")
def _any_element_true(args, env):
    (a,) = _many(args, env)
    return F.exists(a, lambda x: x.cast("boolean"))


# ------------------------------------------------------------------ map/objs


@_op("$objectToArray")
def _object_to_array(args, env):
    m = translate_expr(args, env)
    return F.transform(
        F.map_entries(m),
        lambda e: F.struct(e.getField("key").alias("k"), e.getField("value").alias("v")),
    )


@_op("$arrayToObject")
def _array_to_object(args, env):
    arr = translate_expr(args, env)
    return F.map_from_entries(
        F.transform(arr, lambda e: F.struct(e.getField("k"), e.getField("v")))
    )


def _merge_maps_last_wins(cols):
    """Merge MapType columns with MQL last-wins semantics, independent of
    spark.sql.mapKeyDedupPolicy: an entry of map i survives only if no
    later map contains its key, so map_from_entries never sees duplicate
    keys. Null inputs behave as empty documents (MQL)."""

    def survives(i):
        def cond(e):
            k = e.getField("key")
            later = [
                F.coalesce(F.map_contains_key(cols[j], k), F.lit(False))
                for j in range(i + 1, len(cols))
            ]
            if not later:
                return F.lit(True)
            out = ~later[0]
            for c in later[1:]:
                out = out & ~c
            return out

        return cond

    parts = [
        F.filter(F.coalesce(F.map_entries(c), F.array()), survives(i))
        for i, c in enumerate(cols)
    ]
    return F.map_from_entries(F.concat(*parts) if len(parts) > 1 else parts[0])


@_op("$mergeObjects")
def _merge_objects(args, env):
    """MQL $mergeObjects: later documents overwrite earlier keys.

    Two shapes: (a) all-document-literals merge statically (struct
    output, heterogeneous value types fine); (b) otherwise every arg is
    treated as a MapType document (field refs to map columns, literals
    via create_map) and merged entries-wise with last-wins — never
    map_concat, whose duplicate-key behavior depends on
    spark.sql.mapKeyDedupPolicy (EXCEPTION by default)."""
    items = args if isinstance(args, list) else [args]
    if all(
        isinstance(a, dict) and not any(k.startswith("$") for k in a)
        for a in items
    ):
        merged: dict = {}
        for a in items:
            merged.update(a)  # python dict update == MQL last-wins
        return translate_expr(merged, env)
    cols = []
    for a in items:
        if isinstance(a, dict) and not any(k.startswith("$") for k in a):
            kv = []
            for k, v in a.items():
                kv.extend([F.lit(k), translate_expr(v, env)])
            cols.append(F.create_map(*kv))
        else:
            cols.append(translate_expr(a, env))
    if len(cols) == 1:
        return cols[0]
    return _merge_maps_last_wins(cols)


@_op("$getField")
def _get_field(args, env):
    if isinstance(args, dict):
        inp = translate_expr(args["input"], env)
        return inp.getField(args["field"])
    raise MQLTranslationError("$getField requires {field, input}")


# -------------------------------------------------------------------- typing


@_op("$toInt")
def _to_int(args, env):
    return translate_expr(args, env).cast("int")


@_op("$toLong")
def _to_long(args, env):
    return translate_expr(args, env).cast("long")


@_op("$toDouble")
def _to_double(args, env):
    return translate_expr(args, env).cast("double")


@_op("$toDecimal")
def _to_decimal(args, env):
    return translate_expr(args, env).cast("decimal(38,6)")


@_op("$toBool")
def _to_bool(args, env):
    """Semantics delta (documented): numerics follow mongod (0 → false,
    else true, null → null); strings follow SQL boolean parsing
    ('true'/'false'/'1'/'0'...), with unparseable strings → null rather
    than mongod's any-string-is-true (the static-typed engine cannot
    branch on runtime BSON type). try_cast keeps ANSI mode from raising
    on unparseable input."""
    return translate_expr(args, env).try_cast("boolean")


@_op("$toString")
def _to_string(args, env):
    return translate_expr(args, env).cast("string")


_CONVERT_TO = {
    "int": "int",
    "long": "long",
    "double": "double",
    "decimal": "decimal(38,6)",
    "bool": "boolean",
    "string": "string",
    "date": "timestamp",
}


def _convert_formatted(inp, to, fmt):
    """MongoDB 8.0 ``$convert`` ``format``: binData ↔ string through an
    encoding. string side: base64 / base64url / hex (lowercase, like the
    server) / utf8 / uuid (canonical hyphenated). binData side uses
    try_to_binary so malformed input yields null → routes to onError."""
    if to == "string":
        if fmt == "base64":
            return F.base64(inp)
        if fmt == "base64url":
            return F.translate(F.base64(inp), "+/", "-_")
        if fmt == "hex":
            return F.lower(F.hex(inp))
        if fmt == "utf8":
            return F.decode(inp, "UTF-8")
        if fmt == "uuid":
            h = F.lower(F.hex(inp))
            return F.when(
                F.length(h) == 32,
                F.concat_ws(
                    "-",
                    F.substring(h, 1, 8),
                    F.substring(h, 9, 4),
                    F.substring(h, 13, 4),
                    F.substring(h, 17, 4),
                    F.substring(h, 21, 12),
                ),
            )
    elif to == "binData":
        if fmt == "base64":
            return F.try_to_binary(inp, F.lit("base64"))
        if fmt == "base64url":
            return F.try_to_binary(
                F.translate(inp, "-_", "+/"), F.lit("base64")
            )
        if fmt == "hex":
            return F.try_to_binary(inp, F.lit("hex"))
        if fmt == "utf8":
            return F.encode(inp, "UTF-8")
        if fmt == "uuid":
            # canonical hyphenated string → 16 raw bytes
            return F.when(
                F.length(inp) == 36,
                F.try_to_binary(F.translate(inp, "-", ""), F.lit("hex")),
            )
    raise MQLTranslationError(
        f"$convert format {fmt!r} unsupported for to: {to!r} "
        "(binData↔string with base64/base64url/hex/utf8/uuid)"
    )


@_op("$convert")
def _convert(args, env):
    inp = translate_expr(args["input"], env)
    to = args["to"]
    fmt = args.get("format")
    if fmt is not None:
        out = _convert_formatted(inp, to, fmt)
    elif to == "binData":
        out = inp.try_cast("binary")
    else:
        spark_t = _CONVERT_TO.get(to)
        if spark_t is None:
            raise MQLTranslationError(f"$convert to {to} unsupported")
        out = inp.try_cast(spark_t)
    if "onError" in args:
        out = F.when(inp.isNotNull() & out.isNull(), translate_expr(args["onError"], env)).otherwise(out)
    if "onNull" in args:
        # only a NULL INPUT routes to onNull — a failed cast without
        # onError must stay null (the engine's no-raise analogue of the
        # server's error), not borrow the onNull fallback
        out = F.when(inp.isNull(), translate_expr(args["onNull"], env)).otherwise(out)
    return out


@_op("$type")
def _type(args, env):
    return F.typeof(translate_expr(args, env))


@_op("$isNumber")
def _is_number(args, env):
    return F.typeof(translate_expr(args, env)).isin(
        "tinyint", "smallint", "int", "bigint", "float", "double", "decimal(38,18)"
    ) | F.typeof(translate_expr(args, env)).startswith("decimal")


@_op("$meta")
def _meta(args, env=None):
    """Search-score metadata: {"$meta": "vectorSearchScore"} /
    {"$meta": "searchScore"} / {"$meta": "textScore"} read the score
    column attached by the $vectorSearch / $search stages."""
    cols = {
        "vectorSearchScore": "__vector_score",
        "searchScore": "__search_score",
        "textScore": "__search_score",
        "score": "__fusion_score",  # $rankFusion's combined score (8.1)
        "searchHighlights": "__search_highlights",  # $search highlight opt
        "searchScoreDetails": "__search_score_details",  # scoreDetails opt
        # $rankFusion/$scoreFusion scoreDetails: true breakdown (8.1)
        "scoreDetails": "__fusion_score_details",
    }
    if args not in cols:
        raise MQLTranslationError(f"unsupported $meta kind: {args!r}")
    return F.col(cols[args])


@_op("$sigmoid")
def _sigmoid(args, env):
    """MongoDB 8.1 ``$sigmoid``: 1 / (1 + e^-x) — the score-shaping
    companion of ``$scoreFusion``'s sigmoid normalization."""
    x = translate_expr(args, env).cast("double")
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-x))


# ------------------------------------------------- round-2 surface additions


@_op("$asin")
def _asin(args, env):
    return F.asin(translate_expr(args, env))


@_op("$acos")
def _acos(args, env):
    return F.acos(translate_expr(args, env))


@_op("$atan")
def _atan(args, env):
    return F.atan(translate_expr(args, env))


@_op("$sinh")
def _sinh(args, env):
    return F.sinh(translate_expr(args, env))


@_op("$cosh")
def _cosh(args, env):
    return F.cosh(translate_expr(args, env))


@_op("$tanh")
def _tanh(args, env):
    return F.tanh(translate_expr(args, env))


@_op("$asinh")
def _asinh(args, env):
    x = translate_expr(args, env)
    return F.log(x + F.sqrt(x * x + 1))


@_op("$acosh")
def _acosh(args, env):
    x = translate_expr(args, env)
    return F.log(x + F.sqrt(x * x - 1))


@_op("$atanh")
def _atanh(args, env):
    x = translate_expr(args, env)
    return F.log((1 + x) / (1 - x)) / 2


@_op("$isoDayOfWeek")
def _iso_day_of_week(args, env):
    # ISO: 1 = Monday … 7 = Sunday (Spark dayofweek is 1 = Sunday)
    return F.weekday(_date_arg(args, env)) + 1


@_op("$isoWeekYear")
def _iso_week_year(args, env):
    # the year that owns the ISO week — differs from $year around Jan 1.
    # The owning year is the year of the Thursday in d's own ISO week:
    # step back 4 days (past Monday..Thursday) then take the next Thursday,
    # which lands on d's week-Thursday for every weekday including Thursday
    # itself (next_day is strictly-after).
    d = _date_arg(args, env)
    return F.year(F.next_day(F.date_sub(d, 4), "Thu")).cast("long")


@_op("$dateFromParts")
def _date_from_parts(args, env):
    """Calendar form (year/month/day/...) and ISO-week form
    (isoWeekYear/isoWeek/isoDayOfWeek), both with the time parts.
    ISO form: ISO week 1 always contains Jan 4, so the date is
    Monday-of-week-1 + (isoWeek−1)·7 + (isoDayOfWeek−1) days —
    out-of-range parts carry over by day arithmetic, as in MQL."""

    def part(name, default):
        if name in args:
            return translate_expr(args[name], env).cast("int")
        return F.lit(default)

    time_of_day = (
        part("hour", 0),
        part("minute", 0),
        part("second", 0).cast("double")
        + part("millisecond", 0).cast("double") / 1000.0,
    )
    if "isoWeekYear" in args:
        jan4 = F.make_date(part("isoWeekYear", 1970), F.lit(1), F.lit(4))
        week1_monday = F.date_sub(jan4, F.weekday(jan4))
        day = F.date_add(
            week1_monday,
            ((part("isoWeek", 1) - 1) * 7 + part("isoDayOfWeek", 1) - 1).cast(
                "int"
            ),
        )
        ts = F.make_timestamp(
            F.year(day), F.month(day), F.dayofmonth(day), *time_of_day
        )
    else:
        ts = F.make_timestamp(
            part("year", 1970), part("month", 1), part("day", 1), *time_of_day
        )
    if "timezone" in args:
        ts = F.to_utc_timestamp(ts, args["timezone"])
    return ts


@_op("$dateToParts")
def _date_to_parts(args, env):
    d = _date_arg(args, env)
    if isinstance(args, dict) and args.get("timezone"):
        d = F.from_utc_timestamp(d, args["timezone"])
    return F.struct(
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.hour(d).alias("hour"),
        F.minute(d).alias("minute"),
        F.second(d).alias("second"),
        (F.unix_micros(d.cast("timestamp")) / 1000 % 1000)
        .cast("int")
        .alias("millisecond"),
    )


@_op("$dateFromString")
def _date_from_string(args, env):
    if not isinstance(args, dict):
        raise MQLTranslationError("$dateFromString requires {dateString, ...}")
    s = translate_expr(args["dateString"], env)
    fmt = args.get("format")
    on_error = args.get("onError")
    on_null = args.get("onNull")
    if fmt is not None:
        # MQL %-codes → Spark datetime pattern (common subset)
        for mql, spk in (
            ("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
            ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%L", "SSS"),
        ):
            fmt = fmt.replace(mql, spk)
        out = F.try_to_timestamp(s, F.lit(fmt))
    else:
        out = F.try_to_timestamp(s)
    if args.get("timezone"):
        out = F.to_utc_timestamp(out, args["timezone"])
    # MQL routes null input through onNull (null when absent); onError is
    # reserved for parse failures of non-null strings.
    if on_error is not None:
        out = F.coalesce(out, translate_expr(on_error, env))
    if on_null is not None:
        null_val = translate_expr(on_null, env)
    else:
        null_val = F.lit(None).cast("timestamp")
    if on_error is not None or on_null is not None:
        out = F.when(s.isNull(), null_val).otherwise(out)
    return out


@_op("$regexFind")
def _regex_find(args, env):
    inp = translate_expr(args["input"], env)
    regex = args["regex"]
    if "i" in args.get("options", ""):
        regex = "(?i)" + regex
    m = F.regexp_extract(inp, f"({regex})", 1)
    # MQL returns null (not '') when there is no match
    return F.when(inp.rlike(regex), m)


@_op("$regexFindAll")
def _regex_find_all(args, env):
    inp = translate_expr(args["input"], env)
    regex = args["regex"]
    if "i" in args.get("options", ""):
        regex = "(?i)" + regex
    return F.regexp_extract_all(inp, F.lit(f"({regex})"), 1)


@_op("$firstN")
def _first_n(args, env):
    return F.slice(
        translate_expr(args["input"], env), 1, int(args["n"])
    )


@_op("$lastN")
def _last_n(args, env):
    inp = translate_expr(args["input"], env)
    n = int(args["n"])
    return F.slice(inp, F.greatest(F.size(inp) - n + 1, F.lit(1)), n)


@_op("$maxN")
def _max_n(args, env):
    # MQL ignores nulls in minN/maxN; filter BEFORE the sort+reverse or
    # array_sort's nulls-last placement becomes nulls-first after reverse
    inp = translate_expr(args["input"], env)
    n = int(args["n"])
    no_null = F.filter(inp, lambda x: x.isNotNull())
    return F.slice(F.reverse(F.array_sort(no_null)), 1, n)


@_op("$minN")
def _min_n(args, env):
    # MQL ignores nulls in minN/maxN; array_sort puts nulls last
    inp = translate_expr(args["input"], env)
    n = int(args["n"])
    no_null = F.filter(inp, lambda x: x.isNotNull())
    return F.slice(F.array_sort(no_null), 1, n)


@_op("$setField")
def _set_field(args, env):
    inp = translate_expr(args["input"], env)
    return inp.withField(args["field"], translate_expr(args["value"], env))


@_op("$unsetField")
def _unset_field(args, env):
    inp = translate_expr(args["input"], env)
    return inp.dropFields(args["field"])


@_op("$toObjectId")
def _to_object_id(args, env):
    """Hex string → 12-byte ObjectId carrier (unhex to binary)."""
    return F.unhex(translate_expr(args, env))


@_op("$toUUID")
def _to_uuid(args, env):
    """Canonical UUID string → 16-byte binary carrier (the server's
    shorthand for $convert to binData subtype 4, MongoDB 8.0). Dashes are
    stripped; a malformed UUID yields null (unhex's no-raise analogue of
    the server error), and a strict length guard rejects hex strings
    that aren't exactly 128 bits."""
    s = F.regexp_replace(translate_expr(args, env), "-", "")
    return F.when(F.length(s) == 32, F.unhex(s)).otherwise(F.lit(None))


@_op("$function")
def _function(args, env):
    """MQL ``$function`` reinterpreted Spark-first. The server-side form
    runs JavaScript (``lang: "js"``) — there is no JS engine here, so
    that form raises. The engine extension accepts a PYTHON CALLABLE as
    ``body`` with ``lang: "python"`` and a ``returnType`` (Spark DDL or
    DataType), compiled to an Arrow-batched pandas UDF over the
    translated ``args`` columns:

        {"$function": {"body": lambda a, b: a + b,
                       "args": ["$x", "$y"],
                       "lang": "python",
                       "returnType": "double"}}

    The callable runs once per row over pandas Series elements (wrapped
    map), so it must be a plain scalar function — for vectorized code
    pass ``vectorized=True`` and receive the Series themselves.
    """
    if not isinstance(args, dict):
        raise MQLTranslationError("$function requires a spec document")
    lang = args.get("lang", "js")
    if lang != "python":
        raise MQLTranslationError(
            "$function lang='js' needs a MongoDB server; this engine runs "
            "lang='python' with a callable body"
        )
    body = args.get("body")
    if not callable(body):
        raise MQLTranslationError("$function python body must be a callable")
    rtype = args.get("returnType", "string")
    cols = [translate_expr(a, env) for a in args.get("args", [])]
    import pandas as _pd
    from pyspark.sql.pandas.functions import PandasUDFType, pandas_udf

    if args.get("vectorized", False):
        fn = body
    else:

        def fn(*series):
            if not series:
                return _pd.Series([])
            return _pd.Series(
                [body(*vals) for vals in zip(*series)], index=series[0].index
            )

    import warnings as _warnings

    with _warnings.catch_warnings():
        # unannotated fn + explicit SCALAR type: the arity is only known
        # at translation time, so type hints can't express it
        _warnings.simplefilter("ignore")
        udf = pandas_udf(fn, returnType=rtype, functionType=PandasUDFType.SCALAR)
    return udf(*cols)
