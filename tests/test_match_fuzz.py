"""Randomized find-filter translator check: generated MQL query documents
evaluated by the translator on Spark vs a pure-python reference evaluator
on the same rows. Seeded corpus (fast, deterministic) — extends the
property-testing layer into the query language itself."""

import random

import pytest

from mongo_arrow_spark.mql import translate_match

FIELDS = {
    "a": lambda rng: rng.randint(-5, 5),
    "b": lambda rng: rng.choice([None, 0.5, 1.5, 2.5]),
    "s": lambda rng: rng.choice([None, "x", "y", "zz"]),
}

OPS = ["$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$exists"]


def gen_pred(rng):
    field = rng.choice(list(FIELDS))
    op = rng.choice(OPS)
    val = FIELDS[field](rng)
    if op == "$in":
        return {field: {"$in": [FIELDS[field](rng) for _ in range(3)]}}
    if op == "$exists":
        return {field: {"$exists": rng.choice([True, False])}}
    if val is None:
        return {field: None}
    return {field: {op: val}}


def gen_query(rng, depth=0):
    kind = rng.random()
    if depth < 2 and kind < 0.25:
        return {"$and": [gen_query(rng, depth + 1), gen_query(rng, depth + 1)]}
    if depth < 2 and kind < 0.5:
        return {"$or": [gen_query(rng, depth + 1), gen_query(rng, depth + 1)]}
    return gen_pred(rng)


def py_eval(query, row) -> bool:
    """Reference evaluator with the engine's documented semantics
    (missing==null, $ne null-safe, null comparisons false)."""
    for key, value in query.items():
        if key == "$and":
            if not all(py_eval(q, row) for q in value):
                return False
        elif key == "$or":
            if not any(py_eval(q, row) for q in value):
                return False
        else:
            v = row.get(key)
            if isinstance(value, dict):
                for op, arg in value.items():
                    if op == "$eq" and not v == arg:
                        return False
                    if op == "$ne" and not (v != arg or (v is None) != (arg is None)):
                        if v == arg:
                            return False
                    if op == "$gt" and not (v is not None and v > arg):
                        return False
                    if op == "$gte" and not (v is not None and v >= arg):
                        return False
                    if op == "$lt" and not (v is not None and v < arg):
                        return False
                    if op == "$lte" and not (v is not None and v <= arg):
                        return False
                    if op == "$in" and v not in arg:
                        return False
                    if op == "$exists" and (v is not None) != arg:
                        return False
            elif value is None:
                if v is not None:
                    return False
            elif v != value:
                return False
    return True


def gen_arith(rng, depth=0):
    """Random integer arithmetic expression over fields a (long) and
    constants — safe ops only (no division)."""
    if depth >= 3 or rng.random() < 0.35:
        return rng.choice(["$a", "$i", rng.randint(-9, 9)])
    op = rng.choice(
        ["$add", "$subtract", "$multiply", "$abs", "$cond",
         "$bitAnd", "$bitOr", "$bitXor", "$bitNot"]
    )
    if op in ("$abs", "$bitNot"):
        return {op: gen_arith(rng, depth + 1)}
    if op == "$cond":
        return {
            "$cond": [
                {"$gt": [gen_arith(rng, depth + 1), 0]},
                gen_arith(rng, depth + 1),
                gen_arith(rng, depth + 1),
            ]
        }
    n = 2 if op == "$subtract" else rng.randint(2, 3)
    return {op: [gen_arith(rng, depth + 1) for _ in range(n)]}


def py_arith(expr, row):
    if isinstance(expr, str) and expr.startswith("$"):
        return row[expr[1:]]
    if isinstance(expr, int):
        return expr
    ((op, args),) = expr.items()
    if op == "$abs":
        v = py_arith(args, row)
        return None if v is None else abs(v)
    if op == "$bitNot":
        v = py_arith(args, row)
        return None if v is None else ~v
    if op == "$cond":
        c = py_arith(args[0]["$gt"][0], row)
        cond = c is not None and c > args[0]["$gt"][1]
        return py_arith(args[1] if cond else args[2], row)
    vals = [py_arith(a, row) for a in args]
    if any(v is None for v in vals):
        return None
    if op == "$add":
        return sum(vals)
    if op == "$subtract":
        return vals[0] - vals[1]
    if op == "$multiply":
        out = 1
        for v in vals:
            out *= v
        return out
    if op == "$bitAnd":
        out = -1
        for v in vals:
            out &= v
        return out
    if op == "$bitOr":
        out = 0
        for v in vals:
            out |= v
        return out
    if op == "$bitXor":
        out = 0
        for v in vals:
            out ^= v
        return out
    raise AssertionError(op)


@pytest.fixture(scope="module")
def fuzz_df(spark):
    rng = random.Random(7)
    rows = [
        {name: gen(rng) for name, gen in FIELDS.items()} | {"i": i}
        for i in range(200)
    ]
    df = spark.createDataFrame(
        [(r["i"], r["a"], r["b"], r["s"]) for r in rows],
        "i long, a long, b double, s string",
    ).cache()
    df.count()
    return df, rows


def test_match_translator_agrees_with_reference_eval(fuzz_df):
    df, rows = fuzz_df
    rng = random.Random(99)
    for trial in range(25):
        q = gen_query(rng)
        got = {r["i"] for r in df.filter(translate_match(q)).select("i").collect()}
        want = {r["i"] for r in rows if py_eval(q, r)}
        assert got == want, f"trial {trial}: {q} → spark {sorted(got)[:8]} vs ref {sorted(want)[:8]}"


def test_arith_translator_agrees_with_python(fuzz_df):
    """Random integer arithmetic expression trees: translated Column vs a
    pure-python evaluator, exact equality (integers only — no float
    ambiguity)."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.mql import translate_expr

    df, rows = fuzz_df
    rng = random.Random(1234)
    exprs = [gen_arith(rng) for _ in range(15)]
    out = df.select(
        "i", *[translate_expr(e).alias(f"e{j}") for j, e in enumerate(exprs)]
    ).collect()
    by_i = {r["i"]: r for r in out}
    for row in rows:
        got_row = by_i[row["i"]]
        for j, e in enumerate(exprs):
            want = py_arith(e, row)
            assert got_row[f"e{j}"] == want, (e, row, got_row[f"e{j}"], want)


def test_expr_truthiness_coercion(spark):
    """MQL coerces $expr results to truthiness: false, 0, null drop the
    row; non-zero numerics keep it. Boolean expressions are untouched
    (the no-op cast folds away, preserving pushdown — test_plans)."""
    df = spark.createDataFrame(
        [(1, 0), (2, 3), (3, None), (4, -1)], "id int, x int"
    )
    from mongo_arrow_spark.mql import apply_pipeline

    got = lambda q: sorted(
        r["id"] for r in apply_pipeline(df, [{"$match": q}]).collect()
    )
    assert got({"$expr": "$x"}) == [2, 4]
    assert got({"$expr": {"$add": ["$x", 0]}}) == [2, 4]
    assert got({"$expr": {"$gt": ["$x", 1]}}) == [2]
    assert got({"$expr": {"$literal": 0}}) == []
    assert got({"$expr": {"$literal": 1}}) == [1, 2, 3, 4]


def test_logical_op_truthiness(spark):
    """MQL logical ops coerce operands: {$and: [3, 4]} is true (NOT int
    bitwise 3&4==0); null operands act as false ({$and: [null, true]} →
    false, {$not: null} → true)."""
    from mongo_arrow_spark.mql import apply_pipeline

    df = spark.createDataFrame([(1, 3, 4, None)], "id int, a int, b int, n int")
    out = apply_pipeline(
        df,
        [
            {
                "$addFields": {
                    "and_ints": {"$and": ["$a", "$b"]},
                    "and_zero": {"$and": ["$a", {"$literal": 0}]},
                    "and_null": {"$and": ["$n", {"$literal": True}]},
                    "or_null": {"$or": ["$n", "$a"]},
                    "not_null": {"$not": ["$n"]},
                    "cond_int": {"$cond": ["$a", "yes", "no"]},
                    "cond_null": {"$cond": ["$n", "yes", "no"]},
                }
            }
        ],
    ).first()
    assert out["and_ints"] is True
    assert out["and_zero"] is False
    assert out["and_null"] is False
    assert out["or_null"] is True
    assert out["not_null"] is True
    assert out["cond_int"] == "yes"
    assert out["cond_null"] == "no"
