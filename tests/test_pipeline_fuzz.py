"""Randomized pipeline-translator differential check.

Extends tests/test_match_fuzz.py (find-filter predicates) up the stack:
seeded random **expression trees** ($add/$subtract/$multiply/$abs/
$min/$max/$cond/$ifNull over nullable columns) and random **$match +
$addFields + $group pipelines** are run through the engine's translator
on Spark and through a pure-Python reference evaluator implementing the
engine's documented semantics (SQL three-valued comparisons, null-
propagating arithmetic, null-skipping least/greatest and accumulators —
see mql/expressions.py comparison block and mql/pipeline.py
_accumulator). Reference parity anchor: the reference delegates these
semantics to mongod; this engine documents its SQL-flavored deltas and
this fuzzer pins the translator to that contract over thousands of
random (expression, row) pairs per run.

Seeded (fast, deterministic) — no hypothesis shrinking needed because
any failure prints the offending expression verbatim.
"""

import math
import random

import pytest

from mongo_arrow_spark.mql import apply_pipeline

# Env-overridable so hardening sessions can rotate seeds without edits
# (the checked-in default stays fixed for reproducible CI failures).
import os as _os

SEED = int(_os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260814"))
N_ROWS = 300


@pytest.fixture(scope="module")
def fuzz_df(spark):
    rng = random.Random(SEED)
    rows = []
    for _ in range(N_ROWS):
        rows.append(
            (
                rng.choice(["a", "b", "c", "d", None]),
                rng.randint(-10, 10),
                rng.choice([None, -2.5, 0.0, 1.25, 3.5, 7.0]),
                rng.choice([None, -3, -2, -1, 0, 1, 2, 3]),
            )
        )
    df = spark.createDataFrame(rows, "k string, x int, y double, z int")
    return df, [dict(zip(("k", "x", "y", "z"), r)) for r in rows]


# ------------------------------------------------------------ generators


def gen_expr(rng, depth=0):
    """Random MQL expression tree over $x/$y/$z and small constants."""
    if depth >= 3 or rng.random() < 0.3:
        return rng.choice(
            ["$x", "$y", "$z", rng.randint(-5, 5), round(rng.uniform(-3, 3), 2)]
        )
    op = rng.choice(
        ["$add", "$subtract", "$multiply", "$abs", "$min", "$max", "$cond", "$ifNull"]
    )
    if op == "$abs":
        return {"$abs": gen_expr(rng, depth + 1)}
    if op in ("$min", "$max"):
        return {op: [gen_expr(rng, depth + 1), gen_expr(rng, depth + 1)]}
    if op == "$cond":
        cmp_op = rng.choice(["$gt", "$gte", "$lt", "$lte", "$eq", "$ne"])
        cond = {cmp_op: [gen_expr(rng, depth + 1), gen_expr(rng, depth + 1)]}
        return {"$cond": [cond, gen_expr(rng, depth + 1), gen_expr(rng, depth + 1)]}
    if op == "$ifNull":
        return {"$ifNull": [gen_expr(rng, depth + 1), gen_expr(rng, depth + 1)]}
    if op == "$subtract":
        return {op: [gen_expr(rng, depth + 1), gen_expr(rng, depth + 1)]}
    n = rng.randint(2, 3)
    return {op: [gen_expr(rng, depth + 1) for _ in range(n)]}


# ------------------------------------------------- reference evaluation


def ref_eval(expr, row):
    """Engine-contract evaluator: SQL nulls, least/greatest skip nulls."""
    if isinstance(expr, str) and expr.startswith("$"):
        return row.get(expr[1:])
    if isinstance(expr, (int, float)):
        return expr
    ((op, args),) = expr.items()
    if op == "$abs":
        v = ref_eval(args, row)
        return None if v is None else abs(v)
    if op == "$cond":
        cond, t, e = args
        ((cmp_op, cmp_args),) = cond.items()
        a, b = (ref_eval(x, row) for x in cmp_args)
        if a is None or b is None:
            c = None
        else:
            c = {
                "$gt": a > b,
                "$gte": a >= b,
                "$lt": a < b,
                "$lte": a <= b,
                "$eq": a == b,
                "$ne": a != b,
            }[cmp_op]
        return ref_eval(t, row) if c else ref_eval(e, row)
    vals = [ref_eval(a, row) for a in args]
    if op == "$add":
        return None if any(v is None for v in vals) else sum(vals)
    if op == "$subtract":
        return None if any(v is None for v in vals) else vals[0] - vals[1]
    if op == "$multiply":
        if any(v is None for v in vals):
            return None
        out = 1
        for v in vals:
            out *= v
        return out
    if op in ("$min", "$max"):
        nn = [v for v in vals if v is not None]
        if not nn:
            return None
        return min(nn) if op == "$min" else max(nn)
    if op == "$ifNull":
        for v in vals:
            if v is not None:
                return v
        return None
    raise AssertionError(f"unhandled op {op}")


def close(a, b):
    if a is None or b is None:
        return a is None and b is None
    return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)


# --------------------------------------------------------------- tests


def test_expr_fuzz_rowwise(fuzz_df):
    """100 random expression trees, evaluated per-row on Spark vs the
    reference evaluator — batched 20 per $addFields round trip."""
    df, rows = fuzz_df
    rng = random.Random(SEED + 1)
    exprs = [gen_expr(rng) for _ in range(100)]
    for batch_start in range(0, len(exprs), 20):
        batch = exprs[batch_start : batch_start + 20]
        fields = {f"e{i}": e for i, e in enumerate(batch)}
        out = apply_pipeline(df, [{"$addFields": fields}]).collect()
        assert len(out) == len(rows)
        for got, row in zip(out, rows):
            for i, e in enumerate(batch):
                want = ref_eval(e, row)
                assert close(got[f"e{i}"], want), (
                    f"expr {e!r} on row {row!r}: spark={got[f'e{i}']!r} "
                    f"ref={want!r}"
                )


def gen_match(rng):
    field = rng.choice(["x", "z"])
    op = rng.choice(["$gt", "$gte", "$lt", "$lte", "$ne", "$eq"])
    return {field: {op: rng.randint(-5, 5)}}


def match_eval(query, row):
    ((field, spec),) = query.items()
    ((op, arg),) = spec.items()
    v = row.get(field)
    if v is None:
        # find-filter semantics: missing/null matches only $eq null /
        # $ne non-null; against a concrete int every range op is False,
        # $ne is True (MQL: null is not equal to any concrete value).
        return op == "$ne"
    return {
        "$gt": v > arg,
        "$gte": v >= arg,
        "$lt": v < arg,
        "$lte": v <= arg,
        "$eq": v == arg,
        "$ne": v != arg,
    }[op]


ACCS = ["$sum", "$avg", "$min", "$max", "count"]


def acc_ref(op, vals):
    nn = [v for v in vals if v is not None]
    if op == "count":
        return len(vals)
    if op == "$sum":
        return sum(nn) if nn else None
    if op == "$avg":
        return sum(nn) / len(nn) if nn else None
    if op == "$min":
        return min(nn) if nn else None
    if op == "$max":
        return max(nn) if nn else None
    raise AssertionError(op)


def test_group_pipeline_fuzz(fuzz_df):
    """18 random $match → $addFields → $group pipelines vs the reference
    evaluator, grouped by $k, accumulators over the computed field."""
    df, rows = fuzz_df
    rng = random.Random(SEED + 2)
    for trial in range(18):
        match = gen_match(rng) if rng.random() < 0.6 else None
        vexpr = gen_expr(rng)
        accs = rng.sample(ACCS, k=rng.randint(1, 3))
        group = {"_id": "$k"}
        for i, a in enumerate(accs):
            if a == "count":
                group[f"a{i}"] = {"$sum": 1}
            else:
                group[f"a{i}"] = {a: "$v"}
        pipeline = []
        if match:
            pipeline.append({"$match": match})
        pipeline += [{"$addFields": {"v": vexpr}}, {"$group": group}]

        got = {
            r["_id"]: {f"a{i}": r[f"a{i}"] for i in range(len(accs))}
            for r in apply_pipeline(df, pipeline).collect()
        }

        kept = [r for r in rows if match is None or match_eval(match, r)]
        want = {}
        for r in kept:
            want.setdefault(r["k"], []).append(ref_eval(vexpr, r))
        for k, vals in want.items():
            assert k in got, f"trial {trial}: missing group {k!r} ({pipeline!r})"
            for i, a in enumerate(accs):
                w = acc_ref("count" if a == "count" else a, vals)
                assert close(got[k][f"a{i}"], w), (
                    f"trial {trial} group {k!r} acc {a}: "
                    f"spark={got[k][f'a{i}']!r} ref={w!r} ({pipeline!r})"
                )
        assert set(got) == set(want), f"trial {trial}: groups {set(got)} != {set(want)}"


# ------------------------------------------------ lookup/unwind/group fuzz


@pytest.fixture(scope="module")
def join_frames(spark, duck):
    rng = random.Random(SEED + 3)
    keys = ["a", "b", "c", "d", "e", None]
    lrows = [
        (i, rng.choice(keys), rng.randint(-5, 5)) for i in range(200)
    ]
    rrows = [
        (i, rng.choice(keys), rng.randint(0, 9)) for i in range(150)
    ]
    ldf = spark.createDataFrame(lrows, "lid int, k string, x int")
    rdf = spark.createDataFrame(rrows, "rid int, k string, y int")
    import pandas as pd

    duck.register("l_fz", pd.DataFrame(lrows, columns=["lid", "k", "x"]))
    duck.register("r_fz", pd.DataFrame(rrows, columns=["rid", "k", "y"]))
    return ldf, rdf


def test_lookup_unwind_group_fuzz(join_frames, duck):
    """Random $match → $lookup → $unwind → $group pipelines vs DuckDB
    LEFT/INNER JOIN aggregation. Pins the engine's documented SQL-null
    join contract (null localField matches nothing) and unwind's
    preserveNullAndEmptyArrays ↔ LEFT vs INNER JOIN equivalence."""
    ldf, rdf = join_frames
    rng = random.Random(SEED + 4)
    for trial in range(12):
        xmin = rng.randint(-5, 3)
        preserve = rng.random() < 0.5
        pipeline = [
            {"$match": {"x": {"$gte": xmin}}},
            {
                "$lookup": {
                    "from": "r_fz",
                    "localField": "k",
                    "foreignField": "k",
                    "as": "m",
                }
            },
            {
                "$unwind": {
                    "path": "$m",
                    "preserveNullAndEmptyArrays": preserve,
                }
            },
            {
                "$group": {
                    "_id": "$k",
                    "n": {"$sum": 1},
                    "sy": {"$sum": "$m.y"},
                }
            },
        ]
        got = {
            r["_id"]: (r["n"], r["sy"])
            for r in apply_pipeline(
                ldf, pipeline, collections={"r_fz": rdf}
            ).collect()
        }
        join_kind = "LEFT" if preserve else "INNER"
        sql = f"""
            SELECT l.k AS k, COUNT(*) AS n, SUM(r.y) AS sy
            FROM (SELECT * FROM l_fz WHERE x >= {xmin}) l
            {join_kind} JOIN r_fz r ON l.k = r.k
            GROUP BY l.k
        """
        want = {
            row[0]: (row[1], row[2]) for row in duck.execute(sql).fetchall()
        }
        assert set(got) == set(want), f"trial {trial} groups"
        for k in want:
            assert got[k][0] == want[k][0], (trial, k, got[k], want[k])
            gs, ws = got[k][1], want[k][1]
            assert (gs is None) == (ws is None) and (
                gs is None or int(gs) == int(ws)
            ), (trial, k, got[k], want[k])


def test_lookup_array_sizes_vs_match_counts(join_frames, duck):
    """No $unwind: the lookup array's size per left row equals DuckDB's
    per-row match count (COUNT(rid) over a LEFT JOIN)."""
    ldf, rdf = join_frames
    out = apply_pipeline(
        ldf,
        [
            {"$lookup": {"from": "r_fz", "localField": "k",
                         "foreignField": "k", "as": "m"}},
            {"$project": {"lid": 1, "nm": {"$size": "$m"}}},
        ],
        collections={"r_fz": rdf},
    )
    got = {r["lid"]: r["nm"] for r in out.collect()}
    want = {
        row[0]: row[1]
        for row in duck.execute(
            """
            SELECT l.lid, COUNT(r.rid) FROM l_fz l
            LEFT JOIN r_fz r ON l.k = r.k GROUP BY l.lid
            """
        ).fetchall()
    }
    assert got == want


def test_correlated_lookup_cardinality_suffix_fuzz(join_frames, duck):
    """Random trailing $sort/$skip/$limit suffixes on a correlated
    $lookup vs DuckDB LATERAL ORDER BY/OFFSET/LIMIT — pins the
    per-outer-row replay (array_sort + slice) across directions, skip/
    limit combinations, and null join keys (which match nothing and get
    empty arrays regardless of the suffix)."""
    ldf, rdf = join_frames
    rng = random.Random(SEED + 11)
    for trial in range(10):
        direction = rng.choice([1, -1])
        skip = rng.choice([0, 1, 2])
        limit = rng.choice([1, 2, 3])
        suffix = [{"$sort": {"y": direction, "rid": direction}}]
        if skip:
            suffix.append({"$skip": skip})
        suffix.append({"$limit": limit})
        out = apply_pipeline(
            ldf,
            [
                {
                    "$lookup": {
                        "from": "r_fz",
                        "let": {"lk": "$k"},
                        "pipeline": [
                            {"$match": {"$expr": {"$eq": ["$k", "$$lk"]}}},
                            *suffix,
                        ],
                        "as": "m",
                    }
                },
                {
                    "$project": {
                        "lid": 1,
                        "rids": {
                            "$map": {"input": "$m", "as": "e",
                                     "in": "$$e.rid"},
                        },
                    }
                },
            ],
            collections={"r_fz": rdf},
        )
        got = {r["lid"]: list(r["rids"]) for r in out.collect()}
        ordr = "ASC" if direction == 1 else "DESC"
        want = {
            row[0]: list(row[1]) if row[1] is not None else []
            for row in duck.execute(
                f"""
                SELECT l.lid,
                       (SELECT COALESCE(LIST(rid ORDER BY y {ordr}, rid {ordr}), [])
                        FROM (SELECT rid, y FROM r_fz r
                              WHERE r.k = l.k
                              ORDER BY y {ordr}, rid {ordr}
                              OFFSET {skip} LIMIT {limit}))
                FROM l_fz l
                """
            ).fetchall()
        }
        assert got == want, (trial, direction, skip, limit)


# -------------------------------------------------- string expression fuzz


@pytest.fixture(scope="module")
def str_df(spark):
    rng = random.Random(SEED + 5)
    pool = ["", "abc", "Hello World", "x y z", "AA bb CC", "one,two", "  pad  "]
    rows = [
        (rng.choice(pool + [None]), rng.choice(pool)) for _ in range(200)
    ]
    return (
        spark.createDataFrame(rows, "s string, t string"),
        [dict(zip(("s", "t"), r)) for r in rows],
    )


def gen_str_expr(rng, depth=0):
    """String-valued MQL expression trees (engine contract: SQL nulls —
    $concat/$toUpper/$toLower propagate null, unlike mongod's ''-return)."""
    if depth >= 3 or rng.random() < 0.35:
        return rng.choice(["$s", "$t", {"$literal": rng.choice(["", "Q", "-"])}])
    op = rng.choice(["$concat", "$toUpper", "$toLower", "$substrCP", "$ifNull"])
    if op == "$concat":
        return {"$concat": [gen_str_expr(rng, depth + 1) for _ in range(rng.randint(2, 3))]}
    if op in ("$toUpper", "$toLower"):
        return {op: gen_str_expr(rng, depth + 1)}
    if op == "$substrCP":
        return {
            "$substrCP": [gen_str_expr(rng, depth + 1), rng.randint(0, 6), rng.randint(0, 5)]
        }
    return {"$ifNull": [gen_str_expr(rng, depth + 1), gen_str_expr(rng, depth + 1)]}


def ref_str_eval(expr, row):
    if isinstance(expr, str) and expr.startswith("$"):
        return row.get(expr[1:])
    if isinstance(expr, dict) and "$literal" in expr:
        return expr["$literal"]
    ((op, args),) = expr.items()
    if op == "$concat":
        vals = [ref_str_eval(a, row) for a in args]
        return None if any(v is None for v in vals) else "".join(vals)
    if op == "$toUpper":
        v = ref_str_eval(args, row)
        return None if v is None else v.upper()
    if op == "$toLower":
        v = ref_str_eval(args, row)
        return None if v is None else v.lower()
    if op == "$substrCP":
        v = ref_str_eval(args[0], row)
        return None if v is None else v[args[1] : args[1] + args[2]]
    if op == "$ifNull":
        for a in args:
            v = ref_str_eval(a, row)
            if v is not None:
                return v
        return None
    raise AssertionError(op)


def test_string_expr_fuzz(str_df):
    """80 random string trees per-row on Spark vs the reference evaluator;
    each also observed through $strLenCP."""
    df, rows = str_df
    rng = random.Random(SEED + 6)
    exprs = [gen_str_expr(rng) for _ in range(80)]
    for batch_start in range(0, len(exprs), 20):
        batch = exprs[batch_start : batch_start + 20]
        fields = {}
        for i, e in enumerate(batch):
            fields[f"e{i}"] = e
            fields[f"l{i}"] = {"$strLenCP": e}
        out = apply_pipeline(df, [{"$addFields": fields}]).collect()
        for got, row in zip(out, rows):
            for i, e in enumerate(batch):
                want = ref_str_eval(e, row)
                assert got[f"e{i}"] == want, (
                    f"expr {e!r} on {row!r}: {got[f'e{i}']!r} != {want!r}"
                )
                wl = None if want is None else len(want)
                assert got[f"l{i}"] == wl, (e, row, got[f"l{i}"], wl)


# -------------------------------------------------- $setWindowFields fuzz


@pytest.fixture(scope="module")
def win_frames(spark, duck):
    rng = random.Random(SEED + 7)
    rows = [
        (rng.choice(["a", "b", "c", "d"]), i, rng.choice([None, *range(-5, 6)]))
        for i in range(240)
    ]
    df = spark.createDataFrame(rows, "g string, o int, v int")
    import pandas as pd

    duck.register("w_fz", pd.DataFrame(rows, columns=["g", "o", "v"]))
    return df


def _frame_sql(lo, hi):
    def side(b, which):
        if b == "unbounded":
            return f"UNBOUNDED {which}"
        if b == 0:
            return "CURRENT ROW"
        return f"{abs(b)} {'PRECEDING' if b < 0 else 'FOLLOWING'}"

    return f"ROWS BETWEEN {side(lo, 'PRECEDING')} AND {side(hi, 'FOLLOWING')}"


def test_set_window_fields_fuzz(win_frames, duck):
    """Random $setWindowFields outputs (bounded-frame aggregates, rank
    family, $shift) vs DuckDB window SQL on the same frame."""
    df = win_frames
    rng = random.Random(SEED + 8)
    over = "PARTITION BY g ORDER BY o"
    for trial in range(10):
        outputs, sqls = {}, []
        for i in range(rng.randint(2, 3)):
            kind = rng.choice(["agg", "rank", "shift"])
            name = f"a{i}"
            if kind == "agg":
                op = rng.choice(["$sum", "$avg", "$min", "$max"])
                lo = rng.choice(["unbounded", -3, -2, -1, 0])
                hi = rng.choice([0, 1, 2, 3, "unbounded"])
                if lo != "unbounded" and hi != "unbounded" and lo > hi:
                    lo, hi = hi if hi < 0 else 0, hi if hi > 0 else 0
                outputs[name] = {
                    op: "$v",
                    "window": {"documents": [lo, hi]},
                }
                fn = {"$sum": "SUM", "$avg": "AVG", "$min": "MIN", "$max": "MAX"}[op]
                sqls.append(
                    f"{fn}(v) OVER ({over} {_frame_sql(lo, hi)}) AS {name}"
                )
            elif kind == "rank":
                op = rng.choice(["$rank", "$denseRank", "$documentNumber"])
                outputs[name] = {op: {}}
                fn = {
                    "$rank": "RANK()",
                    "$denseRank": "DENSE_RANK()",
                    "$documentNumber": "ROW_NUMBER()",
                }[op]
                sqls.append(f"{fn} OVER ({over}) AS {name}")
            else:
                by = rng.choice([-2, -1, 1, 2])
                outputs[name] = {"$shift": {"output": "$v", "by": by}}
                fn = f"LAG(v, {-by})" if by < 0 else f"LEAD(v, {by})"
                sqls.append(f"{fn} OVER ({over}) AS {name}")

        pipeline = [
            {
                "$setWindowFields": {
                    "partitionBy": "$g",
                    "sortBy": {"o": 1},
                    "output": outputs,
                }
            }
        ]
        got = {
            (r["g"], r["o"]): [r[f"a{i}"] for i in range(len(outputs))]
            for r in apply_pipeline(df, pipeline).collect()
        }
        sql = f"SELECT g, o, {', '.join(sqls)} FROM w_fz"
        want = {
            (row[0], row[1]): list(row[2:])
            for row in duck.execute(sql).fetchall()
        }
        assert set(got) == set(want), f"trial {trial}: row keys differ"
        for key in want:
            for gi, wi in zip(got[key], want[key]):
                assert close(gi, wi), (
                    f"trial {trial} row {key}: {got[key]} != {want[key]} "
                    f"({outputs!r})"
                )


# ---------------------------------------------------- date expression fuzz


@pytest.fixture(scope="module")
def date_frame(spark, duck):
    import datetime as dt

    rng = random.Random(SEED + 9)
    base = dt.datetime(1997, 1, 1)
    stamps = [
        base + dt.timedelta(seconds=rng.randint(0, 1_000_000_000))
        for _ in range(150)
    ]
    # boundary cases the random draw may miss
    stamps += [
        dt.datetime(2000, 2, 29, 23, 59, 59),
        dt.datetime(2020, 12, 31, 0, 0, 0),
        dt.datetime(2021, 1, 1, 0, 0, 1),
        dt.datetime(1999, 1, 31, 12, 0, 0),
        dt.datetime(2024, 3, 31, 23, 0, 0),
    ]
    rows = [(i, s) for i, s in enumerate(stamps)]
    df = spark.createDataFrame(rows, "i int, ts timestamp")
    import pandas as pd

    duck.register(
        "d_fz",
        pd.DataFrame(
            {"i": [r[0] for r in rows],
             "ts": pd.Series([r[1] for r in rows], dtype="datetime64[us]")}
        ),
    )
    return df


def test_date_parts_and_arithmetic_fuzz(date_frame, duck):
    """Date part extraction, $dateTrunc, $dateAdd and $dateDiff over 155
    timestamps (random + boundary) vs DuckDB — both engines in UTC."""
    df = date_frame
    rng = random.Random(SEED + 10)
    n_add = rng.randint(-40, 40)
    fields = {
        "y": {"$year": "$ts"},
        "mo": {"$month": "$ts"},
        "d": {"$dayOfMonth": "$ts"},
        "h": {"$hour": "$ts"},
        "mi": {"$minute": "$ts"},
        "se": {"$second": "$ts"},
        "doy": {"$dayOfYear": "$ts"},
        "dow": {"$dayOfWeek": "$ts"},  # MQL: 1=Sunday..7
        "iw": {"$isoWeek": "$ts"},
        "t_day": {"$dateTrunc": {"date": "$ts", "unit": "day"}},
        "t_month": {"$dateTrunc": {"date": "$ts", "unit": "month"}},
        "t_hour": {"$dateTrunc": {"date": "$ts", "unit": "hour"}},
        "add_d": {"$dateAdd": {"startDate": "$ts", "unit": "day", "amount": n_add}},
        "add_mo": {"$dateAdd": {"startDate": "$ts", "unit": "month", "amount": 1}},
        "dd": {
            "$dateDiff": {
                "startDate": {"$literal": "2000-01-01"},
                "endDate": "$ts",
                "unit": "day",
            }
        },
    }
    # $dateDiff literal start: engine accepts expression dates — feed the
    # iso string through $toDate for portability
    fields["dd"]["$dateDiff"]["startDate"] = {"$toDate": "2000-01-01"}
    got = {
        r["i"]: r.asDict()
        for r in apply_pipeline(df, [{"$addFields": fields}]).collect()
    }
    want = {
        row[0]: row
        for row in duck.execute(
            f"""
            SELECT i,
              EXTRACT(year FROM ts), EXTRACT(month FROM ts),
              EXTRACT(day FROM ts), EXTRACT(hour FROM ts),
              EXTRACT(minute FROM ts), EXTRACT(second FROM ts),
              EXTRACT(doy FROM ts), EXTRACT(dow FROM ts) + 1,
              EXTRACT(week FROM ts),
              date_trunc('day', ts), date_trunc('month', ts),
              date_trunc('hour', ts),
              ts + INTERVAL ({n_add}) DAY, ts + INTERVAL 1 MONTH,
              date_diff('day', TIMESTAMP '2000-01-01', ts)
            FROM d_fz
            """
        ).fetchall()
    }
    names = ["y", "mo", "d", "h", "mi", "se", "doy", "dow", "iw",
             "t_day", "t_month", "t_hour", "add_d", "add_mo", "dd"]
    assert set(got) == set(want)
    for i, g in got.items():
        w = want[i]
        for j, name in enumerate(names, start=1):
            gv, wv = g[name], w[j]
            if hasattr(wv, "to_pydatetime"):
                wv = wv.to_pydatetime()
            import datetime as dt

            if isinstance(wv, dt.date) and not isinstance(wv, dt.datetime):
                wv = dt.datetime.combine(wv, dt.time())  # duckdb date_trunc → DATE
            assert gv == wv or (
                isinstance(gv, (int, float)) and close(gv, wv)
            ), (i, name, gv, wv, g["ts"])

# ------------------------------------------------------- array HOF fuzz


@pytest.fixture(scope="module")
def arr_df(spark):
    rng = random.Random(SEED + 11)

    def arr():
        if rng.random() < 0.1:
            return []
        return [
            rng.choice([None, *range(-4, 5)]) for _ in range(rng.randint(1, 6))
        ]

    rows = [(arr(), [v for v in arr() if v is not None]) for _ in range(150)]
    df = spark.createDataFrame(rows, "a array<int>, b array<int>")
    return df, [dict(zip(("a", "b"), r)) for r in rows]


def gen_arr_expr(rng, depth=0):
    """Array-valued MQL trees over $a (nullable elems) / $b (non-null)."""
    if depth >= 2 or rng.random() < 0.4:
        return rng.choice(["$a", "$b", {"$literal": [1, 2, 3]}])
    op = rng.choice(
        ["$filter", "$map", "$slice", "$sortArray", "$reverseArray", "$concatArrays"]
    )
    inner = gen_arr_expr(rng, depth + 1)
    if op == "$filter":
        return {"$filter": {"input": inner, "as": "e",
                            "cond": {"$gt": ["$$e", rng.randint(-3, 3)]}}}
    if op == "$map":
        return {"$map": {"input": inner, "as": "e",
                         "in": {"$add": ["$$e", rng.randint(-2, 2)]}}}
    if op == "$slice":
        return {"$slice": [inner, rng.randint(1, 4)]}
    if op == "$sortArray":
        return {"$sortArray": {"input": inner, "sortBy": rng.choice([1, -1])}}
    if op == "$reverseArray":
        return {"$reverseArray": inner}
    return {"$concatArrays": [inner, gen_arr_expr(rng, depth + 1)]}


def ref_arr_eval(expr, row):
    """Engine-contract evaluator: $filter drops null-cond elements,
    $sortArray puts nulls first asc / last desc (Spark sort_array),
    $slice [arr, n] takes the first n."""
    if isinstance(expr, str) and expr.startswith("$"):
        return row.get(expr[1:])
    if isinstance(expr, dict) and "$literal" in expr:
        return list(expr["$literal"])
    ((op, args),) = expr.items()
    if op == "$filter":
        arr = ref_arr_eval(args["input"], row)
        if arr is None:
            return None
        thr = args["cond"]["$gt"][1]
        return [v for v in arr if v is not None and v > thr]
    if op == "$map":
        arr = ref_arr_eval(args["input"], row)
        if arr is None:
            return None
        d = args["in"]["$add"][1]
        return [None if v is None else v + d for v in arr]
    if op == "$slice":
        arr = ref_arr_eval(args[0], row)
        return None if arr is None else arr[: args[1]]
    if op == "$sortArray":
        arr = ref_arr_eval(args["input"], row)
        if arr is None:
            return None
        asc = args["sortBy"] == 1
        nn = sorted([v for v in arr if v is not None], reverse=not asc)
        nulls = [None] * (len(arr) - len(nn))
        return nulls + nn if asc else nn + nulls
    if op == "$reverseArray":
        arr = ref_arr_eval(args, row)
        return None if arr is None else arr[::-1]
    if op == "$concatArrays":
        parts = [ref_arr_eval(a, row) for a in args]
        if any(p is None for p in parts):
            return None
        return [v for p in parts for v in p]
    raise AssertionError(op)


def test_array_hof_fuzz(arr_df):
    """80 random array HOF trees per-row vs the reference evaluator, each
    also observed through $size and $first."""
    df, rows = arr_df
    rng = random.Random(SEED + 12)
    exprs = [gen_arr_expr(rng) for _ in range(80)]
    for batch_start in range(0, len(exprs), 20):
        batch = exprs[batch_start : batch_start + 20]
        fields = {}
        for i, e in enumerate(batch):
            fields[f"e{i}"] = e
            fields[f"n{i}"] = {"$size": e}
        out = apply_pipeline(df, [{"$addFields": fields}]).collect()
        for got, row in zip(out, rows):
            for i, e in enumerate(batch):
                want = ref_arr_eval(e, row)
                assert got[f"e{i}"] == want, (
                    f"expr {e!r} on {row!r}: {got[f'e{i}']!r} != {want!r}"
                )
                wn = None if want is None else len(want)
                assert got[f"n{i}"] == wn, (e, row, got[f"n{i}"], wn)


# -------------------------------------------- logical truthiness fuzz


def gen_logic_expr(rng, depth=0):
    """Logical trees whose operands mix booleans, raw numerics, and nulls
    — exercising the MQL truthiness coercion in $and/$or/$not/$cond."""
    if depth >= 3 or rng.random() < 0.3:
        return rng.choice(["$x", "$z", 0, 1, rng.randint(-3, 3),
                           {"$literal": True}, {"$literal": False}])
    # $cond is excluded: mongod's dynamic typing allows mixed-type
    # then/else branches; Spark's CASE WHEN is statically typed (the
    # engine's documented delta). Conditions ARE covered via gen_expr.
    op = rng.choice(["$and", "$or", "$not", "$gt"])
    if op == "$not":
        return {"$not": [gen_logic_expr(rng, depth + 1)]}
    if op == "$gt":
        return {"$gt": [rng.choice(["$x", "$z", rng.randint(-3, 3)]),
                        rng.randint(-2, 2)]}
    n = rng.randint(2, 3)
    return {op: [gen_logic_expr(rng, depth + 1) for _ in range(n)]}


def ref_truthy(v):
    if v is None or v is False or v == 0:
        return False
    return True


def ref_logic_eval(expr, row):
    """Truthiness-aware evaluator. Comparison results may be None (SQL
    nulls); logical ops coerce every operand through ref_truthy."""
    if isinstance(expr, str) and expr.startswith("$"):
        return row.get(expr[1:])
    if isinstance(expr, dict) and "$literal" in expr:
        return expr["$literal"]
    if isinstance(expr, (int, float)):
        return expr
    ((op, args),) = expr.items()
    if op == "$and":
        return all(ref_truthy(ref_logic_eval(a, row)) for a in args)
    if op == "$or":
        return any(ref_truthy(ref_logic_eval(a, row)) for a in args)
    if op == "$not":
        return not ref_truthy(ref_logic_eval(args[0], row))
    if op == "$gt":
        a = ref_logic_eval(args[0], row)
        b = args[1]
        return None if a is None else a > b
    if op == "$cond":
        c = ref_logic_eval(args[0], row)
        return (ref_logic_eval(args[1], row) if ref_truthy(c)
                else ref_logic_eval(args[2], row))
    raise AssertionError(op)


def test_logic_truthiness_fuzz(fuzz_df):
    """80 random logical trees with numeric/null operands per-row vs the
    truthiness evaluator — batched 20 per round trip."""
    df, rows = fuzz_df
    rng = random.Random(SEED + 13)
    exprs = []
    while len(exprs) < 80:
        e = gen_logic_expr(rng)
        if isinstance(e, dict) and any(k in e for k in ("$and", "$or", "$not")):
            exprs.append(e)  # only logical roots (boolean output, null-free)
    for batch_start in range(0, len(exprs), 20):
        batch = exprs[batch_start : batch_start + 20]
        fields = {f"v{i}": e for i, e in enumerate(batch)}
        out = apply_pipeline(df, [{"$addFields": fields}]).collect()
        for got, row in zip(out, rows):
            for i, e in enumerate(batch):
                want = ref_logic_eval(e, row)
                assert got[f"v{i}"] == want, (
                    f"{e!r} on {row!r}: {got[f'v{i}']!r} != {want!r}"
                )
