"""Pipeline-stage tests for stages not already covered by the oracle
battery: $graphLookup (vs DuckDB recursive CTE), $densify, $facet,
$top/$bottomN, $out/$merge, $expMovingAvg, $fill."""

import re

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.errors import MQLTranslationError
from mongo_arrow_spark.mql import apply_pipeline


@pytest.fixture(scope="module")
def graph_df(spark):
    # employee -> manager edges (a small org tree with a cycle guard)
    rows = [
        ("dev1", "lead1"),
        ("dev2", "lead1"),
        ("lead1", "dir"),
        ("lead2", "dir"),
        ("dir", "ceo"),
        ("ceo", None),
    ]
    return spark.createDataFrame(rows, "name string, reports_to string")


def test_graph_lookup_reporting_chain(spark, graph_df, duck):
    out = apply_pipeline(
        graph_df,
        [
            {
                "$graphLookup": {
                    "from": "employees",
                    "startWith": "$reports_to",
                    "connectFromField": "reports_to",
                    "connectToField": "name",
                    "as": "chain",
                    "depthField": "depth",
                }
            }
        ],
        collections={"employees": graph_df},
    )
    got = {
        r["name"]: sorted((c["name"], c["depth"]) for c in r["chain"])
        for r in out.collect()
    }
    assert got["dev1"] == [("ceo", 2), ("dir", 1), ("lead1", 0)]
    assert got["ceo"] == []
    # oracle: recursive CTE over the same edges
    duck.execute("CREATE OR REPLACE TABLE emp(name VARCHAR, reports_to VARCHAR)")
    for r in graph_df.collect():
        duck.execute("INSERT INTO emp VALUES (?, ?)", [r["name"], r["reports_to"]])
    rows = duck.execute(
        """
        WITH RECURSIVE chain(origin, cur, depth) AS (
          SELECT name, reports_to, 0 FROM emp WHERE reports_to IS NOT NULL
          UNION ALL
          SELECT c.origin, e.reports_to, c.depth + 1
          FROM chain c JOIN emp e ON c.cur = e.name
          WHERE e.reports_to IS NOT NULL
        )
        SELECT origin, cur, depth FROM chain ORDER BY origin, depth
        """
    ).fetchall()
    want: dict = {}
    for origin, cur, depth in rows:
        want.setdefault(origin, []).append((cur, depth))
    for name, chain in want.items():
        assert sorted(chain) == got[name], name


def test_graph_lookup_cycle_terminates(spark):
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], "name string, nxt string"
    )
    out = apply_pipeline(
        cyc,
        [
            {
                "$graphLookup": {
                    "from": "g",
                    "startWith": "$nxt",
                    "connectFromField": "nxt",
                    "connectToField": "name",
                    "as": "reach",
                }
            }
        ],
        collections={"g": cyc},
    )
    got = {r["name"]: sorted(c["name"] for c in r["reach"]) for r in out.collect()}
    assert got["a"] == ["a", "b", "c"]  # full cycle reached, loop terminated


def test_graph_lookup_id_content_key_no_positional_id(spark, monkeypatch):
    """Frames carrying _id correlate traversal results on the _id content
    key — no monotonically_increasing_id, no eager input checkpoint
    (round-5 used a positional id pinned by a full-input
    localCheckpoint; the content key is deterministic across branch
    evaluations and shuffles for free)."""
    import mongo_arrow_spark.mql.pipeline as plmod

    df = spark.createDataFrame(
        [(1, "dev1", "lead1"), (2, "lead1", "dir"), (3, "dir", None)],
        "_id long, name string, reports_to string",
    )

    def _boom():
        raise AssertionError(
            "positional id used despite _id content key being available"
        )

    monkeypatch.setattr(
        plmod.F, "monotonically_increasing_id", _boom, raising=True
    )
    out = apply_pipeline(
        df,
        [
            {
                "$graphLookup": {
                    "from": "e",
                    "startWith": "$reports_to",
                    "connectFromField": "reports_to",
                    "connectToField": "name",
                    "as": "chain",
                    "depthField": "depth",
                }
            }
        ],
        collections={"e": df},
    )
    got = {
        r["name"]: sorted((c["name"], c["depth"]) for c in r["chain"])
        for r in out.collect()
    }
    assert got["dev1"] == [("dir", 1), ("lead1", 0)]
    assert got["lead1"] == [("dir", 0)]
    assert got["dir"] == []


def test_graph_lookup_duplicate_id_rows_share_results(spark):
    """Rows agreeing on BOTH _id and startWith share one traversal key —
    their reachability is identical by definition, so each row still
    receives exactly its own result set."""
    edges = spark.createDataFrame(
        [(1, "x", "y"), (1, "x", "y"), (2, "y", None)],
        "_id long, name string, nxt string",
    )
    out = apply_pipeline(
        edges,
        [
            {
                "$graphLookup": {
                    "from": "e",
                    "startWith": "$nxt",
                    "connectFromField": "nxt",
                    "connectToField": "name",
                    "as": "reach",
                }
            }
        ],
        collections={"e": edges},
    )
    rows = out.filter(F.col("_id") == 1).collect()
    assert len(rows) == 2
    for r in rows:
        assert sorted(c["name"] for c in r["reach"]) == ["y"]


def test_graph_lookup_duplicate_id_distinct_starts_own_reachability(spark):
    """r7 (advisor): a mid-pipeline frame can legally carry duplicate
    _id — e.g. $unwind before $graphLookup. The traversal key is
    struct(_id, startWith), so each unwound row gets ITS OWN startWith
    reachability, not the union of everything sharing the _id."""
    people = spark.createDataFrame(
        [(1, ["a", "b"])], "_id long, friends array<string>"
    )
    nodes = spark.createDataFrame(
        [(10, "a", "a2"), (11, "a2", None), (12, "b", "b2"), (13, "b2", None)],
        "_id long, name string, nxt string",
    )
    out = apply_pipeline(
        people,
        [
            {"$unwind": "$friends"},
            {
                "$graphLookup": {
                    "from": "n",
                    "startWith": "$friends",
                    "connectFromField": "nxt",
                    "connectToField": "name",
                    "as": "reach",
                }
            },
        ],
        collections={"n": nodes},
    )
    got = {
        r["friends"]: sorted(c["name"] for c in r["reach"])
        for r in out.collect()
    }
    assert got == {"a": ["a", "a2"], "b": ["b", "b2"]}


def test_graph_lookup_null_id_still_joins_results_back(spark):
    """r7 (advisor): a NULL _id must not orphan the row — the struct key
    compares null fields as equal, so its traversal array comes back."""
    frame = spark.createDataFrame(
        [(None, "a"), (7, "b")], "_id long, start string"
    )
    nodes = spark.createDataFrame(
        [(1, "a", "a2"), (2, "a2", None), (3, "b", None)],
        "_id long, name string, nxt string",
    )
    out = apply_pipeline(
        frame,
        [
            {
                "$graphLookup": {
                    "from": "n",
                    "startWith": "$start",
                    "connectFromField": "nxt",
                    "connectToField": "name",
                    "as": "reach",
                }
            }
        ],
        collections={"n": nodes},
    )
    got = {
        r["start"]: sorted(c["name"] for c in r["reach"])
        for r in out.collect()
    }
    assert got == {"a": ["a", "a2"], "b": ["b"]}


def test_densify_partition(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 4, 40.0), ("b", 2, 20.0), ("b", 3, 30.0)],
        "k string, x int, v double",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$densify": {
                    "field": "x",
                    "partitionByFields": ["k"],
                    "range": {"step": 1, "bounds": "partition"},
                }
            }
        ],
    )
    rows = {(r["k"], r["x"]): r["v"] for r in out.collect()}
    assert rows[("a", 2)] is None and rows[("a", 3)] is None
    assert rows[("a", 1)] == 10.0 and len(rows) == 6


def test_densify_full_bounds(spark):
    df = spark.createDataFrame([(1,), (5,)], "x int")
    out = apply_pipeline(
        df, [{"$densify": {"field": "x", "range": {"step": 2, "bounds": "full"}}}]
    )
    assert sorted(r["x"] for r in out.collect()) == [1, 3, 5]


def test_top_bottom_accumulators(spark, tables):
    out = apply_pipeline(
        tables["orders"],
        [
            {
                "$group": {
                    "_id": "$o_orderstatus",
                    "best": {
                        "$top": {
                            "sortBy": {"o_totalprice": -1},
                            "output": "$o_orderkey",
                        }
                    },
                    "top3": {
                        "$topN": {
                            "n": 3,
                            "sortBy": {"o_totalprice": -1},
                            "output": "$o_orderkey",
                        }
                    },
                }
            }
        ],
    )
    rows = {r["_id"]: r for r in out.collect()}
    orders = tables["orders"].collect()
    for status, row in rows.items():
        want = [
            o["o_orderkey"]
            for o in sorted(
                (o for o in orders if o["o_orderstatus"] == status),
                key=lambda o: (-o["o_totalprice"], o["o_orderkey"]),
            )
        ][:3]
        assert row["best"] == want[0]
        assert list(row["top3"]) == want


def test_out_and_merge(spark, tables):
    orders = tables["orders"]
    apply_pipeline(
        orders,
        [{"$match": {"o_orderstatus": "F"}}, {"$out": "f_orders"}],
    )
    n_f = spark.table("f_orders").count()
    assert n_f == orders.filter(F.col("o_orderstatus") == "F").count()

    # merge: updated rows replace on key, new rows insert
    updates = orders.limit(5).withColumn("o_orderpriority", F.lit("X-UPDATED"))
    merged = apply_pipeline(
        updates,
        [{"$merge": {"into": "f_orders", "on": "o_orderkey"}}],
        collections={"f_orders": spark.table("f_orders")},
    )
    got = merged.filter(F.col("o_orderpriority") == "X-UPDATED").count()
    assert got == 5


def test_exp_moving_avg(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0)], "k string, t int, v double"
    )
    out = apply_pipeline(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$k",
                    "sortBy": {"t": 1},
                    "output": {"ema": {"$expMovingAvg": {"input": "$v", "N": 2}}},
                }
            }
        ],
    )
    rows = sorted(out.collect(), key=lambda r: r["t"])
    # alpha = 2/(N+1) = 2/3; ema: 10, 10/3+40/3=16.67, ...
    assert abs(rows[0]["ema"] - 10.0) < 1e-9
    assert abs(rows[1]["ema"] - (10 + (20 - 10) * 2 / 3)) < 1e-9


def test_fill_locf(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 3.0), ("a", 4, None)],
        "k string, t int, v double",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$fill": {
                    "partitionBy": "$k",
                    "sortBy": {"t": 1},
                    "output": {"v": {"method": "locf"}},
                }
            }
        ],
    )
    vals = [r["v"] for r in sorted(out.collect(), key=lambda r: r["t"])]
    assert vals == [1.0, 1.0, 3.0, 3.0]


def test_create_view(spark, tables):
    from mongo_arrow_spark.api import create_view

    create_view(
        "open_orders", tables["orders"], [{"$match": {"o_orderstatus": "O"}}]
    )
    n = spark.sql("SELECT count(*) c FROM open_orders").first()["c"]
    assert n == tables["orders"].filter("o_orderstatus = 'O'").count()
    # views compose: a pipeline can $lookup the view via the catalog
    from mongo_arrow_spark.api import aggregate

    out = aggregate(
        tables["customer"],
        [
            {"$match": {"c_custkey": {"$lt": 5}}},
            {
                "$lookup": {
                    "from": "open_orders",
                    "localField": "c_custkey",
                    "foreignField": "o_custkey",
                    "as": "orders",
                }
            },
        ],
    )
    assert out.count() == 5


def test_trig_and_misc_ops(spark):
    import math

    from mongo_arrow_spark.mql import translate_expr

    df = spark.createDataFrame([(0.5, b"abc")], "x double, b binary")
    r = df.select(
        translate_expr({"$sin": "$x"}).alias("s"),
        translate_expr({"$degreesToRadians": 180}).alias("r"),
        translate_expr({"$binarySize": "$b"}).alias("n"),
        translate_expr({"$strcasecmp": ["ABC", "abd"]}).alias("c"),
    ).first()
    assert abs(r["s"] - math.sin(0.5)) < 1e-12
    assert abs(r["r"] - math.pi) < 1e-12
    assert r["n"] == 3 and r["c"] == -1


def test_unsupported_stage_raises(spark, tables):
    with pytest.raises(MQLTranslationError):
        apply_pipeline(tables["orders"], [{"$weirdStage": 1}])


def test_merge_objects_accumulator(spark):
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [
            ("g1", {"a": 1, "b": 2}),
            ("g1", {"b": 9, "c": 3}),
            ("g2", {"x": 7}),
            ("g2", None),  # null doc ignored (MQL)
        ],
        "g string, doc map<string,int>",
    )
    out = aggregate(
        df,
        [{"$group": {"_id": "$g", "merged": {"$mergeObjects": "$doc"}}}],
    )
    rows = {r["_id"]: r["merged"] for r in out.collect()}
    assert rows["g1"] == {"a": 1, "b": 9, "c": 3}  # later doc wins on b
    assert rows["g2"] == {"x": 7}


def test_topn_multikey_sortby(spark):
    df = spark.createDataFrame(
        [
            ("g", "x", 1.0, 1),
            ("g", "x", 3.0, 2),
            ("g", "y", 2.0, 3),
            ("g", "y", 9.0, 4),
        ],
        "g string, cat string, amt double, id long",
    )
    # uniform multi-key: both ascending — lexicographic (cat, amt)
    out = apply_pipeline(
        df,
        [
            {
                "$group": {
                    "_id": "$g",
                    "top2": {
                        "$topN": {
                            "n": 2,
                            "sortBy": {"cat": 1, "amt": 1},
                            "output": "$id",
                        }
                    },
                }
            }
        ],
    )
    assert out.first()["top2"] == [1, 2]
    # mixed directions: cat asc, amt desc (numeric → negated)
    out = apply_pipeline(
        df,
        [
            {
                "$group": {
                    "_id": "$g",
                    "best": {
                        "$top": {
                            "sortBy": {"cat": 1, "amt": -1},
                            "output": "$id",
                        }
                    },
                }
            }
        ],
    )
    assert out.first()["best"] == 2  # cat=x first, then amt desc → 3.0


def test_percentile_approximate_method(spark, tables):
    from mongo_arrow_spark.api import aggregate

    li = tables["lineitem"]
    out = aggregate(
        li,
        [
            {
                "$group": {
                    "_id": "$l_returnflag",
                    "p50_exact": {
                        "$percentile": {"input": "$l_quantity", "p": [0.5]}
                    },
                    "p50_approx": {
                        "$percentile": {
                            "input": "$l_quantity",
                            "p": [0.5],
                            "method": "approximate",
                        }
                    },
                    "med_approx": {
                        "$median": {"input": "$l_quantity", "method": "approximate"}
                    },
                }
            }
        ],
    )
    for r in out.collect():
        exact = r["p50_exact"][0]
        assert abs(r["p50_approx"][0] - exact) <= max(1.0, 0.05 * exact)
        assert abs(r["med_approx"] - exact) <= max(1.0, 0.05 * exact)


def test_ltrim_rtrim_chars(spark):
    from mongo_arrow_spark.mql import translate_expr

    df = spark.createDataFrame([("xxhixx",), ("x-hi-x",)], "s string")
    lt = [
        r[0]
        for r in df.select(
            translate_expr({"$ltrim": {"input": "$s", "chars": "x-"}})
        ).collect()
    ]
    assert lt == ["hixx", "hi-x"]
    rt = [
        r[0]
        for r in df.select(
            translate_expr({"$rtrim": {"input": "$s", "chars": "x-"}})
        ).collect()
    ]
    assert rt == ["xxhi", "x-hi"]


def test_redact_levels(spark):
    """$redact: prune whole docs at the root, null pruned subdocuments,
    remove pruned array elements — decision re-evaluated per level with
    field paths rebound."""
    df = spark.createDataFrame(
        [
            (1, 1, {"level": 5, "v": "secret"}, [{"level": 1, "t": "a"}, {"level": 9, "t": "b"}]),
            (2, 9, {"level": 1, "v": "open"}, [{"level": 1, "t": "c"}]),
        ],
        "id long, level long, sub struct<level:long,v:string>, "
        "items array<struct<level:long,t:string>>",
    )
    expr = {
        "$cond": [{"$gte": ["$level", 3]}, "$$PRUNE", "$$DESCEND"]
    }
    out = apply_pipeline(df, [{"$redact": expr}])
    rows = out.collect()
    assert [r["id"] for r in rows] == [1]  # root level 9 pruned
    r = rows[0]
    assert r["sub"] is None  # sub.level 5 → pruned → null
    assert [e["t"] for e in r["items"]] == ["a"]  # level-9 element removed


def test_redact_keep_short_circuits(spark):
    df = spark.createDataFrame(
        [(1, {"level": 9, "v": "kept-whole"})],
        "id long, sub struct<level:long,v:string>",
    )
    out = apply_pipeline(df, [{"$redact": "$$KEEP"}])
    assert out.first()["sub"]["v"] == "kept-whole"


def test_vector_search_euclidean_and_errors(spark, tables):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError
    import pytest as _pytest

    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    out = aggregate(
        emb,
        [
            {
                "$vectorSearch": {
                    "path": "embedding",
                    "queryVector": qv,
                    "limit": 3,
                    "similarity": "euclidean",
                }
            }
        ],
    )
    rows = out.collect()
    assert rows[0]["vec_id"] == 0  # self-match: distance 0 → score 1
    assert rows[0]["__vector_score"] == 1.0
    with _pytest.raises(MQLTranslationError):
        aggregate(
            emb,
            [
                {
                    "$vectorSearch": {
                        "path": "embedding",
                        "queryVector": qv,
                        "limit": 3,
                        "similarity": "manhattan",
                    }
                }
            ],
        )
    with _pytest.raises(MQLTranslationError):
        aggregate(tables["documents"], [{"$search": {"phrase": {"query": "x"}}}])


def test_vector_search_prefilter(spark, tables):
    from mongo_arrow_spark.api import aggregate

    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    out = aggregate(
        emb,
        [
            {
                "$vectorSearch": {
                    "path": "embedding",
                    "queryVector": qv,
                    "limit": 5,
                    "filter": {"label": {"$gte": 1}},
                }
            }
        ],
    )
    assert out.filter("label < 1").count() == 0


def test_vector_search_ann_recall(spark):
    """numCandidates without exact:true routes through LSH pruning; on
    clustered vectors (the shape real embedding corpora have — uniform
    noise has no neighborhood structure for ANY angular index) recall@10
    vs the ENN oracle must be ≥ 0.9 at Atlas's recommended numCandidates
    = 20 × limit, pruning ≥ 70% of the corpus."""
    import numpy as np

    from mongo_arrow_spark.api import aggregate

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(25, 32))
    rows = []
    for i in range(1000):
        c = centers[i % 25]
        rows.append((i, (c + 0.15 * rng.normal(size=32)).tolist()))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()
    recalls = []
    for qid in range(5):
        qv = rows[qid][1]
        stage = {"path": "embedding", "queryVector": qv, "limit": 10}
        exact_ids = {
            r["vec_id"] for r in aggregate(emb, [{"$vectorSearch": stage}]).collect()
        }
        ann = aggregate(
            emb, [{"$vectorSearch": {**stage, "numCandidates": 200}}]
        )
        ann_ids = {r["vec_id"] for r in ann.collect()}
        recalls.append(len(ann_ids & exact_ids) / 10)
    emb.unpersist()
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_vector_search_exact_true_disables_pruning(spark, tables):
    """exact:true keeps ENN semantics even when numCandidates is given —
    results identical to the plain exact stage."""
    from mongo_arrow_spark.api import aggregate

    emb = tables["embeddings"]
    qv = [float(x) for x in emb.filter("vec_id = 1").first()["embedding"]]
    stage = {"path": "embedding", "queryVector": qv, "limit": 5}
    plain = [
        (r["vec_id"], r["__vector_score"])
        for r in aggregate(emb, [{"$vectorSearch": stage}]).collect()
    ]
    exact = [
        (r["vec_id"], r["__vector_score"])
        for r in aggregate(
            emb,
            [{"$vectorSearch": {**stage, "numCandidates": 3, "exact": True}}],
        ).collect()
    ]
    assert plain == exact


def test_match_type_predicate(spark, tables):
    from mongo_arrow_spark.api import find
    from mongo_arrow_spark.errors import MQLTranslationError
    import pytest as _pytest

    orders = tables["orders"]
    n = orders.count()
    assert find(orders, {"o_orderkey": {"$type": "long"}}).count() == n
    assert find(orders, {"o_orderkey": {"$type": "string"}}).count() == 0
    assert find(orders, {"o_orderkey": {"$type": "number"}}).count() == n
    assert find(orders, {"o_orderstatus": {"$type": ["string", "null"]}}).count() == n
    with _pytest.raises(MQLTranslationError):
        find(orders, {"o_orderkey": {"$type": "javascript"}}).count()


def test_match_bits_predicates(spark):
    from mongo_arrow_spark.mql.match import translate_match

    df = spark.createDataFrame([(0b1010,), (0b0110,), (0b0001,)], ["v"])

    def got(q):
        return sorted(r["v"] for r in df.filter(translate_match(q)).collect())

    assert got({"v": {"$bitsAllSet": [1, 3]}}) == [0b1010]
    assert got({"v": {"$bitsAnySet": [0, 1]}}) == [0b0001, 0b0110, 0b1010]
    assert got({"v": {"$bitsAllClear": [0, 2]}}) == [0b1010]
    assert got({"v": {"$bitsAnyClear": 0b1010}}) == [0b0001, 0b0110]


def test_match_text_and_sample_rate(spark, tables):
    from mongo_arrow_spark.api import find
    from pyspark.sql import functions as F

    docs = tables["documents"]
    hits = find(docs, {"$text": {"$search": "spark window"}})
    # every hit contains at least one term; OR semantics
    manual = docs.filter(
        F.array_contains(F.split(F.lower("text"), " ", -1), "spark")
        | F.array_contains(F.split(F.lower("text"), " ", -1), "window")
    )
    assert hits.count() == manual.count() > 0
    sampled = find(docs, {"$sampleRate": 0.5}).count()
    assert 0 < sampled < docs.count()


def test_window_locf_and_linear_fill(spark):
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [("a", 0, 10.0), ("a", 1, None), ("a", 2, None), ("a", 3, 40.0),
         ("a", 4, None)],
        ["k", "t", "v"],
    )
    out = aggregate(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$k",
                    "sortBy": {"t": 1},
                    "output": {
                        "locf": {"$locf": "$v"},
                        "lin": {"$linearFill": "$v"},
                    },
                }
            },
            {"$sort": {"t": 1}},
        ],
    )
    rows = out.collect()
    assert [r["locf"] for r in rows] == [10.0, 10.0, 10.0, 40.0, 40.0]
    # linear between (0,10) and (3,40): t=1 → 20, t=2 → 30; tail stays null
    assert [r["lin"] for r in rows] == [10.0, 20.0, 30.0, 40.0, None]


def test_window_derivative_and_integral(spark):
    import datetime as dt

    from mongo_arrow_spark.api import aggregate

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("a", base, 0.0), ("a", base + dt.timedelta(hours=1), 10.0),
         ("a", base + dt.timedelta(hours=2), 30.0)],
        ["k", "ts", "v"],
    )
    out = aggregate(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$k",
                    "sortBy": {"ts": 1},
                    "output": {
                        "dvdt": {
                            "$derivative": {"input": "$v", "unit": "hour"},
                            "window": {"documents": [-1, "current"]},
                        },
                        "area": {
                            "$integral": {"input": "$v", "unit": "hour"},
                            "window": {"documents": ["unbounded", "current"]},
                        },
                    },
                }
            },
            {"$sort": {"ts": 1}},
        ],
    )
    rows = out.collect()
    # derivative over [-1, current]: None-ish first row (dx=0), then 10/h, 20/h
    assert rows[0]["dvdt"] is None
    assert rows[1]["dvdt"] == pytest.approx(10.0)
    assert rows[2]["dvdt"] == pytest.approx(20.0)
    # trapezoids: 0; (0+10)/2; +(10+30)/2 → 0, 5, 25
    assert [r["area"] for r in rows] == pytest.approx([0.0, 5.0, 25.0])


def test_group_first_last_n(spark):
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [("g", i) for i in range(5)], ["k", "v"]
    ).coalesce(1)  # single partition → deterministic collect_list order
    out = aggregate(
        df,
        [
            {"$sort": {"v": 1}},
            {
                "$group": {
                    "_id": "$k",
                    "f2": {"$firstN": {"input": "$v", "n": 2}},
                    "l2": {"$lastN": {"input": "$v", "n": 2}},
                }
            },
        ],
    ).head()
    assert out["f2"] == [0, 1]
    assert out["l2"] == [3, 4]


def test_search_compound(spark, tables):
    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]
    out = aggregate(
        docs,
        [
            {
                "$search": {
                    "compound": {
                        "must": [{"text": {"query": "spark", "path": "text"}}],
                        "mustNot": [{"text": {"query": "slow", "path": "text"}}],
                        "should": [{"text": {"query": "window", "path": "text"}}],
                    }
                }
            }
        ],
    )
    rows = out.collect()
    assert len(rows) > 0
    from pyspark.sql import functions as F

    toks = F.split(F.col("text"), r" ", -1)
    # every hit has spark, none has slow
    assert out.filter(~F.array_contains(toks, "spark")).count() == 0
    assert out.filter(F.array_contains(toks, "slow")).count() == 0
    # should-only: at least one clause must match
    only_should = aggregate(
        docs,
        [
            {
                "$search": {
                    "compound": {
                        "should": [
                            {"text": {"query": "spark", "path": "text"}},
                            {"text": {"query": "window", "path": "text"}},
                        ]
                    }
                }
            }
        ],
    )
    manual = docs.filter(
        F.array_contains(toks, "spark") | F.array_contains(toks, "window")
    )
    assert only_should.count() == manual.count()


def test_search_phrase(spark, tables):
    """phrase matches consecutive tokens only, scored by
    occurrence-count × ln(N/phrase-df)."""
    import math

    from pyspark.sql import functions as F

    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]
    out = aggregate(
        docs,
        [
            {"$search": {"phrase": {"query": "table scan", "path": "text"}}},
            {"$project": {"doc_id": 1, "text": 1,
                          "score": {"$meta": "searchScore"}}},
        ],
    )
    rows = out.collect()
    # tokens are single-space-split, so consecutive-token match ==
    # word-boundary regex on the raw text
    manual = docs.filter(F.col("text").rlike("(^| )table scan( |$)"))
    assert len(rows) == manual.count() > 0
    n = docs.count()
    df_phrase = len(rows)
    for r in rows:
        occ = len(re.findall(r"(?=(^| )table scan( |$))", r["text"]))
        assert r["score"] == pytest.approx(occ * math.log(n / df_phrase))
    # bag-of-words decoy: has both terms but never adjacent → excluded
    decoy = spark.createDataFrame(
        [(1, "table big scan"), (2, "a table scan b")], ["doc_id", "text"]
    )
    got = aggregate(
        decoy, [{"$search": {"phrase": {"query": "table scan", "path": "text"}}}]
    ).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_search_structured_operators(spark, tables):
    """range/equals/exists/wildcard match like filters and carry a
    constant 1.0 score each."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]

    out = aggregate(
        docs,
        [{"$search": {"range": {"path": "n_chars", "gte": 100, "lt": 200}}}],
    )
    manual = docs.filter((F.col("n_chars") >= 100) & (F.col("n_chars") < 200))
    assert out.count() == manual.count() > 0

    out = aggregate(
        docs, [{"$search": {"equals": {"path": "lang", "value": "en"}}}]
    )
    assert out.count() == docs.filter(F.col("lang") == "en").count()

    out = aggregate(docs, [{"$search": {"exists": {"path": "lang"}}}])
    assert out.count() == docs.filter(F.col("lang").isNotNull()).count()

    out = aggregate(
        docs, [{"$search": {"wildcard": {"query": "e?", "path": "lang"}}}]
    )
    assert out.count() == docs.filter(F.col("lang").rlike("^e.$")).count() > 0

    # constant scoring: a must range clause scores 1.0
    scored = aggregate(
        docs,
        [
            {"$search": {"range": {"path": "n_chars", "gte": 0}}},
            {"$project": {"score": {"$meta": "searchScore"}}},
            {"$limit": 5},
        ],
    ).collect()
    assert all(r["score"] == 1.0 for r in scored)


def test_search_compound_mixed_kinds(spark, tables):
    """compound may mix text scoring with structured filter clauses;
    filter clauses restrict but do not contribute score."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]
    mixed = aggregate(
        docs,
        [
            {
                "$search": {
                    "compound": {
                        "must": [{"text": {"query": "spark", "path": "text"}}],
                        "filter": [
                            {"range": {"path": "n_chars", "gte": 100}},
                            {"exists": {"path": "lang"}},
                        ],
                        "mustNot": [
                            {"phrase": {"query": "slow join", "path": "text"}}
                        ],
                    }
                }
            },
            {"$project": {"doc_id": 1, "n_chars": 1, "text": 1,
                          "score": {"$meta": "searchScore"}}},
        ],
    )
    rows = mixed.collect()
    assert len(rows) > 0
    toks = F.split(F.col("text"), r" ", -1)
    baseline = docs.filter(
        F.array_contains(toks, "spark")
        & (F.col("n_chars") >= 100)
        & F.col("lang").isNotNull()
        & ~F.col("text").rlike("(^| )slow join( |$)")
    )
    assert len(rows) == baseline.count()
    for r in rows:
        assert r["n_chars"] >= 100
        assert "slow join" not in f' {r["text"]} '
    # text-only sibling scores identically: filter adds no score
    text_only = {
        r["doc_id"]: r["score"]
        for r in aggregate(
            docs,
            [
                {"$search": {"text": {"query": "spark", "path": "text"}}},
                {"$project": {"doc_id": 1,
                              "score": {"$meta": "searchScore"}}},
            ],
        ).collect()
    }
    for r in rows:
        assert r["score"] == pytest.approx(text_only[r["doc_id"]])


def test_search_meta_count(spark, tables):
    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]
    out = aggregate(
        docs, [{"$searchMeta": {"text": {"query": "spark", "path": "text"}}}]
    ).collect()
    assert len(out) == 1
    toks = F.split(F.col("text"), r" ", -1)
    want = docs.filter(F.array_contains(toks, "spark")).count()
    assert out[0]["count"]["lowerBound"] == want > 0

    # compound form counts the conjunction
    out = aggregate(
        docs,
        [
            {
                "$searchMeta": {
                    "compound": {
                        "must": [{"text": {"query": "spark", "path": "text"}}],
                        "filter": [{"range": {"path": "n_chars", "gte": 100}}],
                    }
                }
            }
        ],
    ).collect()
    want = docs.filter(
        F.array_contains(toks, "spark") & (F.col("n_chars") >= 100)
    ).count()
    assert out[0]["count"]["lowerBound"] == want


def test_search_meta_facets(spark, tables):
    from mongo_arrow_spark.api import aggregate

    docs = tables["documents"]
    out = aggregate(
        docs,
        [
            {
                "$searchMeta": {
                    "facet": {
                        "operator": {"range": {"path": "n_chars", "gte": 50}},
                        "facets": {
                            "langs": {
                                "type": "string",
                                "path": "lang",
                                "numBuckets": 3,
                            },
                            "sizes": {
                                "type": "number",
                                "path": "n_chars",
                                "boundaries": [50, 200, 400],
                                "default": "other",
                            },
                        },
                    }
                }
            }
        ],
    ).collect()
    assert len(out) == 1
    row = out[0]
    matched = docs.filter(F.col("n_chars") >= 50)
    assert row["count"]["lowerBound"] == matched.count()

    # string facet: top-3 langs by count desc, _id asc tie-break
    want = sorted(
        [
            (r["lang"], r["cnt"])
            for r in matched.filter(F.col("lang").isNotNull())
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        ],
        key=lambda kv: (-kv[1], kv[0]),
    )[:3]
    got = [(b["_id"], b["count"]) for b in row["facet"]["langs"]["buckets"]]
    assert got == want

    # number facet: boundary order, default bucket last; when/otherwise
    # type-coercion makes _id a string when a default label exists
    got = [(b["_id"], b["count"]) for b in row["facet"]["sizes"]["buckets"]]
    b1 = matched.filter((F.col("n_chars") >= 50) & (F.col("n_chars") < 200))
    b2 = matched.filter((F.col("n_chars") >= 200) & (F.col("n_chars") < 400))
    rest = matched.filter(F.col("n_chars") >= 400)
    assert got == [
        ("50", b1.count()),
        ("200", b2.count()),
        ("other", rest.count()),
    ]


def test_search_meta_date_facet_and_errors(spark, tables):
    import datetime

    from mongo_arrow_spark.api import aggregate

    ev = tables["events"].limit(2000)
    bounds = [
        datetime.datetime(2024, 1, 1),
        datetime.datetime(2024, 7, 1),
        datetime.datetime(2025, 1, 1),
        datetime.datetime(2026, 1, 1),
    ]
    out = aggregate(
        ev,
        [
            {
                "$searchMeta": {
                    "facet": {
                        "facets": {
                            "periods": {
                                "type": "date",
                                "path": "ts",
                                "boundaries": bounds,
                            }
                        }
                    }
                }
            }
        ],
    ).collect()
    buckets = out[0]["facet"]["periods"]["buckets"]
    total = sum(b["count"] for b in buckets)
    want = ev.filter(
        (F.col("ts") >= F.lit(bounds[0])) & (F.col("ts") < F.lit(bounds[-1]))
    ).count()
    assert total == want > 0
    assert [b["_id"] for b in buckets] == sorted(b["_id"] for b in buckets)

    docs = tables["documents"]
    with pytest.raises(MQLTranslationError, match="facet type"):
        aggregate(
            docs,
            [
                {
                    "$searchMeta": {
                        "facet": {
                            "facets": {"x": {"type": "boolean", "path": "lang"}}
                        }
                    }
                }
            ],
        )
    with pytest.raises(MQLTranslationError, match="boundaries"):
        aggregate(
            docs,
            [
                {
                    "$searchMeta": {
                        "facet": {
                            "facets": {
                                "x": {
                                    "type": "number",
                                    "path": "n_chars",
                                    "boundaries": [1],
                                }
                            }
                        }
                    }
                }
            ],
        )


def test_merge_mode_matrix(spark):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    def fresh_target():
        spark.createDataFrame(
            [(1, "old1", "x"), (2, "old2", "y")], ["_id", "v", "extra"]
        ).createOrReplaceTempView("mt")

    inc = spark.createDataFrame([(2, "new2"), (3, "new3")], ["_id", "v"])

    fresh_target()
    out = aggregate(inc, [{"$merge": {"into": "mt"}}])  # replace/insert
    rows = {r["_id"]: r for r in out.collect()}
    assert rows[2]["v"] == "new2" and rows[2]["extra"] is None
    assert set(rows) == {1, 2, 3}

    fresh_target()
    out = aggregate(inc, [{"$merge": {"into": "mt", "whenMatched": "keepExisting"}}])
    rows = {r["_id"]: r for r in out.collect()}
    assert rows[2]["v"] == "old2" and set(rows) == {1, 2, 3}

    fresh_target()
    out = aggregate(inc, [{"$merge": {"into": "mt", "whenMatched": "merge"}}])
    rows = {r["_id"]: r for r in out.collect()}
    assert rows[2]["v"] == "new2" and rows[2]["extra"] == "y"  # field-wise
    assert rows[1]["v"] == "old1" and set(rows) == {1, 2, 3}

    fresh_target()
    out = aggregate(inc, [{"$merge": {"into": "mt", "whenNotMatched": "discard"}}])
    assert set(r["_id"] for r in out.collect()) == {1, 2}

    fresh_target()
    with pytest.raises(MQLTranslationError):
        aggregate(inc, [{"$merge": {"into": "mt", "whenMatched": "fail"}}])
    fresh_target()
    with pytest.raises(MQLTranslationError):
        aggregate(inc, [{"$merge": {"into": "mt", "whenNotMatched": "fail"}}])


def test_geo_near(spark):
    import math

    from mongo_arrow_spark.api import aggregate

    # Paris (2.35, 48.85), London (-0.13, 51.51), Berlin (13.40, 52.52)
    df = spark.createDataFrame(
        [
            ("paris", [2.35, 48.85]),
            ("london", [-0.13, 51.51]),
            ("berlin", [13.40, 52.52]),
        ],
        ["city", "location"],
    )
    out = aggregate(
        df,
        [
            {
                "$geoNear": {
                    "near": [2.35, 48.85],
                    "key": "location",
                    "distanceField": "dist_m",
                }
            }
        ],
    ).collect()
    assert [r["city"] for r in out] == ["paris", "london", "berlin"]
    assert out[0]["dist_m"] == pytest.approx(0.0)
    # Paris–London great-circle ≈ 344 km (±2% for the spherical model)
    assert out[1]["dist_m"] == pytest.approx(344_000, rel=0.02)
    # maxDistance filter + struct key form + query prefilter
    df2 = spark.createDataFrame(
        [("a", {"lng": 2.35, "lat": 48.85}, 1), ("b", {"lng": 13.4, "lat": 52.52}, 2)],
        "name string, location struct<lng: double, lat: double>, tag int",
    )
    near = aggregate(
        df2,
        [
            {
                "$geoNear": {
                    "near": {"type": "Point", "coordinates": [2.35, 48.85]},
                    "key": "location",
                    "distanceField": "d",
                    "maxDistance": 500_000,
                    "query": {"tag": {"$gte": 1}},
                }
            }
        ],
    ).collect()
    assert [r["name"] for r in near] == ["a"]


def test_geonear_and_search_warn_without_limit(spark, tables):
    """MQL requires sorted output from $geoNear/$search; without a later
    $limit that is a global sort — the engine warns (like $bucketAuto)."""
    import warnings as _warnings

    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [("a", [2.35, 48.85])], "city string, location array<double>"
    )
    geo = {"near": [2.35, 48.85], "key": "location", "distanceField": "d"}
    with pytest.warns(UserWarning, match="global"):
        aggregate(df, [{"$geoNear": geo}])
    with pytest.warns(UserWarning, match="global"):
        aggregate(
            tables["documents"],
            [{"$search": {"text": {"query": "spark", "path": "text"}}}],
        )
    # a subsequent $limit (even non-adjacent) silences it
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        aggregate(df, [{"$geoNear": geo}, {"$project": {"city": 1, "d": 1}}, {"$limit": 5}])


def test_accumulator_python(spark):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 4.0), ("b", 10.0)], ["k", "v"]
    )
    out = aggregate(
        df,
        [
            {
                "$group": {
                    "_id": "$k",
                    "geo_mean": {
                        "$accumulator": {
                            "init": lambda: (0.0, 0),
                            "accumulate": lambda s, v: (s[0] + __import__("math").log(v), s[1] + 1),
                            "finalize": lambda s: __import__("math").exp(s[0] / s[1]),
                            "input": "$v",
                            "lang": "python",
                            "returnType": "double",
                        }
                    },
                }
            },
            {"$sort": {"_id": 1}},
        ],
    ).collect()
    assert out[0]["geo_mean"] == pytest.approx(2.0)  # (1*2*4)^(1/3)
    assert out[1]["geo_mean"] == pytest.approx(10.0)
    with pytest.raises(MQLTranslationError):
        aggregate(
            df,
            [{"$group": {"_id": "$k", "x": {"$accumulator": {"init": "js", "accumulate": "js", "input": "$v"}}}}],
        )


def test_geo_within(spark):
    import math

    from mongo_arrow_spark.api import find
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.createDataFrame(
        [
            ("paris", [2.35, 48.85]),
            ("london", [-0.13, 51.51]),
            ("berlin", [13.40, 52.52]),
        ],
        ["city", "location"],
    )
    # 400 km sphere around Paris catches London (344 km), not Berlin (878 km)
    rad = 400_000 / 6378137.0
    near = find(
        df, {"location": {"$geoWithin": {"$centerSphere": [[2.35, 48.85], rad]}}}
    )
    assert sorted(r["city"] for r in near.collect()) == ["london", "paris"]
    boxed = find(
        df, {"location": {"$geoWithin": {"$box": [[0.0, 48.0], [15.0, 53.0]]}}}
    )
    assert sorted(r["city"] for r in boxed.collect()) == ["berlin", "paris"]
    with pytest.raises(MQLTranslationError):
        find(df, {"location": {"$geoWithin": {"$polygon": []}}}).count()


def test_near_sphere_ball(spark):
    from mongo_arrow_spark.api import find

    df = spark.createDataFrame(
        [("paris", [2.35, 48.85]), ("london", [-0.13, 51.51]),
         ("berlin", [13.40, 52.52])],
        ["city", "location"],
    )
    q = {
        "location": {
            "$nearSphere": {
                "$geometry": {"type": "Point", "coordinates": [2.35, 48.85]},
                "$maxDistance": 400_000,
                "$minDistance": 1_000,
            }
        }
    }
    # ball excludes Paris (under min) and Berlin (over max)
    assert [r["city"] for r in find(df, q).collect()] == ["london"]


def test_documents_stage(spark):
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.range(1)
    out = aggregate(
        df,
        [
            {"$documents": [{"k": "a", "v": 1}, {"k": "b", "v": 2}]},
            {"$match": {"v": {"$gte": 2}}},
        ],
    )
    assert [(r["k"], r["v"]) for r in out.collect()] == [("b", 2)]
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$documents": []}])
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$documents": [1, 2]}])


def test_geo_flat_center_polygon_and_intersects(spark):
    from mongo_arrow_spark.api import find

    df = spark.createDataFrame(
        [("paris", [2.35, 48.85]), ("london", [-0.13, 51.51]),
         ("berlin", [13.40, 52.52]), ("rome", [12.50, 41.90])],
        ["city", "location"],
    )
    # flat circle of 3 degrees around Paris
    got = find(df, {"location": {"$geoWithin": {"$center": [[2.35, 48.85], 3.9]}}})
    assert sorted(r["city"] for r in got.collect()) == ["london", "paris"]
    # triangle covering western/central europe, excludes rome
    tri = [[-5.0, 45.0], [25.0, 56.0], [-5.0, 56.0]]
    got = find(df, {"location": {"$geoWithin": {"$polygon": tri}}})
    assert sorted(r["city"] for r in got.collect()) == ["berlin", "london", "paris"]
    # GeoJSON polygon with a hole punched around Berlin
    outer = [[-6.0, 40.0], [16.0, 40.0], [16.0, 54.0], [-6.0, 54.0], [-6.0, 40.0]]
    hole = [[12.0, 51.0], [15.0, 51.0], [15.0, 53.5], [12.0, 53.5], [12.0, 51.0]]
    geom = {"type": "Polygon", "coordinates": [outer, hole]}
    got = find(df, {"location": {"$geoWithin": {"$geometry": geom}}})
    assert sorted(r["city"] for r in got.collect()) == ["london", "paris", "rome"]
    got = find(df, {"location": {"$geoIntersects": {"$geometry": geom}}})
    assert sorted(r["city"] for r in got.collect()) == ["london", "paris", "rome"]
    with pytest.raises(MQLTranslationError):
        find(df, {"location": {"$geoIntersects": {"x": 1}}}).count()


def test_json_schema_match(spark):
    from mongo_arrow_spark.api import find

    df = spark.createDataFrame(
        [
            (1, "alice", 31.0, ["a", "b"], {"street": "rue x", "zip": "75"}),
            (2, "bo", 17.0, ["a", "a"], {"street": None, "zip": "10"}),
            (3, None, 55.0, [], None),
            (4, "carol", None, None, {"street": "calle y", "zip": "28"}),
        ],
        "id long, name string, age double, tags array<string>, "
        "addr struct<street:string, zip:string>",
    )

    def ids(schema):
        got = find(df, {"$jsonSchema": schema})
        return sorted(r["id"] for r in got.collect())

    assert ids({"required": ["name"]}) == [1, 2, 4]
    assert ids({"properties": {"age": {"minimum": 18}}}) == [1, 3, 4]
    assert ids({"properties": {"age": {"minimum": 31, "exclusiveMinimum": True},
                               }}) == [3, 4]
    assert ids({"properties": {"name": {"minLength": 3, "pattern": "^[a-z]+$"}}}
               ) == [1, 3, 4]
    assert ids({"properties": {"tags": {"uniqueItems": True}}}) == [1, 3, 4]
    assert ids({"properties": {"tags": {"minItems": 1, "items":
                                        {"enum": ["a", "b"]}}}}) == [1, 2, 4]
    # nested properties through a struct column; required inside a present doc
    assert ids({"properties": {"addr": {"required": ["street"],
                                        "properties": {"zip": {"pattern": "^[27]"}}}}}
               ) == [1, 3, 4]
    assert ids({"properties": {"age": {"bsonType": "double"}},
                "required": ["id"]}) == [1, 2, 3, 4]
    assert ids({"properties": {"name": {"type": "string"}}}) == [1, 2, 3, 4]
    assert ids({"properties": {"id": {"type": "integer", "multipleOf": 2}}}
               ) == [2, 4]
    assert ids({"anyOf": [{"required": ["name"], "properties":
                           {"name": {"maxLength": 2}}},
                          {"properties": {"age": {"minimum": 50}}}]}) == [2, 3, 4]
    # row 4's missing age passes branch 1 AND has a name: two hits, excluded
    assert ids({"oneOf": [{"properties": {"age": {"minimum": 30}}},
                          {"required": ["name"]}]}) == [2, 3]
    assert ids({"not": {"required": ["name"]}}) == [3]
    with pytest.raises(MQLTranslationError):
        find(df, {"$jsonSchema": {"propertyNames": {}}}).count()
    with pytest.raises(MQLTranslationError):
        find(df, {"$jsonSchema": {"minimum": 3}}).count()
    # field-position form: {field: {$jsonSchema: ...}} (null field passes)
    got = find(df, {"addr": {"$jsonSchema": {"required": ["zip"]}}})
    assert sorted(r["id"] for r in got.collect()) == [1, 2, 3, 4]


def test_projection_slice_and_elem_match(spark):
    from mongo_arrow_spark.api import find

    df = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5], [{"k": "a", "v": 1}, {"k": "b", "v": 9}]),
         (2, [7], [{"k": "c", "v": 3}])],
        "id long, nums array<int>, items array<struct<k:string, v:int>>",
    )
    # lone $slice keeps every other field (the server's special rule)
    rows = {r["id"]: r for r in find(df, {}, projection={"nums": {"$slice": 2}})
            .collect()}
    assert list(rows[1].asDict()) == ["id", "nums", "items"]
    assert rows[1]["nums"] == [1, 2] and rows[2]["nums"] == [7]
    rows = {r["id"]: r["nums"] for r in
            find(df, {}, projection={"nums": {"$slice": -2}}).collect()}
    assert rows[1] == [4, 5] and rows[2] == [7]
    rows = {r["id"]: r["nums"] for r in
            find(df, {}, projection={"nums": {"$slice": [1, 2]}}).collect()}
    assert rows[1] == [2, 3] and rows[2] == []
    rows = {r["id"]: r["nums"] for r in
            find(df, {}, projection={"nums": {"$slice": [-4, 2]}}).collect()}
    assert rows[1] == [2, 3] and rows[2] == [7]
    # include-mode when mixed with plain includes
    rows = {r["id"]: r for r in
            find(df, {}, projection={"id": 1, "nums": {"$slice": 1}}).collect()}
    assert list(rows[1].asDict()) == ["id", "nums"] and rows[1]["nums"] == [1]
    # $elemMatch keeps the first matching element, null when none match
    rows = {r["id"]: r["items"] for r in
            find(df, {}, projection={"items": {"$elemMatch": {"v": {"$gte": 5}}}})
            .collect()}
    assert [i.asDict() for i in rows[1]] == [{"k": "b", "v": 9}]
    assert rows[2] is None
    with pytest.raises(MQLTranslationError):
        find(df, {}, projection={"nums": {"$slice": [1, 0]}}).count()


def test_rank_fusion_hybrid_search(spark):
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i % 7), float((i * 3) % 11)) for i in range(1, 21)],
        "_id long, text string, text_score double, vec_score double",
    )
    pipes = {
        "lexical": [{"$sort": {"text_score": -1, "_id": 1}}, {"$limit": 5}],
        "semantic": [{"$sort": {"vec_score": -1, "_id": 1}}, {"$limit": 5}],
    }
    out = aggregate(
        df,
        [
            {"$rankFusion": {"input": {"pipelines": pipes},
                             "combination": {"weights": {"lexical": 2.0}}}},
            {"$project": {"_id": 1, "s": {"$round": [{"$meta": "score"}, 6]}}},
        ],
    )
    got = [(r["_id"], r["s"]) for r in out.collect()]
    # python oracle: replay RRF over the two ranked top-5 lists
    rows = [(i, i % 7, (i * 3) % 11) for i in range(1, 21)]
    lex = [i for i, t, v in sorted(rows, key=lambda r: (-r[1], r[0]))][:5]
    sem = [i for i, t, v in sorted(rows, key=lambda r: (-r[2], r[0]))][:5]
    want: dict = {}
    for rank, i in enumerate(lex, 1):
        want[i] = want.get(i, 0.0) + 2.0 / (60 + rank)
    for rank, i in enumerate(sem, 1):
        want[i] = want.get(i, 0.0) + 1.0 / (60 + rank)
    exp = sorted(((i, round(s, 6)) for i, s in want.items()),
                 key=lambda p: (-p[1], p[0]))
    assert got == exp
    with pytest.raises(MQLTranslationError):
        aggregate(df.drop("_id").withColumnRenamed("text", "t"),
                  [{"$rankFusion": {"input": {"pipelines": pipes}}}])
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$rankFusion": {"input": {"pipelines": pipes},
                                        "combination": {"weights": {"x": 1}}}}])
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$rankFusion": {"input": {"pipelines": {}}}}])


def test_densify_time_unit(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1, 0), 1.0),
         ("a", dt.datetime(2024, 1, 1, 3), 4.0)],
        "k string, ts timestamp, v double",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$densify": {
                    "field": "ts",
                    "partitionByFields": ["k"],
                    "range": {"step": 1, "unit": "hour", "bounds": "partition"},
                }
            }
        ],
    )
    rows = sorted(out.collect(), key=lambda r: r["ts"])
    assert [r["ts"].hour for r in rows] == [0, 1, 2, 3]
    assert [r["v"] for r in rows] == [1.0, None, None, 4.0]


def test_score_fusion_min_max_and_sigmoid(spark):
    import math

    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [(i, f"w{i} spark" if i <= 4 else f"w{i}",
          [float(i), 1.0]) for i in range(1, 9)],
        "_id long, text string, embedding array<double>",
    )
    pipes = {
        "lex": [{"$search": {"text": {"query": "spark", "path": "text"}}},
                 {"$limit": 3}],
        "sem": [{"$vectorSearch": {"path": "embedding",
                                    "queryVector": [1.0, 0.0],
                                    "limit": 3, "exact": True}}],
    }

    def run(norm, weights=None):
        stage = {"input": {"pipelines": pipes, "normalization": norm}}
        if weights:
            stage["combination"] = {"weights": weights}
        out = aggregate(df, [
            {"$scoreFusion": stage},
            {"$project": {"_id": 1, "s": {"$round": [{"$meta": "score"}, 6]}}},
        ])
        return [(r["_id"], r["s"]) for r in out.collect()]

    # python replay: lexical tf*ln(N/df) scores and cosine vector scores
    lex_rows = [(i, f"w{i} spark") for i in range(1, 5)]
    n, dfreq = 8, 4
    lex = sorted(((i, 1 * math.log(n / dfreq)) for i, _ in lex_rows),
                 key=lambda p: (-p[1], p[0]))[:3]
    def cos(i):
        import math as m
        return (1 + i / m.sqrt(i * i + 1)) / 2  # Atlas (1+cos)/2
    sem = sorted(((i, cos(i)) for i in range(1, 9)),
                 key=lambda p: (-p[1], p[0]))[:3]

    def fuse(lex_s, sem_s, wl=1.0, ws=1.0):
        want: dict = {}
        for i, s in lex_s:
            want[i] = want.get(i, 0.0) + wl * s
        for i, s in sem_s:
            want[i] = want.get(i, 0.0) + ws * s
        return sorted(((i, round(v / 2, 6)) for i, v in want.items()),
                      key=lambda p: (-p[1], p[0]))

    def minmax(pairs):
        lo = min(s for _, s in pairs); hi = max(s for _, s in pairs)
        return [(i, (s - lo) / (hi - lo) if hi > lo else 0.0)
                for i, s in pairs]

    assert run("none") == fuse(lex, sem)
    assert run("minMaxScaler") == fuse(minmax(lex), minmax(sem))
    sig = lambda pairs: [(i, 1 / (1 + math.exp(-s))) for i, s in pairs]
    assert run("sigmoid") == fuse(sig(lex), sig(sem))
    assert run("none", weights={"sem": 3.0}) == fuse(lex, sem, ws=3.0)
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$scoreFusion": {"input": {"pipelines": {
            "bad": [{"$match": {"_id": 1}}]}}}}])
    with pytest.raises(MQLTranslationError):
        aggregate(df, [{"$scoreFusion": {"input": {"pipelines": pipes},
                                         "combination": {"method": "mul"}}}])


def test_merge_when_matched_pipeline(spark):
    from mongo_arrow_spark.api import aggregate

    target = spark.createDataFrame(
        [(1, 10.0, 1), (2, 20.0, 5)], "k long, total double, hits long"
    )
    incoming = spark.createDataFrame(
        [(1, 7.0), (3, 99.0)], "k long, amount double"
    )
    merged = aggregate(
        incoming,
        [
            {
                "$merge": {
                    "into": "acc",
                    "on": "k",
                    "whenMatched": [
                        {"$set": {
                            "total": {"$add": ["$total", "$$new.amount"]},
                            "hits": {"$add": ["$hits", 1]},
                        }}
                    ],
                }
            }
        ],
        collections={"acc": target},
    )
    rows = {r["k"]: r.asDict() for r in merged.collect()}
    # matched row updated through the pipeline ($$new = incoming doc)
    assert rows[1]["total"] == 17.0 and rows[1]["hits"] == 2
    # untouched target row kept; unmatched incoming inserted
    assert rows[2]["total"] == 20.0 and rows[2]["hits"] == 5
    assert rows[3]["amount"] == 99.0 and rows[3].get("total") is None
    # discard drops the unmatched insert
    merged2 = aggregate(
        incoming,
        [{"$merge": {"into": "acc2", "on": "k",
                     "whenMatched": [{"$set": {"total": "$$new.amount"}}],
                     "whenNotMatched": "discard"}}],
        collections={"acc2": target},
    )
    assert sorted(r["k"] for r in merged2.collect()) == [1, 2]
    with pytest.raises(MQLTranslationError):
        aggregate(incoming,
                  [{"$merge": {"into": "acc3", "on": "k",
                               "whenMatched": [{"$group": {"_id": None}}]}}],
                  collections={"acc3": target})


def test_fusion_joins_broadcast_scores(spark):
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [(i, f"t{i} spark", [float(i), 1.0]) for i in range(1, 30)],
        "_id long, text string, embedding array<double>",
    )
    pipes = {
        "lex": [{"$search": {"text": {"query": "spark", "path": "text"}}},
                 {"$limit": 5}],
        "sem": [{"$vectorSearch": {"path": "embedding",
                                    "queryVector": [1.0, 0.0],
                                    "limit": 5, "exact": True}}],
    }
    for stage in ("$rankFusion", "$scoreFusion"):
        out = aggregate(df, [{stage: {"input": {"pipelines": pipes}}}])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, stage
        assert "SortMergeJoin" not in plan, stage


def test_ignored_option_warnings(spark):
    import warnings as w

    from mongo_arrow_spark.api import find

    df = spark.createDataFrame([(1, "spark rocks")], "_id long, text string")
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        find(df, {"$text": {"$search": "spark", "$language": "fr"}}).count()
    assert any("$language" in str(x.message) for x in caught)


def test_rank_fusion_score_details(spark):
    """$rankFusion scoreDetails (8.1): {"$meta": "scoreDetails"} carries
    value == fused score, one detail node per contributing input pipeline
    with its rank/weight, and the detail values sum to the total."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [(i, float(i % 7), float((i * 3) % 11)) for i in range(1, 21)],
        "_id long, text_score double, vec_score double",
    )
    pipes = {
        "lexical": [{"$sort": {"text_score": -1, "_id": 1}}, {"$limit": 5}],
        "semantic": [{"$sort": {"vec_score": -1, "_id": 1}}, {"$limit": 5}],
    }
    out = aggregate(
        df,
        [
            {"$rankFusion": {
                "input": {"pipelines": pipes},
                "combination": {"weights": {"lexical": 2.0}},
                "scoreDetails": True,
            }},
            {"$project": {"_id": 1,
                          "score": {"$meta": "score"},
                          "sd": {"$meta": "scoreDetails"}}},
        ],
    ).collect()
    assert out
    for r in out:
        sd = r["sd"]
        assert abs(sd["value"] - r["score"]) < 1e-9
        assert abs(sum(d["value"] for d in sd["details"]) - sd["value"]) < 1e-9
        for d in sd["details"]:
            assert d["inputPipelineName"] in pipes
            w_exp = 2.0 if d["inputPipelineName"] == "lexical" else 1.0
            assert d["weight"] == w_exp
            assert 1 <= d["rank"] <= 5
            assert abs(d["value"] - w_exp / (60 + d["rank"])) < 1e-9
        names = [d["inputPipelineName"] for d in sd["details"]]
        assert names == sorted(names)  # deterministic pipeline order


def test_score_fusion_score_details(spark):
    """$scoreFusion scoreDetails: value == fused score; each detail node
    carries the pre-normalization raw score, weight, and weighted
    normalized contribution; sum(values)/n_pipelines == fused score."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [(i, f"w{i} spark" if i <= 4 else f"w{i}", [float(i), 1.0])
         for i in range(1, 9)],
        "_id long, text string, embedding array<double>",
    )
    pipes = {
        "lex": [{"$search": {"text": {"query": "spark", "path": "text"}}},
                {"$limit": 3}],
        "sem": [{"$vectorSearch": {"path": "embedding",
                                   "queryVector": [1.0, 0.0],
                                   "limit": 3, "exact": True}}],
    }
    out = aggregate(
        df,
        [
            {"$scoreFusion": {
                "input": {"pipelines": pipes, "normalization": "sigmoid"},
                "combination": {"weights": {"lex": 3.0}},
                "scoreDetails": True,
            }},
            {"$project": {"_id": 1,
                          "score": {"$meta": "score"},
                          "sd": {"$meta": "scoreDetails"}}},
        ],
    ).collect()
    import math

    assert out
    for r in out:
        sd = r["sd"]
        assert abs(sd["value"] - r["score"]) < 1e-9
        got = sum(d["value"] for d in sd["details"]) / len(pipes)
        assert abs(got - sd["value"]) < 1e-9
        for d in sd["details"]:
            w_exp = 3.0 if d["inputPipelineName"] == "lex" else 1.0
            assert d["weight"] == w_exp
            sig = 1.0 / (1.0 + math.exp(-d["inputPipelineRawScore"]))
            assert abs(d["value"] - w_exp * sig) < 1e-9


def test_search_text_fuzzy(spark):
    """$search text with fuzzy: tokens within maxEdits match; prefixLength
    constrains the shared prefix; dfs are computed under the fuzzy
    predicate (so scores use the fuzzy document frequency)."""
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "teh quikc brown dog"),  # 'quikc' is 2 edits from 'quick'
            (3, "completely different"),
            (4, "quick quick quick"),
            (5, "uqick start guide"),  # 2 edits, but prefix 'uq' != 'qu'
        ],
        "id int, body string",
    )
    out = apply_pipeline(
        df,
        [
            {"$search": {"text": {"query": "quick", "path": "body",
                                  "fuzzy": {"maxEdits": 2}}}},
            {"$limit": 10},
            {"$project": {"id": 1, "score": {"$meta": "searchScore"}}},
        ],
    ).collect()
    ids = [r["id"] for r in out]
    assert set(ids) == {1, 2, 4, 5}
    assert ids[0] == 4  # tf=3 ranks first
    # exact search must NOT match the misspelled doc
    exact = apply_pipeline(
        df,
        [
            {"$search": {"text": {"query": "quick", "path": "body"}}},
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in exact} == {1, 4}
    # prefixLength 2 keeps 'quikc' (prefix 'qu') but rejects 'uqick'
    pl = apply_pipeline(
        df,
        [
            {"$search": {"text": {"query": "quick", "path": "body",
                                  "fuzzy": {"maxEdits": 2, "prefixLength": 2}}}},
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in pl} == {1, 2, 4}
    # maxEdits validation
    with pytest.raises(MQLTranslationError):
        apply_pipeline(
            df,
            [{"$search": {"text": {"query": "q", "path": "body",
                                   "fuzzy": {"maxEdits": 3}}}}],
        )


def test_search_autocomplete(spark):
    """$search autocomplete: token-prefix match; fuzzy tolerates edits in
    the same-length prefix; composes under compound."""
    df = spark.createDataFrame(
        [
            (1, "quantum computing"),
            (2, "quarterly report"),
            (3, "quenching typo here"),  # prefix 'quen' is 1 edit from 'quan'
            (4, "nothing relevant"),
        ],
        "id int, body string",
    )
    got = apply_pipeline(
        df,
        [
            {"$search": {"autocomplete": {"query": "quan", "path": "body"}}},
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in got} == {1}
    fz = apply_pipeline(
        df,
        [
            {"$search": {"autocomplete": {"query": "quan", "path": "body",
                                          "fuzzy": {"maxEdits": 1}}}},
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in fz} == {1, 2, 3}  # 'quar'/'quen' are 1 edit
    comp = apply_pipeline(
        df,
        [
            {
                "$search": {
                    "compound": {
                        "must": [
                            {"autocomplete": {"query": "qua", "path": "body"}}
                        ],
                        "mustNot": [
                            {"text": {"query": "report", "path": "body"}}
                        ],
                    }
                }
            },
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in comp} == {1}


def test_search_bm25_scoring(spark):
    """scoring='bm25': Lucene BM25 (k1=1.2, b=0.75) reproduced exactly;
    length normalization demotes a long document relative to tf·idf."""
    import math

    rows = [
        (1, "apple banana"),                       # short, 1 hit
        (2, "apple " + "filler " * 40 + "apple"),  # long, 2 hits
        (3, "cherry date"),
        (4, "apple"),                              # shortest, 1 hit
    ]
    df = spark.createDataFrame(rows, "id int, body string")
    out = {
        r["id"]: r["score"]
        for r in apply_pipeline(
            df,
            [
                {"$search": {"text": {"query": "apple", "path": "body"},
                             "scoring": "bm25"}},
                {"$limit": 10},
                {"$project": {"id": 1, "score": {"$meta": "searchScore"}}},
            ],
        ).collect()
    }
    assert set(out) == {1, 2, 4}
    # closed-form BM25 on the same corpus
    n_docs, df_t = 4, 3
    idf = math.log(1 + (n_docs - df_t + 0.5) / (df_t + 0.5))
    dls = {1: 2, 2: 42, 4: 1}
    avgdl = (2 + 42 + 2 + 1) / 4
    for i, tf in ((1, 1), (2, 2), (4, 1)):
        want = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avgdl))
        assert abs(out[i] - want) < 1e-9, (i, out[i], want)
    # the long doc's 2 hits score BELOW the short doc's 1 hit (length norm)
    assert out[2] < out[4]
    with pytest.raises(MQLTranslationError):
        apply_pipeline(
            df,
            [{"$search": {"text": {"query": "x", "path": "body"},
                          "scoring": "cosine"}}],
        )


def test_tfidf_search_bm25_matches_stage(spark):
    """operator-level tfidf_search(scoring='bm25') ranks identically to
    the $search stage's bm25 on the same corpus and terms."""
    from mongo_arrow_spark.operators.text import tfidf_search

    rows = [
        (1, "apple banana"),
        (2, "apple " + "filler " * 40 + "apple"),
        (3, "cherry date"),
        (4, "apple"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    op = tfidf_search(df, ["apple"], k=10, scoring="bm25").collect()
    stage = apply_pipeline(
        df,
        [
            {"$search": {"text": {"query": "apple", "path": "text"},
                         "scoring": "bm25"}},
            {"$limit": 10},
            {"$project": {"doc_id": 1, "score": {"$meta": "searchScore"}}},
        ],
    ).collect()
    assert [r["doc_id"] for r in op] == [r["doc_id"] for r in stage]
    for a, b in zip(op, stage):
        assert abs(a["score"] - round(b["score"], 4)) < 1e-4


def test_search_near(spark):
    """$search near: hyperbolic pivot scoring for numerics and dates,
    composable under compound with text must clauses."""
    df = spark.createDataFrame(
        [(1, 100.0, "2026-01-01 00:00:00"), (2, 150.0, "2026-01-02 00:00:00"),
         (3, 500.0, "2026-03-01 00:00:00"), (4, None, None)],
        "id int, price double, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        r["id"]: r["score"]
        for r in apply_pipeline(
            df,
            [
                {"$search": {"near": {"path": "price", "origin": 100,
                                      "pivot": 50}}},
                {"$limit": 10},
                {"$project": {"id": 1, "score": {"$meta": "searchScore"}}},
            ],
        ).collect()
    }
    assert out[1] == 1.0                      # at origin
    assert abs(out[2] - 0.5) < 1e-9           # at pivot distance
    assert abs(out[3] - 50 / 450) < 1e-9
    assert 4 not in out                       # null value never matches
    # date origin: pivot in milliseconds (one day = 86_400_000)
    dout = {
        r["id"]: r["score"]
        for r in apply_pipeline(
            df,
            [
                {"$search": {"near": {"path": "ts", "origin": "2026-01-01",
                                      "pivot": 86_400_000}}},
                {"$limit": 10},
                {"$project": {"id": 1, "score": {"$meta": "searchScore"}}},
            ],
        ).collect()
    }
    assert dout[1] == 1.0
    assert abs(dout[2] - 0.5) < 1e-9
    with pytest.raises(MQLTranslationError):
        apply_pipeline(df, [{"$search": {"near": {"path": "price", "origin": 1}}}])


def test_search_more_like_this(spark):
    """moreLikeThis: top-TF terms from the like document drive a text
    search; docs sharing the like doc's vocabulary rank first."""
    df = spark.createDataFrame(
        [
            (1, "distributed query engines process big data fast"),
            (2, "query engines love columnar data"),
            (3, "gardening tips for growing tomatoes at home"),
        ],
        "id int, body string",
    )
    out = apply_pipeline(
        df,
        [
            {
                "$search": {
                    "moreLikeThis": {
                        "like": {"body": "columnar query engines for data"},
                        "path": "body",
                    }
                }
            },
            {"$limit": 10},
            {"$project": {"id": 1, "score": {"$meta": "searchScore"}}},
        ],
    ).collect()
    ids = [r["id"] for r in out]
    # OR semantics: doc 3 sneaks in via the common term 'for', like
    # Lucene MLT without a stop list — but ranks dead last
    assert set(ids) == {1, 2, 3}
    assert ids[0] == 2  # shares 4 terms incl. rare 'columnar'
    assert ids[-1] == 3


def test_search_in_and_regex(spark):
    df = spark.createDataFrame(
        [(1, "alpha", 10), (2, "beta", 20), (3, "gamma", 30)],
        "id int, tag string, v int",
    )
    got = apply_pipeline(
        df,
        [
            {"$search": {"in": {"path": "tag", "value": ["alpha", "gamma"]}}},
            {"$limit": 10}, {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in got} == {1, 3}
    got2 = apply_pipeline(
        df,
        [
            {"$search": {"regex": {"path": "tag", "query": "a....|beta"}}},
            {"$limit": 10}, {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in got2} == {1, 2}  # whole-term anchoring: no 'gamma'


def test_search_embedded_document(spark):
    """embeddedDocument: any array element must satisfy ALL inner clauses
    (text + range across the same element, not across elements)."""
    rows = [
        (1, [{"name": "red widget", "qty": 5}, {"name": "blue gadget", "qty": 1}]),
        (2, [{"name": "red widget", "qty": 1}]),          # text hits, range misses
        (3, [{"name": "green thing", "qty": 9}]),          # range hits, text misses
        # text hits one element, range a DIFFERENT one -> must NOT match
        (4, [{"name": "red widget", "qty": 1}, {"name": "plain box", "qty": 9}]),
    ]
    df = spark.createDataFrame(
        rows, "id int, items array<struct<name:string, qty:int>>"
    )
    out = apply_pipeline(
        df,
        [
            {
                "$search": {
                    "embeddedDocument": {
                        "path": "items",
                        "operator": {
                            "compound": {
                                "must": [
                                    {"text": {"query": "widget",
                                              "path": "items.name"}},
                                    {"range": {"path": "items.qty", "gte": 3}},
                                ]
                            }
                        },
                    }
                }
            },
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in out} == {1}
    # single-operator form
    out2 = apply_pipeline(
        df,
        [
            {"$search": {"embeddedDocument": {
                "path": "items",
                "operator": {"text": {"query": "gadget", "path": "items.name"}},
            }}},
            {"$limit": 10},
            {"$project": {"id": 1}},
        ],
    ).collect()
    assert {r["id"] for r in out2} == {1}


def test_search_query_string(spark):
    """queryString: Lucene-lite parsing into must/mustNot/should text,
    phrase and wildcard clauses."""
    df = spark.createDataFrame(
        [
            (1, "red widget premium"),
            (2, "blue widget basic"),
            (3, "red gadget premium"),
        ],
        "id int, body string",
    )

    def run(q, **kw):
        spec = {"query": q, **kw}
        return {
            r["id"]
            for r in apply_pipeline(
                df,
                [{"$search": {"queryString": spec}}, {"$limit": 10},
                 {"$project": {"id": 1}}],
            ).collect()
        }

    assert run("body:widget AND NOT body:blue") == {1}
    assert run("red OR blue", defaultPath="body") == {1, 2, 3}
    assert run('body:"red widget"') == {1}
    assert run("body:gad*") == {3}
    with pytest.raises(MQLTranslationError):
        run("(red AND blue)", defaultPath="body")
    with pytest.raises(MQLTranslationError):
        run("bare-term-needs-default-path")


def test_search_geo_within_operators(spark):
    """$search geoWithin (circle/box/geometry) over point columns — the
    Atlas geo operators inside $search, reusing the find-side containment
    (match.py:176). Circle radius is meters, per the Atlas spec."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [
            ("paris", [2.35, 48.85], "cafe near louvre"),
            ("london", [-0.13, 51.51], "cafe near thames"),
            ("berlin", [13.40, 52.52], "cafe near spree"),
        ],
        ["city", "location", "text"],
    )
    circle = aggregate(
        df,
        [
            {"$search": {"geoWithin": {
                "path": "location",
                "circle": {"center": {"type": "Point",
                                      "coordinates": [2.35, 48.85]},
                           "radius": 400_000},
            }}},
            {"$limit": 10},
        ],
    )
    assert sorted(r["city"] for r in circle.collect()) == ["london", "paris"]
    box = aggregate(
        df,
        [
            {"$search": {"geoWithin": {
                "path": "location",
                "box": {"bottomLeft": {"type": "Point",
                                       "coordinates": [0.0, 48.0]},
                        "topRight": {"type": "Point",
                                     "coordinates": [15.0, 53.0]}},
            }}},
            {"$limit": 10},
        ],
    )
    assert sorted(r["city"] for r in box.collect()) == ["berlin", "paris"]
    poly = aggregate(
        df,
        [
            {"$search": {"geoWithin": {
                "path": "location",
                "geometry": {"type": "Polygon",
                             "coordinates": [[[-2.0, 47.0], [5.0, 47.0],
                                              [5.0, 53.0], [-2.0, 53.0],
                                              [-2.0, 47.0]]]},
            }}},
            {"$limit": 10},
        ],
    )
    assert sorted(r["city"] for r in poly.collect()) == ["london", "paris"]


def test_search_geo_shape_relations(spark):
    """geoShape relations for point columns: within/intersects = point in
    geometry, disjoint = has-a-location and outside, contains = Point
    equality; MultiPolygon unions its polygons."""
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.createDataFrame(
        [
            ("paris", [2.35, 48.85]),
            ("berlin", [13.40, 52.52]),
            ("nowhere", None),
        ],
        "city string, location array<double>",
    )
    ring = [[[-2.0, 47.0], [5.0, 47.0], [5.0, 53.0], [-2.0, 53.0],
             [-2.0, 47.0]]]
    within = aggregate(
        df,
        [{"$search": {"geoShape": {
            "path": "location", "relation": "within",
            "geometry": {"type": "Polygon", "coordinates": ring},
        }}}, {"$limit": 10}],
    )
    assert [r["city"] for r in within.collect()] == ["paris"]
    disjoint = aggregate(
        df,
        [{"$search": {"geoShape": {
            "path": "location", "relation": "disjoint",
            "geometry": {"type": "Polygon", "coordinates": ring},
        }}}, {"$limit": 10}],
    )
    # null-location docs are NOT disjoint (no indexed shape)
    assert [r["city"] for r in disjoint.collect()] == ["berlin"]
    multi = aggregate(
        df,
        [{"$search": {"geoShape": {
            "path": "location", "relation": "intersects",
            "geometry": {"type": "MultiPolygon", "coordinates": [
                ring,
                [[[12.0, 51.0], [14.0, 51.0], [14.0, 53.0], [12.0, 53.0],
                  [12.0, 51.0]]],
            ]},
        }}}, {"$limit": 10}],
    )
    assert sorted(r["city"] for r in multi.collect()) == ["berlin", "paris"]
    contains = aggregate(
        df,
        [{"$search": {"geoShape": {
            "path": "location", "relation": "contains",
            "geometry": {"type": "Point", "coordinates": [2.35, 48.85]},
        }}}, {"$limit": 10}],
    )
    assert [r["city"] for r in contains.collect()] == ["paris"]
    with pytest.raises(MQLTranslationError):
        aggregate(
            df,
            [{"$search": {"geoShape": {
                "path": "location", "relation": "contains",
                "geometry": {"type": "Polygon", "coordinates": ring},
            }}}, {"$limit": 10}],
        )


def test_search_compound_text_plus_geo(spark):
    """The Atlas combo the round-4 verdict called out: text scoring and a
    geo filter in ONE $search compound. Geo clauses filter
    (constant-score under must/filter); text clauses carry the TF-IDF
    score, so ranking matches the text-only ordering among geo
    survivors."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [
            ("paris", [2.35, 48.85], "wine bar wine cellar"),
            ("lyon", [4.84, 45.76], "wine shop"),
            ("berlin", [13.40, 52.52], "beer museum"),  # keeps df(wine) < N
        ],
        ["city", "location", "text"],
    )
    ring = [[[-2.0, 44.0], [6.0, 44.0], [6.0, 50.0], [-2.0, 50.0],
             [-2.0, 44.0]]]  # France-ish box: paris + lyon
    out = aggregate(
        df,
        [
            {"$search": {"compound": {
                "must": [{"text": {"query": "wine", "path": "text"}}],
                "filter": [{"geoWithin": {
                    "path": "location",
                    "geometry": {"type": "Polygon", "coordinates": ring},
                }}],
            }}},
            {"$project": {"city": 1,
                          "score": {"$meta": "searchScore"}}},
            {"$limit": 10},
        ],
    )
    rows = out.collect()
    assert [r["city"] for r in rows] == ["paris", "lyon"]  # 2 hits > 1 hit
    assert rows[0]["score"] > rows[1]["score"] > 0


def test_search_sort_and_count_options(spark, tables):
    """$search options: `sort` orders by stored fields (or explicit
    {"$meta": "searchScore"}) instead of the score default; `count`
    populates $$SEARCH_META for later stages (Atlas semantics);
    unsupported options fail fast."""
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    docs = tables["documents"]
    by_field = aggregate(
        docs,
        [
            {"$search": {"exists": {"path": "lang"},
                         "sort": {"n_chars": -1, "doc_id": 1}}},
            {"$limit": 5},
            {"$project": {"doc_id": 1, "n_chars": 1}},
        ],
    ).collect()
    want = [
        (r["doc_id"], r["n_chars"])
        for r in docs.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(5)
        .select("doc_id", "n_chars")
        .collect()
    ]
    assert [(r["doc_id"], r["n_chars"]) for r in by_field] == want
    with_meta = aggregate(
        docs,
        [
            {"$search": {"equals": {"path": "lang", "value": "en"},
                         "count": {"type": "total"}}},
            {"$limit": 3},
            {"$project": {"doc_id": 1,
                          "total": "$$SEARCH_META.count.total"}},
        ],
    ).collect()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert len(with_meta) == 3
    assert all(r["total"] == n_en for r in with_meta)
    with pytest.raises(MQLTranslationError, match="unsupported \\$search"):
        aggregate(
            docs,
            [{"$search": {"exists": {"path": "lang"},
                          "searchAfter": "token"}}, {"$limit": 1}],
        ).collect()
    with pytest.raises(MQLTranslationError, match="sort values"):
        aggregate(
            docs,
            [{"$search": {"exists": {"path": "lang"},
                          "sort": {"n_chars": "desc"}}}, {"$limit": 1}],
        ).collect()


def test_search_meta_geo_clauses(spark):
    """$searchMeta shares the clause parser, so geo operators count
    there too."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [("paris", [2.35, 48.85]), ("berlin", [13.40, 52.52])],
        "city string, location array<double>",
    )
    out = aggregate(
        df,
        [{"$searchMeta": {"geoWithin": {
            "path": "location",
            "box": {"bottomLeft": {"type": "Point", "coordinates": [0.0, 45.0]},
                    "topRight": {"type": "Point", "coordinates": [5.0, 50.0]}},
        }}}],
    ).first()
    assert out["count"]["lowerBound"] == 1


def test_search_highlight(spark):
    """highlight returns matched passages (hit token ± 3 context tokens)
    via {"$meta": "searchHighlights"}, capped at maxNumPassages."""
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.errors import MQLTranslationError

    df = spark.createDataFrame(
        [
            (1, "alpha beta spark gamma delta epsilon spark zeta"),
            (2, "no hits in this one at all"),
        ],
        "id int, text string",
    )
    out = aggregate(
        df,
        [
            {"$search": {"text": {"query": "spark", "path": "text"},
                         "highlight": {"path": "text"}}},
            {"$project": {"id": 1,
                          "hl": {"$meta": "searchHighlights"}}},
            {"$limit": 5},
        ],
    ).collect()
    assert [r["id"] for r in out] == [1]
    hl = out[0]["hl"]
    assert len(hl) == 2  # two hit positions
    first = hl[0]
    assert first["path"] == "text"
    kinds = [(t["type"], t["value"]) for t in first["texts"]]
    assert ("hit", "spark") in kinds
    assert ("text", "alpha beta") in kinds  # only 2 tokens precede
    assert ("text", "gamma delta epsilon") in kinds
    # cap passages
    capped = aggregate(
        df,
        [
            {"$search": {"text": {"query": "spark", "path": "text"},
                         "highlight": {"path": "text",
                                       "maxNumPassages": 1}}},
            {"$project": {"hl": {"$meta": "searchHighlights"}}},
            {"$limit": 5},
        ],
    ).first()
    assert len(capped["hl"]) == 1
    with pytest.raises(MQLTranslationError, match="highlight.path"):
        aggregate(
            df,
            [{"$search": {"text": {"query": "spark", "path": "text"},
                          "highlight": {"path": "other"}}},
             {"$limit": 1}],
        ).collect()


def test_search_score_details(spark):
    """scoreDetails attaches the scoring breakdown: top-level value ==
    searchScore, one detail node per scoring clause whose values sum to
    the total (filter clauses contribute none)."""
    from mongo_arrow_spark.api import aggregate

    df = spark.createDataFrame(
        [
            (1, "spark engines and spark plans", 120.0),
            (2, "gardening in spring", 80.0),
            (3, "query plans for spark", 150.0),
        ],
        "id int, body string, price double",
    )
    out = aggregate(
        df,
        [
            {"$search": {"compound": {
                "must": [{"text": {"query": "spark", "path": "body"}}],
                "should": [{"near": {"path": "price", "origin": 100,
                                     "pivot": 50}}],
                "filter": [{"exists": {"path": "body"}}],
            }, "scoreDetails": True}},
            {"$limit": 5},
            {"$project": {"id": 1,
                          "score": {"$meta": "searchScore"},
                          "sd": {"$meta": "searchScoreDetails"}}},
        ],
    ).collect()
    assert [r["id"] for r in out]  # spark docs only
    for r in out:
        sd = r["sd"]
        assert abs(sd["value"] - r["score"]) < 1e-9
        assert len(sd["details"]) == 2  # text + near; filter excluded
        assert abs(sum(d["value"] for d in sd["details"]) - sd["value"]) < 1e-9
        descs = [d["description"] for d in sd["details"]]
        assert any(d.startswith("text:body:spark") for d in descs)
        assert any(d.startswith("near:price") for d in descs)


def test_search_text_synonyms_equivalent_and_explicit(spark):
    """Atlas text.synonyms: the mapping name resolves like a collection;
    equivalent mappings expand every listed term to all of them, explicit
    mappings expand input terms to exactly their synonyms list (the
    original matches itself only if listed)."""
    from mongo_arrow_spark.api import aggregate

    docs = spark.createDataFrame(
        [
            (1, "the car sped away"),
            (2, "a vehicle was parked"),
            (3, "my automobile broke down"),
            (4, "drinking a cold beer"),
            (5, "ordered a pint at the pub"),
            (6, "nothing relevant here"),
        ],
        "_id long, body string",
    )
    syns = spark.createDataFrame(
        [
            ("equivalent", None, ["car", "vehicle", "automobile"]),
            ("explicit", ["beer"], ["brew", "pint"]),
        ],
        "mappingType string, input array<string>, synonyms array<string>",
    )
    colls = {"my_syns": syns}

    def run(query):
        return sorted(
            r["_id"]
            for r in aggregate(
                docs,
                [{"$search": {"text": {"query": query, "path": "body",
                                       "synonyms": "my_syns"}}}],
                collections=colls,
            ).collect()
        )

    # equivalent: 'car' matches car/vehicle/automobile docs
    assert run("car") == [1, 2, 3]
    assert run("vehicle") == [1, 2, 3]
    # explicit: 'beer' expands to brew/pint ONLY — doc 4 ('beer' itself)
    # does not match because 'beer' is not in the synonyms list (Atlas
    # explicit semantics); doc 5 ('pint') does
    assert run("beer") == [5]
    # non-mapped terms pass through unchanged
    assert run("relevant") == [6]


def test_search_text_synonyms_scoring_and_guards(spark):
    from mongo_arrow_spark.api import aggregate

    docs = spark.createDataFrame(
        [(1, "car car car"), (2, "vehicle"), (3, "boat")],
        "_id long, body string",
    )
    syns = spark.createDataFrame(
        [("equivalent", None, ["car", "vehicle"])],
        "mappingType string, input array<string>, synonyms array<string>",
    )
    out = aggregate(
        docs,
        [
            {"$search": {"text": {"query": "car", "path": "body",
                                  "synonyms": "syn"}}},
            {"$project": {"_id": 1, "s": {"$meta": "searchScore"}}},
        ],
        collections={"syn": syns},
    ).collect()
    scores = {r["_id"]: r["s"] for r in out}
    assert set(scores) == {1, 2}
    assert scores[1] > scores[2]  # tf 3 beats tf 1 under the same idf model
    # fuzzy + synonyms is an Atlas-documented conflict
    with pytest.raises(MQLTranslationError, match="synonyms"):
        aggregate(
            docs,
            [{"$search": {"text": {"query": "car", "path": "body",
                                   "synonyms": "syn",
                                   "fuzzy": {"maxEdits": 1}}}}],
            collections={"syn": syns},
        )
    # unknown mappingType fails fast
    bad = spark.createDataFrame(
        [("fuzzy-ish", None, ["a"])],
        "mappingType string, input array<string>, synonyms array<string>",
    )
    with pytest.raises(MQLTranslationError, match="mappingType"):
        aggregate(
            docs,
            [{"$search": {"text": {"query": "car", "path": "body",
                                   "synonyms": "bad"}}}],
            collections={"bad": bad},
        ).collect()


def test_search_text_match_criteria_all(spark):
    """text.matchCriteria 'all': every original term (or a synonym of
    it) must appear; 'any' (the default) keeps OR semantics."""
    from mongo_arrow_spark.api import aggregate

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "spark plans are optimized"),
            (3, "data pipelines everywhere"),
        ],
        "_id long, body string",
    )

    def run(mc):
        return sorted(
            r["_id"]
            for r in aggregate(
                docs,
                [{"$search": {"text": {"query": "spark data", "path": "body",
                                       "matchCriteria": mc}}}],
            ).collect()
        )

    assert run("any") == [1, 2, 3]
    assert run("all") == [1]
    with pytest.raises(MQLTranslationError, match="matchCriteria"):
        aggregate(
            docs,
            [{"$search": {"text": {"query": "x", "path": "body",
                                   "matchCriteria": "most"}}}],
        )


def test_min_max_scaler_window_function(spark):
    """$setWindowFields $minMaxScaler (8.1): scales to [min,max] over the
    window; default window is the whole partition; constant windows scale
    to the lower bound; explicit document frames respected."""
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 40.0),
         ("b", 1, 5.0), ("b", 2, 5.0)],
        "k string, i int, v double",
    )
    out = apply_pipeline(
        df,
        [
            {"$setWindowFields": {
                "partitionBy": "$k",
                "sortBy": {"i": 1},
                "output": {
                    "scaled": {"$minMaxScaler": {"input": "$v"}},
                    "scaled5": {"$minMaxScaler": {"input": "$v",
                                                  "min": 1, "max": 5}},
                    "running": {"$minMaxScaler": {"input": "$v"},
                                "window": {"documents": ["unbounded",
                                                         "current"]}},
                },
            }}
        ],
    )
    rows = {(r["k"], r["i"]): r for r in out.collect()}
    # whole-partition default: a → (10,20,40) maps to (0, 1/3, 1)
    assert rows[("a", 1)]["scaled"] == 0.0
    assert abs(rows[("a", 2)]["scaled"] - 1 / 3) < 1e-12
    assert rows[("a", 3)]["scaled"] == 1.0
    # custom range [1, 5]
    assert rows[("a", 1)]["scaled5"] == 1.0
    assert rows[("a", 3)]["scaled5"] == 5.0
    # constant partition scales to the lower bound
    assert rows[("b", 1)]["scaled"] == 0.0 and rows[("b", 2)]["scaled"] == 0.0
    # explicit running frame: each row vs its prefix
    assert rows[("a", 1)]["running"] == 0.0  # single-element prefix
    assert rows[("a", 2)]["running"] == 1.0  # max of (10, 20)
    assert rows[("a", 3)]["running"] == 1.0
    with pytest.raises(MQLTranslationError, match="max must exceed"):
        apply_pipeline(df, [{"$setWindowFields": {
            "partitionBy": "$k",
            "output": {"x": {"$minMaxScaler": {"input": "$v",
                                               "min": 2, "max": 2}}}}}])


def test_sigmoid_expression(spark):
    import math

    from mongo_arrow_spark.mql import translate_expr

    df = spark.createDataFrame([(0.0,), (2.0,), (-3.0,)], "x double")
    got = [r[0] for r in df.select(translate_expr({"$sigmoid": "$x"})).collect()]
    want = [1 / (1 + math.exp(-v)) for v in (0.0, 2.0, -3.0)]
    assert all(abs(g - w) < 1e-12 for g, w in zip(got, want))


def test_window_accumulator_functions(spark):
    """MQL 7.0 exposes the pure-aggregate accumulators as window
    functions; $setWindowFields routes them through the same translator
    ($addToSet/$median/$minN/$topN here), with document frames
    respected."""
    df = spark.createDataFrame(
        [("a", 1, 5.0, "x"), ("a", 2, 1.0, "y"), ("a", 3, 3.0, "x"),
         ("b", 1, 7.0, "z")],
        "k string, i int, v double, tag string",
    )
    out = apply_pipeline(
        df,
        [
            {"$setWindowFields": {
                "partitionBy": "$k",
                "sortBy": {"i": 1},
                "output": {
                    "tags": {"$addToSet": "$tag",
                             "window": {"documents": ["unbounded",
                                                      "unbounded"]}},
                    "med": {"$median": {"input": "$v",
                                        "method": "approximate"},
                            "window": {"documents": ["unbounded",
                                                     "unbounded"]}},
                    "low2": {"$minN": {"input": "$v", "n": 2},
                             "window": {"documents": ["unbounded",
                                                      "unbounded"]}},
                    "best": {"$topN": {"sortBy": {"v": -1}, "output": "$i",
                                       "n": 2},
                             "window": {"documents": ["unbounded",
                                                      "unbounded"]}},
                    "run_max2": {"$maxN": {"input": "$v", "n": 2},
                                 "window": {"documents": ["unbounded",
                                                          "current"]}},
                },
            }}
        ],
    )
    rows = {(r["k"], r["i"]): r for r in out.collect()}
    assert sorted(rows[("a", 1)]["tags"]) == ["x", "y"]
    assert rows[("a", 1)]["med"] == 3.0
    assert rows[("a", 1)]["low2"] == [1.0, 3.0]
    assert rows[("a", 1)]["best"] == [1, 3]  # v desc → 5.0 (i=1), 3.0 (i=3)
    assert rows[("b", 1)]["best"] == [1]
    # running frame: prefix maxima
    assert rows[("a", 1)]["run_max2"] == [5.0]
    assert rows[("a", 2)]["run_max2"] == [5.0, 1.0]
    assert rows[("a", 3)]["run_max2"] == [5.0, 3.0]
    with pytest.raises(MQLTranslationError, match="window function"):
        apply_pipeline(df, [{"$setWindowFields": {
            "partitionBy": "$k",
            "output": {"x": {"$accumulator": {"lang": "python"}}}}}])


def test_search_inside_lookup_subpipeline(spark):
    """Compositionality: a $lookup subpipeline may itself run $search
    (the Atlas federated-search-join shape) — the translator resolves
    collections and score columns through nested apply_pipeline."""
    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "_id long, name string"
    )
    posts = spark.createDataFrame(
        [(10, 1, "spark tuning notes"), (11, 1, "gardening"),
         (12, 2, "more spark tricks")],
        "_id long, user_id long, body string",
    )
    out = aggregate(
        users,
        [
            {"$lookup": {
                "from": "posts",
                "let": {"uid": "$_id"},
                "pipeline": [
                    {"$search": {"text": {"query": "spark", "path": "body"}}},
                    {"$match": {"$expr": {"$eq": ["$user_id", "$$uid"]}}},
                    # the correlation field must survive trailing
                    # projections (documented rewrite constraint)
                    {"$project": {"_id": 1, "user_id": 1}},
                ],
                "as": "hits",
            }},
        ],
        collections={"posts": posts},
    )
    got = {r["_id"]: sorted(h["_id"] for h in r["hits"]) for r in out.collect()}
    assert got == {1: [10], 2: [12]}


def test_union_with_search_subpipeline(spark):
    """$unionWith pipelines may run $search too (hybrid corpus unions)."""
    from mongo_arrow_spark.api import aggregate

    a = spark.createDataFrame([(1, "spark here")], "_id long, body string")
    b = spark.createDataFrame(
        [(2, "also spark"), (3, "nothing")], "_id long, body string"
    )
    out = aggregate(
        a,
        [
            {"$unionWith": {"coll": "b", "pipeline": [
                {"$search": {"text": {"query": "spark", "path": "body"}}},
                {"$project": {"_id": 1, "body": 1}},
            ]}},
            {"$project": {"_id": 1}},
        ],
        collections={"b": b},
    )
    assert sorted(r["_id"] for r in out.collect()) == [1, 2]


def test_correlated_lookup_trailing_limit_is_per_outer_row(spark):
    """A trailing $limit in a correlated $lookup subpipeline caps EACH
    outer row's match array (MQL evaluates the subpipeline once per outer
    document, reference api.py:252) — no warning, exact semantics."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,), (2,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1), (20, 2)], "_id long, user_id long"
    )
    with w.catch_warnings():
        w.simplefilter("error")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$limit": 2}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    by_id = {r["_id"]: r["hits"] for r in rows}
    assert len(by_id[1]) == 2  # capped per row, not globally
    assert len(by_id[2]) == 1


def test_correlated_lookup_trailing_sort_skip_limit_exact(spark):
    """$sort desc + $skip + $limit suffix replays per outer row via
    array_sort + slice; order inside the match array follows the $sort."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,), (2,), (3,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, 5.0), (11, 1, 9.0), (12, 1, 7.0), (13, 1, 1.0),
         (20, 2, 3.0)],
        "_id long, user_id long, score double",
    )
    with w.catch_warnings():
        w.simplefilter("error")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$sort": {"score": -1}},
                              {"$skip": 1},
                              {"$limit": 2}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    by_id = {r["_id"]: [h["_id"] for h in r["hits"]] for r in rows}
    assert by_id[1] == [12, 10]  # sorted 11,12,10,13 → skip 1, take 2
    assert by_id[2] == []  # one match, skipped away
    assert by_id[3] == []  # no match → empty array, suffix is a no-op


def test_correlated_lookup_mixed_direction_sort_suffix(spark):
    """Mixed-direction numeric $sort in the suffix (negation path)."""
    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, 1, 5.0), (11, 1, 1, 9.0), (12, 1, 2, 7.0)],
        "_id long, user_id long, grp int, score double",
    )
    rows = aggregate(
        users,
        [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                      "pipeline": [
                          {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                          {"$sort": {"grp": 1, "score": -1}},
                          {"$limit": 2}],
                      "as": "hits"}}],
        collections={"p": posts},
    ).collect()
    assert [h["_id"] for h in rows[0]["hits"]] == [11, 10]


def test_correlated_lookup_warns_on_mid_pipeline_cardinality(spark):
    """A $limit BURIED before another stage still runs once globally —
    the warning survives for exactly that shape."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1), (11, 1), (12, 1)], "_id long, user_id long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$limit": 2},
                              {"$project": {"_id": 1, "user_id": 1}}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    assert any("whole foreign collection" in str(x.message) for x in caught)


def test_correlated_lookup_untranslatable_suffix_falls_back_with_warning(spark):
    """A mixed-direction $sort whose DESCENDING key is a string (the
    negation trick needs numerics) → suffix folds back into the global
    pipeline and the semantics warning fires."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, "a"), (11, 1, "b")], "_id long, user_id long, tag string"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$sort": {"_id": 1, "tag": -1}},
                              {"$limit": 1}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    assert any("whole foreign collection" in str(x.message) for x in caught)


def test_lookup_localfield_pipeline_trailing_limit_per_row(spark):
    """localField/foreignField + pipeline form gets the same per-outer-row
    suffix treatment."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,), (2,)], "uid long")
    posts = spark.createDataFrame(
        [(10, 1, 3.0), (11, 1, 1.0), (12, 1, 2.0), (20, 2, 9.0)],
        "_id long, user_id long, score double",
    )
    with w.catch_warnings():
        w.simplefilter("error")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "localField": "uid",
                          "foreignField": "user_id",
                          "pipeline": [{"$sort": {"score": 1}},
                                       {"$limit": 2}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    by_id = {r["uid"]: [h["_id"] for h in r["hits"]] for r in rows}
    assert by_id[1] == [11, 12]
    assert by_id[2] == [20]


def test_correlated_lookup_mixed_sort_null_desc_lands_last(spark):
    """r8 ADVICE fix: under a DESCENDING key in a mixed-direction suffix
    sort, NULL values must land LAST (server semantics) — naive key
    negation leaves -NULL = NULL sorting FIRST, selecting the wrong rows
    when a $limit follows."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, 1, 5.0), (11, 1, 1, None), (12, 1, 1, 9.0),
         (13, 1, 2, 1.0)],
        "_id long, user_id long, grp int, score double",
    )
    with w.catch_warnings():
        w.simplefilter("error")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$sort": {"grp": 1, "score": -1}},
                              {"$limit": 2}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    # grp 1 sorted by score desc: 12 (9.0), 10 (5.0), 11 (NULL last)
    assert [h["_id"] for h in rows[0]["hits"]] == [12, 10]


def test_correlated_lookup_mixed_sort_null_asc_lands_first(spark):
    """Ascending keys in the mixed-direction replay keep server null
    order too: nulls FIRST."""
    import warnings as w

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, 5.0, 1), (11, 1, None, 1), (12, 1, 9.0, 2)],
        "_id long, user_id long, score double, rank int",
    )
    with w.catch_warnings():
        w.simplefilter("error")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$sort": {"score": 1, "rank": -1}},
                              {"$limit": 1}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    assert [h["_id"] for h in rows[0]["hits"]] == [11]  # NULL first asc


def test_correlated_lookup_suffix_map_column_falls_back(spark):
    """r8 ADVICE fix: the suffix replay sorts struct(keys…, whole-row),
    so a non-orderable foreign column (MapType) would fail at ANALYSIS —
    _suffix_translatable must reject it and fall back to the warned
    global path instead of raising."""
    import warnings as w

    from pyspark.sql import functions as F

    from mongo_arrow_spark.api import aggregate

    users = spark.createDataFrame([(1,)], "_id long")
    posts = spark.createDataFrame(
        [(10, 1, 2.0), (11, 1, 1.0)], "_id long, user_id long, score double"
    ).withColumn("meta", F.create_map(F.lit("k"), F.col("score")))
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        rows = aggregate(
            users,
            [{"$lookup": {"from": "p", "let": {"u": "$_id"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$user_id", "$$u"]}}},
                              {"$sort": {"score": 1}},
                              {"$limit": 1}],
                          "as": "hits"}}],
            collections={"p": posts},
        ).collect()
    assert any("whole foreign collection" in str(x.message) for x in caught)
    # the fallback still applies the stages (globally here — one outer
    # row, so global == per-row and the result is exact)
    assert [h["_id"] for h in rows[0]["hits"]] == [11]


def test_vector_search_persisted_index_route(spark, tmp_path):
    """$vectorSearch index= pointing at a build_ivf_pq_index artifact
    routes candidate generation through the persisted index (retrieve by
    ADC over n_probe cell dirs, exact re-rank): full-probe + corpus-wide
    numCandidates reproduces the exact stage bit-for-bit; an index keyed
    on a column the collection lacks raises; a non-path index name is
    ignored (plain exact scan)."""
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        fit_pq,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    model = fit_pq(emb, m=8, codes=16)
    idx = str(tmp_path / "vsidx")
    build_ivf_pq_index(emb, idx, model, n_clusters=8)
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
    stage = {"path": "embedding", "queryVector": qv, "limit": 5}
    exact = [
        (r["vec_id"], r["__vector_score"])
        for r in aggregate(
            emb,
            [
                {"$vectorSearch": stage},
                {"$project": {"vec_id": 1, "__vector_score": 1, "_id": 0}},
            ],
        ).collect()
    ]
    n = emb.count()
    routed = [
        (r["vec_id"], r["__vector_score"])
        for r in aggregate(
            emb,
            [
                {
                    "$vectorSearch": {
                        **stage,
                        "index": idx,
                        "numCandidates": n,
                        "nProbe": 8,
                    }
                },
                {"$project": {"vec_id": 1, "__vector_score": 1, "_id": 0}},
            ],
        ).collect()
    ]
    assert routed == exact
    # default knobs still return limit rows with true (exact) scores
    some = aggregate(
        emb, [{"$vectorSearch": {**stage, "index": idx}}]
    ).collect()
    assert len(some) == 5
    escore = dict(exact)
    for r in some:
        if r["vec_id"] in escore:
            assert abs(r["__vector_score"] - escore[r["vec_id"]]) < 1e-12
    # index keyed on a missing column fails loudly
    import pytest as _pytest

    with _pytest.raises(MQLTranslationError, match="keys on"):
        aggregate(
            emb.withColumnRenamed("vec_id", "other_id"),
            [{"$vectorSearch": {**stage, "index": idx}}],
        )
    # an Atlas index NAME (not a path) is accepted and ignored
    named = [
        (r["vec_id"], r["__vector_score"])
        for r in aggregate(
            emb,
            [
                {"$vectorSearch": {**stage, "index": "vector_index"}},
                {"$project": {"vec_id": 1, "__vector_score": 1, "_id": 0}},
            ],
        ).collect()
    ]
    assert named == exact


def test_vector_search_index_route_limits(spark, tmp_path):
    """The index route declines dotProduct (L2 retrieval can
    permanently miss high-norm matches) and declines filtered stages
    without an explicit numCandidates (post-filter ANN would collapse
    the result) — both fall back to exact semantics; a filtered stage
    WITH explicit corpus-wide numCandidates routes and still matches
    exact (r9 review fixes)."""
    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        fit_pq,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding", "label")
    model = fit_pq(emb, m=8, codes=16)
    idx = str(tmp_path / "vsidx2")
    build_ivf_pq_index(emb, idx, model, n_clusters=8)
    qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]

    def ids(extra):
        stage = {"path": "embedding", "queryVector": qv, "limit": 5, **extra}
        return [
            r["vec_id"]
            for r in aggregate(emb, [{"$vectorSearch": stage}]).collect()
        ]

    # dotProduct: index ignored == exact dotProduct
    assert ids({"similarity": "dotProduct", "index": idx}) == ids(
        {"similarity": "dotProduct"}
    )
    # filter without numCandidates: index ignored == filtered exact
    filt = {"label": {"$gte": 0}}
    assert ids({"filter": filt, "index": idx}) == ids({"filter": filt})
    # filter + corpus-wide numCandidates + full probe: routed, == exact
    n = emb.count()
    assert ids(
        {"filter": filt, "index": idx, "numCandidates": n, "nProbe": 8}
    ) == ids({"filter": filt})


def test_vector_search_relative_index_name_never_routes(spark, tmp_path):
    """An Atlas-style index NAME stays accepted-and-ignored even when a
    same-named artifact directory exists under the process CWD — result
    semantics must not flip on ambient filesystem state (r10 advice
    fix). The explicit ``indexPath`` extension key is how a caller opts
    into routing; it works with any path."""
    import os

    from mongo_arrow_spark.api import aggregate
    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        fit_pq,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding", "label")
    model = fit_pq(emb, m=8, codes=16)
    # a real artifact whose directory NAME collides with an Atlas index
    # name, placed under the CWD
    name = "vs_reltest_default"
    cwd_idx = os.path.join(os.getcwd(), name)
    build_ivf_pq_index(emb, cwd_idx, model, n_clusters=8)
    try:
        qv = [float(x) for x in emb.filter("vec_id = 3").first()["embedding"]]
        stage = {"path": "embedding", "queryVector": qv, "limit": 5}

        def rows(extra):
            return [
                (r["vec_id"], r["__vector_score"])
                for r in aggregate(
                    emb,
                    [
                        {"$vectorSearch": {**stage, **extra}},
                        {
                            "$project": {
                                "vec_id": 1,
                                "__vector_score": 1,
                                "_id": 0,
                            }
                        },
                    ],
                ).collect()
            ]

        # relative name == no index at all, even though ./name exists
        # (a starved nProbe=1 would change results IF it routed); no
        # numCandidates → both sides are the exact scan
        assert rows({"index": name, "nProbe": 1}) == rows({})
        # a PRESENT-but-null indexPath must not re-enable relative
        # routing through key-presence (r10 review fix)
        assert rows(
            {"index": name, "indexPath": None, "nProbe": 1}
        ) == rows({})
        # and with numCandidates, the relative name still means the
        # index-free LSH path, not the artifact route
        assert rows({"index": name, "nProbe": 1, "numCandidates": 5}) == rows(
            {"numCandidates": 5}
        )
        # the explicit extension key routes (full probe == exact)
        assert rows(
            {
                "indexPath": cwd_idx,
                "nProbe": 8,
                "numCandidates": emb.count(),
            }
        ) == rows({})
    finally:
        import shutil

        shutil.rmtree(cwd_idx, ignore_errors=True)
