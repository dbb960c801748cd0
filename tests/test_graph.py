"""Integer-exact PageRank (r8 ninth wave).

Cross-engine exactness is pinned by the ``graph_pagerank`` unrolled
power-iteration oracle (tests/test_battery.py); these pin what it can't
see: partitioning-independence, the dangling-mass and duplicate-edge
contracts, NULL endpoints, hub sanity, iters=0, and a randomized
differential vs an independent pure-python replay.
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.graph import pagerank

SCALE = 10**12


def _py_pagerank(edges, iters=3, d_num=85, d_den=100, scale=SCALE):
    E = sorted({(a, b) for a, b in edges if a is not None and b is not None})
    nodes = sorted({a for a, _ in E} | {b for _, b in E})
    n = len(nodes)
    deg = {}
    for a, _ in E:
        deg[a] = deg.get(a, 0) + 1
    p0 = scale // n
    base = ((d_den - d_num) * p0) // d_den
    p = {v: p0 for v in nodes}
    for _ in range(iters):
        mass = {}
        for a, b in E:
            mass[b] = mass.get(b, 0) + p[a] // deg[a]
        p = {v: base + (d_num * mass.get(v, 0)) // d_den for v in nodes}
    return p


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize("seed,iters", [(3, 3), (11, 5)])
def test_matches_python_replay(spark, seed, iters):
    import hashlib

    def h(i):
        return int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:6], 16)

    edges = [(h(i) % 50, h(i + 1000) % 50) for i in range(300)]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, edges), iters=iters).collect()
    }
    assert got == _py_pagerank(edges, iters=iters)


def test_partitioning_invariance(spark):
    edges = [(i % 17, (i * 7) % 17) for i in range(100)]
    a = pagerank(_edges_df(spark, edges).repartition(1), iters=3).collect()
    b = pagerank(_edges_df(spark, edges).repartition(13), iters=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicate_edges_collapse(spark):
    once = [(1, 2), (2, 3), (3, 1)]
    twice = once * 4
    a = pagerank(_edges_df(spark, once), iters=2).collect()
    b = pagerank(_edges_df(spark, twice), iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_null_endpoints_dropped(spark):
    clean = [(1, 2), (2, 3), (3, 1)]
    dirty = clean + [(None, 2), (3, None)]
    df = spark.createDataFrame(dirty, "src long, dst long")
    a = pagerank(df, iters=2).collect()
    b = pagerank(_edges_df(spark, clean), iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hub_ranks_highest(spark):
    """Star graph: everyone links to node 0 — it must dominate."""
    edges = [(i, 0) for i in range(1, 20)]
    got = {r["node"]: r["rank"] for r in
           pagerank(_edges_df(spark, edges), iters=3).collect()}
    assert got[0] == max(got.values())
    assert got[0] > 10 * got[1]


def test_dangling_mass_leaks(spark):
    """Documented contract: dangling nodes leak their mass, so total
    mass strictly decreases — but ordering is still meaningful."""
    edges = [(1, 2), (2, 3)]  # 3 is dangling
    got = {r["node"]: r["rank"] for r in
           pagerank(_edges_df(spark, edges), iters=3).collect()}
    assert sum(got.values()) < SCALE
    assert set(got) == {1, 2, 3}


def test_iters_zero_uniform(spark):
    edges = [(1, 2), (3, 4)]
    got = {r["node"]: r["rank"] for r in
           pagerank(_edges_df(spark, edges), iters=0).collect()}
    assert set(got.values()) == {SCALE // 4}


def test_self_loop_kept(spark):
    """A self-loop is a legal PageRank edge (the node feeds itself)."""
    edges = [(1, 1), (1, 2), (2, 1)]
    got = {r["node"]: r["rank"] for r in
           pagerank(_edges_df(spark, edges), iters=2).collect()}
    assert got == _py_pagerank(edges, iters=2)


def test_validation_and_empty(spark):
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError, match="iters"):
        pagerank(df, iters=-1)
    with pytest.raises(ValueError, match="d_num"):
        pagerank(df, d_num=120)
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iters=2).count() == 0


def test_plan_no_cartesian_and_bounded_shuffles(spark):
    """One iteration = the rank-onto-edges join + the by-dst partial agg
    + the carry join back to the node list — no cartesian product, and
    the iteration input is the checkpointed frame (flat lineage)."""
    from mongo_arrow_spark.plans import plan_report

    edges = [(i % 11, (i * 3) % 11) for i in range(60)]
    out = pagerank(_edges_df(spark, edges), iters=2)
    rep = plan_report(out)
    assert rep.cartesian_products == 0
    # localCheckpoint per round: the final plan reads the checkpointed
    # RDD, so lineage (and shuffle count) does not grow with iters
    assert "ExistingRDD" in out._jdf.queryExecution().toString()


def _py_pagerank_w(wedges, iters=3, d_num=85, d_den=100, scale=SCALE,
                   reset=None):
    """Weighted/personalized replay: wedges = {(src, dst): w}."""
    nodes = sorted({a for a, _ in wedges} | {b for _, b in wedges})
    if reset is not None:
        nodes = sorted(set(nodes) | set(reset))
    wout = {}
    for (a, _), w in wedges.items():
        wout[a] = wout.get(a, 0) + w
    n_reset = len(set(reset)) if reset is not None else len(nodes)
    p0 = scale // n_reset
    base = ((d_den - d_num) * p0) // d_den
    seed = set(reset) if reset is not None else set(nodes)
    p = {v: (p0 if v in seed else 0) for v in nodes}
    for _ in range(iters):
        mass = {}
        for (a, b), w in wedges.items():
            mass[b] = mass.get(b, 0) + (p[a] * w) // wout[a]
        p = {
            v: (base if v in seed else 0)
            + (d_num * mass.get(v, 0)) // d_den
            for v in nodes
        }
    return p


def test_weighted_matches_python_replay(spark):
    wedges = {(1, 2): 3, (1, 3): 1, (2, 3): 5, (3, 1): 2, (3, 4): 7}
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in wedges.items()],
        "src long, dst long, w long",
    )
    got = {r["node"]: r["rank"] for r in
           pagerank(df, iters=3, weight_col="w").collect()}
    assert got == _py_pagerank_w(wedges, iters=3)


def test_weight_one_equals_unweighted(spark):
    edges = [(i % 9, (i * 5) % 9) for i in range(40)]
    df = spark.createDataFrame(
        [(a, b, 1) for a, b in set(edges)], "src long, dst long, w long"
    )
    a = pagerank(df, iters=3, weight_col="w").collect()
    b = pagerank(_edges_df(spark, edges), iters=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_duplicate_weighted_edges_sum(spark):
    df = spark.createDataFrame(
        [(1, 2, 2), (1, 2, 3), (2, 1, 4)], "src long, dst long, w long"
    )
    got = {r["node"]: r["rank"] for r in
           pagerank(df, iters=2, weight_col="w").collect()}
    assert got == _py_pagerank_w({(1, 2): 5, (2, 1): 4}, iters=2)


def test_nonpositive_weights_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2, 3), (2, 1, 2), (1, 3, 0), (3, 1, -4), (2, 3, None)],
        "src long, dst long, w long",
    )
    got = {r["node"]: r["rank"] for r in
           pagerank(df, iters=2, weight_col="w").collect()}
    assert got == _py_pagerank_w({(1, 2): 3, (2, 1): 2}, iters=2)


def test_personalized_teleports_to_seeds(spark):
    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    got = {r["node"]: r["rank"] for r in
           pagerank(_edges_df(spark, edges), iters=3,
                    reset_nodes=[1]).collect()}
    want = _py_pagerank_w({e: 1 for e in edges}, iters=3, reset=[1])
    assert got == want
    # seed that is not a graph endpoint still receives teleport mass
    got2 = {r["node"]: r["rank"] for r in
            pagerank(_edges_df(spark, edges), iters=2,
                     reset_nodes=[1, 99]).collect()}
    want2 = _py_pagerank_w({e: 1 for e in edges}, iters=2, reset=[1, 99])
    assert got2 == want2 and 99 in got2


def test_personalized_empty_seeds_rejected(spark):
    with pytest.raises(ValueError, match="reset_nodes"):
        pagerank(_edges_df(spark, [(1, 2)]), reset_nodes=[])


# --- centrality-based canonical selection (dedup composition) -------------


def test_centrality_survivors_picks_hub(spark):
    """Mirror set {1,2,3,4}: 1 pairs with everyone (complete copy), the
    others only with 1 (truncated) — the hub survives. Component {10,11}
    is a tie (symmetric pair) → min id. 99 never paired → kept."""
    from mongo_arrow_spark.operators.dedup import centrality_survivors

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in (1, 2, 3, 4, 10, 11, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"] for r in centrality_survivors(docs, pairs).collect()}
    assert got == {1, 10, 99}


def test_centrality_survivors_accepts_precomputed_components(spark):
    from mongo_arrow_spark.operators.dedup import (
        centrality_survivors,
        connected_components,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    comps = connected_components(pairs)
    a = {r["doc_id"] for r in
         centrality_survivors(docs, pairs, components=comps).collect()}
    b = {r["doc_id"] for r in centrality_survivors(docs, pairs).collect()}
    assert a == b
    # chain 0-1-2: node 1 (the middle) is most central; 3 unpaired
    assert a == {1, 3, 4}


# --- HITS (hubs & authorities) ---------------------------------------------


def _py_hits(edges, iters=3, scale=10**6):
    E = sorted({(a, b) for a, b in edges if a is not None and b is not None})
    nodes = sorted({a for a, _ in E} | {b for _, b in E})
    h = {v: scale for v in nodes}
    a = {v: 0 for v in nodes}
    for _ in range(iters):
        ra = {}
        for u, v in E:
            ra[v] = ra.get(v, 0) + h[u]
        mx = max(ra.values()) if ra else 0
        a = {v: (ra.get(v, 0) * scale) // mx if mx else 0 for v in nodes}
        rh = {}
        for u, v in E:
            rh[u] = rh.get(u, 0) + a[v]
        mx = max(rh.values()) if rh else 0
        h = {v: (rh.get(v, 0) * scale) // mx if mx else 0 for v in nodes}
    return {v: (h[v], a[v]) for v in nodes}


def test_hits_matches_python_replay(spark):
    from mongo_arrow_spark.operators.graph import hits

    import hashlib

    def hsh(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16)

    edges = sorted({(hsh(i) % 25, 100 + hsh(i + 900) % 15) for i in range(90)})
    got = {r["node"]: (r["hub"], r["authority"]) for r in
           hits(_edges_df(spark, edges), iters=3).collect()}
    assert got == _py_hits(edges, iters=3)


def test_hits_bipartite_roles_and_invariance(spark):
    """Pure bipartite graph: sources have authority 0, sinks hub 0; the
    best-connected sink is the top authority. Partitioning-invariant."""
    from mongo_arrow_spark.operators.graph import hits

    edges = [(u, 100) for u in range(5)] + [(0, 101), (1, 101), (2, 102)]
    got = {r["node"]: (r["hub"], r["authority"]) for r in
           hits(_edges_df(spark, edges), iters=3).collect()}
    assert all(got[u][1] == 0 for u in range(5))     # sources: no inbound
    assert all(got[s][0] == 0 for s in (100, 101, 102))  # sinks: no outbound
    assert got[100][1] == max(v[1] for v in got.values())
    b = {r["node"]: (r["hub"], r["authority"]) for r in
         hits(_edges_df(spark, edges).repartition(7), iters=3).collect()}
    assert b == got


def test_hits_validation_and_empty(spark):
    from mongo_arrow_spark.operators.graph import hits

    with pytest.raises(ValueError, match="iters"):
        hits(_edges_df(spark, [(1, 2)]), iters=-1)
    empty = spark.createDataFrame([], "src long, dst long")
    assert hits(empty, iters=2).count() == 0
