"""Diversity selection (r8 eighth wave): greedy k-center + MMR.

The exact cross-engine semantics are pinned by the generated chained-CTE
DuckDB oracles (``select_kcenter``/``select_kcenter_grouped``/
``select_mmr``, tests/test_battery.py); these pin what the oracles can't
see: partitioning-independence, the corrupt-vector and NULL-group
contracts, duplicate-point tie-breaks, group exhaustion, the greedy
coverage-radius invariant, the rel_col path, and a randomized
differential against an independent pure-python greedy.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.diversity import kcenter_select, mmr_select

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# --- independent pure-python greedy reference ---------------------------


def _quant(v, scale=10_000):
    return [int(math.floor(float(x) * scale + 0.5)) for x in v]


def _sqd(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def _md5(i):
    return hashlib.md5(str(i).encode()).hexdigest()


def _py_kcenter(pts, k):
    """pts: [(id, quantized_vec)] — returns [(id, rank, gain)]."""
    seed = min(pts, key=lambda p: (_md5(p[0]), p[0]))
    out = [(seed[0], 1, None)]
    sel_ids = {seed[0]}
    dmin = {p[0]: _sqd(p[1], seed[1]) for p in pts}
    for rank in range(2, k + 1):
        cand = [p for p in pts if p[0] not in sel_ids]
        if not cand:
            break
        m = max(dmin[p[0]] for p in cand)
        best = min((p for p in cand if dmin[p[0]] == m), key=lambda p: p[0])
        out.append((best[0], rank, m))
        sel_ids.add(best[0])
        for p in pts:
            dmin[p[0]] = min(dmin[p[0]], _sqd(p[1], best[1]))
    return out


def _py_mmr(pts, k, qq, ln=1, ld=2):
    rel = {p[0]: _dot(p[1], qq) for p in pts}
    m = max(rel.values())
    seed = min((p for p in pts if rel[p[0]] == m), key=lambda p: p[0])
    out = [(seed[0], 1, ln * rel[seed[0]])]
    sel_ids = {seed[0]}
    smax = {p[0]: _dot(p[1], seed[1]) for p in pts}
    for rank in range(2, k + 1):
        cand = [p for p in pts if p[0] not in sel_ids]
        if not cand:
            break
        sc = {p[0]: ln * rel[p[0]] - (ld - ln) * smax[p[0]] for p in cand}
        mm = max(sc.values())
        best = min((p for p in cand if sc[p[0]] == mm), key=lambda p: p[0])
        out.append((best[0], rank, mm))
        sel_ids.add(best[0])
        for p in pts:
            smax[p[0]] = max(smax[p[0]], _dot(p[1], best[1]))
    return out


def _mk(spark, rows, dim=4):
    return spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>, grp string"
    )


def _rand_rows(seed, n, dim=4, groups=("a", "b")):
    """Deterministic pseudo-random points via md5 — no RNG state."""
    rows = []
    for i in range(n):
        vec = [
            (int(_md5(f"{seed}:{i}:{j}")[:6], 16) % 2000 - 1000) / 997.0
            for j in range(dim)
        ]
        rows.append((i, vec, groups[i % len(groups)]))
    return rows


# --- randomized differentials -------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_kcenter_matches_python_greedy(spark, seed):
    rows = _rand_rows(seed, 40)
    df = _mk(spark, rows)
    pts = [(i, _quant(v)) for i, v, _ in rows]
    want = _py_kcenter(pts, 7)
    got = sorted(
        [(r["vec_id"], r["sel_rank"], r["gain"]) for r in
         kcenter_select(df, 7).collect()],
        key=lambda t: t[1],
    )
    assert got == want


@pytest.mark.parametrize("seed", [0, 3])
def test_mmr_matches_python_greedy(spark, seed):
    rows = _rand_rows(seed, 35)
    df = _mk(spark, rows)
    pts = [(i, _quant(v)) for i, v, _ in rows]
    query = rows[0][1]
    want = _py_mmr(pts, 6, _quant(query))
    got = sorted(
        [(r["vec_id"], r["sel_rank"], r["score"]) for r in
         mmr_select(df, 6, query_vec=query).collect()],
        key=lambda t: t[1],
    )
    assert got == want


def test_grouped_kcenter_matches_per_group_python(spark):
    rows = _rand_rows(5, 30, groups=("x", "y", "z"))
    df = _mk(spark, rows)
    want = []
    for g in ("x", "y", "z"):
        pts = [(i, _quant(v)) for i, v, gg in rows if gg == g]
        want += [(i, g, rk, gn) for i, rk, gn in _py_kcenter(pts, 4)]
    got = [
        (r["vec_id"], r["grp"], r["sel_rank"], r["gain"])
        for r in kcenter_select(df, 4, group_col="grp").collect()
    ]
    assert sorted(got) == sorted(want)


# --- determinism / partitioning ------------------------------------------


def test_partitioning_invariance(spark, emb):
    a = kcenter_select(emb.repartition(1), 6).collect()
    b = kcenter_select(emb.repartition(13), 6).collect()
    key = lambda r: r["sel_rank"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    m1 = mmr_select(emb.repartition(1), 5, query_vec=[0.1] * 64).collect()
    m2 = mmr_select(emb.repartition(13), 5, query_vec=[0.1] * 64).collect()
    assert sorted(m1, key=key) == sorted(m2, key=key)


def test_rematerialize_does_not_change_result(spark, emb):
    a = kcenter_select(emb, 8, rematerialize_every=3).collect()
    b = kcenter_select(emb, 8, rematerialize_every=1000).collect()
    key = lambda r: r["sel_rank"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


# --- contracts ------------------------------------------------------------


def test_duplicate_points_still_select_distinct_ids(spark):
    rows = [(i, [1.0, 2.0, 3.0, 4.0], "g") for i in range(10)]
    df = _mk(spark, rows)
    got = kcenter_select(df, 4).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == 4 and len(set(ids)) == 4
    # all-duplicate corpus: every post-seed gain is 0
    assert all(r["gain"] == 0 for r in got if r["sel_rank"] > 1)


def test_corrupt_vectors_ignored(spark):
    rows = _rand_rows(7, 20)
    bad = [
        (100, None, "a"),  # NULL vector
        (101, [1.0, None, 3.0, 4.0], "a"),  # NULL element
        (102, [1.0, 2.0], "a"),  # wrong dim
    ]
    df = spark.createDataFrame(
        rows + bad, "vec_id long, embedding array<float>, grp string"
    )
    got = {r["vec_id"] for r in kcenter_select(df, 23).collect()}
    assert got == {i for i, _, _ in rows}
    got_m = {
        r["vec_id"]
        for r in mmr_select(df, 23, query_vec=rows[0][1]).collect()
    }
    assert got_m == {i for i, _, _ in rows}


def test_null_group_dropped(spark):
    rows = _rand_rows(8, 12) + [(200, [0.5] * 4, None)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, grp string"
    )
    got = kcenter_select(df, 2, group_col="grp").collect()
    assert all(r["grp"] is not None for r in got)
    assert 200 not in {r["vec_id"] for r in got}


def test_group_exhaustion_yields_all_rows(spark):
    rows = [
        (1, [1.0, 0.0], "small"),
        (2, [0.0, 1.0], "small"),
        (10, [1.0, 1.0], "big"),
        (11, [2.0, 2.0], "big"),
        (12, [3.0, 3.0], "big"),
        (13, [4.0, 4.0], "big"),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, grp string"
    )
    got = kcenter_select(df, 4, group_col="grp").collect()
    by_g = {}
    for r in got:
        by_g.setdefault(r["grp"], []).append(r)
    assert len(by_g["small"]) == 2  # exhausted early, all rows kept
    assert len(by_g["big"]) == 4


def test_k_exceeding_rows_returns_all(spark, emb):
    n = emb.count()
    got = kcenter_select(emb.limit(5), 50).collect()
    assert len(got) == 5 and n >= 5


def test_gain_non_increasing(spark, emb):
    """The greedy coverage-radius curve: gains never increase in rank."""
    got = sorted(
        kcenter_select(emb, 10).collect(), key=lambda r: r["sel_rank"]
    )
    gains = [r["gain"] for r in got if r["gain"] is not None]
    assert all(a >= b for a, b in zip(gains, gains[1:]))


def test_mmr_rel_col_path(spark):
    rows = _rand_rows(9, 25)
    df = _mk(spark, rows).withColumn(
        "rel", (F.col("vec_id") * 7 % 13).cast("long")
    )
    got = sorted(
        [(r["vec_id"], r["sel_rank"], r["score"]) for r in
         mmr_select(df, 5, rel_col="rel").collect()],
        key=lambda t: t[1],
    )
    pts = [(i, _quant(v)) for i, v, _ in rows]
    rel = {i: (i * 7) % 13 for i, _, _ in rows}
    # python replay with the caller-provided rel
    m = max(rel.values())
    seed = min(i for i in rel if rel[i] == m)
    seed_q = dict(pts)[seed]
    out = [(seed, 1, 1 * rel[seed])]
    sel = {seed}
    smax = {i: _dot(q, seed_q) for i, q in pts}
    for rank in range(2, 6):
        sc = {i: rel[i] - smax[i] for i, _ in pts if i not in sel}
        mm = max(sc.values())
        best = min(i for i in sc if sc[i] == mm)
        out.append((best, rank, mm))
        sel.add(best)
        bq = dict(pts)[best]
        for i, q in pts:
            smax[i] = max(smax[i], _dot(q, bq))
    assert got == out


def test_validation_errors(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        kcenter_select(emb, 0)
    with pytest.raises(ValueError, match="exactly one"):
        mmr_select(emb, 3)
    with pytest.raises(ValueError, match="exactly one"):
        mmr_select(emb, 3, query_vec=[0.1] * 64, rel_col="label")
    with pytest.raises(ValueError, match="lam"):
        mmr_select(emb, 3, query_vec=[0.1] * 64, lam_num=3, lam_den=2)
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="no valid vectors"):
        kcenter_select(empty, 2)


# --- composition + plan shape ---------------------------------------------


def test_composes_with_random_projection(spark, emb):
    """The big-corpus recipe: JL-project 64→8, then pick the coreset in
    the cheap space — deterministic end-to-end."""
    from mongo_arrow_spark.operators.clustering import random_projection

    proj = random_projection(emb, out_dim=8, seed="s3")
    a = kcenter_select(proj, 5, vec_col="proj", scale=1).collect()
    b = kcenter_select(
        random_projection(emb.repartition(7), out_dim=8, seed="s3"),
        5,
        vec_col="proj",
        scale=1,
    ).collect()
    key = lambda r: r["sel_rank"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_no_cartesian_in_greedy_step(spark, emb):
    """The per-step argmax is a bounded two-stage agg + broadcast join —
    never a cartesian product or a corpus-wide window."""
    from mongo_arrow_spark.operators.diversity import _argbest, _clean

    q = _clean(emb, "vec_id", "embedding", 10_000, [])
    best = q.groupBy().agg(F.max("__id").alias("__id"))
    plan = q.join(F.broadcast(best), ["__id"])._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    # and the selection output is a driver-built local frame (no lineage
    # back into the corpus — safe to reuse without recompute surprises)
    out = kcenter_select(emb, 3)
    assert "Scan ExistingRDD" in out._jdf.queryExecution().toString() or \
        "LocalTableScan" in out._jdf.queryExecution().toString()


def test_short_corrupt_vector_cannot_hijack_seed(spark):
    """r8 review fix: the dimensionality contract resolves BEFORE
    seeding (modal dim), so one wrong-dim row with a minimal md5 can't
    become the seed and silently discard the whole valid corpus."""
    rows = _rand_rows(13, 10)
    # find an id whose md5 is smaller than every valid row's
    cand = next(
        i for i in range(10_000, 30_000)
        if _md5(i) < min(_md5(r[0]) for r in rows)
    )
    df = spark.createDataFrame(
        rows + [(cand, [1.0, 2.0], "a")],
        "vec_id long, embedding array<float>, grp string",
    )
    got = kcenter_select(df, 4).collect()
    assert len(got) == 4
    assert cand not in {r["vec_id"] for r in got}
    # explicit dim can deliberately select the minority dimension
    only_short = kcenter_select(df, 4, dim=2).collect()
    assert {r["vec_id"] for r in only_short} == {cand}
    # mmr rel_col path shares the fix (max-rel corrupt row can't seed)
    df2 = df.withColumn(
        "rel",
        F.when(F.col("vec_id") == cand, F.lit(10**9)).otherwise(
            F.col("vec_id") % 7
        ),
    )
    got_m = mmr_select(df2, 3, rel_col="rel").collect()
    assert cand not in {r["vec_id"] for r in got_m}


def test_foreign_dim_group_absent_not_seed_only(spark):
    """r8 review fix: a group whose vectors are all foreign-dimensional
    is absent from the output entirely (deterministic modal-dim
    contract) — never nondeterministically starved to its seed."""
    rows = [(i, [float(i), 1.0, 2.0, 3.0], "a") for i in range(5)] + [
        (100 + i, [float(i), 9.0], "b") for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, grp string"
    )
    got = kcenter_select(df, 3, group_col="grp").collect()
    # modal dim is 4 on ties? counts equal (5 vs 5) -> tie to SMALLER dim
    assert {r["grp"] for r in got} == {"b"}
    assert len(got) == 3
    # explicit dim selects the other group deterministically
    got4 = kcenter_select(df, 3, group_col="grp", dim=4).collect()
    assert {r["grp"] for r in got4} == {"a"} and len(got4) == 3


def test_exclusion_antijoin_path_matches_isin(spark):
    """Past 256 selected ids the exclusion switches from an isin literal
    to a broadcast anti-join — pin the two paths row-identical directly
    (running a 280-step greedy just to cross the threshold costs ~3 min;
    the branch condition is len(sel_ids), nothing else)."""
    from mongo_arrow_spark.operators import diversity as dv
    from mongo_arrow_spark.operators.diversity import _clean, _exclude

    rows = _rand_rows(21, 400)
    q = _clean(_mk(spark, rows), "vec_id", "embedding", 10_000, [])
    sel = list(range(0, 300))  # > 256 -> anti-join branch
    via_anti = {r["__id"] for r in _exclude(q, sel).collect()}
    via_isin = {r["__id"] for r in
                q.filter(~F.col("__id").isin(sel)).collect()}
    assert via_anti == via_isin == set(range(300, 400))
    # and the isin branch still serves small selections
    small = {r["__id"] for r in _exclude(q, [0, 1]).collect()}
    assert small == set(range(2, 400))


def test_hard_negatives_contract(spark):
    """Label exclusion, self exclusion, NULL/corrupt hygiene and the
    semi-hard max_qdot cut, against a hand-computable corpus."""
    from mongo_arrow_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),     # same label as anchor 0 — never mined
        (2, [0.8, 0.2], "b"),     # nearest cross-label
        (3, [0.0, 1.0], "b"),     # far cross-label
        (4, None, "b"),           # NULL vector — excluded
        (5, [0.7, None], "b"),    # NULL element — excluded
        (6, [0.6], "b"),          # wrong dim — excluded
        (7, [0.95, 0.05], None),  # NULL label — excluded
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    anchors = df.filter("vec_id = 0")
    out = hard_negatives(anchors, df, k=5, dim=2).collect()
    got = [(r["neg_id"], r["neg_rank"]) for r in out]
    assert got == [(2, 1), (3, 2)]  # only the two clean cross-label rows
    assert all(r["anchor_id"] == 0 and r["anchor_label"] == "a" for r in out)
    # qdot is the exact integer dot on the 1e-4 carrier
    qd = {r["neg_id"]: r["qdot"] for r in out}
    assert qd[2] == 10000 * 8000 + 0 * 2000
    # semi-hard cut: drop the too-similar row 2 (false-negative guard)
    cut = hard_negatives(anchors, df, k=5, dim=2, max_qdot=qd[2] - 1).collect()
    assert [(r["neg_id"], r["neg_rank"]) for r in cut] == [(3, 1)]


def test_hard_negatives_ivf_recall_on_clustered_corpus(spark):
    """The corpus×corpus IVF-routed form: on a 4-label clustered corpus
    recall@k >= 0.85 vs the brute oracle at the 8/4 default (measured
    0.92 — the docstring's number), exact score agreement on shared
    pairs, label/self exclusion intact, and the candidate join is an
    equi-join — no cartesian, no broadcast NLJ on the corpus side."""
    import random

    from mongo_arrow_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    rng = random.Random(7)
    dim, labels = 16, ["a", "b", "c", "d"]
    centers = {}
    for i, lbl in enumerate(labels):
        c = [0.0] * dim
        c[4 * i : 4 * i + 4] = [1.0, 0.8, -0.6, 0.5]
        centers[lbl] = c
    rows = []
    for vid in range(400):
        lbl = labels[vid % 4]
        vec = [x + rng.gauss(0.0, 0.08) for x in centers[lbl]]
        rows.append((vid, vec, lbl))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    brute = hard_negatives(emb, emb, k=3, dim=dim).collect()
    approx = hard_negatives_ivf(emb, emb, k=3, dim=dim)
    got = approx.collect()
    bset = {(r["anchor_id"], r["neg_id"]) for r in brute}
    aset = {(r["anchor_id"], r["neg_id"]) for r in got}
    assert len(aset & bset) / len(bset) >= 0.85
    bq = {(r["anchor_id"], r["neg_id"]): r["qdot"] for r in brute}
    for r in got:
        key = (r["anchor_id"], r["neg_id"])
        if key in bq:
            assert r["qdot"] == bq[key]
    lbl = {r[0]: r[2] for r in rows}
    for r in got:
        assert r["anchor_id"] != r["neg_id"]
        assert lbl[r["anchor_id"]] != lbl[r["neg_id"]]
    p = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p


def test_hard_negatives_ivf_uniform_data_dial(spark):
    """On UNIFORM-random vectors (no cluster structure) recall tracks
    the probed fraction — the docstring's honesty claim: n_probe is the
    dial, and probing every cell reproduces the brute result exactly."""
    from mongo_arrow_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)
    brute = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives(emb, emb, k=3).collect()
    }
    full = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives_ivf(
            emb, emb, k=3, n_clusters=8, n_probe=8
        ).collect()
    }
    assert full == brute  # n_probe == n_clusters: candidate set is total


def test_hard_negatives_ivf_foreign_label_anchor(spark):
    """An anchor whose label does not occur in the corpus must still
    mine: every corpus row is cross-label for it, so the IVF form must
    agree with the brute form instead of dropping the anchor whole
    (r9 review fix — the eligibility table is keyed by ANCHOR labels)."""
    from mongo_arrow_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    corpus = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(100)
    anchors = corpus.limit(3).withColumn(
        "label", F.lit(999_999).cast(corpus.schema["label"].dataType)
    )
    brute = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives(anchors, corpus, k=3).collect()
    }
    got = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives_ivf(
            anchors, corpus, k=3, n_clusters=4, n_probe=4
        ).collect()
    }
    assert got == brute  # full probe + foreign label == brute exactly
    assert len({a for a, *_ in got}) == 3  # no anchor dropped


def test_hard_negatives_ivf_per_label_probing_far_tight_cluster(spark):
    """probe_per_label=True (r10): the documented tight-cluster failure
    mode. The hardest negatives live in a FAR tight cluster (label c:
    same direction as the anchors, scaled — top dot product, but L2-far)
    while a nearer label (b) soaks up the whole global probe budget.
    Global ranking misses c entirely at small n_probe; per-label probing
    gives c its own budget and recovers the brute result. Exactness at
    n_probe == n_clusters must also hold for the per-label mode."""
    import random

    from mongo_arrow_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_ivf,
    )

    rng = random.Random(11)
    dim = 4
    rows = []
    vid = 0
    for _ in range(20):  # anchors: label a near [1,0,0,0]
        rows.append(
            (vid, [1.0 + rng.gauss(0, 0.01), rng.gauss(0, 0.01),
                   rng.gauss(0, 0.01), rng.gauss(0, 0.01)], "a")
        )
        vid += 1
    for _ in range(100):  # label b: L2-near, dot ~ 0 — the decoys
        rows.append(
            (vid, [rng.gauss(0, 0.05), 1.0 + rng.gauss(0, 0.3),
                   rng.gauss(0, 0.3), rng.gauss(0, 0.3)], "b")
        )
        vid += 1
    for _ in range(40):  # label c: far tight cluster, top dot product
        rows.append(
            (vid, [5.0 + rng.gauss(0, 0.01), rng.gauss(0, 0.01),
                   rng.gauss(0, 0.01), rng.gauss(0, 0.01)], "c")
        )
        vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    anchors = emb.filter(F.col("label") == "a")
    brute = {
        (r["anchor_id"], r["neg_id"])
        for r in hard_negatives(anchors, emb, k=3, dim=dim).collect()
    }

    def recall(per_label):
        got = {
            (r["anchor_id"], r["neg_id"])
            for r in hard_negatives_ivf(
                anchors, emb, k=3, dim=dim, n_clusters=8, n_probe=2,
                probe_per_label=per_label,
            ).collect()
        }
        return len(got & brute) / len(brute)

    r_global, r_per_label = recall(False), recall(True)
    assert r_per_label >= 0.95, (r_global, r_per_label)
    assert r_per_label > r_global, (r_global, r_per_label)
    # the dial still runs to exact in per-label mode
    full = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives_ivf(
            anchors, emb, k=3, dim=dim, n_clusters=8, n_probe=8,
            probe_per_label=True,
        ).collect()
    }
    brute_full = {
        (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
        for r in hard_negatives(anchors, emb, k=3, dim=dim).collect()
    }
    assert full == brute_full


def test_hard_negatives_ivf_auto_cell_count(spark):
    """n_clusters='auto' (r10): sizes the cell count to hold cell size
    constant — clamp(count/target_cell_rows, 8, 1024), the SCALE.md
    linear-work contract — and at the clamp floor reproduces the
    explicit n_clusters=8 result exactly."""
    from mongo_arrow_spark.operators.similarity import hard_negatives_ivf

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(200)

    def rows(**kw):
        return sorted(
            (r["anchor_id"], r["neg_id"], r["qdot"], r["neg_rank"])
            for r in hard_negatives_ivf(emb, emb, k=3, n_probe=4, **kw)
            .collect()
        )

    # 200 rows / target 256 -> floor clamp to 8 == explicit 8
    assert rows(n_clusters="auto") == rows(n_clusters=8)
    # a small target drives the count up: 200/16 = 13 cells — the run
    # must still produce k negatives per anchor (cells stay productive)
    got = rows(n_clusters="auto", target_cell_rows=16)
    assert len({a for a, *_ in got}) == 200
    assert all(rk <= 3 for *_, rk in got)
