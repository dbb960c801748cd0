"""Deterministic quantized k-means (r8 sixth wave).

The exact cross-engine semantics are pinned by the ``cluster_kmeans``
DuckDB oracle (unrolled Lloyd iterations, tests/test_battery.py); these
pin what the oracle can't see: partitioning-independence, the
empty-cluster contract, NULL-vector handling, the artifact round-trip,
and that assignment actually minimizes the quantized distance (numpy
replay).
"""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.clustering import (
    KMeansModel,
    kmeans_assign,
    kmeans_fit,
    load_kmeans,
    save_kmeans,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_fit_deterministic_under_repartitioning(emb):
    a = kmeans_fit(emb, k=4, iters=2)
    b = kmeans_fit(emb.repartition(13), k=4, iters=2)
    assert a.centroids == b.centroids


def test_assignment_minimizes_quantized_distance(emb):
    """Numpy replay: every row's cluster is the argmin (ties → lowest
    index) of the integer squared distance to the model centroids."""
    import numpy as np

    m = kmeans_fit(emb, k=3, iters=1)
    rows = kmeans_assign(emb, m).select("vec_id", "embedding", "cluster").collect()
    cents = np.array(m.centroids, dtype=np.int64)
    for r in rows[:200]:
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 10_000 + 0.5).astype(
            np.int64
        )
        dists = ((cents - q) ** 2).sum(axis=1)
        assert r["cluster"] == int(np.argmin(dists))


def test_iters_zero_assigns_against_init(emb):
    m = kmeans_fit(emb, k=4, iters=0)
    assert m.k == 4 and m.iters == 0
    assert kmeans_assign(emb, m).filter(F.col("cluster").isNull()).count() == 0


def test_null_vector_gets_null_cluster(spark, emb):
    m = kmeans_fit(emb, k=2, iters=1)
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, None)], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, m).collect()}
    assert got[2] is None and got[1] is not None


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two far-apart points, k=2, but both init centroids... force the
    empty-cluster path with k=2 over two identical points: one cluster
    captures both, the other must keep its init centroid unchanged."""
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    m = kmeans_fit(df, k=2, iters=2)
    # both points are identical → one centroid is their mean, and the
    # OTHER survived every iteration untouched (it started as the same
    # quantized point, so both end at [10000, 10000])
    assert m.centroids[0] == [10000, 10000]
    assert m.centroids[1] == [10000, 10000]
    # ties resolve to the lowest cluster index
    out = kmeans_assign(df, m)
    assert {r["cluster"] for r in out.collect()} == {0}


def test_k_exceeding_rows_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fit(df, k=5, iters=1)


def test_artifact_round_trip(spark, emb, tmp_path):
    m = kmeans_fit(emb, k=4, iters=2)
    path = str(tmp_path / "kmeans_model")
    save_kmeans(spark, m, path)
    m2 = load_kmeans(spark, path)
    assert m2 == m
    a = {(r["vec_id"], r["cluster"]) for r in kmeans_assign(emb, m).collect()}
    b = {(r["vec_id"], r["cluster"]) for r in kmeans_assign(emb, m2).collect()}
    assert a == b


def test_load_rejects_foreign_parquet(spark, tmp_path):
    path = str(tmp_path / "not_a_model")
    spark.createDataFrame([(1, [1])], "cluster long, centroid array<long>").write.parquet(
        path
    )
    with pytest.raises(ValueError, match="not a save_kmeans artifact"):
        load_kmeans(spark, path)


def test_assignment_plan_is_map_only(emb):
    """The 100 TB contract: assignment must compile the centroids into
    the plan — no join, no exchange anywhere in the assign projection."""
    m = kmeans_fit(emb, k=4, iters=1)
    plan = kmeans_assign(emb, m)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_semantic_dedup_with_kmeans_cells(emb):
    """SemDeDup over deterministic k-means cells: reproducible under
    repartitioning, survivors have no surviving near-dup pair, and the
    cell swap changes only candidate generation (any pair found is
    still cosine-verified)."""
    from mongo_arrow_spark.operators.dedup import (
        semantic_dedup,
        semantic_dedup_pairs,
    )

    m = kmeans_fit(emb, k=8, iters=2)
    pairs = semantic_dedup_pairs(emb, threshold=0.2, kmeans_model=m)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    got2 = {
        (r["id_a"], r["id_b"])
        for r in semantic_dedup_pairs(
            emb.repartition(11), threshold=0.2, kmeans_model=m
        ).collect()
    }
    assert got == got2
    assert all(a < b for a, b in got)
    surv = semantic_dedup(emb, threshold=0.2, kmeans_model=m)
    ids = {r["vec_id"] for r in surv.select("vec_id").collect()}
    # no surviving pair: for every found pair, the bigger id is gone
    assert not any(a in ids and b in ids for a, b in got)


def test_null_element_and_dim_mismatch_get_null_cluster(spark, emb):
    """r8 review fix: a vector with a NULL element or the wrong
    dimensionality must NOT silently land in cluster 0 (NULL distances
    win nulls-first struct ordering otherwise)."""
    m = kmeans_fit(emb, k=2, iters=1)
    bad = spark.createDataFrame(
        [
            (1, [0.1] * 64),
            (2, [0.1] * 63 + [None]),
            (3, [0.1] * 32),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(bad, m).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None


def test_fit_ignores_corrupt_and_mismatched_rows(spark):
    """Corrupt rows must not poison the centroid statistics: fitting
    with and without them yields identical centroids."""
    clean = [(i, [float(i % 3), float(i % 5)]) for i in range(1, 21)]
    df_clean = spark.createDataFrame(
        clean, "vec_id long, embedding array<float>"
    )
    corrupt = clean + [
        (100, None),
        (101, [1.0, None]),
        (102, [1.0, 2.0, 3.0]),
    ]
    df_corrupt = spark.createDataFrame(
        corrupt, "vec_id long, embedding array<float>"
    )
    a = kmeans_fit(df_clean, k=2, iters=2)
    b = kmeans_fit(df_corrupt, k=2, iters=2)
    assert a.centroids == b.centroids


def test_load_rejects_parquet_without_model_columns(spark, tmp_path):
    path = str(tmp_path / "totally_foreign")
    spark.createDataFrame([(1, "x")], "a long, b string").write.parquet(path)
    with pytest.raises(ValueError, match="not a save_kmeans artifact"):
        load_kmeans(spark, path)


def test_kmeans_assign_streaming_parity(spark, emb, tmp_path):
    """Assignment is a map-only projection over a prefit model —
    append-legal, so it runs unchanged inside a stream. One-batch finite
    replay == batch assignment exactly (the Bloom rowwise-probe /
    score_token_logodds precedent). Model-refresh semantics: the
    centroid literals are compiled into the plan at stream START —
    swapping the model requires a stream restart, unlike broadcast-join
    scorers which re-resolve their static side per micro-batch."""
    import json as _json
    import uuid as _uuid

    from mongo_arrow_spark.streaming import read_document_stream

    m = kmeans_fit(emb, k=4, iters=1)

    d = tmp_path / "emb_stream"
    d.mkdir()
    with open(d / "batch-0.jsonl", "w") as fh:
        for r in emb.select("vec_id", "embedding").collect():
            fh.write(
                _json.dumps(
                    {"vec_id": r["vec_id"], "embedding": list(r["embedding"])}
                )
                + "\n"
            )

    stream = read_document_stream(
        spark, str(d), "vec_id bigint, embedding array<float>"
    )
    assigned = kmeans_assign(stream, m).select("vec_id", "cluster")
    name = f"t_{_uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE TABLE {name} (vec_id bigint, cluster bigint) USING parquet")
    q = (
        assigned.writeStream.foreachBatch(
            lambda b, _i: b.write.insertInto(name)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["vec_id"], r["cluster"]) for r in spark.table(name).collect()}
    want = {
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb, m).select("vec_id", "cluster").collect()
    }
    assert got == want
    spark.sql(f"DROP TABLE {name}")


# --------------------------------------------------- random projection


def test_random_projection_deterministic_and_exact(emb):
    """Seeded JL projection: partitioning-independent, and a numpy
    replay of the md5-derived ±1 matrix reproduces it bit-for-bit."""
    import hashlib

    import numpy as np

    from mongo_arrow_spark.operators.clustering import random_projection

    out = random_projection(emb, out_dim=4, seed="t")
    a = {r["vec_id"]: list(r["proj"]) for r in out.select("vec_id", "proj").collect()}
    b = {
        r["vec_id"]: list(r["proj"])
        for r in random_projection(emb.repartition(9), out_dim=4, seed="t")
        .select("vec_id", "proj")
        .collect()
    }
    assert a == b
    signs = np.array(
        [
            [
                1 if int(hashlib.md5(f"t:{i}:{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
                for j in range(4)
            ]
            for i in range(64)
        ],
        dtype=np.int64,
    )
    for r in emb.select("vec_id", "embedding").limit(50).collect():
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * 10_000 + 0.5).astype(np.int64)
        assert list(q @ signs) == a[r["vec_id"]]


def test_random_projection_null_and_plan_contracts(spark, emb):
    from mongo_arrow_spark.operators.clustering import random_projection

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None), (3, [0.5] * 63 + [None]), (4, [0.5] * 8)],
        "vec_id long, embedding array<float>",
    )
    # dim taken from the first non-null row (64): short/corrupt rows → NULL
    got = {r["vec_id"]: r["proj"] for r in random_projection(df, out_dim=2).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None and got[4] is None
    plan = (
        random_projection(emb, out_dim=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_projected_kmeans_composes(emb):
    """The documented recipe: project 64→8 then cluster with scale=1 —
    deterministic end to end."""
    from mongo_arrow_spark.operators.clustering import random_projection

    proj = random_projection(emb, out_dim=8)
    m = kmeans_fit(proj, k=4, iters=2, vec_col="proj", scale=1)
    m2 = kmeans_fit(proj.repartition(7), k=4, iters=2, vec_col="proj", scale=1)
    assert m.centroids == m2.centroids
    out = kmeans_assign(proj, m, vec_col="proj")
    assert out.filter(F.col("cluster").isNull()).count() == 0


def test_random_projection_explicit_dim_pins_corrupt_corpora(spark):
    """r8 review fix: with mixed-length vectors, dim= makes the valid
    set partitioning-independent (first()-inference is arbitrary)."""
    from mongo_arrow_spark.operators.clustering import random_projection

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 63), (3, [0.5] * 64)],
        "vec_id long, embedding array<float>",
    )
    for reparted in (df, df.repartition(5)):
        got = {
            r["vec_id"]: r["proj"]
            for r in random_projection(reparted, out_dim=2, dim=64).collect()
        }
        assert got[2] is None
        assert got[1] is not None and got[1] == got[3]


def test_literal_codebook_bound_is_loud(spark):
    """r8 verdict "what's wrong #2": a k=4096 x d=768 flat codebook
    would stall codegen for minutes — kmeans_assign/pq_encode must
    refuse past the documented literal-cell bound with a pointer to
    the IVF/PQ decomposition."""
    import pytest as _pytest

    from mongo_arrow_spark.operators.clustering import (
        KMeansModel,
        kmeans_assign,
    )

    big = KMeansModel(
        centroids=[[0] * 768] * 4096, scale=10_000, iters=0
    )
    df = spark.createDataFrame(
        [(1, [0.0] * 768)], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="literal-compile bound"):
        kmeans_assign(df, big).collect()
