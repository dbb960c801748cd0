"""Product quantization (r8 eleventh wave): deterministic PQ codebooks
over the quantized k-means, map-only encode, ADC top-k.

Everything is pinned by exact python replay (the model is bit-exact by
construction — kmeans_fit's cross-engine oracle covers the fit math);
these pin encode argmin semantics, ADC table lookups, determinism,
corrupt-vector codes, the artifact round-trip, and the IVF composition.
"""

import math

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.similarity import (
    PQModel,
    fit_pq,
    load_pq,
    pq_encode,
    pq_topk,
    save_pq,
)

from conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(emb):
    return fit_pq(emb, m=8, codes=8, iters=1)


def _quant(v, scale=10_000):
    return [int(math.floor(float(x) * scale + 0.5)) for x in v]


def _sqd(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def test_fit_shape_and_determinism(emb, model):
    assert model.m == 8 and model.k == 8 and model.dsub == 8
    again = fit_pq(emb.repartition(13), m=8, codes=8, iters=1)
    assert again.codebooks == model.codebooks


def test_encode_matches_python_argmin(emb, model):
    rows = pq_encode(emb, model).select("vec_id", "embedding", "pq_codes").collect()
    for r in rows[:100]:
        q = _quant(r["embedding"])
        for j in range(model.m):
            sub = q[j * 8:(j + 1) * 8]
            dists = [(_sqd(sub, c), i) for i, c in enumerate(model.codebooks[j])]
            assert r["pq_codes"][j] == min(dists)[1]


def test_topk_matches_python_adc(emb, model):
    qrow = emb.orderBy("vec_id").first()
    query = list(qrow["embedding"])
    got = [(r["vec_id"], r["pq_dist"]) for r in
           pq_topk(pq_encode(emb, model), model, query, k=10).collect()]
    # python replay over all encoded rows
    qq = _quant(query)
    table = [
        [_sqd(qq[j * 8:(j + 1) * 8], c) for c in model.codebooks[j]]
        for j in range(model.m)
    ]
    rows = pq_encode(emb, model).select("vec_id", "pq_codes").collect()
    scored = sorted(
        (sum(table[j][r["pq_codes"][j]] for j in range(model.m)), r["vec_id"])
        for r in rows if r["pq_codes"] is not None
    )
    want = [(i, d) for d, i in scored[:10]]
    assert got == want


def test_corrupt_vectors_get_null_codes(spark, model):
    df = spark.createDataFrame(
        [
            (1, [0.1] * 64),
            (2, None),
            (3, [0.1] * 32),          # wrong dim
            (4, [0.1] * 63 + [None]),  # NULL element
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["pq_codes"] for r in pq_encode(df, model).collect()}
    assert got[1] is not None and len(got[1]) == 8
    assert got[2] is None and got[3] is None and got[4] is None
    # and topk skips them
    assert {r["vec_id"] for r in
            pq_topk(pq_encode(df, model), model, [0.1] * 64, k=9).collect()} == {1}


def test_artifact_roundtrip(spark, model, tmp_path):
    path = str(tmp_path / "pq")
    save_pq(spark, model, path)
    back = load_pq(spark, path)
    assert back == model
    # non-artifact fails loudly
    spark.range(3).write.mode("overwrite").parquet(str(tmp_path / "junk"))
    with pytest.raises(ValueError, match="not a PQ artifact"):
        load_pq(spark, str(tmp_path / "junk"))


def test_validation(emb, model):
    with pytest.raises(ValueError, match="not divisible"):
        fit_pq(emb, m=7)
    with pytest.raises(ValueError, match="query dim"):
        pq_topk(pq_encode(emb, model), model, [0.1] * 32)


def test_plan_is_map_only_scan_plus_takeordered(emb, model):
    """The ADC scan touches (id, codes) only: no join, no exchange other
    than TakeOrdered's reduction, codebook tables ride as literals."""
    out = pq_topk(pq_encode(emb, model), model, [0.2] * 64, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_ivf_pq_full_probe_equals_pq(spark, emb, model):
    """n_probe >= n_clusters degrades exactly to whole-corpus ADC."""
    from mongo_arrow_spark.operators.similarity import ivf_pq_topk

    query = [0.15] * 64
    full = [(r["vec_id"], r["pq_dist"]) for r in
            pq_topk(pq_encode(emb, model), model, query, k=8).collect()]
    comp = [(r["vec_id"], r["pq_dist"]) for r in
            ivf_pq_topk(emb, model, query, k=8, n_clusters=4,
                        n_probe=4).collect()]
    assert comp == full


def test_ivf_pq_probe_subset_is_subset_of_corpus_scores(spark, emb, model):
    """Probing fewer cells returns rows whose ADC distances appear in
    the full ranking (routing only restricts candidates, never rescores)."""
    from mongo_arrow_spark.operators.similarity import ivf_pq_topk

    query = [0.15] * 64
    full = {r["vec_id"]: r["pq_dist"] for r in
            pq_topk(pq_encode(emb, model), model, query, k=500).collect()}
    got = ivf_pq_topk(emb, model, query, k=8, n_clusters=8, n_probe=2).collect()
    assert 0 < len(got) <= 8
    for r in got:
        assert full[r["vec_id"]] == r["pq_dist"]


def test_fit_dim_inferred_from_min_id_not_partition_order(spark, emb):
    """r8 review fix: dim inference is the min-id valid row, so results
    are partitioning-independent even with corrupt rows present."""
    from pyspark.sql import functions as F

    corrupt = spark.createDataFrame(
        [(10**9, [0.5] * 32)], "vec_id long, embedding array<float>"
    )
    df = emb.select("vec_id", "embedding").unionByName(corrupt)
    a = fit_pq(df, m=8, codes=4, iters=1)
    b = fit_pq(df.repartition(17), m=8, codes=4, iters=1)
    assert a.codebooks == b.codebooks and a.dim == 64


def test_ivf_pq_sample_tolerates_corrupt_rows(spark, emb, model):
    """r8 review fix: a NULL-element / wrong-dim vector inside the IVF
    fit sample window must not crash the driver pull."""
    from mongo_arrow_spark.operators.similarity import ivf_pq_topk

    bad = spark.createDataFrame(
        [(-1, [0.1] * 63 + [None]), (-2, [0.2] * 16)],
        "vec_id long, embedding array<float>",
    )
    df = emb.select("vec_id", "embedding").unionByName(bad)
    got = ivf_pq_topk(df, model, [0.15] * 64, k=5, n_clusters=4,
                      n_probe=4).collect()
    assert len(got) == 5
    assert all(r["vec_id"] >= 0 for r in got)


def test_load_pq_rejects_empty_and_incomplete(spark, model, tmp_path):
    import pyspark.sql.functions as F

    # empty artifact with the right shape
    p1 = str(tmp_path / "empty")
    save_pq(spark, model, p1)
    spark.read.parquet(p1).limit(0).write.mode("overwrite").parquet(p1 + "2")
    with pytest.raises(ValueError, match="empty"):
        load_pq(spark, p1 + "2")
    # missing one subspace's rows
    p2 = str(tmp_path / "partial")
    save_pq(spark, model, p2)
    spark.read.parquet(p2).filter(F.col("subspace") != 3).write.mode(
        "overwrite"
    ).parquet(p2 + "2")
    with pytest.raises(ValueError, match="incomplete"):
        load_pq(spark, p2 + "2")


# --------------------------------------- persisted IVF×PQ index (r9)


def test_ivf_pq_index_roundtrip_bit_exact(spark, emb, model, tmp_path):
    """r8 verdict item #3: probing the PERSISTED index returns the
    in-memory ivf_pq_topk result bit-for-bit (same model, n_clusters,
    seed → identical cells, codes, and ADC distances)."""
    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
        ivf_pq_topk,
    )

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(emb, path, model, n_clusters=8, seed=42)
    query = [0.15] * 64
    for n_probe in (1, 2, 8):
        mem = [
            (r["vec_id"], r["pq_dist"])
            for r in ivf_pq_topk(
                emb, model, query, k=8, n_clusters=8, n_probe=n_probe
            ).collect()
        ]
        idx = [
            (r["vec_id"], r["pq_dist"])
            for r in ivf_pq_index_topk(
                spark, path, query, k=8, n_probe=n_probe
            ).collect()
        ]
        assert idx == mem, f"n_probe={n_probe}"


def test_ivf_pq_index_probe_is_partition_pruning(spark, emb, model, tmp_path):
    """The probe must reach the scan as a PARTITION filter over
    ``__cell`` (directories, not rows), and the scan reads only
    (id, codes) — no vectors in the ReadSchema."""
    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
    )

    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(emb, path, model, n_clusters=8, seed=42)
    out = ivf_pq_index_topk(spark, path, [0.15] * 64, k=8, n_probe=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "__cell" in seg
    assert "embedding" not in plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_ivf_pq_index_corrupt_rows_parked_not_probed(spark, emb, model, tmp_path):
    """Corrupt vectors land in the hive default partition with NULL
    codes; probes never read them and results match the clean corpus."""
    import os

    from mongo_arrow_spark.operators.similarity import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
    )

    bad = spark.createDataFrame(
        [(990001, None), (990002, [0.1] * 3)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivfpq")
    build_ivf_pq_index(
        emb.select("vec_id", "embedding").unionByName(bad),
        path, model, n_clusters=8, seed=42,
    )
    assert any(
        "__HIVE_DEFAULT_PARTITION__" in d for d in os.listdir(path)
    )
    got = ivf_pq_index_topk(spark, path, [0.15] * 64, k=8, n_probe=8).collect()
    ids = {r["vec_id"] for r in got}
    assert ids.isdisjoint({990001, 990002}) and len(got) == 8
