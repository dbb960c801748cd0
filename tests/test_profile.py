

# --- snapshot diff (r8) -----------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from mongo_arrow_spark.operators.profile import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a b"), (2, "c"), (3, "d e f"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a b"), (2, "c CHANGED"), (4, "now text"), (5, "fresh")],
        "doc_id long, text string",
    )
    got = {r["status"]: (r["n_docs"], r["tokens_old"], r["tokens_new"])
           for r in snapshot_diff(old, new).collect()}
    assert got["unchanged"] == (1, 2, 2)       # doc 1
    assert got["changed"][0] == 2              # doc 2 (text) + doc 4 (NULL->text)
    assert got["removed"] == (1, 3, 0)         # doc 3
    assert got["added"] == (1, 0, 1)           # doc 5
    # NULL old text counted as 0 tokens inside 'changed'
    assert got["changed"][1] == 1 and got["changed"][2] == 4


def test_snapshot_diff_identical_corpora(spark):
    from mongo_arrow_spark.operators.profile import snapshot_diff

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], "doc_id long, text string"
    )
    got = snapshot_diff(df, df).collect()
    assert len(got) == 1 and got[0]["status"] == "unchanged"
    assert got[0]["n_docs"] == 20


# --- numeric drift (r10) ----------------------------------------------------


def test_numeric_drift_integer_buckets_and_psi(spark):
    from mongo_arrow_spark.operators.profile import numeric_drift

    left = spark.createDataFrame(
        [(i,) for i in range(16)] + [(None,)], "x long"
    )
    right = spark.createDataFrame(
        [(i,) for i in range(8)], "x long"  # right lost the top half
    )
    rep = numeric_drift(left, right, "x", n_buckets=4).collect()
    rows = {r["bucket"]: r.asDict() for r in rep}
    # shared bounds 0..15, 4 buckets of 4 ints each; NULL excluded
    assert sorted(rows) == [0, 1, 2, 3]
    assert [rows[b]["n_left"] for b in range(4)] == [4, 4, 4, 4]
    assert [rows[b]["n_right"] for b in range(4)] == [4, 4, 0, 0]
    assert rows[0]["frac_left"] == 0.25 and rows[0]["frac_right"] == 0.5
    # PSI sums positive on a real shift; empty-bucket terms are finite
    total = sum(r["psi_term"] for r in rep)
    assert total > 0.1
    assert all(r["psi_term"] == r["psi_term"] for r in rep)  # no NaN


def test_numeric_drift_identical_sides_is_zero(spark):
    from mongo_arrow_spark.operators.profile import numeric_drift

    df = spark.createDataFrame([(i,) for i in range(32)], "x long")
    rep = numeric_drift(df, df, "x", n_buckets=8).collect()
    assert all(abs(r["psi_term"]) < 1e-12 for r in rep)
    assert all(r["n_left"] == r["n_right"] == 4 for r in rep)


def test_numeric_drift_explicit_bounds_and_fractional(spark):
    from mongo_arrow_spark.operators.profile import numeric_drift

    left = spark.createDataFrame(
        [(0.0,), (0.5,), (1.0,)], "x double"
    )
    right = spark.createDataFrame([(1.0,)], "x double")
    rep = numeric_drift(
        left, right, "x", n_buckets=2, bounds=(0.0, 1.0)
    ).collect()
    rows = {r["bucket"]: r.asDict() for r in rep}
    # x == hi clamps into the last bucket
    assert rows[1]["n_left"] == 2 and rows[1]["n_right"] == 1
    assert rows[0]["n_right"] == 0
    # out-of-bounds values clamp instead of vanishing
    wide = spark.createDataFrame([(-5.0,), (9.0,)], "x double")
    rep2 = numeric_drift(
        wide, wide, "x", n_buckets=2, bounds=(0.0, 1.0)
    ).collect()
    assert {r["bucket"] for r in rep2} == {0, 1}


def test_numeric_drift_single_value_span(spark):
    from mongo_arrow_spark.operators.profile import numeric_drift

    df = spark.createDataFrame([(7,), (7,)], "x long")
    rep = numeric_drift(df, df, "x", n_buckets=4).collect()
    assert len(rep) == 1 and rep[0]["bucket"] == 0
    with __import__("pytest").raises(ValueError):
        numeric_drift(df, df, "x", n_buckets=0)
