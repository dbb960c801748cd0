

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
