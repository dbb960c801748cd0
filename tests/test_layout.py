"""Z-order layout: interleave math vs a DuckDB oracle, and the efficacy
contract — per-file value ranges shrink on EVERY clustered column
relative to a single-column sort, and a predicate on the non-sort column
prunes more files."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators import layout

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def grid(spark):
    """Two independent uniform dimensions — the workload Z-ordering
    exists for (a single-column sort can't help the other column)."""
    return (
        spark.range(4096)
        .withColumn("x", (F.col("id") * 2654435761) % 256)
        .withColumn("y", (F.col("id") * 40503) % 256)
        .select(F.col("id").cast("long"), F.col("x").cast("long"),
                F.col("y").cast("long"))
    )


def test_interleave_matches_duckdb_oracle(spark, grid):
    """The Morton key is engine-portable integer math: the identical
    shift-free formula in DuckDB reproduces every key bit-for-bit."""
    got = {
        r["id"]: r["z"]
        for r in grid.withColumn(
            "z", layout.interleave_bits(["x", "y"], bits=8)
        ).collect()
    }
    con = duckdb.connect()
    terms = " + ".join(
        f"((({c} // {1 << b}) % 2) * {1 << (b * 2 + i)})"
        for i, c in enumerate(("x", "y"))
        for b in range(8)
    )
    exp = {
        r[0]: r[1]
        for r in con.execute(
            f"""
            WITH g AS (
              SELECT i AS id, (i * 2654435761) % 256 AS x,
                     (i * 40503) % 256 AS y
              FROM range(4096) t(i))
            SELECT id, {terms} AS z FROM g
            """
        ).fetchall()
    }
    assert got == exp


def test_interleave_validation_and_nulls(spark):
    df = spark.createDataFrame(
        [(None, 3), (300, -5)], "x int, y int"
    )
    rows = df.withColumn(
        "z", layout.interleave_bits(["x", "y"], bits=4)
    ).collect()
    # NULL and out-of-range clamp instead of corrupting the curve:
    # (NULL→0, 3) and (300→15, -5→0)
    assert rows[0]["z"] == sum(
        ((3 >> b) & 1) << (2 * b + 1) for b in range(4)
    )
    assert rows[1]["z"] == sum(
        ((15 >> b) & 1) << (2 * b) for b in range(4)
    )
    with pytest.raises(ValueError):
        layout.interleave_bits(["x"], bits=4)
    with pytest.raises(ValueError):
        layout.interleave_bits(["x"] * 8, bits=16)


def test_quantile_ranks_equal_population(spark, grid):
    ranked, cuts = layout.quantile_ranks(grid, ["x"], bits=2)
    assert len(cuts["x"]) == 3
    counts = [
        r["count"]
        for r in ranked.groupBy("x__rank").count().orderBy("x__rank").collect()
    ]
    # 4 quantile buckets over a uniform column: roughly equal population
    assert len(counts) == 4
    assert max(counts) < 2 * min(counts)


def test_zorder_layout_shrinks_bounding_boxes(spark, grid, tmp_path):
    """THE efficacy claim. Write the same data (a) sorted by x only and
    (b) Z-ordered on (x, y), 16 files each; per-file [min, max] spans of
    y must shrink dramatically under (b), while x spans stay bounded —
    that is what makes min/max pruning fire on BOTH columns."""
    naive, zord = str(tmp_path / "naive"), str(tmp_path / "zord")
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(naive)
    )
    layout.write_zordered(grid, zord, ["x", "y"], bits=8, num_files=16)

    def mean_span(path, col):
        st = layout.file_stats(spark.read.parquet(path), [col])
        row = st.agg(
            F.avg(F.col(f"{col}_max") - F.col(f"{col}_min")).alias("s")
        ).first()
        return float(row["s"])

    y_naive, y_z = mean_span(naive, "y"), mean_span(zord, "y")
    x_naive, x_z = mean_span(naive, "x"), mean_span(zord, "x")
    # sorted-by-x leaves y unclustered: each file spans ~the full y range
    assert y_naive > 200
    # Z-order: both dimensions' per-file spans well under half the domain
    assert y_z < y_naive / 2
    assert x_z < 128
    # pruning proxy: files whose [min,max] intersects a 16-wide y slice
    def files_hit(path):
        st = layout.file_stats(spark.read.parquet(path), ["y"]).collect()
        return sum(1 for r in st if r["y_min"] <= 47 and r["y_max"] >= 32)

    assert files_hit(zord) < files_hit(naive)


def test_write_zordered_round_trips_rows(spark, grid, tmp_path):
    p = str(tmp_path / "z2")
    layout.write_zordered(grid, p, ["x", "y"], bits=6, num_files=4)
    back = spark.read.parquet(p)
    assert back.columns == grid.columns  # zkey dropped
    assert back.count() == grid.count()
    assert back.exceptAll(grid).count() == 0


def test_bucketed_join_no_exchange(spark, grid, tmp_path):
    """write_bucketed co-location contract: two tables bucketed on the
    same key join with ZERO exchange and zero extra sort — the plan a
    fact-fact join needs at 100 TB. Broadcast is disabled so the test
    exercises the SortMergeJoin path the layout optimizes."""
    spark.sql("DROP TABLE IF EXISTS zt_a")
    spark.sql("DROP TABLE IF EXISTS zt_b")
    layout.write_bucketed(
        grid, "zt_a", ["x"], num_buckets=8, path=str(tmp_path / "a")
    )
    layout.write_bucketed(
        grid.select("id", "x", (F.col("y") * 2).alias("y2")),
        "zt_b",
        ["x"],
        num_buckets=8,
        path=str(tmp_path / "b"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("zt_a").join(spark.table("zt_b"), "x")
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p
        assert "SortMergeJoin" in p
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS zt_a")
        spark.sql("DROP TABLE IF EXISTS zt_b")


def test_write_bucketed_validates(grid):
    with pytest.raises(ValueError):
        layout.write_bucketed(grid, "zt_bad", [])


def test_content_addressed_round_trip_and_plan(spark, tmp_path):
    """write/read_content_addressed: reconstruction is lossless (every
    (id, payload) row identical, duplicates restored), the payload table
    holds one row per DISTINCT payload ((NULL) ≠ ('') pinned), the
    reported dedup ratio matches, and reconstruction joins with ZERO
    exchange (both sides bucketed on the digest)."""
    rows = [
        (1, "same text", "en"),
        (2, "same text", "en"),   # exact dup of 1
        (3, "same text", "de"),   # same text, different lang → distinct
        (4, None, "en"),          # NULL payload
        (5, "", "en"),            # empty string ≠ NULL
        (6, "unique", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    for t in ("cas_payloads", "cas_manifest"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    stats = layout.write_content_addressed(
        df,
        "cas",
        ["text", "lang"],
        id_cols=["doc_id"],
        num_buckets=4,
        path=str(tmp_path / "cas"),
    )
    assert stats == {"n_rows": 6, "n_payloads": 5, "dedup_ratio": 1.2}
    back = layout.read_content_addressed(spark, "cas")
    got = {(r["doc_id"], r["text"], r["lang"]) for r in back.collect()}
    assert got == set(rows)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        p = (
            layout.read_content_addressed(spark, "cas")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in p
        assert "SortMergeJoin" in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in ("cas_payloads", "cas_manifest"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_content_addressed_validates(spark):
    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError):
        layout.write_content_addressed(df, "x", [])
    with pytest.raises(ValueError):
        layout.write_content_addressed(
            df, "x", ["text"], id_cols=["text"]
        )
