"""Time-series operator units: downsample fill modes and grid shape
(the battery entry ts_downsample pins the zero-fill form against a
generate_series DuckDB oracle; these pin locf and the grid contract)."""

import datetime

from pyspark.sql import functions as F

from mongo_arrow_spark.operators.timeseries import downsample


def _series(spark):
    base = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        # key "a": hours 0, 1, 4 (gap at 2, 3)
        ("a", base, 10.0),
        ("a", base + datetime.timedelta(hours=1), 20.0),
        ("a", base + datetime.timedelta(hours=4), 40.0),
        # key "b": hours 0, 2 (gap at 1)
        ("b", base, 1.0),
        ("b", base + datetime.timedelta(hours=2), 3.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def test_downsample_no_fill_only_populated_buckets(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"n": F.count(F.lit(1)).cast("long"), "s": F.sum("v")},
    ).orderBy("k", "bucket").collect()
    assert [(r["k"], r["bucket"].hour, r["n"], r["s"]) for r in out] == [
        ("a", 0, 1, 10.0), ("a", 1, 1, 20.0), ("a", 4, 1, 40.0),
        ("b", 0, 1, 1.0), ("b", 2, 1, 3.0),
    ]


def test_downsample_zero_fill_densifies_per_key(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"s": F.sum("v")}, fill="zero",
    ).orderBy("k", "bucket").collect()
    a = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "a"]
    b = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "b"]
    assert a == [(0, 10.0), (1, 20.0), (2, 0.0), (3, 0.0), (4, 40.0)]
    assert b == [(0, 1.0), (1, 0.0), (2, 3.0)]  # grid spans per key


def test_downsample_locf_fill_carries_gauges(spark):
    out = downsample(
        _series(spark), ts_col="ts", every="1 hour", keys=["k"],
        aggs={"s": F.sum("v")}, fill="locf",
    ).orderBy("k", "bucket").collect()
    a = [(r["bucket"].hour, r["s"]) for r in out if r["k"] == "a"]
    assert a == [(0, 10.0), (1, 20.0), (2, 20.0), (3, 20.0), (4, 40.0)]


def test_downsample_rejects_bad_fill(spark):
    import pytest

    with pytest.raises(ValueError, match="fill"):
        downsample(_series(spark), fill="interpolate")


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _mk_range_frames(spark):
    points = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 00:10:00")),
         (2, "u", _ts("2024-01-01 01:59:59.999999")),
         (3, "u", _ts("2024-01-01 02:00:00")),
         (4, "v", _ts("2024-01-01 00:10:00")),
         (5, "u", _ts("2024-01-05 00:00:00"))],
        "pid long, user string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, "u", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 02:00:00")),
         (11, "u", _ts("2024-01-01 01:30:00"), _ts("2024-01-01 03:00:00")),
         (12, "v", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 00:30:00"))],
        "iid long, user string, start timestamp, end timestamp",
    )
    return points, intervals


def test_range_join_exact_pairs_and_end_exclusive(spark):
    """r8 range_join: every (point, interval) with start <= ts < end and
    matching key, each produced exactly once; end is exclusive."""
    from mongo_arrow_spark.operators.timeseries import range_join

    points, intervals = _mk_range_frames(spark)
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(
            points, intervals, point_ts="ts", by="user",
            bucket_seconds=3600,
        ).collect()
    )
    # pid2 at 01:59:59.999999 is inside both windows; pid3 at exactly
    # 02:00 is EXCLUDED from iid10 (end exclusive) but inside iid11;
    # pid5 matches nothing; keys isolate u/v
    assert got == [(1, 10), (2, 10), (2, 11), (3, 11), (4, 12)]


def test_range_join_bucket_size_invariance(spark):
    """The bucket width is a performance dial, never a semantics dial."""
    from mongo_arrow_spark.operators.timeseries import range_join

    points, intervals = _mk_range_frames(spark)
    expect = None
    for bs in (60, 1800, 86_400):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                points, intervals, point_ts="ts", by="user",
                bucket_seconds=bs,
            ).collect()
        )
        expect = expect or got
        assert got == expect, f"bucket_seconds={bs} changed the result"


def test_range_join_left_keeps_unmatched_points(spark):
    from mongo_arrow_spark.operators.timeseries import range_join

    points, intervals = _mk_range_frames(spark)
    out = range_join(
        points, intervals, point_ts="ts", by="user", how="left"
    )
    rows = {(r["pid"], r["iid"]) for r in out.collect()}
    assert (5, None) in rows
    assert out.count() == 6  # 5 matches + 1 unmatched


def test_range_join_rejects_column_clash_and_bad_how(spark):
    import pytest as _pytest

    from mongo_arrow_spark.operators.timeseries import range_join

    points, intervals = _mk_range_frames(spark)
    with _pytest.raises(ValueError, match="disjoint"):
        range_join(points, intervals.withColumnRenamed("iid", "pid"),
                   point_ts="ts", by="user")
    with _pytest.raises(ValueError, match="how"):
        range_join(points, intervals, point_ts="ts", by="user", how="outer")


def test_range_join_no_nested_loop_plan(spark):
    """The whole point vs a raw inequality join: candidates come from an
    equi-join on (key, epoch) — no BroadcastNestedLoopJoin/cartesian."""
    from mongo_arrow_spark.operators.timeseries import range_join

    points, intervals = _mk_range_frames(spark)
    plan = (
        range_join(points, intervals, point_ts="ts", by="user")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_empty_and_inverted_intervals(spark):
    from mongo_arrow_spark.operators.timeseries import range_join

    points, _ = _mk_range_frames(spark)
    bad = spark.createDataFrame(
        [(20, "u", _ts("2024-01-01 01:00:00"), _ts("2024-01-01 01:00:00")),
         (21, "u", _ts("2024-01-01 02:00:00"), _ts("2024-01-01 01:00:00"))],
        "iid long, user string, start timestamp, end timestamp",
    )
    assert range_join(points, bad, point_ts="ts", by="user").count() == 0


def test_range_join_streaming_inner_matches_batch(spark, tmp_path):
    """r8: inner range_join is a projection + stream-static equi-join +
    filter — append-legal as-is. Streaming points joined to a STATIC
    interval table equal the batch result on a finite replay."""
    import json as _json
    import uuid as _uuid

    from mongo_arrow_spark.operators.timeseries import range_join
    from mongo_arrow_spark.streaming import read_document_stream

    points, intervals = _mk_range_frames(spark)
    d = tmp_path / "points_stream"
    d.mkdir()
    rows = points.collect()
    for i, chunk in enumerate((rows[:2], rows[2:])):
        with open(d / f"b{i}.jsonl", "w") as fh:
            for r in chunk:
                fh.write(_json.dumps(
                    {"pid": r["pid"], "user": r["user"],
                     "ts": r["ts"].isoformat(sep=" ")}) + "\n")

    stream = read_document_stream(
        spark, str(d), "pid long, user string, ts timestamp"
    )
    out = range_join(stream, intervals, point_ts="ts", by="user")
    name = f"t_{_uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["pid"], r["iid"]) for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    want = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, point_ts="ts", by="user").collect()
    )
    assert got == want


def test_range_join_randomized_differential_vs_duckdb(spark):
    """Seeded random frames: range_join's pair set must equal DuckDB's
    native inequality join exactly, across bucket widths (including
    widths far smaller and larger than the interval spans)."""
    import random

    import duckdb

    from mongo_arrow_spark.operators.timeseries import range_join

    rng = random.Random(8)
    base = datetime.datetime(2024, 1, 1)
    points = [
        (i, f"k{rng.randrange(4)}",
         base + datetime.timedelta(seconds=rng.randrange(0, 200_000)))
        for i in range(300)
    ]
    intervals = []
    for j in range(80):
        s = base + datetime.timedelta(seconds=rng.randrange(0, 200_000))
        intervals.append(
            (1000 + j, f"k{rng.randrange(4)}", s,
             s + datetime.timedelta(seconds=rng.randrange(1, 20_000)))
        )
    pdf = spark.createDataFrame(points, "pid long, k string, ts timestamp")
    idf = spark.createDataFrame(
        intervals, "iid long, k string, start timestamp, end timestamp"
    )
    con = duckdb.connect()
    con.register("p", pdf.toPandas())
    con.register("iv", idf.toPandas())
    want = sorted(
        tuple(r) for r in con.execute(
            "SELECT pid, iid FROM p JOIN iv ON p.k = iv.k "
            "AND p.ts >= iv.start AND p.ts < iv.end"
        ).fetchall()
    )
    assert want  # the fixture must actually produce matches
    for bs in (600, 3600, 50_000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                pdf, idf, point_ts="ts", by="k", bucket_seconds=bs
            ).collect()
        )
        assert got == want, f"bucket_seconds={bs}"


def test_range_join_left_null_attribute_not_duplicated(spark):
    """r8 review fix: a matched point carrying a NULL attribute must not
    be re-emitted as a spurious unmatched row (the anti-join is
    null-safe)."""
    from mongo_arrow_spark.operators.timeseries import range_join

    points = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01 00:10:00"), None),
         (2, "u", _ts("2024-01-05 00:10:00"), None)],
        "pid long, user string, ts timestamp, val double",
    )
    intervals = spark.createDataFrame(
        [(10, "u", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"))],
        "iid long, user string, start timestamp, end timestamp",
    )
    out = range_join(points, intervals, point_ts="ts", by="user", how="left")
    rows = sorted((r["pid"], r["iid"]) for r in out.collect())
    assert rows == [(1, 10), (2, None)]
