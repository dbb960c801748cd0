"""BSON-type codec function tests."""

import datetime as dt

from pyspark.sql import functions as F

from mongo_arrow_spark import functions as bf


def test_objectid_roundtrip(spark):
    oid = "65a1b2c3d4e5f6a7b8c9d0e1"
    df = spark.createDataFrame([(oid,)], "h string")
    out = df.select(
        bf.objectid_hex(bf.objectid_from_hex(F.col("h"))).alias("rt"),
        bf.objectid_timestamp(bf.objectid_from_hex(F.col("h"))).alias("ts"),
    ).first()
    assert out["rt"] == oid
    assert out["ts"] == dt.datetime.utcfromtimestamp(0x65A1B2C3)


def test_objectid_generate_sorts(spark):
    df = spark.range(5).select(bf.objectid_generate("id").alias("oid"), "id")
    rows = df.orderBy("oid").collect()
    assert [r["id"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(len(r["oid"]) == 12 for r in rows)


def test_binary_subtype_carrier(spark):
    df = spark.createDataFrame([(b"payload",)], "b binary")
    tagged = df.select(bf.binary_with_subtype("b", 10).alias("t"))
    out = tagged.select(
        bf.binary_subtype("t").alias("st"), bf.binary_payload("t").alias("p")
    ).first()
    assert out["st"] == 10
    assert bytes(out["p"]) == b"payload"


def test_decimal128(spark):
    df = spark.createDataFrame([(1.5,)], "x double")
    out = df.select(bf.decimal128("x").alias("d"))
    assert out.schema["d"].dataType.simpleString() == "decimal(38,6)"


# ------------------------------------------------------ Python UDTFs (§2.E)


def test_udtf_unwind_matches_explode_plan(spark, tables):
    """The UDTF extension point's document-exploding example must be
    row-identical to the explode plan the engine compiles $unwind to
    (mql/pipeline.py:519) — includeArrayIndex semantics and all."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    docs = (
        tables["documents"]
        .limit(40)
        .select("doc_id", F.split("text", " ").alias("words"))
    )
    docs.createOrReplaceTempView("udtf_docs")
    exploded = docs.select(
        "doc_id", F.posexplode("words").alias("pos", "element")
    )
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, u.pos, u.element
        FROM udtf_docs d, LATERAL unwind_json(to_json(d.words)) u
        """
    )
    a = sorted(map(tuple, exploded.collect()))
    b = sorted(map(tuple, via_udtf.collect()))
    assert a == b and a


def test_udtf_word_ngrams_lateral(spark, tables):
    from mongo_arrow_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    one = tables["documents"].limit(1)
    one.createOrReplaceTempView("udtf_one")
    text = one.first()["text"]
    words = text.split()
    want = sorted(
        " ".join(words[i : i + 3]) for i in range(len(words) - 2)
    )
    got = sorted(
        r["gram"]
        for r in spark.sql(
            "SELECT g.gram FROM udtf_one d, LATERAL word_ngrams(d.text, 3) g"
        ).collect()
    )
    assert got == want and got


def test_udtf_null_and_scalar_inputs_yield_no_rows(spark):
    from mongo_arrow_spark.functions.udtf import UnwindJson

    df = spark.createDataFrame(
        [(1, None), (2, "[]"), (3, '"scalar"'), (4, '["a","b"]')],
        "id int, payload string",
    )
    out = df.lateralJoin(
        UnwindJson(__import__("pyspark.sql.functions", fromlist=["col"]).col(
            "payload"
        ).outer())
    )
    rows = [(r["id"], r["pos"], r["element"]) for r in out.collect()]
    assert sorted(rows) == [(4, 0, "a"), (4, 1, "b")]


def test_udtf_arrow_variant_matches_plain(spark, tables):
    """use_arrow=True registers Arrow-optimized UDTFs with identical
    output (the batched-crossing lever, same as pandas UDFs)."""
    from pyspark.sql import functions as F

    from mongo_arrow_spark.functions.udtf import register_udtfs

    docs = (
        tables["documents"]
        .limit(25)
        .select("doc_id", F.to_json(F.split("text", " ")).alias("payload"))
    )
    docs.createOrReplaceTempView("udtf_arrow_docs")
    q = ("SELECT d.doc_id, u.pos, u.element FROM udtf_arrow_docs d, "
         "LATERAL unwind_json(d.payload) u")
    register_udtfs(spark)
    plain = sorted(map(tuple, spark.sql(q).collect()))
    register_udtfs(spark, use_arrow=True)
    arrow = sorted(map(tuple, spark.sql(q).collect()))
    assert plain == arrow and plain
