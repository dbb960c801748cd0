"""html_meta (r14): page-metadata extraction cases — attribute orders,
quote pairing, cross-tag confinement, NULL handling, plan contract."""

from pyspark.sql import functions as F

from conftest import SF_DIR  # noqa: F401  (spark fixture wiring)


def _meta(spark, html):
    from mongo_arrow_spark.operators.text import html_meta

    df = spark.createDataFrame([(html,)], "payload string")
    return df.select(html_meta("payload").alias("m")).first()["m"]


def test_html_meta_fields_and_orders(spark):
    m = _meta(
        spark,
        '<html lang="EN-gb"><head><title> A \n  B </title>'
        '<meta name="description" content="d1">'
        '<meta content="t1" property="og:title">'
        "<meta property='og:description' content='d2'></head>",
    )
    assert (m["title"], m["description"], m["og_title"],
            m["og_description"], m["lang"]) == ("A B", "d1", "t1", "d2", "en-gb")


def test_html_meta_no_cross_tag_gluing(spark):
    """r14 design point: with a TRAILING key constraint, an unbounded
    value regex could backtrack across '>' and glue two meta tags —
    a description meta must not swallow the og:title after it."""
    m = _meta(
        spark,
        '<meta name="description" content="sum">'
        '<meta content="OG" property="og:title">',
    )
    assert m["description"] == "sum" and m["og_title"] == "OG"


def test_canonical_target_no_cross_tag_gluing(spark):
    """Same confinement for canonical_target's href-first form: a
    stylesheet link must not swallow the canonical tag after it."""
    from mongo_arrow_spark.operators.url import canonical_target

    df = spark.createDataFrame(
        [('<link href="/style.css" rel="stylesheet">'
          '<link href="https://a/real" rel="canonical">',)],
        "payload string",
    )
    assert df.select(canonical_target("payload").alias("c")).first()["c"] == (
        "https://a/real"
    )


def test_html_meta_absent_null_and_noise(spark):
    m = _meta(spark, "<p>no metadata at all</p>")
    assert all(m[k] is None for k in
               ("title", "description", "og_title", "og_description", "lang"))
    from mongo_arrow_spark.operators.text import html_meta

    df = spark.createDataFrame([(None,)], "payload string")
    assert df.select(html_meta("payload").alias("m")).first()["m"] is None
    # data- boundary: data-name= / a non-og property must not match
    m2 = _meta(
        spark,
        '<meta data-name="description" content="no">'
        '<meta property="not:og:title" content="no">'
        '<meta name="description" content="yes">',
    )
    assert m2["description"] == "yes" and m2["og_title"] is None


def test_html_meta_quote_pairing_and_first_wins(spark):
    m = _meta(
        spark,
        "<title>it's first</title><title>second</title>"
        '<meta name="description" content="it\'s fine">',
    )
    assert m["title"] == "it's first"
    assert m["description"] == "it's fine"


def test_html_meta_udf_free_map_only(spark):
    from mongo_arrow_spark.operators.text import html_meta

    df = spark.createDataFrame([("<title>x</title>",)], "payload string")
    plan = (
        df.select(html_meta("payload"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan
