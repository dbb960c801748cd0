"""Decode-edge parity with the reference's layer-2 unit tests: corrupt /
truncated input (test_bson.py:83-99), non-ASCII field names
(test_bson.py:110-125), and concurrent reads of one source
(test_arrow.py:1238-1259) — recast for the JSON-lines document source."""

from __future__ import annotations

import json
from concurrent.futures import ThreadPoolExecutor

import pytest

from mongo_arrow_spark.sources import register
from mongo_arrow_spark.sources.documents import infer_schema
from mongo_arrow_spark.errors import SchemaError


def _write(path, lines):
    with open(path, "w", encoding="utf-8") as fh:
        for l in lines:
            fh.write(l + "\n")
    return str(path)


def _read(spark, path, **options):
    register(spark)
    r = spark.read.format("documents")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def test_corrupt_line_fails_by_default(spark, tmp_path):
    p = _write(tmp_path / "c.jsonl", ['{"a": 1}', '{"a": 2', '{"a": 3}'])
    with pytest.raises(Exception) as exc:
        _read(spark, p, declaredSchema="a bigint").collect()
    assert "corrupt document line" in str(exc.value)


def test_corrupt_line_dropped_on_request(spark, tmp_path):
    p = _write(
        tmp_path / "c.jsonl",
        ['{"a": 1}', '{"a": 2', "[1, 2, 3]", '"scalar"', '{"a": 3}'],
    )
    got = _read(spark, p, declaredSchema="a bigint", corruptMode="drop")
    assert sorted(r["a"] for r in got.collect()) == [1, 3]


def test_corrupt_bytes_dropped(spark, tmp_path):
    p = tmp_path / "b.jsonl"
    with open(p, "wb") as fh:
        fh.write(b'{"a": 1}\n')
        fh.write(b'{"a": \xff\xfe}\n')  # invalid UTF-8
        fh.write(b'{"a": 2}\n')
    got = _read(spark, str(p), declaredSchema="a bigint", corruptMode="drop")
    assert sorted(r["a"] for r in got.collect()) == [1, 2]


def test_corrupt_mode_validated(spark, tmp_path):
    p = _write(tmp_path / "v.jsonl", ['{"a": 1}'])
    with pytest.raises(Exception) as exc:
        _read(spark, p, declaredSchema="a bigint", corruptMode="ignore").collect()
    assert "corruptMode" in str(exc.value)


def test_infer_schema_skips_corrupt_when_dropping(tmp_path):
    p = _write(tmp_path / "i.jsonl", ["not json", '{"a": 1, "b": "x"}'])
    with pytest.raises(SchemaError):
        infer_schema(p)
    sch = infer_schema(p, drop_corrupt=True)
    assert {f.name for f in sch.fields} == {"a", "b"}


def test_non_ascii_field_names_and_values(spark, tmp_path):
    # reference decodes non-ASCII keys fine (test_bson.py:110-125)
    doc = {"café": 1, "名前": "値", "emoji🎉": 2.5}
    p = _write(tmp_path / "u.jsonl", [json.dumps(doc, ensure_ascii=False)])
    got = _read(spark, p)
    assert set(got.columns) == set(doc)
    row = got.head()
    assert row["café"] == 1 and row["名前"] == "値" and row["emoji🎉"] == 2.5


def test_concurrent_reads_same_source(spark, tmp_path):
    p = _write(
        tmp_path / "t.jsonl", [json.dumps({"a": i}) for i in range(200)]
    )

    def go(_):
        df = _read(spark, p, declaredSchema="a bigint")
        return df.filter("a >= 100").count()

    with ThreadPoolExecutor(4) as ex:
        results = list(ex.map(go, range(4)))
    assert results == [100, 100, 100, 100]
