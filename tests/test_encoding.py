"""Charset sniff + transcode (operators/encoding.py): pure-core
differential vs the Spark pandas_udf, and the crawl-chain integration —
legacy-encoded WARC payloads round-trip to correct prose where the old
cast("string") path mojibaked (r11 verdict item #2)."""

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.encoding import (
    decode_bytes,
    decode_payload,
    detect_charset,
    sniff_charset,
)

from conftest import SF_DIR  # noqa: F401  (spark fixture wiring)

PAGES = [
    # (prose, encode-codec, declared content-type)
    ("Füße, Öl & Größe — naïve café", "windows-1252",
     "text/html; charset=iso-8859-1"),
    ("Русский текст про котов и собак", "koi8-r",
     "text/html; charset=koi8-r"),
    ("Ще не вмерла України слава", "windows-1251",
     "text/html; charset=windows-1251"),
    ("日本語のページです。東京と大阪。", "cp932",
     "text/html; charset=Shift_JIS"),
    ("简体中文网页内容测试", "gb18030", "text/html; charset=GB2312"),
    ("한국어 웹 페이지 내용", "cp949", "text/html; charset=euc-kr"),
    ("ภาษาไทยบนเว็บ", "cp874", "text/html; charset=TIS-620"),
    ("Ελληνικά κείμενα στο διαδίκτυο", "windows-1253",
     "text/html; charset=windows-1253"),
    ("plain ascii page", "utf-8", "text/html"),
    ("unicode ✓ utf-8 page — no declaration", "utf-8", None),
]


def test_spark_decode_matches_python_core(spark):
    rows = [
        (i, prose.encode(codec), ct)
        for i, (prose, codec, ct) in enumerate(PAGES)
    ] + [(len(PAGES), None, None), (len(PAGES) + 1, b"", "text/html")]
    df = spark.createDataFrame(rows, "i int, payload binary, ct string")
    got = {
        r["i"]: (r["txt"], r["cs"])
        for r in df.select(
            "i",
            decode_payload("payload", "ct").alias("txt"),
            detect_charset("payload", "ct").alias("cs"),
        ).collect()
    }
    for i, (payload, ct) in enumerate((p, c) for _, p, c in
                                      ((None, r[1], r[2]) for r in rows)):
        want_txt = decode_bytes(payload, ct)
        want_cs = None if payload is None else sniff_charset(payload, ct)
        assert got[i] == (want_txt, want_cs), i
    # the actual prose survives
    for i, (prose, _, _) in enumerate(PAGES):
        assert got[i][0] == prose, (i, got[i])


def test_meta_charset_probe_without_http_header(spark):
    html = '<html><head><meta charset="shift_jis"></head><body>東京</body></html>'
    df = spark.createDataFrame(
        [(html.encode("cp932"),)], "payload binary"
    )
    row = df.select(
        decode_payload("payload").alias("txt"),
        detect_charset("payload").alias("cs"),
    ).first()
    assert "東京" in row["txt"] and row["cs"] == "cp932"


def test_mislabeled_utf8_correction(spark):
    # declared latin-1, bytes are strict multi-byte UTF-8 (the most
    # common real-world mislabel) -> decoded as UTF-8, not mojibaked
    df = spark.createDataFrame(
        [("déjà vu — naïve".encode("utf-8"),
          "text/html; charset=iso-8859-1")],
        "payload binary, ct string",
    )
    row = df.select(
        decode_payload("payload", "ct").alias("txt"),
        detect_charset("payload", "ct").alias("cs"),
    ).first()
    assert row["txt"] == "déjà vu — naïve" and row["cs"] == "utf-8"


def test_warc_crawl_chain_transcodes_legacy_pages(spark, tmp_path):
    """q_scan_warc_html sibling: one archive per legacy family, payload
    wrapped in page chrome; decode_payload(payload, http_content_type)
    → html_to_text yields the exact prose, while the old
    cast("string") path mojibakes (regression pin)."""
    from mongo_arrow_spark.operators.text import html_to_text
    from mongo_arrow_spark.sources.warc import build_warc_record, register_warc

    recs = []
    for i, (prose, codec, ct) in enumerate(PAGES):
        if ct is None:
            ct = "text/html"
        html = f"<html><head><title>t</title></head><body><p>{prose}</p></body></html>"
        recs.append(
            build_warc_record(
                f"<urn:enc:{i}>",
                f"https://x/{i}",
                html.encode(codec),
                http_content_type=ct,
            )
        )
    p = str(tmp_path / "legacy.warc")
    with open(p, "wb") as fh:
        fh.write(b"".join(recs))
    register_warc(spark)
    df = spark.read.format("warc").load(p)
    got = {
        r["record_id"]: r["txt"]
        for r in df.select(
            "record_id",
            F.trim(
                html_to_text(decode_payload("payload", "http_content_type"))
            ).alias("txt"),
        ).collect()
    }
    for i, (prose, _, _) in enumerate(PAGES):
        assert got[f"<urn:enc:{i}>"] == prose, (i, got[f"<urn:enc:{i}>"])
    # mojibake regression pin: the UTF-8-assumed cast corrupts the
    # single-byte and CJK families (replacement chars / wrong prose)
    naive = {
        r["record_id"]: r["txt"]
        for r in df.select(
            "record_id",
            F.trim(html_to_text(F.col("payload").cast("string"))).alias("txt"),
        ).collect()
    }
    broken = [
        i
        for i, (prose, codec, _) in enumerate(PAGES)
        if codec != "utf-8" and naive[f"<urn:enc:{i}>"] != prose
    ]
    assert len(broken) == sum(1 for _, c, _ in PAGES if c != "utf-8"), broken


def test_undeclared_legacy_falls_back_to_cp1252(spark):
    raw = "fenêtre à côté".encode("windows-1252")
    df = spark.createDataFrame([(raw,)], "payload binary")
    row = df.select(
        decode_payload("payload").alias("txt"),
        detect_charset("payload").alias("cs"),
    ).first()
    assert row["txt"] == "fenêtre à côté" and row["cs"] == "windows-1252"


def test_bom_families(spark):
    import codecs

    text = "bom page ✓"
    rows = [
        (0, codecs.BOM_UTF8 + text.encode("utf-8")),
        (1, codecs.BOM_UTF16_LE + text.encode("utf-16-le")),
        (2, codecs.BOM_UTF16_BE + text.encode("utf-16-be")),
    ]
    df = spark.createDataFrame(rows, "i int, payload binary")
    got = {
        r["i"]: r["txt"]
        for r in df.select(
            "i", decode_payload("payload").alias("txt")
        ).collect()
    }
    assert got == {0: text, 1: text, 2: text}


def test_mislabel_correction_covers_lookup_fallback_codecs(spark):
    """r12 review fix: single-byte charsets resolved through the
    codecs.lookup fallback (iso-8859-2..16, cp1250, mac-cyrillic) get
    the mislabeled-UTF-8 correction too — and genuinely legacy content
    under those labels still decodes as declared."""
    utf8 = "déjà vu — naïve".encode("utf-8")
    legacy = "příliš žluťoučký kůň".encode("iso-8859-2")
    for ct in ("charset=iso-8859-2", "charset=cp1250", "charset=mac-cyrillic"):
        assert decode_bytes(utf8, ct) == "déjà vu — naïve", ct
        assert sniff_charset(utf8, ct) == "utf-8", ct
    assert decode_bytes(legacy, "charset=iso-8859-2") == "příliš žluťoučký kůň"
    # multi-byte declarations NEVER get the correction (valid cp932
    # bytes can incidentally be valid UTF-8-looking, and vice versa)
    from mongo_arrow_spark.operators.encoding import _is_single_byte

    assert not any(
        _is_single_byte(c)
        for c in ("cp932", "gb18030", "big5", "cp949", "euc-jp", "utf-8")
    )


# ------------------------------------------------------------ r13: mime


def test_sniff_mime_magic_table(spark):
    """Magic bytes win; markup probes handle BOM + leading whitespace;
    NUL-probe binaries and the text fallback; NULL stays NULL; empty
    is typed distinctly; RIFF containers dispatch on bytes 9-12."""
    import gzip as _g

    from mongo_arrow_spark.operators.encoding import sniff_mime

    rows = [
        ("png", b"\x89PNG\r\n\x1a\n" + b"x" * 16, "image/png"),
        ("pdf", b"%PDF-1.7 xyz", "application/pdf"),
        ("jpg", b"\xff\xd8\xff\xe0JFIF", "image/jpeg"),
        ("gif", b"GIF89a" + b"\x01" * 8, "image/gif"),
        ("zip", b"PK\x03\x04xxxx", "application/zip"),
        ("gz", _g.compress(b"hello", mtime=0), "application/gzip"),
        ("zstd", b"\x28\xb5\x2f\xfd" + b"x" * 8, "application/zstd"),
        ("webp", b"RIFF\x10\x00\x00\x00WEBPVP8 ", "image/webp"),
        ("wav", b"RIFF\x10\x00\x00\x00WAVEfmt ", "audio/wav"),
        ("html", b"  <!DOCTYPE html><html>", "text/html"),
        ("html_bom", b"\xef\xbb\xbf<html lang=en>", "text/html"),
        ("svg", b"<svg xmlns='x'>", "image/svg+xml"),
        ("xml", b"<?xml version='1.0'?>", "application/xml"),
        ("bin", b"ab\x00cd" + b"q" * 10, "application/octet-stream"),
        ("txt", "plain prose, café ok".encode(), "text/plain"),
        ("empty", b"", "application/x-empty"),
        ("null", None, None),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "rid string, payload binary"
    )
    got = {
        r["rid"]: r["m"]
        for r in df.select("rid", sniff_mime("payload").alias("m")).collect()
    }
    for rid, _, want in rows:
        assert got[rid] == want, (rid, got[rid], want)


def test_sniff_mime_udf_free_and_header_blind(spark):
    """The probe is a pure JVM projection, and it ignores the declared
    header by design — a PNG served as text/html still types as PNG
    (crawl headers lie; that is the operator's purpose)."""
    from mongo_arrow_spark.operators.encoding import sniff_mime

    df = spark.createDataFrame(
        [(b"\x89PNG\r\n\x1a\nxx", "text/html; charset=utf-8")],
        "payload binary, ct string",
    )
    out = df.select(sniff_mime("payload").alias("m"))
    assert out.first()["m"] == "image/png"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sniff_mime_markup_after_newline_and_tab(spark):
    """r13 review fix: templated pages starting with a newline/tab
    (very common) must still type as markup — F.trim only strips
    spaces, so the probe regexp-strips ALL leading whitespace (and
    the BOM+newline combination)."""
    from mongo_arrow_spark.operators.encoding import sniff_mime

    rows = [
        ("nl", b"\n<!DOCTYPE html><html>", "text/html"),
        ("tab", b"\t<html>", "text/html"),
        ("crlf", b"\r\n\r\n<svg >", "image/svg+xml"),
        ("bom_nl", b"\xef\xbb\xbf\n<html>", "text/html"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "rid string, payload binary"
    )
    got = {
        r["rid"]: r["m"]
        for r in df.select("rid", sniff_mime("payload").alias("m")).collect()
    }
    for rid, _, want in rows:
        assert got[rid] == want, (rid, got[rid], want)
