"""r7: pure-Python media header decode — PNG/GIF/BMP/JPEG dimensions and
WAV duration are struct reads, no codec library (verdict item 3). The
deterministic fake codec remains the path for mimes that genuinely need
PIL/ffmpeg; its env gate is pinned here too."""

import struct

import pytest
from pyspark.sql import functions as F

from mongo_arrow_spark.operators.multimodal import (
    _decode_real,
    _make_bmp,
    _make_gif,
    _make_jpeg,
    _make_png,
    _make_wav,
    decode_media,
    synthesize_media,
)


@pytest.mark.parametrize(
    "maker,mime",
    [
        (_make_png, "image/png"),
        (_make_gif, "image/gif"),
        (_make_bmp, "image/bmp"),
        (_make_jpeg, "image/jpeg"),
    ],
)
@pytest.mark.parametrize("w,h", [(1, 1), (640, 480), (123, 7)])
def test_image_header_roundtrip(maker, mime, w, h):
    got = _decode_real(maker(w, h), mime)
    assert got == (w, h, None)


def test_wav_duration_roundtrip():
    # 16000 data bytes at 8 kHz mono s16 (byte_rate 16000) = exactly 1 s
    w, h, dur = _decode_real(_make_wav(16000), "audio/wav")
    assert (w, h) == (None, None)
    assert dur == pytest.approx(1.0)
    assert _decode_real(_make_wav(4000), "audio/x-wav")[2] == pytest.approx(0.25)


def test_bmp_topdown_negative_height():
    """Top-down BMPs store height negative; dimensions are absolute."""
    p = bytearray(_make_bmp(10, 20))
    p[22:26] = struct.pack("<i", -20)
    assert _decode_real(bytes(p), "image/bmp") == (10, 20, None)


def test_jpeg_skips_non_frame_segments():
    """A DQT (and the C4 huffman marker) before SOF must be walked over,
    not mistaken for the frame header."""
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x01"
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x02"
    base = _make_jpeg(77, 33)
    # splice the tables between APP0 and SOF0
    sof_at = base.index(b"\xff\xc0")
    spliced = base[:sof_at] + dqt + dht + base[sof_at:]
    assert _decode_real(spliced, "image/jpeg") == (77, 33, None)


def test_wav_odd_chunk_word_alignment():
    """RIFF chunks are word-aligned: an odd-sized chunk before fmt/data
    carries a pad byte the walker must skip."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE"
    body += b"junk" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    body += b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", 8000) + b"\x00" * 8000
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert _decode_real(payload, "audio/wav")[2] == pytest.approx(0.5)


def test_malformed_headers_raise_value_error():
    with pytest.raises(ValueError):
        _decode_real(b"\x89PNG\r\n\x1a\nXXXXIDAT", "image/png")
    with pytest.raises(ValueError):
        _decode_real(b"GIF", "image/gif")
    with pytest.raises(ValueError):
        _decode_real(b"\xff\xd8\xff\xd9", "image/jpeg")  # EOI, no frame
    with pytest.raises(ValueError):
        _decode_real(b"RIFF\x00\x00\x00\x00AVI ", "audio/wav")


def test_unsupported_mime_stays_env_gated():
    """Formats whose metadata needs a real codec keep the documented
    NotImplementedError gate (the fake covers their plumbing tests)."""
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00\x00\x00\x18ftypmp42", "video/mp4")


def test_synthesize_and_decode_real_end_to_end(spark):
    """synthesize_media → decode_media(use_fake=False): every payload is
    a valid format whose parsed fields equal the generating formulas."""
    docs = spark.createDataFrame(
        [(i, "x" * (10 + i)) for i in range(10)], "doc_id long, text string"
    )
    media = synthesize_media(docs)
    out = decode_media(media, use_fake=False).collect()
    assert len(out) == 10
    for r in sorted(out, key=lambda r: r["media_id"]):
        mid = r["media_id"]
        if mid % 5 == 4:
            assert r["width"] is None and r["height"] is None
            data_len = (len("x" * (10 + mid)) % 1000 + 100) * 2
            assert r["duration_s"] == pytest.approx(data_len / 16000)
        else:
            assert r["width"] == mid % 640 + 1
            assert r["height"] == mid * 7 % 480 + 1
            assert r["duration_s"] is None


def test_fake_codec_still_drives_plumbing(spark):
    """use_fake=True keeps working for arbitrary payloads/mimes."""
    from mongo_arrow_spark.operators.multimodal import attach_payload

    docs = spark.createDataFrame(
        [(1, "hello")], "doc_id long, text string"
    )
    out = decode_media(attach_payload(docs), use_fake=True).collect()
    assert out[0]["width"] == 5 % 640 + 1
