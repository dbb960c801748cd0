"""Charset-aware payload decode for crawl archives.

A real Common Crawl slice is several-percent legacy-encoded
(windows-125x, Shift-JIS, GBK, EUC-KR, KOI8-R, TIS-620, …); decoding
every payload with ``cast("string")`` (UTF-8 assumed) mojibakes those
pages and silently poisons language-ID, quality signals and dedup
digests downstream. This module is the transcode step the extraction
chain runs FIRST:

    decode_payload(payload, http_content_type)  ->  UTF-8 string

Detection order (first hit wins — the same discipline as browsers and
the WHATWG encoding sniff, deterministic by construction):

1. **BOM** — UTF-8 / UTF-16LE/BE / UTF-32LE/BE byte-order marks are
   definitive (and the only way UTF-16 pages are recognized).
2. **HTTP ``Content-Type`` charset parameter** — the reader already
   captures the envelope header into ``http_content_type``
   (sources/warc.py); ``charset=`` is authoritative per RFC 9110 …
3. **HTML ``<meta charset>`` / ``<meta http-equiv>`` probe** — scanned
   in the first 4 KiB (ASCII-compatible scan, which covers every
   single-byte family plus UTF-8).
4. **Content heuristic** — strict-UTF-8 try, else windows-1252 (the
   de-facto superset of latin-1 that real servers mean by either
   label).

One correction is applied over the declared label: a page declared as
a SINGLE-BYTE charset whose bytes are valid strict UTF-8 *with at
least one multi-byte sequence* is decoded as UTF-8 — the
declared-latin1-but-actually-utf8 page is the single most common
mislabel in web corpora, and every byte string is "valid" in a
single-byte codec so the declaration alone can never catch it.

The decode itself is Python's codec machinery inside an Arrow-batched
``pandas_udf`` — per-value work that no JVM expression can express,
exactly the carve-out the architecture reserves for Pandas UDFs. The
pure-Python core (:func:`sniff_charset` / :func:`decode_bytes`) is
importable for differential tests and driver-side audits.

Reference surface: the reference library decodes BSON strings as
UTF-8 only (pymongoarrow delegates charset problems to the server);
this tier exists for the crawl front-door, where the bytes arrive raw.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "sniff_charset",
    "decode_bytes",
    "decode_payload",
    "detect_charset",
    "SINGLE_BYTE_FAMILIES",
    "sniff_mime",
    "MAGIC_MIME",
]

# label → python codec for the families every crawl pipeline must
# handle; anything else resolvable by codecs.lookup also works — this
# table only normalizes the web's historical alias mess.
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "ascii": "utf-8",  # promote: ASCII is a strict UTF-8 subset
    "us-ascii": "utf-8",
    "iso-8859-1": "windows-1252",  # WHATWG: latin-1 means cp1252
    "latin-1": "windows-1252",
    "latin1": "windows-1252",
    "iso-8859-15": "iso-8859-15",
    "windows-1252": "windows-1252",
    "cp1252": "windows-1252",
    "windows-1251": "windows-1251",
    "cp1251": "windows-1251",
    "windows-1250": "windows-1250",
    "windows-1253": "windows-1253",
    "windows-1254": "windows-1254",
    "windows-1255": "windows-1255",
    "windows-1256": "windows-1256",
    "windows-1257": "windows-1257",
    "windows-1258": "windows-1258",
    "koi8-r": "koi8-r",
    "koi8-u": "koi8-u",
    "shift_jis": "cp932",  # WHATWG: shift_jis means the cp932 superset
    "shift-jis": "cp932",
    "sjis": "cp932",
    "x-sjis": "cp932",
    "euc-jp": "euc-jp",
    "gb2312": "gb18030",  # WHATWG: gb2312/gbk decode as gb18030
    "gbk": "gb18030",
    "gb18030": "gb18030",
    "big5": "big5",
    "euc-kr": "cp949",  # WHATWG: euc-kr means the cp949 superset
    "ks_c_5601-1987": "cp949",
    "tis-620": "cp874",
    "windows-874": "cp874",
    "iso-8859-11": "cp874",
}

# single-byte codecs (every byte sequence decodes "successfully") —
# the set the actually-UTF-8 correction applies to. Seeded from the
# alias table; codecs resolved through the codecs.lookup fallback
# (iso8859-2..16, cp1250, mac-cyrillic, …) are classified EMPIRICALLY
# by _is_single_byte — a declared-single-byte label outside the alias
# table must still get the mislabeled-UTF-8 correction (r12 review
# fix: 'charset=iso-8859-2' over UTF-8 bytes used to mojibake).
SINGLE_BYTE_FAMILIES = frozenset(
    v
    for v in _CHARSET_ALIASES.values()
    if v.startswith(("windows-", "iso-8859", "koi8", "cp874"))
)

_SINGLE_BYTE_CACHE: dict[str, bool] = {v: True for v in SINGLE_BYTE_FAMILIES}
_SINGLE_BYTE_CACHE.update({"utf-8": False, "gb18030": False, "cp932": False,
                           "cp949": False, "big5": False, "euc-jp": False})

def _is_single_byte(codec: str) -> bool:
    """Is this a one-byte-one-char codec (no multi-byte structure)?
    Decided empirically, once per codec (cached): decode each of the
    256 bytes ALONE. Single-byte codecs decode nearly all of them to
    exactly one char (a few undefined holes — cp1250 leaves 0x81/0x83/
    … unmapped — are tolerated); multi-byte codecs fail on their many
    lead bytes (cp932/gb18030/big5/euc-* reject 60-130 of them as
    incomplete sequences) or map one byte to multiple chars."""
    hit = _SINGLE_BYTE_CACHE.get(codec)
    if hit is not None:
        return hit
    ok_count = 0
    try:
        for b in range(256):
            try:
                if len(bytes([b]).decode(codec, "strict")) == 1:
                    ok_count += 1
            except UnicodeDecodeError:
                pass
        ok = ok_count >= 240
    except LookupError:
        ok = False
    _SINGLE_BYTE_CACHE[codec] = ok
    return ok

_CT_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([A-Za-z0-9._:\-]+)")
_META_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?([A-Za-z0-9._:\-]+)",
    re.IGNORECASE | re.DOTALL,
)
_BOMS = [
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
]
_META_PROBE_BYTES = 4096


def _normalize_label(label: str | None) -> str | None:
    if not label:
        return None
    key = label.strip().strip(";,").lower()
    codec = _CHARSET_ALIASES.get(key)
    if codec:
        return codec
    try:
        return codecs.lookup(key).name
    except LookupError:
        return None


def _strict_utf8(raw: bytes) -> str | None:
    """The payload decoded as strict UTF-8, or None. The decoded
    string is RETURNED so callers never pay the decode twice. (The
    ``raw.isascii()`` one-C-call fast-path lives in the CALLER,
    ``_sniff_ex`` — it gates whether a strict decode is attempted at
    all; r12 review fix replacing a per-byte Python loop.)"""
    try:
        return raw.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return None


def _sniff_ex(
    raw: bytes, content_type: str | None
) -> tuple[str, str | None]:
    """(codec, already_decoded_text_or_None) — the shared core: when
    sniffing required a successful strict decode, the result is handed
    back so decode_bytes does not decode the same bytes again."""
    for bom, codec in _BOMS:
        if raw.startswith(bom):
            return codec, None
    declared = None
    if content_type:
        m = _CT_CHARSET_RE.search(content_type)
        if m:
            declared = _normalize_label(m.group(1))
    if declared is None:
        m = _META_RE.search(raw[:_META_PROBE_BYTES])
        if m:
            declared = _normalize_label(m.group(1).decode("latin-1"))
    if declared is not None:
        if not raw.isascii() and _is_single_byte(declared):
            decoded = _strict_utf8(raw)
            if decoded is not None:
                return "utf-8", decoded  # mislabeled-UTF-8 correction
        return declared, None
    # no declaration anywhere: strict UTF-8 try, else cp1252
    decoded = _strict_utf8(raw)
    if decoded is not None:
        return "utf-8", decoded
    return "windows-1252", None


def sniff_charset(raw: bytes | None, content_type: str | None = None) -> str:
    """Detected python codec name for a payload (see module docstring
    for the precedence). Always returns a decodable codec; ``utf-8``
    for empty/None input."""
    if not raw:
        return "utf-8"
    return _sniff_ex(raw, content_type)[0]


def decode_bytes(raw: bytes | None, content_type: str | None = None) -> str | None:
    """Pure-Python core: sniff + decode to a UTF-8 ``str``. Undecodable
    sequences inside a CORRECTLY sniffed family are replaced (U+FFFD)
    rather than raised — one broken byte must not null a whole page."""
    if raw is None:
        return None
    if not raw:
        return ""
    codec, decoded = _sniff_ex(raw, content_type)
    if decoded is not None:
        return decoded
    if codec in ("utf-16-le", "utf-16-be", "utf-32-le", "utf-32-be"):
        # strip the BOM these codecs would render as U+FEFF
        for bom, name in _BOMS:
            if name.endswith(codec[-5:]) and raw.startswith(bom):
                raw = raw[len(bom):]
                break
    return raw.decode(codec, "replace")


_UDFS: dict = {}


def _udf(kind: str):
    """Module-cached pandas_udf wrappers (one construction per
    process, not per call — r12 review fix)."""
    fn = _UDFS.get(kind)
    if fn is not None:
        return fn
    core = decode_bytes if kind == "decode" else (
        lambda raw, ct: None if raw is None else sniff_charset(raw, ct)
    )

    @F.pandas_udf("string")
    def udf(payload, ctype):
        return payload.combine(
            ctype,
            lambda p, c: core(
                bytes(p) if p is not None else None,
                c if isinstance(c, str) else None,
            ),
        )

    _UDFS[kind] = udf
    return udf


def _ct_col(http_content_type) -> Column:
    if http_content_type is None:
        return F.lit(None).cast("string")
    if isinstance(http_content_type, Column):
        return http_content_type
    return F.col(http_content_type)


def decode_payload(
    payload: Column | str, http_content_type: Column | str | None = None
) -> Column:
    """UTF-8 string column from a raw payload column, charset-sniffed
    (module docstring). ``http_content_type`` is the reader-captured
    envelope header (sources/warc.py) — pass it whenever available;
    None sniffs from content alone. Arrow-batched ``pandas_udf``."""
    p = payload if isinstance(payload, Column) else F.col(payload)
    return _udf("decode")(p.cast("binary"), _ct_col(http_content_type))


def detect_charset(
    payload: Column | str, http_content_type: Column | str | None = None
) -> Column:
    """The sniffed codec NAME per row (profiling / contract audits:
    ``GROUP BY detect_charset(...)`` shows a corpus's encoding mix
    before committing to a transcode)."""
    p = payload if isinstance(payload, Column) else F.col(payload)
    return _udf("detect")(p.cast("binary"), _ct_col(http_content_type))


#: (hex prefix, mime) magic-number table — longest prefixes first so
#: e.g. the zip-based OOXML family cannot shadow plain zip. Hex pairs
#: compare against ``hex(payload)``, so the whole probe is one
#: codegen'd string chain per row.
MAGIC_MIME = (
    ("89504E470D0A1A0A", "image/png"),
    ("255044462D", "application/pdf"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("504B0304", "application/zip"),
    ("504B0506", "application/zip"),  # empty archive
    ("1F8B", "application/gzip"),
    ("28B52FFD", "application/zstd"),
    ("425A68", "application/x-bzip2"),
    ("4F676753", "application/ogg"),
    ("664C6143", "audio/flac"),
    ("00000020667479704D3441", "audio/mp4"),
)


def sniff_mime(payload: Column | str) -> Column:
    """Content sniffing from payload MAGIC BYTES (r13) — the router
    that keeps binary junk (images, PDFs, archives) out of the text
    pipeline before any transcode/extraction work is spent on it, and
    the typed-metadata feed for the multimodal columns.

    Entirely JVM expressions (``hex`` of a bounded prefix + literal
    ``startswith``/``rlike`` chain — no UDF, map-only, no shuffle):

    - a :data:`MAGIC_MIME` prefix match wins (PNG/PDF/GIF/JPEG/zip/
      gzip/zstd/bzip2/ogg/flac, RIFF-typed WEBP/WAV/AVI);
    - else markup-looking bytes (optional UTF-8 BOM + whitespace,
      case-insensitive): ``<!doctype``/``<html`` → ``text/html``,
      ``<svg`` → ``image/svg+xml``, ``<?xml`` → ``application/xml``
      (an XML declaration is NOT evidence of HTML; ``extract_text``'s
      xml-ish branch still extracts it downstream — its routing test
      matches on ``contains("xml")``);
    - else a NUL byte anywhere in the first 64 bytes →
      ``application/octet-stream`` (the classic binary probe);
    - else ``text/plain``. NULL stays NULL, empty bytes →
      ``application/x-empty``.

    The DECLARED HTTP content type is deliberately not consulted —
    crawl headers lie (that is this function's reason to exist); route
    on bytes, then let ``decode_payload``/``extract_text`` use the
    header only for charset hints."""
    p = (
        payload if isinstance(payload, Column) else F.col(payload)
    ).cast("binary")
    h = F.hex(F.substring(p, 1, 64))
    out = None
    for prefix, mime in MAGIC_MIME:
        cond = h.startswith(prefix)
        out = F.when(cond, mime) if out is None else out.when(cond, mime)
    # RIFF container: bytes 9-12 name the concrete format
    riff = F.hex(F.substring(p, 9, 4))
    out = out.when(
        h.startswith("52494646") & (riff == "57454250"), "image/webp"
    )
    out = out.when(
        h.startswith("52494646") & (riff == "57415645"), "audio/wav"
    )
    out = out.when(
        h.startswith("52494646") & (riff == "41564920"), "video/avi"
    )
    # markup probe on the text head (latin-1 cast never throws).
    # regexp-strip the BOM (its latin-1 mojibake form) and ALL leading
    # whitespace — F.trim strips only ASCII spaces, and real templated
    # pages routinely start with a newline/tab (r13 review fix)
    head = F.lower(
        F.regexp_replace(
            F.decode(F.substring(p, 1, 256), "ISO-8859-1"),
            r"^(ï»¿)?\s*",
            "",
        )
    )
    out = out.when(
        head.startswith("<!doctype") | head.startswith("<html"),
        "text/html",
    )
    out = out.when(head.startswith("<svg"), "image/svg+xml")
    out = out.when(head.startswith("<?xml"), "application/xml")
    out = out.when(F.length(p) == 0, "application/x-empty")
    out = out.when(
        h.rlike("^([0-9A-F]{2})*00"), "application/octet-stream"
    )
    return F.when(p.isNull(), F.lit(None).cast("string")).otherwise(
        out.otherwise(F.lit("text/plain"))
    )
