"""Byte-parity goldens for the WARC scan strategies.

The literal expectations below were verified identical to the reference
parser's output (records, unparsable-line offsets, warnings) by running
harvard-lil/warcbench's WARCParser side-by-side on the same inputs —
including its delimiter-mode quirks:

- a record with no delimiter before EOF collapses to (start, start) with a
  'Last record may have been truncated.' warning, the cursor advances 4
  bytes, and the remaining bytes (minus those 4) become unparsable lines
  (parsers/warc.py:330-339 + utils.py preserve_cursor_position);
- two consecutive CRLF-only lines followed by a non-CRLF byte end a record
  even mid-content, magic or not (utils.py:168-174 'case A');
- a content line + one CRLF-only line ends a record only when the WARC
  magic follows (utils.py:176-189 'case B').
"""

from __future__ import annotations

import pytest

from wbx.fixtures import warc_record_bytes
from wbx.warcio import scan_warc

SEP = b"\r\n\r\n"


def _data(label: str) -> bytes:
    if label == "gzip_tail":
        return b"".join(warc_record_bytes(i, f"text {i}", True) + SEP for i in range(3))
    if label == "caseA_mid":
        return (
            warc_record_bytes(0, "line\n\r\n\r\nafter", False)
            + SEP
            + warc_record_bytes(1, "x\n\n", False)
            + SEP
        )
    if label == "no_tail_sep":
        return warc_record_bytes(0, "a\n\n", False)
    raise KeyError(label)


GOLDEN = {
    ("gzip_tail", "content_length"): ([(0, 237), (241, 478), (482, 719)], [], []),
    ("gzip_tail", "delimiter"): (
        [(0, 237), (241, 478), (482, 482)],
        [(486, 492), (492, 513), (513, 554), (554, 603), (603, 623), (623, 625),
         (625, 642), (642, 667), (667, 691), (691, 693), (693, 721), (721, 723)],
        ["Last record may have been truncated."],
    ),
    ("caseA_mid", "content_length"): ([(0, 201), (205, 395)], [], []),
    ("caseA_mid", "delimiter"): (
        [(0, 192), (205, 395)],
        [(196, 203), (203, 205)],
        [],
    ),
    ("no_tail_sep", "content_length"): (
        [(0, 190)],
        [],
        ["The record between 0-190 was improperly terminated."],
    ),
    ("no_tail_sep", "delimiter"): (
        [(0, 0)],
        [(4, 10), (10, 31), (31, 72), (72, 121), (121, 141), (141, 143),
         (143, 160), (160, 185), (185, 187), (187, 189), (189, 190)],
        ["Last record may have been truncated."],
    ),
}


@pytest.mark.parametrize("label,style", sorted(GOLDEN))
def test_reference_parity(label, style):
    want_records, want_unparsable, want_warnings = GOLDEN[(label, style)]
    r = scan_warc(_data(label), "x", style)
    assert [(x["record_start"], x["record_end"]) for x in r.records] == want_records
    assert [(u["start"], u["end"]) for u in r.unparsable] == want_unparsable
    assert r.warnings == want_warnings


def test_strategies_agree_on_newline_terminated_bodies():
    """Bodies ending in '\\n' give the delimiter scan its case-A boundary at
    EOF, so both strategies agree on every record — the shape used by the
    warc_compare_parsers oracle query."""
    data = b"".join(
        warc_record_bytes(i, f"text {i}\n", False) + SEP for i in range(4)
    )
    a = scan_warc(data, "x", "content_length")
    b = scan_warc(data, "x", "delimiter")
    assert [(x["record_start"], x["record_end"]) for x in a.records] == [
        (x["record_start"], x["record_end"]) for x in b.records
    ]
    assert len(a.records) == 4 and not a.warnings and not b.warnings


# --- live differential parity vs the reference parser (when present) --------

_REF_SRC = "/root/reference/src"


def _install_codec_shims():
    """The reference imports brotli/pyzstd unconditionally; neither pip
    package exists in this container, so satisfy the import with shims over
    the engine's own ctypes codecs (the offsets-only comparisons here never
    decode bodies, but the shims are real anyway)."""
    import sys
    import types

    if "brotli" not in sys.modules:
        from wbx import codecs

        brotli = types.ModuleType("brotli")
        brotli.decompress = codecs.brotli_decompress
        sys.modules["brotli"] = brotli
    if "pyzstd" not in sys.modules:
        from wbx import codecs

        pyzstd = types.ModuleType("pyzstd")
        pyzstd.decompress = codecs.zstd_decompress
        sys.modules["pyzstd"] = pyzstd


def _reference_scan(data: bytes, style: str):
    """Run harvard-lil/warcbench's own parser on the bytes. Only used as a
    test oracle when the reference checkout exists — the engine itself has
    no dependency on it, and the repo stays standalone (skipped otherwise).
    """
    import io
    import sys

    _install_codec_shims()
    sys.path.insert(0, _REF_SRC)
    try:
        from warcbench import WARCParser
        from warcbench.config import WARCCachingConfig, WARCParsingConfig

        # content_block_bytes=True matters for content_length parity: the
        # reference's lazy path seek()s past EOF on a truncated final
        # record (reporting a record end beyond the file), while the
        # read() path clamps to the actual data — the engine always
        # materializes bytes, so the bytes-cached configuration is the
        # semantically matching one. Delimiter mode stays lazy: the
        # reference's own bytes-cached delimiter path crashes on
        # negative-length truncated splits (read length must be
        # non-negative), and its delimiter offsets don't depend on the
        # cache config anyway.
        cache = WARCCachingConfig(unparsable_lines=True)
        if style == "content_length":
            cache = WARCCachingConfig(
                unparsable_lines=True, content_block_bytes=True, header_bytes=True
            )
        p = WARCParser(
            io.BufferedReader(io.BytesIO(data)),  # .peek() needed
            parsing_options=WARCParsingConfig(style=style),
            cache=cache,
        )
        p.parse(cache_records=True)
        return (
            [(r.start, r.end) for r in p.records],
            [(u.start, u.end) for u in p.unparsable_lines],
            list(p.warnings),
        )
    finally:
        sys.path.remove(_REF_SRC)


def _fuzz_archive(seed: int) -> bytes:
    """Deterministic adversarial archive: bodies chosen to stress every
    delimiter-scan state (embedded CRLFCRLF, trailing CRLF runs, empty
    bodies), plus optional leading junk and a truncated tail."""
    import random

    rng = random.Random(seed)
    tricky_bodies = [
        "plain text",
        "",
        "ends with newline\n",
        "embedded\r\n\r\nseparator",
        "trailing crlf\r\n",
        "double trailing\r\n\r\n",
        "\r\n",
        "a\n\n",
        "unicode é … ü",
        "x" * rng.randint(1, 300),
    ]
    parts = []
    if rng.random() < 0.3:
        parts.append(b"leading junk line\r\n")
    n = rng.randint(1, 6)
    for i in range(n):
        body = rng.choice(tricky_bodies)
        parts.append(warc_record_bytes(i, body, rng.random() < 0.3))
        parts.append(SEP)
    if rng.random() < 0.3:
        parts.append(b"trailing junk")
    data = b"".join(parts)
    if rng.random() < 0.2 and len(data) > 40:
        data = data[: rng.randint(30, len(data) - 1)]  # truncated tail
    return data


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_SRC),
    reason="reference checkout not present (repo is standalone)",
)
@pytest.mark.parametrize("style", ["content_length", "delimiter"])
def test_differential_fuzz_vs_reference(style):
    """64 seeded adversarial archives, byte-for-byte parity on record
    offsets, unparsable-line offsets, AND warning strings — the live
    generalization of the embedded GOLDEN literals above."""
    for seed in range(64):
        data = _fuzz_archive(seed)
        want = _reference_scan(data, style)
        r = scan_warc(data, "x", style)
        got = (
            [(x["record_start"], x["record_end"]) for x in r.records],
            [(u["start"], u["end"]) for u in r.unparsable],
            list(r.warnings),
        )
        assert got == want, f"seed {seed} style {style}: {got} != {want}"


def _reference_gz_member_scan(data: bytes):
    """Reference WARCGZParser, decompression_style='member' — member
    boundaries (compressed + uncompressed), per-member record spans, and
    warnings."""
    import io
    import sys

    _install_codec_shims()
    sys.path.insert(0, _REF_SRC)
    try:
        from warcbench import WARCGZParser
        from warcbench.config import WARCGZCachingConfig, WARCGZParsingConfig

        # bytes-cached config again (cf. _reference_scan): BOTH member-mode
        # warnings are cache-dependent in the reference — the non-WARC-
        # member warning is emitted only under non_warc_member_bytes=True,
        # and the (inverted) delimiter-quirk warning only fires when
        # content bytes were actually read so the cursor sits at
        # content_end. The engine always materializes bytes, so this is
        # the semantically matching reference configuration.
        p = WARCGZParser(
            io.BufferedReader(io.BytesIO(data)),
            enable_lazy_loading_of_bytes=False,
            parsing_options=WARCGZParsingConfig(decompression_style="member"),
            cache=WARCGZCachingConfig(
                non_warc_member_bytes=True,
                content_block_bytes=True,
                header_bytes=True,
            ),
        )
        p.parse(cache_members=True)
        members, records = [], []
        for m in p.members:
            members.append(
                (m.start, m.end, m.uncompressed_start, m.uncompressed_end)
            )
            r = m.uncompressed_warc_record
            if r is not None:
                records.append((r.start, r.end))
        return members, records, list(p.warnings)
    finally:
        sys.path.remove(_REF_SRC)


def _fuzz_gz_archive(seed: int) -> bytes:
    """Deterministic member-style archive: WARC-record members mixed with
    non-WARC members (plain gz'd text), members with trailing garbage after
    the record, and members missing the CRLFCRLF tail."""
    import gzip
    import random

    rng = random.Random(10_000 + seed)
    parts = []
    n = rng.randint(1, 6)
    for i in range(n):
        kind = rng.random()
        if kind < 0.55:  # spec-conformant record member
            payload = warc_record_bytes(i, f"body {i}\n" * rng.randint(1, 3), False) + SEP
        elif kind < 0.7:  # record member missing the CRLFCRLF tail
            payload = warc_record_bytes(i, "tailless", False)
        elif kind < 0.85:  # record member with trailing junk after the record
            payload = (
                warc_record_bytes(i, "pre-junk", False) + SEP + b"trailing junk bytes"
            )
        else:  # non-WARC member
            payload = rng.choice([b"just text\r\n", b"", b"\x00\x01\x02" * 10])
        parts.append(gzip.compress(payload, mtime=0))
    return b"".join(parts)


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_SRC),
    reason="reference checkout not present (repo is standalone)",
)
def test_differential_gz_member_fuzz_vs_reference():
    """48 seeded member-style archives: member boundaries, record spans,
    and warning strings byte-for-byte against the reference's
    GzippedWARCMemberParser (including its inverted delimiter-warning
    quirk, gzipped_warc.py:553-557)."""
    from wbx.warcio import scan_warc_gz_member

    for seed in range(48):
        data = _fuzz_gz_archive(seed)
        want_members, want_records, want_warnings = _reference_gz_member_scan(data)
        result, non_warc = scan_warc_gz_member(data, "x")
        got_records = [
            (r["record_start"], r["record_end"]) for r in result.records
        ]
        got_members = sorted(
            [
                (r["member_start"], r["member_end"], r["unc_start"], r["unc_end"])
                for r in result.records
            ]
            + [
                (m["member_start"], m["member_end"], m["unc_start"], m["unc_end"])
                for m in non_warc
            ]
        )
        assert got_members == sorted(want_members), f"seed {seed} members"
        assert got_records == want_records, f"seed {seed} records"
        assert list(result.warnings) == want_warnings, f"seed {seed} warnings"


def _reference_extract_text(content_block: bytes, header_bytes: bytes):
    """The reference's Record.get_decompressed_http_body on a hand-built
    Record, decoded utf-8-replace (its handlers' Sc6 convention) —
    classification-based so cross-engine exception types compare sanely:
    ('ok', text|None) or ('error',)."""
    import sys

    _install_codec_shims()
    sys.path.insert(0, _REF_SRC)
    try:
        from warcbench.models import ContentBlock, Header, Record

        rec = Record(start=0, end=0)
        h = Header(start=0, end=len(header_bytes))
        h._bytes = header_bytes
        cb = ContentBlock(start=0, end=len(content_block))
        cb._bytes = content_block
        rec.header = h
        rec.content_block = cb
        try:
            body = rec.get_decompressed_http_body()
        except Exception:
            return ("error",)
        return ("ok", body.decode("utf-8", errors="replace") if body is not None else None)
    finally:
        sys.path.remove(_REF_SRC)


def _fuzz_http_record(seed: int):
    """(content_block, header_bytes) with adversarial encoding chains."""
    import gzip
    import random
    import zlib

    from wbx import codecs

    rng = random.Random(20_000 + seed)
    body = rng.choice(
        [
            b"plain body text\n",
            b"",
            "unicode \xe9 … body".encode("utf-8"),
            b"invalid utf8 \xff\xfe tail",
            b"x" * rng.randint(1, 500),
        ]
    )

    def chunked(data: bytes) -> bytes:
        out, i = [], 0
        while i < len(data):
            n = rng.randint(1, 40)
            chunk = data[i : i + n]
            out.append(f"{len(chunk):x}".encode() + b"\r\n" + chunk + b"\r\n")
            i += n
        out.append(b"0\r\n\r\n")
        return b"".join(out)[: -len(b"\r\n")]  # reference joins odd segments

    choice = rng.random()
    http_headers = [b"HTTP/1.1 200 OK"]
    if choice < 0.15:
        payload = body
    elif choice < 0.3:
        http_headers.append(b"Content-Encoding: gzip")
        payload = gzip.compress(body, mtime=0)
    elif choice < 0.4:
        http_headers.append(b"Content-Encoding: deflate")
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(body) + co.flush()
    elif choice < 0.5 and codecs.brotli_available():
        http_headers.append(b"Content-Encoding: br")
        payload = codecs.brotli_compress(body)
    elif choice < 0.6 and codecs.zstd_available():
        http_headers.append(b"Content-Encoding: zstd")
        payload = codecs.zstd_compress(body)
    elif choice < 0.7 and codecs.zstd_available():
        # the reference de-chunks ONLY when zstd is among the encodings
        http_headers.append(b"Content-Encoding: zstd")
        http_headers.append(b"Transfer-Encoding: chunked")
        payload = chunked(codecs.zstd_compress(body))
    elif choice < 0.8:
        # comma form: tokens split on ' ' -> 'gzip,' is unrecognized
        http_headers.append(b"Content-Encoding: gzip, br")
        payload = gzip.compress(body, mtime=0)
    elif choice < 0.9:
        # double encoding, applied right-to-left on decode
        http_headers.append(b"Content-Encoding: br gzip")
        payload = (
            codecs.brotli_compress(gzip.compress(body, mtime=0))
            if codecs.brotli_available()
            else gzip.compress(body, mtime=0)
        )
    else:
        http_headers.append(b"Content-Encoding: gzip")
        payload = b"corrupt, not gzip at all"

    sep = rng.choice([b"\r\n\r\n", b"\r\n\r\n"])
    content = b"\r\n".join(http_headers) + sep + payload
    shape = rng.random()
    if shape < 0.08:
        content = b"\r\n\r\n" + payload  # find()==0 truthiness quirk
    elif shape < 0.16:
        content = b"no-crlfcrlf-anywhere " + payload.replace(b"\r\n\r\n", b"")
    ct = b"application/http;msgtype=response" if rng.random() > 0.1 else b"text/plain"
    header = (
        b"WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/\r\n"
        b"Content-Type: " + ct + b"\r\n"
        b"Content-Length: " + str(len(content)).encode() + b"\r\n"
    )
    return content, header


@pytest.mark.skipif(
    not __import__("os").path.isdir(_REF_SRC),
    reason="reference checkout not present (repo is standalone)",
)
def test_differential_text_extraction_vs_reference():
    """96 seeded (content_block, header) pairs through every encoding
    chain: the engine's extracted_text must agree with the reference's
    get_decompressed_http_body + utf-8-replace — same text when both
    succeed, error-for-error otherwise. This is the live form of the
    input_hint's byte-identical-text invariant."""
    from wbx.extract import DecodingError, extracted_text

    for seed in range(96):
        content, header = _fuzz_http_record(seed)
        want = _reference_extract_text(content, header)
        try:
            got = ("ok", extracted_text(content, header))
        except Exception:
            got = ("error",)
        assert got == want, f"seed {seed}: {got!r} != {want!r}"
