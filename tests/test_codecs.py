"""brotli/zstd codec parity tests (reference tests/test_cli.py:143-248
spirit: byte-exact decoded payloads for every Content-Encoding, including
the zstd+chunked dechunk path). Encoders are used only to build fixtures;
the engine path under test is decode-side (extract.py H6 kernel)."""

from __future__ import annotations

import gzip

import pytest

from wbx import codecs
from wbx.extract import (
    DecodingError,
    decode_body,
    decompressed_http_body,
    extracted_text,
)

pytestmark = pytest.mark.skipif(
    not (codecs.zstd_available() and codecs.brotli_available()),
    reason="system zstd/brotli libraries unavailable",
)

PAYLOAD = ("the quick brown fox jumps over the lazy dog " * 40).encode()


def warc_response(body: bytes, http_headers: bytes) -> tuple[bytes, bytes]:
    """(content_block, warc_header_bytes) for a response record."""
    http = b"HTTP/1.1 200 OK\r\n" + http_headers + b"\r\n" + body
    warc = (
        b"WARC/1.1\r\nWARC-Type: response\r\n"
        b"Content-Type: application/http;msgtype=response\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
    )
    return http, warc


class TestRawCodecs:
    def test_zstd_roundtrip(self):
        assert codecs.zstd_decompress(codecs.zstd_compress(PAYLOAD)) == PAYLOAD

    def test_zstd_multiframe(self):
        blob = codecs.zstd_compress(PAYLOAD) + codecs.zstd_compress(b"tail")
        assert codecs.zstd_decompress(blob) == PAYLOAD + b"tail"

    def test_zstd_truncated_raises(self):
        with pytest.raises(ValueError):
            codecs.zstd_decompress(codecs.zstd_compress(PAYLOAD)[:8])

    def test_brotli_roundtrip(self):
        assert codecs.brotli_decompress(codecs.brotli_compress(PAYLOAD)) == PAYLOAD

    def test_brotli_truncated_raises(self):
        with pytest.raises(ValueError):
            codecs.brotli_decompress(codecs.brotli_compress(PAYLOAD)[:4])

    def test_empty_inputs(self):
        assert codecs.zstd_decompress(codecs.zstd_compress(b"")) == b""
        assert codecs.brotli_decompress(codecs.brotli_compress(b"")) == b""


class TestH6Parity:
    def test_brotli_body_byte_exact(self):
        cb, hb = warc_response(
            codecs.brotli_compress(PAYLOAD), b"Content-Encoding: br\r\n"
        )
        assert decompressed_http_body(cb, hb) == PAYLOAD
        assert extracted_text(cb, hb) == PAYLOAD.decode()

    def test_zstd_body_byte_exact(self):
        cb, hb = warc_response(
            codecs.zstd_compress(PAYLOAD), b"Content-Encoding: zstd\r\n"
        )
        assert decompressed_http_body(cb, hb) == PAYLOAD

    def test_zstd_chunked_dechunks_first(self):
        """Reference quirk #4: de-chunking happens only when zstd is among
        the encodings AND Transfer-Encoding: chunked is present."""
        z = codecs.zstd_compress(PAYLOAD)
        half = len(z) // 2
        chunked = (
            hex(half)[2:].encode() + b"\r\n" + z[:half] + b"\r\n"
            + hex(len(z) - half)[2:].encode() + b"\r\n" + z[half:] + b"\r\n"
            + b"0\r\n\r\n"
        )
        cb, hb = warc_response(
            chunked,
            b"Content-Encoding: zstd\r\nTransfer-Encoding: chunked\r\n",
        )
        assert decompressed_http_body(cb, hb) == PAYLOAD

    def test_layered_encodings_right_to_left(self):
        """'Content-Encoding: br gzip' ⇒ body was brotli'd then gzip'd;
        decode gzip first, then brotli (reference utils.py:565-575)."""
        body = gzip.compress(codecs.brotli_compress(PAYLOAD), 6, mtime=0)
        assert decode_body(body, ["br", "gzip"]) == PAYLOAD

    def test_corrupt_brotli_raises_decoding_error(self):
        cb, hb = warc_response(b"\x00\xff\x13garbage", b"Content-Encoding: br\r\n")
        with pytest.raises(DecodingError):
            decompressed_http_body(cb, hb)

    def test_comma_separated_encodings_still_rejected(self):
        """Reference quirk #2: 'gzip, br' splits on space → token 'gzip,'
        is unrecognized and raises."""
        cb, hb = warc_response(b"whatever", b"Content-Encoding: gzip, br\r\n")
        with pytest.raises(DecodingError):
            decompressed_http_body(cb, hb)
