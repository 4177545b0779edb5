"""Live differential parity for J1 FIFO request/response pair matching vs
the reference's find_matching_request_response_pairs — the relational
rank-join reformulation must reproduce the per-URI deque algorithm
record-for-record on adversarial orderings.

Skipped when the reference checkout is absent (the repo stays standalone).
"""

from __future__ import annotations

import os
import random

import pytest

from tests.test_parser_parity import _REF_SRC, _install_codec_shims

SEP = b"\r\n\r\n"


def _fuzz_pairs_archive(seed: int) -> bytes:
    """Interleaved request/response records: repeated URIs, responses
    arriving BEFORE their requests, lone records on both sides, case-varied
    WARC-Type spellings, and records missing WARC-Target-URI."""
    rng = random.Random(40_000 + seed)
    uris = [f"https://s{h}.example/p/{p}" for h in range(2) for p in range(3)]
    recs = []
    for i in range(rng.randint(6, 16)):
        rtype = rng.choice([b"request", b"response", b"Request", b"RESPONSE"])
        is_req = rtype.lower() == b"request"
        uri_line = (
            b"WARC-Target-URI: " + rng.choice(uris).encode() + b"\r\n"
            if rng.random() > 0.1
            else b""  # pathological: no URI at all
        )
        ct = (
            b"application/http; msgtype=request"
            if is_req
            else b"application/http; msgtype=response"
        )
        http = (
            b"GET /x HTTP/1.1\r\nHost: h\r\n\r\n"
            if is_req
            else b"HTTP/1.1 200 OK\r\n\r\nbody " + str(i).encode()
        )
        header = (
            b"WARC/1.1\r\nWARC-Type: " + rtype + b"\r\n" + uri_line
            + b"Content-Type: " + ct
            + b"\r\nContent-Length: " + str(len(http)).encode() + b"\r\n"
        )
        recs.append(header + b"\r\n" + http)
    return b"".join(r + SEP for r in recs)


def _reference_pairs(data: bytes):
    """(pairs, lone_requests, lone_responses) as sets of record offsets;
    pairs keyed (req_start, resp_start)."""
    import io
    import sys

    _install_codec_shims()
    sys.path.insert(0, _REF_SRC)
    try:
        from warcbench import WARCParser
        from warcbench.config import WARCCachingConfig, WARCParsingConfig
        from warcbench.utils import find_matching_request_response_pairs

        p = WARCParser(
            io.BufferedReader(io.BytesIO(data)),
            parsing_options=WARCParsingConfig(style="content_length"),
            cache=WARCCachingConfig(header_bytes=True),
        )
        p.parse(cache_records=True)
        out = find_matching_request_response_pairs(p.records)
        pairs = {
            (req.start, resp.start)
            for plist in out["pairs_by_uri"].values()
            for req, resp in plist
        }
        lone_req = {
            r.start
            for rlist in out["lone_requests_by_uri"].values()
            for r in rlist
        }
        lone_resp = {
            r.start
            for rlist in out["lone_responses_by_uri"].values()
            for r in rlist
        }
        return pairs, lone_req, lone_resp
    finally:
        sys.path.remove(_REF_SRC)


@pytest.mark.skipif(
    not os.path.isdir(_REF_SRC),
    reason="reference checkout not present (repo is standalone)",
)
def test_differential_pair_matching_vs_reference(spark):
    """16 fuzzed interleavings: identical pair assignments and lone sets —
    including responses queued before their requests, per-URI FIFO order
    across repeats, case-insensitive WARC-Type, and NULL-URI records (which
    the reference keys on None and the rank-join on eqNullSafe)."""
    from wbx import warcio
    from wbx.analytics import match_pairs

    for seed in range(16):
        data = _fuzz_pairs_archive(seed)
        want_pairs, want_lreq, want_lresp = _reference_pairs(data)
        files = spark.createDataFrame(
            [("fuzz.warc", bytearray(data))], "source_file string, content binary"
        )
        rows = match_pairs(warcio.scan_files_to_records(files)).collect()
        got_pairs = {
            (r["req_start"], r["resp_start"])
            for r in rows
            if r["pair_type"] == "pair"
        }
        got_lreq = {r["req_start"] for r in rows if r["pair_type"] == "lone_request"}
        got_lresp = {r["resp_start"] for r in rows if r["pair_type"] == "lone_response"}
        assert got_pairs == want_pairs, f"seed {seed} pairs"
        assert got_lreq == want_lreq, f"seed {seed} lone requests"
        assert got_lresp == want_lresp, f"seed {seed} lone responses"
