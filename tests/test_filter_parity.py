"""Live differential parity for the filter library (F1-F8) vs the
reference's closure filters — every filter applied to the same fuzzed
archives by BOTH engines, keep-sets compared record-for-record.

Skipped when the reference checkout is absent (the repo stays standalone).
"""

from __future__ import annotations

import os
import random

import pytest

from tests.test_parser_parity import _REF_SRC, _install_codec_shims

SEP = b"\r\n\r\n"


def _fuzz_filter_archive(seed: int) -> bytes:
    """Archive with every record/content-type shape the filters dispatch
    on: responses (varied status/content-type/custom headers), requests
    (varied verbs incl. a lowercase one), warcinfo, resource, metadata."""
    rng = random.Random(30_000 + seed)
    recs = []
    for i in range(rng.randint(4, 9)):
        kind = rng.choice(["response", "request", "warcinfo", "resource", "metadata"])
        if kind == "response":
            status = rng.choice([200, 404, 301])
            hct = rng.choice(
                [b"text/html; charset=UTF-8", b"application/json", b"IMAGE/PNG", b"text/plain"]
            )
            custom = b"\r\nX-Custom: ValueOne" if rng.random() < 0.5 else b""
            http = (
                b"HTTP/1.1 " + str(status).encode() + b" ST\r\nContent-Type: "
                + hct + custom + b"\r\n\r\nbody " + str(i).encode()
            )
            ct = (
                b"application/http; msgtype=response"
                if rng.random() < 0.8
                else b"application/http;msgtype=response"
            )
        elif kind == "request":
            verb = rng.choice([b"GET", b"POST", b"get"])
            http = (
                verb + b" /p/" + str(i).encode()
                + b" HTTP/1.1\r\nHost: h.example\r\nUser-Agent: fuzz\r\n\r\n"
            )
            ct = b"application/http; msgtype=request"
        elif kind == "warcinfo":
            http = b"software: fuzz-fixture\r\n"
            ct = b"application/warc-fields"
        elif kind == "resource":
            http = b"\x89PNG-binary-bytes"
            ct = b"image/png"
        else:
            http = b"metadata body"
            ct = rng.choice([b"application/json", b"text/anvl"])
        extra = (
            b"WARC-Concurrent-To: <urn:x:" + str(i).encode() + b">\r\n"
            if rng.random() < 0.4
            else b""
        )
        header = (
            b"WARC/1.1\r\nWARC-Type: " + kind.encode()
            + b"\r\nWARC-Target-URI: https://site" + str(i % 3).encode()
            + b".example/p/" + str(i).encode() + b"\r\n" + extra
            + b"Content-Type: " + ct
            + b"\r\nContent-Length: " + str(len(http)).encode() + b"\r\n"
        )
        recs.append(header + b"\r\n" + http)
    return b"".join(r + SEP for r in recs)


# (case label, filter factory name, args, kwargs, engine-side factory
# override). The override handles the one documented tier split: the
# engine's fast named-field filter reads the parsed headers map while the
# reference regexes raw bytes — warc_named_field_filter_exact is the
# byte-exact twin.
CASES = [
    ("regex_ci", "warc_header_regex_filter", ("type: RES",), {}, None),
    ("regex_cs", "warc_header_regex_filter", ("Type: res",), {"case_insensitive": False}, None),
    ("regex_meta", "warc_header_regex_filter", (r"site[0-2]\.example/p/[02468]$",), {}, None),
    ("len_lt", "record_content_length_filter", (40,), {"use_operator": "lt"}, None),
    ("len_ge", "record_content_length_filter", (40,), {"use_operator": "ge"}, None),
    ("len_eq", "record_content_length_filter", (18,), {}, None),
    ("ctype_http", "record_content_type_filter", ("http",), {}, None),
    ("ctype_exact", "record_content_type_filter",
     ("application/http; msgtype=response",), {"exact_match": True}, None),
    ("ctype_cs", "record_content_type_filter", ("IMAGE/png",), {"case_insensitive": False}, None),
    ("named_type", "warc_named_field_filter", ("Type", "response"), {}, None),
    ("named_uri_exact", "warc_named_field_filter",
     ("Target-URI", "https://site1.example/p/1"), {"exact_match": True}, None),
    ("named_byte_tier", "warc_named_field_filter", ("Concurrent-To", "urn:x:"), {},
     "warc_named_field_filter_exact"),
    ("verb_get", "http_verb_filter", ("GET",), {}, None),
    ("verb_post", "http_verb_filter", ("POST",), {}, None),
    ("status_200", "http_status_filter", (200,), {}, None),
    ("status_404", "http_status_filter", ("404",), {}, None),
    ("hdr_ct_html", "http_header_filter", ("Content-Type", "html"), {}, None),
    ("hdr_custom", "http_header_filter", ("X-Custom", "valueone"), {}, None),
    ("resp_ct_sub", "http_response_content_type_filter", ("text/html",), {}, None),
    ("resp_ct_exact", "http_response_content_type_filter",
     ("application/json",), {"exact_match": True}, None),
]


def _reference_keep_sets(data: bytes) -> dict[str, set[int]]:
    import io
    import sys

    _install_codec_shims()
    sys.path.insert(0, _REF_SRC)
    try:
        from warcbench import WARCParser
        from warcbench import filters as rf
        from warcbench.config import WARCCachingConfig, WARCParsingConfig

        p = WARCParser(
            io.BufferedReader(io.BytesIO(data)),
            parsing_options=WARCParsingConfig(style="content_length"),
            cache=WARCCachingConfig(header_bytes=True, content_block_bytes=True),
        )
        p.parse(cache_records=True)
        out: dict[str, set[int]] = {}
        for label, name, args, kwargs, _ in CASES:
            flt = getattr(rf, name)(*args, **kwargs)
            out[label] = {r.start for r in p.records if flt(r)}
        return out
    finally:
        sys.path.remove(_REF_SRC)


@pytest.mark.skipif(
    not os.path.isdir(_REF_SRC),
    reason="reference checkout not present (repo is standalone)",
)
def test_differential_filters_vs_reference(spark):
    """12 fuzzed archives × 20 filter configurations: the engine's Column
    filters and the reference's closure filters keep identical record
    sets. One Spark pass per archive evaluates every case as a boolean
    column."""
    from pyspark.sql import functions as F

    from wbx import filters as wf
    from wbx import warcio

    for seed in range(12):
        data = _fuzz_filter_archive(seed)
        want = _reference_keep_sets(data)
        files = spark.createDataFrame(
            [("fuzz.warc", bytearray(data))], "source_file string, content binary"
        )
        recs = warcio.scan_files_to_records(files)
        cols = [F.col("record_start")]
        for label, name, args, kwargs, override in CASES:
            cols.append(getattr(wf, override or name)(*args, **kwargs).alias(label))
        rows = recs.select(*cols).collect()
        for label, *_ in CASES:
            got = {r["record_start"] for r in rows if r[label]}
            assert got == want[label], f"seed {seed} case {label}"
