"""WARC scan/write tests — synthetic fixtures, standalone.

Offset conventions + quirk expectations were verified against the reference
parser (parsers/warc.py, patches.py) on both synthetic archives and the
example.com fixtures before being hard-coded here; member-offset and
record-offset parity on the reference's real .warc.gz was exact
(SURVEY.md §5 layer 1).
"""

from __future__ import annotations

import gzip

import pytest

from wbx import warcio
from wbx.warcio import CRLF


def make_record(body: bytes, warc_type: bytes = b"response", extra: bytes = b"") -> bytes:
    """One wire-format record incl. trailing CRLFCRLF terminator."""
    header = (
        b"WARC/1.1\r\nWARC-Type: " + warc_type + b"\r\n"
        b"WARC-Target-URI: http://example.com/\r\n"
        b"Content-Type: application/http; msgtype=response\r\n" + extra +
        b"Content-Length: " + str(len(body)).encode() + b"\r\n"
    )
    return header + CRLF + body + CRLF * 2


class TestContentLengthScan:
    def test_two_records_offsets(self):
        r1 = make_record(b"HTTP/1.1 200 OK\r\nX: 1\r\n\r\nhello")
        r2 = make_record(b"HTTP/1.1 404\r\n\r\nbye")
        result = warcio.scan_warc(r1 + r2, "f")
        assert len(result.records) == 2
        a, b = result.records
        # record = [header_start, content_end); header includes its last CRLF;
        # blank line excluded; terminator CRLFCRLF excluded
        assert a["record_start"] == 0
        assert a["record_end"] == len(r1) - 4
        assert a["header_end"] + 2 == a["content_start"]
        assert a["content_block"] == b"HTTP/1.1 200 OK\r\nX: 1\r\n\r\nhello"
        assert a["header_bytes"].endswith(b"Content-Length: 30\r\n")
        assert b["record_start"] == len(r1)
        assert b["record_end"] == len(r1) + len(r2) - 4
        assert result.warnings == [] and result.error is None

    def test_projected_fields(self):
        rec = make_record(b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n\r\nhi")
        r = warcio.scan_warc(rec, "f").records[0]
        assert r["warc_type"] == "response"
        assert r["target_uri"] == "http://example.com/"
        assert r["content_type"] == "application/http; msgtype=response"
        assert r["http_status"] == 200
        assert r["http_content_type"] == "text/html; charset=UTF-8"
        assert r["warc_version"] == "WARC/1.1"
        assert r["is_warc"] is True

    def test_request_verb(self):
        body = b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n"
        rec = make_record(body, extra=b"")
        r = warcio.scan_warc(rec, "f").records[0]
        assert r["http_verb"] == "GET"

    def test_junk_lines_between_records(self):
        r1, r2 = make_record(b"abc"), make_record(b"defgh")
        data = r1 + b"JUNK1\r\nJUNK2\r\n" + r2
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 2
        assert [(u["start"], u["end"]) for u in result.unparsable] == [
            (len(r1), len(r1) + 7),
            (len(r1) + 7, len(r1) + 14),
        ]
        assert result.unparsable[0]["bytes"] == b"JUNK1\r\n"

    def test_missing_content_length_block_becomes_unparsable_lines(self):
        bad = b"WARC/1.1\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n"
        data = bad + make_record(b"ok")
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 1
        # each header-block line → one unparsable line, end = start+len+2
        assert [(u["start"], u["end"]) for u in result.unparsable][:2] == [
            (0, 10),
            (10, 31),
        ]

    def test_zero_content_length_is_unparsable_quirk(self):
        # `if not content_length` in the reference treats 0 as missing
        data = make_record(b"") + make_record(b"ok")
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 1
        assert result.records[0]["content_block"] == b"ok"
        assert len(result.unparsable) > 0

    def test_improper_termination_warns(self):
        data = make_record(b"abc")[:-4] + make_record(b"next")
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 2
        assert "improperly terminated" in result.warnings[0]

    def test_not_a_warc_sets_error(self):
        result = warcio.scan_warc(b"this is not a warc file\r\n", "f")
        assert result.error == "No WARC header found."
        assert result.records == []

    def test_leading_whitespace_skipped_silently(self):
        data = b"\r\n  \r\n" + make_record(b"data")
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 1
        assert result.records[0]["record_start"] == 6
        assert result.unparsable == []

    def test_truncated_content(self):
        data = make_record(b"0123456789")[:-8]
        result = warcio.scan_warc(data, "f")
        assert len(result.records) == 1
        assert result.records[0]["content_end"] == len(data)
        assert "improperly terminated" in result.warnings[0]


class TestDelimiterScan:
    def test_agrees_with_content_length_on_clean_file(self):
        # bodies end with \n\n so the final delimiter is the two-CRLF-only
        # pattern the reference requires at EOF
        r1 = make_record(b"HTTP/1.1 200 OK\r\nX: 1\r\n\r\n<html>hello</html>\n\n")
        r2 = make_record(b"HTTP/1.1 404\r\n\r\n<html>bye</html>\n\n")
        data = r1 + r2
        a = warcio.scan_warc(data, "f", "content_length")
        b = warcio.scan_warc(data, "f", "delimiter")
        keys = ["record_start", "record_end", "header_start", "header_end", "content_start", "content_end"]
        assert [[r[k] for k in keys] for r in a.records] == [
            [r[k] for k in keys] for r in b.records
        ]

    def test_content_length_check(self):
        data = make_record(b"HTTP/1.1 200\r\n\r\nbody\n\n", extra=b"")
        rec = warcio.scan_warc(data, "f", "delimiter").records[0]
        assert rec["content_length_ok"] is True

    def test_bad_content_length_detected(self):
        body = b"HTTP/1.1 200\r\n\r\nbody\n\n"
        header = (
            b"WARC/1.1\r\nWARC-Type: response\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: 9999\r\n"
        )
        data = header + CRLF + body + CRLF * 2 + make_record(b"x\n\n")
        recs = warcio.scan_warc(data, "f", "delimiter").records
        assert recs[0]["content_length_ok"] is False

    def test_truncated_last_record_collapses_like_reference(self):
        # reference parity (parsers/warc.py:336-339 + preserve_cursor): no
        # delimiter before EOF ⇒ record collapses to (start, start), warning
        # is emitted, and the tail (minus 4 skipped bytes) becomes
        # unparsable lines — see tests/test_parser_parity.py for goldens
        data = make_record(b"hello")  # body has no trailing CRLF before terminator
        result = warcio.scan_warc(data, "f", "delimiter")
        assert result.warnings == ["Last record may have been truncated."]
        assert len(result.records) == 1
        assert result.records[0]["record_start"] == result.records[0]["record_end"] == 0
        assert result.unparsable and result.unparsable[0]["start"] == 4


class TestGzip:
    def test_member_index_roundtrip(self):
        recs = [b"WARC/1.1\r\nContent-Length: 2\r\n\r\nab", b"WARC/1.1\r\nContent-Length: 3\r\n\r\ncde"]
        gz = warcio.write_warc_gz(recs)
        members = warcio.index_gzip_members(gz)
        assert len(members) == 2
        assert members[0][0] == 0
        assert members[0][1] == members[1][0]  # contiguous compressed spans
        assert members[1][1] == len(gz)
        # uncompressed spans cover the concatenation exactly
        total_unc = sum(len(r) + 4 for r in recs)
        assert members[0][2] == 0 and members[-1][3] == total_unc

    def test_scan_warc_gz_records_and_member_attribution(self):
        wire = [
            make_record(b"HTTP/1.1 200\r\n\r\nfirst")[:-4],
            make_record(b"HTTP/1.1 404\r\n\r\nsecond")[:-4],
        ]
        gz = warcio.write_warc_gz(wire)
        result, non_warc = warcio.scan_warc_gz(gz, "f")
        assert len(result.records) == 2 and non_warc == []
        members = warcio.index_gzip_members(gz)
        for rec, m in zip(result.records, members):
            assert (rec["member_start"], rec["member_end"]) == (m[0], m[1])
            assert (rec["unc_start"], rec["unc_end"]) == (m[2], m[3])
            assert m[2] <= rec["record_start"] < m[3]

    def test_non_warc_member_detected(self):
        gz = warcio.write_warc_gz([make_record(b"HTTP/1.1 200\r\n\r\nok")[:-4]])
        gz += gzip.compress(b"not a warc at all", mtime=0)
        result, non_warc = warcio.scan_warc_gz(gz, "f")
        assert len(result.records) == 1
        assert len(non_warc) == 1
        assert non_warc[0]["bytes"] == b"not a warc at all"

    def test_single_member_warning(self):
        whole = gzip.compress(make_record(b"HTTP/1.1 200\r\n\r\nok"), mtime=0)
        result, _ = warcio.scan_warc_gz(whole, "f")
        assert "only contains one gzip member" in result.warnings[0]

    def test_write_warc(self):
        recs = [b"A", b"B"]
        assert warcio.write_warc(recs) == b"A\r\n\r\nB\r\n\r\n"


class TestWacz:
    def test_open_wacz(self):
        import io as _io
        import json
        import zipfile

        gz = warcio.write_warc_gz([make_record(b"HTTP/1.1 200\r\n\r\nok")[:-4]])
        buf = _io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(
                "datapackage.json",
                json.dumps({"resources": [{"path": "archive/data.warc.gz"}]}),
            )
            zf.writestr("archive/data.warc.gz", gz)
        assert warcio.open_wacz(buf.getvalue()) == gz

    def test_wacz_scan_matches_inner_archive(self, spark):
        """A .wacz and its inner .warc.gz must yield identical records —
        the reference opens WACZ transparently (utils.py:307-369); every
        record field except source_file must agree."""
        from wbx.fixtures import wacz_bytes

        gz = warcio.write_warc_gz(
            [
                make_record(b"HTTP/1.1 200 OK\r\n\r\nhello")[:-4],
                make_record(b"HTTP/1.1 404\r\n\r\nbye")[:-4],
            ]
        )
        files = spark.createDataFrame(
            [("a.warc.gz", bytearray(gz)), ("a.wacz", bytearray(wacz_bytes(gz)))],
            "source_file string, content binary",
        )
        rows = warcio.scan_files_to_records(files).collect()
        key = lambda r: (r["record_start"], r["record_end"], r["member_start"],
                         r["member_end"], r["warc_type"], r["http_status"],
                         bytes(r["content_block"]))
        via_gz = sorted(key(r) for r in rows if r["source_file"] == "a.warc.gz")
        via_wacz = sorted(key(r) for r in rows if r["source_file"] == "a.wacz")
        assert via_gz == via_wacz and len(via_gz) == 2

    def test_wacz_with_plain_warc_resource(self, spark):
        from wbx.fixtures import wacz_bytes

        plain = make_record(b"HTTP/1.1 200 OK\r\n\r\nplain")
        wz = wacz_bytes(plain, archive_name="archive/data.warc")
        files = spark.createDataFrame(
            [("p.wacz", bytearray(wz))], "source_file string, content binary"
        )
        rows = warcio.scan_files_to_records(files).collect()
        assert len(rows) == 1 and rows[0]["warc_type"] == "response"
        assert rows[0]["member_start"] is None  # not gzipped inside


class TestSparkScan:
    def test_scan_files_to_records(self, spark):
        r1 = make_record(b"HTTP/1.1 200 OK\r\n\r\nhello")
        r2 = make_record(b"GET / HTTP/1.1\r\n\r\n", warc_type=b"request")
        gz = warcio.write_warc_gz([make_record(b"HTTP/1.1 404\r\n\r\nbye")[:-4]])
        files = spark.createDataFrame(
            [("a.warc", bytearray(r1 + r2)), ("b.warc.gz", bytearray(gz))],
            "source_file string, content binary",
        )
        records = warcio.scan_files_to_records(files)
        rows = records.orderBy("source_file", "record_start").collect()
        assert [(r["source_file"], r["warc_type"]) for r in rows] == [
            ("a.warc", "response"),
            ("a.warc", "request"),
            ("b.warc.gz", "response"),
        ]
        assert rows[2]["member_start"] == 0 and rows[2]["is_warc"]

    def test_unparsable_side_output(self, spark):
        data = make_record(b"abc") + b"JUNK\r\n" + make_record(b"def")
        files = spark.createDataFrame(
            [("a.warc", bytearray(data))], "source_file string, content binary"
        )
        unp = warcio.scan_files_to_unparsable(files).collect()
        assert len(unp) == 1 and bytes(unp[0]["bytes"]) == b"JUNK\r\n"

    def test_diagnostics_side_output(self, spark):
        files = spark.createDataFrame(
            [("bad.warc", bytearray(b"nope\r\n"))], "source_file string, content binary"
        )
        diag = warcio.scan_files_to_diagnostics(files).collect()
        assert [(d["kind"], d["message"]) for d in diag] == [
            ("error", "No WARC header found.")
        ]


def _mixed_corpus(spark):
    """Plain + record-gz containers, warcinfo/request/response records,
    gzip/br/zstd bodies, junk lines — every shape the scan kernels handle."""
    from wbx.fixtures import synth_warc_files, synth_warc_files_rich

    docs = spark.range(24).selectExpr(
        "id AS doc_id", "concat('fused parity text ', id, ' lorem ipsum') AS text"
    )
    rich = synth_warc_files_rich(docs, n_files=4)
    coded = synth_warc_files(
        docs, n_files=2, gzip_body="mixed", prefix="coded", junk_every=5
    )
    return rich.unionByName(coded)


class TestFusedTextScan:
    """scan_files_to_text must be indistinguishable (on its columns) from
    scan_files_to_records → extract_text_udf — the fused hot path is an
    optimization, never a semantics change."""

    def test_fused_matches_general_path(self, spark):
        from pyspark.sql import functions as F

        from wbx.extract import extract_text_udf

        files = _mixed_corpus(spark)
        general = (
            warcio.scan_files_to_records(files)
            .filter(F.col("is_warc"))
            .select(
                "source_file",
                "record_start",
                "record_end",
                "warc_type",
                "target_uri",
                "http_status",
                extract_text_udf(
                    F.col("content_block"), F.col("header_bytes")
                ).alias("text"),
            )
        )
        fused = warcio.scan_files_to_text(files)
        a = sorted(tuple(r) for r in general.collect())
        b = sorted(tuple(r) for r in fused.collect())
        assert a == b
        assert any(r[6] for r in b)  # texts actually extracted

    def test_fused_delimiter_style(self, spark):
        # rich corpus only: delimiter scanning over COMPRESSED bodies that
        # happen to contain CRLFCRLF mis-splits records and the decode then
        # raises — identically on both paths (reference DecodingException
        # parity), so the comparison needs text bodies.
        from pyspark.sql import functions as F

        from wbx.extract import extract_text_udf
        from wbx.fixtures import synth_warc_files_rich

        docs = spark.range(24).selectExpr(
            "id AS doc_id", "concat('fused parity text ', id) AS text"
        )
        files = synth_warc_files_rich(docs, n_files=4)
        general = (
            warcio.scan_files_to_records(files, style="delimiter")
            .filter(F.col("is_warc"))
            .select(
                "source_file",
                "record_start",
                extract_text_udf(
                    F.col("content_block"), F.col("header_bytes")
                ).alias("text"),
            )
        )
        fused = warcio.scan_files_to_text(files, style="delimiter").select(
            "source_file", "record_start", "text"
        )
        assert sorted(map(tuple, general.collect())) == sorted(
            map(tuple, fused.collect())
        )


class TestColumnPruning:
    """scan_files_to_records(columns=...) must agree with the full scan on
    the requested columns for every container/record shape."""

    def test_pruned_matches_full(self, spark):
        files = _mixed_corpus(spark)
        cols = [
            "source_file",
            "record_start",
            "warc_type",
            "target_uri",
            "http_status",
            "http_verb",
            "content_length",
            "is_warc",
        ]
        full = warcio.scan_files_to_records(files).select(*cols)
        pruned = warcio.scan_files_to_records(files, columns=cols)
        assert set(pruned.columns) == set(cols)  # RECORDS order, caller's set
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, pruned.select(*cols).collect())
        )

    def test_pruned_offsets_only(self, spark):
        files = _mixed_corpus(spark)
        cols = ["source_file", "record_start", "record_end", "is_warc"]
        full = warcio.scan_files_to_records(files).select(*cols)
        pruned = warcio.scan_files_to_records(files, columns=cols).select(*cols)
        assert sorted(map(tuple, full.collect())) == sorted(
            map(tuple, pruned.collect())
        )

    def test_unknown_column_rejected(self, spark):
        files = _mixed_corpus(spark)
        import pytest

        with pytest.raises(ValueError, match="unknown record columns"):
            warcio.scan_files_to_records(files, columns=["nope"])


class TestMemberStyle:
    """S5 per-member decompression (reference decompression_style='member',
    GzippedWARCMemberParser) vs the whole-file scan."""

    def _clean_gz(self):
        recs = [
            make_record(b"HTTP/1.1 200 OK\r\nX: 1\r\n\r\nhello")[:-4],
            make_record(b"HTTP/1.1 404\r\n\r\nbye")[:-4],
        ]
        return warcio.write_warc_gz(recs)

    def test_member_matches_file_on_record_gz(self):
        gz = self._clean_gz()
        file_res, file_nw = warcio.scan_warc_gz(gz, "a.warc.gz")
        mem_res, mem_nw = warcio.scan_warc_gz_member(gz, "a.warc.gz")
        assert file_nw == [] and mem_nw == []
        keys = [
            "record_start", "record_end", "header_start", "header_end",
            "content_start", "content_end", "member_start", "member_end",
            "unc_start", "unc_end", "warc_type", "target_uri",
            "content_length", "http_status", "content_block",
        ]
        assert [
            {k: r[k] for k in keys} for r in file_res.records
        ] == [{k: r[k] for k in keys} for r in mem_res.records]
        # quirk parity (ref gzipped_warc.py:553-557): the reference warns
        # on members that DO end with CRLFCRLF — i.e. on every well-formed
        # record-per-member archive
        assert (
            sum("expected WARC delimiter" in w for w in mem_res.warnings) == 2
        )

    def test_member_parses_only_first_record_per_member(self):
        # one member containing TWO records: member style sees only the first
        two = make_record(b"HTTP/1.1 200 OK\r\n\r\nab") + make_record(
            b"HTTP/1.1 200 OK\r\n\r\ncd"
        )
        gz = warcio.write_warc_gz([two[:-4]])
        file_res, _ = warcio.scan_warc_gz(gz, "f")
        mem_res, _ = warcio.scan_warc_gz_member(gz, "f")
        assert len(file_res.records) == 2
        assert len(mem_res.records) == 1
        assert mem_res.records[0]["record_start"] == 0
        # single-member warning text differs from the file-style parser's
        assert any("may not be composed" in w for w in mem_res.warnings)

    def test_non_warc_member(self):
        import gzip as _g

        gz = warcio.write_warc_gz(
            [make_record(b"HTTP/1.1 200 OK\r\n\r\nok")[:-4]]
        ) + _g.compress(b"not a warc record", mtime=0)
        mem_res, non_warc = warcio.scan_warc_gz_member(gz, "f")
        assert len(mem_res.records) == 1
        assert len(non_warc) == 1
        assert bytes(non_warc[0]["bytes"]) == b"not a warc record"
        assert any("does not appear to be a WARC record" in w for w in mem_res.warnings)

    def test_content_length_zero_member_is_non_warc(self):
        rec = (
            b"WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n"
        )
        gz = warcio.write_warc_gz([rec])
        mem_res, non_warc = warcio.scan_warc_gz_member(gz, "f")
        assert mem_res.records == [] and len(non_warc) == 1

    def test_no_split_records_offsets(self):
        gz = self._clean_gz()
        mem_res, _ = warcio.scan_warc_gz_member(gz, "f", split_records=False)
        assert len(mem_res.records) == 2
        r0, r1 = mem_res.records
        # record spans the member minus trailing CRLFCRLF, in unc-file coords
        assert r0["record_start"] == r0["unc_start"] == 0
        assert r0["record_end"] == r0["unc_end"] - 4
        assert r1["record_start"] == r1["unc_start"] == r0["unc_end"]
        assert r1["record_end"] == r1["unc_end"] - 4

    def test_spark_gz_style_member(self, spark):
        gz = self._clean_gz()
        files = spark.createDataFrame(
            [("a.warc.gz", bytearray(gz))], "source_file string, content binary"
        )
        mem = warcio.scan_files_to_records(files, gz_style="member")
        fil = warcio.scan_files_to_records(files, gz_style="file")
        cols = ["source_file", "record_start", "record_end", "target_uri", "http_status"]
        assert sorted(map(tuple, mem.select(*cols).collect())) == sorted(
            map(tuple, fil.select(*cols).collect())
        )


class TestFusedOnError:
    """A poison record (undecodable Content-Encoding) must not kill a 100-TB
    job unless the caller asked for reference raise-parity."""

    def _poison_corpus(self, spark):
        good = make_record(b"HTTP/1.1 200 OK\r\n\r\nfine")
        bad = make_record(
            b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot-gzip-bytes"
        )
        return spark.createDataFrame(
            [("p.warc", bytearray(good + bad))],
            "source_file string, content binary",
        )

    def test_raise_is_default_parity(self, spark):
        import pytest
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import PythonException

        files = self._poison_corpus(spark)
        with pytest.raises((PythonException, Py4JJavaError)):
            warcio.scan_files_to_text(files).collect()

    def test_null_policy_keeps_job_alive(self, spark):
        files = self._poison_corpus(spark)
        rows = sorted(
            warcio.scan_files_to_text(files, on_error="null").collect(),
            key=lambda r: r["record_start"],
        )
        assert [r["text"] for r in rows] == ["fine", None]

    def test_raw_policy_falls_back_like_reference_cli(self, spark):
        files = self._poison_corpus(spark)
        rows = sorted(
            warcio.scan_files_to_text(files, on_error="raw").collect(),
            key=lambda r: r["record_start"],
        )
        assert [r["text"] for r in rows] == ["fine", "not-gzip-bytes"]


class TestSplittableScan:
    """The splittable .warc.gz scan (index_gzip_splits + scan_splits_to_*)
    must be byte-identical to the whole-file scan — records, unparsable
    lines, diagnostics — across styles, junk, truncation, and archives whose
    records do NOT align with gzip members."""

    @staticmethod
    def _gz_members(chunks):
        return b"".join(gzip.compress(c, 6, mtime=0) for c in chunks)

    @classmethod
    def _record_gz(cls, n=40, junk_every=7):
        """Record-per-member archive with junk members and trailing junk
        inside members sprinkled in."""
        chunks = []
        for i in range(n):
            rec = make_record(b"HTTP/1.1 200 OK\r\nX-N: %d\r\n\r\nbody %d" % (i, i))
            if junk_every and i % junk_every == 3:
                rec += b"JUNK line %d\r\n" % i  # junk inside the member
            chunks.append(rec)
            if junk_every and i % junk_every == 5:
                chunks.append(b"pure junk member %d\r\n" % i)  # non-WARC member
        return cls._gz_members(chunks)

    def _write(self, tmp_path, name, data):
        p = tmp_path / name
        p.write_bytes(data)
        return str(tmp_path)

    def _assert_parity(self, spark, tmp_path, data, style="content_length",
                       gz_style="file", target=256, min_groups=2):
        import pandas as pd
        from pyspark.sql import functions as F

        path = self._write(tmp_path, "arc.warc.gz", data)
        files = (
            spark.read.format("binaryFile")
            .load(path)
            .select(F.col("path").alias("source_file"), "content")
        )
        whole = warcio.scan_files_to_records(files, style=style, gz_style=gz_style)
        splits = warcio.index_gzip_splits(files.select("source_file"), target)
        n_groups = splits.count()
        assert n_groups >= min_groups, f"expected a real split, got {n_groups} group(s)"
        split = warcio.scan_splits_to_records(splits, style=style, gz_style=gz_style)
        a = whole.toPandas().sort_values(["record_start", "unc_start"]).reset_index(drop=True)
        b = split.toPandas().sort_values(["record_start", "unc_start"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # side channels
        if gz_style == "file":
            ua = warcio.scan_files_to_unparsable(files, style).toPandas().sort_values(["start"]).reset_index(drop=True)
            ub = warcio.scan_splits_to_unparsable(splits, style).toPandas().sort_values(["start"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(ua, ub)
            da = warcio.scan_files_to_diagnostics(files, style).toPandas().sort_values(["message"]).reset_index(drop=True)
            db = warcio.scan_splits_to_diagnostics(splits, style).toPandas().sort_values(["message"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(da, db)
        return n_groups

    def test_stream_index_matches_in_memory(self, tmp_path):
        import io as _io

        for data in [
            self._record_gz(12),
            self._gz_members([b"a" * 10, b"b" * 500000, b"c"]),
            self._record_gz(3) + b"\x1f\x8btrunc-garbage",
            gzip.compress(b"single", 6)[:-5],  # truncated single member
            b"",
        ]:
            expect = warcio.index_gzip_members(data)
            got = [
                m[:4]
                for m in warcio.iter_gzip_members_stream(_io.BytesIO(data), chunk_size=7)
            ]
            assert got == expect, data[:20]

    def test_stream_index_head_tail(self):
        import io as _io

        data = self._gz_members([b"W" * 100 + b"\r\n\r\n", b"xy"])
        ms = list(warcio.iter_gzip_members_stream(_io.BytesIO(data), chunk_size=3))
        assert ms[0][4] == b"W" * 64 and ms[0][5] == b"\r\n\r\n"
        assert ms[1][4] == b"xy" and ms[1][5] == b"xy"

    def test_remote_opener_reads_only_its_slice(self, spark, tmp_path):
        """The opener injection point: stage 2 against a fake remote scheme
        (mem://) must (a) produce byte-identical records and (b) issue
        exactly ONE ranged read per split, never touching bytes outside
        [comp_start, comp_end) — the property that makes each task a single
        range GET on object storage."""
        import pandas as pd
        from pyspark.sql import functions as F

        data = self._record_gz(40)
        backing = str(tmp_path / "arc.warc.gz")
        with open(backing, "wb") as f:
            f.write(data)
        log = str(tmp_path / "reads.log")

        class AuditFile:
            def __init__(self, path, uri, log_path):
                self._f = open(path, "rb")
                self._uri = uri
                self._log = log_path

            def seek(self, pos, whence=0):
                return self._f.seek(pos, whence)

            def read(self, n=-1):
                pos = self._f.tell()
                out = self._f.read(n)
                with open(self._log, "a") as lf:
                    lf.write(f"{self._uri}\t{pos}\t{pos + len(out)}\n")
                return out

            def close(self):
                self._f.close()

            def __enter__(self):
                return self

            def __exit__(self, *exc):
                self.close()
                return False

        def opener(uri):
            assert uri == "mem://bucket/arc.warc.gz", uri
            return AuditFile(backing, uri, log)

        files = spark.createDataFrame([(backing,)], "source_file string")
        whole = spark.read.format("binaryFile").load(backing).select(
            F.col("path").alias("source_file"), "content"
        )
        expect = (
            warcio.scan_files_to_records(whole)
            .drop("source_file")
            .toPandas()
            .sort_values(["record_start", "unc_start"])
            .reset_index(drop=True)
        )
        splits = warcio.index_gzip_splits(files, 256).withColumn(
            "source_file", F.lit("mem://bucket/arc.warc.gz")
        )
        split_rows = splits.collect()
        assert len(split_rows) >= 2
        got = (
            warcio.scan_splits_to_records(splits, opener=opener)
            .drop("source_file")
            .toPandas()
            .sort_values(["record_start", "unc_start"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(expect, got)
        # audit: one read per split, each exactly its own byte range
        with open(log) as lf:
            reads = sorted(
                tuple(int(x) for x in line.split("\t")[1:])
                for line in lf.read().splitlines()
            )
        want = sorted((r["comp_start"], r["comp_end"]) for r in split_rows)
        assert reads == want

    def test_remote_scheme_without_opener_is_rejected(self, spark, tmp_path):
        data = self._record_gz(6)
        p = tmp_path / "a.warc.gz"
        p.write_bytes(data)
        files = spark.createDataFrame([(str(p),)], "source_file string")
        from pyspark.sql import functions as F

        splits = warcio.index_gzip_splits(files, 256).withColumn(
            "source_file", F.lit("s3://bucket/a.warc.gz")
        )
        with pytest.raises(Exception, match="no opener registered"):
            warcio.scan_splits_to_records(splits).collect()

    def test_parity_content_length(self, spark, tmp_path):
        self._assert_parity(spark, tmp_path, self._record_gz(), "content_length")

    def test_parity_delimiter(self, spark, tmp_path):
        self._assert_parity(spark, tmp_path, self._record_gz(), "delimiter")

    def test_parity_member_style(self, spark, tmp_path):
        self._assert_parity(spark, tmp_path, self._record_gz(), gz_style="member")

    def test_parity_truncated_tail(self, spark, tmp_path):
        data = self._record_gz(20, junk_every=None) + gzip.compress(
            make_record(b"HTTP/1.1 200 OK\r\n\r\nlast"), 6
        )[:-6]
        for style in ("content_length", "delimiter"):
            self._assert_parity(spark, tmp_path, data, style)

    def test_parity_records_spanning_members(self, spark, tmp_path):
        # records do NOT align with members: the raw WARC bytes are cut into
        # arbitrary 700-byte gzip members → no clean split points → the
        # planner must fall back to one group and stay exact
        raw = b"".join(
            make_record(b"HTTP/1.1 200 OK\r\n\r\npayload %d" % i) for i in range(30)
        )
        chunks = [raw[i : i + 700] for i in range(0, len(raw), 700)]
        data = self._gz_members(chunks)
        for style in ("content_length", "delimiter"):
            n = self._assert_parity(spark, tmp_path, data, style, min_groups=1)
            assert n == 1  # planner refused to split a non-aligned archive

    def test_parity_junk_first_file(self, spark, tmp_path):
        # whole-file scan errors with "No WARC header found." and emits NO
        # records; the planner must keep such a file in one group
        data = self._gz_members(
            [b"this is not warc\r\n"]
            + [make_record(b"HTTP/1.1 200 OK\r\n\r\nx")] * 10
        )
        n = self._assert_parity(spark, tmp_path, data, min_groups=1)
        assert n == 1

    def test_split_text_matches_whole_text(self, spark, tmp_path):
        import pandas as pd
        from pyspark.sql import functions as F

        path = self._write(tmp_path, "arc.warc.gz", self._record_gz(30, junk_every=None))
        files = (
            spark.read.format("binaryFile")
            .load(path)
            .select(F.col("path").alias("source_file"), "content")
        )
        splits = warcio.index_gzip_splits(files.select("source_file"), 256)
        assert splits.count() > 2
        a = warcio.scan_files_to_text(files).toPandas().sort_values("record_start").reset_index(drop=True)
        b = warcio.scan_splits_to_text(splits).toPandas().sort_values("record_start").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_group_planning_respects_target(self):
        import io as _io

        data = self._record_gz(40, junk_every=None)
        ms = list(warcio.iter_gzip_members_stream(_io.BytesIO(data)))
        groups = warcio.plan_member_groups(ms, target_bytes=len(data) // 5)
        assert 3 <= len(groups) <= 7
        # contiguous, covering, ordered
        assert groups[0]["comp_start"] == 0
        assert groups[-1]["comp_end"] == len(data)
        for g1, g2 in zip(groups, groups[1:]):
            assert g1["comp_end"] == g2["comp_start"]
            assert g1["unc_end"] == g2["unc_start"]
        assert sum(g["n_members"] for g in groups) == 40


class TestConfigErrorParity:
    """Config-validation error strings asserted by the reference's own tests
    (test_warc_parser.py:189,312,408; test_gzipped_warc_parser.py:16,31,110)
    must match exactly for drop-in parity of error paths."""

    def test_unsupported_parsing_style(self):
        with pytest.raises(ValueError) as e:
            warcio.scan_warc(b"", style="unsupported_style")
        assert "Supported parsing styles: delimiter, content_length" in str(e.value)

    def test_unsupported_decompression_style(self):
        with pytest.raises(ValueError) as e:
            warcio.scan_archive(b"", "x.warc.gz", gz_hint=True, gz_style="nope")
        assert "Supported decompression styles: member, file" in str(e.value)

    def test_member_parser_single_style(self):
        with pytest.raises(ValueError) as e:
            warcio.scan_archive(
                b"", "x.warc.gz", style="delimiter", gz_hint=True, gz_style="member"
            )
        assert "Supported parsing styles: split_gzip_members" in str(e.value)

    def test_check_content_lengths_requires_split(self):
        with pytest.raises(ValueError) as e:
            warcio.scan_warc_gz_member(
                b"", wanted=frozenset({"content_length_ok"}), split_records=False
            )
        assert str(e.value) == "To check_content_lengths, you must split records."

    def test_header_columns_require_split(self):
        with pytest.raises(ValueError) as e:
            warcio.scan_warc_gz_member(
                b"", wanted=frozenset({"header_bytes"}), split_records=False
            )
        assert (
            str(e.value)
            == "To cache or parse header or content block bytes, you must split records."
        )

    def test_offsets_only_mode_still_valid(self):
        result, _ = warcio.scan_warc_gz_member(
            gzip.compress(make_record(b"HTTP/1.1 200 OK\r\n\r\nx"), 6),
            wanted=None,
            split_records=False,
        )
        assert len(result.records) == 1


class TestLoaderSplitRouting:
    def test_mixed_dir_routes_big_gz_through_splits(self, spark, tmp_path):
        """A directory with a plain .warc, a small .warc.gz, and a 'big'
        .warc.gz (threshold forced tiny) must produce exactly the union of
        whole-file scans — the routing changes the physical plan, not the
        records. The length predicates are pure atoms the binaryFile source
        can evaluate before reading content."""
        import pandas as pd

        from wbx.cli import load_records

        gz_small = TestSplittableScan._gz_members(
            [make_record(b"HTTP/1.1 200 OK\r\n\r\nsmall %d" % i) for i in range(3)]
        )
        gz_big = TestSplittableScan._gz_members(
            [make_record(b"HTTP/1.1 200 OK\r\n\r\nbig %d" % i) for i in range(50)]
        )
        plain = b"".join(
            make_record(b"HTTP/1.1 200 OK\r\n\r\nplain %d" % i) for i in range(3)
        )
        (tmp_path / "a.warc").write_bytes(plain)
        (tmp_path / "b.warc.gz").write_bytes(gz_small)
        (tmp_path / "c.warc.gz").write_bytes(gz_big)

        def collect(split_bytes):
            df = load_records(
                spark, str(tmp_path), "warc", "content_length",
                split_target_bytes=split_bytes,
            )
            return (
                df.toPandas()
                .sort_values(["source_file", "record_start", "unc_start"])
                .reset_index(drop=True)
            )

        with_split = collect(len(gz_big) // 8)  # c.warc.gz >= 2x target
        without = collect(None)
        pd.testing.assert_frame_equal(with_split, without)
        assert len(with_split) == 56


class TestWetExport:
    """export_wet writes Common-Crawl-style conversion records that the
    engine's OWN splittable .warc.gz scanner reads back byte-identically —
    the export is a first-class archive, not a one-way dump."""

    def _pages(self, spark):
        from datetime import datetime

        return spark.createDataFrame(
            [
                (
                    f"http://h{i % 3}.example/p/{i}",
                    datetime(2024, 1, 1, 0, 0, i),
                    f"text body {i} é\n",
                )
                for i in range(7)
            ],
            "url string, warc_ts timestamp, text string",
        )

    def test_roundtrip_through_own_scanner(self, spark, tmp_path):
        import glob
        import os

        from wbx.sinks import export_wet

        out = str(tmp_path / "wet")
        manifest = export_wet(self._pages(spark), out, files=2).collect()
        assert sum(m["n_records"] for m in manifest) == 7
        assert {os.path.dirname(m["path"]) for m in manifest} == {out}
        files = spark.createDataFrame(
            [
                (os.path.basename(p), bytearray(open(p, "rb").read()))
                for p in sorted(glob.glob(out + "/*.warc.gz"))
            ],
            "source_file string, content binary",
        )
        rows = warcio.scan_files_to_records(files).collect()
        assert len(rows) == 7
        got = {
            r["target_uri"]: bytes(r["content_block"]).decode() for r in rows
        }
        want = {
            f"http://h{i % 3}.example/p/{i}": f"text body {i} é\n"
            for i in range(7)
        }
        assert got == want
        assert all(r["warc_type"] == "conversion" for r in rows)
        # Content-Length counted utf-8 BYTES (the é page), so the parsed
        # length matches the materialized block exactly on every record
        assert all(
            r["content_length"] == len(bytes(r["content_block"])) for r in rows
        )

    def test_export_is_deterministic(self, spark, tmp_path):
        from wbx.sinks import export_wet

        blobs = []
        for name in ("x", "y"):
            out = str(tmp_path / name)
            export_wet(self._pages(spark), out, files=2).collect()
            import glob

            blobs.append(
                [open(p, "rb").read() for p in sorted(glob.glob(out + "/*.warc.gz"))]
            )
        assert blobs[0] == blobs[1] and len(blobs[0]) == 2

    def test_null_text_record_hits_reference_truthy_length_quirk(
        self, spark, tmp_path
    ):
        """A null/empty text page exports as a spec-valid zero-length
        conversion record, but the scanner mirrors the reference's
        truthy-Content-Length rule (gzipped_warc.py:508 — 'Content-Length:
        0' is falsy), so reading it back yields NO record: the bytes land
        in the unparsable-lines side output instead of being dropped."""
        import glob
        import os
        from datetime import datetime

        from wbx.sinks import export_wet

        pages = spark.createDataFrame(
            [("http://n.example/", datetime(2024, 1, 1), None)],
            "url string, warc_ts timestamp, text string",
        )
        out = str(tmp_path / "nulltext")
        manifest = export_wet(pages, out, files=1).collect()
        assert manifest[0]["n_records"] == 1
        files = spark.createDataFrame(
            [
                (os.path.basename(p), bytearray(open(p, "rb").read()))
                for p in glob.glob(out + "/*.warc.gz")
            ],
            "source_file string, content binary",
        )
        rows = warcio.scan_files_to_records(files).collect()
        # no parsed WARC record — the member is attributed as non-WARC data
        assert [bool(r["is_warc"]) for r in rows] == [False]
        assert rows[0]["warc_type"] is None
        lines = warcio.scan_files_to_unparsable(files).collect()
        assert any(b"WARC-Target-URI" in bytes(r["bytes"]) for r in lines)


class TestWarcDedupedExport:
    """export_warc_deduped writes first captures verbatim and later
    captures as slim WARC 1.1 revisit records (identical-payload-digest
    profile), re-readable by the engine's own scanner."""

    DUP = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>duplicated payload body</html>"
    UNIQ = b"HTTP/1.1 200 OK\r\nX: u\r\n\r\nunique body"

    @staticmethod
    def _rec(uri: bytes, date: bytes, body: bytes, warc_type=b"response"):
        """Wire record WITHOUT the CRLFCRLF terminator (write_warc_gz adds it)."""
        return (
            b"WARC/1.1\r\nWARC-Type: " + warc_type +
            b"\r\nWARC-Target-URI: " + uri +
            b"\r\nWARC-Date: " + date +
            b"\r\nContent-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            + CRLF + body
        )

    def _records(self, spark):
        a = warcio.write_warc_gz(
            [
                self._rec(b"http://e.com/1", b"2024-01-01T00:00:01Z", self.DUP),
                self._rec(
                    b"http://e.com/1", b"2024-01-01T00:00:01Z",
                    b"GET /1 HTTP/1.1\r\n\r\n", warc_type=b"request",
                ),
                self._rec(b"http://e.com/2", b"2024-01-01T00:00:02Z", self.UNIQ),
            ]
        )
        b = warcio.write_warc_gz(
            [self._rec(b"http://e.com/3", b"2024-02-02T00:00:03Z", self.DUP)]
        )
        files = spark.createDataFrame(
            [("a.warc.gz", bytearray(a)), ("b.warc.gz", bytearray(b))],
            "source_file string, content binary",
        )
        return warcio.scan_files_to_records(files)

    def _rescan(self, spark, out):
        import glob
        import os

        files = spark.createDataFrame(
            [
                (os.path.basename(p), bytearray(open(p, "rb").read()))
                for p in sorted(glob.glob(out + "/*.warc.gz"))
            ],
            "source_file string, content binary",
        )
        return warcio.scan_files_to_records(files).collect()

    def test_roundtrip_keepers_verbatim_revisit_slim(self, spark, tmp_path):
        from wbx.sinks import export_warc_deduped

        out = str(tmp_path / "dedup")
        manifest = export_warc_deduped(self._records(spark), out, files=1).collect()
        assert sum(m["n_records"] for m in manifest) == 4

        rows = {r["target_uri"]: r for r in self._rescan(spark, out)}
        assert len(rows) == 4 - 1  # /1 appears as response + request
        # first capture of the duplicated payload: byte-identical keeper
        by_type = {}
        for r in self._rescan(spark, out):
            by_type.setdefault((r["target_uri"], r["warc_type"]), r)
        keeper = by_type[("http://e.com/1", "response")]
        assert bytes(keeper["content_block"]) == self.DUP
        uniq = by_type[("http://e.com/2", "response")]
        assert bytes(uniq["content_block"]) == self.UNIQ
        req = by_type[("http://e.com/1", "request")]
        assert bytes(req["content_block"]) == b"GET /1 HTTP/1.1\r\n\r\n"

        # later capture became a slim revisit: HTTP headers kept, body gone
        rev = by_type[("http://e.com/3", "revisit")]
        assert bytes(rev["content_block"]) == (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        )
        assert rev["content_length"] == len(bytes(rev["content_block"]))
        hdr = bytes(rev["header_bytes"]).decode()
        # version line must agree with the 1.1 profile URI + 1.1-only
        # Refers-To headers (strict validators flag a mismatch)
        assert hdr.startswith("WARC/1.1\r\n")
        assert (
            "WARC-Profile: http://netpreserve.org/warc/1.1/revisit/"
            "identical-payload-digest" in hdr
        )
        import hashlib

        assert f"WARC-Payload-Digest: sha1:{hashlib.sha1(self.DUP).hexdigest()}" in hdr
        assert "WARC-Refers-To-Target-URI: http://e.com/1" in hdr
        assert "WARC-Refers-To-Date: 2024-01-01T00:00:01Z" in hdr
        assert "WARC-Refers-To-Filename: a.warc.gz" in hdr
        assert "WARC-Refers-To-File-Offset: 0" in hdr
        assert rev["warc_date"] == "2024-02-02T00:00:03Z"

        # the duplicated payload body exists exactly ONCE in the export
        # (the keeper's copy) — that is the dedup: at real duplication
        # rates the dropped bodies dwarf the ~300 bytes of revisit headers
        import glob
        import gzip as _gz

        blob = b"".join(
            _gz.decompress(open(p, "rb").read())
            for p in sorted(glob.glob(out + "/*.warc.gz"))
        )
        assert blob.count(b"<html>duplicated payload body</html>") == 1

    def test_deterministic_across_partitionings(self, spark, tmp_path):
        from wbx.sinks import export_warc_deduped

        out1 = str(tmp_path / "d1")
        out2 = str(tmp_path / "d2")
        export_warc_deduped(self._records(spark), out1, files=1).collect()
        export_warc_deduped(
            self._records(spark).repartition(5), out2, files=1
        ).collect()
        import glob

        b1 = b"".join(open(p, "rb").read() for p in sorted(glob.glob(out1 + "/*")))
        b2 = b"".join(open(p, "rb").read() for p in sorted(glob.glob(out2 + "/*")))
        assert b1 == b2 and len(b1) > 0

    def test_missing_columns_raise(self, spark):
        from wbx.sinks import export_warc_deduped

        with pytest.raises(ValueError, match="warc_date"):
            export_warc_deduped(self._records(spark).drop("warc_date"), "/tmp/x")


class TestDigestEncodingExport:
    """WET/WAT exports with digest_encoding='base32' re-enter the scanner
    and audit clean — the interop form real replay tooling verifies."""

    def _pages(self, spark):
        from datetime import datetime

        return spark.createDataFrame(
            [
                (
                    f"http://h{i}.example/p/{i}",
                    datetime(2024, 1, 1, 0, 0, i),
                    f"text body {i}\n",
                    bytearray(f"<html><a href=\"/x{i}\">x</a></html>".encode()),
                )
                for i in range(5)
            ],
            "url string, warc_ts timestamp, text string, html binary",
        )

    def _audit(self, spark, out):
        import glob
        import os

        from wbx.analytics import audit_digests

        files = spark.createDataFrame(
            [
                (os.path.basename(p), bytearray(open(p, "rb").read()))
                for p in sorted(glob.glob(out + "/*.warc.gz"))
            ],
            "source_file string, content binary",
        )
        return audit_digests(warcio.scan_files_to_records(files)).collect()

    def test_wet_base32_audits_ok(self, spark, tmp_path):
        from wbx.sinks import export_wet

        out = str(tmp_path / "wet32")
        export_wet(self._pages(spark), out, files=1, digest_encoding="base32").collect()
        rows = self._audit(spark, out)
        assert len(rows) == 5
        assert all(r["encoding"] == "base32" and r["ok"] for r in rows)

    def test_wat_hex_default_audits_ok(self, spark, tmp_path):
        from wbx.sinks import export_wat

        out = str(tmp_path / "wat16")
        export_wat(self._pages(spark), out, files=1).collect()
        rows = self._audit(spark, out)
        assert len(rows) == 5
        assert all(r["encoding"] == "hex" and r["ok"] for r in rows)

    def test_bad_encoding_rejected(self, spark, tmp_path):
        import pytest

        from wbx.sinks import export_wet

        with pytest.raises(ValueError, match="digest_encoding"):
            export_wet(
                self._pages(spark), str(tmp_path / "x"), digest_encoding="b64"
            ).collect()
