"""Relational-rewrite equivalence tests: J1 FIFO pairing and J2 archive
comparison vs Python oracles of the reference algorithms, plus summarize
aggregates and netloc parity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from wbx import analytics
from tests.helpers import (
    RECORDS_MINI_SCHEMA,
    compare_headers_oracle,
    fifo_pairs_oracle,
    rec_row,
)


def records_df(spark, rows):
    return spark.createDataFrame(rows, RECORDS_MINI_SCHEMA)


class TestMatchPairs:
    def check(self, spark, rows):
        df = records_df(spark, rows)
        got = analytics.match_pairs(df).collect()
        exp_pairs, exp_lreq, exp_lresp = fifo_pairs_oracle(rows)
        got_pairs = sorted(
            (r["req_start"], r["resp_start"])
            for r in got
            if r["pair_type"] == "pair"
        )
        got_lreq = sorted(r["req_start"] for r in got if r["pair_type"] == "lone_request")
        got_lresp = sorted(
            r["resp_start"] for r in got if r["pair_type"] == "lone_response"
        )
        assert got_pairs == sorted(exp_pairs)
        assert got_lreq == sorted(exp_lreq)
        assert got_lresp == sorted(exp_lresp)

    def test_interleaved_duplicates(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="request", target_uri="u"),
            rec_row(record_start=10, warc_type="request", target_uri="u"),
            rec_row(record_start=20, warc_type="response", target_uri="u"),
            rec_row(record_start=30, warc_type="request", target_uri="u"),
            rec_row(record_start=40, warc_type="response", target_uri="u"),
        ]
        self.check(spark, rows)

    def test_response_before_request(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="response", target_uri="u"),
            rec_row(record_start=10, warc_type="request", target_uri="u"),
        ]
        self.check(spark, rows)

    def test_multiple_uris_and_lones(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="request", target_uri="a"),
            rec_row(record_start=10, warc_type="response", target_uri="b"),
            rec_row(record_start=20, warc_type="response", target_uri="a"),
            rec_row(record_start=30, warc_type="request", target_uri="c"),
            rec_row(record_start=40, warc_type="warcinfo", target_uri=None),
        ]
        self.check(spark, rows)

    def test_null_uri_pairs_together(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="request", target_uri=None),
            rec_row(record_start=10, warc_type="response", target_uri=None),
        ]
        self.check(spark, rows)

    def test_mixed_case_types(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="Request", target_uri="u"),
            rec_row(record_start=10, warc_type="RESPONSE", target_uri="u"),
        ]
        self.check(spark, rows)

    def test_randomized_streams(self, spark):
        rng = random.Random(42)
        uris = ["u1", "u2", "u3", None]
        rows = [
            rec_row(
                record_start=i * 10,
                warc_type=rng.choice(["request", "response", "metadata"]),
                target_uri=rng.choice(uris),
                source_file=rng.choice(["a.warc", "b.warc"]),
            )
            for i in range(200)
        ]
        self.check(spark, rows)

    def test_exclude_file_uris(self, spark):
        rows = [
            rec_row(record_start=0, warc_type="request", target_uri="file:///x"),
            rec_row(record_start=10, warc_type="response", target_uri="file:///x"),
            rec_row(record_start=20, warc_type="request", target_uri="http://a/"),
            rec_row(record_start=30, warc_type="response", target_uri="http://a/"),
        ]
        df = records_df(spark, rows)
        got = analytics.match_pairs(df, exclude_file_uris=True).collect()
        assert len(got) == 1 and got[0]["pair_type"] == "pair"


class TestCompareHeaders:
    def check(self, spark, rows1, rows2, **kw):
        got = (
            analytics.compare_headers_summary(
                records_df(spark, rows1), records_df(spark, rows2), **kw
            )
            .collect()[0]
            .asDict()
        )
        exp = compare_headers_oracle(
            rows1,
            rows2,
            compare_fields=kw.get("compare_fields", ("WARC-Payload-Digest", "Content-Length")),
            near_match_fields=kw.get(
                "near_match_fields", ("WARC-Payload-Digest", "Content-Length")
            ),
        )
        assert got == exp

    def h(self, digest="d1", length="10", extra=None):
        headers = {"WARC-Payload-Digest": [digest], "Content-Length": [length]}
        if extra is not None:
            headers["X-Extra"] = [extra]
        return headers

    def test_full_matrix(self, spark):
        rows1 = [
            # exact match
            rec_row(record_start=0, target_uri="m", headers=self.h()),
            # near match (digest differs)
            rec_row(record_start=10, target_uri="n", headers=self.h(digest="dA")),
            # unique (left-only uri)
            rec_row(record_start=20, target_uri="only1", headers=self.h()),
            # count-mismatch uri → skipped
            rec_row(record_start=30, target_uri="dup", headers=self.h()),
            rec_row(record_start=40, target_uri="dup", headers=self.h()),
            # warcinfo ignored
            rec_row(record_start=50, warc_type="warcinfo", target_uri=None),
        ]
        rows2 = [
            rec_row(record_start=0, target_uri="m", headers=self.h()),
            rec_row(record_start=10, target_uri="n", headers=self.h(digest="dB")),
            rec_row(record_start=20, target_uri="only2", headers=self.h()),
            rec_row(record_start=30, target_uri="dup", headers=self.h()),
        ]
        self.check(spark, rows1, rows2)

    def test_positional_zip_with_duplicates(self, spark):
        rows1 = [
            rec_row(record_start=0, target_uri="u", headers=self.h(digest="a")),
            rec_row(record_start=10, target_uri="u", headers=self.h(digest="b")),
        ]
        rows2 = [
            rec_row(record_start=0, target_uri="u", headers=self.h(digest="b")),
            rec_row(record_start=10, target_uri="u", headers=self.h(digest="a")),
        ]
        # zip is positional: (a,b) and (b,a) → both near-matching, 0 matching
        self.check(spark, rows1, rows2)

    def test_extra_field_makes_unique(self, spark):
        kw = dict(
            compare_fields=["WARC-Payload-Digest", "Content-Length", "X-Extra"],
            near_match_fields=["WARC-Payload-Digest", "Content-Length"],
        )
        rows1 = [rec_row(record_start=0, target_uri="u", headers=self.h(extra="1"))]
        rows2 = [rec_row(record_start=0, target_uri="u", headers=self.h(extra="2"))]
        self.check(spark, rows1, rows2, **kw)

    def test_absent_vs_null_field_values_differ(self, spark):
        # present-with-no-value (None) vs absent ("") must NOT be equal
        rows1 = [
            rec_row(
                record_start=0,
                target_uri="u",
                headers={"WARC-Payload-Digest": [None], "Content-Length": ["1"]},
            )
        ]
        rows2 = [
            rec_row(record_start=0, target_uri="u", headers={"Content-Length": ["1"]})
        ]
        self.check(spark, rows1, rows2)

    def test_different_types_bucket_separately(self, spark):
        rows1 = [
            rec_row(record_start=0, warc_type="request", target_uri="u", headers=self.h()),
            rec_row(record_start=10, warc_type="response", target_uri="u", headers=self.h()),
        ]
        rows2 = [
            rec_row(record_start=0, warc_type="request", target_uri="u", headers=self.h()),
        ]
        self.check(spark, rows1, rows2)

    def test_randomized(self, spark):
        rng = random.Random(7)

        def mk(n, seed_offset=0):
            rows = []
            for i in range(n):
                rows.append(
                    rec_row(
                        record_start=i * 10,
                        warc_type=rng.choice(["request", "response", "metadata", "warcinfo"]),
                        target_uri=rng.choice(["a", "b", "c", "d", None]),
                        headers=self.h(
                            digest=rng.choice(["d1", "d2"]),
                            length=rng.choice(["1", "2"]),
                        ),
                    )
                )
            return rows

        self.check(spark, mk(60), mk(50))


class TestDecodedUriKeys:
    def test_three_decodings_and_collision_safety(self, spark):
        """Sc7 parity: by-URI keys are the RAW Target-URI bytes reported as
        latin1 / utf-8-replace / base64; two byte sequences that
        utf-8-replace to the SAME string must stay separate rows."""
        import base64

        def hb(uri_bytes, wtype):
            return (
                b"WARC/1.1\r\nWARC-Type: " + wtype + b"\r\n"
                b"WARC-Target-URI: " + uri_bytes + b"\r\n"
            )

        u1, u2 = b"http://x/\xff", b"http://x/\xfe"
        rows = [
            ("a", 0, 5, "request", bytearray(hb(u1, b"request"))),
            ("a", 10, 15, "response", bytearray(hb(u1, b"response"))),
            ("a", 20, 25, "request", bytearray(hb(u2, b"request"))),
        ]
        df = spark.createDataFrame(
            rows,
            "source_file string, record_start long, record_end long, "
            "warc_type string, header_bytes binary",
        )
        got = {
            r["uri_latin1"]: r
            for r in analytics.pair_summary_by_uri_decoded(df).collect()
        }
        assert set(got) == {u1.decode("latin1"), u2.decode("latin1")}
        r1 = got[u1.decode("latin1")]
        assert r1["uri_utf8_replace"] == u1.decode("utf-8", errors="replace")
        assert r1["uri_base64"] == base64.b64encode(u1).decode("ascii")
        assert (r1["pairs"], r1["lone_requests"], r1["lone_responses"]) == (1, 0, 0)
        r2 = got[u2.decode("latin1")]
        assert (r2["pairs"], r2["lone_requests"], r2["lone_responses"]) == (0, 1, 0)
        # the two keys collide under utf-8-replace but stay distinct rows
        assert r1["uri_utf8_replace"] == r2["uri_utf8_replace"]


class TestNearMatchDiffs:
    def archive(self, spark, f1_val):
        rows = [
            rec_row(
                record_start=0,
                warc_type="response",
                target_uri="u",
                headers={"F0": ["same"], "F1": [f1_val]},
                header_bytes=bytearray(
                    f"WARC/1.1\r\nF0: same\r\nF1: {f1_val}\r\n".encode()
                ),
            )
        ]
        schema = RECORDS_MINI_SCHEMA + ", header_bytes binary"
        return spark.createDataFrame(rows, schema)

    def test_ndiff_of_near_matching_headers(self, spark):
        """Sc9 parity: difflib.ndiff of the two header blocks (utf-8-replace
        decoded, keepends splitlines), exactly as compare_headers.py:355-374."""
        import difflib

        a, b = self.archive(spark, "one"), self.archive(spark, "two")
        got = analytics.near_match_header_diffs(
            a, b, compare_fields=["F0", "F1"], near_match_fields=["F1"]
        ).collect()
        assert len(got) == 1
        exp = list(
            difflib.ndiff(
                "WARC/1.1\r\nF0: same\r\nF1: one\r\n".splitlines(keepends=True),
                "WARC/1.1\r\nF0: same\r\nF1: two\r\n".splitlines(keepends=True),
            )
        )
        assert got[0]["diff"] == exp

    def test_matching_pairs_produce_no_diffs(self, spark):
        a, b = self.archive(spark, "one"), self.archive(spark, "one")
        assert (
            analytics.near_match_header_diffs(
                a, b, compare_fields=["F0", "F1"], near_match_fields=["F1"]
            ).count()
            == 0
        )


class TestSummarize:
    @pytest.fixture(scope="class")
    def records(self, spark):
        from wbx import warcio
        from tests.test_warcio import make_record

        wire = (
            make_record(b"HTTP/1.1 200\r\nContent-Type: text/html\r\n\r\nhi")
            + make_record(b"HTTP/1.1 200\r\nContent-Type: text/html; charset=UTF-8\r\n\r\nhi")
            + make_record(b"GET / HTTP/1.1\r\n\r\n", warc_type=b"request")
            + make_record(b"info", warc_type=b"warcinfo")
        )
        files = spark.createDataFrame(
            [("a.warc", bytearray(wire))], "source_file string, content binary"
        )
        return warcio.scan_files_to_records(files)

    def test_counts(self, records):
        s = analytics.summarize(records)
        assert s["record_count"].collect()[0][0] == 4
        types = {r["warc_type"]: r["n"] for r in s["record_types"].collect()}
        assert types == {"response": 2, "request": 1, "warcinfo": 1}
        domains = {r["domain"]: r["n"] for r in s["domains"].collect()}
        assert domains == {"example.com": 4}
        cts = {r["http_content_type"]: r["n"] for r in s["content_types"].collect()}
        assert cts == {"text/html": 1, "text/html; charset=UTF-8": 1}

    def test_stop_after_nth(self, records):
        assert analytics.stop_after_nth(records, 2).count() == 2
        first = analytics.stop_after_nth(records, 1).collect()[0]
        assert first["record_start"] == 0


class TestNetloc:
    def test_urlparse_parity(self, spark):
        from urllib.parse import urlparse

        urls = [
            "http://Example.COM:8080/path?q=1#f",
            "https://user:pw@host.com/x",
            "http://example.com",
            "not a url",
            "mailto:someone@example.com",
            "//scheme-relative.com/x",
            "http://例え.jp/パス",
            None,
        ]
        df = spark.createDataFrame([(u,) for u in urls], "url string")
        got = [
            r["d"] for r in df.select(analytics.netloc_udf(F.col("url")).alias("d")).collect()
        ]
        exp = [
            (urlparse(u).netloc or None) if u is not None else None for u in urls
        ]
        assert got == exp
        # fast JVM tier agrees with urlparse on the same corpus
        fast = [
            r["d"]
            for r in df.select(analytics.netloc_expr(F.col("url")).alias("d")).collect()
        ]
        assert fast == exp


class TestHostReport:
    def test_aggregates_per_host(self, spark):
        import datetime as dt

        rows = [
            ("https://a.com/1", dt.datetime(2024, 1, 1, 0, 0, 1), b"", "abc", "en"),
            ("https://a.com/2", dt.datetime(2024, 1, 1, 0, 0, 9), b"", "defgh", "de"),
            ("https://b.com/1", dt.datetime(2024, 1, 2), b"", "xy", "en"),
            ("not a url", dt.datetime(2024, 1, 3), b"", "zz", "en"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        out = {r["host"]: r for r in analytics.host_report(pages).collect()}
        assert set(out) == {"a.com", "b.com"}  # unparseable host dropped
        a = out["a.com"]
        assert a["n_pages"] == 2
        assert a["text_chars"] == 8
        assert a["n_langs"] == 2
        assert a["first_ts"].second == 1 and a["last_ts"].second == 9

    def test_partial_aggregation_before_shuffle(self, spark):
        import contextlib
        import datetime as dt
        import io

        pages = spark.createDataFrame(
            [("https://a.com/1", dt.datetime(2024, 1, 1), b"", "t", "en")],
            "url string, warc_ts timestamp, html binary, text string, lang string",
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            analytics.host_report(pages).explain(mode="formatted")
        plan = buf.getvalue()
        assert "partial_count" in plan or "partial" in plan.lower(), plan


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: two events 10s apart, then a 2000s gap, then one more
            (0, base, 1, "view", 1.0, None),
            (1, base + dt.timedelta(seconds=10), 1, "click", 2.5, None),
            (2, base + dt.timedelta(seconds=2010), 1, "view", 0.5, None),
            # user 2: single event
            (3, base, 2, "view", 10.0, None),
        ]
        events = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string,"
            " value double, props string",
        )
        out = {
            (r["user_id"], r["session_idx"]): r
            for r in analytics.sessionize(events, gap_seconds=1800).collect()
        }
        assert set(out) == {(1, 1), (1, 2), (2, 1)}
        s11 = out[(1, 1)]
        assert s11["n_events"] == 2
        assert s11["value_cents"] == 350
        assert s11["session_end"].second == 10
        assert out[(1, 2)]["n_events"] == 1

    def test_parallelism_independent(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (i, base + dt.timedelta(seconds=i * 700), i % 3, "view", float(i), None)
            for i in range(60)
        ]
        events = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp_ntz, user_id long, event_type string,"
            " value double, props string",
        )
        a = sorted(map(tuple, analytics.sessionize(events).collect()))
        b = sorted(map(tuple, analytics.sessionize(events.repartition(13)).collect()))
        assert a == b


class TestCdxIndex:
    def test_surt_cases(self, spark):
        from wbx.frontier import surt_key, with_canon_url

        cases = {
            "http://www.Example.COM:80/A/b?Q=1": "com,example)/a/b?q=1",
            "https://sub.site.org/": "org,site,sub)/",
            "http://host": "host)/",
            "no scheme": None,
        }
        df = with_canon_url(
            spark.createDataFrame([(u,) for u in cases], "url string"), "url"
        )
        got = {
            r["url"]: r["k"]
            for r in df.select(
                "url", surt_key(F.col("canon_url")).alias("k")
            ).collect()
        }
        assert got == cases

    def test_cdx_from_scanned_warc(self, spark):
        import hashlib

        from wbx import warcio
        from wbx.analytics import cdx_index

        def rec(uri, body, wtype=b"response"):
            header = (
                b"WARC/1.1\r\nWARC-Type: " + wtype + b"\r\n"
                b"WARC-Target-URI: " + uri + b"\r\n"
                b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
                b"Content-Type: application/http\r\n"
                b"Content-Length: " + str(len(body)).encode() + b"\r\n"
            )
            return header + b"\r\n" + body

        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<x>"
        recs = [
            rec(b"https://www.ex.com/p/2", body),
            rec(b"https://www.ex.com/p/1", body),
            rec(b"https://www.ex.com/p/1", b"GET / HTTP/1.1\r\n\r\n", b"request"),
        ]
        gz = warcio.write_warc_gz(recs)
        files = spark.createDataFrame(
            [("a.warc.gz", bytearray(gz))], "source_file string, content binary"
        )
        rows = cdx_index(warcio.scan_files_to_records(files)).collect()
        # requests excluded; sorted by urlkey so p/1 before p/2
        assert [r["urlkey"] for r in rows] == ["com,ex)/p/1", "com,ex)/p/2"]
        r = rows[0]
        assert r["timestamp"] == "20240304050607"
        assert r["url"] == "https://www.ex.com/p/1"
        assert r["mime"] == "text/html"
        assert r["status"] == 200
        assert r["filename"] == "a.warc.gz"
        assert r["length"] > 0 and r["offset"] >= 0
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<x>"
        assert r["digest"] == hashlib.sha1(body).hexdigest()


class TestMarkRevisits:
    def test_first_capture_wins_later_marked(self, spark):
        rows = [
            # same payload captured three times across two files
            ("a.warc", 0, "response", b"PAYLOAD-X"),
            ("a.warc", 100, "response", b"PAYLOAD-X"),
            ("b.warc", 0, "response", b"PAYLOAD-X"),
            # unique payload
            ("b.warc", 100, "response", b"PAYLOAD-Y"),
            # non-response passes through unmarked
            ("a.warc", 200, "request", b"PAYLOAD-X"),
        ]
        df = spark.createDataFrame(
            [(f, s, t, bytearray(b)) for f, s, t, b in rows],
            "source_file string, record_start long, warc_type string, content_block binary",
        )
        from wbx.analytics import mark_revisits

        got = {
            (r["source_file"], r["record_start"]): r
            for r in mark_revisits(df).collect()
        }
        assert not got[("a.warc", 0)]["is_revisit"]
        for key in (("a.warc", 100), ("b.warc", 0)):
            r = got[key]
            assert r["is_revisit"]
            assert (r["refers_to_file"], r["refers_to_start"]) == ("a.warc", 0)
        assert not got[("b.warc", 100)]["is_revisit"]
        assert not got[("a.warc", 200)]["is_revisit"]
        assert got[("a.warc", 200)]["digest"] is None

    def test_partition_independent(self, spark):
        import random

        rows = [
            (f"f{i % 3}.warc", i * 10, "response", bytearray(b"P%d" % (i % 4)))
            for i in range(40)
        ]
        df = spark.createDataFrame(
            rows,
            "source_file string, record_start long, warc_type string, content_block binary",
        )
        from wbx.analytics import mark_revisits

        a = sorted(map(tuple, mark_revisits(df).drop("content_block").collect()))
        b = sorted(
            map(tuple, mark_revisits(df.repartition(11)).drop("content_block").collect())
        )
        assert a == b
        n_rev = sum(1 for r in a if r[-3])
        assert n_rev == 36  # 4 distinct payloads, 40 captures


class TestDigestAudit:
    """sha1_base32 Column kernel vs hashlib/base64 ground truth, and the
    archive integrity audit over both digest text forms."""

    def test_sha1_base32_matches_python(self, spark):
        import base64
        import hashlib

        from pyspark.sql import functions as F

        from wbx.analytics import sha1_base32

        payloads = [
            b"",
            b"a",
            b"hello warc",
            bytes(range(256)),
            "unicode é … ü".encode("utf-8"),
            b"\x00" * 1000,
            b"x" * 65537,
        ]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "i long, payload binary",
        )
        got = {
            r["i"]: r["b32"]
            for r in df.select("i", sha1_base32(F.col("payload")).alias("b32")).collect()
        }
        for i, p in enumerate(payloads):
            want = base64.b32encode(hashlib.sha1(p).digest()).decode()
            assert got[i] == want, f"payload {i}"
            assert "=" not in got[i] and len(got[i]) == 32

    def test_sha1_base32_property(self, spark):
        """Hash-avalanche sweep: 64 derived payloads, all must match the
        Python encoder bit-for-bit (catches any limb/shift slicing bug)."""
        import base64
        import hashlib

        from pyspark.sql import functions as F

        from wbx.analytics import sha1_base32

        payloads = [f"doc-{i}-{'y' * (i % 17)}".encode() for i in range(64)]
        df = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in enumerate(payloads)],
            "i long, payload binary",
        )
        got = {
            r["i"]: r["b32"]
            for r in df.select("i", sha1_base32(F.col("payload")).alias("b32")).collect()
        }
        for i, p in enumerate(payloads):
            assert got[i] == base64.b32encode(hashlib.sha1(p).digest()).decode()

    def _records(self, spark):
        import base64
        import hashlib

        def rec(i, content, declared):
            headers = {"WARC-Block-Digest": [declared]} if declared else {}
            return ("f.warc", i * 100, f"http://e/{i}", headers, bytearray(content))

        hex_ok = hashlib.sha1(b"alpha").hexdigest()
        b32_ok = base64.b32encode(hashlib.sha1(b"beta").digest()).decode()
        rows = [
            rec(0, b"alpha", f"sha1:{hex_ok}"),            # hex, matches
            rec(1, b"beta", f"sha1:{b32_ok}"),             # base32, matches
            rec(2, b"gamma", f"sha1:{hex_ok}"),            # hex, WRONG content
            rec(3, b"delta", f"sha1:{b32_ok.lower()}"),    # lowercased → unknown-form
            rec(4, b"epsilon", "sha256:" + "0" * 64),      # unsupported algo
            rec(5, b"zeta", None),                         # no digest → excluded
            rec(6, b"alpha", hex_ok.upper()),              # unlabeled hex, case-insensitive
        ]
        return spark.createDataFrame(
            rows,
            "source_file string, record_start long, target_uri string, "
            "headers map<string,array<string>>, content_block binary",
        )

    def test_audit_digests_verdicts(self, spark):
        from wbx.analytics import audit_digests

        got = {
            r["record_start"] // 100: r
            for r in audit_digests(self._records(spark)).collect()
        }
        assert set(got) == {0, 1, 2, 3, 4, 6}  # no-digest record excluded
        assert (got[0]["encoding"], got[0]["ok"]) == ("hex", True)
        assert (got[1]["encoding"], got[1]["ok"]) == ("base32", True)
        assert (got[2]["encoding"], got[2]["ok"]) == ("hex", False)
        assert (got[3]["encoding"], got[3]["ok"]) == ("unknown-form", None)
        assert (got[4]["encoding"], got[4]["ok"]) == ("unsupported-algo", None)
        assert (got[6]["encoding"], got[6]["ok"]) == ("hex", True)
        # recomputed hex is reported for every audited record
        import hashlib

        assert got[2]["computed_hex"] == hashlib.sha1(b"gamma").hexdigest()
