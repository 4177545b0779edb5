"""CLI tests: every subcommand end-to-end against synthetic WARC dirs
(mirrors the reference's CliRunner golden tests, SURVEY §5.3)."""

from __future__ import annotations

import json
import os

import pytest

from tests.test_streaming import make_record
from wbx import cli
from wbx.warcio import write_warc


@pytest.fixture()
def warc_dir(tmp_path, spark):
    # spark fixture requested first so the CLI's getOrCreate reuses it
    d = tmp_path / "archives"
    os.makedirs(d)
    (d / "a.warc").write_bytes(
        write_warc(
            [make_record(f"https://one.example/{i}", b"A" * (i + 1)) for i in range(4)]
        )
    )
    (d / "b.warc").write_bytes(
        write_warc([make_record(f"https://two.example/{i}", b"BB") for i in range(2)])
    )
    return str(d)


def run_cli(capsys, argv):
    cli.main(argv)
    return capsys.readouterr().out


class TestSummarize:
    def test_json_output(self, warc_dir, capsys):
        out = json.loads(run_cli(capsys, ["summarize", "--input", warc_dir]))
        assert out["record_count"] == 6
        assert out["record_types"] == [{"warc_type": "response", "n": 6}]
        domains = {d["domain"]: d["n"] for d in out["domains"]}
        assert domains == {"one.example": 4, "two.example": 2}


class TestWaczInput:
    def test_summarize_counts_wacz_records(self, tmp_path, spark, capsys):
        """Pointing the CLI at a dir whose archives are .wacz must work
        exactly like the .warc.gz twins (reference's every test asset is
        a wacz; round-1 silently skipped them)."""
        from wbx.fixtures import wacz_bytes
        from wbx.warcio import write_warc_gz

        d = tmp_path / "wacz_archives"
        os.makedirs(d)
        recs = [make_record(f"https://w.example/{i}", b"X" * (i + 1)) for i in range(3)]
        (d / "site.wacz").write_bytes(wacz_bytes(write_warc_gz(recs)))
        out = json.loads(run_cli(capsys, ["summarize", "--input", str(d)]))
        assert out["record_count"] == 3
        assert {x["domain"]: x["n"] for x in out["domains"]} == {"w.example": 3}


class TestFilterRecords:
    def test_count_with_status_filter(self, warc_dir, capsys):
        out = run_cli(
            capsys,
            ["filter-records", "--input", warc_dir, "--http-status", "200", "--output-count"],
        )
        assert out.strip() == "6"

    def test_content_length_filter(self, warc_dir, capsys):
        out = run_cli(
            capsys,
            [
                "filter-records", "--input", warc_dir,
                "--content-length", "48", "--length-op", "ge",
            ],
        )
        rows = json.loads(out)["records"]
        # bodies are 45 fixed HTTP bytes + 1..4 ("A"*n) / 2 ("BB") payload
        assert len(rows) == 2
        assert all(r["target_uri"].startswith("https://one.example/") for r in rows)

    def test_warc_field_filter(self, warc_dir, capsys):
        out = run_cli(
            capsys,
            [
                "filter-records", "--input", warc_dir,
                "--warc-field", "Target-URI=two.example", "--output-count",
            ],
        )
        assert out.strip() == "2"


class TestCustomFilters:
    """H12 plug-in protocol (reference tests/test_cli.py:589-671 in
    spirit): a user python file exports Column-returning filters / DataFrame
    handlers via __all__; filter-records composes them with the built-ins."""

    def write_module(self, tmp_path, body):
        p = tmp_path / "user_filters.py"
        p.write_text(body)
        return str(p)

    def test_custom_filter_applied(self, warc_dir, tmp_path, capsys):
        mod = self.write_module(tmp_path, (
            "from pyspark.sql import functions as F\n"
            "__all__ = ['one_example_only', 'early_records']\n"
            "def one_example_only(records):\n"
            "    return F.col('target_uri').startswith('https://one.example/')\n"
            "def early_records():\n"
            "    return F.col('record_start') >= 0\n"
        ))
        out = run_cli(capsys, [
            "filter-records", "--input", warc_dir,
            "--custom-filter-path", mod, "--output-count",
        ])
        # 4 one.example records; the no-arg filter keeps everything
        assert out.strip() == "4"

    def test_custom_filter_composes_with_builtin(self, warc_dir, tmp_path, capsys):
        mod = self.write_module(tmp_path, (
            "from pyspark.sql import functions as F\n"
            "__all__ = ['one_example_only']\n"
            "def one_example_only(records):\n"
            "    return F.col('target_uri').startswith('https://one.example/')\n"
        ))
        out = run_cli(capsys, [
            "filter-records", "--input", warc_dir, "--http-status", "200",
            "--custom-filter-path", mod, "--output-count",
        ])
        assert out.strip() == "4"

    def test_custom_handler_replaces_df(self, warc_dir, tmp_path, capsys):
        mod = self.write_module(tmp_path, (
            "__all__ = ['halve']\n"
            "def halve(records):\n"
            "    from pyspark.sql import functions as F\n"
            "    return records.filter(F.col('record_start') == 0)\n"
        ))
        out = run_cli(capsys, [
            "filter-records", "--input", warc_dir,
            "--custom-record-handler-path", mod, "--output-count",
        ])
        assert out.strip() == "2"  # one record at offset 0 per file

    def test_missing_all_rejected(self, warc_dir, tmp_path, capsys):
        mod = self.write_module(tmp_path, "def f():\n    return None\n")
        with pytest.raises(ValueError, match="__all__"):
            run_cli(capsys, [
                "filter-records", "--input", warc_dir,
                "--custom-filter-path", mod, "--output-count",
            ])


class TestMatchPairs:
    def test_all_lone_responses(self, warc_dir, capsys):
        out = json.loads(run_cli(capsys, ["match-pairs", "--input", warc_dir]))
        assert out["counts"] == [{"pair_type": "lone_response", "n": 6}]


class TestCompareHeaders:
    def test_identical_dirs_all_matching(self, warc_dir, capsys):
        out = json.loads(
            run_cli(
                capsys,
                ["compare-headers", "--input", warc_dir, "--input2", warc_dir],
            )
        )
        (s,) = out["summary"]
        assert s["matching"] == 6
        assert s["unique1"] == 0 and s["unique2"] == 0


class TestCompareParsers:
    def test_reports_last_record_divergence(self, warc_dir, capsys):
        # fixture bodies don't end with a newline, so (reference parity) the
        # delimiter scan truncates each file's final record to (start, start)
        # while content-length parses it fully — compare-parsers surfaces
        # exactly that per-file divergence
        out = json.loads(run_cli(capsys, ["compare-parsers", "--input", warc_dir]))
        assert out["content_length_records"] == 6
        assert out["delimiter_records"] == 6
        assert len(out["only_content_length"]) == 2  # one final record per file
        assert len(out["only_delimiter"]) == 2
        for r in out["only_delimiter"]:
            assert r["record_start"] == r["record_end"]


def http_record(uri, body, content_type=b"text/html", encoding=None):
    """Response record with explicit HTTP Content-Type and optional
    Content-Encoding (pre-encoded body passed in by the caller)."""
    enc = b"Content-Encoding: " + encoding + b"\r\n" if encoding else b""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type + b"\r\n" + enc
        + b"\r\n" + body
    )
    header = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode()
    return header + b"\r\n" + http


class TestExtract:
    def make_archive(self, tmp_path):
        import gzip as _gz

        d = tmp_path / "xarch"
        os.makedirs(d)
        self.payload = b"<html><body>extract me</body></html>"
        recs = [
            http_record("https://x/0", _gz.compress(self.payload, 6, mtime=0),
                        encoding=b"gzip"),
            http_record("https://x/1", b"plain body here"),
            http_record("https://x/2", b"{}", content_type=b"application/json"),
            http_record("https://x/3", b"\xde\xad", encoding=b"nonsense"),
        ]
        (d / "in.warc").write_bytes(write_warc(recs))
        return d

    def test_roundtrip_decoded_bytes(self, tmp_path, spark, capsys):
        """Reference parity (tests/test_cli.py:392-553 spirit): extracted
        files are byte-exact decoded bodies named {basename}-{start}.{ext};
        undecodable encodings fall back to the raw body; non-matching
        mimetypes are skipped."""
        d = self.make_archive(tmp_path)
        out_dir = tmp_path / "out"
        out = json.loads(run_cli(capsys, [
            "extract", "--input", str(d), "--mimetype", "text/html",
            "--extension", "html", "--output-dir", str(out_dir),
        ]))
        rows = out["extracted"]
        assert len(rows) == 3  # json record excluded
        by_start = {r["record_start"]: r for r in rows}
        for r in rows:
            assert r["path"].endswith(f"in.warc-{r['record_start']}.html")
        # gzip record decoded byte-exactly
        first = min(by_start)
        with open(by_start[first]["path"], "rb") as fh:
            assert fh.read() == self.payload
        assert by_start[first]["decoded"] is True
        # nonsense encoding fell back to raw bytes with the error recorded
        last = max(by_start)
        assert by_start[last]["decoded"] is False
        assert "nonsense" in by_start[last]["decode_error"]
        with open(by_start[last]["path"], "rb") as fh:
            assert fh.read() == b"\xde\xad"

    def test_no_decode_writes_raw(self, tmp_path, spark, capsys):
        import gzip as _gz

        d = self.make_archive(tmp_path)
        out_dir = tmp_path / "raw"
        out = json.loads(run_cli(capsys, [
            "extract", "--input", str(d), "--mimetype", "text/html",
            "--extension", "", "--output-dir", str(out_dir), "--no-decode",
        ]))
        first = min(r["record_start"] for r in out["extracted"])
        path = [r for r in out["extracted"] if r["record_start"] == first][0]["path"]
        assert not path.endswith(".")
        with open(path, "rb") as fh:
            assert fh.read() == _gz.compress(self.payload, 6, mtime=0)


class TestInspect:
    def test_reports_all_sections(self, warc_dir, capsys):
        out = json.loads(run_cli(capsys, ["inspect", "--input", warc_dir]))
        rows = out["records"]
        assert len(rows) == 6
        r = rows[0]
        assert {"source_file", "record_start", "record_end",
                "member_start", "member_end", "warc_headers", "http_headers"} <= set(r)
        assert r["warc_headers"]["WARC-Type"] == ["response"]
        assert r["http_headers"].startswith("HTTP/1.1 200 OK")
        # plain .warc → no member offsets values
        assert r["member_start"] is None

    def test_sections_suppressible(self, warc_dir, capsys):
        out = json.loads(run_cli(capsys, [
            "inspect", "--input", warc_dir,
            "--no-record-headers", "--no-member-offsets",
        ]))
        r = out["records"][0]
        assert "warc_headers" not in r and "member_start" not in r
        assert "record_start" in r and "http_headers" in r


class TestCrawl:
    def test_crawl_writes_snapshot(self, tmp_path, spark, capsys):
        seeds = tmp_path / "seeds.txt"
        seeds.write_text(
            "\n".join(f"http://h{i % 3}.com/s/{i}" for i in range(12)) + "\n"
        )
        store = str(tmp_path / "store")
        out = json.loads(
            run_cli(
                capsys,
                [
                    "crawl", "--seeds", str(seeds), "--store", store,
                    "--rounds", "1", "--budget", "2",
                ],
            )
        )
        assert out["final_round"] == 1
        log = spark.read.parquet(os.path.join(store, "rounds", "r000001", "fetch_log"))
        rows = log.collect()
        assert len(rows) == 6  # 3 hosts × budget 2
        orders = sorted(r["fetch_order"] for r in rows)
        assert orders == list(range(1, 7))


class TestGzStyleMember:
    def test_member_style_summarize_matches_file_style(self, tmp_path, spark, capsys):
        """--gz-style member (S5) on a record-per-member archive must count
        exactly like the default whole-file scan."""
        from wbx.warcio import write_warc_gz

        d = tmp_path / "gz_archives"
        os.makedirs(d)
        recs = [make_record(f"https://m.example/{i}", b"Z" * (i + 1))[:-4] for i in range(5)]
        (d / "m.warc.gz").write_bytes(write_warc_gz(recs))
        by_file = json.loads(run_cli(capsys, ["summarize", "--input", str(d)]))
        by_member = json.loads(
            run_cli(capsys, ["summarize", "--input", str(d), "--gz-style", "member"])
        )
        assert by_member == by_file
        assert by_member["record_count"] == 5


class TestWetCommand:
    def test_wet_export_manifest_and_roundtrip(self, tmp_path, spark, capsys):
        import glob

        from wbx import warcio

        pages_dir = str(tmp_path / "pages_pq")
        spark.createDataFrame(
            [(f"http://w{i % 2}.example/p/{i}", f"2024-01-01 00:00:{i:02d}", f"doc {i}")
             for i in range(5)],
            "url string, ts string, text string",
        ).selectExpr(
            "url", "CAST(ts AS TIMESTAMP) AS warc_ts", "text"
        ).write.parquet(pages_dir)
        out_dir = str(tmp_path / "wet_out")
        out = json.loads(
            run_cli(capsys, ["wet", "--input", pages_dir,
                             "--output-dir", out_dir, "--files", "2"])
        )
        assert sum(r["n_records"] for r in out["wet"]) == 5
        files = spark.createDataFrame(
            [(os.path.basename(p), bytearray(open(p, "rb").read()))
             for p in sorted(glob.glob(out_dir + "/*.warc.gz"))],
            "source_file string, content binary",
        )
        rows = warcio.scan_files_to_records(files).collect()
        assert sorted(bytes(r["content_block"]).decode() for r in rows) == [
            f"doc {i}" for i in range(5)
        ]


class TestCdxCommand:
    def test_cdx_lines_sorted_by_urlkey(self, warc_dir, capsys):
        out = json.loads(run_cli(capsys, ["cdx", "--input", warc_dir]))
        rows = out["cdx"]
        assert len(rows) == 6
        keys = [(r["urlkey"], r["timestamp"]) for r in rows]
        assert keys == sorted(keys)
        assert {r["filename"] for r in rows} == {"a.warc", "b.warc"}
        assert all(r["urlkey"].startswith("example,") for r in rows)


class TestChunkCommand:
    def test_chunk_roundtrip(self, tmp_path, spark, capsys):
        docs_dir = str(tmp_path / "docs_pq")
        spark.createDataFrame(
            [(i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(4)],
            "doc_id long, text string",
        ).write.parquet(docs_dir)
        out_dir = str(tmp_path / "chunks_pq")
        out = json.loads(
            run_cli(capsys, ["chunk", "--input", docs_dir,
                             "--output-dir", out_dir,
                             "--chunk-words", "4", "--overlap-words", "1",
                             "--files", "2"])
        )
        # 10 words, window 4, stride 3 -> 3 chunks per doc
        assert out["chunks"] == 12
        back = spark.read.parquet(out_dir)
        assert back.count() == 12
        first = back.filter("doc_id = 2 AND chunk_id = 0").first()
        assert first["chunk_text"] == "w2_0 w2_1 w2_2 w2_3"
        assert first["n_words"] == 4


class TestWatExport:
    def test_wat_roundtrip_and_envelope(self, tmp_path, spark):
        import glob

        from wbx import warcio
        from wbx.sinks import export_wat

        pages_dir = str(tmp_path / "wat_pages")
        html = (
            '<html lang="en"><head><meta charset="UTF-8">'
            "<title> Doc  One </title></head><body>"
            '<a href="/x">a</a><a href="/x">again</a>'
            "<a href='https://abs.example/y'>b</a>"
            '<a href="mailto:z@q.r">drop</a></body></html>'
        )
        spark.createDataFrame(
            [(f"http://w.example/p/{i}", "2024-01-01 00:00:05", html.encode())
             for i in range(3)],
            "url string, ts string, html binary",
        ).selectExpr(
            "url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html"
        ).write.parquet(pages_dir)
        out_dir = str(tmp_path / "wat_out")
        pages = spark.read.parquet(pages_dir)
        manifest = export_wat(pages, out_dir, files=2)
        assert sum(r["n_records"] for r in manifest.collect()) == 3

        files = spark.createDataFrame(
            [(os.path.basename(p), bytearray(open(p, "rb").read()))
             for p in sorted(glob.glob(out_dir + "/*.warc.gz"))],
            "source_file string, content binary",
        )
        rows = warcio.scan_files_to_records(files).collect()
        assert len(rows) == 3
        env = json.loads(bytes(rows[0]["content_block"]).decode())
        assert env["title"] == "Doc One"
        assert env["charset"] == "utf-8"
        assert env["lang"] == "en"
        assert env["date"] == "2024-01-01T00:00:05Z"
        # document order, duplicates preserved, mailto dropped
        u = env["url"]
        assert env["links"] == [
            "http://w.example/x",
            "http://w.example/x",
            "https://abs.example/y",
        ]
        assert u.startswith("http://w.example/p/")

    def test_wat_deterministic_across_runs(self, tmp_path, spark):
        from wbx.sinks import export_wat

        pages = spark.createDataFrame(
            [(f"http://w.example/{i}", "2024-02-02 01:02:03", b'<a href="/l">x</a>')
             for i in range(6)],
            "url string, ts string, html binary",
        ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
        d1, d2 = str(tmp_path / "w1"), str(tmp_path / "w2")
        export_wat(pages, d1, files=2).collect()
        export_wat(pages.repartition(5), d2, files=2).collect()
        import glob

        b1 = b"".join(open(p, "rb").read() for p in sorted(glob.glob(d1 + "/*")))
        b2 = b"".join(open(p, "rb").read() for p in sorted(glob.glob(d2 + "/*")))
        assert b1 == b2


class TestWatLinksRoundtrip:
    def test_wat_links_match_extract_links(self, tmp_path, spark):
        """export_wat → scan back → wat_links must equal the live
        extract_links discovery on the same pages (distinct links)."""
        import glob

        from wbx import warcio
        from wbx.frontier import extract_links
        from wbx.sinks import export_wat, wat_links

        html = (
            '<a href="/a">1</a><a href="/b?q=1">2</a>'
            "<a href='//cdn.example/c'>3</a><a href=\"/a\">dup</a>"
        )
        pages = spark.createDataFrame(
            [(f"http://w.example/p/{i}", "2024-01-01 00:00:00", html.encode())
             for i in range(4)],
            "url string, ts string, html binary",
        ).selectExpr("url", "CAST(ts AS TIMESTAMP) AS warc_ts", "html")
        out_dir = str(tmp_path / "watl")
        export_wat(pages, out_dir, files=2).collect()
        files = spark.createDataFrame(
            [(os.path.basename(p), bytearray(open(p, "rb").read()))
             for p in sorted(glob.glob(out_dir + "/*.warc.gz"))],
            "source_file string, content binary",
        )
        recs = warcio.scan_files_to_records(files)
        got = {r["url"] for r in wat_links(recs, priority=0.5).collect()}
        want = {r["link"] for r in extract_links(pages).collect()}
        # all pages share one host, so the root-relative links resolve
        # identically: 3 distinct candidate URLs total
        assert got == want and len(got) == 3


class TestPackCommand:
    def test_pack_shards_roundtrip_and_manifest(self, tmp_path, spark, capsys):
        docs_dir = str(tmp_path / "pack_docs_pq")
        rows = [(i, " ".join(f"w{i}x{j}" for j in range(5))) for i in range(12)]
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(docs_dir)
        out_dir = str(tmp_path / "shards_pq")
        out = json.loads(
            run_cli(capsys, ["pack", "--input", docs_dir,
                             "--output-dir", out_dir,
                             "--budget-tokens", "20"])
        )
        # 12 docs x 5 tokens, budget 20 -> 4 docs per shard, 3 shards
        shards = out["shards"]
        assert [s["shard_id"] for s in shards] == [0, 1, 2]
        assert all(s["n_docs"] == 4 and s["n_tokens"] == 20 for s in shards)
        assert shards[0]["first_id"] == 0 and shards[0]["last_id"] == 3
        assert shards[2]["first_id"] == 8 and shards[2]["last_id"] == 11
        # every document lands on disk exactly once, text intact, and the
        # partition layout matches the manifest
        back = spark.read.parquet(out_dir)
        assert back.count() == 12
        assert set(back.columns) >= {"doc_id", "text", "n_tokens", "shard_id"}
        got = {r["doc_id"]: (r["text"], r["shard_id"]) for r in back.collect()}
        for i, text in rows:
            assert got[i] == (text, i // 4)
        from wbx.frontier import release_rank_caches

        release_rank_caches()


class TestCurateCommand:
    def test_curate_end_to_end(self, tmp_path, spark, capsys):
        good = (
            "The quick brown fox jumps over the lazy dog and then runs away. "
            "It was a bright day and the sun was shining over the green hill. "
            "People walked along the road and talked about the news of the day. "
            "The market was full of fresh fruit and the sellers called loudly. "
            "Children played near the river while their parents watched today. "
            "Everyone agreed that the town had never looked better than before."
        )
        docs_dir = str(tmp_path / "curate_docs_pq")
        rows = [(0, good), (1, good), (2, "tiny. no. bad. { x. y.")]
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
            docs_dir
        )
        out_dir = str(tmp_path / "curated_pq")
        out = json.loads(
            run_cli(capsys, ["curate", "--input", docs_dir,
                             "--output-dir", out_dir,
                             "--budget-tokens", "500",
                             "--classifier-threshold", "-1.5"])
        )
        funnel = {r["stage"]: r["n_pass"] for r in out["funnel"]}
        assert funnel["input"] == 3
        assert funnel["c4_ok"] == 2        # doc 2 fails the '{' gate
        assert funnel["exact_survivor"] == 1  # docs 0/1 identical
        # threshold -1.5 is below the minimum possible score: classifier
        # passes everything that reached it
        assert funnel["clf_ok"] == funnel["gopher_ok"]
        assert len(out["shards"]) == 1 and out["shards"][0]["n_docs"] == 1
        back = spark.read.parquet(out_dir)
        assert back.count() == 1
        assert back.first()["doc_id"] == 0
        from wbx.frontier import release_rank_caches

        release_rank_caches()


class TestDedupWarcCli:
    def test_manifest_and_revisit_roundtrip(self, warc_dir, tmp_path, capsys):
        """dedup-warc end-to-end: b.warc's two identical 'BB' payloads
        collapse to one keeper + one revisit; the deduped dir re-enters
        the engine through plain `summarize`."""
        out_dir = str(tmp_path / "deduped")
        out = json.loads(
            run_cli(
                capsys,
                [
                    "dedup-warc", "--input", warc_dir,
                    "--output-dir", out_dir, "--files", "1",
                ],
            )
        )
        rows = out["dedup_warc"]
        assert sum(r["n_records"] for r in rows) == 6
        assert all(r["path"].startswith(out_dir) for r in rows)

        out2 = json.loads(run_cli(capsys, ["summarize", "--input", out_dir]))
        assert out2["record_count"] == 6
        types = {t["warc_type"]: t["n"] for t in out2["record_types"]}
        assert types == {"response": 5, "revisit": 1}


class TestAuditCommand:
    def test_audit_summary_and_not_ok_rows(self, tmp_path, spark, capsys):
        import base64
        import hashlib

        def rec(uri, body, declared):
            http = b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
            header = (
                "WARC/1.1\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {uri}\r\n"
                f"WARC-Block-Digest: {declared}\r\n"
                "Content-Type: application/http;msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n"
            ).encode()
            return header + b"\r\n" + http

        def block(body):
            return b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body

        d = tmp_path / "audit_archives"
        os.makedirs(d)
        good_hex = "sha1:" + hashlib.sha1(block(b"alpha")).hexdigest()
        good_b32 = "sha1:" + base64.b32encode(
            hashlib.sha1(block(b"beta")).digest()
        ).decode()
        bad_hex = "sha1:" + hashlib.sha1(b"other").hexdigest()
        (d / "c.warc").write_bytes(
            write_warc(
                [
                    rec("https://a.example/0", b"alpha", good_hex),
                    rec("https://a.example/1", b"beta", good_b32),
                    rec("https://a.example/2", b"gamma", bad_hex),
                ]
            )
        )
        out = json.loads(run_cli(capsys, ["audit", "--input", str(d)]))
        assert out["audit"]["summary"] == {
            "hex:true": 1,
            "base32:true": 1,
            "hex:false": 1,
        }
        bad = out["audit"]["not_ok"]
        assert len(bad) == 1
        assert bad[0]["target_uri"] == "https://a.example/2"
        assert bad[0]["encoding"] == "hex"
