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
