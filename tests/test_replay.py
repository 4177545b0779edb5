"""S10 replay server: URL scheme + page content pinned to the reference's
own test assertions (ref tests/test_cli.py:850-960): index lists /{n}/
pairs, comparison pages carry Target-URI + both filenames + iframes at
/{n}/{1,2}/, and the record URLs replay the archived HTTP response with its
original status, headers, and body."""

from __future__ import annotations

import threading
import urllib.request

import pytest

from tests.helpers import RECORDS_MINI_SCHEMA, rec_row
from wbx import replay


def _archives(spark):
    def df(f1_val, body):
        rows = [
            rec_row(
                target_uri=f"http://site.example/p{i}",
                headers={"WARC-Target-URI": [f"http://site.example/p{i}"], "F0": ["same"], "F1": [f1_val]},
                content_block=bytearray(
                    b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
                    b"X-Side: " + f1_val.encode() + b"\r\n\r\n" + body
                ),
            )
            for i in range(3)
        ]
        schema = RECORDS_MINI_SCHEMA + ", content_block binary"
        return spark.createDataFrame(rows, schema)

    return df("one", b"<html>before</html>"), df("two", b"<html>after</html>")


class TestReplayServer:
    @pytest.fixture()
    def server(self, spark):
        a, b = _archives(spark)
        pairs = replay.near_matching_pairs(
            a, b, compare_fields=["F0", "F1"], near_match_fields=["F1"]
        )
        assert len(pairs) == 3
        stop = threading.Event()
        port = 8937
        t = threading.Thread(
            target=replay.serve_pairs,
            args=(pairs, "before.warc", "after.warc", "127.0.0.1", port, stop),
            daemon=True,
        )
        t.start()
        import time

        time.sleep(0.3)
        yield f"http://127.0.0.1:{port}"
        stop.set()
        t.join(timeout=3)

    def _get(self, url):
        with urllib.request.urlopen(url, timeout=5) as r:
            return r.status, dict(r.headers), r.read()

    def test_index(self, server):
        status, headers, body = self._get(server + "/")
        text = body.decode()
        assert status == 200
        assert headers["Content-type"].startswith("text/html")
        assert "Nearly-Matching Records' HTTP Responses" in text
        for n in (1, 2, 3):
            assert f'href="/{n}/"' in text
        assert "before.warc" in text and "after.warc" in text

    def test_comparison_page(self, server):
        status, headers, body = self._get(server + "/2/")
        text = body.decode()
        assert status == 200
        assert "Target-URI" in text
        assert "before.warc" in text and "after.warc" in text
        assert 'href="/"' in text
        assert "<iframe" in text
        assert 'src="/2/1/"' in text and 'src="/2/2/"' in text
        # WARC header fields rendered for both sides
        assert "F1: one" in text and "F1: two" in text

    def test_record_replay_reassembles_http_response(self, server):
        # original status, headers, and body must come back live
        try:
            self._get(server + "/1/1/")
            raise AssertionError("expected 404 from the archived response")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert e.headers["X-Side"] == "one"
            assert e.headers["Content-Type"] == "text/html"
            assert e.read() == b"<html>before</html>"
        try:
            self._get(server + "/1/2/")
            raise AssertionError("expected 404 from the archived response")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert e.headers["X-Side"] == "two"
            assert e.read() == b"<html>after</html>"

    def test_unknown_path_404(self, server):
        import urllib.error

        with pytest.raises(urllib.error.HTTPError) as e:
            self._get(server + "/nope/")
        assert e.value.code == 404
