"""S10: HTTP replay server for nearly-matching record pairs.

The last reference CLI surface without a counterpart: `compare-headers
--serve-near-matching-records` (reference scripts/utils.py:208-462, behavior
pinned by its tests/test_cli.py:850-960 — studied, not copied). Serves:

- ``/``            index of near-matching pairs
- ``/{n}/``        side-by-side comparison page (WARC headers + iframes)
- ``/{n}/{1|2}/``  the record's content re-assembled into a live HTTP
                   response (status + headers relayed from the archived
                   bytes, body verbatim)
- ``/favicon.ico`` a 200 (the reference embeds a PNG; we serve empty bytes)

Division of labor (Spark-first): pair classification runs DISTRIBUTED
(analytics.compare_headers — window + full-outer join); only the bounded
near-matching set actually being browsed is collected to the driver, where
a plain http.server renders it. The server is presentation, not engine.
"""

from __future__ import annotations

import html
import re
from http.server import BaseHTTPRequestHandler, HTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HTTP_STATUS_RE = re.compile(r"HTTP/1.1\s*(\d*)")


def near_matching_pairs(
    records1: DataFrame,
    records2: DataFrame,
    compare_fields: list[str] | None = None,
    near_match_fields: list[str] | None = None,
    limit: int = 200,
) -> list:
    """Collected near-matching record pairs with the columns the server
    needs (WARC headers map + raw content block per side), deterministic
    order (target_uri, seq). `limit` bounds the driver collect — a replay
    session is a human browsing a handful of pairs, not a data path."""
    from wbx import analytics

    carry = ["headers", "content_block"]
    classified = analytics.compare_headers(
        records1, records2, compare_fields, near_match_fields, carry_cols=carry
    )
    return (
        classified.filter(F.col("status") == "near_matching")
        .orderBy("target_uri", "seq")
        .limit(limit)
        .select(
            "target_uri",
            "seq",
            "l_headers",
            "r_headers",
            "l_content_block",
            "r_content_block",
        )
        .collect()
    )


def _fields_html(headers) -> bytes:
    """WARC header fields as the reference's '<p>field: value<br>...</p>'."""
    out = [b"<p>"]
    for field, values in (headers or {}).items():
        v = values[0] if values else None
        shown = html.escape(v) if v else v
        out.append(f"{field}: {shown}<br>".encode("utf-8"))
    out.append(b"</p>")
    return b"".join(out)


def _http_response_parts(content_block: bytes | None) -> tuple[int, list, bytes]:
    """(status, headers, body) re-assembled from an archived HTTP message
    (reference parity: default status 200 when none parses; headers are
    'name: value' lines; body verbatim)."""
    from wbx.extract import split_http_message

    header_block, body = split_http_message(content_block or b"")
    status = 200
    headers: list[tuple[str, str]] = []
    for line in (header_block or b"").decode("utf-8", errors="replace").splitlines():
        split = line.split(":", 1)
        if len(split) == 1:
            if line.startswith("HTTP/1.1"):
                m = _HTTP_STATUS_RE.search(line)
                if m and m.group(1):
                    status = int(m.group(1))
        else:
            headers.append((split[0], split[1].strip()))
    return status, headers, body or b""


def make_replay_handler(pair_rows: list, file1: str, file2: str):
    """BaseHTTPRequestHandler class over collected near-match pairs.
    URL scheme matches the reference exactly: pairs live at /1/, /2/, ...;
    each pair's records at /{n}/1/ and /{n}/2/."""
    pairs = {f"/{i + 1}/": (i + 1, row) for i, row in enumerate(pair_rows)}

    class WARCReplayHandler(BaseHTTPRequestHandler):
        def log_message(self, *args) -> None:  # quiet server
            pass

        def _html(self, payload: bytes) -> None:
            self.send_response(200)
            self.send_header("Content-type", "text/html")
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self) -> None:
            if self.path == "/":
                items = "".join(
                    f'<li><a href="{path}">Pair {index}</a></li>'
                    for path, (index, _) in pairs.items()
                )
                self._html(
                    (
                        "<html><head><title>Nearly-Matching Records' HTTP "
                        "Responses</title></head><body>"
                        "<h1>Nearly-Matching Records' HTTP Responses</h1>"
                        f"<p> Comparing:<br><br>{file1}<br>{file2}</p>"
                        f"<ul>{items}</ul></body></html>"
                    ).encode("utf-8")
                )
                return
            if self.path == "/favicon.ico":
                self.send_response(200)
                self.send_header("Content-type", "image/png")
                self.end_headers()
                return
            if self.path in pairs:
                _, row = pairs[self.path]
                uri = html.escape(row["target_uri"] or "")
                page = [
                    (
                        "<html><head><title>Nearly-Matching Records' HTTP "
                        "Responses</title><style>body { height: 100%; } "
                        ".records { display: flex; height: 100vh; } "
                        ".record { flex: 1; } "
                        "iframe { width: 100%; height: 100%; }</style></head>"
                        '<body><a href="/">&lt;- Back to index</a>'
                        f"<h1>Target-URI <small>{uri}</small></h1>"
                        '<div class="records">'
                        f'<div class="record"><h2>{file1}</h2>'
                    ).encode("utf-8"),
                    _fields_html(row["l_headers"]),
                    (
                        f'<iframe src="{self.path}1/" title="Record 1"></iframe>'
                        f'</div><div class="record"><h2>{file2}</h2>'
                    ).encode("utf-8"),
                    _fields_html(row["r_headers"]),
                    (
                        f'<iframe src="{self.path}2/" title="Record 2"></iframe>'
                        "</div></div></body></html>"
                    ).encode("utf-8"),
                ]
                self._html(b"".join(page))
                return
            if self.path[:-2] in pairs:
                _, row = pairs[self.path[:-2]]
                record_num = int(self.path[-2:-1])
                block = (
                    row["l_content_block"] if record_num == 1 else row["r_content_block"]
                )
                status, headers, body = _http_response_parts(
                    bytes(block) if block is not None else None
                )
                self.send_response(status)
                for name, value in headers:
                    self.send_header(name, value)
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_error(404, "File not found")

    return WARCReplayHandler


def serve_pairs(
    pair_rows: list,
    file1: str,
    file2: str,
    host: str = "127.0.0.1",
    port: int = 8000,
    stop_event=None,
) -> None:
    """Serve collected pairs. Blocks; pass a threading.Event as
    `stop_event` to make the loop poll-and-exit (how the tests and the
    reference's own test harness shut it down)."""
    handler = make_replay_handler(pair_rows, file1, file2)
    httpd = HTTPServer((host, port), handler)
    httpd.timeout = 0.2
    try:
        if stop_event is None:
            httpd.serve_forever()
        else:
            while not stop_event.is_set():
                httpd.handle_request()
    finally:
        httpd.server_close()
