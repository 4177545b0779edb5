"""Shared test helpers: synthetic record rows + reference-semantics oracles.

The oracles reimplement the reference's driver-side algorithms (FIFO pair
matching utils.py:458-525; compare-headers classification
compare_headers.py:272-315) on plain Python structures, so the relational
rewrites can be checked for exact equivalence on adversarial inputs.
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict, deque


def rec_row(
    source_file="a.warc",
    record_start=0,
    warc_type="response",
    target_uri="http://x/",
    headers=None,
    **kw,
):
    row = {
        "source_file": source_file,
        "record_start": record_start,
        "record_end": record_start + 10,
        "warc_type": warc_type,
        "target_uri": target_uri,
        "headers": headers or {},
    }
    row.update(kw)
    return row


RECORDS_MINI_SCHEMA = (
    "source_file string, record_start long, record_end long, "
    "warc_type string, target_uri string, "
    "headers map<string, array<string>>"
)


def fifo_pairs_oracle(rows):
    """Reference FIFO pair matching on (file-ordered) row dicts.

    Returns (pairs, lone_requests, lone_responses) where pairs is a list of
    (req_record_start, resp_record_start) and lones are record_start lists.
    """
    rows = sorted(rows, key=lambda r: (r["source_file"], r["record_start"]))
    unpaired_req = defaultdict(deque)
    unpaired_resp = defaultdict(deque)
    pairs = []
    for r in rows:
        t = (r["warc_type"] or "").lower()
        uri = r["target_uri"]
        if t == "request":
            if unpaired_resp[uri]:
                resp = unpaired_resp[uri].popleft()
                pairs.append((r["record_start"], resp["record_start"]))
            else:
                unpaired_req[uri].append(r)
        elif t == "response":
            if unpaired_req[uri]:
                req = unpaired_req[uri].popleft()
                pairs.append((req["record_start"], r["record_start"]))
            else:
                unpaired_resp[uri].append(r)
    lone_req = [r["record_start"] for q in unpaired_req.values() for r in q]
    lone_resp = [r["record_start"] for q in unpaired_resp.values() for r in q]
    return pairs, lone_req, lone_resp


def compare_headers_oracle(
    rows1, rows2, compare_fields=("WARC-Payload-Digest", "Content-Length"),
    near_match_fields=("WARC-Payload-Digest", "Content-Length"),
):
    """Reference compare-headers classification on row dicts.

    get_field(field, "", decode=True) ≈ headers.get(field, [""])[0] where a
    present-but-null first value stays None. Returns counts dict.
    """

    def get_field(row, field):
        values = row["headers"].get(field)
        if values is None:
            return ""
        return values[0]

    def collect(rows):
        buckets = {}
        for r in sorted(rows, key=lambda r: (r["source_file"], r["record_start"])):
            t = r["warc_type"]
            if t is None or t == "warcinfo":
                continue
            uri = r["target_uri"] if r["target_uri"] is not None else ""
            buckets.setdefault(t, OrderedDict()).setdefault(uri, []).append(r)
        return buckets

    b1, b2 = collect(rows1), collect(rows2)
    matching = near = unique1 = unique2 = 0
    for t in sorted(set(b1) | set(b2)):
        uris1 = set(b1.get(t, {}))
        uris2 = set(b2.get(t, {}))
        for uri in uris1 - uris2:
            unique1 += len(b1[t][uri])
        for uri in uris2 - uris1:
            unique2 += len(b2[t][uri])
        for uri in uris1 & uris2:
            l1, l2 = b1[t][uri], b2[t][uri]
            if len(l1) != len(l2):
                continue  # skip rule
            for r1, r2 in zip(l1, l2):
                matches = True
                near_matches = True
                for f in compare_fields:
                    if get_field(r1, f) != get_field(r2, f):
                        matches = False
                        if f not in near_match_fields:
                            near_matches = False
                if matches:
                    matching += 1
                elif near_matches:
                    near += 1
                else:
                    unique1 += 1
                    unique2 += 1
    return {
        "matching": matching,
        "near_matching": near,
        "unique1": unique1,
        "unique2": unique2,
    }
