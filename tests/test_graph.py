"""Link-graph tests: host_rank pinned against a numpy power-iteration
oracle (same dangling/teleport formulation), structural invariants
(mass conservation, uniform rank on a cycle), host_edges built from real
HTML through the crawl loop's extract_links kernels, and the
authority-priority join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wbx import graph


def numpy_pagerank(edges, n_iter=10, d=0.85):
    """Reference power iteration, identical formulation to graph.host_rank:
    distinct unweighted edges, uniform teleport, uniform dangling mass."""
    hosts = sorted({s for s, _ in edges} | {t for _, t in edges})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    dedup = sorted(set(edges))
    out = np.zeros(n)
    for s, _ in dedup:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, t in dedup:
            contrib[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {h: r[idx[h]] for h in hosts}


def arith_edges():
    """Deterministic graph with a hub, a dangling host, and a cycle."""
    edges = []
    for k in range(40):
        edges.append((f"h{k % 7}", f"h{(3 * k + 1) % 7}"))
        edges.append((f"h{k % 7}", "hub"))
    edges.append(("hub", "h0"))
    # hd is a pure sink (dangling): appears only as a target
    edges.append(("h1", "hd"))
    return edges


class TestHostRank:
    def test_matches_numpy_power_iteration(self, spark):
        edges = arith_edges()
        df = spark.createDataFrame(edges, ["src_host", "dst_host"])
        got = {
            r["host"]: (r["rank"], r["out_degree"], r["in_degree"])
            for r in graph.host_rank(df, iterations=10).collect()
        }
        want = numpy_pagerank(edges, n_iter=10)
        assert set(got) == set(want)
        for h, w in want.items():
            assert got[h][0] == pytest.approx(w, abs=1e-12), h
        dedup = set(edges)
        for h in got:
            assert got[h][1] == sum(1 for s, _ in dedup if s == h)
            assert got[h][2] == sum(1 for _, t in dedup if t == h)

    def test_rank_mass_conserved(self, spark):
        df = spark.createDataFrame(arith_edges(), ["src_host", "dst_host"])
        total = (
            graph.host_rank(df, iterations=5)
            .agg(F.sum("rank").alias("s"))
            .collect()[0]["s"]
        )
        assert total == pytest.approx(1.0, abs=1e-12)

    def test_cycle_is_uniform(self, spark):
        cyc = [("a", "b"), ("b", "c"), ("c", "a")]
        df = spark.createDataFrame(cyc, ["src_host", "dst_host"])
        ranks = [r["rank"] for r in graph.host_rank(df, iterations=7).collect()]
        for r in ranks:
            assert r == pytest.approx(1.0 / 3, abs=1e-12)

    def test_duplicate_edges_collapse(self, spark):
        """Weighted duplicates must not change the unweighted formulation."""
        base = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
        df1 = spark.createDataFrame(base, ["src_host", "dst_host"])
        df2 = spark.createDataFrame(base * 3, ["src_host", "dst_host"])
        r1 = {r["host"]: r["rank"] for r in graph.host_rank(df1, 6).collect()}
        r2 = {r["host"]: r["rank"] for r in graph.host_rank(df2, 6).collect()}
        assert r1 == r2

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src_host string, dst_host string")
        assert graph.host_rank(df, iterations=3).count() == 0


class TestHostEdges:
    def test_from_html_via_extract_links(self, spark):
        pages = spark.createDataFrame(
            [
                (
                    "http://A.example/page/one",
                    b'<a href="http://b.example/x">b</a>'
                    b"<a href='/local'>self</a>"
                    b'<a href="HTTPS://C.example:443/y#frag">c</a>',
                ),
                ("http://b.example/", b'<a href="http://a.example/z">back</a>'),
            ],
            "url string, html binary",
        )
        got = {
            (r["src_host"], r["dst_host"]): r["n_links"]
            for r in graph.host_edges(pages).collect()
        }
        assert got == {
            ("a.example", "b.example"): 1,
            ("a.example", "a.example"): 1,  # root-relative /local
            ("a.example", "c.example"): 1,
            ("b.example", "a.example"): 1,
        }

    def test_malformed_utf8_does_not_crash(self, spark):
        pages = spark.createDataFrame(
            [("http://x.example/", b'\xff\xfe<a href="http://y.example/">y</a>')],
            "url string, html binary",
        )
        rows = graph.host_edges(pages).collect()
        assert {(r["src_host"], r["dst_host"]) for r in rows} == {
            ("x.example", "y.example")
        }


class TestAuthorityPriority:
    def test_broadcast_join_sets_priority(self, spark):
        ranks = graph.host_rank(
            spark.createDataFrame(arith_edges(), ["src_host", "dst_host"]),
            iterations=4,
        )
        frontier = spark.createDataFrame(
            [("http://hub/a",), ("http://h1/b",), ("http://unknown.example/",)],
            "canon_url string",
        )
        got = {
            r["canon_url"]: r["priority"]
            for r in graph.with_authority_priority(frontier, ranks).collect()
        }
        want = numpy_pagerank(arith_edges(), n_iter=4)
        assert got["http://hub/a"] == pytest.approx(want["hub"], abs=1e-12)
        assert got["http://h1/b"] == pytest.approx(want["h1"], abs=1e-12)
        assert got["http://unknown.example/"] == 0.0

    def test_run_crawl_reprioritize_by_authority(self, spark, tmp_path):
        """The run_crawl(reprioritize=) hook: frontier priorities become
        host PageRank, so the authority hub's URLs schedule first; the
        loop stays deterministic (two runs → identical fetch logs)."""
        from tests.test_checkpoint import hosts_df, make_expand, seeds_df
        from wbx.checkpoint import CheckpointStore, run_crawl

        # h4.com is the hub — a pure sink so its rank lead is monotone in
        # the iteration count (a back-edge would form a 2-cycle whose rank
        # oscillates with parity)
        edges = [(f"h{i}.com", "h4.com") for i in range(4)]
        ranks = graph.host_rank(
            spark.createDataFrame(edges, ["src_host", "dst_host"]), iterations=5
        )

        def repri(df):
            return graph.with_authority_priority(df, ranks, url_col="url")

        logs = []
        for name in ("a", "b"):
            st = CheckpointStore(str(tmp_path / name))
            run_crawl(
                spark, st, seeds_df(spark), make_expand(spark),
                hosts_df(spark), rounds=2, reprioritize=repri,
            )
            logs.append(
                sorted(map(tuple, st.load(spark, "fetch_log", 2).collect()))
            )
        assert logs[0] == logs[1]
        by_host = {}
        for row in logs[0]:
            # fetch_log: (round, fetch_order, canon_url, url_hash, host, ...)
            by_host.setdefault(row[4], []).append(row[1])
        assert min(by_host["h4.com"]) == min(o for os in by_host.values() for o in os)

    def test_no_python_udf_in_plan(self, spark):
        ranks = graph.host_rank(
            spark.createDataFrame([("a", "b")], ["src_host", "dst_host"]), 2
        )
        frontier = spark.createDataFrame([("http://a/x",)], "canon_url string")
        plan = graph.with_authority_priority(frontier, ranks)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


class TestConnectedComponents:
    def test_matches_union_find(self, spark):
        # two multi-edge clusters, a chain, and an isolated pair
        pairs = (
            [(1, 2), (2, 3), (1, 3), (3, 4)]
            + [(10, 11), (11, 12)]
            + [(20, 21), (21, 22), (22, 23), (23, 24)]  # chain, diameter 4
            + [(40, 41)]
        )
        df = spark.createDataFrame(pairs, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in graph.connected_components(df).collect()
        }
        want = union_find(pairs)
        # canonicalize union-find roots to min member per component
        comp_min = {}
        for x, r in want.items():
            comp_min.setdefault(r, x)
            comp_min[r] = min(comp_min[r], x)
        assert got == {x: comp_min[r] for x, r in want.items()}

    def test_reversed_and_duplicate_pairs(self, spark):
        df = spark.createDataFrame(
            [(2, 1), (1, 2), (3, 2), (3, 2)], "id_a long, id_b long"
        )
        got = {r["id"]: r["component"] for r in graph.connected_components(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}

    def test_max_iter_caps_rounds(self, spark):
        # chain 0-1-2-...-6: full convergence needs >2 rounds; capped run
        # must still return a valid (partial) labeling without hanging
        chain = [(i, i + 1) for i in range(6)]
        df = spark.createDataFrame(chain, "id_a long, id_b long")
        capped = {
            r["id"]: r["component"]
            for r in graph.connected_components(df, max_iter=1).collect()
        }
        assert capped[6] != 0  # one round can't reach the far end
        full = {
            r["id"]: r["component"]
            for r in graph.connected_components(df).collect()
        }
        assert set(full.values()) == {0}

    def test_keep_representatives(self, spark):
        docs = spark.createDataFrame(
            [(i, f"text {i}") for i in range(8)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 5), (6, 7)], "id_a long, id_b long"
        )
        kept = sorted(
            r["doc_id"]
            for r in graph.components_keep_representatives(docs, pairs).collect()
        )
        # {1,2,5} -> keep 1; {6,7} -> keep 6; 0,3,4 untouched
        assert kept == [0, 1, 3, 4, 6]

    def test_empty_pairs_keeps_all_docs(self, spark):
        docs = spark.createDataFrame(
            [(i, "t") for i in range(3)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert graph.components_keep_representatives(docs, pairs).count() == 3


class TestDedupComposition:
    def test_minhash_pairs_to_representatives_end_to_end(self, spark):
        """The full near-dup pipeline: MinHash-LSH pairs →
        connected_components → one representative per cluster. Family B's
        A~B and B~C pairs must transitively collapse even if LSH never
        emitted (A, C) directly."""
        from wbx import textops

        base_a = "the quick brown fox jumps over the lazy dog " * 12
        base_b = "pack my box with five dozen liquor jugs today " * 12
        rows = [
            (0, base_a),
            (1, base_a + " tail zero"),
            (2, base_a + " tail zero one"),
            (10, base_b),
            (11, base_b + " extra"),
            (20, "completely unrelated text about spark shuffles " * 10),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = textops.dedup_minhash(docs, threshold=0.7)
        got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got_pairs  # families were detected at all
        kept = sorted(
            r["doc_id"]
            for r in graph.components_keep_representatives(docs, pairs).collect()
        )
        # family A {0,1,2} -> 0; family B {10,11} -> 10; 20 untouched
        assert kept == [0, 10, 20]


class TestHostDegreeStats:
    def test_degrees_and_dangling(self, spark):
        from wbx.graph import host_degree_stats

        edges = spark.createDataFrame(
            [
                ("a.com", "b.com", 3),
                ("a.com", "c.com", 1),
                ("b.com", "c.com", 2),
                ("c.com", "c.com", 9),  # self-loop: ignored both ways
            ],
            "src_host string, dst_host string, n_links long",
        )
        out = {r["host"]: r for r in host_degree_stats(edges).collect()}
        a, b, c = out["a.com"], out["b.com"], out["c.com"]
        assert (a["out_degree"], a["in_degree"], a["out_links"], a["in_links"]) == (2, 0, 4, 0)
        assert (b["out_degree"], b["in_degree"], b["out_links"], b["in_links"]) == (1, 1, 2, 3)
        assert (c["out_degree"], c["in_degree"], c["in_links"]) == (0, 2, 3)
        assert c["is_dangling"] and not a["is_dangling"] and not b["is_dangling"]
