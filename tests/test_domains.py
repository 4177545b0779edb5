"""Registered-domain (eTLD+1) extraction: expression path, full-PSL
relational path, and the domain-scoped politeness wiring.

The relational-path vectors follow the publicsuffix.org algorithm's
published test cases (checkPublicSuffix) for the exact/wildcard/exception
rule interplay — exception beats wildcard, longest match prevails, the
implicit '*' default rule when nothing matches."""

from __future__ import annotations

from pyspark.sql import functions as F

from wbx.domains import (
    apply_domain_politeness,
    parse_suffix_rules,
    registered_domain,
    registered_domain_map,
    with_registered_domain,
)
from wbx.frontier import apply_politeness, crawl_round


def _expr_cases():
    # (host, expected registered domain) under the snapshot expression path
    return [
        ("example.com", "example.com"),
        ("www.example.com", "example.com"),
        ("a.b.example.com", "example.com"),
        ("example.co.uk", "example.co.uk"),
        ("www.example.co.uk", "example.co.uk"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("co.uk", None),  # the host IS a public suffix
        ("com", None),  # single label
        ("localhost", None),
        ("192.168.0.1", "192.168.0.1"),  # IPv4 → itself
        ("", None),
        (None, None),
    ]


class TestRegisteredDomainExpr:
    def test_cases(self, spark):
        rows = [(h,) for h, _ in _expr_cases()]
        df = spark.createDataFrame(rows, "host string").select(
            "host", registered_domain(F.col("host")).alias("rd")
        )
        got = {r["host"]: r["rd"] for r in df.collect()}
        for host, want in _expr_cases():
            assert got[host] == want, (host, got[host], want)

    def test_extra_two_label(self, spark):
        df = spark.createDataFrame(
            [("alice.github.io",), ("bob.github.io",), ("x.github.io",)],
            "host string",
        ).select(
            registered_domain(
                F.col("host"), extra_two_label=("github.io",)
            ).alias("rd")
        )
        assert {r["rd"] for r in df.collect()} == {
            "alice.github.io",
            "bob.github.io",
            "x.github.io",
        }

    def test_with_registered_domain_appends(self, spark):
        df = with_registered_domain(
            spark.createDataFrame([("www.example.com", 1)], "host string, x int")
        )
        assert df.columns == ["host", "x", "reg_domain"]
        assert df.first()["reg_domain"] == "example.com"


class TestRegisteredDomainMap:
    RULES = ["com", "co.uk", "uk", "jp", "*.ck", "!www.ck", "*.kawasaki.jp"]

    def _map(self, spark, hosts):
        rules = parse_suffix_rules(spark, self.RULES)
        hosts_df = spark.createDataFrame([(h,) for h in hosts], "host string")
        out = registered_domain_map(hosts_df, rules)
        return {r["host"]: r["reg_domain"] for r in out.collect()}

    def test_psl_vectors(self, spark):
        # publicsuffix.org checkPublicSuffix-style vectors for these rules
        cases = {
            "example.com": "example.com",
            "b.example.com": "example.com",
            "a.b.example.com": "example.com",
            "example.co.uk": "example.co.uk",
            "b.example.co.uk": "example.co.uk",
            "co.uk": None,  # exact rule match, no label left
            "uk": None,
            # wildcard: '*.ck' makes every 2-label .ck a public suffix
            "test.ck": None,
            "b.test.ck": "b.test.ck",
            "a.b.test.ck": "b.test.ck",
            # exception: '!www.ck' carves www.ck back out
            "www.ck": "www.ck",
            "www.www.ck": "www.ck",
            "a.www.ck": "www.ck",
            # wildcard deeper in: '*.kawasaki.jp'
            "city.kawasaki.jp": None,
            "test.city.kawasaki.jp": "test.city.kawasaki.jp",
            # longest match: 'jp' also matches but kawasaki wildcard wins
            "kawasaki.jp": "kawasaki.jp",  # only 'jp' matches (2 labels)
            # implicit '*' default rule — unlisted TLD
            "example.zz": "example.zz",
            "a.example.zz": "example.zz",
            "zz": None,
            "10.0.0.7": "10.0.0.7",
        }
        got = self._map(spark, list(cases))
        for host, want in cases.items():
            assert got[host] == want, (host, got[host], want)

    def test_parity_with_expression_path(self, spark):
        # where the snapshot model applies (exact 2-label suffixes + the
        # default rule), both paths must agree
        hosts = [
            "www.example.com",
            "example.com",
            "a.b.example.co.uk",
            "example.co.uk",
            "co.uk",
            "single",
            "10.1.2.3",
            "deep.a.b.c.d.example.org",
        ]
        rules = parse_suffix_rules(spark, ["co.uk"])
        hosts_df = spark.createDataFrame([(h,) for h in hosts], "host string")
        rel = {
            r["host"]: r["reg_domain"]
            for r in registered_domain_map(hosts_df, rules).collect()
        }
        expr = {
            r["host"]: r["rd"]
            for r in hosts_df.select(
                "host", registered_domain(F.col("host")).alias("rd")
            ).collect()
        }
        for h in hosts:
            assert rel[h] == expr[h], (h, rel[h], expr[h])

    def test_input_distinctified(self, spark):
        rules = parse_suffix_rules(spark, ["com"])
        dup = spark.createDataFrame(
            [("www.example.com",)] * 5 + [(None,)], "host string"
        )
        out = registered_domain_map(dup, rules)
        assert out.count() == 1

    def test_comments_and_blanks_skipped(self, spark):
        rules = parse_suffix_rules(
            spark, ["// comment", "", "  ", "com", "// another"]
        )
        assert rules.count() == 1


class TestDomainPoliteness:
    def _frontier(self, spark):
        rows = []
        # 6 URLs across 3 subdomains of one registered domain + 2 on another
        for i in range(6):
            rows.append(
                (
                    f"http://s{i % 3}.example.co.uk/p{i}",
                    f"s{i % 3}.example.co.uk",
                    float(10 - i),
                )
            )
        rows += [
            ("http://other.com/a", "other.com", 5.0),
            ("http://www.other.com/b", "www.other.com", 4.0),
        ]
        return spark.createDataFrame(
            rows, "canon_url string, host string, priority double"
        )

    def test_budget_shared_across_subdomains(self, spark):
        f = self._frontier(spark)
        domains = spark.createDataFrame(
            [("example.co.uk", 2)], "domain string, budget int"
        )
        kept = apply_domain_politeness(f, domains, default_budget=10)
        by_dom = {
            r["canon_url"]
            for r in kept.collect()
            if "example.co.uk" in r["canon_url"]
        }
        # one budget of 2 across all three subdomains — top-2 by priority
        assert by_dom == {
            "http://s0.example.co.uk/p0",
            "http://s1.example.co.uk/p1",
        }
        # other.com under default budget: both kept
        assert kept.count() == 4

    def test_host_politeness_would_keep_more(self, spark):
        # the same input under per-host budgets keeps 2 per HOST (6 rows) —
        # the domain scope is a genuinely stricter grouping
        f = self._frontier(spark)
        hosts = spark.createDataFrame(
            [
                (f"s{i}.example.co.uk", 2) for i in range(3)
            ],
            "host string, budget int",
        )
        kept = apply_politeness(f, hosts, default_budget=10)
        assert (
            kept.filter(F.col("host").contains("example.co.uk")).count() == 6
        )

    def test_no_reg_domain_falls_back_to_host(self, spark):
        f = spark.createDataFrame(
            [
                ("http://localhost/a", "localhost", 2.0),
                ("http://localhost/b", "localhost", 1.0),
            ],
            "canon_url string, host string, priority double",
        )
        domains = spark.createDataFrame(
            [("localhost", 1)], "domain string, budget int"
        )
        kept = apply_domain_politeness(f, domains)
        assert [r["canon_url"] for r in kept.collect()] == [
            "http://localhost/a"
        ]

    def test_crawl_round_scope_knob(self, spark):
        cands = spark.createDataFrame(
            [
                (f"http://s{i % 3}.example.co.uk/p{i}", float(10 - i))
                for i in range(6)
            ],
            "url string, priority double",
        )
        seen = spark.createDataFrame([], "url_hash long, canon_url string")
        domains = spark.createDataFrame(
            [("example.co.uk", 2)], "domain string, budget int"
        )
        batch = crawl_round(
            cands,
            seen,
            domains,
            default_budget=2,
            politeness_scope="registered_domain",
        )
        rows = batch.orderBy("fetch_order").collect()
        assert [r["canon_url"] for r in rows] == [
            "http://s0.example.co.uk/p0",
            "http://s1.example.co.uk/p1",
        ]
        # schema contract unchanged: host column is the raw fetch host
        assert rows[0]["host"] == "s0.example.co.uk"

    def test_crawl_round_bad_scope_raises(self, spark):
        import pytest as _pytest

        cands = spark.createDataFrame(
            [("http://a.com/", 1.0)], "url string, priority double"
        )
        seen = spark.createDataFrame([], "url_hash long, canon_url string")
        hosts = spark.createDataFrame([], "host string, budget int")
        with _pytest.raises(ValueError, match="politeness_scope"):
            crawl_round(
                cands, seen, hosts, politeness_scope="nope"
            ).collect()
