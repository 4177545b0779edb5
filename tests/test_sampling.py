"""Sampling/mixing/splitting tests: determinism under repartitioning,
rate accuracy, nested-rate monotonicity, stratified rates, split
disjointness, and cross-engine hasher agreement with python hashlib."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from wbx import sampling


def docs(spark, n=4000, parts=None):
    df = spark.range(n).select(
        F.concat(F.lit("http://h"), F.pmod("id", F.lit(7)), F.lit(".com/p/"), "id").alias("url"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("zz")),
            (F.pmod("id", F.lit(4)) + 1).cast("int"),
        ).alias("lang"),
    )
    return df.repartition(parts) if parts else df


class TestHashSample:
    def test_deterministic_and_partition_independent(self, spark):
        a = {r["url"] for r in sampling.hash_sample(docs(spark), 0.3).collect()}
        b = {r["url"] for r in sampling.hash_sample(docs(spark, parts=13), 0.3).collect()}
        assert a == b and a

    def test_rate_accuracy(self, spark):
        n = sampling.hash_sample(docs(spark), 0.25, seed=3).count()
        assert n == pytest.approx(1000, rel=0.1)

    def test_nested_rates_monotone(self, spark):
        small = {r["url"] for r in sampling.hash_sample(docs(spark), 0.1, seed=5).collect()}
        big = {r["url"] for r in sampling.hash_sample(docs(spark), 0.2, seed=5).collect()}
        assert small < big

    def test_zero_and_full_rates(self, spark):
        assert sampling.hash_sample(docs(spark), 0.0).count() == 0
        assert sampling.hash_sample(docs(spark), 1.0).count() == 4000

    def test_md5_hasher_matches_python_hashlib(self, spark):
        """The portable hasher's selections are reproducible OUTSIDE Spark:
        python hashlib computes the identical bucket per key."""
        rows = sampling.hash_sample(
            docs(spark, n=500), 0.3, seed=9, hasher=sampling.md5_seeded
        ).collect()
        got = {r["url"] for r in rows}
        want = set()
        for i in range(500):
            url = f"http://h{i % 7}.com/p/{i}"
            h = int(hashlib.md5(f"{url}#9".encode()).hexdigest()[:15], 16)
            if h % 1_000_000 < 300_000:
                want.add(url)
        assert got == want


class TestStratifiedMix:
    def test_per_stratum_rates(self, spark):
        out = sampling.stratified_mix(
            docs(spark), {"en": 1.0, "de": 0.5, "fr": 0.0}, seed=2
        )
        by_lang = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        assert by_lang.get("en") == 1000  # rate 1.0 keeps every row
        assert by_lang.get("fr") is None  # rate 0.0 drops all
        assert by_lang.get("zz") is None  # absent stratum -> default 0.0
        assert by_lang["de"] == pytest.approx(500, rel=0.15)

    def test_default_rate_keeps_unknown_strata(self, spark):
        out = sampling.stratified_mix(
            docs(spark), {"en": 0.0}, seed=2, default_rate=1.0
        )
        langs = {r["lang"] for r in out.select("lang").distinct().collect()}
        assert langs == {"de", "fr", "zz"}

    def test_same_seed_agrees_with_hash_sample(self, spark):
        """A stratum at rate r selects exactly hash_sample(r)'s rows of
        that stratum — mixing composes with global sampling decisions."""
        mix = sampling.stratified_mix(docs(spark), {"en": 0.2}, seed=4)
        direct = sampling.hash_sample(
            docs(spark).where(F.col("lang") == "en"), 0.2, seed=4
        )
        assert {r["url"] for r in mix.collect()} == {
            r["url"] for r in direct.collect()
        }


class TestTrainHoldoutSplit:
    def test_disjoint_exhaustive_deterministic(self, spark):
        out = sampling.train_holdout_split(docs(spark), holdout=0.1, seed=6)
        counts = {
            r["split"]: r["n"]
            for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert sum(counts.values()) == 4000
        assert counts["holdout"] == pytest.approx(400, rel=0.2)
        again = sampling.train_holdout_split(docs(spark, parts=17), holdout=0.1, seed=6)
        a = {(r["url"], r["split"]) for r in out.collect()}
        b = {(r["url"], r["split"]) for r in again.collect()}
        assert a == b

    def test_holdout_equals_hash_sample_membership(self, spark):
        split = sampling.train_holdout_split(docs(spark), holdout=0.15, seed=8)
        hold = {r["url"] for r in split.where(F.col("split") == "holdout").collect()}
        samp = {r["url"] for r in sampling.hash_sample(docs(spark), 0.15, seed=8).collect()}
        assert hold == samp

    def test_no_python_udf_and_no_shuffle(self, spark):
        plan = (
            sampling.stratified_mix(docs(spark), {"en": 0.5}, seed=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure per-row filter, no shuffle
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Filter" in plan
