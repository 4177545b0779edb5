"""Checkpoint/resume tests: atomic snapshot commits, crash tolerance, and
the north_rule resume contract (killed run → resume → identical state)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from wbx.checkpoint import CheckpointStore, run_crawl


def seeds_df(spark):
    return spark.createDataFrame(
        [(f"http://h{i % 5}.com/seed/{i}", float(i % 3)) for i in range(40)],
        "url string, priority double",
    )


def hosts_df(spark):
    return spark.createDataFrame(
        [(f"h{i}.com", 6) for i in range(5)], "host string, budget int"
    )


def make_expand(spark):
    """Deterministic expansion: each fetched URL yields two children derived
    from its url_hash — same batch always produces the same candidates."""

    def expand(batch):
        kids = batch.select(
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
            F.col("url_hash"),
            F.col("host"),
            F.col("priority"),
        )
        return kids.select(
            F.concat(
                F.lit("http://"),
                F.col("host"),
                F.lit("/c/"),
                F.pmod(F.col("url_hash"), F.lit(10000)),
                F.lit("/"),
                F.col("k"),
            ).alias("url"),
            F.pmod(F.col("url_hash") + F.col("k"), F.lit(3)).cast("double").alias("priority"),
        )

    return expand


class TestStore:
    def test_commit_load_roundtrip(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "cp"))
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        store.commit(1, {"t": df})
        assert store.latest_round() == 1
        got = sorted((r["id"], r["v"]) for r in store.load(spark, "t").collect())
        assert got == [(1, "a"), (2, "b")]

    def test_manifest_points_to_last_complete_round(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "cp"))
        df = spark.createDataFrame([(1,)], "id long")
        store.commit(1, {"t": df})
        store.commit(2, {"t": spark.createDataFrame([(2,)], "id long")})
        m = store.manifest()
        assert m["round"] == 2
        assert m["tables"] == ["t"]

    def test_orphan_tmp_ignored_and_cleaned(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "cp"))
        df = spark.createDataFrame([(1,)], "id long")
        store.commit(1, {"t": df})
        # simulate a crash mid-write of round 2
        orphan = tmp_path / "cp" / "rounds" / ".tmp-r000002"
        os.makedirs(orphan / "t")
        (orphan / "t" / "part-junk").write_text("junk")
        assert store.latest_round() == 1  # reader follows manifest only
        store.commit(2, {"t": spark.createDataFrame([(2,)], "id long")})
        assert not orphan.exists()  # GC'd
        assert store.latest_round() == 2

    def test_recommit_crashed_round_is_idempotent(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "cp"))
        df1 = spark.createDataFrame([(1,)], "id long")
        store.commit(1, {"t": df1})
        # round dir published but manifest flip "crashed": manifest says 1
        rdir = tmp_path / "cp" / "rounds" / "r000002"
        os.makedirs(rdir)
        store.commit(2, {"t": spark.createDataFrame([(2,)], "id long")})
        assert store.load(spark, "t", 2).collect()[0]["id"] == 2


class TestResume:
    def collect_state(self, spark, store, rounds):
        logs = []
        for rid in range(1, rounds + 1):
            rows = store.load(spark, "fetch_log", rid).collect()
            logs.extend(
                sorted((r["round"], r["fetch_order"], r["canon_url"]) for r in rows)
            )
        seen = sorted(r["canon_url"] for r in store.load_seen(spark).collect())
        return logs, seen

    def test_killed_run_resumes_to_identical_state(self, spark, tmp_path):
        expand = make_expand(spark)
        hosts = hosts_df(spark)

        # uninterrupted: 3 rounds
        full = CheckpointStore(str(tmp_path / "full"))
        run_crawl(spark, full, seeds_df(spark), expand, hosts, rounds=3)

        # killed after round 2, then resumed with the same arguments
        part = CheckpointStore(str(tmp_path / "part"))
        run_crawl(spark, part, seeds_df(spark), expand, hosts, rounds=2)
        assert part.latest_round() == 2
        part2 = CheckpointStore(str(tmp_path / "part"))  # fresh handle = new process
        run_crawl(spark, part2, seeds_df(spark), expand, hosts, rounds=3)

        assert self.collect_state(spark, full, 3) == self.collect_state(spark, part2, 3)

    def test_resume_is_noop_when_already_complete(self, spark, tmp_path):
        expand = make_expand(spark)
        store = CheckpointStore(str(tmp_path / "cp"))
        run_crawl(spark, store, seeds_df(spark), expand, hosts_df(spark), rounds=2)
        before = json.dumps(store.manifest(), sort_keys=True)
        out = run_crawl(spark, store, seeds_df(spark), expand, hosts_df(spark), rounds=2)
        assert out["final_round"] == 2
        assert json.dumps(store.manifest(), sort_keys=True) == before

    def test_seen_commits_are_append_only_deltas(self, spark, tmp_path):
        """north_rule scale contract: a round commits O(batch) seen rows —
        never a rewrite of the cumulative set — and the deltas are disjoint,
        so commit cost stays constant as the crawl ages."""
        expand = make_expand(spark)
        store = CheckpointStore(str(tmp_path / "cp"))
        run_crawl(spark, store, seeds_df(spark), expand, hosts_df(spark), rounds=4)
        cumulative = 0
        for rid in range(1, 5):
            delta = store.load(spark, "seen_delta", rid).count()
            n_batch = store.load(spark, "fetch_log", rid).count()
            assert delta == n_batch
            cumulative += delta
        assert store.load_seen(spark).count() == cumulative

    def test_metrics_cover_every_round_and_partition_sums(self, spark, tmp_path):
        expand = make_expand(spark)
        store = CheckpointStore(str(tmp_path / "cp"))
        run_crawl(spark, store, seeds_df(spark), expand, hosts_df(spark), rounds=2)
        for rid in (1, 2):
            m = store.load(spark, "metrics", rid)
            sched = m.filter(F.col("metric") == "urls_scheduled").agg(
                F.sum("value")
            ).collect()[0][0]
            n_batch = store.load(spark, "fetch_log", rid).count()
            assert int(sched) == n_batch


class TestCompaction:
    def test_compact_preserves_exact_seen_set(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "c1"))
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        before = sorted(
            (r["url_hash"], r["canon_url"]) for r in store.load_seen(spark).collect()
        )
        marker = store.compact_seen(spark, buckets=8)
        assert marker["compacted_through"] == 3
        after = sorted(
            (r["url_hash"], r["canon_url"]) for r in store.load_seen(spark).collect()
        )
        assert after == before and marker["rows"] == len(before)

    def test_resume_after_compaction_identical(self, spark, tmp_path):
        # uncompacted 5-round reference run
        ref = CheckpointStore(str(tmp_path / "ref"))
        run_crawl(spark, ref, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=5)
        # compacted run: 3 rounds, compact, resume to 5
        st = CheckpointStore(str(tmp_path / "cmp"))
        run_crawl(spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        st.compact_seen(spark, buckets=8)
        run_crawl(spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=5)
        for store in (ref, st):
            assert store.latest_round() == 5
        a = sorted(map(tuple, ref.load_seen(spark).collect()))
        b = sorted(map(tuple, st.load_seen(spark).collect()))
        assert a == b
        fa = sorted(map(tuple, ref.load(spark, "fetch_log", 5).collect()))
        fb = sorted(map(tuple, st.load(spark, "fetch_log", 5).collect()))
        assert fa == fb

    def test_load_seen_before_compaction_point_uses_deltas(self, spark, tmp_path):
        st = CheckpointStore(str(tmp_path / "c2"))
        run_crawl(spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        want_r2 = sorted(map(tuple, st.load_seen(spark, 2).collect()))
        st.compact_seen(spark)
        # asking for an older round must NOT see the (newer) base
        assert sorted(map(tuple, st.load_seen(spark, 2).collect())) == want_r2


class TestBucketedSeenBase:
    """compact_seen(bucketed=True) + load_seen_split: the shuffle-free
    membership path for the 10^10-URL seen set (frontier.filter_unseen_split).
    Correctness here; the no-exchange plan shape is pinned in test_plans.py."""

    def test_bucketed_compact_preserves_exact_seen_set(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "b1"))
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        before = sorted(map(tuple, store.load_seen(spark).collect()))
        marker = store.compact_seen(spark, buckets=8, bucketed=True)
        assert marker["compacted_through"] == 3 and marker["buckets"] == 8
        base, recent, nb = store.load_seen_split(spark)
        assert nb == 8 and recent.count() == 0
        assert sorted(map(tuple, base.collect())) == before
        # load_seen (the union reader) sees the same set through the base
        assert sorted(map(tuple, store.load_seen(spark).collect())) == before

    def test_split_load_covers_post_compaction_deltas(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "b2"))
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=2)
        store.compact_seen(spark, buckets=8, bucketed=True)
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=4)
        base, recent, nb = store.load_seen_split(spark)
        got = sorted(map(tuple, base.unionByName(recent).collect()))
        assert got == sorted(map(tuple, store.load_seen(spark).collect()))
        assert recent.count() > 0  # rounds 3-4 deltas ride the recent side

    def test_split_load_falls_back_without_bucketed_compaction(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "b3"))
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=2)
        base, recent, nb = store.load_seen_split(spark)
        assert base is None and nb == 0
        assert sorted(map(tuple, recent.collect())) == sorted(
            map(tuple, store.load_seen(spark).collect())
        )
        # plain (non-bucketed) compaction must also use the fallback: its
        # files carry no bucket metadata
        store.compact_seen(spark, buckets=8)
        base, recent, nb = store.load_seen_split(spark)
        assert base is None and nb == 0

    def test_split_load_history_read_predating_compaction(self, spark, tmp_path):
        store = CheckpointStore(str(tmp_path / "b4"))
        run_crawl(spark, store, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        want_r2 = sorted(map(tuple, store.load_seen(spark, 2).collect()))
        store.compact_seen(spark, buckets=8, bucketed=True)
        # the round-2 view must NOT see the round-3 base (it holds future keys)
        base, recent, nb = store.load_seen_split(spark, 2)
        assert base is None and nb == 0
        assert sorted(map(tuple, recent.collect())) == want_r2

    def test_run_crawl_with_compact_every_is_bit_identical(self, spark, tmp_path):
        ref = CheckpointStore(str(tmp_path / "ref"))
        run_crawl(spark, ref, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=5)
        st = CheckpointStore(str(tmp_path / "cmp"))
        run_crawl(
            spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark),
            rounds=5, compact_every=2,
        )
        assert st._compaction()["buckets"] > 0  # the bucketed path actually ran
        a = sorted(map(tuple, ref.load_seen(spark).collect()))
        b = sorted(map(tuple, st.load_seen(spark).collect()))
        assert a == b
        for rid in range(1, 6):
            fa = sorted(map(tuple, ref.load(spark, "fetch_log", rid).collect()))
            fb = sorted(map(tuple, st.load(spark, "fetch_log", rid).collect()))
            assert fa == fb

    def test_resume_after_bucketed_compaction_identical(self, spark, tmp_path):
        ref = CheckpointStore(str(tmp_path / "ref2"))
        run_crawl(spark, ref, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=5)
        st = CheckpointStore(str(tmp_path / "cmp2"))
        run_crawl(spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=3)
        st.compact_seen(spark, buckets=8, bucketed=True)
        # killed here; resume continues on the split membership path
        run_crawl(
            spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark),
            rounds=5, compact_every=2,
        )
        assert sorted(map(tuple, ref.load_seen(spark).collect())) == sorted(
            map(tuple, st.load_seen(spark).collect())
        )
        fa = sorted(map(tuple, ref.load(spark, "fetch_log", 5).collect()))
        fb = sorted(map(tuple, st.load(spark, "fetch_log", 5).collect()))
        assert fa == fb

    def test_run_crawl_compact_every_cuckoo_kind_identical(self, spark, tmp_path):
        ref = CheckpointStore(str(tmp_path / "ref3"))
        run_crawl(spark, ref, seeds_df(spark), make_expand(spark), hosts_df(spark), rounds=4)
        st = CheckpointStore(str(tmp_path / "cmp3"))
        run_crawl(
            spark, st, seeds_df(spark), make_expand(spark), hosts_df(spark),
            rounds=4, compact_every=1, sketch_kind="cuckoo",
        )
        assert sorted(map(tuple, ref.load_seen(spark).collect())) == sorted(
            map(tuple, st.load_seen(spark).collect())
        )
        fa = sorted(map(tuple, ref.load(spark, "fetch_log", 4).collect()))
        fb = sorted(map(tuple, st.load(spark, "fetch_log", 4).collect()))
        assert fa == fb


class TestCrawlReport:
    def test_report_per_round_health(self, spark, tmp_path):
        from wbx.checkpoint import crawl_report

        store = CheckpointStore(str(tmp_path / "rep"))
        run_crawl(
            spark, store, seeds_df(spark), make_expand(spark),
            hosts_df(spark), rounds=3,
        )
        rows = {r["round"]: r for r in crawl_report(spark, store).collect()}
        assert set(rows) == {1, 2, 3}
        for rid, r in rows.items():
            # scheduled == seen delta (the anti-join invariant), matching
            # the committed fetch_log row count exactly
            n_log = store.load(spark, "fetch_log", rid).count()
            assert r["urls_scheduled"] == r["seen_added"] == n_log
            assert r["n_hosts"] >= 1 and r["top_host"]
            assert 0 < r["top_host_frac"] <= 1.0
            assert 0 < r["max_partition_frac"] <= 1.0
            assert r["n_partitions"] >= 1

    def test_report_keeps_pathological_rounds(self, spark, tmp_path):
        """A round with an EMPTY fetch_log and no seen_added metric —
        exactly the round an operator must see — still gets a report row
        (left joins + coalesced zeros, not inner joins)."""
        from wbx.checkpoint import crawl_report

        store = CheckpointStore(str(tmp_path / "rep2"))
        run_crawl(
            spark, store, seeds_df(spark), make_expand(spark),
            hosts_df(spark), rounds=2,
        )
        dead_metrics = spark.createDataFrame(
            [(3, 0, "urls_scheduled", 0.0)],
            "round int, partition_id int, metric string, value double",
        )
        empty_log = store.load(spark, "fetch_log", 2).limit(0)
        store.commit(3, {"metrics": dead_metrics, "fetch_log": empty_log})
        # round 4: scheduled ZERO urls — per-partition metrics of an empty
        # batch have no rows at all, so only rooting the report on the
        # committed-round manifest keeps it visible
        store.commit(4, {"metrics": dead_metrics.limit(0), "fetch_log": empty_log})
        rows = {r["round"]: r for r in crawl_report(spark, store).collect()}
        assert set(rows) == {1, 2, 3, 4}
        for rid in (3, 4):
            dead = rows[rid]
            assert dead["urls_scheduled"] == 0
            assert dead["seen_added"] == 0
            assert dead["n_hosts"] == 0
            assert dead["top_host"] is None
