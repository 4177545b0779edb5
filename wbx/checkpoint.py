"""Crawl-state checkpointing: atomic per-round snapshots + exact resume.

north_rule: "checkpoints frontier state and the seen-set … so a killed run
resumes exactly, emitting per-partition lineage and fetch/parse metrics".

In production these tables are Iceberg and a round commit is one atomic
multi-table snapshot. This container has no Iceberg jars, so the same
semantics are built on parquet + an atomically-replaced manifest:

    base/
      rounds/r000001/<table>/*.parquet     (written to a tmp dir, then
      rounds/r000002/...                    os.rename'd into place)
      MANIFEST.json                        (os.replace — atomic pointer to
                                            the latest complete round)

A reader only ever follows MANIFEST.json, so a run killed mid-write leaves
at most an orphan tmp dir (ignored, cleaned on the next commit) and the
previous snapshot stays the visible state — exactly Iceberg's
snapshot-pointer contract. Resume = read the manifest, load the tables,
continue from round+1; re-running a round is idempotent because every
operator in wbx.frontier is deterministic in the data.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "MANIFEST.json"


class CheckpointStore:
    """Atomic multi-table snapshot store for crawl rounds."""

    def __init__(self, base_dir: str):
        self.base = base_dir
        os.makedirs(os.path.join(base_dir, "rounds"), exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.base, MANIFEST)

    def manifest(self) -> dict | None:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def latest_round(self) -> int:
        m = self.manifest()
        return m["round"] if m else 0

    # -- commit / load ------------------------------------------------------

    def commit(self, round_id: int, tables: dict[str, DataFrame]) -> dict:
        """Write all tables for one round, then atomically publish.

        Write order: every table lands in rounds/.tmp-rNNN first; a single
        os.rename publishes the round directory; a single os.replace flips
        the manifest pointer. A crash anywhere before the final replace
        leaves the previous snapshot as the visible state.
        """
        rname = f"r{round_id:06d}"
        rounds_dir = os.path.join(self.base, "rounds")
        tmp_dir = os.path.join(rounds_dir, f".tmp-{rname}")
        final_dir = os.path.join(rounds_dir, rname)
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        if os.path.exists(final_dir):
            shutil.rmtree(final_dir)  # idempotent re-commit of a crashed round
        for name, df in tables.items():
            df.write.mode("overwrite").parquet(os.path.join(tmp_dir, name))
        os.rename(tmp_dir, final_dir)
        manifest = {
            "round": round_id,
            "path": final_dir,
            "tables": sorted(tables),
            "committed_at": time.time(),
        }
        tmp_manifest = self._manifest_path() + ".tmp"
        with open(tmp_manifest, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp_manifest, self._manifest_path())
        # GC any orphan tmp dirs from crashed earlier attempts
        for d in os.listdir(rounds_dir):
            if d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(rounds_dir, d), ignore_errors=True)
        return manifest

    def load(self, spark: SparkSession, table: str, round_id: int | None = None) -> DataFrame:
        rid = round_id if round_id is not None else self.latest_round()
        path = os.path.join(self.base, "rounds", f"r{rid:06d}", table)
        return spark.read.parquet(path)

    def has_table(self, table: str, round_id: int | None = None) -> bool:
        """Whether `table` was committed for the round — the supported way
        to probe for optional tables (stream_marker, seen_bloom) written
        only by some producers. Callers must use this rather than catching
        load()'s read errors: a broad except around spark.read would also
        swallow transient I/O failures, silently breaking the streaming
        replay guard's exactly-once property."""
        rid = round_id if round_id is not None else self.latest_round()
        return os.path.isdir(os.path.join(self.base, "rounds", f"r{rid:06d}", table))

    def _bucket_table_name(self) -> str:
        """Catalog name for the bucketed seen base — stable per store (the
        session catalog is in-memory by default, so the name must be
        re-derivable after a restart)."""
        import hashlib

        digest = hashlib.md5(os.path.abspath(self.base).encode()).hexdigest()[:12]
        return f"wbx_seen_base_{digest}"

    def attach_seen_base(self, spark: SparkSession) -> DataFrame | None:
        """The compacted seen base as a DataFrame whose scan reports its
        bucketing (HashPartitioning on url_hash) — the co-located-join fast
        path of filter_unseen_split. Returns None when no bucketed
        compaction exists.

        The default session catalog is in-memory, so after a restart the
        table written by compact_seen(bucketed=True) is files-on-disk with
        no catalog entry; this re-attaches it with the same bucket spec via
        external-table DDL (drop+create is idempotent and never touches the
        files — the table is external). This is exactly the Iceberg-manifest
        re-read analogue: metadata lives with the store, the catalog is a
        cache."""
        comp = self._compaction()
        if not comp or not comp.get("buckets") or not os.path.isdir(comp["path"]):
            return None
        tbl = self._bucket_table_name()
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        spark.sql(
            f"CREATE TABLE {tbl} (url_hash BIGINT, canon_url STRING) "
            f"USING PARQUET CLUSTERED BY (url_hash, canon_url) "
            f"SORTED BY (url_hash, canon_url) "
            f"INTO {int(comp['buckets'])} BUCKETS LOCATION '{comp['path']}'"
        )
        return spark.table(tbl)

    def compact_seen(
        self, spark: SparkSession, buckets: int = 64, bucketed: bool = False
    ) -> dict:
        """Maintenance job (the Iceberg bin-packing analogue): merge every
        round's append-only ``seen_delta`` directory into ONE bucketed
        ``seen_base`` table under the latest round, so a long crawl's
        reader-side multi-path scan stops growing with crawl age.

        Correctness: deltas are disjoint by construction (crawl_round's
        anti-join), so the merged set is an exact union — no distinct
        needed. With ``bucketed=False`` the base is written hash-partitioned
        by pmod(url_hash, buckets) so future membership anti-joins can prune
        buckets; with ``bucketed=True`` it is written as a true Spark
        bucketed table on BOTH membership keys (bucketBy(url_hash,
        canon_url) + sortBy — the Iceberg ``bucket(N, ...)`` partition
        transform), whose scan carries HashPartitioning(url_hash, canon_url)
        — exactly the anti-join's required distribution — so the per-round
        membership check runs WITHOUT shuffling the cumulative set at all;
        and since crawl_round's dedup groupBy uses the same keys, a bucket
        count equal to spark.sql.shuffle.partitions makes the whole
        dedup+membership pipeline a single exchange of O(batch) rows (see
        frontier.filter_unseen_split). load_seen reads base + any deltas
        newer than the compaction point. Crash-safe: the base lands in the
        current round's directory tree first, then COMPACTION.json is
        atomically replaced; a crash leaves the old view intact."""
        rid = self.latest_round()
        if rid == 0:
            return {"compacted_through": 0, "rows": 0}
        prior = self._compaction()
        if prior and prior["compacted_through"] == rid:
            # idempotent no-op: re-compacting without an intervening round
            # would otherwise overwrite the very base load_seen is reading
            return prior
        seen = self.load_seen(spark)
        base_dir = os.path.join(self.base, "rounds", f"r{rid:06d}", "seen_base")
        if bucketed:
            tbl = self._bucket_table_name()
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                # repartition by the bucket keys first so each write task
                # holds exactly one bucket -> one file per bucket
                seen.repartition(buckets, F.col("url_hash"), F.col("canon_url"))
                .write.mode("overwrite")
                .bucketBy(buckets, "url_hash", "canon_url")
                .sortBy("url_hash", "canon_url")
                .option("path", base_dir)
                .saveAsTable(tbl)
            )
            n = spark.table(tbl).count()
        else:
            (
                seen.repartition(buckets, F.pmod(F.col("url_hash"), F.lit(buckets)))
                .write.mode("overwrite")
                .parquet(base_dir)
            )
            n = spark.read.parquet(base_dir).count()
        marker = {
            "compacted_through": rid,
            "path": base_dir,
            "rows": n,
            "buckets": buckets if bucketed else 0,
        }
        tmp = os.path.join(self.base, "COMPACTION.json.tmp")
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, os.path.join(self.base, "COMPACTION.json"))
        return marker

    def load_seen_split(
        self, spark: SparkSession, round_id: int | None = None
    ) -> tuple[DataFrame | None, DataFrame, int]:
        """(bucketed base | None, recent deltas, bucket count) as of
        ``round_id`` — the input shape of frontier.filter_unseen_split.
        Falls back to (None, full seen scan, 0) when no bucketed compaction
        covers the requested round (including history reads at a round
        BEFORE the compaction point, where the base would contain keys from
        the future)."""
        rid = round_id if round_id is not None else self.latest_round()
        comp = self._compaction()
        if (
            not comp
            or not comp.get("buckets")
            or comp["compacted_through"] > rid
            or not os.path.isdir(comp["path"])
        ):
            return None, self.load_seen(spark, rid), 0
        base = self.attach_seen_base(spark)
        paths = [
            p
            for r in range(comp["compacted_through"] + 1, rid + 1)
            if os.path.isdir(
                p := os.path.join(self.base, "rounds", f"r{r:06d}", "seen_delta")
            )
        ]
        if paths:
            recent = spark.read.parquet(*paths).select("url_hash", "canon_url")
        else:
            recent = spark.createDataFrame([], "url_hash long, canon_url string")
        return base, recent, int(comp["buckets"])

    def _compaction(self) -> dict | None:
        try:
            with open(os.path.join(self.base, "COMPACTION.json")) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def load_seen(self, spark: SparkSession, round_id: int | None = None) -> DataFrame:
        """The full seen-set as of `round_id`: the union of every round's
        append-only ``seen_delta`` partition (crawl_round's anti-join makes
        the per-round deltas disjoint by construction, so a plain multi-path
        parquet scan IS the exact set — no distinct needed).

        This is the Iceberg-append analogue: a round commits only the keys
        it newly scheduled (O(batch) bytes), never a rewrite of the whole
        10^10-row seen table; readers see the set as a partitioned scan.
        Production compaction (bin-packing small delta files) is an Iceberg
        maintenance job, orthogonal to the semantics here."""
        rid = round_id if round_id is not None else self.latest_round()
        start = 1
        paths: list[str] = []
        comp = self._compaction()
        if comp and comp["compacted_through"] <= rid and os.path.isdir(comp["path"]):
            paths.append(comp["path"])
            start = comp["compacted_through"] + 1
        paths += [
            p
            for r in range(start, rid + 1)
            if os.path.isdir(
                p := os.path.join(self.base, "rounds", f"r{r:06d}", "seen_delta")
            )
        ]
        if not paths:
            return spark.createDataFrame([], "url_hash long, canon_url string")
        return spark.read.parquet(*paths).select("url_hash", "canon_url")


# ---------------------------------------------------------------------------
# lineage / metrics
# ---------------------------------------------------------------------------


def partition_metrics(df: DataFrame, round_id: int, metric: str) -> DataFrame:
    """Per-partition lineage rows (round, partition_id, metric, value):
    how many rows of `metric` each partition produced this round — the
    north_rule's per-partition lineage signal, computed as a cheap
    map-side groupBy on spark_partition_id()."""
    return df.groupBy(F.spark_partition_id().alias("partition_id")).agg(
        F.count("*").cast("double").alias("value")
    ).select(
        F.lit(round_id).alias("round"),
        "partition_id",
        F.lit(metric).alias("metric"),
        "value",
    )


def round_metrics(round_id: int, batch: DataFrame, seen_delta: DataFrame) -> DataFrame:
    """`seen_added` counts THIS round's delta (the keys newly marked seen),
    not the cumulative set — the lineage signal a crawl operator actually
    watches round-over-round."""
    return partition_metrics(batch, round_id, "urls_scheduled").unionByName(
        partition_metrics(seen_delta, round_id, "seen_added")
    )


def crawl_report(spark: SparkSession, store: "CheckpointStore") -> DataFrame:
    """Cross-round crawl health rollup from a store's committed snapshots:
    one row per round — (round, urls_scheduled, seen_added, n_partitions,
    max_partition_frac, n_hosts, top_host, top_host_frac). The numbers an
    operator actually watches: discovery keeping pace (urls_scheduled
    round-over-round), partition skew (max_partition_frac → one straggler
    task owns the round), and politeness health (top_host_frac → one
    domain monopolizing the batch).

    Reads every round's ``metrics`` and ``fetch_log`` in ONE glob scan
    each (both carry a ``round`` column — no driver-side loop over
    rounds); aggregates are map-side combinable at round × host
    cardinality. Deterministic: top host ties break lexicographically
    via max(struct(n, host))."""
    base = os.path.join(store.base, "rounds")
    metrics = spark.read.parquet(os.path.join(base, "r*", "metrics"))
    per = (
        metrics.filter(F.col("metric") == "urls_scheduled")
        .groupBy("round")
        .agg(
            F.sum("value").cast("long").alias("urls_scheduled"),
            F.count("*").cast("long").alias("n_partitions"),
            # try_divide: a committed round that scheduled 0 urls has
            # sum(value)=0 — NULL skew, not an ANSI divide-by-zero abort
            F.try_divide(F.max("value"), F.sum("value")).alias(
                "max_partition_frac"
            ),
        )
    )
    seen = (
        metrics.filter(F.col("metric") == "seen_added")
        .groupBy("round")
        .agg(F.sum("value").cast("long").alias("seen_added"))
    )
    fl = spark.read.parquet(os.path.join(base, "r*", "fetch_log"))
    host_counts = fl.groupBy("round", "host").agg(F.count("*").alias("_n"))
    hosts = host_counts.groupBy("round").agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.max(F.struct(F.col("_n"), F.col("host"))).alias("_top"),
        F.sum("_n").alias("_total"),
    ).select(
        "round",
        "n_hosts",
        F.col("_top.host").alias("top_host"),
        (F.col("_top._n") / F.col("_total")).alias("top_host_frac"),
    )
    # LEFT joins rooted on the store's committed-round list: a round whose
    # fetch_log is empty — or that scheduled ZERO urls, in which case even
    # its urls_scheduled metric has no per-partition rows — is exactly the
    # pathological round an operator needs to see; inner joins (or rooting
    # on the metrics rollup) would silently drop it from the health report.
    # The round list is a driver-side manifest read, O(#rounds) ≪ O(data).
    committed = spark.createDataFrame(
        [(r,) for r in range(1, store.latest_round() + 1)], "round int"
    )
    return (
        committed.join(per, "round", "left")
        .join(seen, "round", "left")
        .join(hosts, "round", "left")
        .select(
            "round",
            F.coalesce(F.col("urls_scheduled"), F.lit(0).cast("long")).alias(
                "urls_scheduled"
            ),
            F.coalesce(F.col("seen_added"), F.lit(0).cast("long")).alias(
                "seen_added"
            ),
            "n_partitions",
            "max_partition_frac",
            F.coalesce(F.col("n_hosts"), F.lit(0).cast("long")).alias(
                "n_hosts"
            ),
            "top_host",
            "top_host_frac",
        )
    )


# ---------------------------------------------------------------------------
# multi-round crawl driver with exact resume
# ---------------------------------------------------------------------------


def run_crawl(
    spark: SparkSession,
    store: CheckpointStore,
    seeds: DataFrame,
    expand,
    hosts: DataFrame,
    robots: DataFrame | None = None,
    rounds: int = 3,
    batch_size: int | None = None,
    default_budget: int = 10,
    use_bloom: bool = True,
    bloom_partitions: int = 64,
    bloom_bits: int = 1 << 20,
    sketch_kind: str = "bloom",
    cuckoo_nbuckets: int = 1 << 16,
    rank_refresh_every: int = 8,
    compact_every: int | None = None,
    reprioritize=None,
    robots_style: str = "prefix",
) -> dict:
    """Batch-iterative crawl: each round schedules a fetch batch from the
    current frontier, marks it seen, expands it into next-round candidates,
    and commits {frontier, seen, fetch_log, metrics} as one snapshot.

    Resume contract: if the store already holds N committed rounds, the
    loop continues at N+1 against the checkpointed state — a killed run
    re-driven with the same arguments lands on the identical final state
    (all ordering is deterministic in the data; see wbx.frontier).

    ``expand(batch_df) -> DataFrame(url, priority)`` must be deterministic.
    seeds: (url, priority).

    Seen-set growth contract (the 10^10-URL design point): a round writes
    ONLY its delta — the keys it just scheduled — never a rewrite of the
    cumulative set. crawl_round's anti-join guarantees the batch is disjoint
    from every prior delta, so ``seen = union of deltas`` is exact with no
    distinct/shuffle, and per-round commit cost is O(batch), constant in
    crawl age (test_checkpoint pins this: round N's seen_delta row count
    equals round N's fetch_log row count).

    Seen-sketch contract (`use_bloom`, on by default): the loop maintains
    per-partition Bloom filters over the seen keys ALONGSIDE the deltas —
    each round ORs in only that round's delta (update_seen_bloom, O(batch))
    and commits the filters as the ``seen_bloom`` table, then feeds them to
    crawl_round's co-partitioned prefilter, so the definitely-unseen
    majority of candidates never probes the cumulative seen table. Results
    are bit-identical with the sketch on or off (false positives are
    re-checked exactly; the sketch never drops a candidate). Resuming from
    a checkpoint that predates the sketch rebuilds it once from the seen
    set.

    ``sketch_kind`` picks the sketch family: "bloom" (default — densest
    bits/key) or "cuckoo" (wbx.cuckoo — pick it when the crawl also
    retracts URLs between rounds; its table commits as ``seen_cuckoo`` and
    is maintained with the same O(batch) incremental contract). Both are
    admit-only, so the fetch batches are bit-identical across kinds.

    ``compact_every``: every K committed rounds, fold the accumulated
    seen deltas into ONE bucketed base table
    (compact_seen(bucketed=True)) and switch the loop to the split
    membership path (load_seen_split → frontier.filter_unseen_split):
    the cumulative seen set then joins co-located off its bucketed scan —
    no exchange, no sort, zero bytes of crawl history on the wire per
    round — while only the ≤K recent deltas shuffle. This is the
    10^10-URL operating mode; results are bit-identical with it off.

    ``reprioritize(frontier_df) -> DataFrame(url, priority)``: optional
    deterministic hook applied to each round's expanded frontier before it
    is committed — the integration point for authority-driven scheduling
    (pass e.g. ``lambda df: wbx.graph.with_authority_priority(df, ranks,
    url_col="url")`` to order fetches by host PageRank instead of the
    expander's raw priorities). Like ``expand`` it must be deterministic;
    it changes crawl ORDER by design, so leave it unset when reproducing
    the reference's priority semantics.
    """
    from wbx import cuckoo as _cuckoo
    from wbx.frontier import (
        build_seen_bloom,
        crawl_round,
        empty_seen_bloom,
        release_rank_caches,
        update_seen_bloom,
    )

    if sketch_kind not in ("bloom", "cuckoo"):
        raise ValueError("sketch_kind must be bloom | cuckoo")
    is_bloom = sketch_kind == "bloom"
    table = "seen_bloom" if is_bloom else "seen_cuckoo"
    start = store.latest_round()
    if start == 0:
        seen_base, nbuckets = None, 0
        seen = spark.createDataFrame([], "url_hash long, canon_url string")
        frontier = seeds
        sketch = (
            empty_seen_bloom(spark) if is_bloom else _cuckoo.empty_seen_cuckoo(spark)
        )
    else:
        seen_base, seen, nbuckets = store.load_seen_split(spark)
        frontier = store.load(spark, "frontier")
        if store.has_table(table):
            sketch = store.load(spark, table)
        elif is_bloom:
            # checkpoint predates the sketch — one rebuild (from the FULL
            # seen set, not the split view), then incremental
            sketch = build_seen_bloom(store.load_seen(spark), bloom_partitions)
        else:
            sketch = _cuckoo.build_seen_cuckoo(
                store.load_seen(spark), bloom_partitions, nbuckets=cuckoo_nbuckets
            )

    last = None
    # rank-boundary reuse across rounds (see global_rank): boundaries only
    # steer partition balance, so a later round may rank against an earlier
    # round's sample; refreshed every `rank_refresh_every` rounds so the
    # balance tracks the frontier's drifting key distribution
    rank_cache: dict = {}
    for rid in range(start + 1, rounds + 1):
        if rank_refresh_every and (rid - start - 1) % rank_refresh_every == 0:
            rank_cache.clear()
        batch = crawl_round(
            frontier,
            seen,
            hosts,
            robots,
            batch_size,
            default_budget,
            bloom=sketch if (use_bloom and is_bloom) else None,
            bloom_partitions=bloom_partitions,
            cuckoo=sketch if (use_bloom and not is_bloom) else None,
            rank_boundary_cache=rank_cache,
            robots_style=robots_style,
            # base_buckets stays None: the dedup/tagged side already
            # arrives hash-partitioned on the join keys, so
            # EnsureRequirements aligns it to the bucket count with at
            # most one exchange — an explicit repartition here would add
            # a second
            seen_base=seen_base,
        ).persist()
        # the batch is already unseen (anti-joined) and unique per canon_url
        # (deduped), so it IS the round's exact seen-delta
        seen_delta = batch.select("url_hash", "canon_url")
        next_frontier = expand(batch)
        if reprioritize is not None:
            next_frontier = reprioritize(next_frontier)
        fetch_log = batch.select(
            F.lit(rid).alias("round"), "fetch_order", "canon_url", "url_hash", "host", "priority"
        )
        metrics = round_metrics(rid, batch, seen_delta)
        store.commit(
            rid,
            {
                "frontier": next_frontier,
                "seen_delta": seen_delta,
                "fetch_log": fetch_log,
                "metrics": metrics,
                table: (
                    update_seen_bloom(sketch, seen_delta, bloom_partitions, bloom_bits)
                    if is_bloom
                    else _cuckoo.update_seen_cuckoo(
                        sketch, seen_delta, bloom_partitions, cuckoo_nbuckets
                    )
                ),
            },
        )
        if compact_every and (rid - start) % compact_every == 0:
            # bucket count = shuffle partitions -> the next round's
            # candidate-side exchange (dedup groupBy, same keys) is
            # directly compatible with the base's bucketing
            store.compact_seen(
                spark,
                buckets=int(spark.conf.get("spark.sql.shuffle.partitions")),
                bucketed=True,
            )
        # reload from the snapshot so each round's lineage is rooted in
        # committed files, not an ever-deepening in-memory plan
        seen_base, seen, nbuckets = store.load_seen_split(spark, rid)
        frontier = store.load(spark, "frontier", rid)
        sketch = store.load(spark, table, rid)
        batch.unpersist()
        release_rank_caches()
        last = rid
    return {"final_round": last or start, "store": store.base}
