"""Stage-isolated timings for the frontier round (guide §1.4 noop-sink
methodology): each prefix of the crawl_round pipeline is timed separately so
the expensive stage is identified by measurement, not guesswork.

Usage: python tools/bench_stages.py [reps]

Writes one JSON line per stage with min/median seconds over reps.
Inputs are materialized once exactly like bench.py's frontier job.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from wbx.frontier import (
        apply_politeness,
        apply_robots,
        crawl_round,
        filter_unseen,
        release_rank_caches,
        schedule_fetch_batch,
        url_hash,
        with_canon_url,
        with_url_host,
    )

    spark = bench.get_session()
    spark.sparkContext.setLogLevel("ERROR")
    base = bench.materialize_frontier_inputs(spark)
    cand = spark.read.parquet(os.path.join(base, "candidates"))
    seen = spark.read.parquet(os.path.join(base, "seen"))
    hosts = spark.range(1200).selectExpr(
        "concat('host', id, '.example.com') AS host", "CAST(500 AS INT) AS budget"
    )
    robots = spark.createDataFrame(
        [
            ("host3.example.com", "deny", "/"),
            ("host7.example.com", "deny", "/p/1"),
            ("host7.example.com", "allow", "/p/11"),
        ],
        schema="host string, rule_type string, path_prefix string",
    )
    cand.count()
    seen.count()

    def canon():
        return with_canon_url(cand.select("url", "priority")).select(
            "canon_url", "priority"
        ).withColumn("url_hash", url_hash(F.col("canon_url")))

    def deduped():
        return canon().groupBy("url_hash", "canon_url").agg(
            F.max("priority").alias("priority")
        )

    def unseen():
        return filter_unseen(deduped(), seen)

    def hosted():
        return with_url_host(unseen())

    def robotsed():
        return apply_robots(hosted(), robots)

    def polite():
        return apply_politeness(robotsed(), hosts, 500)

    rank_cache: dict = {}

    def full():
        return crawl_round(
            cand, seen, hosts, robots, default_budget=500,
            rank_boundary_cache=rank_cache,
        )

    stages = [
        ("scan_only", lambda: cand.select("url", "priority")),
        ("canonicalize", canon),
        ("dedup", deduped),
        ("anti_join", unseen),
        ("host", hosted),
        ("robots", robotsed),
        ("politeness", polite),
        ("full_round", full),
    ]
    for name, fn in stages:
        times = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"stage:{name}")
            t0 = time.time()
            noop(fn())
            times.append(round(time.time() - t0, 3))
            release_rank_caches()
            spark.catalog.clearCache()
        times_sorted = sorted(times)
        print(
            json.dumps(
                {
                    "stage": name,
                    "min_s": times_sorted[0],
                    "med_s": times_sorted[len(times_sorted) // 2],
                    "times": times,
                }
            ),
            flush=True,
        )
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
