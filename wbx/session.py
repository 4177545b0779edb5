"""SparkSession factory tuned for the wbx workload.

Local-mode defaults mirror what we'd set fleet-wide on a real cluster:
AQE on (runtime join re-planning + skew-join splitting for hot domains),
Arrow transfer on (every byte-level kernel is a pandas UDF), shuffle
partitions sized to cores rather than the 200 default, UTC session TZ so
results compare bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wbx",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: int N for local[N], "*" for all, or None → $SPARK_GRAFT_CPUS or "*".
    shuffle_partitions: defaults to max(cores, 32) locally; on a real cluster
    this is set per-job to ~2-3x total executor cores.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 16)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("WBX_DRIVER_MEMORY", "8g"))
        # Constraint propagation infers IsNotNull(<full expression>) filters
        # and pushes them through projects, SUBSTITUTING aliases — for the
        # canonicalize_url pipeline that inlines a multi-thousand-node tree
        # into one Filter condition, blowing the JVM's 64 KB method limit so
        # the frontier's hottest stage silently dropped out of whole-stage
        # codegen (Janino "Code grows beyond 64 KB", BENCH_r02 tail). The
        # inferred filter is also semantically worthless here (canon_url is
        # NULL iff url is NULL). Off fleet-wide; guarded by
        # tests/test_plans.py::TestFrontierCodegen.
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
