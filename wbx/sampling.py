"""Deterministic corpus sampling, mixing, and holdout splitting.

Training-data pipelines mix sources at tuned per-stratum rates and carve
out held-out eval slices, and the selection must be REPRODUCIBLE: the same
corpus + seed must select the same documents at any parallelism, any
partitioning, any retry. ``df.sample`` violates all of that (per-partition
RNG, order-dependent); everything here is hash-based — membership is a
pure function of (key, seed) — so it is stable under repartitioning and
speculative re-execution, and incremental by construction (re-running over
a grown corpus keeps every previous decision for unchanged keys; this is
how corpus freezes stay consistent across crawl snapshots).

No reference counterpart (warcbench has no sampling surface; nearest is
the stop-after-nth limit, ref config.py — a prefix, not a sample). The
per-row decision is one hash + one compare, fully inside whole-stage
codegen: no shuffle, no join, no Python anywhere.

``hasher``: Column×seed → int64 Column. Default is Spark's native
xxhash64 (JVM, fastest). Pass :func:`md5_seeded` for cross-engine
reproducibility — md5 is bit-identical in DuckDB/Presto/etc., which is
what lets the driver oracle pin the SELECTED ROWS exactly, not just the
rate (same portable-hasher pattern as wbx.textops.md5_hash60 / winnow).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wbx.textops import md5_hash60

_BUCKETS = 1_000_000


def xxhash_seeded(key: Column, seed: int) -> Column:
    return F.xxhash64(key, F.lit(seed))


def md5_seeded(key: Column, seed: int) -> Column:
    """Portable seeded hash: md5 over key + '#' + seed, first 60 bits.
    Cross-engine bit-identical (see textops.md5_hash60)."""
    return md5_hash60(F.concat(key.cast("string"), F.lit(f"#{seed}")))


def sample_bucket(key: Column, seed: int = 0, hasher=xxhash_seeded) -> Column:
    """Uniform bucket in [0, 1e6) — the shared primitive: a rate r keeps
    bucket < r*1e6, so nested rates are MONOTONE (the 10% sample is a
    subset of the 20% sample at the same seed — required for consistent
    corpus scaling ablations)."""
    return F.pmod(hasher(key, seed), F.lit(_BUCKETS))


def keep_fraction(key: Column, rate: float, seed: int = 0, hasher=xxhash_seeded) -> Column:
    """Boolean: deterministically keep ~``rate`` of distinct keys."""
    return sample_bucket(key, seed, hasher) < int(round(rate * _BUCKETS))


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "url",
    seed: int = 0,
    hasher=xxhash_seeded,
) -> DataFrame:
    """Deterministic Bernoulli-by-hash sample of ~``rate`` of the rows
    (exactly: rows whose key-bucket falls below rate*1e6)."""
    return df.where(keep_fraction(F.col(key_col), rate, seed, hasher))


def stratified_mix(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "url",
    seed: int = 0,
    default_rate: float = 0.0,
    hasher=xxhash_seeded,
) -> DataFrame:
    """Source/language mixing: keep each stratum at its own rate (the
    RedPajama/Dolma-style source-weight operation). The rate table rides
    as a LITERAL map expression inside codegen — per-row work is one map
    lookup + one hash + one compare; no join, no broadcast, no shuffle.
    Strata absent from ``rates`` fall back to ``default_rate`` (0.0 =
    drop unknown strata — the safe default for a curated mix)."""
    rate_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(float(v))) for k, v in rates.items())
    )
    thresh = F.coalesce(
        F.element_at(rate_map, F.col(strata_col)), F.lit(float(default_rate))
    ) * F.lit(float(_BUCKETS))
    return df.where(
        sample_bucket(F.col(key_col), seed, hasher).cast("double") < thresh
    )


def train_holdout_split(
    df: DataFrame,
    holdout: float = 0.01,
    key_col: str = "url",
    seed: int = 0,
    hasher=xxhash_seeded,
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'holdout' or 'train' — disjoint and exhaustive by
    construction (one bucket compare decides both sides), so the eval
    slice can never leak into training regardless of execution order.
    Keyed on the same (key, seed) bucket as hash_sample: a decontamination
    pass and a holdout carve-out using the same seed agree on membership."""
    return df.withColumn(
        split_col,
        F.when(
            keep_fraction(F.col(key_col), holdout, seed, hasher), F.lit("holdout")
        ).otherwise(F.lit("train")),
    )
