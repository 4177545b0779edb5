"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Baseline: exact cosine top-k via a relational cross-join restricted to a
query subset — dot products with ``F.zip_with``/``F.aggregate`` (JVM-side).
Scale path: random-hyperplane LSH buckets (deterministic planes from a fixed
seed) so candidate generation is an equi-join on bucket signatures; only
within-bucket pairs pay the O(d) dot product. Recall is tunable with the
number of tables/bits; exactness of the returned distances is preserved
(LSH only prunes candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, double precision,
    deterministic left-to-right summation (F.aggregate folds in index
    order, matching DuckDB's list_cosine_similarity evaluation order)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    nb = F.sqrt(
        F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    queries: (query_id, embedding). The corpus side is the big one — the
    join broadcasts the QUERY side (queries ≪ corpus always in batch ANN),
    so the corpus never shuffles; top-k is a per-query window, shuffling
    only (query_id, vec_id, sim) triples.

    Deterministic tie-break: (sim DESC, vec_id ASC).
    """
    q = queries.select(
        F.col("query_id"), F.col(vec_col).alias("_qvec")
    )
    c = embeddings.select(F.col(id_col), F.col(vec_col).alias("_cvec"))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("sim", 6).alias("sim"))
    )


def dedup_exact_vectors(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, dup_count): survivors of exact embedding dedup — byte-identical
    vectors collapse to their lowest id (the vector analogue of
    textops.dedup_exact_ids, and the same collapse pairwise_above_threshold
    applies before LSH blocking). One map-side-combinable aggregate; the
    shuffle carries (vector, id) where vectors are small fixed-width
    arrays, so the exchange is bounded by corpus size, never quadratic."""
    return (
        embeddings.groupBy(vec_col)
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "dup_count")
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed + 1000 * table)
    return rng.standard_normal((bits, dim)).astype(np.float64)


def lsh_bucket_udf(dim: int, bits: int = 12, tables: int = 4, seed: int = 42):
    """Returns a pandas UDF mapping an embedding to its array of LSH bucket
    signatures (one int per table). Planes are deterministic from the seed
    so the same vector always lands in the same buckets on any executor."""
    planes = [_hyperplanes(dim, bits, t, seed) for t in range(tables)]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        out = []
        mat = np.array(
            [v if v is not None else np.zeros(dim) for v in vecs], dtype=np.float64
        )
        sigs = []
        for t, pl in enumerate(planes):
            proj = mat @ pl.T  # (n, bits)
            bit_sig = (proj > 0).astype(np.int64) @ (1 << np.arange(bits, dtype=np.int64))
            sigs.append(bit_sig + (t << bits))
        stacked = np.stack(sigs, axis=1)
        for row in stacked:
            out.append(row.tolist())
        return pd.Series(out, dtype=object)

    return buckets


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 10,
    tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """ANN top-k: equi-join on shared LSH buckets, exact cosine within.

    Candidate generation shuffles only (bucket, id) pairs — vectors do NOT
    ride the bucket join (they'd cross the wire once per table otherwise);
    after the (query_id, vec_id) candidate set is deduped, both vectors are
    fetched back by id for the exact-cosine stage. Recall < 1 by
    construction — the scale path when the query set is too large to
    broadcast.

    Skew guard (`max_bucket`): a degenerate corpus bucket (e.g. near-zero
    vectors all hashing alike) makes the bucket join quadratic; buckets
    larger than the cap are dropped BEFORE the join (window count on the
    join key, same technique as minhash_lsh_pairs). Members of a dropped
    bucket can still match through their other `tables-1` buckets."""
    bucketer = lsh_bucket_udf(dim, bits, tables, seed)
    c = embeddings.select(
        F.col(id_col), F.explode(bucketer(F.col(vec_col))).alias("bucket")
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        c = (
            c.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    q = queries.select(
        "query_id", F.explode(bucketer(F.col(vec_col))).alias("bucket")
    )
    candidates = (
        c.join(q, "bucket")
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    scored = (
        candidates.join(
            embeddings.select(F.col(id_col), F.col(vec_col).alias("_cvec")), id_col
        )
        .join(queries.select("query_id", F.col(vec_col).alias("_qvec")), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("sim", 6).alias("sim"))
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample: int = 4096,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means over a deterministic sample.

    The sample (≤ a few thousand rows) and the Lloyd iterations run on the
    driver with numpy — centroids are a MODEL (kilobytes), not data, so this
    is the legitimate collect: at 100 TB you train on a fixed-size sample
    and broadcast the centroids, exactly as FAISS-style IVF does.

    Sampling is deterministic AND cheap at scale: a hash pre-filter
    (pmod(xxhash64(keys), mod) == 0, mod sized from a count so ~4×sample
    rows survive) shrinks the table first, then the orderBy-limit tiebreak
    runs over the tiny survivor set — no global sort of the corpus, and the
    vec column is only materialized for survivors. Both stages are pure
    functions of the data, so the index is reproducible at any
    parallelism."""
    key_cols = [c for c in embeddings.columns if c != vec_col]
    n = embeddings.count()
    if n == 0:
        raise ValueError("cannot train IVF centroids on an empty embeddings table")
    mod = max(1, n // (sample * 4))
    pool = embeddings
    if mod > 1 and key_cols:
        pool = embeddings.filter(
            F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(mod)) == 0
        )
    ordered = pool.orderBy(*key_cols) if key_cols else pool
    rows = ordered.limit(sample).select(vec_col).collect()
    if not rows:
        # pathologically unlucky hash filter on a tiny table — fall back
        ordered = embeddings.orderBy(*key_cols) if key_cols else embeddings
        rows = ordered.limit(sample).select(vec_col).collect()
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        sims = mat @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _ivf_assign_udf(cents: np.ndarray, nprobe: int = 1):
    """pandas UDF: embedding → array of its `nprobe` nearest centroid ids
    (cosine). Centroids are closure-captured (broadcast with the task)."""
    c = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.array(
            [v if v is not None else np.zeros(c.shape[1]) for v in vecs],
            dtype=np.float64,
        )
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ c.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series([row.tolist() for row in top], dtype=object)

    return assign


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_list: int | None = 100_000,
) -> DataFrame:
    """IVF ANN top-k: the FAISS-style scale path next to lsh_topk.

    Corpus vectors are assigned to their single nearest centroid (the
    inverted lists — at scale this is the partitioning/bucketing column of
    the stored index, built once); queries probe their `nprobe` nearest
    lists, so the join is a centroid-id equi-join touching only ~nprobe/n of
    the corpus per query. Distances are exact cosine; recall < 1 by
    construction and tunable with nprobe. Deterministic end-to-end.

    Scale shape (same as lsh_topk / pairwise_above_threshold): the
    candidate join carries only (list_id, id) — vectors do NOT ride the
    equi-join or the dedup shuffle; after the (query_id, vec_id) candidate
    set is deduped, both vectors are fetched back by id for the
    exact-cosine stage, so each vector crosses the wire at most once per
    side regardless of nprobe or list size.

    Skew guard (`max_list`): a clustered corpus can pile most vectors into
    one inverted list, making that list's join quadratic with everything in
    flight. Lists larger than the cap are dropped BEFORE the join (window
    count on the join key). Unlike LSH there is no second table to recover
    through, so the cap defaults high — it is a safety valve against a
    degenerate quantizer, not a tuning knob; recall within surviving lists
    is unchanged."""
    cents = train_ivf_centroids(
        embeddings, n_centroids, iters=5, vec_col=vec_col, seed=seed
    )
    c_assign = _ivf_assign_udf(cents, nprobe=1)
    q_assign = _ivf_assign_udf(cents, nprobe=nprobe)
    c = embeddings.select(
        F.col(id_col),
        F.explode(c_assign(F.col(vec_col))).alias("list_id"),
    )
    if max_list is not None:
        wl = Window.partitionBy("list_id")
        c = (
            c.withColumn("_ln", F.count("*").over(wl))
            .filter(F.col("_ln") <= max_list)
            .drop("_ln")
        )
    q = queries.select(
        "query_id",
        F.explode(q_assign(F.col(vec_col))).alias("list_id"),
    )
    candidates = (
        c.join(q, "list_id")
        .select("query_id", id_col)
        .dropDuplicates(["query_id", id_col])
    )
    scored = (
        candidates.join(
            embeddings.select(F.col(id_col), F.col(vec_col).alias("_cvec")), id_col
        )
        .join(queries.select("query_id", F.col(vec_col).alias("_qvec")), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            cosine_similarity(F.col("_qvec"), F.col("_cvec")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, F.round("sim", 6).alias("sim"))
    )


def pairwise_above_threshold(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 10,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = 1000,
    precollapse_exact: bool = True,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via LSH blocking —
    the embedding-space analogue of MinHash near-dup for text.

    Scale shape (mirrors dedup_minhash exactly):
    - `precollapse_exact` (default on): byte-identical vectors collapse to
      their lowest-id representative BEFORE blocking — k copies of one
      vector would otherwise share every bucket and force O(k²) pairs; an
      identity group is the exact-dedup operator's output, not k² pairs.
      Returned pairs are among representatives.
    - the bucket join carries only (bucket, id) — vectors are fetched back
      by id for the exact-cosine stage, so no vector crosses the shuffle
      more than once per side (vs. once per table);
    - `max_bucket` drops degenerate buckets before the self-join (window
      count on the join key, as in minhash_lsh_pairs); members of a dropped
      bucket can still pair through the other `tables-1` buckets."""
    if precollapse_exact:
        reps = (
            embeddings.groupBy(vec_col)
            .agg(F.min(id_col).alias(id_col))
            .select(id_col, vec_col)
        )
    else:
        reps = embeddings.select(id_col, vec_col)
    bucketer = lsh_bucket_udf(dim, bits, tables, seed)
    b = reps.select(
        F.col(id_col), F.explode(bucketer(F.col(vec_col))).alias("bucket")
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        b = (
            b.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= max_bucket)
            .drop("_bn")
        )
    left = b.select(F.col(id_col).alias("id_a"), "bucket")
    right = b.select(F.col(id_col).alias("id_b"), "bucket")
    pairs = (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = reps.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = reps.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def cross_corpus_pairs(
    corpus: DataFrame,
    reference: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 10,
    tables: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """(corpus_id, ref_id, sim) — corpus×reference embedding pairs with
    cosine ≥ threshold, via the same LSH blocking as
    pairwise_above_threshold but across TWO tables: embedding-space
    benchmark decontamination (drop training docs whose embeddings sit on
    top of an eval set's), the vector twin of
    textops.decontaminate_ngram_overlap.

    Both sides hash with the SAME hyperplanes (dim/bits/tables/seed), so
    a corpus vector can only meet reference vectors in shared buckets —
    no corpus×corpus or ref×ref pairs are ever formed. Scale shape as the
    self-join op: the bucket join carries (bucket, id) only, vectors are
    fetched back by id for the exact-cosine stage, and `max_bucket` caps
    degenerate buckets counting BOTH sides (a reference cluster colliding
    with a boilerplate corpus cluster is exactly the quadratic bucket the
    cap exists for)."""
    bucketer = lsh_bucket_udf(dim, bits, tables, seed)
    bc = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(bucketer(F.col(vec_col))).alias("bucket"),
    ).withColumn("_side", F.lit(0))
    br = reference.select(
        F.col(id_col).alias("ref_id"),
        F.explode(bucketer(F.col(vec_col))).alias("bucket"),
    ).withColumn("_side", F.lit(1))
    if max_bucket is not None:
        both = bc.select("bucket").unionAll(br.select("bucket"))
        big = (
            both.groupBy("bucket")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") > max_bucket)
            .select("bucket")
        )
        bc = bc.join(big, "bucket", "left_anti")
        br = br.join(big, "bucket", "left_anti")
    pairs = (
        bc.select("corpus_id", "bucket")
        .join(br.select("ref_id", "bucket"), "bucket")
        .dropDuplicates(["corpus_id", "ref_id"])
    )
    va = corpus.select(F.col(id_col).alias("corpus_id"), F.col(vec_col).alias("_va"))
    vb = reference.select(F.col(id_col).alias("ref_id"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(va, "corpus_id")
        .join(vb, "ref_id")
        .select(
            "corpus_id",
            "ref_id",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
        .select("corpus_id", "ref_id", F.round("sim", 6).alias("sim"))
    )


def decontaminate_embeddings(
    corpus: DataFrame,
    reference: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_opts,
) -> DataFrame:
    """Corpus rows whose embedding matches NO reference embedding at
    cosine ≥ threshold — one left-anti join on the flagged ids from
    :func:`cross_corpus_pairs` (recall is the blocking recall; raise
    `tables` for a stricter gate)."""
    flagged = cross_corpus_pairs(
        corpus, reference, threshold, id_col=id_col, vec_col=vec_col, **lsh_opts
    ).select(F.col("corpus_id").alias(id_col)).distinct()
    return corpus.join(flagged, [id_col], "left_anti")
