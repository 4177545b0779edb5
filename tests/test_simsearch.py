"""Similarity-search tests: exact brute-force top-k pinned against a numpy
oracle, LSH ANN recall/precision on clustered synthetic embeddings, and the
embedding near-duplicate pair operator.

The LSH operators are approximate by design (banding only prunes
candidates), so the invariants pinned here are:
- returned similarities are EXACT (the final filter/score is true cosine);
- recall against brute-force ground truth is high on clustered data;
- results are deterministic and independent of parallelism (fixed-seed
  hyperplanes).
"""

from __future__ import annotations

import numpy as np
import pytest

from wbx import simsearch


def clustered_vectors(n_clusters=6, per_cluster=8, dim=16, noise=0.02, seed=7):
    """Deterministic clustered unit vectors: items within a cluster have
    cosine ~1-ε, across clusters ~uncorrelated."""
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for c in range(n_clusters):
        for _ in range(per_cluster):
            v = centers[c] + noise * rng.standard_normal(dim)
            vecs.append(v / np.linalg.norm(v))
    return np.array(vecs)


def emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def np_cosine_matrix(vecs):
    v = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    return v @ v.T


class TestBruteForce:
    def test_topk_matches_numpy(self, spark):
        vecs = clustered_vectors()
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id < 3").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        out = simsearch.brute_force_topk(df, queries, k=5)
        got = {
            (r["query_id"], r["rank"]): r["vec_id"] for r in out.collect()
        }
        # float32 storage: compute the oracle on the float32-rounded vectors
        sims = np_cosine_matrix(vecs.astype(np.float32).astype(np.float64))
        for q in range(3):
            order = sorted(
                range(len(vecs)), key=lambda i: (-round(sims[q, i], 9), i)
            )[:5]
            for rank, vid in enumerate(order, start=1):
                assert got[(q, rank)] == vid, (q, rank)

    def test_sim_values_exact(self, spark):
        vecs = clustered_vectors(n_clusters=2, per_cluster=3)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
        out = simsearch.brute_force_topk(df, queries, k=len(vecs)).collect()
        sims = np_cosine_matrix(vecs.astype(np.float32).astype(np.float64))
        for r in out:
            assert r["sim"] == pytest.approx(sims[0, r["vec_id"]], abs=1e-5)


class TestLshTopk:
    def test_recall_on_clusters(self, spark):
        vecs = clustered_vectors(dim=16)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id % 8 = 0").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        exact = simsearch.brute_force_topk(df, queries, k=5)
        approx = simsearch.lsh_topk(
            df, queries, k=5, dim=16, bits=6, tables=8
        )
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.9, recall

    def test_deterministic_across_parallelism(self, spark):
        vecs = clustered_vectors(dim=16)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
        a = simsearch.lsh_topk(df.repartition(1), queries, k=3, dim=16, bits=6, tables=8)
        b = simsearch.lsh_topk(df.repartition(16), queries, k=3, dim=16, bits=6, tables=8)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestPairwiseAboveThreshold:
    def test_precision_exact_and_recall_high(self, spark):
        vecs = clustered_vectors(n_clusters=5, per_cluster=6, dim=16)
        df = emb_df(spark, vecs)
        out = simsearch.pairwise_above_threshold(
            df, threshold=0.98, dim=16, bits=6, tables=8
        ).collect()
        sims = np_cosine_matrix(vecs.astype(np.float32).astype(np.float64))
        truth = {
            (i, j)
            for i in range(len(vecs))
            for j in range(i + 1, len(vecs))
            if sims[i, j] >= 0.98
        }
        got = {(r["id_a"], r["id_b"]) for r in out}
        # precision is exact by construction: every returned pair passed the
        # true-cosine filter
        for r in out:
            assert r["sim"] >= 0.98 - 1e-6
            assert r["sim"] == pytest.approx(sims[r["id_a"], r["id_b"]], abs=1e-5)
        # within-cluster pairs are near-identical → LSH blocking recall ~1
        recall = len(got & truth) / len(truth)
        assert recall >= 0.95, recall

    def test_no_pairs_when_threshold_unreachable(self, spark):
        rng = np.random.RandomState(3)
        vecs = rng.standard_normal((20, 16))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        df = emb_df(spark, vecs)
        out = simsearch.pairwise_above_threshold(
            df, threshold=0.999, dim=16, bits=6, tables=8
        )
        sims = np_cosine_matrix(vecs.astype(np.float32).astype(np.float64))
        truth = {
            (i, j)
            for i in range(20)
            for j in range(i + 1, 20)
            if sims[i, j] >= 0.999
        }
        assert {(r["id_a"], r["id_b"]) for r in out.collect()} == truth == set()


class TestIvfTopk:
    def test_recall_on_clusters(self, spark):
        vecs = clustered_vectors(n_clusters=6, per_cluster=8, dim=16)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id % 8 = 0").selectExpr(
            "vec_id AS query_id", "embedding"
        )
        exact = simsearch.brute_force_topk(df, queries, k=5)
        approx = simsearch.ivf_topk(
            df, queries, k=5, n_centroids=6, nprobe=2
        )
        e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
        assert len(e & a) / len(e) >= 0.9

    def test_sims_exact_and_deterministic(self, spark):
        vecs = clustered_vectors(n_clusters=4, per_cluster=5, dim=16)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id < 2").selectExpr("vec_id AS query_id", "embedding")
        a = simsearch.ivf_topk(df.repartition(1), queries, k=3, n_centroids=4, nprobe=2)
        b = simsearch.ivf_topk(df.repartition(16), queries, k=3, n_centroids=4, nprobe=2)
        ra, rb = sorted(map(tuple, a.collect())), sorted(map(tuple, b.collect()))
        assert ra == rb
        sims = np_cosine_matrix(vecs.astype(np.float32).astype(np.float64))
        for q, rank, vid, s in ra:
            assert s == pytest.approx(sims[q, vid], abs=1e-5)


class TestLshScaleGuards:
    """The 100-TB failure modes of LSH blocking: exact-duplicate storms and
    degenerate buckets must not go quadratic with vectors in flight."""

    def test_identical_vector_storm_collapses(self, spark):
        # 2000 copies of one vector share every bucket of every table; the
        # exact pre-collapse reduces them to one representative BEFORE
        # blocking, so the op returns no pairs (identity groups are
        # dedup_exact's output, not O(k^2) pairs) and completes fast
        v = [1.0] + [0.0] * 15
        df = spark.createDataFrame(
            [(i, v) for i in range(2000)], "vec_id long, embedding array<float>"
        )
        out = simsearch.pairwise_above_threshold(
            df, threshold=0.9, dim=16, bits=6, tables=4
        ).collect()
        assert out == []

    def test_cross_group_pair_survives_collapse(self, spark):
        # two identity groups of near-identical vectors -> exactly one
        # representative pair (lowest ids of each group)
        a = np.array([1.0] + [0.0] * 15)
        b = a + 0.01 * np.arange(16)
        b /= np.linalg.norm(b)
        rows = [(i, [float(x) for x in a]) for i in range(50)] + [
            (50 + i, [float(x) for x in b]) for i in range(50)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = simsearch.pairwise_above_threshold(
            df, threshold=0.9, dim=16, bits=6, tables=4
        ).collect()
        assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 50)]
        assert out[0]["sim"] == pytest.approx(float(a @ b), abs=1e-5)

    def test_max_bucket_cap_drops_degenerate_buckets(self, spark):
        # with precollapse off and a tiny cap, a 100-copy storm is dropped
        # by the bucket-size guard instead of exploding the join
        v = [1.0] + [0.0] * 15
        df = spark.createDataFrame(
            [(i, v) for i in range(100)], "vec_id long, embedding array<float>"
        )
        out = simsearch.pairwise_above_threshold(
            df, threshold=0.9, dim=16, bits=6, tables=4,
            max_bucket=50, precollapse_exact=False,
        ).collect()
        assert out == []

    @staticmethod
    def _bucket_exchange_blocks(df):
        """Detail blocks of Exchange nodes that hash-partition on `bucket`
        in the formatted plan (each block lists the node's Input columns)."""
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        blocks = [
            b
            for b in plan.split("\n\n")
            if ") Exchange" in b.splitlines()[0] and "hashpartitioning(bucket" in b
        ]
        assert blocks, "expected a bucket-keyed exchange in the plan"
        return blocks

    def test_lsh_topk_no_vectors_on_bucket_join(self, spark):
        # plan guard: the bucket-join exchanges must not carry embedding
        # payloads — vectors are fetched back by id after candidate dedup
        vecs = clustered_vectors(n_clusters=3, per_cluster=4, dim=16)
        df = emb_df(spark, vecs)
        queries = df.filter("vec_id = 0").selectExpr("vec_id AS query_id", "embedding")
        out = simsearch.lsh_topk(df, queries, k=3, dim=16, bits=6, tables=4)
        for b in self._bucket_exchange_blocks(out):
            for col in ("_cvec", "_qvec", "embedding"):
                assert col not in b, b

    def test_pairwise_no_vectors_on_bucket_join(self, spark):
        vecs = clustered_vectors(n_clusters=3, per_cluster=4, dim=16)
        out = simsearch.pairwise_above_threshold(
            emb_df(spark, vecs), threshold=0.9, dim=16, bits=6, tables=4
        )
        for b in self._bucket_exchange_blocks(out):
            for col in ("_va", "_vb", "embedding"):
                assert col not in b, b

    def test_ivf_training_sample_has_no_global_sort(self, spark):
        # the centroid sample must not range-shuffle the whole corpus
        vecs = clustered_vectors(n_clusters=4, per_cluster=5, dim=16)
        df = emb_df(spark, vecs)
        cents = simsearch.train_ivf_centroids(df, n_centroids=4, sample=8)
        assert cents.shape == (4, 16)
        # determinism across partitioning (hash filter + orderBy-limit are
        # pure functions of the data)
        c2 = simsearch.train_ivf_centroids(df.repartition(16), n_centroids=4, sample=8)
        assert np.allclose(cents, c2)


class TestDedupExactVectors:
    def test_collapses_to_lowest_id_with_counts(self, spark):
        v1 = [1.0] + [0.0] * 7
        v2 = [0.0, 1.0] + [0.0] * 6
        rows = [(5, v1), (2, v1), (9, v2), (7, v1)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = {
            r["vec_id"]: r["dup_count"]
            for r in simsearch.dedup_exact_vectors(df).collect()
        }
        assert got == {2: 3, 9: 1}


class TestCrossCorpusDecontamination:
    def _tables(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        ref_vecs = rng.normal(size=(5, 64)).astype("float32")
        rows_ref = [(i, [float(x) for x in v]) for i, v in enumerate(ref_vecs)]
        # corpus: ids 100-104 are near-copies of the reference vectors
        # (tiny noise), 200-219 are independent random vectors
        near = ref_vecs + rng.normal(scale=1e-3, size=ref_vecs.shape).astype("float32")
        rows_c = [(100 + i, [float(x) for x in v]) for i, v in enumerate(near)]
        rows_c += [
            (200 + i, [float(x) for x in rng.normal(size=64)]) for i in range(20)
        ]
        schema = "vec_id long, embedding array<float>"
        return (
            spark.createDataFrame(rows_c, schema),
            spark.createDataFrame(rows_ref, schema),
        )

    def test_flags_planted_near_copies_only(self, spark):
        from wbx.simsearch import cross_corpus_pairs

        corpus, ref = self._tables(spark)
        pairs = cross_corpus_pairs(corpus, ref, threshold=0.95).collect()
        got = {(r["corpus_id"], r["ref_id"]) for r in pairs}
        assert got == {(100 + i, i) for i in range(5)}
        assert all(r["sim"] > 0.99 for r in pairs)

    def test_decontaminate_removes_flagged(self, spark):
        from wbx.simsearch import decontaminate_embeddings

        corpus, ref = self._tables(spark)
        kept = sorted(
            r["vec_id"]
            for r in decontaminate_embeddings(corpus, ref, threshold=0.95).collect()
        )
        assert kept == sorted(200 + i for i in range(20))

    def test_no_within_side_pairs_and_determinism(self, spark):
        from wbx.simsearch import cross_corpus_pairs

        corpus, ref = self._tables(spark)
        a = sorted(map(tuple, cross_corpus_pairs(corpus, ref).collect()))
        b = sorted(
            map(
                tuple,
                cross_corpus_pairs(corpus.repartition(7), ref.repartition(3)).collect(),
            )
        )
        assert a == b
        # ids prove sides: corpus ids ≥ 100, ref ids < 100
        assert all(x >= 100 and y < 100 for x, y, _ in a)
