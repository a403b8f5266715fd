"""Round-9 operators: NB quality scoring, DSIR resampling, embedding
moments / PCA, cluster representatives."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corpus(spark):
    # two clearly-separated token distributions: "good" docs use the
    # wiki vocabulary, "bad" docs use spam vocabulary
    good = "history science culture reference article citation neutral"
    bad = "buy cheap click winner free casino pills offer now"
    rows = [(i, f"{good} article {i % 3}", "seed") for i in range(8)] + \
           [(10 + i, f"{bad} offer {i % 3}", "web") for i in range(8)] + \
           [(20, f"{good} citation neutral history", "web"),
            (21, f"{bad} casino click free", "web")]
    return spark.createDataFrame(rows, "doc_id long, text string, src string")


class TestNbQuality:
    def test_seed_like_scores_higher(self, corpus):
        from db2pq_spark.operators.quality import nb_quality_scores

        out = {r["id"]: r["mean_logodds"] for r in nb_quality_scores(
            corpus, "text", "doc_id", F.col("src") == "seed").collect()}
        # the wiki-vocab doc planted in the web class scores positive,
        # the spam doc negative
        assert out[20] > 0 > out[21]
        # seed docs score higher than spam docs across the board
        assert min(out[i] for i in range(8)) > max(
            out[10 + i] for i in range(8))

    def test_filter_keeps_seed_like(self, corpus):
        from db2pq_spark.operators.quality import nb_quality_filter

        kept = {r["doc_id"] for r in nb_quality_filter(
            corpus, "text", "doc_id", F.col("src") == "seed",
            threshold=0.0).collect()}
        assert 20 in kept and 21 not in kept
        assert all(i in kept for i in range(8))

    def test_partitioning_invariant(self, corpus):
        # DECIMAL accumulation ⇒ identical sums under any partitioning
        from db2pq_spark.operators.quality import nb_quality_scores

        base = {r["id"]: r["sum_logodds"] for r in nb_quality_scores(
            corpus, "text", "doc_id", F.col("src") == "seed").collect()}
        shuf = {r["id"]: r["sum_logodds"] for r in nb_quality_scores(
            corpus.repartition(7), "text", "doc_id",
            F.col("src") == "seed").collect()}
        assert base == shuf


class TestDsir:
    def test_target_like_wins_sample(self, corpus):
        from db2pq_spark.operators.importance import dsir_sample

        # target = seed distribution; the wiki-vocab web doc should
        # out-rank the spam docs in the importance draw
        out = dsir_sample(corpus, "text", "doc_id",
                          F.col("src") == "seed", k=10).collect()
        ids = [r["id"] for r in out]
        assert len(ids) == 10 and len(set(ids)) == 10
        # seed-vocab docs (ids 0-7 and the wiki-like web doc 20) carry
        # much larger importance weights than the spam docs; even with
        # Gumbel noise the sample should be seed-vocab-dominated
        seedlike = set(range(8)) | {20}
        assert len(seedlike & set(ids)) >= 6

    def test_weights_monotone_in_target_similarity(self, corpus):
        from db2pq_spark.operators.importance import dsir_log_weights

        w = {r["id"]: r["mean_logw"] for r in dsir_log_weights(
            corpus, "text", "doc_id", F.col("src") == "seed").collect()}
        assert w[20] > w[21]

    def test_keys_variants_and_validation(self, corpus):
        from db2pq_spark.operators.importance import dsir_log_weights

        xx = dsir_log_weights(corpus, "text", "doc_id",
                              F.col("src") == "seed",
                              keys="xxhash64").count()
        assert xx > 0
        with pytest.raises(ValueError, match="unknown keys"):
            dsir_log_weights(corpus, "text", "doc_id",
                             F.col("src") == "seed", keys="bogus")

    def test_deterministic(self, corpus):
        from db2pq_spark.operators.importance import dsir_sample

        a = [(r["id"], r["gumbel_key"]) for r in dsir_sample(
            corpus, "text", "doc_id", F.col("src") == "seed",
            k=5).collect()]
        b = [(r["id"], r["gumbel_key"]) for r in dsir_sample(
            corpus.repartition(5), "text", "doc_id",
            F.col("src") == "seed", k=5).collect()]
        assert a == b


class TestEmbeddingMoments:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        import numpy as np

        rng = np.random.RandomState(7)
        # anisotropic cloud: variance concentrated on a known direction
        base = rng.randn(200, 1) @ np.array([[3.0, 1.0, 0.0, 0.5]]) \
            + 0.1 * rng.randn(200, 4) + np.array([1.0, -2.0, 0.5, 0.0])
        rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        return df, base.astype("float32").astype("float64")

    def test_exact_matches_numpy(self, vecs):
        from db2pq_spark.operators.pca import embedding_moments

        df, x = vecs
        rows = embedding_moments(df, "embedding", impl="exact").collect()
        got = {(r["i"], r["j"]): float(r["sum_xy"]) for r in rows}
        import numpy as np

        ref = x.T @ x
        for (i, j), v in got.items():
            assert abs(v - ref[i, j]) < 1e-5, (i, j)
        assert all(r["n"] == 200 for r in rows)
        assert len(rows) == 4 * 5 // 2

    def test_arrow_matches_exact(self, vecs):
        from db2pq_spark.operators.pca import embedding_moments

        df, _ = vecs
        ex = {(r["i"], r["j"]): (float(r["sum_xy"]), float(r["sum_i"]))
              for r in embedding_moments(df, "embedding",
                                         impl="exact").collect()}
        ar = {(r["i"], r["j"]): (float(r["sum_xy"]), float(r["sum_i"]))
              for r in embedding_moments(
                  df.repartition(6), "embedding", impl="arrow").collect()}
        assert set(ex) == set(ar)
        for k in ex:
            assert ex[k][0] == pytest.approx(ar[k][0], abs=1e-6)
            assert ex[k][1] == pytest.approx(ar[k][1], abs=1e-6)

    def test_pca_project_matches_numpy(self, vecs):
        import numpy as np

        from db2pq_spark.operators.pca import pca_project

        df, x = vecs
        out = {r["id"]: np.asarray(r["pc"]) for r in pca_project(
            df, "embedding", "vec_id", k=2, impl="arrow").collect()}
        # reference PCA on the same data
        mean = x.mean(axis=0)
        cov = (x.T @ x) / len(x) - np.outer(mean, mean)
        vals, vecs_ = np.linalg.eigh(cov)
        order = np.argsort(vals)[::-1][:2]
        comps = vecs_[:, order].T
        ref = (x - mean) @ comps.T
        got = np.asarray([out[i] for i in range(len(x))])
        # eigenvectors are sign-ambiguous: compare per-component up to sign
        for c in range(2):
            diff = min(np.abs(got[:, c] - ref[:, c]).max(),
                       np.abs(got[:, c] + ref[:, c]).max())
            assert diff < 1e-6
        # top component captures the planted direction's variance
        assert got[:, 0].var() > 5 * got[:, 1].var()

    def test_whiten_unit_variance(self, vecs):
        import numpy as np

        from db2pq_spark.operators.pca import pca_project

        df, _ = vecs
        out = np.asarray([r["pc"] for r in pca_project(
            df, "embedding", "vec_id", k=2, whiten=True,
            impl="arrow").collect()])
        assert np.allclose(out.var(axis=0), 1.0, atol=0.05)

    def test_empty_raises(self, spark):
        from db2pq_spark.operators.pca import embedding_moments

        empty = spark.createDataFrame([],
                                      "vec_id long, embedding array<float>")
        with pytest.raises(ValueError, match="empty"):
            embedding_moments(empty, "embedding", impl="exact")


class TestClusterRepresentatives:
    def test_argmax_with_tiebreak(self, spark):
        from db2pq_spark.operators.components import cluster_representatives

        # chain 1-2-3 (cluster comp=1), pair 10-11 (comp=10)
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long")
        quality = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 1.0)],
            "id long, q double")
        out = {r["comp"]: (r["rep_id"], r["rep_quality"], r["n_members"])
               for r in cluster_representatives(
                   pairs, quality, "id", "q").collect()}
        # 2 and 3 tie on quality → lower id wins
        assert out[1] == (2, 9.0, 3)
        assert out[10] == (10, 1.0, 2)

    def test_only_clustered_docs_emitted(self, spark):
        from db2pq_spark.operators.components import cluster_representatives

        pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
        quality = spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (99, 50.0)], "id long, q double")
        out = cluster_representatives(pairs, quality, "id", "q").collect()
        assert len(out) == 1 and out[0]["rep_id"] == 2


class TestMmr:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        # query along e0; 1 and 2 near-duplicate each other, 3 is
        # equally relevant but on the OTHER side of the query (diverse
        # from 1), 4 irrelevant. The first pick must not coincide with
        # the query direction, else rel == sim degenerately for every
        # candidate and MMR reduces to the id tiebreak.
        rows = [
            (1, [0.95, 0.3, 0.0]),
            (2, [0.95, 0.31, 0.0]),
            (3, [0.95, -0.3, 0.0]),
            (4, [0.0, 0.0, 1.0]),
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_diversity_beats_pure_topk(self, vecs):
        from db2pq_spark.operators.mmr import mmr_select

        out = mmr_select(vecs, "embedding", "vec_id",
                         [1.0, 0.0, 0.0], k=2, lam=0.5)
        got = [(r["rank"], r["id"]) for r in out.collect()]
        # pure top-2 by relevance would be {1, 2}; MMR must skip the
        # near-duplicate 2 and take the diverse 3
        assert got == [(1, 1), (2, 3)]

    def test_k_exceeds_candidates(self, vecs):
        from db2pq_spark.operators.mmr import mmr_select

        out = mmr_select(vecs, "embedding", "vec_id",
                         [1.0, 0.0, 0.0], k=10, lam=0.5).collect()
        assert len(out) == 4
        assert sorted(r["id"] for r in out) == [1, 2, 3, 4]

    def test_deterministic_under_partitioning(self, vecs):
        from db2pq_spark.operators.mmr import mmr_select

        a = [(r["rank"], r["id"], r["score"]) for r in mmr_select(
            vecs, "embedding", "vec_id", [1.0, 0.0, 0.0],
            k=3).collect()]
        b = [(r["rank"], r["id"], r["score"]) for r in mmr_select(
            vecs.repartition(5), "embedding", "vec_id",
            [1.0, 0.0, 0.0], k=3).collect()]
        assert a == b

    def test_lambda_one_is_pure_relevance(self, vecs):
        from db2pq_spark.operators.mmr import mmr_select

        out = [r["id"] for r in mmr_select(
            vecs, "embedding", "vec_id", [1.0, 0.0, 0.0],
            k=3, lam=1.0).collect()]
        # pure relevance: 1 and 3 tie (id tiebreak), 2 slightly lower
        assert out == [1, 3, 2]


class TestNbTrainApply:
    def test_reproduces_one_shot_on_training_corpus(self, corpus):
        from db2pq_spark.operators.quality import (
            nb_quality_scores, nb_quality_weights, nb_score_documents)

        one = {r["id"]: r["sum_logodds"] for r in nb_quality_scores(
            corpus, "text", "doc_id", F.col("src") == "seed").collect()}
        w, oov = nb_quality_weights(corpus, "text",
                                    F.col("src") == "seed")
        two = {r["id"]: r["sum_logodds"] for r in nb_score_documents(
            corpus, w, oov, "text", "doc_id").collect()}
        assert one == two

    def test_oov_fallback(self, corpus, spark):
        from db2pq_spark.operators.quality import (
            nb_quality_weights, nb_score_documents)

        w, oov = nb_quality_weights(corpus, "text",
                                    F.col("src") == "seed")
        oov_s = oov.head()["oov_s"]
        batch = spark.createDataFrame(
            [(100, "zzz-unseen qqq-unseen www-unseen")],
            "doc_id long, text string")
        got = nb_score_documents(batch, w, oov, "text",
                                 "doc_id").head()
        # every token unseen -> sum is exactly 3 x the OOV constant
        assert got["n_tokens"] == 3
        assert float(got["sum_logodds"]) == pytest.approx(
            3 * float(oov_s))


class TestPerplexityBuckets:
    """perplexity_buckets (q140, round 10): CCNet head/middle/tail
    partition by KN surprisal — tier population, ordering direction,
    and the exact micro-bit key."""

    def test_buckets_partition_the_corpus(self, spark):
        from db2pq_spark.operators.quality import perplexity_buckets

        # 9 docs: three repeat a fluent pattern (low surprisal under
        # the self-trained LM), three are mid, three are distinct
        # word-salad (high surprisal)
        rows = (
            [(i, "the cat sat on the mat and the cat sat") for i in range(3)]
            + [(10 + i, f"the cat ran to a tree {i} fast") for i in range(3)]
            + [(20 + i, f"zq{i} wv{i} xk{i} jb{i} qq{i} zz{i}")
               for i in range(3)])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = perplexity_buckets(df, "text", "doc_id", n_buckets=3)
        got = {r["id"]: r for r in out.collect()}
        assert len(got) == 9
        # ranks are a permutation of 1..9, buckets 3/3/3
        assert sorted(r["rank"] for r in got.values()) == list(range(1, 10))
        from collections import Counter
        assert Counter(r["bucket"] for r in got.values()) \
            == {1: 3, 2: 3, 3: 3}
        # the repeated fluent docs land in the head, word salad in tail
        assert {got[i]["bucket"] for i in (0, 1, 2)} == {1}
        assert {got[i]["bucket"] for i in (20, 21, 22)} == {3}
        # rank follows (mean_units asc, id asc)
        ordered = sorted(got.values(),
                         key=lambda r: (r["mean_units"], r["id"]))
        assert [r["rank"] for r in ordered] == list(range(1, 10))

    def test_short_docs_excluded_and_bucket_count_validated(self, spark):
        from db2pq_spark.operators.quality import perplexity_buckets

        df = spark.createDataFrame(
            [(1, "one"), (2, ""), (3, None), (4, "two words here ok")],
            "doc_id long, text string")
        out = perplexity_buckets(df, "text", "doc_id", n_buckets=2)
        # only doc 4 has >= 2 tokens
        assert [r["id"] for r in out.collect()] == [4]
        with pytest.raises(ValueError, match="n_buckets"):
            perplexity_buckets(df, "text", "doc_id", n_buckets=0)


class TestKnHashConfigParity:
    """Round-11 (verdict item): q121/q140 production runs keys='hash'
    (xxhash64 long bigram keys, double accumulation) while the gate
    pins keys='exact' (string keys, decimal accumulation). At fixture
    scale a 64-bit collision is vanishingly unlikely, so the hash
    config must reproduce the exact config's RANKING-LEVEL outputs:
    identical bigram counts per document and identical
    perplexity-tier/bucket assignment. (Sum values differ by ulps —
    double vs decimal accumulation order — which is why the parity is
    asserted on counts, ranks and tiers, not raw sums; the same
    bridge-test shape as the winnow arrow64<->xxhash64 pair-set
    parity.)"""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, " ".join(
            f"w{(i * 7 + j * 3) % 23}" for j in range(12 + i % 9)))
            for i in range(60)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_kneser_ney_same_bigram_counts_and_order(self, docs):
        from db2pq_spark.operators.textstats import kneser_ney_bigrams

        exact = {r["id"]: (r["n_bigrams"], float(r["sum_surprisal"]))
                 for r in kneser_ney_bigrams(
                     docs, "text", "doc_id").collect()}
        hashed = {r["id"]: (r["n_bigrams"], float(r["sum_surprisal"]))
                  for r in kneser_ney_bigrams(
                      docs, "text", "doc_id", keys="hash",
                      broadcast_stats=True).collect()}
        assert set(exact) == set(hashed)
        for i in exact:
            assert exact[i][0] == hashed[i][0]  # identical counts
            # identical statistics modulo accumulation-order ulps
            assert abs(exact[i][1] - hashed[i][1]) < 1e-6 * max(
                1.0, abs(exact[i][1]))
        # the quality ORDERING (what a filter consumes) is identical
        rank_e = sorted(exact, key=lambda i: (exact[i][1] / exact[i][0],
                                              i))
        rank_h = sorted(hashed, key=lambda i: (hashed[i][1]
                                               / hashed[i][0], i))
        assert rank_e == rank_h

    def test_perplexity_buckets_same_tiers(self, docs):
        from db2pq_spark.operators.quality import perplexity_buckets

        exact = {r["id"]: (r["rank"], r["bucket"]) for r in
                 perplexity_buckets(docs, "text", "doc_id").collect()}
        hashed = {r["id"]: (r["rank"], r["bucket"]) for r in
                  perplexity_buckets(docs, "text", "doc_id",
                                     keys="hash",
                                     broadcast_stats=True).collect()}
        assert exact == hashed
