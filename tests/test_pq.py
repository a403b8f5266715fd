"""Product-quantization ANN (operators/pq.py, q151): codebook shape,
encode determinism (exact ≡ arrow), ADC correctness against direct
table computation, recall against brute force, IVF-PQ composition."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, Window as W

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def _exact_top10(spark, emb, n_queries=20):
    q = emb.where(F.col("vec_id") < n_queries)
    c = emb.select(F.col("vec_id").alias("nid"),
                   F.col("embedding").alias("cv"))
    d2 = (q.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("qv"))
          .crossJoin(c).where(F.col("nid") != F.col("query_id"))
          .select("query_id", "nid", F.aggregate(
              F.zip_with("qv", "cv",
                         lambda x, y: (x.cast("double")
                                       - y.cast("double"))
                         * (x.cast("double") - y.cast("double"))),
              F.lit(0.0), lambda a, x: a + x).alias("d2")))
    w = W.partitionBy("query_id").orderBy("d2", "nid")
    return (d2.withColumn("r", F.row_number().over(w))
            .where("r <= 10")
            .select("query_id", F.col("nid").alias("vec_id")))


class TestTrainEncode:
    def test_codebook_shape_and_dim_validation(self, spark, emb):
        from db2pq_spark.operators.pq import pq_train

        books = pq_train(emb, m=4, k=8, iterations=1, dim=64)
        assert len(books) == 4
        assert all(len(b) == 8 for b in books)
        assert all(len(c) == 16 for b in books for c in b)
        with pytest.raises(ValueError, match="not divisible"):
            pq_train(emb, m=5, dim=64)

    def test_exact_and_arrow_encode_agree(self, spark, emb):
        from db2pq_spark.operators.pq import pq_encode, pq_train

        books = pq_train(emb, m=4, k=8, iterations=1, dim=64)
        a = {r["id"]: list(r["codes"]) for r in
             pq_encode(emb, books, impl="exact").collect()}
        b = {r["id"]: list(r["codes"]) for r in
             pq_encode(emb, books, impl="arrow").collect()}
        # boundary ties could differ in theory; on the real fixture
        # they never land exactly on a tie
        assert a == b

    def test_encode_impl_validation(self, spark, emb):
        from db2pq_spark.operators.pq import pq_encode, pq_train

        books = pq_train(emb, m=4, k=8, iterations=1, dim=64)
        with pytest.raises(ValueError, match="unknown pq encode impl"):
            pq_encode(emb, books, impl="numpy")


class TestADC:
    def test_adc_matches_direct_table_distance(self, spark, emb):
        # ADC's ranked distance must equal the straightforward
        # sum-of-subspace-distances to each candidate's centroids
        from db2pq_spark.operators.pq import (
            pq_adc_topk, pq_encode, pq_train)

        books = pq_train(emb, m=4, k=8, iterations=1, dim=64)
        codes = {r["id"]: list(r["codes"]) for r in
                 pq_encode(emb, books).collect()}
        q = emb.where(F.col("vec_id") < 2)
        out = pq_adc_topk(pq_encode(emb, books), q, books,
                          k_top=5).collect()
        qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
                 for r in q.collect()}
        for r in out:
            qv, cs = qvecs[r["query_id"]], codes[r["vec_id"]]
            want = 0.0
            for s, code in enumerate(cs):
                ctr = books[s][code]
                seg = qv[s * 16:(s + 1) * 16]
                want += sum((x - c) ** 2 for x, c in zip(seg, ctr))
            assert r["adc_d2"] == pytest.approx(want, rel=1e-6)

    def test_ranks_are_dense_and_self_excluded(self, spark, emb):
        from db2pq_spark.operators.pq import (
            pq_adc_topk, pq_encode, pq_train)

        books = pq_train(emb, m=4, k=8, iterations=1, dim=64)
        out = pq_adc_topk(pq_encode(emb, books),
                          emb.where(F.col("vec_id") < 3), books,
                          k_top=10).collect()
        by_q: dict[int, list] = {}
        for r in out:
            assert r["vec_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, 11))


class TestRecall:
    def test_recall_beats_chance_and_scales_with_codes(self, spark,
                                                       emb):
        # random fixture embeddings are PQ's worst case (no cluster
        # structure) — the pinned floors are measured-with-margin:
        # m=16,k=16 reached 0.425, chance is 10/499 ~ 0.02
        from db2pq_spark.operators.pq import (
            pq_adc_topk, pq_encode, pq_train)

        exact = _exact_top10(spark, emb).cache()
        n = exact.count()
        books = pq_train(emb, m=16, k=16, iterations=2, dim=64,
                         impl="arrow")
        got = pq_adc_topk(pq_encode(emb, books, impl="arrow"),
                          emb.where(F.col("vec_id") < 20), books,
                          k_top=10).select("query_id", "vec_id")
        recall = got.join(exact, ["query_id", "vec_id"]).count() / n
        assert recall >= 0.35

    def test_ivf_pq_composition(self, spark, emb):
        from db2pq_spark.operators.pq import ivf_pq_topk

        exact = _exact_top10(spark, emb).cache()
        n = exact.count()
        out = ivf_pq_topk(emb, emb.where(F.col("vec_id") < 20),
                          k_top=10, m=8, k_codes=16, n_clusters=8,
                          n_probe=8)
        got = out.select("query_id", "vec_id")
        # n_probe == n_clusters -> candidate set is the whole corpus;
        # recall equals plain PQ at the same code budget (~0.325)
        recall = got.join(exact, ["query_id", "vec_id"]).count() / n
        assert recall >= 0.25
        # a narrow probe still beats chance by an order of magnitude
        # (note: recall is NOT monotone in n_probe — dropping cells
        # also drops ADC false positives that displace true
        # neighbors, so a narrow probe can read slightly higher)
        narrow = ivf_pq_topk(emb, emb.where(F.col("vec_id") < 20),
                             k_top=10, m=8, k_codes=16, n_clusters=8,
                             n_probe=2).select("query_id", "vec_id")
        r2 = narrow.join(exact, ["query_id", "vec_id"]).count() / n
        assert r2 >= 0.15


class TestBooksPersistence:
    def _emb(self, spark):
        rows = [(i, [float((i * 7 + j * 3) % 5) for j in range(8)])
                for i in range(12)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_roundtrip_is_exact(self, spark):
        from db2pq_spark.operators.pq import (
            pq_books_df, pq_books_restore, pq_train)

        books = pq_train(self._emb(spark), m=2, k=3, iterations=1,
                         dim=8)
        back = pq_books_restore(pq_books_df(spark, books), 2, 3, 4)
        assert back == books

    def test_geometry_mismatch_refused(self, spark):
        from db2pq_spark.operators.pq import (
            pq_books_df, pq_books_restore, pq_train)

        import pytest as _pytest
        books = pq_train(self._emb(spark), m=2, k=3, iterations=1,
                         dim=8)
        bdf = pq_books_df(spark, books)
        with _pytest.raises(ValueError, match="stamped"):
            pq_books_restore(bdf, 4, 3, 2)

    def test_empty_relation_refused(self, spark):
        from db2pq_spark.operators.pq import (
            pq_books_df, pq_books_restore)

        import pytest as _pytest
        empty = pq_books_df(spark, [[[0.0]]]).limit(0)
        with _pytest.raises(ValueError, match="empty"):
            pq_books_restore(empty, 1, 1, 1)

    def test_missing_component_refused(self, spark):
        from db2pq_spark.operators.pq import (
            pq_books_df, pq_books_restore)
        from pyspark.sql import functions as F

        import pytest as _pytest
        bdf = pq_books_df(spark, [[[1.0, 2.0], [3.0, 4.0]]])
        holey = bdf.where(~((F.col("code") == 1)
                            & (F.col("subdim") == 1)))
        with _pytest.raises(ValueError, match="missing components"):
            pq_books_restore(holey, 1, 2, 2)
