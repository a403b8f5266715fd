"""Streaming ingest into the repository: incremental micro-batch
appends, schema parity with exported tables, sidecar freshness."""

from __future__ import annotations

import pytest

from db2pq_spark.sinks.parquet_sink import get_modified_pq, table_path
from db2pq_spark.streaming.ingest import stream_to_pq
from db2pq_spark.streaming.windows import read_events_stream

COMMENT = "events stream (Updated 2026-02-01)"


@pytest.fixture()
def multi_file_source(spark, sf_dir, tmp_path):
    # events carries ns timestamps — readable only as epoch-nanos longs
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = tmp_path / "events_src"
    (spark.read.parquet(f"{sf_dir}/events.parquet")
     .repartition(3).write.parquet(str(src)))
    return str(src)


class TestStreamIngest:
    def test_lands_all_rows_incrementally(self, spark, sf_dir, tmp_path,
                                          multi_file_source):
        repo = tmp_path / "repo"
        stream = read_events_stream(spark, multi_file_source)
        q = stream_to_pq(stream, repo, "stream", "events",
                         last_modified=COMMENT)
        q.awaitTermination()

        path = table_path(repo, "stream", "events")
        back = spark.read.parquet(str(path))
        expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert back.count() == expected
        # flat layout: no phantom partition columns vs an exported table
        assert "batch" not in back.columns
        assert sorted(back.columns) == sorted(
            ["event_id", "ts", "user_id", "event_type", "value", "props",
             "event_time"])

    def test_sidecar_readable_by_sync_kernel(self, spark, tmp_path,
                                             multi_file_source):
        repo = tmp_path / "repo"
        q = stream_to_pq(read_events_stream(spark, multi_file_source),
                         repo, "stream", "events", last_modified=COMMENT)
        q.awaitTermination()
        assert get_modified_pq(table_path(repo, "stream", "events")) \
            == COMMENT

    def test_restart_does_not_duplicate(self, spark, tmp_path,
                                        multi_file_source):
        """Restarting against the same checkpoint replays nothing: the
        second run sees no new files and appends no rows."""
        repo = tmp_path / "repo"
        ckpt = tmp_path / "ckpt"
        for _ in range(2):
            q = stream_to_pq(read_events_stream(spark, multi_file_source),
                             repo, "stream", "events", checkpoint_dir=ckpt)
            q.awaitTermination()
        path = table_path(repo, "stream", "events")
        n = spark.read.parquet(str(path)).count()
        src_n = spark.read.parquet(multi_file_source).count()
        assert n == src_n


class TestStreamRollup:
    def _expected(self, spark, sf_dir):
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return {
            r["event_type"]: r for r in
            (spark.read.parquet(f"{sf_dir}/events.parquet")
             .groupBy("event_type")
             .agg(F.count("*").alias("n"),
                  F.sum("value").alias("sum_value"),
                  F.max("user_id").alias("max_user_id"))).collect()
        }

    def test_matches_batch_aggregate(self, spark, sf_dir, tmp_path,
                                     multi_file_source):
        from db2pq_spark.core import Engine
        from db2pq_spark.streaming.rollup import stream_rollup

        eng = Engine(spark, tmp_path / "repo")
        q = stream_rollup(read_events_stream(spark, multi_file_source),
                          eng, "stream", "roll", ["event_type"],
                          {"value": "sum", "user_id": "max"})
        q.awaitTermination()

        want = self._expected(spark, sf_dir)
        got = {r["event_type"]: r for r in
               eng.read_pq("stream", "roll").collect()}
        assert set(got) == set(want)
        for et, w in want.items():
            assert got[et]["n"] == w["n"]
            assert got[et]["max_user_id"] == w["max_user_id"]
            # float sums accumulate in different orders across the
            # incremental folds — equal up to float tolerance
            assert got[et]["sum_value"] == pytest.approx(w["sum_value"])

    def test_restart_does_not_double_count(self, spark, sf_dir, tmp_path,
                                           multi_file_source):
        from db2pq_spark.core import Engine
        from db2pq_spark.streaming.rollup import stream_rollup

        eng = Engine(spark, tmp_path / "repo")
        ckpt = tmp_path / "ckpt"
        for _ in range(2):
            q = stream_rollup(read_events_stream(spark, multi_file_source),
                              eng, "stream", "roll", ["event_type"],
                              {"value": "sum"}, checkpoint_dir=ckpt)
            q.awaitTermination()
        want = self._expected(spark, sf_dir)
        got = {r["event_type"]: r["n"] for r in
               eng.read_pq("stream", "roll").collect()}
        assert got == {et: w["n"] for et, w in want.items()}

    def test_replayed_batch_id_skipped(self, spark, tmp_path):
        """The sidecar batch id gates refolds: calling the fold again
        with an already-applied id must be a no-op."""
        import json

        from db2pq_spark.core import Engine
        from db2pq_spark.sinks.parquet_sink import SIDECAR, table_path
        from db2pq_spark.streaming.rollup import _applied_batch

        eng = Engine(spark, tmp_path)
        df = spark.createDataFrame([("a", 1)], "k string, v long")
        eng.refresh_rollup(df, "s", "r", ["k"], {"v": "sum"},
                           sidecar_extra={"stream_batch_id": 3})
        path = table_path(tmp_path, "s", "r")
        assert _applied_batch(path) == 3
        # payload keeps standard fields alongside the batch id
        payload = json.loads((path / SIDECAR).read_text())
        assert "written_at" in payload
