"""Streaming windows vs their batch twins: the streaming tumbling-window
counts must equal the batch groupBy over the same finite input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from db2pq_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    running_user_totals,
    session_counts,
    stream_dedup,
    tumbling_counts,
    with_event_time,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return read_events_stream(spark, f"{sf_dir}/events.parquet")


class TestTumbling:
    def test_matches_batch(self, spark, sf_dir, events_stream):
        # complete mode: append would (correctly) hold back the final
        # windows still inside the watermark when the finite source ends
        got = run_to_memory(
            tumbling_counts(events_stream, "1 hour"), "tumbling_out",
            output_mode="complete",
        )
        batch = (
            with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
            .groupBy(F.window("event_time", "1 hour"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        got_map = {(r["window_start"], r["event_type"]): r["n_events"]
                   for r in got.collect()}
        batch_map = {(r["window"]["start"], r["event_type"]): r["n_events"]
                     for r in batch.collect()}
        assert got_map == batch_map
        assert len(got_map) > 100  # ~30 days × 24 h × 5 types at sf0.001


class TestSliding:
    def test_matches_batch(self, spark, sf_dir, events_stream):
        from db2pq_spark.streaming.windows import sliding_counts

        got = run_to_memory(
            sliding_counts(events_stream, "1 hour", "15 minutes"),
            "sliding_out", output_mode="complete",
        )
        batch = (
            with_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
            .groupBy(F.window("event_time", "1 hour", "15 minutes"),
                     "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        got_map = {(r["window_start"], r["event_type"]): r["n_events"]
                   for r in got.collect()}
        batch_map = {(r["window"]["start"], r["event_type"]): r["n_events"]
                     for r in batch.collect()}
        assert got_map == batch_map
        # every event sits in exactly window/slide = 4 windows
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert sum(got_map.values()) == 4 * n_events


class TestStreamDedup:
    def test_keeps_at_most_batch_distinct(self, spark, sf_dir, events_stream):
        got = run_to_memory(
            stream_dedup(read_events_stream(spark, f"{sf_dir}/events.parquet"),
                         ["user_id", "event_type"]),
            "dedup_out",
        )
        batch_distinct = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .select("user_id", "event_type").distinct().count()
        )
        n = got.count()
        # watermark-scoped dedup can re-admit a key after its state ages
        # out, so: distinct ≤ streamed ≤ total, and exactly one row per
        # (user, type) within any watermark window
        assert batch_distinct <= n < 10_000
        assert got.select("user_id", "event_type").distinct().count() \
            == batch_distinct


class TestStatefulOperator:
    def test_final_state_matches_batch(self, spark, sf_dir, tmp_path):
        """applyInPandasWithState accumulates across micro-batches: split
        the events table into 3 files → 3 micro-batches
        (maxFilesPerTrigger=1), then the last emitted totals per user
        must equal the batch groupBy."""
        src = tmp_path / "events_multi"
        (spark.read.parquet(f"{sf_dir}/events.parquet")
         .repartition(3).write.parquet(str(src)))

        stream = read_events_stream(spark, str(src))
        got = run_to_memory(running_user_totals(stream), "stateful_out",
                            output_mode="update")
        # counters are monotone → the row with max n_events per user is
        # the final state
        import pyspark.sql.functions as SF
        from pyspark.sql import Window
        w = Window.partitionBy("user_id").orderBy(SF.desc("n_events"))
        final = (got.withColumn("rk", SF.row_number().over(w))
                 .where("rk = 1").drop("rk"))

        batch = (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .groupBy("user_id")
            .agg(SF.count("*").alias("n_events"),
                 SF.sum("value").alias("sum_value"),
                 SF.sum(SF.when(SF.col("event_type") == "click", 1)
                        .otherwise(0)).alias("n_clicks"))
        )
        got_map = {r["user_id"]: (r["n_events"], r["n_clicks"],
                                  round(r["sum_value"], 6))
                   for r in final.collect()}
        batch_map = {r["user_id"]: (r["n_events"], r["n_clicks"],
                                    round(r["sum_value"], 6))
                     for r in batch.collect()}
        assert got_map == batch_map

    def test_emits_multiple_updates_per_user(self, spark, sf_dir, tmp_path):
        src = tmp_path / "events_multi2"
        (spark.read.parquet(f"{sf_dir}/events.parquet")
         .repartition(3).write.parquet(str(src)))
        got = run_to_memory(
            running_user_totals(read_events_stream(spark, str(src))),
            "stateful_out2", output_mode="update")
        # 3 micro-batches × ~50 users → more emitted rows than users
        n_users = got.select("user_id").distinct().count()
        assert got.count() > n_users


class TestSessions:
    def test_session_totals_cover_all_events(self, spark, sf_dir, events_stream):
        got = run_to_memory(
            session_counts(events_stream, "30 minutes"), "session_out",
            output_mode="complete",
        )
        total_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert got.agg(F.sum("n_events")).collect()[0][0] == total_events
        # more sessions than users, fewer than events
        n_users = 50
        assert n_users <= got.count() < total_events


class TestStreamStreamJoin:
    def test_interval_join_matches_batch(self, spark, sf_dir, tmp_path):
        """Stream-stream interval join (view→purchase attribution) over
        3 micro-batches must produce exactly the batch join's pairs —
        including pairs whose view and purchase arrive in different
        micro-batches (buffered in the join state store)."""
        from db2pq_spark.streaming.windows import (
            read_events_stream,
            run_to_memory,
            view_purchase_attribution,
        )

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        src = tmp_path / "events_ssj"
        # Deliver micro-batches in (rough) event-time order — a random
        # 3-way split would advance the watermark to max(file1)-2h after
        # the first batch and correctly drop the other files as late.
        # The file source processes oldest-mtime first, so write the
        # three time slices sequentially.
        import time as _time

        import pyspark.sql.functions as SF

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        evn = with_event_time(ev).withColumn(
            "ts_us", SF.unix_micros("event_time"))
        lo, q1, q2, hi = evn.selectExpr(
            "min(ts_us)", "percentile(ts_us, 0.33)",
            "percentile(ts_us, 0.66)", "max(ts_us)").first()
        for a, b in ((lo - 1, q1), (q1, q2), (q2, hi)):
            (evn.where(f"ts_us > {int(a)} AND ts_us <= {int(b)}")
             .drop("ts_us", "event_time")
             .coalesce(1).write.mode("append").parquet(str(src)))
            _time.sleep(1.1)

        stream = read_events_stream(spark, str(src))
        got = run_to_memory(view_purchase_attribution(stream), "ssj_out",
                            output_mode="append")

        batch_ev = with_event_time(spark.read.parquet(str(src)))
        want = view_purchase_attribution(batch_ev)

        key = lambda r: (r["user_id"], r["view_id"], r["purchase_id"])
        got_keys = sorted(key(r) for r in got.collect())
        want_keys = sorted(key(r) for r in want.collect())
        assert got_keys == want_keys and len(got_keys) > 0


class TestStreamIncrementalDedup:
    def test_matches_batch_operator(self, spark, sf_correct_dir, tmp_path):
        # the streamed micro-batches must reproduce exactly the batch
        # operator's pairs over the same finite input, across >1 trigger
        from db2pq_spark.operators.dedup import minhash_dedup_incremental
        from db2pq_spark.streaming.windows import stream_dedup_incremental

        docs = spark.read.parquet(f"{sf_correct_dir}/documents.parquet")
        batch_docs = docs.filter(F.col("doc_id") % 5 == 0)
        corpus = docs.filter(F.col("doc_id") % 5 != 0)

        src = str(tmp_path / "doc_stream_src")
        batch_docs.repartition(4).write.parquet(src)
        stream = (spark.readStream.schema(batch_docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        got: list[tuple] = []
        epochs: set[int] = set()

        def sink(pairs, epoch_id):
            epochs.add(epoch_id)
            got.extend((r["batch_id"], r["corpus_id"])
                       for r in pairs.collect())

        q = (stream_dedup_incremental(stream, corpus, "text", "doc_id",
                                      sink, threshold=0.6)
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.awaitTermination()

        expect = {(r["batch_id"], r["corpus_id"])
                  for r in minhash_dedup_incremental(
                      batch_docs, corpus, "text", "doc_id",
                      threshold=0.6).collect()}
        assert expect and set(got) == expect
        assert len(got) == len(set(got))  # no pair double-emitted
        assert len(epochs) > 1  # genuinely exercised multiple triggers


class TestStreamSemanticDedupIncremental:
    def test_matches_batch_operator(self, spark, sf_correct_dir,
                                    tmp_path):
        """The streamed micro-batches must reproduce exactly the batch
        probe's pairs over the same finite input, across >1 trigger —
        the embedding twin of TestStreamIncrementalDedup."""
        from db2pq_spark.operators.similarity import (
            embedding_dedup_state, semantic_dedup_incremental)
        from db2pq_spark.streaming.windows import (
            stream_semantic_dedup_incremental)

        emb = spark.read.parquet(f"{sf_correct_dir}/embeddings.parquet")
        state = embedding_dedup_state(emb).localCheckpoint(eager=True)
        # planted clones of the first 20 vectors (the q142 fixture
        # argument: parallel vectors share every hyperplane sign)
        batch = emb.filter(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(1.25))
             .alias("embedding"))

        src = str(tmp_path / "vec_stream_src")
        batch.repartition(4).write.parquet(src)
        stream = (spark.readStream.schema(batch.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        got: list[tuple] = []
        epochs: set[int] = set()

        def sink(pairs, epoch_id):
            epochs.add(epoch_id)
            got.extend((r["batch_id"], r["corpus_id"])
                       for r in pairs.collect())

        q = (stream_semantic_dedup_incremental(
                stream, state, sink, threshold=0.999)
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.awaitTermination()

        expect = {(r["batch_id"], r["corpus_id"])
                  for r in semantic_dedup_incremental(
                      batch, state, threshold=0.999).collect()}
        assert expect and set(got) == expect
        assert len(got) == len(set(got))
        assert len(epochs) > 1


class TestStreamLogregScore:
    def test_matches_batch_scorer(self, spark, sf_correct_dir,
                                  tmp_path):
        """Streamed micro-batches reproduce the batch scorer exactly
        over the same finite input, across >1 trigger."""
        from db2pq_spark.operators.logreg import (
            logreg_score, logreg_train, logreg_weights_df)
        from db2pq_spark.streaming.windows import stream_logreg_score

        docs = spark.read.parquet(f"{sf_correct_dir}/documents.parquet")
        w = logreg_train(docs.where(F.col("doc_id") % 7 != 0), "text",
                         "doc_id", F.col("source") == "src0",
                         n_buckets=32, epochs=2)
        wdf = logreg_weights_df(spark, w).localCheckpoint(eager=True)
        batch = docs.where(F.col("doc_id") % 7 == 0) \
            .select("doc_id", "text")

        src = str(tmp_path / "doc_stream_src")
        batch.repartition(4).write.parquet(src)
        stream = (spark.readStream.schema(batch.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))

        got: dict[int, tuple] = {}
        epochs: set[int] = set()

        def sink(scored, epoch_id):
            epochs.add(epoch_id)
            for r in scored.collect():
                got[r["id"]] = (r["margin_units"], r["prob6"],
                                r["predicted"])

        q = (stream_logreg_score(stream, wdf, sink, n_buckets=32)
             .trigger(availableNow=True)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        q.awaitTermination()

        expect = {r["id"]: (r["margin_units"], r["prob6"],
                            r["predicted"])
                  for r in logreg_score(batch, wdf, "text", "doc_id",
                                        n_buckets=32).collect()}
        assert expect and got == expect
        assert len(epochs) > 1

    def test_stamp_mismatch_refused_eagerly(self, spark, tmp_path):
        from db2pq_spark.operators.logreg import logreg_weights_df
        from db2pq_spark.streaming.windows import stream_logreg_score

        wdf = logreg_weights_df(spark, [0] * 17)  # stamped B=16
        schema = "doc_id long, text string"
        src = str(tmp_path / "empty_src")
        spark.createDataFrame([], schema).write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        # wired against an IDLE stream: must refuse NOW, not on the
        # first non-empty trigger
        with pytest.raises(ValueError, match="n_buckets=32"):
            stream_logreg_score(stream, wdf, lambda d, e: None,
                                n_buckets=32)

    def test_empty_weights_refused(self, spark, tmp_path):
        from db2pq_spark.operators.logreg import logreg_weights_df
        from db2pq_spark.streaming.windows import stream_logreg_score

        wdf = logreg_weights_df(spark, [0] * 17).limit(0)
        schema = "doc_id long, text string"
        src = str(tmp_path / "empty_src2")
        spark.createDataFrame([], schema).write.parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        with pytest.raises(ValueError, match="empty weight"):
            stream_logreg_score(stream, wdf, lambda d, e: None,
                                n_buckets=16)


class TestStreamTokenDrift:
    def _mk(self, spark, tmp_path):
        from db2pq_spark.core import Engine

        standing = spark.createDataFrame(
            [(1, "alpha beta beta gamma"), (2, "alpha delta")],
            "doc_id long, text string")
        b1 = spark.createDataFrame(
            [(10, "beta beta beta zeta")], "doc_id long, text string")
        b2 = spark.createDataFrame(
            [(20, "zeta zeta alpha")], "doc_id long, text string")
        src = tmp_path / "drift_src"
        src.mkdir()
        import os
        import time
        b1.coalesce(1).write.parquet(str(src / "f1"))
        b2.coalesce(1).write.parquet(str(src / "f2"))
        now = time.time()
        for i, d in enumerate(("f1", "f2")):
            for f in (src / d).glob("*.parquet"):
                os.utime(f, (now + i * 10, now + i * 10))
        eng = Engine(spark, tmp_path / "repo")
        return eng, standing, b1, b2, src

    def _stream(self, spark, src, schema):
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .option("recursiveFileLookup", "true")
                .parquet(str(src)))

    def test_multi_trigger_parity_and_fold(self, spark, tmp_path):
        from db2pq_spark.operators.quality import token_drift
        from db2pq_spark.streaming.drift import (init_token_counts,
                                                 stream_token_drift)

        eng, standing, b1, b2, src = self._mk(spark, tmp_path)
        init_token_counts(eng, standing, "s", "td")
        got: dict[int, list] = {}

        def sink(df, bid):
            got[bid] = [tuple(r) for r in df.collect()]

        q = stream_token_drift(self._stream(spark, src, standing.schema),
                               eng, "s", "td", sink, k=50,
                               checkpoint_dir=tmp_path / "ck")
        q.awaitTermination()
        assert sorted(got) == [0, 1]
        # trigger 0: batch1 vs standing; trigger 1: batch2 vs
        # standing+batch1 — exactly the batch operator on each split
        want0 = [tuple(r) for r in
                 token_drift(standing, b1, "text", k=50).collect()]
        want1 = [tuple(r) for r in
                 token_drift(standing.union(b1), b2, "text",
                             k=50).collect()]
        assert got[0] == want0
        assert got[1] == want1
        # final standing counts = one fold of everything
        from pyspark.sql import functions as F

        from db2pq_spark.operators.textstats import tokens
        want = {r["tok"]: r["n"] for r in
                standing.union(b1).union(b2)
                .select(F.explode(tokens("text")).alias("tok"))
                .groupBy("tok").count()
                .withColumnRenamed("count", "n").collect()}
        have = {r["tok"]: r["n"] for r in
                eng.read_pq("s", "td").collect()}
        assert have == want

    def test_restart_does_not_double_count(self, spark, tmp_path):
        from db2pq_spark.streaming.drift import (init_token_counts,
                                                 stream_token_drift)

        eng, standing, b1, b2, src = self._mk(spark, tmp_path)
        init_token_counts(eng, standing, "s", "td")
        emitted: list[int] = []
        for _ in range(2):
            q = stream_token_drift(
                self._stream(spark, src, standing.schema),
                eng, "s", "td",
                lambda df, bid: emitted.append(bid),
                checkpoint_dir=tmp_path / "ck")
            q.awaitTermination()
        # second run re-reads nothing (checkpoint) and folds nothing
        assert emitted == [0, 1]
        total = sum(r["n"] for r in eng.read_pq("s", "td").collect())
        n_tokens = 6 + 4 + 3
        assert total == n_tokens

    def test_checkpoint_lineage_refused(self, spark, tmp_path):
        from db2pq_spark.streaming.drift import (init_token_counts,
                                                 stream_token_drift)

        eng, standing, b1, b2, src = self._mk(spark, tmp_path)
        init_token_counts(eng, standing, "s", "td")
        q = stream_token_drift(self._stream(spark, src, standing.schema),
                               eng, "s", "td", lambda df, bid: None,
                               checkpoint_dir=tmp_path / "ck")
        q.awaitTermination()
        # a FRESH checkpoint restarts batch ids at 0 — folding them
        # again would double-count; the lineage guard must refuse
        q2 = stream_token_drift(
            self._stream(spark, src, standing.schema),
            eng, "s", "td", lambda df, bid: None,
            checkpoint_dir=tmp_path / "ck_other")
        with pytest.raises(Exception, match="checkpoint"):
            q2.awaitTermination()

    def test_tokenizer_stamp_refused(self, spark, tmp_path):
        import json

        from db2pq_spark.sinks.parquet_sink import SIDECAR, table_path
        from db2pq_spark.streaming.drift import (init_token_counts,
                                                 stream_token_drift)

        eng, standing, b1, b2, src = self._mk(spark, tmp_path)
        init_token_counts(eng, standing, "s", "td")
        sidecar = table_path(eng.data_dir, "s", "td") / SIDECAR
        payload = json.loads(sidecar.read_text())
        payload["td_tokenizer"] = "other_v9"
        sidecar.write_text(json.dumps(payload))
        with pytest.raises(ValueError, match="tokenizer"):
            stream_token_drift(self._stream(spark, src, standing.schema),
                               eng, "s", "td", lambda df, bid: None,
                               checkpoint_dir=tmp_path / "ck")
