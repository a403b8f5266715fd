"""Structured Streaming surface. [extension — the reference has no
streaming operators (SURVEY §2.12); its only "streams" are Arrow batch
iterators.]

The engine exposes the events fixture's batch window queries
(workload q19/q20) as true incremental streams: parquet source →
watermark → windowed / session aggregation → sink. On a cluster the
same code runs against a file-arrival or Kafka source; tests drive it
with the memory sink + ``processAllAvailable`` for synchronous
completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", ts_type),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])


#: events schema when the fixture carries ns timestamps read as
#: epoch-nanos longs (Spark rejects TIMESTAMP(NANOS) natively)
EVENTS_SCHEMA = _events_schema(T.LongType())

#: events schema when the fixture carries plain timestamp[us] parquet
#: timestamps (isAdjustedToUTC=false → TIMESTAMP_NTZ)
EVENTS_SCHEMA_US = _events_schema(T.TimestampNTZType())


def with_event_time(df: DataFrame) -> DataFrame:
    """Attach an ``event_time`` (LTZ timestamp) column to a *batch*
    events DataFrame, branching on the fixture's physical ``ts``
    encoding exactly as :func:`read_events_stream` does for streams."""
    if dict(df.dtypes)["ts"] in ("bigint", "long"):
        return df.withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("event_time", F.col("ts").cast("timestamp"))


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """Open the events table as a file stream with proper event-time.

    ``maxFilesPerTrigger=1`` keeps micro-batches bounded. The fixture's
    ``ts`` has shipped as both int64 epoch-nanos and ``timestamp[us]``
    (see workload.t()); a one-off batch probe of the path picks the
    matching stream schema, and ``event_time`` is normalized to a true
    (LTZ) timestamp either way — the session zone is UTC, so the
    NTZ→LTZ cast is a pure reinterpretation.

    ``events_dir`` may be a directory of parquet files or a single
    ``.../events.parquet`` file — the file streaming source requires a
    directory, so a file path is rewritten to parent + glob filter."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    ts_is_long = dict(
        spark.read.parquet(events_dir).dtypes)["ts"] in ("bigint", "long")
    schema = EVENTS_SCHEMA if ts_is_long else EVENTS_SCHEMA_US
    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1))
    if events_dir.endswith(".parquet") and os.path.isfile(events_dir):
        parent, fname = os.path.split(events_dir)
        reader = reader.option("pathGlobFilter", fname)
        raw = reader.parquet(parent)
    else:
        raw = reader.parquet(events_dir)
    if ts_is_long:
        return raw.withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000")))
    return raw.withColumn("event_time", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming
    twin of workload q19. Late rows beyond the watermark are dropped and
    state is GC'd, which is what bounds memory on an unbounded stream."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Watermarked sliding-window counts per event type — each event
    contributes to ``window/slide`` overlapping windows (Spark expands
    the row once per window, then the windowed agg proceeds exactly as
    tumbling). The batch twin is workload q98."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window, slide), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "event_type", "n_events", "sum_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of
    workload q20's lag+cumsum sessionization, using Spark's native
    ``session_window`` state operator."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("session_window.start").alias("session_start"),
                "user_id", "n_events")
    )


def stream_dedup(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; state for a
    key is dropped once the watermark passes it (bounded memory on an
    unbounded stream — the streaming twin of
    :func:`db2pq_spark.operators.dedup.exact_dedup`)."""
    keys = keys or ["user_id", "event_type"]
    return (
        events.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def stream_dedup_incremental(
    docs_stream: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    on_batch,
    threshold: float = 0.7,
    **minhash_kw,
):
    """Streaming near-dup screening against a standing corpus: each
    micro-batch of incoming documents runs
    :func:`db2pq_spark.operators.dedup.minhash_dedup_incremental` via
    ``foreachBatch``, and ``on_batch(pairs_df, epoch_id)`` receives the
    verified (batch_id, corpus_id, jaccard) pairs — route them to a
    quarantine table or an anti-join filter downstream.

    This is the batch operator's design point wearing its streaming
    hat: the micro-batch IS the "small broadcastable batch" side, so
    the corpus never shuffles on any trigger, and a precomputed
    ``minhash_signatures`` relation passed as ``corpus`` makes the
    per-trigger cost one signature-table scan. Returns the configured
    ``DataStreamWriter`` — call ``.trigger(...)`` / ``.start()``
    (``availableNow=True`` for catch-up runs).

    ``on_batch`` must materialize the pairs before returning (collect,
    write, merge): each trigger's intermediate caches are released as
    soon as it returns — an unbounded stream would otherwise grow the
    session cache by two entries per micro-batch.

    [extension — the reference has no streaming surface, SURVEY §2.12]
    """
    from db2pq_spark.operators.dedup import _minhash_dedup_incremental_cached

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs, caches = _minhash_dedup_incremental_cached(
            batch_df, corpus, text_col, id_col,
            threshold=threshold, **minhash_kw)
        try:
            on_batch(pairs, epoch_id)
        finally:
            for c in caches:
                c.unpersist()

    return docs_stream.writeStream.foreachBatch(_process)


def running_user_totals(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running totals maintained across micro-batches.

    This is the escape hatch for stateful semantics the built-in window
    operators can't express (counters, state machines, online models):
    per key, Spark hands the operator its Arrow-batched rows plus a
    persistent ``GroupState``; we fold the batch into the state and emit
    the updated totals. State lives in the state store (checkpointed,
    partitioned by key) — memory is bounded per executor, not per stream.

    [extension — the reference has no streaming surface, SURVEY §2.12]
    """
    import pandas as pd  # noqa: F811 — executor-side import
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = ("user_id bigint, n_events bigint, sum_value double, "
                  "n_clicks bigint")
    state_schema = "n bigint, s double, c bigint"

    def fold(key, pdfs, state: GroupState):
        (n, s, c) = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            c += int((pdf["event_type"] == "click").sum())
        state.update((n, s, c))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s], "n_clicks": [c]})

    return (
        events.withWatermark("event_time", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(fold, out_schema, state_schema,
                                "update", GroupStateTimeout.NoTimeout)
    )


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "append") -> DataFrame:
    """Drive a streaming query to completion over the (finite) file
    source and return the materialized result. Test/bench harness only —
    production sinks are files/Kafka/foreachBatch."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def view_purchase_attribution(events: DataFrame,
                              max_delay: str = "1 hour",
                              watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: attribute each purchase to the
    user's views in the preceding ``max_delay``.

    The canonical Spark streaming join: both sides watermarked, and the
    join condition time-bounds the right side against the left
    (``view_time <= purchase_time <= view_time + max_delay``) — those
    bounds are what let the state store GC matched/expired rows, so
    state stays proportional to the active window, not the stream
    history. The same plan runs on a batch DataFrame (no watermarks
    needed) — workload q83 is exactly that, oracle-checked.
    """
    v = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("event_time").alias("view_time"))
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.col("event_time").alias("purchase_time"))
    if events.isStreaming:
        v = v.withWatermark("view_time", watermark)
        p = p.withWatermark("purchase_time", watermark)
    cond = (
        (v.v_user == p.p_user)
        & (p.purchase_time >= v.view_time)
        & (p.purchase_time <= v.view_time + F.expr(f"INTERVAL {max_delay}"))
    )
    return v.join(p, cond).select(
        F.col("v_user").alias("user_id"), "view_id", "purchase_id",
        "view_time", "purchase_time", "purchase_value")


def stream_semantic_dedup_incremental(
    vec_stream: DataFrame,
    state: DataFrame,
    on_batch,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **dedup_kw,
):
    """Streaming semantic (embedding) near-dup screening against a
    persisted :func:`db2pq_spark.operators.similarity.
    embedding_dedup_state`: each micro-batch of incoming vectors runs
    :func:`db2pq_spark.operators.similarity.semantic_dedup_incremental`
    via ``foreachBatch``; ``on_batch(pairs_df, epoch_id)`` receives
    the verified (batch_id, corpus_id, cos) pairs — the embedding
    twin of :func:`stream_dedup_incremental`, with the same
    the-micro-batch-IS-the-broadcast-side design: the signature state
    never shuffles on any trigger, and the ``_ed_conf`` stamp refuses
    a state built under a different plane family eagerly, HERE, before
    the first trigger fires (validated via
    :func:`~db2pq_spark.operators.similarity.validate_ed_state` — a
    missing stamp column or a mismatched metadata stamp raises at wire
    time; a metadata-less persisted state still falls back to the
    per-row guard inside the micro-batch plan). The
    ``num_planes``/``dim``/``seed`` kwargs must match the persisted
    state. Returns the configured ``DataStreamWriter`` — call
    ``.trigger(...)`` / ``.start()``.

    [extension — the reference has no streaming surface, SURVEY §2.12]
    """
    import inspect

    from db2pq_spark.operators.similarity import (
        semantic_dedup_incremental, validate_ed_state)

    sig = inspect.signature(semantic_dedup_incremental)
    validate_ed_state(
        state,
        dedup_kw.get("num_planes", sig.parameters["num_planes"].default),
        dedup_kw.get("dim", sig.parameters["dim"].default),
        dedup_kw.get("seed", sig.parameters["seed"].default))

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = semantic_dedup_incremental(
            batch_df, state, threshold=threshold, id_col=id_col,
            vec_col=vec_col, **dedup_kw)
        on_batch(pairs, epoch_id)

    return vec_stream.writeStream.foreachBatch(_process)


def stream_logreg_score(
    doc_stream: DataFrame,
    weights: DataFrame,
    on_batch,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    keys: str = "md5",
):
    """Streaming quality scoring against persisted
    :func:`db2pq_spark.operators.logreg.logreg_weights_df` weights:
    each micro-batch of incoming documents runs
    :func:`db2pq_spark.operators.logreg.logreg_score`;
    ``on_batch(scored_df, epoch_id)`` receives
    ``(id, n_feats, margin_units, prob6, predicted)`` — the classifier
    member of the streaming-increment family (exact/semantic dedup,
    line counts). The weight relation is B+1 rows, broadcast into
    every micro-batch; the standing corpus is never touched.

    The ``_lr_b`` hash-space stamp is validated EAGERLY here, before
    the writer is returned — the weight relation is bounded (B+1
    rows), so one ``first()`` is a bounded driver read, and a
    mismatched or empty weight relation refuses at wire time instead
    of surfacing only when the first non-empty micro-batch arrives
    (the q141/q142 eager-validation discipline). The per-row guard
    inside :func:`logreg_score` still backstops every batch plan.

    Returns the configured ``DataStreamWriter`` — call
    ``.trigger(...)`` / ``.start()``.

    [extension — the reference has no streaming surface, SURVEY §2.12]
    """
    from pyspark.sql import functions as F

    from db2pq_spark.operators.logreg import logreg_score

    row = weights.select("_lr_b").first()
    if row is None:
        raise ValueError("stream_logreg_score: empty weight relation")
    if row["_lr_b"] != int(n_buckets):
        raise ValueError(
            f"stream_logreg_score: weights stamped "
            f"_lr_b={row['_lr_b']}, scorer configured for "
            f"n_buckets={int(n_buckets)}")

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        scored = logreg_score(batch_df, weights, text_col, id_col,
                              n_buckets=n_buckets, keys=keys)
        on_batch(scored, epoch_id)

    return doc_stream.writeStream.foreachBatch(_process)
