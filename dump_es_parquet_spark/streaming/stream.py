"""Structured Streaming: incremental dump + windowed event analytics.

The reference's scroll loop is a batch-incremental pull with a
server-held cursor (``dump-es-parquet:259-302``) — the streaming-shaped
part of its design. Here that becomes real Structured Streaming:

- ``stream_events``: file-source stream over a parquet directory
  (the stand-in for a continuous ES dump; a PIT/search_after
  micro-batch source slots into the same plan).
- ``windowed_counts``: tumbling-window aggregation with a watermark
  for late data — state store bounded by (window × keys), scales with
  key cardinality not input volume.

Tests drive these with ``trigger(availableNow=True)`` into a memory
sink and assert equality with the batch plan over the same input —
exactly-once file-source semantics make the two coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet dir as a stream (schema from the batch reader —
    file streams require an explicit schema). ns-precision timestamps
    are read as long (nanosAsLong) and converted, as in the batch
    loader."""
    import os
    import tempfile

    from dump_es_parquet_spark.operators.tables import _ensure_session_confs

    _ensure_session_confs(spark)
    src = f"{sf_dir}/events.parquet"
    if os.path.isfile(src):
        # the file stream source requires a directory; expose the
        # single-file testdata through a symlink dir
        d = tempfile.mkdtemp(prefix="stream-events-")
        os.symlink(src, os.path.join(d, "events.parquet"))
        src = d
    schema = spark.read.parquet(src).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from dump_es_parquet_spark.operators.tables import _normalize_ts

    return _normalize_ts(df)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with late-data watermark.
    Works identically on a batch frame (window() is the same
    expression) — used by tests to cross-check stream vs batch."""
    return (
        events.withWatermark("ts", watermark)
        if events.isStreaming
        else events
    ).groupBy(
        F.window("ts", window).alias("win"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("win.start").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def run_stream_to_memory(
    spark: SparkSession, sf_dir: str, table: str = "stream_out"
) -> DataFrame:
    """Drive the stream with availableNow into a memory sink; returns
    the materialized result frame (complete mode)."""
    q = (
        windowed_counts(stream_events(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(table)


def dedup_stream(
    events: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact dedup: drop rows whose key was already seen,
    with state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — Spark's canonical streaming
    dedup; state for a key is evicted once the watermark passes its
    event time, so at-least-once upstream sources — e.g. a retried ES
    page in the ``--follow`` dump — collapse to effectively-once
    without unbounded key state).

    On a batch frame the same call degrades to plain
    ``dropDuplicates`` over the keys, which is how tests cross-check
    stream ≡ batch. Note the WITHIN-watermark caveat: duplicates
    arriving farther apart than the watermark are kept in stream mode
    — a deliberate state-size/completeness trade every 100 TB stream
    makes explicitly."""
    keys = key_cols or ["event_id"]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def dedup_stream_against_store(
    stream_df: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    threshold: float = 0.7,
):
    """Streaming NEAR-dup curation against the persisted MinHash
    signature store (``operators.dedup.write_signature_store``): each
    micro-batch runs ``dedup_incremental`` — band-collision check
    against all history INCLUDING previous micro-batches' survivors —
    and appends only kept rows to ``out_path``. The ``foreachBatch``
    composition is Structured Streaming's idiom for stateful logic
    whose state lives outside the stream (here: the store on disk,
    which also serves batch increments between stream runs).

    Delivery contract (stated, not hidden): foreachBatch is
    at-least-once — a batch retried after a mid-write crash re-appends
    its rows and signatures. The store stays CORRECT under replay
    (duplicate signature rows only add redundant band matches), but
    the parquet output needs the usual downstream exact-dedup on
    doc_id (or a transactional sink) for exactly-once. Returns the
    started query; await it (``availableNow`` drains the source)."""
    from dump_es_parquet_spark.operators.dedup import dedup_incremental

    def _batch(df, _epoch_id):
        if not df.head(1):
            return
        out = dedup_incremental(df, store_path, threshold)
        out.filter("keep").select(df.columns).write.mode("append").parquet(
            out_path
        )

    return (
        stream_df.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def purchase_after_click_join(
    left: DataFrame, right: DataFrame, interval: str = "1 hour",
    watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream INNER interval join: purchases within ``interval``
    after a click by the same user — the canonical attribution shape.

    State stays bounded because BOTH sides carry event-time watermarks
    and the join condition bounds ``r_ts`` to [l_ts, l_ts + interval]:
    Spark evicts buffered left rows once the right watermark passes
    l_ts + interval, and right rows once the left watermark passes
    r_ts (Structured Streaming's stream-stream join state cleanup
    contract). The same expression tree evaluates identically on batch
    frames, which is how the test cross-checks stream vs batch."""
    lw = left.withWatermark("ts", watermark) if left.isStreaming else left
    rw = right.withWatermark("ts", watermark) if right.isStreaming else right
    clicks = lw.filter(F.col("event_type") == "click").select(
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = rw.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return clicks.join(
        buys,
        (F.col("user_id") == F.col("b_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {interval}")),
        "inner",
    ).drop("b_user")
