"""Structured Streaming: the windowed aggregation over the events
stream must equal the batch plan over the same files (exactly-once
file-source semantics)."""

from __future__ import annotations

from dump_es_parquet_spark.operators.tables import load
from dump_es_parquet_spark.oracle import canon_rows
from dump_es_parquet_spark.streaming.stream import (
    run_stream_to_memory,
    stream_events,
    windowed_counts,
)


def test_stream_equals_batch(spark, sf_dir):
    streamed = run_stream_to_memory(spark, sf_dir, table="t_stream_eq")
    batch = windowed_counts(load(spark, sf_dir, "events"))
    s = canon_rows(streamed.columns, [tuple(r) for r in streamed.collect()])
    b = canon_rows(batch.columns, [tuple(r) for r in batch.collect()])
    assert s == b
    assert len(s) > 0


def test_stream_is_streaming(spark, sf_dir):
    df = stream_events(spark, sf_dir)
    assert df.isStreaming
    assert windowed_counts(df).isStreaming


def test_esdump_streaming_source(spark):
    """readStream.format('esdump') micro-batches over search_after
    cursors and, once drained, equals the batch read."""
    import json

    from dump_es_parquet_spark.sources.datasource import register

    docs = [
        {"n": i, "@timestamp": 1748520000 + i, "kind": "a" if i % 2 else "b"}
        for i in range(1300)
    ]
    fixture = json.dumps(
        {
            "live": {
                "mapping": {
                    "n": {"type": "integer"},
                    "@timestamp": {"type": "date"},
                    "kind": {"type": "keyword"},
                },
                "docs": docs,
            }
        }
    )
    register(spark)
    stream = (
        spark.readStream.format("esdump")
        .option("fixture_json", fixture)
        .option("index", "live")
        .option("size", "200")
        .option("pages_per_batch", "2")
        .option("sort", "@timestamp:asc")
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("es_stream_t")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.table("es_stream_t")
    assert out.count() == 1300
    assert out.select("n").distinct().count() == 1300  # exactly-once
    assert out.groupBy("kind").count().count() == 2


def test_stateful_sessionize_stream(spark, sf_dir):
    """applyInPandasWithState sessionization over the events stream:
    closed sessions must agree with the batch gaps-and-islands plan
    for users whose sessions are all closed."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.streaming.stateful import sessionize_stream

    q = (
        sessionize_stream(stream_events(spark, sf_dir), timeout="none")
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    closed = spark.table("sessions_t")
    # batch reference: full sessionization via window functions
    from dump_es_parquet_spark.operators.relational import q_events_sessionize

    batch = q_events_sessionize(spark, sf_dir)
    # all closed sessions must be valid prefixes of the batch session
    # sets: same (user, session) event counts
    b = {
        (r.user_id): r.n_sessions
        for r in batch.collect()
    }
    got = closed.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert closed.count() > 0
    for r in got:
        if r.user_id in b:
            # closed-session count never exceeds total sessions
            assert r.n <= b[r.user_id]
    # session integrity: start <= end, positive event counts
    bad = closed.filter(
        (F.col("session_start_s") > F.col("session_end_s"))
        | (F.col("n_events") <= 0)
    ).count()
    assert bad == 0
