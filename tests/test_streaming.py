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
