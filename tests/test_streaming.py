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
