"""Restore: the reverse path — a typed DataFrame back into an
Elasticsearch/OpenSearch index via ``_bulk``.

The reference only dumps (``dump-es-parquet`` README's pipeline ends at
files); real operation also reloads — reindexing into a new cluster,
rehydrating a pruned index, shipping curated subsets back for search.
This is the ``elasticdump``-style other half, Spark-shaped:

- Serialization is JVM-side: ``to_json(struct(*))`` renders each row's
  ``_source`` line inside codegen, so Python touches only ready
  strings (timestamps ISO-formatted by Spark, structs nested, NULLs
  dropped via ``ignoreNullFields`` — ES treats absent and null alike).
- Each partition streams its rows in ``batch_size`` NDJSON ``_bulk``
  calls through the retrying client — per-task connections, no driver
  funnel, the write mirror of the sliced scan.
- Delivery is at-least-once under task retry. Pass ``id_col`` to make
  it idempotent: the doc id rides the bulk action line, so a retried
  batch overwrites rather than duplicates (the same
  cursor-idempotence contract the scan side makes, PARITY.md #6b).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_lines(df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Render each row's ``_source`` JSON line (JVM-side): the one
    serialization restore uses everywhere. ``to_json``'s DEFAULT
    timestampFormat is millisecond-precision — it silently truncates
    µs through a restore (caught by the circle property test) — so we
    pin full microseconds, which both ES date parsing and the dump
    coercion accept."""
    cols = [
        F.to_json(
            F.struct(*df.columns),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"},
        ).alias("_src")
    ]
    if id_col:
        cols.insert(0, F.col(id_col).cast("string").alias("_id"))
    return df.select(*cols)


def restore_index(
    df: DataFrame,
    client_factory: Callable,
    index: str,
    *,
    id_col: str | None = None,
    batch_size: int = 500,
    create_index: bool = False,
) -> int:
    """Write every row of ``df`` into ``index`` via ``_bulk``.
    Returns the number of documents indexed. Raises on any per-item
    bulk error (fail the task → Spark retries it; with ``id_col`` the
    retry is an idempotent overwrite).

    ``create_index=True`` first PUTs the index with a mapping derived
    from the DataFrame schema (``schema.struct_to_properties``, the
    dump type table inverted) — without it, ES would dynamic-map the
    first document and e.g. read restored ISO timestamps as ``text``.
    One driver-side call before any task runs."""
    if create_index:
        from dump_es_parquet_spark.schema import struct_to_properties

        client_factory().create_index(index, struct_to_properties(df.schema))
    lines_df = source_lines(df, id_col=id_col)

    def _ship(rows: Iterator) -> Iterator[int]:
        import json as _json

        client = client_factory()
        sent = 0
        batch: list[str] = []

        def _flush():
            nonlocal sent
            if not batch:
                return
            resp = client.bulk(index, batch)
            if resp.get("errors"):
                bad = next(
                    (
                        item
                        for item in resp.get("items", [])
                        for op in item.values()
                        if op.get("status", 200) >= 300
                    ),
                    None,
                )
                raise RuntimeError(f"bulk item failed: {bad}")
            sent += len(batch) // 2
            batch.clear()

        for row in rows:
            action = (
                {"index": {"_id": row["_id"]}} if id_col else {"index": {}}
            )
            batch.append(_json.dumps(action))
            batch.append(row["_src"])
            if len(batch) >= 2 * batch_size:
                _flush()
        _flush()
        yield sent

    # mapPartitions (not foreachPartition) so the per-task doc counts
    # come back as data — the one legitimate RDD drop-down: per-
    # partition imperative I/O with a result
    return lines_df.rdd.mapPartitions(_ship).sum()


def follow_restore(
    stream_df: DataFrame,
    client_factory: Callable,
    index: str,
    checkpoint: str,
    *,
    id_col: str | None = None,
    batch_size: int = 500,
    trigger: dict | None = None,
):
    """Continuous lake→index replication: each micro-batch of a
    streaming frame (e.g. ``readStream.parquet`` over a growing dump
    directory) bulk-indexes via ``restore_index`` — the search-side
    mirror of ``--follow``'s ingest. foreachBatch is at-least-once;
    pass ``id_col`` so replays overwrite idempotently (the same
    contract as the batch restore's task retries)."""

    def _ship(b: DataFrame, _epoch: int) -> None:
        restore_index(
            b, client_factory, index, id_col=id_col, batch_size=batch_size
        )

    w = stream_df.writeStream.foreachBatch(_ship).option(
        "checkpointLocation", checkpoint
    )
    return w.trigger(**(trigger or {"availableNow": True})).start()
