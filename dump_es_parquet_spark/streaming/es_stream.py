"""Continuous ES dump as a Structured Streaming source.

The reference's scroll loop is a *batch-incremental pull with a
server-held cursor* (``dump-es-parquet:259-302``) — already
streaming-shaped. This module completes the thought (SURVEY.md §2.2
"streaming" row): an ``esdump`` micro-batch stream where each batch is
a bounded run of ``search_after`` pages and the **offset is the sort
cursor** — resumable, checkpointable, replayable (the same property
that makes task retries safe in the batch scan makes exactly-once
micro-batches possible here).

Registered through the same ``esdump`` DataSource:

    spark.readStream.format("esdump")
         .option("index", ...).option(...)  # same options as batch
         .load()

Uses ``SimpleDataSourceStreamReader`` (driver-side reads): correct for
moderate ingest rates; a partitioned stream reader per slice is the
scale-up path and reuses the identical cursor logic.
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql.datasource import SimpleDataSourceStreamReader

from dump_es_parquet_spark.coerce_py import coerce_doc, flatten_doc
from dump_es_parquet_spark.sources.client import with_retry, with_sort_tiebreaker


class EsDumpStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader: offset = ``{"cursor": <sort values>|null}``;
    each batch reads up to ``pages_per_batch`` search_after pages."""

    def __init__(self, schema, options: dict):
        self.schema = schema
        self.options = options
        self.pages_per_batch = int(options.get("pages_per_batch", "4"))

    def _client(self):
        from dump_es_parquet_spark.sources.datasource import _make_client

        return _make_client(self.options)

    def initialOffset(self) -> dict:
        # None → first page omits search_after ("from the start"); a
        # literal [0] cursor would mean "after sort value 0" on a real
        # server and silently skip documents
        return {"cursor": None}

    def _read_pages(
        self, start_cursor, max_pages: int | None, stop_cursor=None
    ) -> Tuple[list, list]:
        client = self._client()
        rows: list[tuple] = []
        cursor = start_cursor
        flatten = self.options.get("flatten", "false") == "true"
        multivalue = self.options.get("multivalue", "first")
        pages = 0
        while True:
            if stop_cursor is not None and cursor == stop_cursor:
                break
            if max_pages is not None and pages >= max_pages:
                break
            cur = cursor
            resp = with_retry(
                lambda: client.search(
                    self.options["index"],
                    q=self.options.get("query"),
                    _source=None,
                    # unique tie-breaker: page boundaries must not skip
                    # docs sharing the last sort value
                    sort=with_sort_tiebreaker(
                        self.options.get("sort", "@timestamp:asc"), pit=False
                    ),
                    size=int(self.options.get("size", "500")),
                    scroll=None,
                    search_after=cur,
                ),
                max_retries=3,
                backoff_s=1.0,
            )
            hits = resp["hits"]["hits"]
            if not hits:
                break
            for h in hits:
                src = h["_source"]
                if flatten:
                    src = flatten_doc(src)
                rows.append(coerce_doc(src, self.schema, multivalue))
            nxt = resp.get("last_sort")
            if nxt is None or nxt == cursor:
                cursor = nxt if nxt is not None else cursor
                break
            cursor = nxt
            pages += 1
        return rows, cursor

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        rows, cursor = self._read_pages(start["cursor"], self.pages_per_batch)
        return iter(rows), {"cursor": cursor}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        """Deterministic replay for recovery: re-walk the cursor range.
        search_after cursors are resumable, so the same range yields
        the same rows (the PIT-in-production caveat applies for
        concurrently-mutating indices)."""
        rows, _ = self._read_pages(start["cursor"], None, stop_cursor=end["cursor"])
        return iter(rows)
