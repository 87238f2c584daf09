"""Spark 4 Python Data Source: ``spark.read.format("esdump")``.

The DSv2-integrated face of the scan (SURVEY.md op #5 "V2"): schema
comes from the index mapping at planning time, each server-side slice
becomes an ``InputPartition``, and Catalyst equality filters are pushed
down as Lucene ``query_string`` clauses (``pushFilters``) — the same
translation direction the es-hadoop connector uses, reproducing the
reference's server-side filtering (``dump-es-parquet:222``) for
Spark-native ``df.filter(...)`` calls.

Options:

- ``url``: ES/OS base URL (RestES), or ``fixture_json``: canned
  fixture (MockES — tests)
- ``index`` (required), ``query``, ``fields``, ``sort``, ``size``,
  ``scroll``, ``slices``, ``flatten``, ``multivalue``, ``timeout``

Rows are coerced *in the reader* with the pure-Python twin of the
expression coercion (``coerce_py``) — the data is already Python
dicts from the HTTP JSON, so this is the natural (and single) pass.

**Column-pruning boundary.** The Python Data Source API exposes
``pushFilters`` but no column-prune hook (there is no Python
counterpart of ``SupportsPushDownRequiredColumns``), so a bare
``df.select("a", "b")`` on an esdump frame prunes only *after* the
reader has fetched every ``_source`` field over the wire. The
``fields`` option IS this source's projection pushdown — the exact
``_source`` includes mechanism the reference pushes server-side
(``dump-es-parquet:223,386-387``), wildcards included. Pair it with
the select::

    df = (spark.read.format("esdump")
          .option("url", url).option("index", "logs")
          .option("fields", "host,status,@timestamp")  # wire-level prune
          .load()
          .select("host", "status"))                   # plan-level prune

If Spark later adds a prune hook to the Python API, ``fields`` can be
derived from the required schema; until then it is explicit.

Register per-session with ``register(spark)``.
"""

from __future__ import annotations

import json
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)
from pyspark.sql.types import StructType

from dump_es_parquet_spark.coerce_py import coerce_doc, flatten_doc
from dump_es_parquet_spark.schema import mapping_response_to_struct
from dump_es_parquet_spark.sources.client import iter_hits, with_retry


def _make_client(options: dict):
    fixture = options.get("fixture_json")
    if fixture:
        from dump_es_parquet_spark.sources.client import MockES

        return MockES(json.loads(fixture))
    from dump_es_parquet_spark.sources.client import RestES

    return RestES(
        options["url"],
        timeout=int(options.get("timeout", "60")),
        cert=options.get("cert"),
        key=options.get("key"),
        capath=options.get("capath"),
        verify_certs=options.get("verify_certs", "true") != "false",
    )


def _lucene_escape(v) -> str:
    s = str(v)
    for ch in '+-&|!(){}[]^"~*?:\\/ ':
        s = s.replace(ch, "\\" + ch)
    return s


class EsDumpDataSource(DataSource):
    """``spark.read.format("esdump")`` entry point."""

    @classmethod
    def name(cls) -> str:
        return "esdump"

    def schema(self) -> StructType:
        client = _make_client(self.options)
        mapping = with_retry(
            lambda: client.get_mapping(self.options["index"]), max_retries=3,
            backoff_s=1.0,
        )
        return mapping_response_to_struct(
            mapping,
            flatten=self.options.get("flatten", "false") == "true",
            multivalue=self.options.get("multivalue", "first"),
        )

    #: ES types with exact-term query_string semantics — equality
    #: pushdown is only sound for these. ``text`` is analyzed: a term
    #: query is NOT equality, so text fields are never pushed.
    PUSHABLE_ES_TYPES = frozenset(
        {"keyword", "byte", "short", "integer", "long", "ip", "boolean"}
    )

    def simpleStreamReader(self, schema: StructType):
        """Micro-batch streaming over search_after cursors —
        ``spark.readStream.format("esdump")`` (see
        ``streaming/es_stream.py``)."""
        from dump_es_parquet_spark.streaming.es_stream import EsDumpStreamReader

        return EsDumpStreamReader(schema, dict(self.options))

    def streamReader(self, schema: StructType):
        """``stream_mode=timeslice`` → the partitioned, executor-side
        stream reader (timestamp-watermark offsets, N slices per
        batch); any other value falls back to the simple cursor reader
        (Spark calls ``simpleStreamReader`` when this raises
        NOT_IMPLEMENTED)."""
        if self.options.get("stream_mode") == "timeslice":
            from dump_es_parquet_spark.streaming.es_stream import (
                EsDumpTimeSliceStreamReader,
            )

            return EsDumpTimeSliceStreamReader(schema, dict(self.options))
        from pyspark.errors import PySparkNotImplementedError

        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
        )

    def reader(self, schema: StructType) -> "EsDumpReader":
        client = _make_client(self.options)
        mapping = with_retry(
            lambda: client.get_mapping(self.options["index"]),
            max_retries=3,
            backoff_s=1.0,
        )
        props = next(iter(mapping.values()))["mappings"].get("properties", {})
        pushable = {
            name
            for name, spec in props.items()
            if spec.get("type") in self.PUSHABLE_ES_TYPES
        }
        return EsDumpReader(schema, dict(self.options), pushable)


class EsDumpReader(DataSourceReader):
    def __init__(
        self, schema: StructType, options: dict, pushable: set[str] | None = None
    ):
        self.schema = schema
        self.options = options
        # default: nothing pushable without mapping info
        self.pushable = pushable if pushable is not None else set()
        self.pushed_clauses: list[str] = []

    # -- Catalyst filter pushdown → Lucene query_string ---------------
    def pushFilters(self, filters: list["Filter"]) -> Iterator["Filter"]:
        """Consume top-level equality filters as ``field:value``
        clauses — only for fields whose ES mapping type has exact-term
        semantics (``pushable``; analyzed ``text`` is excluded);
        everything else is returned for Spark to evaluate."""
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in self.pushable
                and not isinstance(f.value, (dict, list, bytes))
            ):
                self.pushed_clauses.append(
                    f"{f.attribute[0]}:{_lucene_escape(f.value)}"
                )
            else:
                yield f

    def _query(self) -> str | None:
        user = self.options.get("query")
        clauses = ([user] if user else []) + self.pushed_clauses
        if not clauses:
            return None
        if len(clauses) == 1:
            return clauses[0]
        # parenthesize each clause: Lucene binds AND tighter than OR,
        # so an unparenthesized user query 'a:1 OR b:2' joined with a
        # pushed 'c:3' would parse as 'a:1 OR (b:2 AND c:3)' — and the
        # consumed pushdown filter is trusted, nothing re-checks rows
        return " AND ".join(f"({c})" for c in clauses)

    def partitions(self) -> Sequence[InputPartition]:
        n = int(self.options.get("slices", "8"))
        return [InputPartition(i) for i in range(max(1, n))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        client = _make_client(self.options)
        n = int(self.options.get("slices", "8"))
        fields = self.options.get("fields")
        flatten = self.options.get("flatten", "false") == "true"
        multivalue = self.options.get("multivalue", "first")
        spec = {"id": partition.value, "max": n} if n > 1 else None
        for hit in iter_hits(
            client,
            self.options["index"],
            q=self._query(),
            _source=[f.strip() for f in fields.split(",")] if fields else None,
            sort=self.options.get("sort"),
            size=int(self.options.get("size", "500")),
            scroll=self.options.get("scroll", "1h"),
            slice_spec=spec,
            max_retries=3,
            backoff_s=1.0,
        ):
            src = hit["_source"]
            if flatten:
                src = flatten_doc(src)
            yield coerce_doc(src, self.schema, multivalue)


def register(spark) -> None:
    # opt-in conf gating Python DSv2 filter pushdown (runtime-settable)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EsDumpDataSource)
