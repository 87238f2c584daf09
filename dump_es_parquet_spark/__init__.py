"""dump_es_parquet_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of fifemon/dump-es-parquet.

The reference (``/root/reference/dump-es-parquet``) is a single-file
Elasticsearch/OpenSearch → parquet/ndjson/csv ETL tool. This package
re-expresses its semantics Spark-first:

- ``schema``     — ES index-mapping JSON → Spark ``StructType``
                   (reference ``dump-es-parquet:33-49, 97-110, 185-204``)
- ``coerce``     — document coercion as Catalyst Column expressions
                   (reference ``map_source``, ``dump-es-parquet:112-183``)
- ``sources``    — parallel sliced-scroll scan (reference ``:219-302``)
- ``sinks``      — partitioned parquet/ndjson/csv/jsonl/stdout writers
                   (reference ``:284-338``)
- ``pipeline``   — per-index dump orchestration + CLI (reference ``:54-95,
                   356-433``)
- ``operators``  — the analytics layer the reference defers to DuckDB
                   (``README.md:99-103``): relational queries, dedup,
                   similarity search, text analysis, multimodal columns.
- ``streaming``  — Structured Streaming variants of the scan/analytics.
"""

__version__ = "0.1.0"

from dump_es_parquet_spark.session import get_spark  # noqa: F401
