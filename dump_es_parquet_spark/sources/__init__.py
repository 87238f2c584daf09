"""Source connectors: Elasticsearch/OpenSearch-style scan (mock +
REST), exposed both as plain functions and as a Spark 4 Python Data
Source (``spark.read.format("esdump")``)."""

from dump_es_parquet_spark.sources.client import (  # noqa: F401
    FatalHTTPError,
    MockES,
    TransportError,
)
from dump_es_parquet_spark.sources.scan import ScanOptions, read_index, read_pattern  # noqa: F401
