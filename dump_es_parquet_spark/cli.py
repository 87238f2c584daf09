"""CLI reproducing the reference's argparse surface
(``dump-es-parquet:356-433``), driving the Spark pipeline.

Usage::

    python -m dump_es_parquet_spark.cli 'my-data-*' --es http://es-host:9200 \
        --output parquet --query 'status:active' --fields 'a,b,meta.*' \
        --sort '@timestamp:asc' --out ./dump

Extra engine flags (not in the reference): ``--slices`` (scan
parallelism), ``--multivalue array``, ``--order global``, ``--out``
(output directory; the reference writes to CWD).
"""

from __future__ import annotations

import argparse
import logging
import sys

from dump_es_parquet_spark.pipeline import UBER, dump
from dump_es_parquet_spark.session import get_spark
from dump_es_parquet_spark.sinks import DEFAULT_MAX_MB, DEFAULT_MAX_ROWS, SinkOptions
from dump_es_parquet_spark.sources.scan import DEFAULT_SORT, ScanOptions


def build_parser() -> argparse.ArgumentParser:
    # flag-for-flag with dump-es-parquet:369-433 (defaults cited)
    p = argparse.ArgumentParser(
        prog="dump-es-parquet-spark",
        description="Dump Elasticsearch/OpenSearch indices to parquet/"
        "ndjson/csv/jsonl via Spark",
    )
    p.add_argument("index", help="source index pattern")  # :370
    p.add_argument("--es", default="http://localhost:9200",
                   help="source cluster address")  # :371
    p.add_argument("--cert", default=None, help="Client x509 certificate")
    p.add_argument("--key", default=None, help="Client x509 key")
    p.add_argument("--capath", default=None, help="Path to CA certificates")
    p.add_argument("--no-verify-certs", action="store_true",
                   help="Do not verify x509 certificates")
    p.add_argument("--output", default="parquet",
                   choices=["parquet", "ndjson", "csv", "jsonl", "stdout"])
    p.add_argument("--compression", default="uncompressed",
                   choices=["uncompressed", "gzip", "zstd"])  # :392
    p.add_argument("--sort", default=DEFAULT_SORT)  # :380
    p.add_argument("--size", type=int, default=500)  # :379
    p.add_argument("--timeout", type=int, default=60)  # :381
    p.add_argument("--scroll", default="1h")  # :382
    p.add_argument("--flatten", action="store_true")  # :388-390
    p.add_argument("--query", default=None)  # :385
    p.add_argument("--fields", default=None)  # :386-387
    p.add_argument("--max-partition-rows", type=int, default=DEFAULT_MAX_ROWS)
    p.add_argument("--max-partition-mb", type=int, default=DEFAULT_MAX_MB)
    p.add_argument("--no-partition", action="store_true")  # :396
    p.add_argument("--debug", action="store_true",
                   help="Enable debug logging")  # :398
    p.add_argument("--quiet", action="store_true",
                   help="Disable most logging (ignored if --debug)")  # :399
    p.add_argument("-v", "--verbose", action="count", default=0,
                   help="engine extension: -v INFO, -vv DEBUG")
    # engine extensions
    p.add_argument("--out", default=".", help="output directory")
    p.add_argument("--slices", type=int, default=8, help="scan parallelism")
    p.add_argument("--multivalue", default="first", choices=["first", "array"])
    p.add_argument("--order", default="slice", choices=["slice", "global"])
    p.add_argument("--single-file", action="store_true",
                   help="reference-compatible flat {index}.{ext} naming")
    p.add_argument("--master", default=None, help="spark master override")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    # reference precedence (:401-407): --debug > --quiet > default
    if args.debug:
        level = logging.DEBUG
    elif args.quiet:
        level = logging.ERROR
    else:
        level = {0: UBER, 1: logging.INFO}.get(args.verbose, logging.DEBUG)
    logging.basicConfig(level=level, stream=sys.stderr)

    def client_factory():
        from dump_es_parquet_spark.sources.client import RestES

        return RestES(
            args.es,
            timeout=args.timeout,
            cert=args.cert,
            key=args.key,
            capath=args.capath,
            verify_certs=not args.no_verify_certs,
        )

    scan = ScanOptions(
        query=args.query,
        fields=args.fields,
        sort=args.sort,
        size=args.size,
        scroll=args.scroll,
        slices=args.slices,
        flatten=args.flatten,
        multivalue=args.multivalue,
        order=args.order,
    )
    sink = SinkOptions(
        output=args.output,
        compression=None if args.compression == "uncompressed" else args.compression,
        partition=not args.no_partition,
        partition_rows=args.max_partition_rows,
        partition_mb=args.max_partition_mb,
        single_file=args.single_file,
    )
    spark = get_spark(master=args.master)
    result = dump(spark, client_factory, args.index, args.out, scan, sink)
    for line in result.warning_report():
        print(line, file=sys.stderr)
    return 1 if result.errors and not result.indices else 0


if __name__ == "__main__":
    raise SystemExit(main())
