"""Partitioned sinks: parquet / ndjson / csv / raw jsonl / stdout.

Reproduces the reference's output surface (``dump-es-parquet:284-338``)
Spark-idiomatically:

- layout: directory-per-index (``{out}/{index}/part-*.ext``) — the
  Spark-native layout; ``single_file=True`` coalesces to one task and
  renames to the reference's flat ``{index}.{ext}`` /
  ``{index}-{NNNN}.{ext}`` naming (``:312-316``).
- row bounding: ``maxRecordsPerFile`` = ``--max-partition-rows``
  (reference default 1_000_000, ``:391-392``).
- size bounding: the reference flushes when the in-memory frame
  exceeds ``--max-partition-mb`` (``:393-395``). Spark tasks stream to
  files, so the analog is *output file size*: we estimate bytes/row
  from a sample and derive an equivalent ``maxRecordsPerFile``.
- compression: parquet defaults to zstd (reference ``README.md:10``);
  the reference's ``--compression`` flag only actually compresses the
  raw-jsonl mode (gzip/zstd, ``:324-336`` — its zstd call is a NameError
  bug; we implement the documented intent, SURVEY.md op #25).
- csv requires a flattened (struct-free) schema (``README.md:14``) —
  enforced here with a clear error instead of a writer crash.
"""

from __future__ import annotations

import math
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MAX_ROWS = 1_000_000  # reference --max-partition-rows (:391-392)
DEFAULT_MAX_MB = 1000  # reference --max-partition-mb (:393-395)


@dataclass
class SinkOptions:
    output: str = "parquet"  # parquet|orc|ndjson|csv|jsonl|stdout
    compression: str | None = None  # None|gzip|zstd (jsonl/text modes)
    partition: bool = True  # --no-partition disables bounding (:396)
    partition_rows: int = DEFAULT_MAX_ROWS
    partition_mb: int = DEFAULT_MAX_MB
    single_file: bool = False  # reference-compatible flat naming
    # engine extension: hive-style directory partitioning by columns
    # (e.g. dt=2026-05-29/) — partition pruning for downstream readers;
    # the reference has no equivalent (its partitions are size-bounded
    # file splits only, :284-295)
    partition_by: tuple[str, ...] = ()


def _has_struct(df: DataFrame) -> bool:
    return any(isinstance(f.dataType, T.StructType) for f in df.schema.fields)


def estimate_row_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """Sampled bytes/row estimate — the distributed analog of the
    reference's ``df.estimated_size('mb')`` check (``:284-289``),
    computed from a bounded sample instead of materializing the whole
    frame in memory."""
    row = (
        df.limit(sample_rows)
        .select(
            sum(
                (
                    F.coalesce(F.octet_length(F.col(c).cast("string")), F.lit(0)) + 8
                    for c in df.columns
                ),
                F.lit(0),
            ).alias("sz")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("sz").alias("total"))
        .collect()[0]
    )
    n = row["n"]
    if n == 0:
        return 1
    return max(1, int((row["total"] or n) / n))


def estimate_row_bytes_from_docs(docs: list) -> int:
    """Driver-side bytes/row estimate from a sampled page of raw
    ``_source`` docs — no Spark job, so the dump's distributed scan
    stays single-pass (the Spark-side ``estimate_row_bytes`` would
    partially re-scroll the index, and — worse — its sample count
    would be the *first action* on an observed plan, poisoning the
    warning-report counts with truncated-sample numbers)."""
    import json

    if not docs:
        return 1
    total = sum(
        len(d if isinstance(d, str) else json.dumps(d)) for d in docs
    )
    return max(1, total // len(docs))


def bounded_rows_per_file(row_bytes: int, opts: SinkOptions) -> int | None:
    """Effective maxRecordsPerFile from the row bound AND the size
    bound (whichever is tighter), like the reference's dual threshold
    at ``:284-289``."""
    if not opts.partition:
        return None
    by_size = max(1, (opts.partition_mb * 1024 * 1024) // max(1, row_bytes))
    return min(opts.partition_rows, by_size)


def rows_per_file(df: DataFrame, opts: SinkOptions) -> int | None:
    """Sampled-from-the-frame variant for direct ``write()`` callers.
    NOTE: runs a bounded sampling job over ``df`` — inside ``dump()``
    the driver-side page sample (``estimate_row_bytes_from_docs``) is
    used instead so the scan isn't re-executed and observed plans see
    no pre-write action."""
    if not opts.partition:
        return None
    return bounded_rows_per_file(estimate_row_bytes(df), opts)


def write(
    df: DataFrame,
    path: str,
    index: str,
    opts: SinkOptions | None = None,
    rows_per_file_hint: int | None = None,
) -> str:
    """Write one index's frame. Returns the output location.

    ``rows_per_file_hint``: pre-computed maxRecordsPerFile; when None
    and partitioning is on, a bounded sampling job over ``df`` derives
    it (don't pass observed plans through that path)."""
    opts = opts or SinkOptions()
    out_dir = os.path.join(path, index)
    # decide the output frame FIRST, then build one writer chain — a
    # rebuilt writer silently drops previously-set options
    df_out = df.coalesce(1) if opts.single_file else df
    writer = df_out.write.mode("overwrite")

    if opts.partition:
        rpf = (
            rows_per_file_hint
            if rows_per_file_hint is not None
            else rows_per_file(df, opts)
        )
        writer = writer.option("maxRecordsPerFile", rpf)
    if opts.partition_by:
        if opts.single_file:
            raise ValueError("partition_by and single_file are mutually exclusive")
        missing = [c for c in opts.partition_by if c not in df.columns]
        if missing:
            raise ValueError(f"partition_by columns not in frame: {missing}")
        writer = writer.partitionBy(*opts.partition_by)

    if opts.output == "parquet":
        # zstd is the session default (session.py), matching README.md:10
        if opts.compression in ("gzip", "zstd", "snappy"):
            writer = writer.option("compression", opts.compression)
        writer.parquet(out_dir)
    elif opts.output == "orc":
        # engine extension (no reference equivalent): Spark's other
        # built-in columnar format, for downstream stacks standardized
        # on ORC. zstd to match the parquet default.
        writer = writer.option(
            "compression",
            opts.compression if opts.compression in ("zstd", "snappy", "zlib", "lz4") else "zstd",
        )
        writer.orc(out_dir)
    elif opts.output == "ndjson":
        if opts.compression in ("gzip",):
            writer = writer.option("compression", opts.compression)
        writer.json(out_dir)
    elif opts.output == "csv":
        if _has_struct(df):
            raise ValueError(
                "csv output requires a flattened schema — rerun with "
                "flatten=True (reference README.md:14)"
            )
        writer.option("header", True).csv(out_dir)
    elif opts.output == "jsonl":
        # raw passthrough: df must be the schemaless [value: string]
        if df.columns != ["value"]:
            raise ValueError("jsonl raw mode expects the schemaless [value] frame")
        if opts.compression in ("gzip",):
            writer = writer.option("compression", "gzip")
        elif opts.compression == "zstd":
            # the reference intended zstd here (its call is a NameError
            # bug, dump-es-parquet:329-332); Spark's text writer
            # supports codec names directly
            writer = writer.option("compression", "zstd")
        writer.text(out_dir)
    else:
        raise ValueError(f"unknown output format {opts.output!r}")

    if opts.single_file:
        return _flatten_single_file(out_dir, path, index, opts)
    return out_dir


def _ext(opts: SinkOptions) -> str:
    """Reference __output_ext (:206-212): format extension, with
    .gz/.zstd suffix when the raw mode compresses."""
    ext = opts.output
    if opts.output == "jsonl":
        if opts.compression == "gzip":
            ext += ".gz"
        elif opts.compression == "zstd":
            ext += ".zstd"
    return ext


def _flatten_single_file(out_dir: str, path: str, index: str, opts: SinkOptions) -> str:
    """Rename part files to the reference's flat naming (:312-316):
    one part → ``{index}.{ext}``; several (the row/size bound split the
    coalesced task's output) → numbered ``{index}-NNNN.{ext}``, exactly
    the reference's partitioned flat-file naming. Every part file is
    moved — dropping all but the first would silently lose data."""
    ext = _ext(opts)
    parts = [
        f
        for f in sorted(os.listdir(out_dir))
        if f.startswith("part-") and not f.endswith(".crc")
    ]
    if len(parts) <= 1:
        target = os.path.join(path, f"{index}.{ext}")
        if parts:
            shutil.move(os.path.join(out_dir, parts[0]), target)
        else:  # empty frame, no part file emitted (text/json writers)
            open(target, "wb").close()
    else:
        for i, part in enumerate(parts):
            shutil.move(
                os.path.join(out_dir, part),
                os.path.join(path, f"{index}-{i:04}.{ext}"),
            )
        target = os.path.join(path, f"{index}-0000.{ext}")
    shutil.rmtree(out_dir)
    return target


def write_stdout(df: DataFrame, limit: int | None = None) -> int:
    """Raw JSON per line to stdout (reference ``:250-253, 278-281``).
    Streams via toLocalIterator — never collects the full frame."""
    n = 0
    it = df.toLocalIterator()
    for row in it:
        print(row[0] if df.columns == ["value"] else row.asDict())
        n += 1
        if limit is not None and n >= limit:
            break
    return n


# ---------------------------------------------------------------------------
# sink round-trip oracle queries (VERDICT r07 Next #4): the csv/ndjson
# writers get a cross-engine correctness row — Spark digests the SOURCE
# frame while the DuckDB oracle digests the FILES this query just wrote,
# so any encode loss (quoting, escaping, precision, column drift) breaks
# the hash instead of hiding behind a same-engine read-back.

#: fixed so the static oracle SQL can glob it (DuckDB table functions
#: take constant paths only — a content-keyed path can't be threaded
#: into a static string); each run overwrites it before its oracle
#: reads it, which every harness honors (Spark-then-oracle per query
#: in the driver, pytest, and tools/check_correctness alike). A
#: concurrent run at a different scale factor racing the window
#: between write and oracle-read fails LOUDLY (row-count/digest
#: mismatch), never silently passes — the digests are sf-dependent.
SINK_ORACLE_DIR = "/tmp/spark_graft_sink_oracle"


def csv_roundtrip_digest(spark, sf_dir: str) -> DataFrame:
    """Write orders as partitioned CSV through the real sink
    (``write(output='csv')``, header + maxRecordsPerFile bounding), then
    return a 1-row digest of the SOURCE frame. The oracle recomputes
    the identical digest from ``read_csv`` over the written files —
    a field built with an embedded comma forces RFC-4180 quoting, the
    timestamp is pre-formatted to a portable string, and the double sum
    goes through DECIMAL(18,2) so shortest-repr text round-trips
    exactly."""
    from dump_es_parquet_spark.operators.tables import load

    o = load(spark, sf_dir, "orders")
    frame = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_odate"),
        # embedded comma => the writer MUST quote; a misquote shifts
        # columns and breaks every downstream cast in the oracle
        F.concat_ws(",", "o_orderstatus", "o_orderpriority").alias("qfield"),
    )
    # no rows_per_file_hint: the un-hinted path samples row bytes so the
    # partition_mb size bound stays enforced alongside the row bound —
    # a fixed hint would silently drop the dual-threshold contract
    write(frame, SINK_ORACLE_DIR, "csv_orders", SinkOptions(output="csv"))
    return frame.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_orderkey").alias("key_sum"),
        F.expr("bit_xor(o_orderkey)").alias("key_xor"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("price_sum"),
        F.min("o_odate").alias("min_odate"),
        F.max("o_odate").alias("max_odate"),
        F.sum(F.length("qfield")).alias("q_len_sum"),
    )


def jsonl_roundtrip_digest(spark, sf_dir: str) -> DataFrame:
    """Write documents through the RAW jsonl sink — the schemaless
    ``[value]`` passthrough mode, gzip-compressed (the reference's
    intended raw mode, its zstd call being a NameError bug) — then
    return a 1-row digest of the source columns. The oracle decodes
    the gzip part files with ``read_json`` directly, so compression,
    line framing, and JSON encoding are all checked by a second
    engine."""
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents")
    raw = d.select(
        F.to_json(
            F.struct("doc_id", "text", "lang", "source", "n_chars")
        ).alias("value")
    )
    write(
        raw,
        SINK_ORACLE_DIR,
        "jsonl_documents",
        SinkOptions(output="jsonl", compression="gzip"),
    )
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_sum"),
        F.expr("bit_xor(doc_id)").alias("id_xor"),
        F.sum(F.length("text")).alias("text_len_sum"),
        F.sum("n_chars").alias("n_chars_sum"),
    )


def ndjson_roundtrip_digest(spark, sf_dir: str) -> DataFrame:
    """Write documents as partitioned ndjson through the real sink
    (``write(output='ndjson')``), then return a 1-row digest of the
    SOURCE frame for the oracle to recompute from ``read_json`` over
    the written files. A synthesized field carrying quote, newline and
    tab characters exercises JSON string escaping; a token array
    exercises JSON list encoding."""
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents")
    frame = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        F.concat(
            F.lit('"'), F.col("lang"), F.lit('"\n\t'), F.col("source")
        ).alias("tricky"),
        F.split("text", " ").alias("tokens"),
    )
    write(frame, SINK_ORACLE_DIR, "ndjson_documents", SinkOptions(output="ndjson"))
    return frame.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("doc_id").alias("id_sum"),
        F.expr("bit_xor(doc_id)").alias("id_xor"),
        F.sum(F.length("text")).alias("text_len_sum"),
        F.sum(F.length("tricky")).alias("tricky_len_sum"),
        F.sum(F.size("tokens")).alias("token_count_sum"),
        F.sum("n_chars").alias("n_chars_sum"),
    )
