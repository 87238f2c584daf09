"""Training-data export: sharded parquet + a loader manifest.

The last step of a curation pipeline hands data to a training loader,
which wants (a) a fixed number of roughly equal shards it can assign
to data-parallel workers, and (b) a manifest of per-shard sizes so
epoch accounting and resumption don't require listing/scanning the
lake. This writes both in one pass: hive-partitioned shards plus a
``_manifest.json`` whose stats come from the SAME aggregation Spark
already shuffles for the write — the manifest collect is ``n_shards``
rows, never data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"
MANIFEST = "_manifest.json"


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str,
    token_col: str | None = None,
) -> dict:
    """Write ``df`` hive-partitioned into ``n_shards`` shards
    (``shard=K/`` directories) with a ``_manifest.json`` of per-shard
    row/token counts and an order-free content digest.

    Shard assignment is ``pmod(xxhash64(key), n_shards)`` — stable
    across runs and engines, balanced under any key skew (hash, not
    range), and independent of input partitioning, so a re-export of
    identical data is byte-stable shard membership. Returns the
    manifest dict."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    out = df.withColumn(SHARD_COL, shard)
    out.write.partitionBy(SHARD_COL).mode("overwrite").parquet(path)

    # Digest base: INTEGRAL keys sum/xor directly; anything else (doc
    # ids are often strings) goes through xxhash64 first — a straight
    # long cast would turn every string key into NULL and publish a
    # digest of nothing (ADVICE r06). Decimals route through xxhash64
    # too: a fractional or beyond-long-range decimal under cast('long')
    # reproduces the same silent-NULL digest (ADVICE r07).
    from pyspark.sql import types as T

    if isinstance(df.schema[key_col].dataType, T.IntegralType):
        key_digest = F.col(key_col).cast("long")
    else:
        key_digest = F.xxhash64(F.col(key_col))
    aggs = [
        F.count("*").alias("n_rows"),
        # decimal(38,0) sum: full-width xxhash64 values overflow a long
        # sum under ANSI mode; decimal is exact and order-free
        F.sum(F.col("__key_digest").cast("decimal(38,0)")).alias("key_sum"),
        F.expr("bit_xor(__key_digest)").alias("key_xor"),
    ]
    if token_col:
        aggs.append(F.sum(F.col(token_col).cast("long")).alias("n_tokens"))
    rows = (
        out.withColumn("__key_digest", key_digest)
        .groupBy(SHARD_COL)
        .agg(*aggs)
        .orderBy(SHARD_COL)
        .collect()
    )
    shards = [
        {k: int(v) if k == "key_sum" and v is not None else v
         for k, v in r.asDict().items()}
        for r in rows
    ]
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "token_col": token_col,
        "total_rows": sum(s["n_rows"] for s in shards),
        "total_tokens": (
            sum(s["n_tokens"] for s in shards) if token_col else None
        ),
        "shards": shards,
    }
    from dump_es_parquet_spark.fsutil import publish_json

    # Hadoop-FS publish (not os.*) so object-store export paths work
    publish_json(df.sparkSession, path, MANIFEST, manifest)
    return manifest


def read_manifest(path: str, spark=None) -> dict:
    """Read back ``_manifest.json``. Pass ``spark`` to read through the
    Hadoop FileSystem (required for object-store paths — the artifact
    is published that way); without it, falls back to local open()."""
    if spark is not None:
        from dump_es_parquet_spark.fsutil import read_json

        return read_json(spark, path, MANIFEST)
    with open(os.path.join(path, MANIFEST)) as f:
        return json.load(f)
