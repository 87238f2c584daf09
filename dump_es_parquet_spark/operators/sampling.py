"""Deterministic sampling & splits — the reproducibility primitive a
training-data pipeline needs: the same row lands in the same split on
every run, every engine, any cluster size.

No RNG anywhere: membership is a pure function of the row key via md5
(engine-portable, unlike xxhash64/rand). Sampling is a narrow
filter — fully pushdown-friendly, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load


def _hex_digit(h: Column, pos: int) -> Column:
    """md5 hex char at 1-based ``pos`` → its value 0-15, via ascii
    arithmetic ('0'-'9' = 48-57, 'a'-'f' = 97-102) — expressible
    identically in any SQL engine (no conv()/strtol dependency)."""
    a = F.ascii(F.substring(h, pos, 1))
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def hash_bucket(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets): first 4 md5 hex chars of
    the key (16 bits) mod buckets. Engine-portable; the 65536→buckets
    fold has a ≤0.2% non-uniformity — irrelevant for splits."""
    h = F.md5(key.cast("string"))
    val = (
        _hex_digit(h, 1) * 4096
        + _hex_digit(h, 2) * 256
        + _hex_digit(h, 3) * 16
        + _hex_digit(h, 4)
    )
    return (val % buckets).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — re-runs and
    different partitionings yield the identical sample. ``salt`` gives
    independent samples from the same keys."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(hash_bucket(key) < int(fraction * 10_000))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') — disjoint,
    exhaustive, deterministic by key."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    b = hash_bucket(key)
    val_hi = int(val_fraction * 10_000)
    test_hi = val_hi + int(test_fraction * 10_000)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: deterministic split of the documents corpus +
    per-split accounting (the reproducible-split contract, checked
    exactly against the oracle)."""
    d = load(spark, sf_dir, "documents")
    s = train_val_test_split(d, "doc_id")
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))).alias(
                "membership_digest"
            ),
        )
        .orderBy("split")
    )
