"""Document chunking — the training-data fan-out operator: one
document → overlapping fixed-size token windows (the standard
pre-tokenization chunking for LLM corpora).

Pure JVM expressions: tokenize → window starts via ``sequence`` with
stride → slice + reassemble. One narrow projection + explode; scales
linearly and pipelines with the parquet scan (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load


def chunk_documents(
    d: DataFrame, chunk_tokens: int = 64, stride: int = 48, text_col: str = "text"
) -> DataFrame:
    """documents → (doc_id, chunk_id, chunk_text, n_chunk_tokens).
    Windows of ``chunk_tokens`` whitespace tokens every ``stride``
    tokens (overlap = chunk_tokens - stride)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # window start positions: 0, stride, 2·stride … covering the tail
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.ceil((n - chunk_tokens) / F.lit(stride)), F.lit(0)).cast("int")
        * stride,
        F.lit(stride),
    )
    return (
        d.select(
            "doc_id",
            toks.alias("_toks"),
            F.posexplode(starts).alias("chunk_id", "_start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.concat_ws(
                " ", F.slice("_toks", F.col("_start") + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(
                F.size("_toks") - F.col("_start"), F.lit(chunk_tokens)
            ).alias("n_chunk_tokens"),
        )
    )


def chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: chunk the corpus, return per-doc chunk accounting
    (+ md5 of each chunk as the downstream exact-dedup key)."""
    d = load(spark, sf_dir, "documents")
    ch = chunk_documents(d)
    return (
        ch.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_chunk_tokens").alias("total_chunk_tokens"),
            F.min(F.md5("chunk_text")).alias("min_chunk_digest"),
        )
        .orderBy("doc_id")
    )
