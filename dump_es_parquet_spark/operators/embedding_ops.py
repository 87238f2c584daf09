"""Embedding storage/transport transforms — per-vector symmetric int8
quantization (the standard 4× shrink for ANN serving and corpus
shipping) and its dequantize inverse, as pure JVM expressions.

Not in the reference (north-star extension surface, SURVEY.md §2.2).

Determinism contract (hash-gate grade): all arithmetic is IEEE double
with a fixed expression shape — ``scale = max|v| / 127.0`` then
``code = floor(v / scale + 0.5)`` (explicit half-up, identical in any
engine; never the engine-native ``round`` whose half-handling
varies). float32 inputs cast to double exactly, so Spark and the
DuckDB oracle compute bit-identical codes. No UDF, no shuffle — one
narrow projection, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def quantize_int8(
    d: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Adds ``{out_prefix}_scale: double`` and ``{out_prefix}_codes:
    array<int>`` (symmetric, zero-point-free: value ≈ code·scale,
    codes in [-127, 127]). An all-zero vector gets scale 0 and all-zero
    codes (guarded division)."""
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    safe = F.nullif(scale, F.lit(0.0))
    codes = F.transform(
        v,
        lambda x: F.coalesce(
            F.floor(x / safe + F.lit(0.5)), F.lit(0)
        ).cast("int"),
    )
    return d.withColumn(f"{out_prefix}_scale", scale).withColumn(
        f"{out_prefix}_codes", codes
    )


def dequantize_int8(
    d: DataFrame, codes_col: str = "q_codes", scale_col: str = "q_scale",
    out_col: str = "dequantized",
) -> DataFrame:
    """Inverse transform: ``code·scale`` per element (float32 output —
    the serving dtype)."""
    return d.withColumn(
        out_col,
        F.transform(
            F.col(codes_col),
            lambda c: (c.cast("double") * F.col(scale_col)).cast("float"),
        ),
    )


def quantize_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): quantize every embedding and report
    the exact code stream (digest), the scale, and the worst
    reconstruction error per vector — the quality certificate a
    pipeline records before swapping int8 storage in."""
    e = load(spark, sf_dir, "embeddings")
    q = quantize_int8(e)
    v = _as_double("embedding")
    err = F.array_max(
        F.zip_with(
            v,
            F.col("q_codes"),
            lambda x, c: F.abs(x - c.cast("double") * F.col("q_scale")),
        )
    )
    return q.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.round("q_scale", 6).alias("scale_r6"),
        F.md5(F.concat_ws(",", F.col("q_codes"))).alias("code_digest"),
        F.aggregate(
            "q_codes", F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("sum_codes"),
        F.round(err, 6).alias("max_abs_err_r6"),
    ).orderBy("vec_id")
