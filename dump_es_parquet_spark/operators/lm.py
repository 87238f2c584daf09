"""Corpus-derived language-model quality scoring (perplexity-filter
shape, CCNet-style) without an external model artifact.

Real deployments score documents with a pretrained LM (KenLM in CCNet)
and drop the high-perplexity tail. The SPARK-SHAPE of that filter is
what this module provides: a two-pass pipeline where pass 1 derives a
model from the corpus itself (token statistics — one shuffle), and
pass 2 applies the model to every document via a broadcast join over
exploded tokens with a map-side partial aggregation back to one row
per document. Swapping the derived table for real KenLM logprobs (a
``(token, logprob)`` frame) changes nothing structurally.

The built-in score is integer-exact by construction — Zipf-rank based,
``score = floor(1e6 / rank)`` per token, OOV = 0 — because a float
logprob would make the cross-engine oracle depend on libm ``log``
bit-parity; mean-of-1/rank orders documents almost identically to
mean unigram logprob on natural text (both are monotone in token
commonness) while every intermediate stays a 64-bit integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCALE = 1_000_000


def unigram_rank_model(docs: DataFrame, vocab_size: int = 10_000) -> DataFrame:
    """Pass 1: ``(token, rank, score_ppm)`` for the ``vocab_size`` most
    frequent whitespace tokens. One explode + one map-side-combined
    count shuffle; the rank window runs over vocab_size rows, not the
    corpus. Deterministic: ties rank by token string."""
    counts = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(vocab_size)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return top.select(
        "token",
        F.row_number().over(w).alias("rank"),
    ).select(
        "token",
        "rank",
        (F.lit(SCALE) / F.col("rank")).cast("long").alias("score_ppm"),
    )


def score_documents(docs: DataFrame, model: DataFrame) -> DataFrame:
    """Pass 2: per-document ``(n_tokens, n_oov, score_sum_ppm,
    mean_score_ppm)``. Tokens explode, LEFT-join the broadcast model
    (OOV → 0), and partial-aggregate back to one row per doc — the
    shuffle carries one row per TOKEN only as far as the map-side
    combine. ``model`` may be any ``(token, score_ppm)`` frame (e.g.
    real LM logprobs quantized to ppm)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    scored = toks.join(
        F.broadcast(model.select("token", "score_ppm")), "token", "left"
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("score_ppm").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("score_ppm"), F.lit(0)))
            .cast("long")
            .alias("score_sum_ppm"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            "score_sum_ppm",
            (F.col("score_sum_ppm") / F.col("n_tokens"))
            .cast("long")
            .alias("mean_score_ppm"),
        )
    )


def q_corpus_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-surface form: derive the rank model from the documents
    table itself (vocab 1000) and score every document."""
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    model = unigram_rank_model(d, vocab_size=1000)
    return score_documents(d, model).orderBy("doc_id")
