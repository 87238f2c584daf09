"""Contrastive training-pair mining — (anchor, positive, negative)
triplets for embedding-model training: positives are exact-verified
near-duplicate pairs (the mined "hard positives" every contrastive
corpus starts from), negatives a deterministic hash-ring pick (the
cheap in-batch-negative stand-in that stays reproducible across runs
and engines — no RNG).

Not in the reference (north-star extension surface, SURVEY.md §2.2).

Scale shape: the positive miner is the existing prefix-filtered
AllPairs n-gram join (``dedup.ngram_jaccard_pairs`` — near-linear in
colliding shingles); the negative assignment is O(1) arithmetic per
pair off one broadcast scalar (corpus size). Nothing here adds a
shuffle beyond the miner's own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.dedup import ngram_jaccard_pairs_for
from dump_es_parquet_spark.operators.sampling import hash_bucket


def ring_negative(
    anchor: Column, positive: Column, n_docs: Column, salt: str = "neg"
) -> Column:
    """Deterministic negative doc_id for a (anchor, positive) pair
    over a DENSE id space [0, n_docs): md5-bucket the anchor onto the
    ring, then step past collisions with the pair itself (≤ 2 steps).
    Engine-portable: same md5 arithmetic as ``hash_bucket``."""
    base = hash_bucket(F.concat(F.lit(salt), anchor.cast("string"))) % n_docs
    one = (base + 1) % n_docs
    two = (base + 2) % n_docs
    return (
        F.when((base != anchor) & (base != positive), base)
        .when((one != anchor) & (one != positive), one)
        .otherwise(two)
    )


def contrastive_triplets_for(
    d: DataFrame, threshold: float = 0.6
) -> DataFrame:
    """(anchor, positive, negative) triplets from a ``(doc_id, text)``
    corpus with dense ids: one row per verified near-dup pair
    (anchor = smaller id), negative from the hash ring."""
    n = d.agg(F.count(F.lit(1)).alias("n"))  # 1-row broadcast scalar
    pairs = ngram_jaccard_pairs_for(d, threshold)
    return (
        pairs.crossJoin(F.broadcast(n))
        .select(
            F.col("id_a").alias("anchor_id"),
            F.col("id_b").alias("positive_id"),
            ring_negative(F.col("id_a"), F.col("id_b"), F.col("n")).alias(
                "negative_id"
            ),
            "jaccard",
        )
        .orderBy("anchor_id", "positive_id")
    )


def triplet_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): contrastive triplets mined from the
    documents corpus at the standard 0.6 near-dup threshold."""
    from dump_es_parquet_spark.operators.dedup import _par
    from dump_es_parquet_spark.operators.tables import load

    return contrastive_triplets_for(_par(load(spark, sf_dir, "documents")))
