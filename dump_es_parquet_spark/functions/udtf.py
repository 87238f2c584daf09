"""Python UDTF (table function) surface — Spark 4's
``@udtf``-style lateral table functions.

``ShingleExplode`` mirrors the JVM-side shingling in
``operators/dedup.shingles_col`` as a *table function*: one input text
row → one output row per word-k-gram. Registered it can be used in SQL
as ``LATERAL shingle_explode(text, 3)`` — the UDTF shape that matters
for pipelines generating training examples (chunking, windowing,
augmentation) where one document fans out to many rows.

JVM expressions stay the hot path; the UDTF exists for fan-out logic
that needs Python (tokenizers, samplers) — it runs Arrow-batched like
other Python evals.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="shingle: string, pos: int")
class ShingleExplode:
    """One row per word-k-gram of the input text."""

    def eval(self, text: str, k: int = 3):
        if not text:
            return
        toks = text.split()
        if len(toks) <= k:
            yield (" ".join(toks), 0)
            return
        for i in range(len(toks) - k + 1):
            yield (" ".join(toks[i : i + k]), i)


def register(spark) -> None:
    spark.udtf.register("shingle_explode", ShingleExplode)
