"""Corpus curation pipeline — the composed form of the training-data
operators: quality filter → language filter → dedup → chunk.

One call takes a raw ``documents``-shaped frame to a training-ready
chunk table; every stage is one of the already-tested operators, so
the composition is a pure logical plan (Catalyst fuses the
projection-only stages; the only shuffles are the dedup groupBy/join
and nothing else).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.chunking import chunk_documents
from dump_es_parquet_spark.operators.dedup import dedup_corpus


def curate(
    d: DataFrame,
    *,
    min_tokens: int = 10,
    min_chars: int = 50,
    languages: tuple[str, ...] = (),
    dedup: str = "minhash",
    chunk_tokens: int = 64,
    stride: int = 48,
    repetition_gates: bool = False,
) -> DataFrame:
    """documents(doc_id, text, lang, ...) → curated chunk table
    (doc_id, chunk_id, chunk_text, n_chunk_tokens).

    Stage order matters at scale: cheap per-row filters first (shrink
    before the dedup shuffle), dedup before chunking (don't fan out
    rows that will be dropped). ``repetition_gates=True`` swaps the
    plain length filter for the full quality gate set
    (``text.filter_corpus``: length + stopword presence + Gopher
    repetition thresholds — adds one linear gram-count pass)."""
    if repetition_gates:
        from dump_es_parquet_spark.operators.text import filter_corpus

        filtered = filter_corpus(d, min_tokens=min_tokens, min_chars=min_chars)
    else:
        toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
        filtered = d.filter(
            (toks >= min_tokens) & (F.length("text") >= min_chars)
        )
    if languages:
        filtered = filtered.filter(F.col("lang").isin(*languages))
    deduped = dedup_corpus(filtered, strategy=dedup)
    return chunk_documents(deduped, chunk_tokens=chunk_tokens, stride=stride)
