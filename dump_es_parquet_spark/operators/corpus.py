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


def curate_and_export(
    d: DataFrame,
    out_path: str,
    *,
    n_shards: int = 64,
    per_source_cap: int | None = None,
    min_lm_score_ppm: int | None = None,
    **curate_kwargs,
) -> dict:
    """The full release pipeline in one call: curate (filter → dedup →
    chunk), optionally cap per-source dominance and drop the
    lowest-LM-score tail, then publish sharded parquet with a loader
    manifest AND a datacard — everything a downstream trainer consumes.

    Stage order at scale: caps and score filters run on DOCUMENTS
    (before chunk fan-out); the datacard is computed over the documents
    that SURVIVE curate's own quality filter and dedup (the distinct
    doc_ids of the shipped chunk table semi-joined back to the document
    frame), so it describes exactly what shipped — not the pre-filter
    input. Returns ``{"manifest": ..., "datacard": ...}``."""
    from dump_es_parquet_spark.operators.datacard import write_datacard
    from dump_es_parquet_spark.operators.export import export_shards

    kept = d
    if per_source_cap is not None and "source" in d.columns:
        from dump_es_parquet_spark.operators.web import cap_per_group

        kept = cap_per_group(
            kept, ["source"], per_source_cap,
            F.md5(F.col("doc_id").cast("string")),
        )
    if min_lm_score_ppm is not None:
        from dump_es_parquet_spark.operators.lm import (
            score_documents,
            unigram_rank_model,
        )

        model = unigram_rank_model(kept.select("doc_id", "text"))
        scores = score_documents(kept.select("doc_id", "text"), model)
        good = scores.where(
            F.col("mean_score_ppm") >= min_lm_score_ppm
        ).select("doc_id")
        kept = kept.join(good, "doc_id", "left_semi")
    chunks = curate(kept, **curate_kwargs)
    # curate drops more documents (quality gate + dedup) after the
    # cap/score filters above — the datacard must count what ships,
    # so restrict to doc_ids that actually produced chunks. Cache the
    # shipped frame: build_datacard runs ~5 separate aggregation
    # actions over it, and each would otherwise re-execute the whole
    # curate chain (quality gates + dedup joins + chunk fan-out).
    shipped = kept.join(
        chunks.select("doc_id").distinct(), "doc_id", "left_semi"
    ).cache()
    try:
        datacard = write_datacard(
            shipped.select(
                *[c for c in ("doc_id", "text", "lang", "source")
                  if c in kept.columns]
            ),
            out_path,
        )
    finally:
        shipped.unpersist()
    manifest = export_shards(
        chunks, f"{out_path}/shards", n_shards, key_col="doc_id",
        token_col="n_chunk_tokens",
    )
    return {"manifest": manifest, "datacard": datacard}
