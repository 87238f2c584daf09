"""Span-level duplicate detection — the distributed stand-in for
suffix-array substring dedup (Lee et al., "Deduplicating Training Data
Makes Language Models Better"): find k-token spans repeated across
documents (licence boilerplate, navigation chrome, quoted passages)
without materializing a global suffix array.

Not in the reference (its analytics endgame is "analyze in DuckDB",
``/root/reference/README.md:99-103``); this is north-star extension
surface (SURVEY.md §2.2).

Plan shape (100 TB stance): tokenize → posexplode every k-token
window → hash → ONE groupBy over span hashes counting distinct docs →
join the shared-span set back onto the span stream. The explode
multiplies rows by ~tokens-per-doc — the same fan-out every shingle
pipeline pays — but each exploded row is only (doc_id, hash), and the
single shuffle key is the span hash, whose distribution is the text
itself (no hot keys beyond genuinely viral spans, which is exactly the
signal). For 100 TB runs use ``hash_fn='xxhash64'`` (8-byte shuffle
keys, JVM-side); ``'md5'`` is the engine-portable default the DuckDB
oracle can replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load

SPAN_K = 8  # tokens per span — long enough that sharing implies copying


def _span_hash(span: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(span)
    return F.md5(span)


def span_stream(
    d: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    k: int = SPAN_K,
    hash_fn: str = "md5",
) -> DataFrame:
    """Every k-token window of every doc as ``(doc_id, pos, span_h)``.

    Docs shorter than ``k`` tokens contribute ONE span covering the
    whole doc (the established shingle convention here — short docs
    then participate as exact duplicates). ``F.slice`` clamps at the
    end of the array, mirroring DuckDB's ``t[a:b]``.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = d.select(F.col(doc_col).alias("doc_id"), toks.alias("t"))
    last = F.greatest(F.size("t") - k, F.lit(0))
    d = d.withColumn("pos", F.explode(F.sequence(F.lit(0), last)))
    span = F.concat_ws(" ", F.slice("t", F.col("pos") + 1, k))
    return d.select("doc_id", "pos", _span_hash(span, hash_fn).alias("span_h"))


def shared_spans(spans: DataFrame, min_docs: int = 2) -> DataFrame:
    """Span hashes seen in ≥ ``min_docs`` DISTINCT documents — the
    repeated-substring set. One shuffle on ``span_h``."""
    return (
        spans.groupBy("span_h")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def doc_span_profile(
    d: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    k: int = SPAN_K,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-document repeated-span accounting: how much of each doc is
    covered by spans that also occur in other docs. The downstream
    consumer either drops high-``dup_frac`` docs or cuts the flagged
    spans out (span positions are in the stream for that).

    Shuffle keys: span_h (shared-set aggregation), then doc_id (the
    profile re-aggregation). The span stream is recomputed for the
    profile side — two narrow (doc_id, text) scans of the corpus —
    because persisting the exploded stream (~tokens-per-doc × corpus
    rows) would cost far more than a second columnar scan at 100 TB.
    The shared-set join broadcasts when the repeated-span set is small
    (the common case) and falls back to a shuffle join otherwise —
    Catalyst/AQE's call, by size.
    """
    spans = span_stream(d, text_col, doc_col, k, hash_fn)
    shared = shared_spans(spans).select("span_h", F.lit(1).alias("is_shared"))
    return (
        spans.join(shared, "span_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.coalesce(F.col("is_shared"), F.lit(0))).alias("n_shared_spans"),
        )
        .withColumn(
            "dup_frac",
            F.round(F.col("n_shared_spans") / F.col("n_spans"), 6),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    k: int = SPAN_K,
    min_shared: int = 1,
    hash_fn: str = "md5",
) -> DataFrame:
    """Benchmark decontamination by shared-span count — the GPT-3-style
    n-gram overlap rule: a corpus doc sharing ≥ ``min_shared`` k-token
    spans with ANY benchmark document is flagged (and normally
    dropped) before training, so eval numbers aren't memorization.

    Returns the flagged docs as ``(doc_id, n_shared_spans)``.

    Scale shape: the benchmark side reduces to a DISTINCT span-hash
    set — benchmarks are MBs against a 100 TB corpus, so Catalyst
    broadcasts it and the corpus-side span stream is filtered where it
    is produced (corpus spans are never shuffled); the distinct + the
    per-doc count shuffle only the surviving HITS, which are
    contamination-sparse by construction."""
    b_spans = span_stream(
        benchmark, text_col, doc_col, k, hash_fn
    ).select("span_h").distinct()
    hits = span_stream(corpus, text_col, doc_col, k, hash_fn).join(
        b_spans, "span_h"
    )
    return (
        hits.select("doc_id", "span_h")
        .distinct()  # count each shared span once per doc
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
        .filter(F.col("n_shared_spans") >= min_shared)
    )


def decontaminate_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): every 10th document stands in as
    the held-out benchmark; the rest of the corpus is checked against
    it. The planted near-dups in the testdata cross that boundary."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, bench).orderBy("doc_id")


def span_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): repeated-span profile of every
    document, ordered by doc_id."""
    d = load(spark, sf_dir, "documents")
    return doc_span_profile(d).orderBy("doc_id")
