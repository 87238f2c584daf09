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


def benchmark_span_bloom(
    spark: SparkSession,
    bench_spans: DataFrame,
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """Compress a benchmark span-hash set into an ``m_bits`` Bloom
    bitmap, returned as a ONE-row frame ``(bm: array<long>)``.

    Built entirely JVM-side: each span hashes to ``n_hashes`` bit
    positions (``xxhash64(span_h, seed) mod m``); positions reduce to
    sparse ``(word, bit_or(mask))`` pairs in one shuffle, then a
    ``spark.range(m/64)`` left join densifies and a single ordered
    ``collect_list`` folds the words into one array cell. The bitmap
    is DATA (one row, ``m/64`` longs ≈ ``m_bits/8`` bytes), never a
    plan literal — a 2^30-bit filter is a 128 MB row, not a 128 MB
    expression tree.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    words = m_bits // 64
    pos_cols = [
        F.pmod(F.xxhash64("span_h", F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]
    sparse = (
        bench_spans.select(F.explode(F.array(*pos_cols)).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("w"),
            # SQL shiftleft: the Python wrapper wants a literal int
            # shift, the SQL form takes a column
            F.expr("shiftleft(1L, int(pos % 64))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return (
        spark.range(words)
        .join(sparse, F.col("id") == F.col("w"), "left")
        .select("id", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("id", "bits"))),
                lambda s: s["bits"],
            ).alias("bm")
        )
    )


def _bloom_member(span_h: Column, m_bits: int, n_hashes: int) -> Column:
    """All-``n_hashes``-bits-set test against the broadcast ``bm``
    array column. Pure Column expressions — stays in codegen."""
    cond = F.lit(True)
    one = F.lit(1).cast("long")
    for i in range(n_hashes):
        pos = F.pmod(F.xxhash64(span_h, F.lit(i)), F.lit(m_bits))
        word = (pos / 64).cast("int")
        # shiftleft via multiplication-free SQL form (column shift)
        mask = F.call_function("shiftleft", one, (pos % 64).cast("int"))
        cond = cond & (
            F.element_at(F.col("bm"), word + 1).bitwiseAND(mask) != 0
        )
    return cond


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    k: int = SPAN_K,
    min_shared: int = 1,
    hash_fn: str = "md5",
    m_bits: int = 1 << 20,
    n_hashes: int = 4,
) -> DataFrame:
    """`decontaminate` for when the benchmark span set is too big to
    broadcast RAW — the 100 TB regime where the eval-suite union holds
    billions of k-token spans (GBs of hash strings) but its Bloom
    bitmap is MBs.

    Two-stage, exact result: (1) prefilter the corpus span stream
    against the broadcast bitmap — corpus spans are tested where they
    are produced, so the non-matching bulk (the overwhelming majority)
    is never shuffled; (2) exact-verify the bloom survivors with the
    same span-hash join `decontaminate` uses — false positives die
    here, so the output is IDENTICAL to the exact operator row-for-row
    (the oracle reuses the exact SQL). Only survivors + benchmark
    spans pay the verify shuffle, and that join no longer needs the
    benchmark side to fit in a broadcast.

    Sizing: false-positive rate ≈ (1 - e^(-hn/m))^h; at n benchmark
    spans keep ``m_bits ≳ 16·n`` for ~2% with ``n_hashes=4``. The
    bitmap crossJoin is the audited 1-row-broadcast BNLJ family.
    """
    spark = corpus.sparkSession
    b_spans = span_stream(
        benchmark, text_col, doc_col, k, hash_fn
    ).select("span_h").distinct()
    bm = benchmark_span_bloom(spark, b_spans, m_bits, n_hashes)
    survivors = (
        span_stream(corpus, text_col, doc_col, k, hash_fn)
        .crossJoin(F.broadcast(bm))
        .filter(_bloom_member(F.col("span_h"), m_bits, n_hashes))
        .select("doc_id", "span_h")
    )
    return (
        survivors.join(b_spans, "span_h")
        .select("doc_id", "span_h")
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
        .filter(F.col("n_shared_spans") >= min_shared)
    )


def decontaminate_bloom_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked against the SAME exact SQL as
    ``corpus_decontaminate`` — the bloom stage is a prefilter, not an
    approximation): every 10th document stands in as the benchmark."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    return bloom_decontaminate(corpus, bench, m_bits=1 << 18).orderBy("doc_id")


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
