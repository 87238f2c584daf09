"""Text-analysis operators over the ``documents`` table: token
counting, quality scoring, language-ID, fingerprinting.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen) —
no Python in the hot path. Hash-based operators use md5, which is
bit-identical across engines, so every query here is exactly
DuckDB-oracle-checkable.

Scale: each operator is a narrow per-row projection (no shuffle except
the final aggregate/ordering), so they scale linearly with input and
pipeline with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load

#: whitespace tokenizer — identical semantics in Spark split() and
#: DuckDB regexp_split_to_array
TOKEN_SEP = r"\s+"

#: BPE-ish subword splitter: words, numbers, or single punctuation —
#: approximates a byte-pair tokenizer's pre-tokenization regex
BPE_ISH = r"[a-z]+|[A-Z][a-z]*|\d+|[^\sA-Za-z\d]"

#: tiny marker-word lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "los"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

STOPWORDS = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "that"]


def tokens_col(col="text"):
    return F.split(F.trim(F.col(col)), TOKEN_SEP)


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish token counts per document."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), 0)).alias(
            "n_bpe_tokens"
        ),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality signals: length, punctuation density, stopword
    ratio, mean word length — the standard pre-training quality-filter
    feature set."""
    d = load(spark, sf_dir, "documents")
    toks = tokens_col()
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[^\w\s]"), 0))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(
            (F.length("text") - n_tokens + 1).cast("double") / n_tokens, 6
        ).alias("avg_word_len"),
        (
            (n_tokens >= 10)
            & (F.length("text") >= 50)
            & (stop_hits.cast("double") / n_tokens < 0.5)
        ).alias("passes_filter"),
    ).orderBy("doc_id")


def lang_guess_col(text) -> "F.Column":
    """Column form of the marker-word language heuristic (no hit →
    'und'; ties break on language code). Composable into any frame —
    the datacard uses it without the table-level wrapper."""
    toks = F.array_distinct(F.split(F.trim(text), r"\s+"))
    langs = sorted(LANG_MARKERS)
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS[lang]]))
        )
        for lang in langs
    }
    best = F.greatest(*scores.values())
    guess = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # first max wins → deterministic tie-break
        guess = guess.when(scores[lang] == best, F.lit(lang))
    return guess


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language heuristic: score = distinct marker hits per
    language, argmax with deterministic tie-break on language code.
    (A real system uses char-n-gram models; the plumbing — per-row
    scoring + argmax — is identical.)"""
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(tokens_col())
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    scored = d.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    guess = F.when(best <= 0, F.lit("und"))
    for l in langs:  # first max wins → deterministic tie-break
        guess = guess.when(F.col(f"score_{l}") == best, F.lit(l))
    return (
        scored.select(
            "doc_id", "lang", *[f"score_{l}" for l in langs], guess.alias("guessed")
        )
        .orderBy("doc_id")
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over the normalized text
    (lowercase, collapsed whitespace, punctuation stripped) — the
    canonical near-exact-dup key — plus a shingle-composite fingerprint
    (min-md5 over word 3-grams, a 1-hash MinHash)."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "),
            r"\s+",
            " ",
        )
    )
    toks = F.split(norm, " ")
    # greatest(..., 0) guards docs under 3 tokens: an unguarded
    # sequence(0, size-3) runs DESCENDING when size < 3 and the slice
    # then misbehaves (same guard as dedup.shingles_col)
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.array_min(F.transform(shingles, F.md5)).alias("min_shingle_hash"),
    ).orderBy("doc_id")


#: redaction patterns — a pragmatic curation pass, not a compliance
#: guarantee: emails, international-ish phone numbers, IPv4s, and
#: 13-19-digit card-like runs. Kept in the regex subset Java's engine
#: and RE2 (DuckDB) evaluate identically, so the operator is
#: oracle-checkable.
#: ORDER MATTERS: the phone pattern is the greediest (any long
#: digit-ish run), so card numbers and dotted IPs must be redacted
#: before it runs, and emails before everything (their local part can
#: contain digit runs).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("card", r"\b[0-9]{13,19}\b", "<CARD>"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]", "<PHONE>"),
)


def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 — the
    standard pre-training repetition gate): per document, the most
    frequent word's share, the fraction of tokens that are repeats,
    and the most frequent word-bigram's share. Heavily repetitive
    machine-generated text scores high on all three.

    Scale shape: explode → groupBy(doc_id, gram) with map-side combine
    → one groupBy(doc_id) — LINEAR in corpus token count (the
    alternative, a per-doc ``transform×filter`` expression, is
    O(distinct·n) per doc and melts on 100k-token documents). Both
    shuffles key on doc_id-prefixed grams, so hot documents spread by
    gram, not by doc."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals_for(d)


def repetition_signals_for(d: DataFrame, text_col: str = "text") -> DataFrame:
    """Frame-level repetition signals (see ``repetition_signals``)."""
    t = d.select("doc_id", tokens_col(text_col).alias("t"))
    wc = (
        t.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ws = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.max("c").alias("top_w"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_w"),
    )
    bigrams = F.zip_with(
        F.expr("slice(t, 1, size(t) - 1)"),
        F.expr("slice(t, 2, size(t) - 1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bs = (
        t.filter(F.size("t") >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_b"))
    )
    return (
        ws.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_words").cast("long").alias("n_words"),
            F.round(
                F.col("top_w").cast("double") / F.col("n_words"), 6
            ).alias("top_word_frac"),
            F.round(
                F.col("dup_w").cast("double") / F.col("n_words"), 6
            ).alias("dup_word_frac"),
            F.round(
                F.col("top_b").cast("double") / (F.col("n_words") - 1), 6
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


#: quality-gate rule set (Gopher-flavored, thresholds tuned to the
#: synthetic corpus so each rule has bite): rule name → short reason
FILTER_RULES = (
    "short_tokens",   # n_words < min_tokens
    "short_chars",    # n_chars < min_chars
    "no_stopwords",   # fewer distinct stopword hits than min_stop_hits
    "top_word",       # most frequent word's share > max_top_word_frac
    "dup_words",      # repeated-token fraction > max_dup_word_frac
)


def vocab_topk(
    d: DataFrame, text_col: str = "text", k: int = 50
) -> DataFrame:
    """Corpus vocabulary heavy hitters: token → document frequency and
    total count, top-k by count (tie-broken on the token for
    determinism). The vocab-building / BPE-seeding pass.

    Scale shape: explode → ONE groupBy on the token (Catalyst's
    partial aggregation combines map-side, so the shuffle carries one
    row per distinct token per task, not per occurrence) → global
    top-k via TakeOrdered. Zipf skew is absorbed by the map-side
    combine — the hot token arrives pre-counted from each task."""
    toks = tokens_col(text_col)
    return (
        d.select(F.col("doc_id"), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def vocab_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): top-50 corpus vocabulary with
    occurrence and document frequencies."""
    d = load(spark, sf_dir, "documents")
    return vocab_topk(d)


def corpus_gates(
    d: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    min_chars: int = 100,
    min_stop_hits: int = 1,
    max_top_word_frac: float = 0.12,
    max_dup_word_frac: float = 0.9,
) -> DataFrame:
    """The corpus with one boolean ``f_<rule>`` column per quality
    rule (FILTER_RULES): length gates and stopword presence are pure
    expressions; the two repetition gates join the linear
    ``repetition_signals_for`` frame on doc_id. The repetition ratios
    are the 6-decimal-rounded signal values, so the gate thresholds
    compare identically on every engine."""
    toks = tokens_col(text_col)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    rep = repetition_signals_for(d, text_col).select(
        "doc_id", "n_words", "top_word_frac", "dup_word_frac"
    )
    return (
        d.join(rep, "doc_id")
        .withColumn("f_short_tokens", F.col("n_words") < min_tokens)
        .withColumn("f_short_chars", F.length(text_col) < min_chars)
        .withColumn("f_no_stopwords", stop_hits < min_stop_hits)
        .withColumn("f_top_word", F.col("top_word_frac") > max_top_word_frac)
        .withColumn("f_dup_words", F.col("dup_word_frac") > max_dup_word_frac)
        .drop("n_words", "top_word_frac", "dup_word_frac")
    )


def filter_corpus(d: DataFrame, text_col: str = "text", **thresholds) -> DataFrame:
    """User-facing quality filter: rows passing EVERY rule, original
    columns only. One linear repetition pass + one join — no collect,
    no UDF; the drop report comes from ``corpus_filter_summary``-style
    conditional aggregation over the same gated frame."""
    g = corpus_gates(d, text_col, **thresholds)
    keep = ~functools_reduce_or([F.col(f"f_{r}") for r in FILTER_RULES])
    return g.filter(keep).drop(*[f"f_{r}" for r in FILTER_RULES])


def functools_reduce_or(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def corpus_filter_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass filter report: total docs, per-rule failure counts
    (non-exclusive), kept count, and an order-free kept-set membership
    digest (sum + bit_xor of kept ids)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    g = corpus_gates(d)
    dropped = functools_reduce_or([F.col(f"f_{r}") for r in FILTER_RULES])
    rule_counts = [
        F.sum(F.col(f"f_{r}").cast("long")).alias(f"n_{r}") for r in FILTER_RULES
    ]
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        *rule_counts,
        F.sum((~dropped).cast("long")).alias("n_kept"),
        F.sum(F.when(~dropped, F.col("doc_id"))).cast("long").alias("kept_id_sum"),
        F.expr("bit_xor(CASE WHEN NOT (f_short_tokens OR f_short_chars OR "
               "f_no_stopwords OR f_top_word OR f_dup_words) THEN doc_id END)")
        .cast("long")
        .alias("kept_id_xor"),
    )


def pii_count_cols(text_col: str = "text"):
    """Per-pattern PII match-count columns plus the fully-redacted text
    column. Patterns apply in declared order on the progressively-
    redacted text, so a digit run inside an already-redacted email
    never double-counts. Shared by :func:`redact_pii` and
    :func:`document_attributes`."""
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, token)
    return counts, cur


def redact_pii(d, text_col: str = "text"):
    """Scrub PII-shaped spans from a text column (JVM-side
    ``regexp_replace`` chain — no UDF, one projection) and count what
    each pattern hit per doc; each ``n_<name>`` is the match count the
    corresponding replace actually performed."""
    counts, cur = pii_count_cols(text_col)
    return d.select("*", *counts, cur.alias("redacted"))


def document_attributes(
    d: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass per-document attribute table — the tag-once /
    filter-many pattern: a single corpus scan emits EVERY curation
    signal (length/token/punctuation stats, stopword ratio, language
    guess, PII counts, Gopher repetition fractions) as one row of
    scalars per document. Write this next to the corpus once; every
    subsequent curation decision — new thresholds, new rule
    combinations, ablation sweeps — re-filters the attributes table
    (tens of bytes/doc) and semi-joins doc_ids back, WITHOUT re-reading
    text. At 100 TB that turns each rule change from a corpus scan
    into a metadata query.

    Plan shape: one projection over the corpus (all pure JVM
    expressions, whatever the signal count) joined on doc_id with the
    single linear repetition pass — two shuffles total."""
    renamed = id_col != "doc_id"
    if renamed:
        d = d.withColumnRenamed(id_col, "doc_id")
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    counts, _ = pii_count_cols(text_col)
    base = d.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0)).alias(
            "n_punct"
        ),
        F.round(stop_hits.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(
            (F.length(text_col) - n_tokens + 1).cast("double") / n_tokens, 6
        ).alias("avg_word_len"),
        lang_guess_col(F.col(text_col)).alias("lang_guess"),
        *counts,
    )
    rep = repetition_signals_for(d, text_col).select(
        "doc_id", "top_word_frac", "dup_word_frac", "top_bigram_frac"
    )
    out = base.join(rep, "doc_id", "left")
    return out.withColumnRenamed("doc_id", id_col) if renamed else out


def corpus_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the full attributes table over the
    documents corpus, every signal column for every doc."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return document_attributes(d).orderBy("doc_id")
