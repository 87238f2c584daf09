"""Lake-side full-text retrieval over the dumped corpus: BM25 top-k
and hybrid lexical+vector fusion (reciprocal-rank fusion).

The reference tool dumps *Elasticsearch* indices — whose core query is
BM25 ``match`` — into parquet (dump-es-parquet:1-30, the scroll+dump
loop).  Once the data lives in the lake, users lose that search
capability; this module restores it Spark-side so the dumped corpus
stays queryable with the same ranking function ES would have used
(Lucene BM25: ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, tf
saturation with ``k1 = 1.2``, ``b = 0.75``).

Scale design (the part that matters at 100 TB):

- **Single query** (``bm25_topk``): NO inverted index and NO wide
  shuffle.  Pass 1 is one map-side-combined aggregate producing a
  single row — ``N``, ``total_dl``, and one ``df`` per query term
  (``array_contains`` over the token array, no explode).  The driver
  turns the handful of integers into ppm-scaled idf literals (a
  bounded collect: 2 + |terms| values).  Pass 2 is one narrow
  projection per document — ``tf`` via ``F.filter`` over the token
  array, again no explode — followed by TakeOrderedAndProject
  (per-partition heaps, no shuffle of the corpus).  Two linear scans
  of one string column, both whole-stage-codegen.
- **Query batches** (``bm25_topk_batch``): the classic shape — tokens
  explode into postings, but only AFTER a broadcast semi-join against
  the (tiny) query-term set, so the ``(term, doc)`` tf shuffle carries
  matching rows only.  Per-query top-k via a window over
  ``(query_id)`` partitions.  df/idf for the union of query terms is
  collected and converted driver-side exactly like the single-query
  path (bounded: one row per distinct query term), so both paths
  score bit-identically.
- **Hybrid RRF** (``hybrid_rrf``): fuse the BM25 ranking with the
  cosine ranking from ``operators.similarity`` using reciprocal-rank
  fusion, ``contrib = floor(1e9 / (60 + rank))``.  Ranks come from
  bounded candidate pools (top ``pool`` each side), so the rank
  windows run over ≤ ``pool`` rows — the corpus-side work stays the
  two scans above plus the similarity module's linear scan.

Cross-engine exactness (why the oracle hashes match): every score is
an INTEGER by construction.  idf_ppm is computed by the driver with
``math.log`` — CPython and DuckDB both call the platform libm, so
``floor(1e6 * ln(x) + 0.5)`` agrees bit-for-bit (pinned by a pytest
sweep over every df in the corpus); the tf-saturation factor is
evaluated with the SAME parenthesization in both engines over
exact-integer inputs, so the IEEE doubles are identical and the
per-term ``floor(idf * tsat)`` micro-scores — and their order-free
bigint sum — hash-match exactly.  No float ever reaches the output.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import (
    fan_out,
    load,
    one_slice_frame,
)

#: Lucene defaults. K1_PLUS_1 / ONE_MINUS_B are spelled as LITERALS —
#: never computed as ``K1 + 1.0`` — because the oracle SQL parses the
#: literal ``2.2`` and a computed ``1.2 + 1.0`` can round to a
#: different last ulp (the exact sum sits on a ties-to-even boundary).
K1 = 1.2
B = 0.75
K1_PLUS_1 = 2.2
ONE_MINUS_B = 0.25

#: RRF constant from the original paper (Cormack et al., 2009).
RRF_K = 60

#: fixed demo query for the oracle-checked query forms: one rare term
#: ("dup", df ≈ 5% of docs) and two common ones — exercises the idf
#: spread on the synthetic corpus.
DEFAULT_QUERY = "dup filter window"


#: the analyzer seam (PARITY #19, VERDICT r09 Next #8). 'whitespace'
#: is the default every existing oracle row runs under; 'standard' is
#: the ES standard-analyzer stand-in: lowercase + split on any
#: non-alphanumeric run (ASCII classes — no Unicode word-boundary
#: rules or possessive filters; documented divergences). Round 11
#: (VERDICT r10 Next #8) adds the dict spec ``{"type": "standard",
#: "stopwords": "_english_" | [...], "min_token_length": n}`` —
#: stopword removal (the Lucene English list for "_english_") and a
#: length-filter floor, applied AFTER tokenization to query and
#: document text identically. Query text and document text MUST go
#: through the same analyzer — `_terms` takes the same knob.
ANALYZERS = ("whitespace", "standard")

#: Lucene's public ENGLISH_STOP_WORDS_SET (StopAnalyzer /
#: EnglishAnalyzer default) — what ES "_english_" stopwords mean
ENGLISH_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with",
)


#: the seam's stemmer stage (round 12, VERDICT r11 Next #6): the
#: published Harman S-stemmer ("How Effective Is Suffixing?", JASIS
#: 1991) — the rule set behind Lucene/ES's ``minimal_english``
#: filter — expressed as three ordered regexp rules applied AFTER
#: stopword/length filters, identically to query and document text
#: (and spelled identically in the DuckDB oracle SQL). Full Porter
#: is NOT expressible without a UDF — documented bound, PARITY #19.
STEMMERS = ("minimal_english", "porter")


# --- the full Porter stemmer (round 13, VERDICT r12 Next #8) --------
# Porter, "An algorithm for suffix stripping", Program 14(3), 1980 —
# the published algorithm behind Lucene/ES's ``english``/``porter``
# stemmer filters. NOT expressible as a Catalyst expression (the
# measure function recurses over the word), so the column path runs
# it as an Arrow-BATCHED pandas UDF over the token arrays
# (ArrowEvalPython — the engine's allowed Python class; never
# row-at-a-time BatchEvalPython), and the driver-side query path
# calls the same Python function, so query and document text agree
# by construction. Cross-engine oracle note: DuckDB's fts extension
# (``stem(w, 'porter')``) is not installable in this container (no
# network), so there is no hash-checked oracle row for porter —
# the stemmer is pinned instead by the published algorithm's own
# vocabulary examples (tests/test_retrieval.py) and by the
# column-path ≡ python-twin randomized test. minimal_english stays
# the oracle-checked default.

_P_VOWELS = "aeiou"


def _p_is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _P_VOWELS:
        return False
    if c == "y":
        return i == 0 or not _p_is_cons(w, i - 1)
    return True


def _p_measure(w: str) -> int:
    """The number of VC sequences in ``w`` (Porter's m)."""
    m, i, n = 0, 0, len(w)
    while i < n and _p_is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _p_is_cons(w, i):
            i += 1
        if i == n:
            break
        m += 1
        while i < n and _p_is_cons(w, i):
            i += 1
    return m


def _p_has_vowel(w: str) -> bool:
    return any(not _p_is_cons(w, i) for i in range(len(w)))


def _p_ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if (
        _p_is_cons(w, len(w) - 3)
        and not _p_is_cons(w, len(w) - 2)
        and _p_is_cons(w, len(w) - 1)
    ):
        return w[-1] not in "wxy"
    return False


def _p_double_cons(w: str) -> bool:
    return (
        len(w) >= 2 and w[-1] == w[-2] and _p_is_cons(w, len(w) - 1)
    )


_P_STEP2 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"),
)
_P_STEP3 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)
_P_STEP4 = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
    "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
    "ous", "ive", "ize",
)


def porter_stem(w: str) -> str:
    """One lowercase token through the original Porter algorithm."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _p_measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _p_has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _p_has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _p_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _p_measure(w) == 1 and _p_ends_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _p_has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _P_STEP2:
        if w.endswith(suf):
            if _p_measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in _P_STEP3:
        if w.endswith(suf):
            if _p_measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in _P_STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _p_measure(stem) > 1:
                if suf == "ion" and (not stem or stem[-1] not in "st"):
                    break
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _p_measure(w[:-1])
        if m > 1 or (m == 1 and not _p_ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _p_measure(w) > 1 and _p_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _s_stem_py(t: str) -> str:
    """Driver-side (query text) twin of ``_s_stem_col``. The rules
    mirror Lucene's EnglishMinimalStemmer exactly: words under 3
    chars or not ending in 's' unchanged; "us"/"ss" endings exempt;
    ``Xies → Xy`` when the char before "ies" exists and is not a/e;
    other i/a/o/e-before-"es" endings exempt (they terminate — no
    fall-through to the plain strip); everything else drops the
    final 's'."""
    if len(t) < 3 or not t.endswith("s"):
        return t
    if t[-2] in ("u", "s"):
        return t
    if t[-2] == "e":
        if len(t) > 3 and t[-3] == "i" and t[-4] not in ("a", "e"):
            return t[:-3] + "y"
        if t[-3] in ("i", "a", "o", "e"):
            return t
    return t[:-1]


def _s_stem_col(x):
    """One token through the S-stemmer, as a Catalyst expression —
    the SAME ordered rules as ``_s_stem_py`` (exemption whens return
    the token unchanged so they cannot fall through to the strip)."""
    return (
        F.when(
            x.rlike(".ies$") & ~x.rlike("[ea]ies$"),
            F.regexp_replace(x, "ies$", "y"),
        )
        .when(x.rlike("[us]s$"), x)
        .when(x.rlike("[iaoe]es$"), x)
        .when(x.rlike("..s$"), F.regexp_replace(x, "s$", ""))
        .otherwise(x)
    )


from pyspark.sql.types import ArrayType, StringType


@F.pandas_udf(ArrayType(StringType()))
def _porter_tokens_udf(tok_arrays):
    """Arrow-batched Porter over token arrays: one pd.Series of
    lists in, one out — the vectorized (never row-at-a-time) shape
    the engine allows for Python stages."""
    return tok_arrays.map(
        lambda toks: None
        if toks is None
        else [porter_stem(t) for t in toks]
    )


def _analyzer_spec(analyzer) -> tuple[str, tuple, int, str | None]:
    """Normalize the seam knob: a bare string, or a dict carrying
    post-tokenization filters →
    (type, stopwords, min_token_length, stemmer)."""
    if isinstance(analyzer, str):
        return analyzer, (), 0, None
    typ = analyzer.get("type", "standard")
    stop = analyzer.get("stopwords", ())
    if stop == "_english_":
        stop = ENGLISH_STOPWORDS
    bad = [k for k in analyzer
           if k not in ("type", "stopwords", "min_token_length", "stemmer")]
    if bad:
        raise ValueError(f"analyzer spec key {bad[0]!r}")
    stemmer = analyzer.get("stemmer")
    if stemmer is not None and stemmer not in STEMMERS:
        raise ValueError(
            f"stemmer {stemmer!r}: one of {STEMMERS} (full Porter "
            "needs a UDF — PARITY #19)"
        )
    return (
        typ,
        tuple(stop),
        int(analyzer.get("min_token_length", 0)),
        stemmer,
    )


def _analyze(text: str, analyzer="whitespace") -> list[str]:
    """Driver-side analysis of QUERY text under the same rules as
    ``_tokens_col`` applies to documents."""
    typ, stop, minlen, stemmer = _analyzer_spec(analyzer)
    if typ == "whitespace":
        toks = [t for t in text.strip().split() if t]
    elif typ == "standard":
        import re as _re

        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
    else:
        raise ValueError(f"analyzer {typ!r}: one of {ANALYZERS}")
    toks = [t for t in toks if len(t) >= minlen and t not in stop]
    if stemmer == "porter":
        toks = [porter_stem(t) for t in toks]
    elif stemmer:
        toks = [_s_stem_py(t) for t in toks]
    return toks


def _terms(query: str, analyzer="whitespace") -> list[str]:
    """Analyzed query terms, first-occurrence order, deduplicated
    (a repeated query term must not double-count its score)."""
    out: list[str] = []
    for t in _analyze(query, analyzer):
        if t not in out:
            out.append(t)
    return out


def _idf_ppm(n_docs: int, df: int) -> int:
    """Lucene BM25 idf in parts-per-million: ``floor(1e6 * ln(1 +
    (N - df + 0.5)/(df + 0.5)) + 0.5)``.  Integer-exact across
    engines: the log argument is built from exact int/half arithmetic
    (identical doubles everywhere) and CPython's ``math.log`` and
    DuckDB's ``ln`` resolve to the same platform libm."""
    return math.floor(1e6 * math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)) + 0.5)


def _tokens_col(text_col, analyzer="whitespace"):
    """Tokenize a document text column under the analyzer spec.
    ``text_col`` is a column NAME or (round 12) a ``Column`` — the
    latter lets a ``nested`` query scope tokenize a struct element
    (``x["sub"]``), which has no name to resolve."""
    typ, stop, minlen, stemmer = _analyzer_spec(analyzer)
    src = text_col if isinstance(text_col, Column) else F.col(text_col)
    if typ == "whitespace":
        toks = F.split(F.trim(src), r"\s+")
    elif typ == "standard":
        # lowercase + split on non-alphanumeric runs; drop the empty
        # fragments leading/trailing separators produce
        toks = F.array_remove(
            F.split(F.lower(src), r"[^a-z0-9]+"), ""
        )
    else:
        raise ValueError(f"analyzer {typ!r}: one of {ANALYZERS}")
    if stop or minlen:
        def _keep(x):
            cond = F.lit(True)
            if minlen:
                cond = cond & (F.length(x) >= F.lit(minlen))
            if stop:
                cond = cond & ~x.isin(*stop)
            return cond

        toks = F.filter(toks, _keep)
    if stemmer == "porter":
        # full Porter (round 13): not a Catalyst expression — an
        # Arrow-BATCHED pandas UDF over the token arrays (shows as
        # ArrowEvalPython, the engine's allowed Python class; the
        # lint's BatchEvalPython ban is untouched). Same Python
        # function as the driver-side query path.
        toks = _porter_tokens_udf(toks)
    elif stemmer:
        # AFTER stop/length filters, like Lucene's chain order
        toks = F.transform(toks, _s_stem_col)
    return toks


def corpus_term_stats(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    analyzer: str = "whitespace",
) -> tuple[int, int, dict[str, int]]:
    """One map-side-combined aggregate → ``(N, total_dl, {term: df})``.
    The collect is a single row of ``2 + len(terms)`` integers."""
    toks = _tokens_col(text_col, analyzer).alias("toks")
    if isinstance(text_col, str):
        # starved-scan mitigation (guide §2.5): a single-row-group
        # corpus scan runs the whole tokenize+fold in ONE task
        # (measured 341 ms of corpus_hybrid_rrf's stats job at sf0.1);
        # fan_out spreads the partial aggregation across the executor
        # width and no-ops at production split counts
        docs = fan_out(docs, text_col)
    aggs = [
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size("toks")).cast("long").alias("total_dl"),
    ] + [
        F.sum(F.array_contains("toks", t).cast("long")).alias(f"df_{i}")
        for i, t in enumerate(terms)
    ]
    row = docs.select(toks).agg(*aggs).collect()[0]
    # F.sum over zero rows is NULL: coalesce so an empty corpus yields
    # (0, 0, {t: 0}) instead of None values that crash the callers
    dfs = {t: row[f"df_{i}"] or 0 for i, t in enumerate(terms)}
    return row["n_docs"], row["total_dl"] or 0, dfs


def _tsat(tf, dl, avgdl: float):
    """BM25 tf-saturation as a double-typed Column.  Parenthesization
    is load-bearing: the oracle SQL spells the identical tree
    ``(tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))`` so both
    engines round the same IEEE ops in the same order.  0.25 is the
    pre-folded ``1 - b`` (exact in binary); ``avgdl`` is the exact
    driver-computed ``total_dl / N`` double."""
    tf = tf.cast("double")
    dl = dl.cast("double")
    return (tf * F.lit(K1_PLUS_1)) / (
        tf + F.lit(K1) * (F.lit(ONE_MINUS_B) + F.lit(B) * (dl / F.lit(avgdl)))
    )


def bm25_scores(
    docs: DataFrame,
    query: str = DEFAULT_QUERY,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: str = "whitespace",
) -> DataFrame:
    """Per-document BM25 over ``query``: ``(id, dl, n_matched,
    score_micro)`` for every document matching ≥ 1 term.  Two linear
    scans, zero shuffles (see module docstring).  ``analyzer`` is the
    PARITY #19 seam — query and document text go through the same
    tokenizer."""
    terms = _terms(query, analyzer)
    n_docs, total_dl, dfs = corpus_term_stats(docs, terms, text_col, analyzer)
    # empty-corpus guard: the projection below yields zero rows anyway;
    # avgdl just needs to be a finite double so the plan builds
    avgdl = total_dl / n_docs if n_docs else 1.0
    idf = {t: _idf_ppm(n_docs, dfs[t]) for t in terms}

    d = docs.select(
        F.col(id_col), _tokens_col(text_col, analyzer).alias("toks")
    )
    dl = F.size("toks")
    # closure factory, NOT a defaulted-arg lambda: a 2-parameter
    # lambda is treated by F.filter as (element, index)
    def _eq(term):
        return lambda x: x == F.lit(term)

    tfs = [F.size(F.filter(F.col("toks"), _eq(t))) for t in terms]
    # per-term integer micro-score; tf = 0 ⇒ tsat = 0 ⇒ floor = 0, so
    # no special-casing — absent terms contribute exactly nothing
    scores = [
        F.floor(F.lit(float(idf[t])) * _tsat(tf, dl, avgdl)) for t, tf in zip(terms, tfs)
    ]
    score = scores[0]
    for s in scores[1:]:
        score = score + s
    matched = sum(((tf > 0).cast("int") for tf in tfs), F.lit(0))
    return (
        d.select(
            F.col(id_col),
            dl.alias("dl"),
            matched.alias("n_matched"),
            score.alias("score_micro"),
        )
        .where(F.col("n_matched") > 0)
    )


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    k: int = 10,
    analyzer: str = "whitespace",
) -> DataFrame:
    """Exact BM25 top-k for one query: scores projection +
    TakeOrderedAndProject (ties broken by doc_id for determinism)."""
    docs = load(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, query, analyzer=analyzer)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Many queries at once: ``queries`` is ``(query_id, query_text)``;
    returns per-query top-k ``(query_id, doc_id, score_micro, rank)``.

    Postings explode only AFTER a broadcast semi-join against the
    distinct query-term set, so the ``(term, doc)`` shuffle carries
    matching rows only.  The distinct term union is collected
    driver-side first (bounded: the queries frame is broadcast-sized
    by assumption, so its term union is too) — that lets df for every
    term fold into the SAME single map-side-combined corpus pass as
    ``N``/``total_dl`` (``corpus_term_stats``), so the postings frame
    is consumed exactly once (the scoring join) and nothing needs
    ``persist``.  idf is ppm-converted driver-side with the same
    ``math.log`` as the single path, so both paths score
    bit-identically."""
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("query_text")), r"\s+"))).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    terms = sorted({r["term"] for r in qterms.select("term").distinct().collect()})
    term_set = F.broadcast(
        one_slice_frame(docs.sparkSession, [(t,) for t in terms], "term string")
    )

    n_docs, total_dl, dfs = corpus_term_stats(docs, terms, text_col)
    avgdl = total_dl / n_docs if n_docs else 1.0

    d = docs.select(F.col(id_col), _tokens_col(text_col).alias("toks"))
    postings = (
        d.select(F.col(id_col), F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .join(term_set, "term")
        .groupBy("term", id_col, "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    idf_rows = [(t, float(_idf_ppm(n_docs, dfs[t]))) for t in terms if dfs[t] > 0]
    idf = F.broadcast(
        one_slice_frame(docs.sparkSession, idf_rows, "term string, idf_ppm double")
    )
    scored = (
        postings.join(idf, "term")
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "score_term",
            F.floor(F.col("idf_ppm") * _tsat(F.col("tf"), F.col("dl"), avgdl)),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("score_term").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def rank_eval(
    docs: DataFrame,
    queries: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The ES ``_rank_eval`` API lake-side: evaluate the BM25 ranking
    against labeled (query, doc, rating) judgments — the quality gate
    every retrieval deployment runs before trusting its index.
    ``queries`` is ``(query_id, query_text)``; ``ratings`` is
    ``(query_id, <id_col>, rating int)``. Returns one row per query:
    ``(query_id, n_retrieved, n_rel_topk, n_relevant, precision_r6,
    recall_r6, mrr_r6, dcg_r6, ndcg_r6)``.

    Metric definitions follow the ES endpoint: precision@k =
    relevant-retrieved / retrieved (ratings ≥ ``relevant_threshold``
    count as relevant); recall@k = relevant-retrieved / all-relevant;
    MRR = 1 / rank of the first relevant hit (0 when none); DCG@k =
    Σ (2^rating − 1) / log2(rank + 1) (the exponential form ES uses)
    with NDCG against the ideal ordering of that query's OWN
    judgments (rating desc, id asc — ties carry equal gain so the tie
    order cannot change the sum). Queries retrieving nothing still
    report a row of zeros, as the ES response does.

    Cross-engine exactness: the k discount values ``1/log2(rank+1)``
    are computed DRIVER-side with CPython ``math.log2`` and joined as
    literals — the same platform-libm argument as ``_idf_ppm`` — and
    every DCG term rounds to 9dp then sums through DECIMAL, so
    partial-agg order can't flip bits. Plan shape: one
    ``bm25_topk_batch`` (postings explode after a broadcast semi-join
    against the query-term set) + window/joins over frames bounded by
    |queries|·k and the judgment count — never the corpus."""
    spark = docs.sparkSession
    disc = F.broadcast(
        one_slice_frame(
            spark,
            [(r, 1.0 / math.log2(r + 1)) for r in range(1, k + 1)],
            "rank int, disc double",
        )
    )
    # F.shiftleft takes a literal bit count; the column form goes
    # through expr (integer-exact 2^rating, like DuckDB's 1 << rating)
    gain = (
        (F.expr("shiftleft(1, rating)") - F.lit(1)).cast("double")
        * F.col("disc")
    )
    dterm = F.round(gain, 9).cast("decimal(28,12)")
    rel = (F.col("rating") >= relevant_threshold).cast("int")

    ranked = bm25_topk_batch(docs, queries, k=k, text_col=text_col,
                             id_col=id_col)
    hits = (
        ranked.join(ratings, ["query_id", id_col], "left")
        .withColumn("rating", F.coalesce("rating", F.lit(0)))
        .join(disc, "rank")
    )
    per = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum(rel).cast("long").alias("n_rel_topk"),
        F.min(F.when(rel == 1, F.col("rank"))).alias("_first_rel"),
        F.sum(dterm).alias("_dcg_dec"),
    )
    wi = Window.partitionBy("query_id").orderBy(
        F.col("rating").desc(), F.col(id_col).asc()
    )
    ideal = (
        ratings.withColumn("rank", F.row_number().over(wi))
        .where(F.col("rank") <= k)
        .join(disc, "rank")
        .groupBy("query_id")
        .agg(F.sum(dterm).alias("_idcg_dec"))
    )
    totals = (
        ratings.where(F.col("rating") >= relevant_threshold)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_relevant"))
    )
    dcg = F.coalesce(F.col("_dcg_dec").cast("double"), F.lit(0.0))
    idcg = F.col("_idcg_dec").cast("double")
    return (
        queries.select("query_id")
        .join(per, "query_id", "left")
        .join(ideal, "query_id", "left")
        .join(totals, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
            F.coalesce("n_rel_topk", F.lit(0)).alias("n_rel_topk"),
            F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
            F.round(
                F.coalesce(
                    F.col("n_rel_topk") / F.col("n_retrieved"), F.lit(0.0)
                ),
                6,
            ).alias("precision_r6"),
            F.round(
                F.coalesce(
                    F.col("n_rel_topk") / F.col("n_relevant"), F.lit(0.0)
                ),
                6,
            ).alias("recall_r6"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first_rel"), F.lit(0.0)), 6
            ).alias("mrr_r6"),
            F.round(dcg, 6).alias("dcg_r6"),
            F.round(
                F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)), 6
            ).alias("ndcg_r6"),
        )
        .orderBy("query_id")
    )


def write_postings_store(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Materialize the inverted index — the build-once/serve-many
    artifact for repeated lake-side search (the same production shape
    as the MinHash signature store and the IVF index: sign/index once
    at ingest, every later query rides the artifact instead of
    re-scanning the corpus). Layout:

    - ``<path>/postings``: ``(term, doc_id, dl, tf)``, range-
      partitioned by ``term`` and term-sorted within files, so a
      query's ``term IN (…)`` filter prunes parquet row groups by
      min/max stats — a 3-term query reads a few row groups, not the
      index;
    - ``<path>/terms``: ``(term, df)`` — the df dictionary (bounded:
      one row per vocab term);
    - ``<path>/stats``: one row ``(n_docs, total_dl)``.

    df is derived FROM the written postings (one read-back aggregate),
    so the corpus explode runs exactly once."""
    spark = docs.sparkSession
    d = docs.select(F.col(id_col).alias("doc_id"), _tokens_col(text_col).alias("toks"))
    postings = (
        d.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .where(F.col("term") != "")
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    (
        postings.repartitionByRange("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/postings")
    )
    (
        spark.read.parquet(f"{path}/postings")
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .repartitionByRange("term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(f"{path}/terms")
    )
    (
        d.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("toks")).cast("long").alias("total_dl"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/stats")
    )


def cached_corpus_postings_store(spark: SparkSession, sf_dir: str) -> str:
    """Content-keyed postings store for the ``documents`` table under
    the system temp dir — the shared build-once lifecycle
    (:mod:`dump_es_parquet_spark.artifacts`: staged build + atomic
    rename + stale pruning), tagged by the source parquet's identity
    so regenerated testdata misses the old index."""
    import os

    from dump_es_parquet_spark.artifacts import cached_artifact, content_tag

    tag = content_tag(os.path.join(sf_dir, "documents.parquet"))

    def _build(stage: str) -> None:
        write_postings_store(load(spark, sf_dir, "documents"), stage)
        # marker LAST: the stats frame is the final piece the serving
        # path needs, but completeness is signalled separately
        with open(os.path.join(stage, "_SUCCESS"), "w"):
            pass

    return cached_artifact(
        f"spark_graft_postings_{tag}",
        "_SUCCESS",
        _build,
        stale_prefixes=("spark_graft_postings_",),
    )


def bm25_topk_from_store(
    spark: SparkSession,
    store: str,
    query: str = DEFAULT_QUERY,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k served FROM the materialized postings store —
    bit-identical scores to :func:`bm25_topk` (same driver-side
    ``math.log`` idf, same pinned tsat tree; the bigint per-term
    micro-scores are summed by a ``groupBy`` instead of a column sum,
    which is exact because bigint addition is associative).

    Serving cost: the ``term IN (query terms)`` filter reaches the
    parquet scan of the term-sorted postings (row-group min/max
    pruning — the 100 TB win: I/O ∝ matched postings, not corpus);
    the only shuffle is the groupBy over those matched rows, then
    TakeOrderedAndProject."""
    terms = _terms(query)
    srow = spark.read.parquet(f"{store}/stats").first()
    n_docs, total_dl = srow["n_docs"], srow["total_dl"] or 0
    avgdl = total_dl / n_docs if n_docs else 1.0
    # df dictionary rows for the query terms — bounded collect
    dfs = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{store}/terms")
        .where(F.col("term").isin(terms))
        .collect()
    }
    idf_rows = [
        (t, float(_idf_ppm(n_docs, dfs[t]))) for t in terms if dfs.get(t)
    ]
    idf = F.broadcast(
        one_slice_frame(spark, idf_rows, "term string, idf_ppm double")
    )
    postings = spark.read.parquet(f"{store}/postings").where(
        F.col("term").isin(terms)
    )
    scored = (
        postings.join(idf, "term")
        .withColumn(
            "score_term",
            F.floor(F.col("idf_ppm") * _tsat(F.col("tf"), F.col("dl"), avgdl)),
        )
        .groupBy("doc_id", "dl")
        .agg(
            F.count("*").cast("int").alias("n_matched"),
            F.sum("score_term").alias("score_micro"),
        )
    )
    return (
        scored.select("doc_id", "dl", "n_matched", "score_micro")
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_batch_from_store(
    spark: SparkSession,
    store: str,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """The batch path served from the materialized store: per-query
    top-k ``(query_id, doc_id, score_micro, rank)`` — scores
    bit-identical to :func:`bm25_topk_batch` (same driver idf, same
    tsat tree). The postings scan carries the ``term IN (term union)``
    pushdown, so store I/O is ∝ matched postings across ALL queries,
    read once and broadcast-joined to the (tiny) query-term rows."""
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.split(F.trim(F.col("query_text")), r"\s+"))).alias(
            "term"
        ),
    ).where(F.col("term") != "")
    terms = sorted({r["term"] for r in qterms.select("term").distinct().collect()})

    srow = spark.read.parquet(f"{store}/stats").first()
    n_docs, total_dl = srow["n_docs"], srow["total_dl"] or 0
    avgdl = total_dl / n_docs if n_docs else 1.0
    dfs = {
        r["term"]: r["df"]
        for r in spark.read.parquet(f"{store}/terms")
        .where(F.col("term").isin(terms))
        .collect()
    }
    idf_rows = [(t, float(_idf_ppm(n_docs, dfs[t]))) for t in terms if dfs.get(t)]
    idf = F.broadcast(
        one_slice_frame(spark, idf_rows, "term string, idf_ppm double")
    )
    postings = spark.read.parquet(f"{store}/postings").where(
        F.col("term").isin(terms)
    )
    scored = (
        postings.join(idf, "term")
        .join(F.broadcast(qterms), "term")
        .withColumn(
            "score_term",
            F.floor(F.col("idf_ppm") * _tsat(F.col("tf"), F.col("dl"), avgdl)),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("score_term").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def q_corpus_bm25_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the SAME oracle as ``corpus_bm25``
    answered from the materialized postings store — the build-once
    amortization is measurable in bench (direct vs served)."""
    store = cached_corpus_postings_store(spark, sf_dir)
    return bm25_topk_from_store(spark, store, DEFAULT_QUERY, k=10)


def hybrid_rrf(
    spark: SparkSession,
    sf_dir: str,
    query: str = DEFAULT_QUERY,
    query_vec_id: int = 0,
    k: int = 10,
    pool: int = 50,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking
    and the cosine ranking (``similarity.topk_bruteforce`` shape) —
    the standard first stage of a RAG ingestion/eval pipeline.

    ``contrib = floor(1e9 / (RRF_K + rank))`` per arm (exact-integer
    inputs ⇒ identical doubles ⇒ identical floors in both engines;
    a missing arm contributes 0), summed as bigints.  Each arm is
    first cut to its top-``pool`` candidates, so the rank windows —
    which have no partition key — run over ≤ ``pool`` driver-bounded
    rows, never the corpus."""
    from dump_es_parquet_spark.operators.similarity import cosine

    lex_pool = (
        bm25_scores(load(spark, sf_dir, "documents"), query)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(pool)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.col("score_micro").desc(), F.col("doc_id").asc()))
        .alias("lex_rank"),
    )

    e = load(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.where(F.col("vec_id") == query_vec_id).select(F.col("embedding").alias("qv"))
    )
    vec_pool = (
        e.crossJoin(q)
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(pool)
    )
    vec = vec_pool.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()))
        .alias("vec_rank"),
    )

    contrib = lambda r: F.coalesce(  # noqa: E731
        F.floor(F.lit(1e9) / (F.lit(rrf_k) + r.cast("double"))), F.lit(0)
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "vec_rank",
            (contrib(F.col("lex_rank")) + contrib(F.col("vec_rank"))).alias("rrf_micro"),
        )
        .orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def retriever_rrf(
    spark: SparkSession, sf_dir: str, request: dict
) -> DataFrame:
    """The ES 8.14+ ``retriever`` request section, ``rrf`` flavor
    (round 14): ``{"retriever": {"rrf": {"retrievers": [...],
    "rank_constant": c, "rank_window_size": w}}, "size": k}`` —
    the request-dialect surface over :func:`hybrid_rrf` (the
    corpus_bm25_served pattern: one engine, two surfaces). Exactly
    one ``standard`` retriever (its query a single ``match`` on the
    documents text column — the analyzed BM25 arm) and one ``knn``
    retriever (``query_vector_id`` naming the embeddings-table
    vector — the cosine arm) are supported; other retriever trees
    raise loudly. ``rank_constant`` defaults to ES's 60,
    ``rank_window_size`` to 50 per arm."""
    body = request.get("retriever") or {}
    if set(body) != {"rrf"}:
        raise ValueError("retriever: only the rrf flavor is supported")
    rrf = body["rrf"]
    arms = rrf.get("retrievers") or []
    std = [a["standard"] for a in arms if "standard" in a]
    knn = [a["knn"] for a in arms if "knn" in a]
    if len(std) != 1 or len(knn) != 1 or len(arms) != 2:
        raise ValueError(
            "retriever.rrf needs exactly one standard and one knn "
            "child retriever"
        )
    (qkind, qbody), = std[0]["query"].items()
    if qkind != "match":
        raise ValueError(
            "the standard retriever's query must be a match (the "
            "BM25 arm)"
        )
    (field, spec), = qbody.items()
    text = spec["query"] if isinstance(spec, dict) else spec
    if field != "text":
        raise ValueError("the BM25 arm matches the documents text column")
    if "query_vector_id" not in knn[0]:
        raise ValueError(
            "the knn arm takes query_vector_id (an embeddings-table "
            "vector; literal query_vector serving is search()'s knn "
            "section)"
        )
    return hybrid_rrf(
        spark,
        sf_dir,
        query=str(text),
        query_vec_id=int(knn[0]["query_vector_id"]),
        k=int(request.get("size", 10)),
        pool=int(rrf.get("rank_window_size", 50)),
        rrf_k=int(rrf.get("rank_constant", RRF_K)),
    )


def q_es_retriever_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the retriever.rrf dialect with
    NON-default knobs — rank_constant 40, window 30, size 8, query
    vector 3 — so the parameter plumbing is load-bearing, not an
    alias of the corpus_hybrid_rrf row."""
    return retriever_rrf(
        spark,
        sf_dir,
        {
            "retriever": {
                "rrf": {
                    "retrievers": [
                        {"standard": {"query": {"match": {
                            "text": DEFAULT_QUERY}}}},
                        {"knn": {"field": "embedding",
                                 "query_vector_id": 3}},
                    ],
                    "rank_constant": 40,
                    "rank_window_size": 30,
                }
            },
            "size": 8,
        },
    )


def q_corpus_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): BM25 top-10 for the fixed demo
    query over ``documents`` — integer micro-scores, see module
    docstring for the cross-engine exactness argument."""
    return bm25_topk(spark, sf_dir, DEFAULT_QUERY, k=10)


#: messy request text for the analyzer-seam oracle row: the standard
#: analyzer must normalize it to exactly the DEFAULT_QUERY terms.
MESSY_QUERY = "Dup, FILTER window!"


def q_corpus_bm25_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): BM25 top-10 under the ``standard``
    analyzer (PARITY #19 seam, VERDICT r09 Next #8) — the messy-cased,
    punctuated request text normalizes to the demo terms, and document
    text goes through the SAME lowercase+non-alnum-split tokenizer
    (mirrored in the DuckDB oracle)."""
    return bm25_topk(spark, sf_dir, MESSY_QUERY, k=10, analyzer="standard")


#: stopword-laden request text: under standard + _english_ +
#: min_token_length 2 it normalizes to the demo terms — and the
#: CORPUS token streams change too (the documents contain 'a'/'the'),
#: so dl/avgdl/scores genuinely differ from the plain standard row
STOPWORDS_QUERY = "The DUP of a Filter... into the Window!"

#: the round-11 analyzer spec (VERDICT r10 Next #8): standard
#: tokenizer + Lucene English stopwords + a 2-char length floor
STOPWORDS_ANALYZER = {
    "type": "standard",
    "stopwords": "_english_",
    "min_token_length": 2,
}


def q_corpus_bm25_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): BM25 under the full analyzer spec
    (round 11) — standard tokenizer, ``_english_`` stopwords, token
    length ≥ 2 — applied to query and documents identically. The
    stopword-laden request normalizes to the demo terms; document
    lengths shrink (the corpus carries 'a'/'the'), so every score
    differs from corpus_bm25_standard — the filters are load-bearing,
    mirrored token-for-token in the DuckDB oracle."""
    return bm25_topk(
        spark, sf_dir, STOPWORDS_QUERY, k=10, analyzer=STOPWORDS_ANALYZER
    )


#: plural-laden request text: under standard + minimal_english
#: stemming it normalizes to the demo terms — and the pluralized
#: document stream (see q_corpus_bm25_stemmed) re-joins the same
#: postings, so a broken stemmer visibly changes every score
STEMMED_QUERY = "Dups; FILTERS... windows!"

#: the round-12 analyzer spec (VERDICT r11 Next #6): standard
#: tokenizer + the Harman S-stemmer (Lucene minimal_english)
STEMMED_ANALYZER = {"type": "standard", "stemmer": "minimal_english"}


def q_corpus_bm25_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): BM25 under the stemming analyzer
    spec (round 12, VERDICT r11 Next #6) — standard tokenizer + the
    Harman S-stemmer (the `minimal_english` rule set), applied to
    query and documents identically. The synthetic corpus carries no
    plurals, so a third of the documents are deterministically
    PLURALIZED first (dup→dups, filter→filters, window→windows for
    doc_id % 3 == 0 — spelled identically in the DuckDB oracle);
    stemming maps them back onto the demo terms, so the stemmer is
    load-bearing for every score: without it those documents lose
    all their matches."""
    docs = load(spark, sf_dir, "documents")
    plural = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), "dup", "dups"),
            "filter",
            "filters",
        ),
        "window",
        "windows",
    )
    docs = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 3 == 0, plural).otherwise(F.col("text")),
    )
    return (
        bm25_scores(docs, STEMMED_QUERY, analyzer=STEMMED_ANALYZER)
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(10)
    )


#: the rank_eval demo request: three saved queries over the corpus
#: vocabulary, judged by a deterministic synthetic qrel (docs with
#: doc_id % 5 == query_id are judged, rating 1 + doc_id % 3, so every
#: query has relevant (≥2) and non-relevant (1) judgments).
RANK_EVAL_QUERIES = [
    (0, "dup filter window"),
    (1, "table hash"),
    (2, "scan merge sort"),
]


def q_corpus_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the ES ``_rank_eval`` API over the
    BM25 batch ranking — precision/recall/MRR/DCG/NDCG@10 for three
    saved queries against a deterministic synthetic qrel (threshold
    2). Also the batch BM25 path's first oracle row: DuckDB rebuilds
    each query's ranking from the same exact-integer statistics."""
    docs = load(spark, sf_dir, "documents")
    queries = one_slice_frame(
        spark, RANK_EVAL_QUERIES, "query_id long, query_text string"
    )
    qids = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("query_id")
    ratings = (
        docs.select(F.col("doc_id"), qids)
        .where(F.col("doc_id") % 5 == F.col("query_id"))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            "doc_id",
            (F.lit(1) + F.col("doc_id") % 3).cast("int").alias("rating"),
        )
    )
    return rank_eval(docs, queries, ratings, k=10, relevant_threshold=2)


def q_corpus_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): RRF fusion of BM25 and cosine
    rankings, top-10."""
    return hybrid_rrf(spark, sf_dir, DEFAULT_QUERY, query_vec_id=0, k=10)


def highlight(
    docs: DataFrame,
    query: str = DEFAULT_QUERY,
    k: int = 10,
    window: int = 30,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES-style ``highlight``: for the BM25 top-``k``, one snippet per
    matched query term — ``window`` chars of context either side of the
    term's first WHOLE-TOKEN occurrence, that occurrence wrapped in
    ``<em>`` tags, absent terms skipped — joined with `` … `` in
    query-term order.

    Token-boundary anchoring (VERDICT r08 What's wrong #1): the
    locator finds ``' '+term+' '`` in ``' '+text+' '`` — matching the
    whitespace tokenizer BM25 scores with — so a snippet can never
    anchor on a partial token ('dup' inside 'duplicate').  The found
    1-based position in the padded string IS the token's char start in
    the original text (the leading pad shifts everything by exactly
    one, the matched leading space eats the shift).  The tag is then
    spliced by position (pre ‖ <em>term</em> ‖ post) instead of a
    substring ``replace``, so exactly the located occurrence is tagged.

    Shape: the k-row top-k frame broadcast-joins back to the corpus
    scan (one extra linear scan, no shuffle), and the snippet logic is
    a pure string projection — ``locate``/``substr``/``concat`` only,
    each with identical 1-based/clamping semantics in DuckDB, so the
    oracle compares the rendered strings byte-for-byte."""
    terms = _terms(query)
    top = bm25_topk_like(docs, query, k, id_col=id_col, text_col=text_col)
    d = docs.select(F.col(id_col), F.col(text_col))
    joined = d.join(F.broadcast(top), id_col)

    return (
        joined.select(
            F.col(id_col),
            F.col("score_micro"),
            snippet_expr(text_col, terms, window).alias("highlights"),
        )
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
    )


def snippet_expr(text_col: str, terms: list[str], window: int = 30) -> Column:
    """The highlight splice as a reusable Column (shared by
    :func:`highlight` and the ``_search`` request's ``highlight``
    section): per term, ``window`` chars of context either side of
    the first WHOLE-TOKEN occurrence with that occurrence wrapped in
    ``<em>`` tags, absent terms skipped, fragments joined by `` … ``
    in term order. Pure ``locate``/``substr``/``concat`` — identical
    1-based/clamping semantics in DuckDB."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    frags = []
    for t in terms:
        # 1-based char start of the first whole-token occurrence in
        # the ORIGINAL text (0 if the token is absent) — see the
        # highlight() docstring for the pad/shift argument
        pos = F.locate(f" {t} ", padded)
        start = F.greatest(F.lit(1), pos - window)
        pre = F.col(text_col).substr(start, pos - start)
        post = F.col(text_col).substr(pos + F.lit(len(t)), F.lit(window))
        frags.append(
            F.when(
                pos > 0, F.concat(pre, F.lit(f"<em>{t}</em>"), post)
            ).otherwise(F.lit(None).cast("string"))
        )
    return F.concat_ws(" … ", *frags)


def bm25_topk_like(
    docs: DataFrame,
    query: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``bm25_topk`` over an arbitrary docs frame (the query-form
    ``bm25_topk`` loads from a sf_dir); returns ``(id, score_micro)``."""
    return (
        bm25_scores(docs, query, text_col=text_col, id_col=id_col)
        .select(F.col(id_col), "score_micro")
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )


def q_corpus_highlight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): ES-highlight parity — byte-exact
    snippet strings for the BM25 top-10."""
    return highlight(load(spark, sf_dir, "documents"), DEFAULT_QUERY, k=10)


#: fixed demo phrase for the oracle-checked query form — a bigram the
#: synthetic corpus actually repeats (~0.5% of docs).
DEFAULT_PHRASE = "table hash"


def phrase_occurrences(
    docs: DataFrame,
    phrase: str = DEFAULT_PHRASE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``match_phrase`` (slop 0) for ONE phrase: documents whose
    token stream contains the phrase terms CONSECUTIVELY, with the
    exact occurrence count — ``(doc_id, n_occurrences)``.

    Single-phrase scale shape (mirrors ``bm25_topk``): no inverted
    index, no explode, ZERO shuffles — one linear scan where each doc
    counts phrase starts by ``arrays_zip``-ing ``L`` shifted slices of
    its token array (position ``i`` of the zip holds tokens ``i..i+L-1``)
    and sizing an ``F.filter`` over the struct equality.  The slice/zip
    form replaced a ``sequence``+``element_at``-probe filter that was
    measured ~6× slower at sf0.1 (2.2 s → 0.38 s — the per-element
    array probing left codegen; slices+zip stay vectorized).  100 TB
    cost is the parquet scan of one string column.
    """
    terms = phrase.strip().split()
    L = len(terms)
    if not terms:
        raise ValueError("empty phrase")
    d = docs.select(F.col(id_col), _tokens_col(text_col).alias("toks"))

    # slice j (1-based start j+1) holds the phrase's j-th token for
    # every candidate start; short docs yield empty slices (length
    # clamped at 0) and therefore zero occurrences
    n_starts = F.greatest(F.size("toks") - (L - 1), F.lit(0))
    slices = [
        F.slice(F.col("toks"), j + 1, n_starts).alias(f"t{j}") for j in range(L)
    ]
    zipped = F.arrays_zip(*slices)

    def _match(s):
        cond = s["t0"] == F.lit(terms[0])
        for j, t in enumerate(terms[1:], 1):
            cond = cond & (s[f"t{j}"] == F.lit(t))
        return cond

    occ = F.size(F.filter(zipped, _match))
    return (
        d.select(F.col(id_col), occ.alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


def span_near_occurrences(
    docs: DataFrame,
    phrase: str = DEFAULT_PHRASE,
    slop: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``match_phrase`` with ``slop`` / ``span_near(in_order=true)``:
    documents where the phrase terms appear IN ORDER with total gap ≤
    ``slop`` — ``(doc_id, n_spans)`` where ``n_spans`` counts start
    positions from which an in-order assignment exists. ``slop=0``
    reduces exactly to :func:`phrase_occurrences` (consecutive terms).

    Matching rule (deterministic, greedy-minimal): from each
    occurrence ``p`` of the first term, each later term takes its
    SMALLEST position strictly after the previous term's; the span
    matches iff ``end − p ≤ (L−1) + slop``. Greedy minimizes the span
    end at every step, so greedy feasibility ⟺ existence of any
    in-order assignment for that start. Divergence from Lucene's
    sloppy phrase (documented like the tokenizer note): Lucene's slop
    pays per-term MOVE costs and allows out-of-order below the cost
    cap; this is the in-order ``span_near`` reading — the reproducible
    lake-side semantics.

    Scale shape: ZERO shuffles — one linear scan; per-term position
    arrays are BOUND ONCE PER ROW (VERDICT r09 What's wrong #1 — the
    earlier form re-derived each term's positions from the full token
    array inside every start candidate, going
    O(|starts| × L × |tokens|) on a doc stuffed with the first term).
    The binding lives INSIDE one expression: the L position arrays are
    packed into a struct routed through a singleton ``transform``
    lambda variable — a plain projection would be inlined back into
    the consumer by Catalyst's CollapseProject (measured: the
    projected form re-ran the token scan per start), while a lambda
    variable holds the materialized value.  The greedy chain is an
    unrolled ``array_min``/``filter`` nest over the bound arrays:
    O(L × |tokens|) to bind + O(Σ|pos_j|) per start candidate."""
    terms = phrase.strip().split()
    L = len(terms)
    if not terms:
        raise ValueError("empty phrase")
    if slop < 0:
        raise ValueError("slop must be >= 0")
    d = docs.select(F.col(id_col), _tokens_col(text_col).alias("toks"))

    def _positions(t):
        # (token, index) structs → filter by token → project 0-based index
        indexed = F.transform(
            F.col("toks"), lambda x, i: F.struct(x.alias("t"), i.alias("i"))
        )
        return F.transform(
            F.filter(indexed, lambda s: s["t"] == F.lit(t)),
            lambda s: s["i"],
        )

    # one-element array of a struct holding every term's position
    # array; the count runs inside the transform lambda, where struct
    # fields are bound values (computed exactly once per row)
    bound = F.array(
        F.struct(
            *[_positions(t).alias(f"p{j}") for j, t in enumerate(terms)]
        )
    )

    def _count_spans(s):
        def _next_after(poss, after):
            return F.array_min(F.filter(poss, lambda x: x > after))

        def _span_ok(p):
            end = p
            for j in range(1, L):
                end = _next_after(s[f"p{j}"], end)
            # NULL end (a term has no later occurrence) fails the filter
            return (end - p) <= F.lit(L - 1 + slop)

        return F.size(F.filter(s["p0"], _span_ok))

    occ = F.element_at(F.transform(bound, _count_spans), 1)
    return (
        d.select(F.col(id_col), occ.alias("n_spans"))
        .where(F.col("n_spans") > 0)
    )


def q_corpus_span_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the demo bigram at slop 1 —
    'table hash' plus 'table ? hash' — ordered by doc_id."""
    return span_near_occurrences(
        load(spark, sf_dir, "documents"), DEFAULT_PHRASE, slop=1
    ).orderBy("doc_id")


def match_phrase_batch(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Many phrases at once via POSITIONAL postings — the Lucene-shape
    plan: ``phrases`` is ``(phrase_id, phrase_text)``; returns
    ``(phrase_id, doc_id, n_occurrences)`` for every match.

    Scale shape: tokens posexplode into ``(term, doc, positions)``
    postings only AFTER a broadcast semi-join against the (tiny)
    phrase-term set, so the positions shuffle carries matching terms
    only; postings then EQUI-join the broadcast ``(phrase, offset,
    term)`` rows on ``term`` (VERDICT r08 What's wrong #2 — never a
    cross-pairing of every matched doc with every phrase term), so a
    doc only pairs with phrases it shares at least one term with.
    Each phrase intersects its terms' position arrays shifted by the
    term's offset (``array_intersect`` of ``pos(term_j) - j``) —
    occurrence starts survive every intersection; a (phrase, doc)
    pair missing any phrase term is dropped by the all-terms-present
    count BEFORE any array work.  One narrow shuffle keyed on
    (phrase, doc), all JVM.
    """
    split_terms = F.split(F.trim(F.col("phrase_text")), r"\s+")
    pterm = phrases.select(
        "phrase_id", F.posexplode(split_terms).alias("offset", "term")
    ).where(F.col("term") != "")
    # offsets per phrase, carried on every (phrase, offset, term) row:
    # the broadcast side is tiny, so the window costs nothing, and the
    # all-terms-present check below needs it post-join
    pterm = pterm.withColumn(
        "n_offsets", F.count("*").over(Window.partitionBy("phrase_id"))
    )
    term_set = pterm.select("term").distinct()

    postings = (
        docs.select(F.col(id_col), F.posexplode(_tokens_col(text_col)).alias("pos", "term"))
        .join(F.broadcast(term_set), "term")
        .groupBy(id_col, "term")
        .agg(F.array_sort(F.collect_list("pos")).alias("poss"))
    )
    # equi-join: one row per (doc, phrase, offset) where the doc
    # actually CONTAINS that offset's term — each such row survives
    # iff the doc has the term, so count == n_offsets ⇔ every phrase
    # term (at every offset) is present
    cand = postings.join(F.broadcast(pterm), "term").select(
        id_col,
        "phrase_id",
        "n_offsets",
        F.transform(F.col("poss"), lambda p: p - F.col("offset")).alias("starts_j"),
    )
    starts = (
        cand.groupBy("phrase_id", id_col)
        .agg(
            F.count("*").alias("n_present"),
            F.first("n_offsets").alias("n_offsets"),
            F.aggregate(
                F.collect_list("starts_j"),
                F.lit(None).cast("array<int>"),
                lambda acc, x: F.when(acc.isNull(), x).otherwise(
                    F.array_intersect(acc, x)
                ),
            ).alias("starts"),
        )
        .where(F.col("n_present") == F.col("n_offsets"))
    )
    return (
        starts.select(
            "phrase_id", id_col, F.size("starts").alias("n_occurrences")
        )
        .where(F.col("n_occurrences") > 0)
    )


def significant_terms(
    docs: DataFrame,
    fg_predicate,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    min_fg: int = 3,
    analyzer="whitespace",
) -> DataFrame:
    """ES ``significant_terms`` aggregation, lake-side: terms
    overrepresented in a FOREGROUND document set vs the whole corpus
    (the superset background, ES's default), scored with the JLH
    heuristic ES defaults to — ``(fg% − bg%) × (fg% / bg%)`` — and
    returned as the top-``k``: ``(term, fg_df, df, score_micro)``.
    The capability users lose when an index is dumped to parquet
    (PARITY #19 family, like BM25): "what terms characterize the
    documents matching this filter?".

    Scale shape: the word-count classic — per-doc DISTINCT terms
    explode into one map-side-combined ``groupBy(term)`` carrying two
    conditional counts (fg presence, total presence), so the single
    shuffle moves one row per distinct (partition, term). The corpus/
    foreground sizes are a one-row aggregate cross-joined back as
    broadcast DATA (the audited 1-row family — nothing collects).
    ``min_fg`` prunes the long tail before the top-k sort.

    Cross-engine exactness: fg_df/df/sizes are exact longs; both
    engines evaluate the SAME parenthesization ``1e6 * ((fg_df/F −
    df/B) * ((fg_df/F) / (df/B)))`` over long→double divisions, so
    the IEEE doubles — and the floored micro-score — match bit-form.
    """
    toks = F.array_distinct(_tokens_col(text_col, analyzer))
    d = docs.select(
        F.when(fg_predicate, 1).otherwise(0).alias("fg"), toks.alias("toks")
    )
    sizes = d.agg(
        F.sum("fg").cast("long").alias("fg_docs"),
        F.count("*").cast("long").alias("n_docs"),
    )
    terms = (
        d.select("fg", F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(
            F.sum("fg").cast("long").alias("fg_df"),
            F.count("*").cast("long").alias("df"),
        )
        .filter(F.col("fg_df") >= min_fg)
    )
    fgp = F.col("fg_df") / F.col("fg_docs")
    bgp = F.col("df") / F.col("n_docs")
    score = F.floor(F.lit(1e6) * ((fgp - bgp) * (fgp / bgp))).cast("long")
    return (
        terms.crossJoin(F.broadcast(sizes))
        .select("term", "fg_df", "df", score.alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("term").asc())
        .limit(k)
    )


def fuzzy_term_match(
    docs: DataFrame,
    term: str,
    max_edits: int = 1,
    prefix_length: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``fuzzy`` query lake-side: documents containing a token
    within ``max_edits`` edit distance of ``term`` — ``(doc_id,
    matched, n_occurrences)`` with ``matched`` the sorted distinct
    matching tokens. ``prefix_length`` mirrors ES's knob: the first
    ``p`` chars must match exactly (Lucene's index-prune trick, here a
    cheap guard that short-circuits the per-token distance call).

    Scale shape: ZERO shuffles — one linear scan; each doc filters its
    token array with a length guard (``|len(t) − len(term)| ≤ k``, a
    necessary condition of edit distance ≤ k) before ``levenshtein``,
    so the quadratic-in-token-length DP runs only on plausible tokens.

    PARITY divergence (documented like the tokenizer note): classic
    Levenshtein, not Lucene's Damerau variant — Spark has no
    transposition-aware builtin, and DuckDB's ``levenshtein`` matches
    Spark's exactly, which is what makes the oracle row possible. A
    transposition therefore costs 2 edits here vs 1 in ES."""
    if max_edits < 0:
        raise ValueError("max_edits must be >= 0")
    L = len(term)
    p = min(prefix_length, L)

    def _close(t):
        cond = F.abs(F.length(t) - L) <= max_edits
        if p:
            cond = cond & (t.substr(1, p) == F.lit(term[:p]))
        return cond & (F.levenshtein(t, F.lit(term)) <= max_edits)

    toks = _tokens_col(text_col)
    # space-joined (not an array column): the driver's hash gate
    # canonicalizes rows via a pandas sort, which rejects array cells
    matched = F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.filter(toks, _close)))
    )
    occ = F.size(F.filter(toks, _close))
    return (
        docs.select(F.col(id_col), matched.alias("matched"), occ.alias("n_occurrences"))
        .where(F.col("n_occurrences") > 0)
    )


#: fixed demo fuzzy term: one edit away from the corpus' 'hash'
FUZZY_TERM = "hask"


def q_corpus_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): docs with a token within 1 edit of
    'hask', ordered by doc_id."""
    return fuzzy_term_match(
        load(spark, sf_dir, "documents"), FUZZY_TERM, max_edits=1
    ).orderBy("doc_id")


def more_like_this(
    docs: DataFrame,
    like_id: int,
    k: int = 10,
    max_terms: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES ``more_like_this``: documents most similar to ``like_id``.
    ES's two-stage semantics reproduced lake-side: (1) select the
    source doc's ``max_terms`` most *interesting* terms — highest
    tf×idf within the source doc, ES's term-selection rule — then
    (2) rank the corpus by BM25 over that derived query, excluding
    the source doc: ``(doc_id, dl, n_matched, score_micro)``.

    Scale shape: stage 1 collects ONE document's distinct tokens
    (bounded) and reuses :func:`corpus_term_stats` — a single
    map-side-combined pass yields df for every source term alongside
    N/total_dl; selection is then pure driver arithmetic on a handful
    of integers. Stage 2 is the zero-shuffle ``bm25_scores``
    projection + TakeOrderedAndProject. Two linear scans total, same
    envelope as ``bm25_topk``.

    Cross-engine exactness: term selection ranks by the INTEGER
    product ``tf × idf_ppm`` (ties: term asc) — no floats — and the
    BM25 stage reuses the pinned micro-score tree, so the oracle can
    re-derive the same query terms relationally and hash-match."""
    src = (
        docs.filter(F.col(id_col) == like_id)
        .select(_tokens_col(text_col).alias("toks"))
        .first()
    )
    if src is None:
        raise ValueError(f"more_like_this: no document with {id_col}={like_id}")
    tf_in_doc: dict[str, int] = {}
    for t in src["toks"]:
        if t:
            tf_in_doc[t] = tf_in_doc.get(t, 0) + 1
    terms_all = sorted(tf_in_doc)
    n_docs, total_dl, dfs = corpus_term_stats(docs, terms_all, text_col)
    # interestingness = tf-in-source × idf (integer ppm); rarest-and-
    # repeated terms win, exactly ES's boostTerms-free default
    ranked = sorted(
        terms_all,
        key=lambda t: (-tf_in_doc[t] * _idf_ppm(n_docs, dfs[t]), t),
    )
    query = " ".join(ranked[:max_terms])
    return (
        bm25_scores(docs, query, text_col=text_col, id_col=id_col)
        .filter(F.col(id_col) != like_id)
        .orderBy(F.col("score_micro").desc(), F.col(id_col).asc())
        .limit(k)
    )


#: fixed demo source doc for the oracle-checked query form
MLT_DOC_ID = 42


def q_corpus_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the 10 documents most like doc 42
    under ES more_like_this semantics (top-10 tf×idf source terms →
    BM25, source excluded)."""
    return more_like_this(load(spark, sf_dir, "documents"), MLT_DOC_ID, k=10)


def q_corpus_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): top-20 significant terms of the
    ``source = 'src0'`` slice vs the whole corpus."""
    return significant_terms(
        load(spark, sf_dir, "documents"), F.col("source") == "src0", k=20
    )


def q_corpus_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): ``match_phrase`` occurrence counts
    for the fixed demo bigram, ordered by doc_id."""
    return phrase_occurrences(
        load(spark, sf_dir, "documents"), DEFAULT_PHRASE
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# suggesters (the _search "suggest" section)
# ---------------------------------------------------------------------------


def completion_suggest(
    docs: DataFrame,
    prefix: str,
    size: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ES completion suggester, lake-side: corpus terms starting with
    ``prefix``, ranked by document frequency (desc, term asc) —
    ``(term, df)``.

    Scale shape: the vocab classic — per-doc DISTINCT terms explode
    into one map-side-combined ``groupBy(term)``; the prefix filter
    runs BEFORE the explode output reaches the shuffle (on the
    exploded column), so the exchange carries one row per distinct
    matching (partition, term). Top-``size`` is a TakeOrdered."""
    toks = F.array_distinct(_tokens_col(text_col))
    return (
        docs.select(F.explode(toks).alias("term"))
        .where(F.col("term").startswith(prefix))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(size)
    )


def term_suggest(
    docs: DataFrame,
    term: str,
    max_edits: int = 1,
    size: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """ES term suggester: spelling corrections for ``term`` from the
    corpus vocabulary within ``max_edits`` (classic Levenshtein — the
    PARITY #19 fuzzy caveat applies), the exact input excluded,
    ranked the way ES ranks candidates: distance asc, then document
    frequency desc, then term asc — ``(suggestion, distance, df)``.

    Scale shape: one vocab groupBy (map-side combined); the
    length-guarded distance runs on the POST-aggregate vocabulary
    (one row per distinct term), not per occurrence."""
    L = len(term)
    toks = F.array_distinct(_tokens_col(text_col))
    vocab = (
        docs.select(F.explode(toks).alias("suggestion"))
        .groupBy("suggestion")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    s = F.col("suggestion")
    return (
        vocab.where(
            (F.abs(F.length(s) - L) <= max_edits) & (s != term)
        )
        .withColumn(
            "distance", F.levenshtein(s, F.lit(term)).cast("int")
        )
        .where(F.col("distance") <= max_edits)
        .orderBy(
            F.col("distance").asc(), F.col("df").desc(), s.asc()
        )
        .limit(size)
    )


def phrase_suggest(
    docs: DataFrame,
    text: str,
    max_edits: int = 1,
    per_token: int = 5,
    size: int = 5,
    text_col: str = "text",
    product_cap: int = 10_000,
) -> DataFrame:
    """ES phrase suggester ("did you mean" over multi-word input —
    round 14, VERDICT r13 Next #6): per-token candidates from the
    corpus vocabulary within ``max_edits`` (the term_suggest
    machinery, the original token included at distance 0 when it
    exists), re-ranked as whole phrases by a corpus BIGRAM language
    model with stupid backoff — ES's default smoothing (discount
    0.4; ``direct_generator``/``confidence`` knobs bound to these
    defaults). Returns ``(rank, suggestion, score_micro)``.

    Score (the documented log-space reading, libm discipline):
    ``score = Σ_i round(ln(p_i), 12)`` floored to micro longs, with
    ``p_0 = c1(w_0)/T`` and for i>0 ``p_i = c2(w_{i-1},w_i) /
    c1(w_{i-1})`` when the bigram exists, else ``0.4·c1(w_i)/T`` —
    c1/c2 = corpus unigram/adjacent-bigram occurrence counts, T =
    total tokens. Candidates are vocabulary terms only, so every
    factor is positive; a position with NO candidate within
    ``max_edits`` yields the empty frame (no phrase can be formed).
    Divergence from ES proper (PARITY #19's suggester family):
    candidates rank by occurrence count (ES: shard frequency),
    Levenshtein is classic (no transposition), and the error model
    is uniform — the re-rank carries the signal.

    Scale shape (round 15, the VERDICT r14 `weak` fix): exactly TWO
    Spark actions — one vocab groupBy (map-side combined) feeding a
    position-tagged candidate collect that carries the corpus total
    as its ``pos = -1`` branch (``per_token·L + 1`` rows), and one
    bigram groupBy filtered to the union of candidate pairs BEFORE
    the shuffle (at most ``(L-1)·per_token²`` collected rows — the
    rule-frame class). With every count driver-local, inputs whose
    candidate combination count fits ``product_cap`` score
    DRIVER-SIDE with the identical IEEE ops (plain double division,
    12dp-rounded libm log — CPython shares DuckDB's libm, the
    _idf_ppm precedent) and return as a pure literal page: zero
    scoring jobs. Inputs beyond the cap take a Spark BEAM, pruned
    position by position — the running prefix frame keeps the
    top-``max(size, per_token)`` prefixes PER LAST WORD (Viterbi
    k-best: the suffix score depends only on the last word, so any
    pruned prefix is dominated by a kept one with the same last word
    under the same completions), so the frame is never larger than
    ``beam·per_token`` rows and the r14 UNBOUNDED ``per_token^L``
    driver product (the scale-killer) cannot recur — the cap gates
    enumeration before it starts. Beam exactness holds up to one
    documented edge: pruning compares raw 12dp-rounded prefix
    scores, so two FINAL phrases whose totals differ but collide on
    the same micro floor could tie-break differently than the full
    product would — a sub-1e-6 collision class the suggester's
    ranking contract does not promise through. Inputs longer than
    32 tokens raise loudly (the holt window-cap precedent; work is
    linear in L but bounded per position)."""
    terms = text.strip().split()
    L = len(terms)
    if L < 2:
        raise ValueError("phrase_suggest needs a multi-word input")
    if L > 32:
        raise ValueError(
            f"phrase_suggest input has {L} tokens; the documented "
            "bound is 32 (one candidate collect + one beam step per "
            "position — split longer text upstream)"
        )
    out_schema = "rank int, suggestion string, score_micro long"
    spark = docs.sparkSession
    toks = _tokens_col(text_col)
    tf = (
        docs.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c1"))
    )
    # the vocab frame feeds 2 actions (the total + the ONE
    # position-tagged candidate collect below) — persist so the
    # corpus tokenize + word count shuffle runs ONCE, not per action
    # (review finding); vocabulary-sized, released before the
    # scoring plan returns
    from pyspark import StorageLevel

    tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE candidate action for ALL positions AND the total (round 15
    # perf pass — the r14 shape ran one collect per position plus a
    # total action): a position-tagged union over the persisted
    # vocab, ranked per position by the same (distance asc, count
    # desc, word asc) rule, with the corpus token total riding as
    # the pos = -1 branch; the collect is per_token·L + 1 rows — the
    # rule-frame class
    cand_union = tf.agg(F.sum("c1").cast("long").alias("c1")).select(
        F.lit(-1).alias("pos"),
        F.lit(None).cast("string").alias("w"),
        "c1",
        F.lit(0).alias("d"),
    )
    for i, t in enumerate(terms):
        f = (
            tf.where(F.abs(F.length("w") - len(t)) <= max_edits)
            .withColumn(
                "d", F.levenshtein(F.col("w"), F.lit(t)).cast("int")
            )
            .where(F.col("d") <= max_edits)
            .select(F.lit(i).alias("pos"), "w", "c1", "d")
        )
        cand_union = cand_union.unionByName(f)
    rw = Window.partitionBy("pos").orderBy(
        F.col("d").asc(), F.col("c1").desc(), F.col("w").asc()
    )
    crows = (
        cand_union.withColumn("_rk", F.row_number().over(rw))
        .where(F.col("_rk") <= per_token)
        .select("pos", "_rk", "w", "c1")
        .collect()
    )
    tf.unpersist()  # candidates collected; the scoring plan below
    # reads only literal frames
    total = next(
        (r.c1 for r in crows if r.pos == -1 and r.c1 is not None), 0
    )
    cands: list[list[tuple[str, int]]] = [[] for _ in range(L)]
    for r in sorted(
        (r for r in crows if r.pos >= 0), key=lambda r: (r.pos, r._rk)
    ):
        cands[r.pos].append((r.w, r.c1))
    if any(not c for c in cands):
        # a position with no candidate within max_edits: no phrase
        # can be formed
        return spark.createDataFrame([], out_schema)
    # adjacent-bigram counts in ONE action (round 15 — was one
    # groupBy per position inside the scoring plan): pre-filtered to
    # the union of the per-step candidate pairs so the word-count
    # shuffle is candidate-sized, then collected — the result is at
    # most (L-1)·per_token² rows (the rule-frame class), and folding
    # it into the literal transition frames leaves the scoring plan
    # with NO aggregation at all (pure literal joins + tiny windows)
    n1 = F.greatest(F.size("_t") - F.lit(1), F.lit(0))
    pairs = (
        docs.select(toks.alias("_t"))
        .where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("_t", F.lit(1), n1).alias("w1"),
                    F.slice("_t", F.lit(2), n1).alias("w2"),
                )
            ).alias("_p")
        )
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    pair_pred = None
    for i in range(1, L):
        prevs = sorted({c[0] for c in cands[i - 1]})
        curs = sorted({c[0] for c in cands[i]})
        p = F.col("w1").isin(prevs) & F.col("w2").isin(curs)
        pair_pred = p if pair_pred is None else pair_pred | p
    bg = {
        (r.w1, r.w2): r.b
        for r in pairs.where(pair_pred)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("b"))
        .collect()
    }
    # SMALL inputs (the overwhelmingly common suggest call): with
    # candidates, bigram counts and the total all collected (each
    # rule-frame-bounded), the whole stupid-backoff product scores
    # DRIVER-SIDE — the same IEEE ops (plain double division,
    # 12dp-rounded libm log; CPython shares DuckDB's libm, the
    # _idf_ppm precedent) — and the result page returns as a pure
    # literal frame: zero scoring jobs. The combination count is
    # bounded by product_cap before enumerating, so the r14
    # exponential driver blow-up cannot recur; LARGE inputs take the
    # Spark beam below.
    n_combos = 1
    for c in cands:
        n_combos *= len(c)
        if n_combos > product_cap:
            break
    if n_combos <= product_cap:
        import itertools
        import math

        def _score(pick) -> int:
            s = round(math.log(pick[0][1] / total), 12)
            for (w1, c1a), (w2, c2a) in zip(pick, pick[1:]):
                b = bg.get((w1, w2))
                if b is not None:
                    s += round(math.log(b / c1a), 12)
                else:
                    s += round(math.log(0.4 * c2a / total), 12)
            return math.floor(1e6 * s)

        page = sorted(
            (
                (_score(p), " ".join(w for w, _ in p))
                for p in itertools.product(*cands)
            ),
            key=lambda t: (-t[0], t[1]),
        )[:size]
        return one_slice_frame(
            spark,
            [(i + 1, sugg, micro) for i, (micro, sugg) in enumerate(page)],
            out_schema,
        )
    # beam search over positions: the prefix frame carries (phrase,
    # last, lastc, score) and never exceeds beam·per_token rows
    beam = max(size, per_token)
    tt = F.lit(total).cast("double")
    ph = one_slice_frame(spark, cands[0], "w string, wc long").select(
        F.col("w").alias("phrase"),
        F.col("w").alias("last"),
        F.col("wc").alias("lastc"),
        F.round(F.log(F.col("wc").cast("double") / tt), 12).alias(
            "score"
        ),
    )
    for i in range(1, L):
        prevs = sorted({c[0] for c in cands[i - 1]})
        # transition frame: (prev, w, wc, b) literal product with the
        # collected bigram count folded in — the per-STEP product is
        # per_token² rows (bounded), unlike the r14 per_token^L
        # phrase product, and carrying `b` as a literal leaves the
        # scoring plan with no aggregation (one equi-key broadcast
        # hash join + one tiny window per step)
        trans = one_slice_frame(
            spark,
            [
                (pw, w, wc, bg.get((pw, w)))
                for pw in prevs
                for w, wc in cands[i]
            ],
            "prev string, w string, wc long, b long",
        )
        step = ph.join(
            F.broadcast(trans), F.col("last") == F.col("prev"), "inner"
        )
        p = F.when(
            F.col("b").isNotNull(),
            F.col("b").cast("double") / F.col("lastc").cast("double"),
        ).otherwise(F.lit(0.4) * F.col("wc").cast("double") / tt)
        ph = step.select(
            F.concat_ws(" ", "phrase", "w").alias("phrase"),
            F.col("w").alias("last"),
            F.col("wc").alias("lastc"),
            (F.col("score") + F.round(F.log(p), 12)).alias("score"),
        )
        bw = Window.partitionBy("last").orderBy(
            F.col("score").desc(), F.col("phrase").asc()
        )
        ph = (
            ph.withColumn("_bk", F.row_number().over(bw))
            .filter(F.col("_bk") <= beam)
            .drop("_bk")
        )
    return (
        ph.select(
            F.col("phrase").alias("suggestion"),
            F.floor(F.lit(1e6) * F.col("score")).cast("long").alias(
                "score_micro"
            ),
        )
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(
                    F.col("score_micro").desc(),
                    F.col("suggestion").asc(),
                )
            ).cast("int"),
        )
        .filter(F.col("rank") <= size)
        .select("rank", "suggestion", "score_micro")
        .orderBy("rank")
    )


def q_es_suggest_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): 'the sart aig' — two misspelled
    tokens whose vocabulary neighborhoods are AMBIGUOUS ('sart' is
    one edit from both 'sort' and 'part', 'aig' from both 'agg' and
    'big'), so the bigram re-rank over the four candidate phrases is
    load-bearing, with 'the' pinning the distance-0 identity path."""
    from .tables import load

    return phrase_suggest(
        load(spark, sf_dir, "documents"), "the sart aig", max_edits=1
    )


def q_es_suggest_completion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: completion suggestions for the prefix 's'."""
    from .tables import load

    return completion_suggest(load(spark, sf_dir, "documents"), "s", size=10)


def q_es_suggest_term(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: spelling corrections for 'port' (1 edit) — both
    ``sort`` and ``part`` are a substitution away, so the result
    exercises the ES candidate order's df-desc tie-break."""
    from .tables import load

    return term_suggest(load(spark, sf_dir, "documents"), "port", max_edits=1)
