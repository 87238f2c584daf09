"""Corpus profiling — the "what's in this 100 TB pile" pass a
training-data pipeline runs before any curation decision: per-group
exact statistics (the oracle-checkable form) and MERGEABLE sketches
(the form that actually scales — pre-aggregate once per
partition/day/source, then any rollup is a cheap sketch merge, never a
re-scan).

Not in the reference (its analytics endgame is DuckDB over the dumped
parquet, ``/root/reference/README.md:99-103``); north-star extension
surface (SURVEY.md §2.2).

Sketches are Spark's built-in Apache DataSketches HLL
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``,
JVM-side, Tungsten-aggregated): binary, associative, storable in
parquet — the pre-aggregation contract. The exact profile keeps to
one shuffle (groupBy the profile key); exact percentiles sort within
groups, which is fine per-group but the documented scale path for
global quantiles is ``approx_percentile`` (also exposed here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load


def profile_exact(
    d: DataFrame, group_col: str, size_col: str, key_col: str
) -> DataFrame:
    """Exact per-group profile: counts, distinct keys, size moments and
    quartiles. One shuffle on ``group_col``; ``percentile`` is exact
    (per-group sort) — use :func:`profile_approx` when groups are
    100 TB-sized."""
    sz = F.col(size_col)
    return d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col(key_col)).alias("n_distinct_keys"),
        F.sum(sz).cast("bigint").alias("total_size"),
        F.min(sz).cast("bigint").alias("min_size"),
        F.max(sz).cast("bigint").alias("max_size"),
        F.round(F.avg(sz), 6).alias("avg_size_r6"),
        F.round(F.percentile(sz, F.lit(0.25)), 6).alias("p25_r6"),
        F.round(F.percentile(sz, F.lit(0.5)), 6).alias("p50_r6"),
        F.round(F.percentile(sz, F.lit(0.75)), 6).alias("p75_r6"),
    )


def profile_approx(
    d: DataFrame, group_col: str, size_col: str, key_col: str,
    accuracy: int = 10_000,
) -> DataFrame:
    """The scale form of :func:`profile_exact`: HLL distinct counts and
    approximate percentiles — partial-aggregatable everywhere, no
    per-group sort, bounded state per group."""
    sz = F.col(size_col)
    return d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.approx_count_distinct(F.col(key_col)).alias("n_distinct_keys"),
        F.sum(sz).cast("bigint").alias("total_size"),
        F.approx_percentile(sz, F.lit(0.5), F.lit(accuracy)).alias("p50"),
    )


def hll_sketches(
    d: DataFrame, group_col: str, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketch of the key column — the MERGEABLE distinct
    count. Store these in the lake next to the data; any union of
    groups (all sources, one language, last 30 days) is then
    ``hll_union_agg`` over a handful of kilobyte blobs instead of a
    corpus re-scan."""
    return d.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias(
            "key_sketch"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(sketches: DataFrame) -> DataFrame:
    """Merge per-group sketches to one global distinct estimate —
    the whole point of sketching: this touches len(groups) rows."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("key_sketch")).alias(
            "distinct_estimate"
        ),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def quantile_bins(
    d: DataFrame, score_col: str, n_bins: int = 5, exact: bool = True
) -> DataFrame:
    """Adds ``bin`` (1..n_bins): quantile-bucket the corpus by a score
    — the curriculum / quality-tier primitive ("train short→long",
    "mix 10% from the top quality decile"). Deliberately NOT
    ``F.ntile``: a global ntile is a single-partition window (dead at
    100 TB). Instead the standard two-pass histogram — pass 1 reduces
    the corpus to n_bins-1 edge values (exact ``percentile`` here;
    flip ``exact=False`` for ``approx_percentile`` when the score has
    unbounded cardinality), pass 2 assigns by comparison against the
    broadcast edges. Ties share a bin (stable under reordering, unlike
    ntile's row-split)."""
    score = F.col(score_col)
    pct = F.percentile if exact else (
        lambda c, p: F.approx_percentile(c, p, F.lit(10_000))
    )
    edges = d.agg(
        *[
            pct(score, F.lit(i / n_bins)).alias(f"_edge{i}")
            for i in range(1, n_bins)
        ]
    )
    bin_no = F.lit(1)
    for i in range(1, n_bins):
        bin_no = bin_no + F.when(score > F.col(f"_edge{i}"), 1).otherwise(0)
    return (
        d.crossJoin(F.broadcast(edges))
        .withColumn("bin", bin_no.cast("int"))
        .drop(*[f"_edge{i}" for i in range(1, n_bins)])
    )


def curriculum_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): length-curriculum bins of the
    documents corpus — 5 exact-quantile buckets by ``n_chars`` with
    per-bin accounting and membership digest."""
    d = load(spark, sf_dir, "documents")
    b = quantile_bins(d, "n_chars", n_bins=5)
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
            ).alias("membership_digest"),
        )
        .orderBy("bin")
    )


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): exact per-source profile of the
    documents corpus — row counts, distinct langs, char-length
    quartiles."""
    d = load(spark, sf_dir, "documents")
    return profile_exact(d, "source", "n_chars", "lang").orderBy("source")


def kll_sketches(
    d: DataFrame, group_col: str, value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL quantile sketch of a numeric column — the
    MERGEABLE quantile, completing the sketch family (HLL answers
    "how many distinct"; KLL answers "what is p50/p99"). Same lake
    contract: kilobyte blobs stored next to the data; any union of
    groups answers quantile queries by merging sketches, never
    re-scanning rows."""
    return d.groupBy(group_col).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(
            "value_sketch"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def kll_rollup(sketches: DataFrame, quantiles=(0.5, 0.9, 0.99)) -> DataFrame:
    """Merge per-group KLL sketches and read global quantiles — a
    len(groups)-row aggregation."""
    merged = F.kll_merge_agg_double("value_sketch")
    return sketches.agg(
        *[
            F.kll_sketch_get_quantile_double(merged, F.lit(q)).alias(
                f"p{int(q * 100)}"
            )
            for q in quantiles
        ],
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )


def theta_overlap(
    d: DataFrame, group_col: str, key_col: str, a, b
) -> DataFrame:
    """Mergeable SET algebra between two groups via Theta sketches:
    estimated |A|, |B|, |A∩B|, |A∪B|, |A∖B| of their key sets —
    distinct-overlap questions (shared users between sources, vocab
    intersection between shards) WITHOUT a join or re-shuffle of the
    raw keys. Sketch once per group; every pairwise question is then
    sketch-local."""
    sk = d.where(F.col(group_col).isin([a, b])).groupBy(group_col).agg(
        F.theta_sketch_agg(F.col(key_col).cast("string")).alias("s")
    )
    row_a = sk.where(F.col(group_col) == a).select(F.col("s").alias("sa"))
    row_b = sk.where(F.col(group_col) == b).select(F.col("s").alias("sb"))
    both = row_a.crossJoin(row_b)
    return both.select(
        F.theta_sketch_estimate("sa").cast("double").alias("n_a"),
        F.theta_sketch_estimate("sb").cast("double").alias("n_b"),
        F.theta_sketch_estimate(F.theta_intersection("sa", "sb"))
        .cast("double")
        .alias("n_intersection"),
        F.theta_sketch_estimate(F.theta_union("sa", "sb"))
        .cast("double")
        .alias("n_union"),
        F.theta_sketch_estimate(F.theta_difference("sa", "sb"))
        .cast("double")
        .alias("n_a_minus_b"),
    )


def sketch_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: every sketch family checked against its OWN exact
    answer inside one plan, reduced to engine-portable integers.

    Sketch estimates aren't SQL-portable to an external oracle, so the
    oracle contract is inverted: each row carries the metric name, the
    input row count, and ``within_bound`` — 1 iff the sketch estimate
    sits inside its published error envelope of the exact answer
    (computed in the same plan). The DuckDB oracle recomputes the
    portable columns and asserts ``within_bound = 1``, so a sketch
    drifting out of its error bound is a driver-visible hash mismatch,
    not just a pytest failure.

    Bounds used (all generous multiples of the published 1σ error):
    HLL lg_k=12 → ±5% on distincts; Theta default → ±5% on the
    intersection; KLL k=200 → the exact RANK of each estimated
    quantile within ±2% of its target rank (rank error is KLL's
    contract — value error is unbounded for heavy-tailed data)."""
    ev = load(spark, sf_dir, "events")

    n_input = ev.agg(F.count(F.lit(1)).cast("long").alias("n_input"))

    hll_est = hll_rollup(hll_sketches(ev, "event_type", "user_id")).select(
        F.col("distinct_estimate").cast("double").alias("hll_est")
    )
    exacts = ev.agg(
        F.count_distinct("user_id").cast("double").alias("hll_exact")
    )

    kll_est = kll_rollup(
        kll_sketches(ev, "event_type", "value"), quantiles=(0.5, 0.9, 0.99)
    ).select("p50", "p90", "p99")
    ranks = (
        ev.crossJoin(F.broadcast(kll_est))
        .agg(
            *[
                (
                    F.sum((F.col("value") <= F.col(c)).cast("int"))
                    / F.count(F.lit(1))
                ).alias(f"rank_{c}")
                for c in ("p50", "p90", "p99")
            ]
        )
    )

    # agg(max) guarantees ONE row even when an event type is absent
    # (theta_overlap's crossJoin of filtered groups yields 0 rows then,
    # which would otherwise collapse `wide` — and the whole result —
    # to empty instead of reporting the bound as failed)
    theta = theta_overlap(ev, "event_type", "user_id", "click", "purchase").agg(
        F.max("n_intersection").alias("theta_est")
    )
    ua = ev.where(F.col("event_type") == "click").select("user_id").distinct()
    ub = ev.where(F.col("event_type") == "purchase").select("user_id").distinct()
    exact_overlap = (
        ua.join(ub, "user_id").agg(F.count(F.lit(1)).cast("double").alias("theta_exact"))
    )

    wide = (
        n_input.crossJoin(F.broadcast(hll_est))
        .crossJoin(F.broadcast(exacts))
        .crossJoin(F.broadcast(ranks))
        .crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(exact_overlap))
    )

    kll_ok = None
    for c, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
        t = F.abs(F.col(f"rank_{c}") - F.lit(q)) <= F.lit(0.02)
        kll_ok = t if kll_ok is None else (kll_ok & t)

    def flag(ok: Column) -> Column:
        # NULL comparison (an estimate or exact side missing entirely)
        # reads as bound NOT satisfied — never a silently absent row
        return F.coalesce(ok.cast("int"), F.lit(0))

    # ONE metric row per array element, exploded from the single wide
    # row — a per-metric select-from-wide union would inline the whole
    # sketch pipeline (several scans of events) once per metric,
    # tripling the plan (the pre-round-8 form measured exchange=36).
    metrics = F.array(
        F.struct(
            F.lit("hll_user_distinct").alias("metric"),
            flag(
                F.abs(F.col("hll_est") - F.col("hll_exact"))
                <= 0.05 * F.col("hll_exact")
            ).alias("within_bound"),
        ),
        F.struct(
            F.lit("kll_value_quantile_ranks").alias("metric"),
            flag(kll_ok).alias("within_bound"),
        ),
        F.struct(
            F.lit("theta_user_overlap").alias("metric"),
            flag(
                F.abs(F.col("theta_est") - F.col("theta_exact"))
                <= 0.05 * F.col("theta_exact")
            ).alias("within_bound"),
        ),
    )
    return (
        wide.select(F.col("n_input"), F.explode(metrics).alias("m"))
        .select("m.metric", "n_input", "m.within_bound")
        .orderBy("metric")
    )
