"""Deterministic sampling & splits — the reproducibility primitive a
training-data pipeline needs: the same row lands in the same split on
every run, every engine, any cluster size.

No RNG anywhere: membership is a pure function of the row key via md5
(engine-portable, unlike xxhash64/rand). Sampling is a narrow
filter — fully pushdown-friendly, no shuffle, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load, one_slice_frame


def _hex_digit(h: Column, pos: int) -> Column:
    """md5 hex char at 1-based ``pos`` → its value 0-15, via ascii
    arithmetic ('0'-'9' = 48-57, 'a'-'f' = 97-102) — expressible
    identically in any SQL engine (no conv()/strtol dependency)."""
    a = F.ascii(F.substring(h, pos, 1))
    return a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))


def hash_bucket(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, buckets): first 4 md5 hex chars of
    the key (16 bits) mod buckets. Engine-portable; the 65536→buckets
    fold has a ≤0.2% non-uniformity — irrelevant for splits."""
    h = F.md5(key.cast("string"))
    val = (
        _hex_digit(h, 1) * 4096
        + _hex_digit(h, 2) * 256
        + _hex_digit(h, 3) * 16
        + _hex_digit(h, 4)
    )
    return (val % buckets).cast("long")


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — re-runs and
    different partitionings yield the identical sample. ``salt`` gives
    independent samples from the same keys."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return df.filter(hash_bucket(key) < int(fraction * 10_000))


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/'test') — disjoint,
    exhaustive, deterministic by key."""
    key = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    b = hash_bucket(key)
    val_hi = int(val_fraction * 10_000)
    test_hi = val_hi + int(test_fraction * 10_000)
    return df.withColumn(
        "split",
        F.when(b < val_hi, "val").when(b < test_hi, "test").otherwise("train"),
    )


def split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: deterministic split of the documents corpus +
    per-split accounting (the reproducible-split contract, checked
    exactly against the oracle)."""
    d = load(spark, sf_dir, "documents")
    s = train_val_test_split(d, "doc_id")
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.md5(F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))).alias(
                "membership_digest"
            ),
        )
        .orderBy("split")
    )


def stratified_sample(
    df: DataFrame, strata_col: str, key_col: str, fraction: float
) -> DataFrame:
    """EXACT per-stratum sampling: within each stratum, rank rows by
    md5(key) — a deterministic shuffle — and keep ``ceil(n_s ·
    fraction)``. Unlike ``deterministic_sample`` (expected fraction,
    zero shuffle), this guarantees the per-stratum count exactly: the
    balanced-mixture primitive for training-data recipes ("20% of each
    language"). Cost: one shuffle on the stratum key + window rank —
    the same plan class as any per-group top-k; skewed strata are the
    usual salting candidates."""
    from pyspark.sql.window import Window

    key = F.col(key_col).cast("string")
    w_rank = Window.partitionBy(strata_col).orderBy(F.md5(key), F.col(key_col))
    w_all = Window.partitionBy(strata_col)
    return (
        df.withColumn("_rk", F.row_number().over(w_rank))
        .withColumn("_n", F.count(F.lit(1)).over(w_all))
        .filter(F.col("_rk") <= F.ceil(F.col("_n") * F.lit(float(fraction))))
        .drop("_rk", "_n")
    )


def stratified_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form: 20% stratified sample of documents by language,
    with per-stratum counts and a membership digest (order-free,
    exact-set check against the oracle)."""
    d = load(spark, sf_dir, "documents")
    s = stratified_sample(d, "lang", "doc_id", 0.2)
    return (
        s.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
            ).alias("membership_digest"),
        )
        .orderBy("lang")
    )


def budget_mix(
    df: DataFrame,
    group_col: str,
    key_col: str,
    size_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Greedy deterministic mixing under per-group size budgets — the
    "recipe" primitive of a training run ("500 B tokens total: 40%
    web, 20% code, ..."): within each group, rank docs by md5(key) (a
    deterministic shuffle, so the prefix is an unbiased sample) and
    keep docs while the group's cumulative size has not yet reached
    its budget. The first doc to CROSS the budget is kept (budgets are
    floors, not ceilings — standard take-until semantics), so every
    group with data and a positive budget is non-empty.

    Cost: one shuffle on ``group_col`` for the running-sum window +
    a broadcast of the budget table. Same plan class as any per-group
    rank; hot groups are the usual salting candidates — but here the
    window is a running SUM, which AQE skew-split cannot break, so at
    100 TB the right mitigation is sub-grouping (hash the key into
    ``group || '#' || bucket`` with per-bucket budgets = budget/B).
    """
    from pyspark.sql.window import Window

    b = one_slice_frame(
        df.sparkSession,
        [(g, int(n)) for g, n in sorted(budgets.items())],
        f"{group_col} string, budget bigint",
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col)).over(w)
    return (
        df.join(F.broadcast(b), group_col)
        .withColumn("_cum", cum)
        .filter(F.col("_cum") - F.col(size_col) < F.col("budget"))
        .drop("_cum", "budget")
    )


# the pinned mixing recipe of the ``corpus_mix`` query: per-language
# shares of a global budget = half the corpus' characters
MIX_WEIGHTS = {"en": 0.4, "zh": 0.2, "de": 0.15, "es": 0.15, "fr": 0.1}
MIX_TOTAL_FRACTION = 0.5


def mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): mix the documents corpus to a
    fixed language recipe under a global character budget; report
    per-language kept counts, kept characters, the budget, and the
    membership digest."""
    d = load(spark, sf_dir, "documents")
    total = int(
        d.agg(F.sum("n_chars").cast("bigint").alias("t")).first()["t"]
    )  # one scalar to the driver — the recipe needs absolute budgets
    budgets = {
        g: int(w * MIX_TOTAL_FRACTION * float(total))
        for g, w in MIX_WEIGHTS.items()
    }
    kept = budget_mix(d, "lang", "doc_id", "n_chars", budgets)
    b = one_slice_frame(
        spark, sorted(budgets.items()), "lang string, budget bigint"
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
            ).alias("membership_digest"),
        )
        .join(F.broadcast(b), "lang")
        .select("lang", "n_kept", "chars_kept", "budget", "membership_digest")
        .orderBy("lang")
    )


def deterministic_shuffle(df: DataFrame, key_col: str, seed: str = "") -> DataFrame:
    """Seeded, engine-portable global shuffle — the order a training
    run reads the corpus in, reproducible across engines and cluster
    sizes: sort by ``md5(seed || key)``. At scale this is a range
    partition + per-partition sort (what ``orderBy`` plans), i.e. the
    shuffled corpus lands in globally-ordered files; a different
    ``seed`` is a fresh permutation."""
    h = F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    return df.withColumn("_shuffle_key", h).orderBy("_shuffle_key", key_col)


def shuffle_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query form (oracle-checked): the first 20 documents of the
    seeded shuffled corpus, with their shuffle rank — pins both the
    permutation and its order. ``orderBy().limit()`` plans
    TakeOrderedAndProject (no global sort materialized); the rank
    window then runs over 20 rows."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    head = (
        deterministic_shuffle(d, "doc_id", seed="epoch0")
        .select("doc_id", "lang", "_shuffle_key")
        .limit(20)
    )
    w = Window.orderBy("_shuffle_key", "doc_id")
    return (
        head.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "lang")
        .orderBy("rank")
    )


def temperature_summary(
    spark: SparkSession, sf_dir: str, total_fraction: float = 0.3
) -> DataFrame:
    """Temperature-reweighted mixture sampling (α = 0.5): stratum s
    gets a share ∝ √n_s of the sampled budget — the standard
    multilingual rebalancing (upsample tails, downsample heads)
    computed exactly and deterministically.

    Determinism notes (hash-gate grade): α is fixed at 0.5 because
    sqrt is IEEE-correctly-rounded in every engine (pow(x, α) is not);
    the √n normalizer sums as DECIMAL so aggregation order can't move
    a bit; shares divide as doubles (identical IEEE ops both sides);
    membership is the md5-ranked prefix per stratum, as in
    ``stratified_sample``."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    dec_sqrt = F.sqrt(F.col("n").cast("double")).cast("decimal(28,12)")
    t = c.agg(
        F.sum(dec_sqrt).cast("double").alias("z"),
        F.sum("n").cast("bigint").alias("total"),
    )
    k = (
        c.crossJoin(F.broadcast(t))
        .withColumn("share", dec_sqrt.cast("double") / F.col("z"))
        .withColumn(
            "keep",
            F.least(
                F.col("n"),
                F.ceil(
                    F.col("total").cast("double")
                    * F.lit(float(total_fraction))
                    * F.col("share")
                ),
            ),
        )
        .select("lang", "n", "keep")
    )
    w_rank = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rk", F.row_number().over(w_rank))
        .join(F.broadcast(k), "lang")
        .filter(F.col("rk") <= F.col("keep"))
        .groupBy("lang")
        .agg(
            F.max("n").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("doc_id")))
            ).alias("membership_digest"),
        )
        .orderBy("lang")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    n: int,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement, distributed: the
    Efraimidis–Spirakis A-ES scheme — each row draws a deterministic
    uniform u from md5(key, seed) and ranks by ``u^(1/w)``; the global
    top-``n`` keys is a weighted sample exactly distributed as
    sequential draws without replacement. One ``TakeOrderedAndProject``
    (per-partition heaps, n rows to the driver merge) — no shuffle of
    the corpus, no rejection loop.

    This is the quality-weighted subset op (sample by LM score,
    up-weight rare sources) the plain md5-fraction sampler cannot
    express. Deterministic and engine-portable in SET terms, but NOT
    given a SQL oracle: the rank passes through ``pow``, whose last-ulp
    rounding libms may disagree on, so the hash-exact gate would hinge
    on float formatting rather than semantics (cf. the integer-score
    choice in ``operators/lm.py``); the pytest suite pins determinism,
    exclusion of zero weights, and the inclusion-frequency ordering
    instead. Rows with weight <= 0 or NULL never sample."""
    u = _hex_fraction(F.md5(F.concat_ws("\x1f", F.col(key_col).cast("string"), F.lit(seed))))
    w = F.col(weight_col).cast("double")
    rank = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .withColumn("__aes_rank", rank)
        .orderBy(F.col("__aes_rank").desc(), F.col(key_col).asc())
        .limit(n)
        .drop("__aes_rank")
    )


def _hex_fraction(h: Column) -> Column:
    """md5 hex → uniform double in (0, 1): first 13 hex digits as a
    52-bit integer (exactly representable in a double) over 2^52, with
    a half-ulp offset so u is never exactly 0 (pow(0, x) = 0 would tie
    every zero-u row)."""
    frac = F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(
        float(1 << 52)
    )
    return frac + F.lit(0.5 / (1 << 52))


def weighted_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Grouped A-ES: the top-``k`` weighted sample WITHIN each group
    (k docs per source/language, weight-proportional). Same rank as
    ``weighted_sample``; selection becomes a per-group window prune —
    one shuffle on the group key, rows beyond ``k`` dropped before
    anything downstream."""
    from pyspark.sql.window import Window

    u = _hex_fraction(
        F.md5(F.concat_ws("\x1f", F.col(key_col).cast("string"), F.lit(seed)))
    )
    w = F.col(weight_col).cast("double")
    win = Window.partitionBy(*group_cols).orderBy(
        F.pow(u, F.lit(1.0) / w).desc(), F.col(key_col).asc()
    )
    return (
        df.where(w > 0)
        .withColumn("__rn", F.row_number().over(win))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
