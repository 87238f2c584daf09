"""Release-privacy checks for structured columns.

Text PII is handled by the redaction chain (``text.redact_pii``);
STRUCTURED re-identification risk is a different failure mode: a
combination of quasi-identifier columns (age-ish buckets, region,
rare categorical values) can single out an individual even with all
direct identifiers removed. The standard release gate is k-anonymity:
every quasi-identifier combination must be shared by at least ``k``
rows.

One map-side-combined groupBy over the quasi-identifier tuple — the
same cost as any distinct-count — and the violating combinations come
back as a frame to inspect or anti-join away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Quasi-identifier combinations occurring fewer than ``k`` times:
    (quasi_cols..., n_rows). Empty frame ⇢ the release is k-anonymous
    over those columns."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .where(F.col("n_rows") < k)
    )


def enforce_k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Drop every row belonging to a sub-``k`` combination (suppression
    — the simplest conformance strategy; generalization/bucketing of
    the quasi columns retains more rows but is schema-specific). One
    shuffle: the violation set is aggregated, then anti-joined back."""
    bad = k_anonymity_violations(df, quasi_cols, k).select(*quasi_cols)
    return df.join(bad, quasi_cols, "left_anti")


def q_privacy_report(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Declared-surface form: k-anonymity over the customer table's
    (nation, market segment) quasi-identifiers — per-combination
    counts, violation flags, and the post-suppression row count."""
    from dump_es_parquet_spark.operators.tables import load

    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    quasi = ["c_nationkey", "c_mktsegment"]
    combos = c.groupBy(*quasi).agg(F.count("*").cast("long").alias("n_rows"))
    kept = enforce_k_anonymity(c, quasi, k)
    totals = kept.agg(
        F.count("*").cast("long").alias("n_kept_rows"),
        F.sum("c_custkey").cast("long").alias("kept_key_sum"),
    )
    return (
        combos.select(
            *quasi,
            "n_rows",
            (F.col("n_rows") < k).alias("violates_k"),
        )
        .crossJoin(F.broadcast(totals))
        .orderBy(*quasi)
    )
