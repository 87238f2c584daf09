"""Skew-handling utilities (SURVEY.md §4 / 100 TB design stance).

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on by default in ``session.get_spark``) handles most skew at runtime.
These helpers cover the cases it can't:

- ``salted_join``: hot-key equi-join — the big side gets a
  deterministic salt, the small side is replicated once per salt, the
  join key becomes (key, salt) so one hot key spreads over N tasks.
  Use when the build side is small enough to replicate ×N but too big
  to broadcast outright.
- ``salted_distinct_count``: two-phase distinct aggregation for a
  hot group key whose distinct-set would otherwise assemble in one
  task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key salting pattern. The salt derives
    from the row's *position* — ``xxhash64(spark_partition_id(),
    monotonically_increasing_id())`` — not its content: hashing column
    values would give byte-identical duplicate rows (the common shape
    of a hot key) the same salt and leave them on one task. Positional
    salting spreads even identical rows, stays RNG-free, and is
    deterministic within a task attempt (each retry re-derives the
    same per-partition ordinals)."""
    salt = F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(salts),
    ).cast("int")
    bs = big.withColumn("_salt", salt)
    ss = small.crossJoin(
        small.sparkSession.range(salts).select(F.col("id").cast("int").alias("_salt"))
    )
    return bs.join(ss, on=on + ["_salt"], how=how).drop("_salt")


def salted_distinct_count(
    df: DataFrame, group_key: str, distinct_col: str, salts: int = 16
) -> DataFrame:
    """count(DISTINCT x) per group for skewed groups: phase 1 distincts
    within (group, salt) partitions, phase 2 sums partial distinct
    counts — each salt bucket holds a disjoint slice of the distinct
    values (salt is derived from the value), so the sum is exact."""
    salt = F.pmod(F.xxhash64(F.col(distinct_col)), F.lit(salts)).cast("int")
    return (
        df.select(group_key, F.col(distinct_col), salt.alias("_salt"))
        .groupBy(group_key, "_salt")
        .agg(F.countDistinct(distinct_col).alias("_partial"))
        .groupBy(group_key)
        .agg(F.sum("_partial").alias(f"n_distinct_{distinct_col}"))
    )
