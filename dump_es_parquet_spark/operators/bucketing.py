"""Bucketed (pre-shuffled) tables: the co-located join path.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Spark's bucketing pre-shuffles at WRITE time: a table written
``bucketBy(N, key)`` stores rows hash-partitioned into N files per
partition, and a join between two tables bucketed the same way on the
join key needs NO exchange at read time — each task zips bucket i with
bucket i. The write is one shuffle paid once; every subsequent join,
aggregation, or dedup keyed on the bucket column is exchange-free.

This is the engine's answer to SURVEY.md §4's "reuse a partitioning
across stages": dump once into bucketed form (``write_bucketed`` slots
in where ``sinks.write`` would), then run the whole analytics suite
against the bucketed tables.

Bucketed tables must go through the catalog (``saveAsTable``) — Spark
only trusts bucket metadata it wrote. ``path`` makes them external so
the data lands where the caller wants it, not in the warehouse dir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed catalog table.

    ``sort=True`` additionally sorts within buckets by the keys, which
    upgrades later merge joins to zero-sort as well (SortMergeJoin with
    both sort AND exchange elided)."""
    w = df.write.mode("overwrite").format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, keys[0], *keys[1:])
    if sort:
        w = w.sortBy(keys[0], *keys[1:])
    w.saveAsTable(name)


def cohorted_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.
    With matching bucket specs the physical plan has no Exchange on
    either side (verify with ``plan_has_no_exchange``)."""
    return spark.table(left).join(spark.table(right), on, how)


def plan_has_no_shuffle(df: DataFrame) -> bool:
    """True when the physical plan contains no *shuffle* exchange —
    the property bucketing buys. BroadcastExchange doesn't count: a
    broadcast moves one small side, not the data. (Inspects the
    pre-execution plan string; AQE can only remove exchanges later,
    never add them.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan.replace("BroadcastExchange", "")
