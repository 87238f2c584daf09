"""SQL surface: run the engine through ``spark.sql``.

Everything in ``operators/`` is a DataFrame plan; Catalyst treats SQL
text and the DataFrame API identically, so registering the tables as
temp views gives users the full ANSI-SQL face for free — the same
downstream contract the reference delegates to DuckDB
(``dump-es-parquet`` README.md:99-103), but executed distributed in
Spark instead of single-node.

    register_tables(spark, sf_dir)
    spark.sql("SELECT l_returnflag, sum(l_quantity) FROM lineitem ...")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dump_es_parquet_spark.operators.tables import TABLES, load


def register_tables(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every testdata table as a temp view (optionally
    prefixed). Views are lazy — nothing is scanned until queried, and
    filters/projections in the SQL still push down to parquet."""
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register views, run the query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)


def esql_query(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot ES|QL convenience (round 15): the 8.11+ pipe
    language over the same lake tables the SQL face exposes —
    ``FROM`` names resolve to the testdata tables, so a saved ES|QL
    query replays with no setup:

        esql_query(spark, sf_dir,
                   "FROM events | WHERE value >= 100 "
                   "| STATS n = COUNT(*) BY t = event_type | SORT t")
    """
    from dump_es_parquet_spark.operators.esql import esql

    return esql({t: load(spark, sf_dir, t) for t in TABLES}, query)
