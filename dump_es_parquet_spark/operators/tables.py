"""Table loading helpers for the TPC-H-ish testdata layout
(``TESTDATA.md``): one parquet per table under a scale-factor dir."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Defensive runtime confs: queries may run under a harness-owned
    session. UTC keeps date_trunc/unix_timestamp aligned with the
    (tz-naive) DuckDB oracle; nanosAsLong lets Spark 4 read the
    ns-precision events parquet (it rejects TIMESTAMP(NANOS) natively).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_ts(df)
    return df


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TIMESTAMP (with local tz)
    across testdata generations: ns-precision epochs arrive as long
    (``nanosAsLong``), µs parquet without the UTC annotation arrives as
    TIMESTAMP_NTZ (which e.g. ``withWatermark`` rejects). Under the
    session's pinned UTC zone the NTZ→TZ cast preserves wall-clock
    values, so both forms land on the exact same instants."""
    t = df.schema["ts"].dataType
    if isinstance(t, T.LongType):
        # ns epoch → µs timestamp; truncation matches DuckDB, whose
        # TIMESTAMP is µs and truncates ns parquet on read.
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if isinstance(t, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}
