"""As-of join — a temporal operator Spark's DataFrame API lacks
(SURVEY.md §2.2: "custom operators ... as a composition of existing
DataFrame ops if semantics allow").

``asof_join(left, right, ...)`` attaches to each left row the most
recent right row with the same key and ``right_time <= left_time``.

Physical shape (the scalable formulation — no per-row subqueries, no
range-exploded join):

1. tag and union both inputs on a common (key, time) spine
2. one shuffle: window partitioned by key, ordered by (time, tag) —
   right rows sort before left rows at equal times so an exact-tie
   right row is visible to the left row
3. ``last(right_payload, ignorenulls=True)`` over the running frame
   carries the latest right payload forward; left rows then project it

Cost: one shuffle + one sort — identical to a window aggregate, and it
scales exactly like one (AQE-sized partitions keyed by the join key).
Ties on right_time resolve by the ordered payload struct (documented,
deterministic) rather than "some row".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Each left row gains ``{prefix}{col}`` for every payload column
    of the as-of matching right row (NULL when no right row precedes
    it). Right-time ties resolve by the largest payload tuple (ordered
    struct comparison) — deterministic."""
    lt = F.col(left_time).alias("_t")
    rt = F.col(right_time).alias("_t")
    l_tagged = left.select(
        F.col(left_on).alias("_k"),
        lt,
        F.lit(1).alias("_tag"),
        F.struct(*left.columns).alias("_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("_right"),
    )
    r_tagged = right.select(
        F.col(right_on).alias("_k"),
        rt,
        F.lit(0).alias("_tag"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_left"),
        F.struct(*payload).alias("_right"),
    )
    # right rows (tag 0) order before left rows (tag 1) at equal times;
    # _right as final key makes equal-time right rows resolve to the
    # max payload struct deterministically
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_tag", "_right")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.withColumn(
        "_asof", F.last("_right", ignorenulls=True).over(w)
    ).filter(F.col("_tag") == 1)
    out_cols: list[Column] = [F.col(f"_left.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in payload]
    return carried.select(*out_cols)


def events_last_order(spark, sf_dir: str) -> DataFrame:
    """Query form: each event joined as-of to the user's most recent
    order on/before the event (key user_id = o_custkey)."""
    from dump_es_parquet_spark.operators.tables import load

    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    joined = asof_join(
        e,
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderdate", "o_orderkey"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "asof_o_orderdate",
        "asof_o_orderkey",
    ).orderBy("event_id")
