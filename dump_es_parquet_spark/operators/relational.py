"""Relational operator suite: joins, aggregations, windows, top-k, set
ops, grouping sets — the SURVEY.md §2.2 categories the reference
doesn't implement (it defers analytics to DuckDB, README.md:99-103).

Every query here is a pure DataFrame-API logical plan — Catalyst picks
the physical strategy. Scale notes per query explain why the plan
survives 100 TB:

- dimension joins (region/nation/supplier) are explicitly
  ``broadcast()`` — they stay small at any scale factor (25 nations,
  5 regions), so no shuffle on the fact side.
- fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  handles skew + partition sizing at runtime.
- aggregations are expressed as plain ``groupBy`` → Spark plans
  partial (map-side) + final aggregation automatically.
- top-k is ``orderBy().limit(k)`` → Spark plans TakeOrderedAndProject
  (per-partition heap + driver merge of k rows, never a global sort).

Oracle-determinism convention (the driver hash-compares against DuckDB
at sf0.01): money sums go through ``decimal(18,2)`` so partial-agg
reordering can't change low-order bits; averages are decimal-sum /
count cast to double (bit-exact across engines — verified); every
computed column is aliased identically in the SQL oracles
(``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from dump_es_parquet_spark.operators.tables import load


def _dec(c, scale=2):
    return F.col(c).cast(f"decimal(18,{scale})") if isinstance(c, str) else c.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial+final hash
    aggregate. Filter is pushed to the parquet scan; 6 aggregates over
    2 grouping keys → tiny shuffle regardless of input size."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set aggregate over the dimension hierarchy;
    regions/nations broadcast onto customer."""
    c = load(spark, sf_dir, "customer")
    n = broadcast(load(spark, sf_dir, "nation"))
    r = broadcast(load(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


def q_cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality order attributes."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("sum_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Spark expands to a two-phase
    aggregate; stays shuffle-bounded by group count."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: fact⋈fact⋈dim with top-k — customer filter
    broadcast-ready, orders⋈lineitem shuffles on orderkey, final top-10
    via TakeOrderedAndProject."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join; nation/region broadcast, the rest
    shuffle on their keys with AQE sizing."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = broadcast(load(spark, sf_dir, "nation"))
    r = broadcast(load(spark, sf_dir, "region"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI + LEFT ANTI: customers with vs without orders, per
    nation. Anti/semi avoid materializing the right side's columns."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = broadcast(load(spark, sf_dir, "nation"))
    with_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").alias("nk_w"))
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    without_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nk_wo"))
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return (
        n.join(with_orders, n.n_nationkey == with_orders.nk_w, "left")
        .join(without_orders, n.n_nationkey == without_orders.nk_wo, "left")
        .select(
            "n_name",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
        .orderBy("n_name")
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION over customer key sets (customers
    with open vs fulfilled orders)."""
    o = load(spark, sf_dir, "orders")
    open_cust = o.filter("o_orderstatus = 'O'").select("o_custkey")
    done_cust = o.filter("o_orderstatus = 'F'").select("o_custkey")

    def one(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    # one action: the four set-op branches cross-join into a single row
    return (
        one(open_cust.intersect(done_cust), "both_statuses")  # INTERSECT (set)
        .crossJoin(one(open_cust.subtract(done_cust), "only_open"))  # EXCEPT
        .crossJoin(one(done_cust.subtract(open_cust), "only_done"))
        .crossJoin(one(open_cust.union(done_cust).distinct(), "either"))  # UNION
    )


# ---------------------------------------------------------------------------
# windows / top-k
# ---------------------------------------------------------------------------


def q_window_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions: per-customer order sequence with row_number,
    lag and running sum. One shuffle on the partition key, sort within
    partitions — the scalable window pattern."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.row_number().over(w).alias("order_seq"),
            F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
            F.sum(_dec("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            .alias("running_total"),
        )
        .filter(F.col("o_custkey") <= 100)
        .orderBy("o_custkey", "order_seq")
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate: TakeOrderedAndProject after the agg — never
    a full global sort."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "total_spent", "n_orders")
        .orderBy(F.col("total_spent").desc(), F.col("c_custkey").asc())
        .limit(25)
    )


# ---------------------------------------------------------------------------
# events: json + time windows + sessionization
# ---------------------------------------------------------------------------


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: extract from the JSON props column
    (get_json_object stays JVM-side) and aggregate."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour time windows (batch form of the streaming
    windowed agg; same date_trunc plan)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def q_events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE-frame rolling window: per user, each event's
    trailing-1-hour event count and value sum — the window-frame class
    (``rangeBetween`` on event time, vs the row-frames used elsewhere)
    that powers rate limiting, rolling MAUs, and feature engineering.
    One shuffle on user_id; the frame is evaluated with a sliding
    aggregate over each partition's sort, never a per-row rescan.
    Micros arithmetic keeps the frame boundary identical to the
    oracle's ``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING``."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_1h"),
        F.sum(_dec("value", 2)).over(w).cast("double").alias("sum_1h"),
    ).orderBy("event_id")


def sequence_pattern_counts(
    ev, patterns: dict[str, str], user_col: str = "user_id"
) -> "DataFrame":
    """MATCH_RECOGNIZE-lite: regex patterns over each user's
    time-ordered EVENT-TYPE sequence. Each user's events collapse to
    one symbol string (one char per event, in (ts, event_id) order —
    deterministic under timestamp ties), then every pattern is one
    ``rlike`` over that string: arbitrary regex (alternation,
    repetition, containment) where the funnel operator hard-codes one
    shape.

    Scale shape: ONE shuffle (groupBy user); per-user sequences are
    session-sized strings, the sort happens inside ``array_sort`` per
    group (not a global sort), and all pattern evaluation is JVM
    regex over the aggregated rows (n_users × n_patterns, no
    re-shuffle)."""
    # stable single-char alphabet per event type (first letter is
    # unique across the testdata's types; collisions would need a map)
    seq = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"))
                )
            ),
            lambda s: F.substring(s["event_type"], 1, 1),
        ),
        "",
    )
    per_user = ev.groupBy(user_col).agg(seq.alias("seq"))
    aggs = [
        F.sum(F.when(F.col("seq").rlike(rx), 1).otherwise(0))
        .cast("long")
        .alias(name)
        for name, rx in patterns.items()
    ]
    return per_user.agg(F.count("*").cast("long").alias("n_users"), *aggs)


def q_events_sequence_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-surface form: behavioral cohort counts from regex
    patterns over event sequences — view→click→purchase in order
    (the funnel, as a one-line regex), error-before-first-purchase,
    and a repetition pattern (≥3 consecutive errors)."""
    ev = load(spark, sf_dir, "events")
    return sequence_pattern_counts(
        ev,
        {
            "n_v_c_p": "v.*c.*p",
            "n_error_before_purchase": "^[^p]*e.*p",
            "n_error_burst": "eee",
        },
    )


def q_events_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly volume anomalies per event type — the monitoring query
    the reference's own domain (Fermilab's fifemon dumps) exists to
    feed. An hour is anomalous when its count deviates from the type's
    mean by more than 3σ.

    Oracle portability is engineered, not assumed: engine stddev
    implementations (Welford vs naive) disagree in float bit patterns,
    so the moments are computed EXACTLY (counts are integers; n, Σc,
    Σc² as longs) and the population-σ test |c − μ| > 3σ is multiplied
    through by n² into pure integer arithmetic:
    ``(c·n − Σc)² > 9·(n·Σc² − (Σc)²)`` — no division, no sqrt, no
    float anywhere."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    moments = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cnt").cast("long").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("s2"),
    )
    j = hourly.join(F.broadcast(moments), "event_type")
    dev = F.col("cnt") * F.col("n") - F.col("s1")  # n·(c − mean)
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")  # n²·σ²
    anomalous = dev * dev > F.lit(9) * var_n2
    return (
        j.where(anomalous)
        .select("event_type", "hour", "cnt", "n", "s1", "s2")
        .orderBy("event_type", "hour")
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week
    (ISO Monday truncation — identical in both engines), counted
    distinct per (cohort, week-offset). Two aggregations on user_id +
    one broadcast join of the users-sized cohort frame; offsets are
    exact multiples of 7 days by construction (both sides truncated),
    so the integer division is portable."""
    ev = load(spark, sf_dir, "events")
    # TIMESTAMP-typed weeks on BOTH engines: DATE columns render
    # differently through the two toPandas paths (datetime.date vs
    # datetime64), which the driver's dtype-sensitive hash would flag
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(
                    F.col("active_week").cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: a user
    converts step N only AFTER their step-N−1 time (stepwise
    min-after-threshold, not independent mins — the distinction that
    makes funnels order-aware). Three chained conditional aggregations
    on the SAME key: one logical shuffle key end-to-end, each phase a
    map-side-combined min, small (users-sized) frames joined back
    broadcast. Reports per-step reach + median step latency."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    t1 = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.join(F.broadcast(t1), "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") >= F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.join(F.broadcast(t2), "user_id")
        .where((F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    funnel = (
        t1.join(t2, "user_id", "left").join(t3, "user_id", "left")
    )
    return funnel.agg(
        F.count("*").cast("long").alias("n_viewed"),
        F.count("t2").cast("long").alias("n_clicked"),
        F.count("t3").cast("long").alias("n_purchased"),
        F.median(
            F.when(
                F.col("t2").isNotNull(),
                (F.unix_micros("t2") - F.unix_micros("t1")) / 1_000_000,
            )
        ).alias("median_view_to_click_s"),
        F.median(
            F.when(
                F.col("t3").isNotNull(),
                (F.unix_micros("t3") - F.unix_micros("t2")) / 1_000_000,
            )
        ).alias("median_click_to_purchase_s"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via window functions: a new session starts after
    a >30 min gap per user; the classic gaps-and-islands plan (one
    shuffle on user_id)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.when(gap > 1800, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.max("ts")).alias("session_end_s"),
            F.unix_timestamp(F.min("ts")).alias("session_start_s"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum(F.col("session_end_s") - F.col("session_start_s")).alias(
                "total_session_seconds"
            ),
        )
        .filter(F.col("user_id") <= 200)
        .orderBy("user_id")
    )


def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (the built-in merging session
    operator, batch form of the streaming session window): per-user
    sessions with a 30-minute gap. Same one-shuffle-on-user_id plan
    class as the gaps-and-islands formulation (``q_events_sessionize``)
    but expressed through the first-class operator. Session end is
    last-event + gap (Spark's window end), floored to epoch seconds."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_s"),
            F.unix_timestamp(F.col("w.end")).alias("session_end_s"),
            "n_events",
            "sum_value",
        )
        .filter(F.col("user_id") <= 100)
        .orderBy("user_id", "session_start_s")
    )


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    exactly two overlapping windows — the hopping-aggregate plan
    (explode to window assignments, then one grouped aggregate)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


def q_events_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured via VariantType (Spark 4's binary JSON):
    ``parse_json`` once, ``variant_get`` typed paths — the
    shred-at-read path that replaces repeated string parsing
    (same aggregate as ``q_events_json`` for cross-checking)."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_type",
            F.variant_get(v, "$.k", "long").alias("k"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def q_events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort parity demo on the stream table: order by value
    descending, top 100 (TakeOrderedAndProject)."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(100)
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot surface: daily event counts, one column per event type.
    The pivot values are EXPLICIT (no extra distinct-values job — at
    scale an implicit pivot first scans the column for its domain) and
    the physical plan is an ordinary two-phase aggregate over
    ``count(CASE WHEN type=v)`` expressions, nothing row-expanding."""
    e = load(spark, sf_dir, "events")
    return (
        # TIMESTAMP day (not to_date): DATE columns render differently
        # through Spark's and DuckDB's toPandas paths, which the
        # strict dtype-sensitive canonicalizer would flag
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .orderBy("day")
    )


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function coverage in one projection (SURVEY §2.2 row
    "scalar functions"): string, date, math, array, and JSON functions
    — all JVM-side, one narrow pass."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    oo = (
        o.filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.upper("o_orderpriority").alias("prio_upper"),
            F.substring("o_orderpriority", 1, 1).alias("prio_code"),
            F.concat_ws("#", "o_orderstatus", "o_orderpriority").alias("status_tag"),
            F.lpad(F.col("o_orderkey").cast("string"), 8, "0").alias("key_padded"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.abs(F.col("o_totalprice") - 100000).alias("price_dist"),
            F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
            F.round(F.log("o_totalprice"), 6).alias("price_ln"),
            F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        )
    )
    ee = (
        e.filter(F.col("event_id") < 500)
        .select(
            F.col("event_id").alias("o_orderkey"),
            # Joined to one string: top-level array columns break the
            # external comparison harness's pandas canonicalizer.
            F.concat_ws("", F.array_sort(F.split("event_type", ""))).alias(
                "type_chars"
            ),
            F.size(F.split("event_type", "")).alias("type_len"),
            F.get_json_object("props", "$.k").cast("long").alias("props_k"),
            F.regexp_replace("event_type", "[aeiou]", "_").alias("type_devoweled"),
        )
    )
    return (
        oo.join(ee, "o_orderkey")
        .orderBy("o_orderkey")
    )


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between nation pairs by year —
    a dual-role dimension join (nation joined twice under different
    aliases, both broadcast) over the fact join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n1 = broadcast(load(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = broadcast(load(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .filter(F.col("n_items") >= 5)
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


def q2_min_price_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-min shape (adapted: the testdata has no
    partsupp, so the min is over retail price per type): aggregate the
    min per group, broadcast it back, keep the rows that attain it.
    The broadcast side is |distinct p_type| rows — never a shuffle."""
    p = load(spark, sf_dir, "part")
    mins = broadcast(
        p.groupBy(F.col("p_type").alias("mt")).agg(
            F.min("p_retailprice").alias("min_price")
        )
    )
    return (
        p.join(mins, (p.p_type == mins.mt) & (p.p_retailprice == mins.min_price))
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            F.col("p_retailprice").cast("double").alias("retail"),
        )
        .orderBy("p_type", "p_partkey")
    )


def q4_priority_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left-semi): orders in a date window
    with at least one returned lineitem, counted by priority. The semi
    join never materializes lineitem columns."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q6_revenue_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan + filter + single-row aggregate — the
    pushdown showcase (all three predicates reach the parquet reader;
    zero shuffle, one exchange of a single partial-agg row)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's volume in one
    part-type market, by year — conditional aggregation over a 6-way
    join (dims broadcast, facts shuffle on their keys)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = broadcast(load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY"))
    n1 = broadcast(load(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = broadcast(load(spark, sf_dir, "nation")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = broadcast(load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .join(r, F.col("c_rk") == r.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: profit margin uses retail price in
    place of the absent partsupp supplycost): profit per supplier
    nation per year over name-matched parts."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = broadcast(load(spark, sf_dir, "part").filter(F.col("p_name").contains("r")))
    n = broadcast(load(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    ).cast("decimal(18,4)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (HAVING > scalar subquery): parts whose revenue
    exceeds 0.06% of global revenue. The global total is a one-row
    aggregate broadcast into the filter — no recomputation, no
    correlated rescan."""
    li = load(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev).cast("double").alias("part_value")
    )
    total = li.agg((F.sum(rev).cast("double") * 0.0006).alias("threshold"))
    return (
        per_part.crossJoin(broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (conditional counts after a fact-fact join,
    adapted to l_returnflag — the testdata has no l_shipmode): per
    return flag, how many high- vs low-priority orders shipped."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_count"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share in one month — conditional
    aggregate ratio over the part⋈lineitem join (part broadcast)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    p = broadcast(load(spark, sf_dir, "part"))
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(
                F.when(F.col("p_type") == "PROMO", rev).otherwise(
                    F.lit(0).cast("decimal(18,6)")
                )
            ).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (view + max scalar): supplier(s) attaining the max
    quarterly revenue. The per-supplier aggregate is computed once; the
    max is a one-row broadcast joined back (no window over the whole
    table, no recomputed view)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        per_supp.crossJoin(broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers with orders above a quantity threshold —
    agg → HAVING → join back to the facts, top-100. The heavy groupBy
    runs on (orderkey) before any join fan-out."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution via LEFT
    OUTER join (customers with zero orders must appear in the c_count=0
    bucket — an inner join would silently drop them) then a
    two-level aggregate. Both shuffles key on high-cardinality ids;
    the second groupBy input is already one row per customer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").startswith("1")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier counts per part attribute group with a
    NOT IN excluded-supplier subquery — adapted to this schema (no
    partsupp: the distinct (l_partkey, l_suppkey) pairs of lineitem ARE
    the part-supplier relation; no s_comment: complaint suppliers =
    negative account balance).

    Scale shape: the NOT IN decorrelates to a broadcast ANTI join
    (supplier is tiny and s_suppkey is non-null, so NOT IN ≡ anti
    join with no three-valued-logic hazard); part is broadcast and its
    predicates evaluate before the distinct pair set shuffles; one
    count-distinct agg on the grouped attributes ends the plan."""
    li = load(spark, sf_dir, "lineitem")
    p = broadcast(
        load(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#5")
            & ~F.col("p_type").startswith("SMALL")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
    )
    excluded = broadcast(
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = (
        li.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "p_brand", "p_type", "p_size")
        .distinct()
    )
    return (
        ps.join(excluded, ps.l_suppkey == excluded.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q20_dominant_supplier_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN + correlated-aggregate pattern
    ("suppliers with availqty exceeding half the shipped quantity of a
    part") — adapted to this schema (no partsupp/availqty: a supplier
    qualifies when it shipped MORE than half of some small-part's total
    1996 quantity, i.e. it dominates the part's supply).

    Both correlated aggregates decorrelate into two groupBys over the
    SAME filtered fact scan — per-(part,supplier) and per-part — joined
    on partkey, so the plan reuses one shuffle key throughout and never
    rescans lineitem per outer row. Quantity sums stay DECIMAL through
    the share comparison (q > 0.5·tq) so the cut is exact on both
    engines."""
    li = load(spark, sf_dir, "lineitem")
    p = broadcast(
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    w = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
    )
    tot = w.groupBy(F.col("l_partkey").alias("t_key")).agg(
        F.sum("q").alias("tq")
    )
    dominant = (
        w.join(tot, w.l_partkey == F.col("t_key"))
        .filter(F.col("q") > F.col("tq") * 0.5)
        .groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_dominant_parts"))
    )
    s = load(spark, sf_dir, "supplier")
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey)
        .select("s_suppkey", "s_name", "n_dominant_parts")
        .orderBy("s_name", "s_suppkey")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lineitems below 20% of their part's average
    quantity — the correlated AVG subquery decorrelates into one
    aggregate per partkey joined back to the facts (Catalyst's own
    rewrite for the SQL form; expressed directly here so the plan is
    explicit: agg ⋈ facts, filtered, one-row out)."""
    li = load(spark, sf_dir, "lineitem")
    p = broadcast(
        load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg(_dec("l_quantity")) * 0.2).cast("double").alias("qty_cut")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity").cast("double") < F.col("qty_cut"))
        .agg(
            (F.sum(_dec("l_extendedprice")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly")
        )
    )


def q21_waiting_supplier_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's query SHAPE — correlated EXISTS + NOT EXISTS over
    the same fact table — adapted to this schema (no receipt/commit
    dates: "late" = shipped >60 days after the order date). Suppliers
    who were the ONLY late supplier on a multi-supplier order.

    Both correlations ("exists another supplier on the order", "not
    exists another late supplier") carry an l_suppkey inequality, so
    instead of two extra semi/anti self-joins they decorrelate into
    per-order breadth COUNTS of the same scans: given the candidate is
    on the order and late, `n_sups > 1` ⟺ the EXISTS and
    `n_late_sups == 1` ⟺ the NOT EXISTS. One shuffle key (orderkey)
    end-to-end, no row explosion — the formulation a 100 TB plan wants
    over Catalyst's literal ExistenceJoin rewrite."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.datediff("l_shipdate", "o_orderdate") > 60)
        .select("l_orderkey", "l_suppkey")
    )
    # per-order supplier sets, computed ONCE: order breadth + late breadth
    order_sups = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_sups")
    )
    late_sups = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late_sups")
    )
    return (
        late.distinct()
        .join(order_sups, "l_orderkey")
        .join(late_sups, "l_orderkey")
        # EXISTS other supplier; NOT EXISTS other late supplier
        .filter((F.col("n_sups") > 1) & (F.col("n_late_sups") == 1))
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_suppkey").asc())
        .limit(100)
    )


def q19_disjunctive_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicate over
    part⋈lineitem — the join key is conjunctive (partkey), so the OR
    branches evaluate post-join on the broadcast dim; one-row
    aggregate out."""
    li = load(spark, sf_dir, "lineitem")
    p = broadcast(load(spark, sf_dir, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(10, 30))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(20, 50))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar-subquery threshold + NOT EXISTS,
    adapted: country code ← last two digits of c_name, the testdata
    has no phone column; lapsed = no order since 2000, every customer
    in this testdata has *some* order): above-average-balance lapsed
    customers, grouped by code."""
    c = load(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    )
    codes = ["00", "11", "22", "33", "44", "55", "66"]
    pool = c.filter(F.col("cntrycode").isin(codes))
    avg_bal = pool.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        pool.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returned items per customer,
    top 20 — filter + join + agg + top-k composition."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = broadcast(load(spark, sf_dir, "nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_returned"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )
