"""UDTF surface + approximate-aggregate accuracy + pattern union."""

from __future__ import annotations

from pyspark.sql import functions as F

from dump_es_parquet_spark.functions.udtf import ShingleExplode, register
from dump_es_parquet_spark.operators.tables import load


def test_udtf_shingle_explode(spark):
    register(spark)
    rows = spark.sql(
        "SELECT * FROM shingle_explode('a b c d', 3)"
    ).collect()
    assert [(r.shingle, r.pos) for r in rows] == [("a b c", 0), ("b c d", 1)]
    # lateral join over a table
    spark.createDataFrame([("x y z w",)], "text string").createOrReplaceTempView(
        "t_udtf"
    )
    n = spark.sql(
        "SELECT s.shingle FROM t_udtf, LATERAL shingle_explode(text, 2) s"
    ).count()
    assert n == 3


def test_udtf_matches_jvm_shingles(spark, sf_dir):
    """The Python UDTF and the JVM expression produce the same shingle
    multiset (modulo the expression's array_distinct)."""
    from dump_es_parquet_spark.operators.dedup import shingles_col

    register(spark)
    d = load(spark, sf_dir, "documents").limit(20)
    d.createOrReplaceTempView("t_docs_udtf")
    py = (
        spark.sql(
            "SELECT doc_id, collect_set(s.shingle) sh FROM t_docs_udtf, "
            "LATERAL shingle_explode(text, 3) s GROUP BY doc_id"
        )
        .select("doc_id", F.array_sort("sh").alias("sh"))
        .collect()
    )
    jvm = (
        d.select("doc_id", F.array_sort(shingles_col()).alias("sh")).collect()
    )
    assert {r.doc_id: r.sh for r in py} == {r.doc_id: r.sh for r in jvm}


def test_approx_count_distinct_accuracy(spark, sf_dir):
    """HLL sketch (approx_count_distinct) lands within its rsd bound of
    the exact count — the approximate-aggregate surface."""
    o = load(spark, sf_dir, "orders")
    row = o.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.06  # 3×rsd


def test_read_pattern_unioned(spark):
    from tests.test_source_pipeline import FIXTURE, factory

    from dump_es_parquet_spark.sources.scan import read_pattern_unioned
    from dump_es_parquet_spark.sources import ScanOptions

    df = read_pattern_unioned(spark, factory, "metrics-*", ScanOptions(slices=2))
    assert "_index" in df.columns
    counts = {r["_index"]: r["cnt"] for r in df.groupBy("_index").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == {"metrics-2026.05": 1500, "metrics-2026.06": 100}


def test_salted_join_equals_plain(spark, sf_dir):
    from dump_es_parquet_spark.operators.skew import salted_join

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    plain = o.join(c, ["o_custkey"]).groupBy("c_nationkey").count()
    salted = salted_join(o, c, ["o_custkey"]).groupBy("c_nationkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_spreads_identical_hot_rows(spark):
    """The hot-key pathology: one key, 10k byte-identical rows. A
    content-derived salt would put them all in one (key, salt) task;
    the positional salt must spread them over most of the salt space
    while the join result stays exact."""
    from dump_es_parquet_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(7, "same payload")] * 10_000, "k int, payload string"
    ).repartition(4)
    small = spark.createDataFrame([(7, "dim")], "k int, attr string")
    out = salted_join(big, small, ["k"])
    assert out.count() == 10_000
    # re-derive the salt exactly as salted_join does and count buckets
    from pyspark.sql import functions as F

    n_salts = (
        big.select(
            F.pmod(
                F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
                F.lit(16),
            ).alias("s")
        )
        .agg(F.countDistinct("s").alias("n"))
        .collect()[0]["n"]
    )
    assert n_salts > 8  # identical rows land on many salts, not one


def test_salted_distinct_count_exact(spark, sf_dir):
    from dump_es_parquet_spark.operators.skew import salted_distinct_count

    o = load(spark, sf_dir, "orders")
    exact = {
        r.o_orderpriority: r.n
        for r in o.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    salted = {
        r.o_orderpriority: r.n_distinct_o_custkey
        for r in salted_distinct_count(o, "o_orderpriority", "o_custkey").collect()
    }
    assert exact == salted


def test_asof_join_semantics(spark):
    import datetime as dt

    from dump_es_parquet_spark.operators.asof import asof_join

    T = dt.datetime
    left = spark.createDataFrame(
        [(1, T(2026, 1, 1, 10)), (1, T(2026, 1, 1, 12)), (2, T(2026, 1, 1, 9)),
         (3, T(2026, 1, 1, 9))],
        "k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, T(2026, 1, 1, 10), 100), (1, T(2026, 1, 1, 11), 200),
         (2, T(2026, 1, 1, 9, 30), 300)],
        "k long, rt timestamp, val int",
    )
    out = {
        (r.k, r.t): r.asof_val
        for r in asof_join(
            left, right, "k", "k", "t", "rt", payload=["rt", "val"]
        ).collect()
    }
    assert out[(1, T(2026, 1, 1, 10))] == 100   # exact-time tie matches
    assert out[(1, T(2026, 1, 1, 12))] == 200   # latest prior
    assert out[(2, T(2026, 1, 1, 9))] is None   # right row is later → no match
    assert out[(3, T(2026, 1, 1, 9))] is None   # key never in right


def test_deterministic_split_stable(spark, sf_dir):
    from dump_es_parquet_spark.operators.sampling import (
        deterministic_sample,
        train_val_test_split,
    )

    d = load(spark, sf_dir, "documents")
    s1 = {r.doc_id: r.split for r in train_val_test_split(d, "doc_id").collect()}
    # same rows, different partitioning → identical assignment
    s2 = {
        r.doc_id: r.split
        for r in train_val_test_split(d.repartition(7), "doc_id").collect()
    }
    assert s1 == s2
    assert set(s1.values()) == {"train", "val", "test"}
    # splits are disjoint+exhaustive by construction; fractions sane
    n = len(s1)
    n_val = sum(1 for v in s1.values() if v == "val")
    assert 0.02 < n_val / n < 0.25
    # sampling with different salts gives different (deterministic) sets
    a = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.3, "s1").collect()}
    b = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.3, "s2").collect()}
    assert a != b
    a2 = {r.doc_id for r in deterministic_sample(d, "doc_id", 0.3, "s1").collect()}
    assert a == a2


def test_sql_surface_matches_dataframe_plan(spark, sf_dir):
    """spark.sql over registered views equals the DataFrame-API query
    (same Catalyst plan space), and pushdown still reaches parquet."""
    from dump_es_parquet_spark.operators.relational import q6_revenue_band
    from dump_es_parquet_spark.sql_surface import register_tables, sql

    names = register_tables(spark, sf_dir)
    assert "lineitem" in names and len(names) == 10
    got = sql(
        spark,
        sf_dir,
        """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
                    AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount >= 0.02 AND l_discount <= 0.06 AND l_quantity < 24
        """,
    ).first()
    want = q6_revenue_band(spark, sf_dir).first()
    assert got.revenue == want.revenue and got.n_items == want.n_items
    # the SQL text's filter reaches the parquet scan
    plan = (
        spark.sql("SELECT l_orderkey FROM lineitem WHERE l_orderkey = 42")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]" in plan
