"""Every declared query runs at sf0.001 and hash-matches its DuckDB
oracle — the local replica of the driver's t2 gate."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from dump_es_parquet_spark.oracle import compare, register_views

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    register_views(c, sf_dir)
    return c


def test_every_query_has_an_oracle():
    assert set(ORACLES) <= set(QUERIES)
    # every query is oracle-checked (none fall back to rows-only)
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    problems = compare(df, con, ORACLES[name])
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert "sum_qty" in df.columns


def test_gemm_topk_matches_exact(spark, sf_dir):
    """The GEMM scale path agrees with the expression-exact top-k up
    to float tolerance (BLAS summation order)."""
    from dump_es_parquet_spark.operators.embedding_block import topk_gemm
    from dump_es_parquet_spark.operators.similarity import topk_bruteforce

    exact = {r.vec_id: r.cos_sim for r in topk_bruteforce(spark, sf_dir).collect()}
    gemm = {r.vec_id: r.cos_sim for r in topk_gemm(spark, sf_dir).collect()}
    assert set(exact) == set(gemm)
    for vid, sim in exact.items():
        # exact path rounds to 6 decimals; GEMM differs only by BLAS
        # summation order beyond that
        assert abs(sim - gemm[vid]) < 1e-6
