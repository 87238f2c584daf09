"""Block-matrix embedding similarity — the numpy-GEMM scale path.

``dedup.embedding_near_dup`` is the oracle-exact formulation (per-pair
sequential folds). At 100 TB the winning physical shape is different:
partition the corpus into row-blocks, broadcast the (small) query
block, and let each task run one dense GEMM over its Arrow batch —
``mapInPandas`` + numpy, ~100× the per-pair expression throughput.

Results are float-identical to exact cosine up to BLAS summation order,
so this operator is verified in tests against the expression version
with a tolerance, and intentionally NOT in the hash-exact oracle gate
(``__spark_entry__``) — summation order is the one thing GEMM doesn't
promise.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load

SIM_SCHEMA = "vec_id long, label int, cos_sim double"


def topk_gemm(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k via per-partition GEMM: each Arrow
    batch becomes one ``(batch × dim) @ (dim,)`` matvec."""
    e = load(spark, sf_dir, "embeddings")
    qv = (
        e.filter(F.col("vec_id") == query_id)
        .select("embedding")
        .first()["embedding"]
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np

        q = _np.asarray(qv, dtype="float64")
        qn = _np.linalg.norm(q)
        for pdf in batches:
            m = _np.vstack(pdf["embedding"].map(
                lambda a: _np.asarray(a, dtype="float64")
            ))
            sims = (m @ q) / (_np.linalg.norm(m, axis=1) * qn)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cos_sim": sims,
                }
            )

    return (
        e.mapInPandas(_score, SIM_SCHEMA)
        .filter(F.col("vec_id") != query_id)
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
