"""Corpus kNN graph: blocked-GEMM candidates + exact rescore must
equal the naive exact per-node top-k (the oracle form runs in
test_operators.py; this pins the operator against a Spark-computed
exact answer and checks the candidate superset property)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.knn import knn_candidates, knn_graph
from dump_es_parquet_spark.operators.similarity import cosine


def _toy(spark, n=40, dim=8):
    # deterministic pseudo-random vectors, no RNG: v[i][j] from md5-ish
    # integer mixing so every run and engine sees the same data
    rows = [
        (i, [((i * 37 + j * 101 + (i * j) % 13) % 19) - 9.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def _exact(e, k):
    a = e.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("vb"))
    p = (
        a.crossJoin(b)
        .where(F.col("src") != F.col("dst"))
        .select(
            "src", "dst", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim")
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_sim").desc(), F.col("dst").asc())
    return p.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def test_knn_graph_matches_exact(spark):
    e = _toy(spark)
    # block_size=16 forces 3 blocks -> 6 block pairs: the multi-block
    # path, not a degenerate single GEMM
    got = sorted(
        (r.src, r.dst, r.cos_sim)
        for r in knn_graph(e, k=3, block_size=16).collect()
    )
    want = sorted((r.src, r.dst, r.cos_sim) for r in _exact(e, 3).collect())
    assert got == want


def test_knn_candidates_cover_true_topk(spark):
    e = _toy(spark)
    cand = set(
        (r.src, r.dst) for r in knn_candidates(e, k=3, block_size=16).collect()
    )
    true = set((r.src, r.dst) for r in _exact(e, 3).collect())
    assert true <= cand  # superset property the rescore relies on
    # and candidates stay bounded: <= B * (k + extra) per node
    import collections

    per_src = collections.Counter(s for s, _ in cand)
    assert max(per_src.values()) <= 3 * (3 + 8)


def test_candidate_sims_match_expression_fold(spark):
    """The in-task exact rescore must be BIT-IDENTICAL to the
    similarity.cosine expression fold (the oracle device): knn_graph
    no longer re-joins embeddings, so any divergence — summation
    order, -0.0 handling, float32 widening — would silently change
    declared results. Compare unrounded doubles by exact equality
    over every candidate pair, including awkward vectors (negative
    zeros among nonzero elements, overflow-to-inf norms, tiny
    magnitudes). Zero-NORM vectors are outside the comparison domain:
    the expression fold itself throws DIVIDE_BY_ZERO under the
    session's ANSI mode, so no production path can feed one through
    cosine()."""
    import math

    rows = [
        (i, [((i * 37 + j * 101 + (i * j) % 13) % 19) - 9.0 for j in range(8)])
        for i in range(30)
    ]
    rows += [
        # negative zeros interleaved with nonzero values: products
        # fold through -0.0 partials (the +0.0 normalization case)
        (100, [-0.0, 0.0, 1.0, -0.0, 2.0, 0.0, -0.0, 3.0]),
        (101, [0.0, -0.0, -1.0, 0.0, -2.0, -0.0, 0.0, -3.0]),
        (102, [1e-150] * 8),        # tiny but non-underflowing norms
        (103, [1e300, -1e300] * 4), # inf norm, NaN dot via inf-inf
        (104, [3.14159e-7] * 8),
    ]
    e = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cand = knn_candidates(e, k=3, block_size=12)
    got = {
        (r.src, r.dst): r.sim
        for r in cand.collect()
    }
    ea = e.select(F.col("vec_id").alias("src"), F.col("embedding").alias("va"))
    eb = e.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("vb"))
    want = {
        (r.src, r.dst): r.sim
        for r in ea.crossJoin(eb)
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", cosine(F.col("va"), F.col("vb")).alias("sim"))
        .collect()
    }
    assert got, "no candidates emitted"
    for pair, sim in got.items():
        ref = want[pair]
        if sim is None or ref is None or (
            isinstance(ref, float) and math.isnan(ref)
        ):
            # NULL/NaN (zero-norm division) must agree in kind
            assert (sim is None) == (ref is None)
            if sim is not None:
                assert math.isnan(sim) and math.isnan(ref)
            continue
        assert math.copysign(1.0, sim) == math.copysign(1.0, ref)
        assert sim == ref and str(sim) == str(ref), (
            f"{pair}: udf {sim!r} != fold {ref!r}"
        )


def test_knn_graph_every_node_has_k(spark):
    e = _toy(spark)
    out = knn_graph(e, k=3, block_size=16)
    counts = out.groupBy("src").agg(F.count("*").alias("n")).collect()
    assert len(counts) == 40 and all(r.n == 3 for r in counts)


def test_ivf_pq_serving_matches_flat_path(spark, sf_dir, tmp_path):
    """IVF-PQ serving (ADC over m=8 product-quantization codes + exact
    rescore at the default rescore_factor) returns the IDENTICAL top-k
    to the flat serving path on this corpus — the same contract
    SQ8 serving is pinned to — and the PQ artifact is deterministic:
    a rebuilt index yields byte-identical codebooks and codes."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.similarity import (
        ann_ivf_indexed,
        ann_ivf_indexed_pq,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_dir, path)
    flat = [(r.vec_id, r.cos_sim) for r in
            ann_ivf_indexed(spark, sf_dir, path, query_id=0, k=10).collect()]
    pq = [(r.vec_id, r.cos_sim) for r in
          ann_ivf_indexed_pq(spark, sf_dir, path, query_id=0, k=10).collect()]
    assert pq == flat

    # determinism: a second build produces identical codebooks + codes
    path2 = str(tmp_path / "ivf2")
    write_ivf_index(spark, sf_dir, path2)
    cb1 = sorted(map(tuple, spark.read.parquet(f"{path}/codebooks").collect()))
    cb2 = sorted(map(tuple, spark.read.parquet(f"{path2}/codebooks").collect()))
    assert cb1 == cb2
    codes1 = {r.vec_id: r.pq_codes for r in
              spark.read.parquet(f"{path}/lists").select("vec_id", "pq_codes").collect()}
    codes2 = {r.vec_id: r.pq_codes for r in
              spark.read.parquet(f"{path2}/lists").select("vec_id", "pq_codes").collect()}
    assert codes1 == codes2
    # every vector carries exactly m codes within the codebook range
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c)
               for c in codes1.values())


def test_append_to_ivf_index_serves_new_vectors(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: appended vectors are discoverable
    by the indexed serving path without a retrain, and pre-existing
    list files are untouched (operators/similarity.py)."""
    import glob
    import os

    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.similarity import (
        ann_ivf_indexed,
        append_to_ivf_index,
        ivf_index_stats,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_dir, path)
    before = sorted(glob.glob(f"{path}/lists/cid=*/part-*.parquet"))
    n0 = spark.read.parquet(f"{path}/lists").count()

    # a synthetic near-clone of vector 0 must become its top neighbor
    q = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") == 0
    ).first()
    clone = [float(x) * 1.001 for x in q.embedding]
    new = spark.createDataFrame(
        [(900001, clone, 0)], ["vec_id", "embedding", "label"]
    )
    append_to_ivf_index(new, path)

    assert spark.read.parquet(f"{path}/lists").count() == n0 + 1
    # append-only: every pre-existing file still present and unmodified
    after = set(glob.glob(f"{path}/lists/cid=*/part-*.parquet"))
    assert set(before) <= after
    sizes = {f: os.path.getsize(f) for f in before}
    assert all(os.path.getsize(f) == s for f, s in sizes.items())

    top = ann_ivf_indexed(spark, sf_dir, path, query_id=0, k=3).collect()
    assert top[0].vec_id == 900001  # the clone dominates cosine

    stats = ivf_index_stats(spark, path)
    assert stats.agg(F.sum("n_vecs")).first()[0] == n0 + 1
    assert stats.where(F.col("balance_ratio") <= 0).count() == 0
