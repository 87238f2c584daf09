"""Similarity search over the ``embeddings`` table
(``array<float>`` column): brute-force cosine top-k baseline and a
bucketed ANN variant for scale.

Scale design:

- brute-force: one narrow projection computing cosine per row, then
  TakeOrderedAndProject top-k — linear scan, no shuffle, trivially
  parallel. The right baseline, and often the right answer when the
  query set is small.
- sign-LSH: an 8-bit signature from the signs of the leading
  dimensions buckets the corpus; a query probes only its bucket
  (≈ n/256 of the corpus). The bucketing pass is reusable across
  queries (write bucketed/partitioned parquet); this is the IVF-style
  shape — coarse quantize, then exact re-rank within the probed cell.
- centroids: per-label mean vector via posexplode + groupBy — the
  k-means/IVF building block, one shuffle keyed (label, dim).

Dot products fold left-to-right over ``zip_with`` in double precision —
bit-identical to DuckDB's ``list_dot_product`` (verified), so cosine
scores hash-match the oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load

LSH_BITS = 8


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda s, x: s + x,
    )


def l2norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def _query_vec(e: DataFrame, query_id: int) -> Column:
    """The query embedding as a scalar-subquery-style broadcast: a
    1-row frame cross-joined (Catalyst broadcasts it)."""
    return e.filter(F.col("vec_id") == query_id).select(
        F.col("embedding").alias("qv")
    )


def topk_bruteforce(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact cosine top-k against one query vector: broadcast the
    query, linear scan, per-partition heap (TakeOrderedAndProject)."""
    e = load(spark, sf_dir, "embeddings")
    q = F.broadcast(_query_vec(e, query_id))
    return (
        e.crossJoin(q)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "label",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def sign_bucket(v: Column, bits: int = LSH_BITS) -> Column:
    """Sign-LSH bucket id: bit i = (v[i] >= 0). Axis-aligned random
    hyperplanes — deterministic and engine-portable."""
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(
            F.element_at(v, i + 1) >= 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return out


def ann_sign_lsh(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """ANN top-k: probe only the query's sign-bucket (≈1/256 of the
    corpus), exact cosine re-rank inside the bucket. Recall < 1 by
    construction; the bucketed scan is what survives 100 TB."""
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "label", "embedding", sign_bucket(F.col("embedding")).alias("bucket")
    )
    q = F.broadcast(
        bucketed.filter(F.col("vec_id") == query_id).select(
            F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    return (
        bucketed.crossJoin(q)
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_id))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors via posexplode + groupBy(label, dim)
    — the distributed vector-mean pattern (IVF/k-means building
    block). Output: one row per (label, dim) with the mean component
    (keeps the result relational and oracle-checkable)."""
    e = load(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            # decimal-sum → double/count: partial-agg order can't change
            # the result, so it hash-matches the oracle exactly
            F.round(
                F.sum(F.col("x").cast("double").cast("decimal(28,9)"))
                .cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid_x"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
        .filter(F.col("dim") < 8)  # keep the checked slice compact
        .orderBy("label", "dim")
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH (multi-probe)
# ---------------------------------------------------------------------------

HP_PLANES = 8
HP_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 —
    reproducible across engines and sessions (components in [-7.5,7.5]
    from hex digits; direction is all that matters for sign-LSH)."""
    import hashlib

    planes = []
    for j in range(HP_PLANES):
        row = []
        for d in range(HP_DIM):
            h = hashlib.md5(f"hp|{j}|{d}".encode()).hexdigest()
            row.append(float(int(h[:2], 16) % 16) - 7.5)
        planes.append(row)
    return planes


def hyperplane_bucket(v: Column) -> Column:
    """8-bit random-hyperplane signature: bit j = (v · w_j >= 0).
    Sequential fold dot products — engine-portable.

    ONE fold over a (planes × weights) zip instead of 8 separate dot
    folds summed in the tree: the dot expression appears once and is
    evaluated per plane at runtime, so codegen compiles one fold —
    the 8-fold form's first-run cost was dominated by compiling 8
    copies of the dot subtree (same fix as dedup.simhash_from_hashes).
    Bit-identical: same planes, same ``>= 0`` rule, same int type."""
    planes = F.array(
        *[F.array(*[F.lit(x) for x in w]) for w in _hyperplanes()]
    )
    weights = F.array(*[F.lit(1 << j) for j in range(HP_PLANES)])
    return F.aggregate(
        F.zip_with(
            planes,
            weights,
            lambda w, pw: F.when(dot(v, w) >= 0, pw).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda s, x: s + x,
    )


def ann_hyperplane_lsh(
    spark: SparkSession, sf_dir: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """Multi-probe random-hyperplane LSH top-k: probe the query's
    bucket plus all buckets at hamming distance 1 (9 of 256 cells ≈
    3.5% of the corpus scanned), exact cosine re-rank inside the
    probed cells. The standard recall/cost dial: more probes → higher
    recall, same plan.

    Measured on the synthetic testdata (near-uniform vectors, max
    pairwise cosine ≈ 0.5): recall@10 ≈ 0.2 while scanning 3.6% of the
    corpus — ~5× better than random probing; real embedding corpora
    with genuine near-neighbors bucket far more coherently."""
    e = load(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "label",
        "embedding",
        hyperplane_bucket(F.col("embedding")).alias("bucket"),
    )
    q = F.broadcast(
        bucketed.filter(F.col("vec_id") == query_id).select(
            F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
        )
    )
    hamming = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("qbucket"))
    )
    return (
        bucketed.crossJoin(q)
        .filter((hamming <= 1) & (F.col("vec_id") != query_id))
        .select(
            "vec_id",
            "label",
            "bucket",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


IVF_CELLS = 8
IVF_NPROBE = 2


def _ivf_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (argmin over
    ``-2·v·c + c·c``; ``v·v`` is constant per vector and drops out).
    Centroids broadcast; ties break on cid (the ordering struct is
    unique per vec_id, so ``min_by`` is deterministic).

    Map-side-combining argmin: ``min_by`` over the broadcast-expanded
    n×C rows partial-aggregates inside each task, so only n combined
    rows ever hit the shuffle — versus the window formulation
    (``row_number over partitionBy(vec_id)``) that shuffles and sorts
    all n×C expanded rows. The payload rides inside ``min_by``'s value
    struct, so no join-back is needed either (VERDICT r2 #3)."""
    payload = F.struct(
        *[F.col(c) for c in e.columns if c != "vec_id"], F.col("cid")
    )
    dist = F.lit(-2.0) * dot(F.col("embedding"), F.col("cv")) + dot(
        F.col("cv"), F.col("cv")
    )
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", payload.alias("p"), F.struct(dist.alias("dist"), "cid").alias("o"))
        .groupBy("vec_id")
        .agg(F.min_by("p", "o").alias("b"))
        .select("vec_id", "b.*")
    )


def ivf_centroids(spark: SparkSession, sf_dir: str, n_cells: int = IVF_CELLS) -> DataFrame:
    """IVF coarse quantizer over the ``embeddings`` table — see
    ``ivf_centroids_for``."""
    return ivf_centroids_for(load(spark, sf_dir, "embeddings"), n_cells)


def ivf_centroids_for(e: DataFrame, n_cells: int = IVF_CELLS) -> DataFrame:
    """IVF coarse quantizer, trained distributed over a caller-supplied
    (vec_id, embedding) frame: deterministic seeds (the ``n_cells``
    smallest md5(vec_id) — reproducible across engines, no RNG), one
    Lloyd update (assign → per-cell per-dim mean via posexplode +
    groupBy). Returns (cid, cv double[]). The mean goes decimal-sum →
    double / count so partial-agg order can't change it (hash-exact vs
    the oracle)."""
    from pyspark.sql.window import Window

    seeds = (
        e.select(
            F.col("embedding").alias("cv"),
            F.md5(F.col("vec_id").cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_cells)
        .select((F.row_number().over(Window.orderBy("h")) - 1).alias("cid"), "cv")
    )
    assigned = _ivf_assign(e.select("vec_id", "embedding"), seeds)
    return (
        assigned.select("cid", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("cid", "dim")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
    )


def ann_ivf(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 10,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus into ``n_cells``
    inverted lists (``ivf_centroids``), probe the query's ``nprobe``
    nearest cells, exact-cosine re-rank inside them — the
    FAISS-IVF-flat shape. Scan fraction ≈ nprobe/n_cells; at scale the
    assignment is a write-once artifact (partitioned parquet keyed by
    cell) amortized across every query, and probing is partition
    pruning — only the probed cells' files are read."""
    e = load(spark, sf_dir, "embeddings")
    # n_cells rows referenced twice (assignment + probe selection):
    # cache so the Lloyd pipeline runs once, not per reference — the
    # in-query stand-in for the materialized artifact (write_ivf_index)
    cents = ivf_centroids(spark, sf_dir, n_cells).cache()
    inverted = _ivf_assign(e, cents)
    qv = F.broadcast(
        e.filter(F.col("vec_id") == query_id).select(F.col("embedding").alias("qv"))
    )
    probes = F.broadcast(
        cents.crossJoin(qv)
        .orderBy(
            (F.lit(-2.0) * dot(F.col("qv"), F.col("cv")) + dot(F.col("cv"), F.col("cv"))).asc(),
            F.col("cid").asc(),
        )
        .limit(nprobe)
        .select("cid")
    )
    return (
        inverted.join(probes, "cid")
        .crossJoin(qv)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "label",
            F.col("cid").alias("cell"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


PQ_M = 8  # product-quantization subspaces
PQ_CODES = 16  # codebook entries per subspace (one int code each)


def pq_codebooks_for(
    e: DataFrame, m: int = PQ_M, kcodes: int = PQ_CODES
) -> DataFrame:
    """Product-quantization codebooks ``(sub, code, cv)``: the
    embedding space splits into ``m`` contiguous subspaces and each
    gets its own ``kcodes``-entry quantizer, trained with the SAME
    deterministic Lloyd as the coarse quantizer (md5-seeded, one
    update, decimal-exact means — ``ivf_centroids_for`` on the sliced
    subvectors), so the whole PQ artifact is reproducible without RNG.
    ``m`` is a small constant: the Python loop unions ``m`` bounded
    plans, it does not scale with the corpus."""
    dim = e.select(F.size("embedding")).first()[0]
    if dim % m != 0:
        raise ValueError(f"embedding dim {dim} not divisible by m={m}")
    dsub = dim // m
    out = None
    for sub in range(m):
        sv = e.select(
            "vec_id",
            F.slice("embedding", sub * dsub + 1, dsub).alias("embedding"),
        )
        cb = ivf_centroids_for(sv, kcodes).select(
            F.lit(sub).alias("sub"), F.col("cid").alias("code"), "cv"
        )
        out = cb if out is None else out.unionByName(cb)
    return out


def pq_encode(vecs: DataFrame, codebooks: DataFrame, m: int | None = None) -> DataFrame:
    """Append ``pq_codes`` (array<int>, one code per subspace) to any
    ``(vec_id, embedding, ...)`` frame: per subspace, the argmin over
    the broadcast codebook (``min_by`` partial-agg — the same
    map-side-combining shape as ``_ivf_assign``; only n·m combined
    rows reach the shuffle, never the n·m·kcodes expansion). The
    subspace slice derives its offsets from ``size(cv)``, so no dim
    constant is threaded through. Pass ``m`` when the caller knows it
    (the index build does) — deriving it runs a job over ``codebooks``,
    which EXECUTES the whole training plan if that frame is an
    unmaterialized Lloyd pipeline.

    Note ``vecs`` appears twice in the returned plan (the subspace
    explode and the join-back); callers building large frames should
    cache it — ``write_ivf_index`` does."""
    if m is None:
        m = codebooks.agg(F.max("sub")).first()[0] + 1
    sv = (
        vecs.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
            "embedding",
        )
        .join(F.broadcast(codebooks), "sub")
        .select(
            "vec_id",
            "sub",
            "code",
            (
                F.lit(-2.0)
                * dot(
                    F.slice(
                        "embedding",
                        F.col("sub") * F.size("cv") + F.lit(1),
                        F.size("cv"),
                    ),
                    F.col("cv"),
                )
                + dot(F.col("cv"), F.col("cv"))
            ).alias("dist"),
        )
    )
    codes = (
        sv.groupBy("vec_id", "sub")
        .agg(F.min_by("code", F.struct("dist", "code")).alias("code"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("pq_codes")
        )
    )
    return vecs.join(codes, "vec_id")


def write_ivf_index(
    spark: SparkSession, sf_dir: str, path: str, n_cells: int = IVF_CELLS
) -> None:
    """Materialize the IVF index as a write-once artifact: inverted
    lists as parquet PARTITIONED BY cell id, centroids alongside.
    Probing then becomes partition pruning — only the probed cells'
    files are ever opened, which is how the nprobe/n_cells scan
    fraction survives 100 TB (cf. ``ann_ivf`` docstring).

    The lists also carry the SQ8 columns (``q_scale``, ``q_codes`` as
    int8, ``norm``) AND the PQ codes (``pq_codes``, ``m`` small ints)
    next to the flat vectors, so the same artifact serves the flat
    path (``ann_ivf_indexed``), the scalar-quantized path
    (``ann_ivf_indexed_sq8``), and the product-quantized path
    (``ann_ivf_indexed_pq``) — parquet column pruning means each path
    reads only its own columns. PQ codebooks are written alongside the
    centroids (both quantizers are frozen artifacts of the index)."""
    from dump_es_parquet_spark.operators.embedding_ops import quantize_int8

    e = load(spark, sf_dir, "embeddings")
    cents = ivf_centroids(spark, sf_dir, n_cells)
    # cache the two frames the build references more than once: the
    # codebooks (the 8-subspace Lloyd training plan — feeds the encode
    # join AND its own write) and the assigned+quantized vectors (the
    # encode's subspace explode AND the join-back). Without the caches
    # the training pipeline executes up to three times per build.
    codebooks = pq_codebooks_for(e).cache()
    vecs = (
        quantize_int8(_ivf_assign(e, cents))
        .withColumns(
            {
                "q_codes": F.transform("q_codes", lambda c: c.cast("byte")),
                "norm": F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
            }
        )
        .cache()
    )
    try:
        lists = pq_encode(vecs, codebooks, m=PQ_M)
        lists.write.mode("overwrite").partitionBy("cid").parquet(f"{path}/lists")
        codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
        cents.write.mode("overwrite").parquet(f"{path}/centroids")
    finally:
        codebooks.unpersist()
        vecs.unpersist()


def append_to_ivf_index(new_vecs: DataFrame, path: str) -> None:
    """Incremental index maintenance: assign NEW vectors to the
    existing coarse quantizer and append them to the touched cells'
    inverted lists — no retrain, no rewrite of any existing file
    (parquet append drops new part-files into the partition dirs).
    This is how a serving index absorbs a day's crawl between
    retrains (FAISS ``add`` against a frozen quantizer, lake-shaped).

    Operational contract: BOTH quantizers (coarse cells and PQ
    codebooks) are FROZEN, so sustained appends drift cell balance —
    watch ``ivf_index_stats`` and rebuild with ``write_ivf_index``
    when the imbalance ratio degrades the nprobe scan fraction.
    Duplicate vec_ids are the caller's problem (run
    ``dedup_incremental`` first in a curation pipeline)."""
    from dump_es_parquet_spark.operators.embedding_ops import quantize_int8

    spark = new_vecs.sparkSession
    cents = spark.read.parquet(f"{path}/centroids")
    codebooks = spark.read.parquet(f"{path}/codebooks")
    # conform to the index's stored vector type (e.g. array<float>
    # corpora) — parquet append is schema-strict per column
    stored_t = spark.read.parquet(f"{path}/lists").schema["embedding"].dataType
    conformed = new_vecs.select(
        "vec_id", F.col("embedding").cast(stored_t).alias("embedding")
    )
    # cache: pq_encode references the assigned+quantized frame twice
    # (subspace explode + join-back); m derives from the stored
    # codebooks (tiny parquet scan — the stored index's m wins over
    # the current PQ_M constant, the quantizer is frozen)
    vecs = quantize_int8(_ivf_assign(conformed, cents)).withColumns(
        {
            "q_codes": F.transform("q_codes", lambda c: c.cast("byte")),
            "norm": F.sqrt(dot(F.col("embedding"), F.col("embedding"))),
        }
    ).cache()
    try:
        lists = pq_encode(vecs, codebooks)
        lists.write.mode("append").partitionBy("cid").parquet(f"{path}/lists")
    finally:
        vecs.unpersist()


def ivf_index_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-cell list sizes + the imbalance the operator watches: a
    cell holding k× the mean makes every probe of it k× the intended
    scan fraction. One aggregate over the lists; the global-avg window
    runs over the n_cells aggregated rows (bounded by construction),
    not the corpus — the WindowExec single-partition warning is
    expected and harmless here."""
    from pyspark.sql.window import Window

    lists = spark.read.parquet(f"{path}/lists")
    per_cell = lists.groupBy("cid").agg(F.count("*").alias("n_vecs"))
    return per_cell.select(
        "cid",
        "n_vecs",
        (
            F.col("n_vecs")
            / F.avg("n_vecs").over(Window.partitionBy())
        ).alias("balance_ratio"),
    ).orderBy("cid")


def ivf_candidate_lists(
    spark: SparkSession, path: str, query_vector: list, num_candidates: int
) -> DataFrame:
    """Probe the materialized IVF index for a LITERAL query vector
    (the ES 8 ``knn`` request shape — the vector arrives in the
    request, not as a corpus row): cells in nearest-centroid order,
    smallest prefix whose inverted lists cover AT LEAST
    ``num_candidates`` vectors (ES's "number of candidates the ANN
    phase gathers before rescoring" knob — ours is a floor, the whole
    probed cells rescore).  Returns the pruned lists: a static
    ``cid IN (…)`` partition filter, so only the probed cells' files
    are opened.  Both collects are n_cells-bounded (cell sizes come
    from ONE cid-only aggregate over the lists — a partition-column
    scan, no payload I/O)."""
    if num_candidates < 1:
        raise ValueError("num_candidates must be >= 1")
    lists_path = f"{path}/lists"
    sizes = {
        r.cid: r.n
        for r in spark.read.parquet(lists_path)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    qv = F.array(*[F.lit(float(x)) for x in query_vector])
    order_rows = (
        spark.read.parquet(f"{path}/centroids")
        .select(
            "cid",
            (
                F.lit(-2.0) * dot(qv, F.col("cv"))
                + dot(F.col("cv"), F.col("cv"))
            ).alias("dist"),
        )
        .orderBy(F.col("dist").asc(), F.col("cid").asc())
        .collect()
    )
    probed, cum = [], 0
    for r in order_rows:
        if cum >= num_candidates:
            break
        probed.append(r.cid)
        cum += sizes.get(r.cid, 0)
    return spark.read.parquet(lists_path).filter(F.col("cid").isin(probed))


def ann_ivf_indexed(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    query_id: int = 0,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serve IVF top-k from the materialized index. The nprobe cell
    ids are a bounded driver-side collect (nprobe rows — same class as
    TakeOrdered's driver merge) inlined as a literal partition filter,
    so the parquet source statically prunes to the probed cells."""
    qv, lists = _probed_lists(spark, sf_dir, path, query_id, nprobe)
    return _exact_rank(lists.filter(F.col("vec_id") != query_id), qv, k)


def _probed_lists(spark, sf_dir, path, query_id, nprobe):
    """Shared serving front end for all indexed paths (flat/SQ8/PQ):
    broadcast the query vector, collect the nprobe nearest cell ids
    (bounded driver-side collect — same class as TakeOrdered's driver
    merge), and return the inverted lists statically pruned to those
    cells."""
    e = load(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(f"{path}/centroids")
    qv = F.broadcast(
        e.filter(F.col("vec_id") == query_id).select(F.col("embedding").alias("qv"))
    )
    probe_rows = (
        cents.crossJoin(qv)
        .orderBy(
            (
                F.lit(-2.0) * dot(F.col("qv"), F.col("cv"))
                + dot(F.col("cv"), F.col("cv"))
            ).asc(),
            F.col("cid").asc(),
        )
        .limit(nprobe)
        .select("cid")
        .collect()
    )
    probed = [r.cid for r in probe_rows]
    lists = spark.read.parquet(f"{path}/lists").filter(F.col("cid").isin(probed))
    return qv, lists


def _exact_rank(cands: DataFrame, qv: DataFrame, k: int) -> DataFrame:
    """Shared exact tail: rank candidate list rows by exact cosine
    against the broadcast query vector — the final pass of every
    indexed serving path (the quantized paths feed it their rescore
    candidates; the flat path feeds it the whole probed lists)."""
    return (
        cands.crossJoin(qv)
        .select(
            "vec_id",
            "label",
            F.col("cid").cast("int").alias("cell"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_ivf_indexed_sq8(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    query_id: int = 0,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    rescore_factor: int = 4,
) -> DataFrame:
    """Serve IVF top-k from the SQ8 columns of the materialized index
    — the FAISS IVF-SQ8 shape, two stages over the SAME pruned
    partitions:

    1. approximate pass: score candidates as
       ``q_scale · Σ(code_i · q_i) / (norm · |q|)`` — reads only the
       int8 ``q_codes`` (+ two scalars) from the probed cells, 4× less
       I/O than the flat vectors (parquet column pruning does this;
       nothing reads ``embedding``), keep the top ``k·rescore_factor``;
    2. exact pass: re-read just those candidates' flat vectors from the
       same probed partitions (a bounded id-literal filter — row-group
       stats prune inside the cells) and rank by exact cosine.

    With ``rescore_factor`` ≥ 2 the exact top-k survives any SQ8
    ordering jitter (max quantization error per element is scale/2 ≈
    0.4% of the max coordinate), so the result is identical to
    ``ann_ivf_indexed`` — pinned by test and by sharing its oracle."""
    qv, lists = _probed_lists(spark, sf_dir, path, query_id, nprobe)
    approx = (
        lists.select("vec_id", "q_scale", "q_codes", "norm")
        .crossJoin(qv)
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            (
                F.col("q_scale")
                * dot(F.col("q_codes"), F.col("qv"))
                / (F.col("norm") * l2norm(F.col("qv")))
            ).alias("approx_sim"),
        )
        .orderBy(F.col("approx_sim").desc(), F.col("vec_id").asc())
        .limit(k * rescore_factor)
    )
    # bounded collect: k·rescore_factor candidate ids → literal filter
    # for the exact re-read (same class as the nprobe probe collect)
    cand = [r.vec_id for r in approx.collect()]
    return _exact_rank(lists.filter(F.col("vec_id").isin(cand)), qv, k)


def ann_ivf_indexed_pq(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    query_id: int = 0,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    rescore_factor: int = 24,
) -> DataFrame:
    """Serve IVF top-k from the PRODUCT-QUANTIZED codes of the
    materialized index — the FAISS IVF-PQ shape, the deepest rung of
    the compression ladder (flat 8·d bytes → SQ8 d bytes → PQ ``m``
    small ints): at the default m=8 on d=64 the approximate pass reads
    ~16× less list data than the flat vectors.

    1. approximate pass (ADC — asymmetric distance computation): each
       candidate's ``v·q`` is reconstructed as Σ_sub ``cb[sub,
       code_sub] · q_sub`` — one posexplode of the ``m`` codes, a
       broadcast join against the (m·kcodes)-row codebook, partial-agg
       re-sum per candidate. Only ``pq_codes``+``norm`` are read from
       the probed cells (parquet column pruning); approx cosine =
       reconstructed dot / (norm·|q|). Keep the top
       ``k·rescore_factor``.
    2. exact pass: re-read just those candidates' flat vectors from
       the same probed partitions and rank by exact cosine.

    PQ reconstruction error is far coarser than SQ8 (16 centroids per
    8-dim subspace vs per-element scalar codes), hence the larger
    default ``rescore_factor`` — sized for the WORST case, this
    synthetic near-uniform corpus whose true neighbors sit 0.001
    cosine apart (measured: rf=24 makes the result identical to
    ``ann_ivf_indexed`` at all three test scale factors, pinned by
    test and by sharing its oracle; rf=8 already matched at the
    smaller ones). Real embedding corpora with genuine neighbor
    structure separate candidates by far larger margins and serve
    exactly at rf 4-8 — the dial trades rescore I/O for ordering
    robustness on the same plan."""
    qv, lists = _probed_lists(spark, sf_dir, path, query_id, nprobe)
    codebooks = spark.read.parquet(f"{path}/codebooks")
    parts = (
        lists.select(
            "vec_id", "norm", F.posexplode("pq_codes").alias("sub", "code")
        )
        .filter(F.col("vec_id") != query_id)
        .join(F.broadcast(codebooks), ["sub", "code"])
        .crossJoin(qv)
        .select(
            "vec_id",
            "norm",
            dot(
                F.col("cv"),
                F.slice(
                    "qv", F.col("sub") * F.size("cv") + F.lit(1), F.size("cv")
                ),
            ).alias("part"),
        )
    )
    approx = (
        parts.groupBy("vec_id")
        .agg(
            F.sum("part").alias("vq"),
            F.min("norm").alias("norm"),
        )
        .crossJoin(qv)
        .select(
            "vec_id",
            (F.col("vq") / (F.col("norm") * l2norm(F.col("qv")))).alias(
                "approx_sim"
            ),
        )
        .orderBy(F.col("approx_sim").desc(), F.col("vec_id").asc())
        .limit(k * rescore_factor)
    )
    # bounded collect: k·rescore_factor candidate ids → literal filter
    # for the exact re-read (same class as the nprobe probe collect)
    cand = [r.vec_id for r in approx.collect()]
    return _exact_rank(lists.filter(F.col("vec_id").isin(cand)), qv, k)


def ann_ivf_indexed_batch(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    n_queries: int = 5,
    k: int = 5,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Serve MANY queries from the materialized IVF index in ONE
    partition-pruned scan — the batch-serving counterpart of
    ``ann_ivf_indexed``.

    Probe selection is tiny driver-side work (Q×C distance rows → the
    ``nprobe`` nearest cells per query); the UNION of all probed cells
    (≤ Q·nprobe values) is inlined as the static partition filter, so
    the lists parquet opens only those cells' files once, regardless of
    query count. A broadcast (query_id, cid, qv) routing table then
    sends each inverted-list row to exactly the queries that probed its
    cell, and a per-query window takes the exact-cosine top-k. Cost:
    one pruned scan + one broadcast join for the whole batch, versus
    Q separate jobs."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    cents = spark.read.parquet(f"{path}/centroids")
    qs = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cdist = F.lit(-2.0) * dot(F.col("qv"), F.col("cv")) + dot(
        F.col("cv"), F.col("cv")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cdist").asc(), F.col("cid").asc()
    )
    probes = (
        qs.crossJoin(cents)
        .select("query_id", "qv", "cid", cdist.alias("cdist"))
        .withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", "cid")
    )
    # bounded collect: ≤ n_queries × nprobe cell ids (same class as
    # ann_ivf_indexed's probe collect) — becomes the static pruning
    # literal; the probes themselves re-derive cheaply for the join
    # (Q×C rows off two tiny inputs)
    cells = sorted({r.cid for r in probes.select("cid").collect()})
    lists = spark.read.parquet(f"{path}/lists").filter(F.col("cid").isin(cells))
    scored = (
        lists.join(F.broadcast(probes), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            "label",
            F.col("cid").cast("int").alias("cell"),
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def topk_batch(
    spark: SparkSession, sf_dir: str, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Batch top-k: many query vectors served in ONE scan — broadcast
    the query set, cross join, per-query ranking via window row_number.
    The batch-serving pattern: cost is one corpus scan regardless of
    query count, versus n_queries separate TakeOrderedAndProject jobs.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    queries = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        e.crossJoin(queries)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ivf_recall_report(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    n_queries: int = 10,
    k: int = 10,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Recall@k of the IVF serving path against exact brute force, per
    query — the evaluation every ANN deployment needs before trusting
    nprobe/n_cells settings at scale. Returns ``(query_id, k_eff,
    n_hits)``: ``k_eff`` = size of the exact top-k ground truth,
    ``n_hits`` = how many of those the partition-pruned IVF batch path
    returned. recall@k = n_hits / k_eff.

    Deterministic end to end (md5-seeded Lloyd, rounded-cosine ranking
    with vec_id tiebreak), so the DuckDB oracle recomputes the SAME
    integers — recall is oracle-checked, not assumed. Cost shape: one
    corpus scan for the ground truth (the expensive, run-rarely half)
    + one pruned-lists scan for the ANN half."""
    exact = topk_batch(spark, sf_dir, n_queries, k).select("query_id", "vec_id")
    ann = ann_ivf_indexed_batch(
        spark, sf_dir, path, n_queries, k, nprobe
    ).select("query_id", "vec_id", F.lit(1).alias("_hit"))
    # ONE pass over the ground truth: k_eff and n_hits come from the
    # same left join + aggregate, so the brute-force half (the corpus
    # scan) is planned once — the previous two-sided formulation
    # recomputed it for each aggregate.
    return (
        exact.join(ann, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_eff"),
            F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"),
        )
        .orderBy("query_id")
    )
