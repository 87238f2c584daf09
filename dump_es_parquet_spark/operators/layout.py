"""Output-layout optimization: Z-order clustering and small-file
compaction.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan saver is parquet row-group/file min-max pruning — which
only works if rows with similar key values are physically co-located.
A plain ``repartitionByRange(col)`` clusters ONE column; Z-ordering
(Morton curve: interleave the bits of several quantized columns)
gives every participating column partial locality, so filters on ANY
of them prune files (the same layout trick Delta/Iceberg expose as
``OPTIMIZE ZORDER BY``; Spark itself has no built-in).

Everything is JVM expressions: quantize each column to ``bits`` codes
with a broadcast min/max, interleave with shift/or arithmetic, then
``repartitionByRange`` + ``sortWithinPartitions`` on the z-value so
each output file covers a tight hyper-rectangle of the key space.

Linear (min/max) quantization is deliberate: rank-based quantiles
cluster better under heavy skew but cost a global sort to compute;
min/max costs one bounded aggregate (2 values per column). Callers
with known-skewed columns can pre-transform (e.g. ``log1p``) first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_COL = "__zvalue"


def quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Linear code in [0, 2^bits): floor((x-lo) * (2^bits - 1) / (hi-lo)),
    degenerate hi==lo → 0, NULL → 0 (nulls cluster first)."""
    levels = F.lit((1 << bits) - 1)
    span = hi - lo
    code = F.floor((col.cast("double") - lo) * levels / span).cast("long")
    clamped = F.greatest(F.lit(0).cast("long"), F.least(levels.cast("long"), code))
    # NULL must be decided BEFORE the clamp: Spark's least/greatest
    # SKIP nulls (so least(255, NULL) is 255, not NULL)
    return F.when(col.isNotNull() & (span > 0), clamped).otherwise(F.lit(0).cast("long"))


def interleave_bits(codes: list[Column], bits: int) -> Column:
    """Morton z-value: bit i of code j lands at position
    ``i * len(codes) + j``. Pure shift/mask arithmetic — whole-stage
    codegen keeps this one projection."""
    n = len(codes)
    out = F.lit(0).cast("long")
    for j, c in enumerate(codes):
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j
            )
    return out


def zvalue_for(df: DataFrame, cols: list[str], bits: int = 8) -> DataFrame:
    """Append ``__zvalue``. The min/max bounds come from ONE bounded
    aggregate (2·len(cols) scalars) broadcast back as literals — no
    second full-data shuffle."""
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in cols],
    ).first()
    codes = [
        quantize(
            F.col(c),
            F.lit(float(bounds[f"lo_{c}"])),
            F.lit(float(bounds[f"hi_{c}"])),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(Z_COL, interleave_bits(codes, bits))


def zorder(df: DataFrame, cols: list[str], bits: int = 8, num_files: int | None = None) -> DataFrame:
    """Frame reordered for write: range-partitioned and sorted by the
    z-value, so each output file covers a tight multi-column region and
    min/max pruning works on every ``cols`` member. Write with
    ``.write.parquet`` as usual."""
    z = zvalue_for(df, cols, bits)
    parted = (
        z.repartitionByRange(num_files, Z_COL)
        if num_files
        else z.repartitionByRange(Z_COL)
    )
    return parted.sortWithinPartitions(Z_COL).drop(Z_COL)


def compact_files(
    spark,
    in_path: str,
    out_path: str,
    target_mb: int = 512,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_mb`` each. Streaming dumps (``--follow``) and per-slice
    writers leave many small files; small files are the other half of
    the scan-cost story (per-file open/footer overhead, starved
    vectorized reads, NameNode/object-store pressure).

    File count comes from the directory's ACTUAL on-disk bytes (driver
    metadata listing, no data read). ``sort_col`` additionally orders
    the rewrite (``repartitionByRange`` + local sort) so compaction
    doubles as a clustering pass; otherwise a plain ``repartition``
    round-robins for uniform file sizes. Returns the file count."""
    import math

    df = spark.read.parquet(in_path)
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path(in_path)
    fs = jvm_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jvm_path).getLength()
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    if sort_col:
        out = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(out_path)
    return n


def q_events_zorder(spark, sf_dir: str):
    """Declared-surface form: z-values of (user_id, value) over fixed
    8-bit codes, summarized per z-range bucket with the per-bucket
    spans of BOTH source columns. The tight per-bucket spans (vs the
    full-table span) are exactly the min/max-pruning benefit; the
    oracle recomputes the interleave arithmetic independently."""
    from dump_es_parquet_spark.operators.tables import load

    ev = load(spark, sf_dir, "events")
    z = zvalue_for(ev, ["user_id", "value"], bits=8)
    bucket = F.shiftright(F.col(Z_COL), 8).alias("z_bucket")  # 256 buckets
    return (
        z.groupBy(bucket)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.min("user_id").cast("long").alias("min_user"),
            F.max("user_id").cast("long").alias("max_user"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("z_bucket")
    )
