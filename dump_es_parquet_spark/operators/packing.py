"""Sequence packing — map a document corpus onto fixed-length training
sequences ("concat then chunk", the GPT-style pretraining layout): lay
every document's tokens end-to-end in a deterministic global order and
cut the tape every ``seq_len`` tokens. Each document then owns the
global token interval [tok_start, tok_end) and straddles one or more
sequences.

The core primitive is a **distributed prefix sum** over the global
document order — the one pattern here Spark has no built-in for. A bare
``Window.orderBy(...)`` without partitioning collapses to a single
task, so at scale it is computed in the classic two-phase shape:

1. range-partition + sort by the order key (one shuffle — the same
   shuffle a global sort would pay), running sums *within* each
   partition via a partition-local window (parallel);
2. per-partition totals to the driver (P rows, bounded by the
   partition count), prefix-summed there, and joined back broadcast as
   per-partition base offsets.

Everything downstream of the offsets is a narrow projection: sequence
membership is integer arithmetic on [tok_start, tok_end).

Offsets are exact integers, so results hash-match a single-threaded
DuckDB window cumsum oracle (pinned in tests/test_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load, one_slice_frame


def token_offsets(
    d: DataFrame, order_col: str = "doc_id", count_col: str = "n_tokens"
) -> DataFrame:
    """Adds ``tok_start``/``tok_end``: the document's half-open global
    token interval under the deterministic ``order_col`` order —
    a distributed prefix sum (see module docstring)."""
    from pyspark.sql.window import Window

    spark = d.sparkSession
    p = spark.sparkContext.defaultParallelism
    parted = (
        d.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(order_col)
    # barrier: the frame is branched (totals + join) and partition ids
    # must not be re-derived differently on re-execution
    local = parted.withColumn(
        "_cum", F.sum(F.col(count_col).cast("long")).over(w)
    ).localCheckpoint(eager=False)
    totals = (
        local.groupBy("_pid").agg(F.max("_cum").alias("_t")).orderBy("_pid").collect()
    )
    base = 0
    bases = []
    for r in totals:
        bases.append((r["_pid"], base))
        base += r["_t"]
    base_df = F.broadcast(
        one_slice_frame(spark, bases, "_pid int, _base long")
    )
    return (
        local.join(base_df, "_pid")
        .withColumn("tok_end", F.col("_cum") + F.col("_base"))
        .withColumn(
            "tok_start", F.col("tok_end") - F.col(count_col).cast("long")
        )
        .drop("_pid", "_cum", "_base")
    )


def pack_sequences(
    d: DataFrame,
    seq_len: int = 2048,
    order_col: str = "doc_id",
    count_col: str = "n_tokens",
) -> DataFrame:
    """One row per (sequence, document-slice): which slice of which
    document fills tokens [fill_start, fill_end) of sequence ``seq_id``.
    Pure integer arithmetic over the offsets — a document straddling a
    boundary explodes into one row per covered sequence (``sequence``
    over the bounded straddle count, not the corpus)."""
    off = token_offsets(d, order_col, count_col)
    first = (F.col("tok_start") / seq_len).cast("long")
    # empty docs (n_tokens=0) occupy no sequence; guard the exploded range
    last = ((F.col("tok_end") - 1) / seq_len).cast("long")
    return (
        off.filter(F.col(count_col) > 0)
        .withColumn("seq_id", F.explode(F.sequence(first, last)))
        .select(
            "seq_id",
            order_col,
            F.greatest(F.col("tok_start") - F.col("seq_id") * seq_len, F.lit(0))
            .alias("fill_start"),
            F.least(
                F.col("tok_end") - F.col("seq_id") * seq_len, F.lit(seq_len)
            ).alias("fill_end"),
        )
        .orderBy("seq_id", order_col)
    )


def packing_summary(
    spark: SparkSession, sf_dir: str, seq_len: int = 512
) -> DataFrame:
    """Per-sequence packing stats over the ``documents`` table
    (whitespace token counts): how many docs contribute and how full
    the sequence is — the tail sequence is the only one allowed to be
    short."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    packed = pack_sequences(d, seq_len)
    return (
        packed.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("fill_end") - F.col("fill_start")).alias("n_filled"),
        )
        .orderBy("seq_id")
    )
