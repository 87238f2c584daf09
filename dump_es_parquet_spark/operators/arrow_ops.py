"""Arrow-native batch transforms (``mapInArrow``).

``mapInPandas`` (see ``embedding_block``, ``multimodal``) pays a
pyarrow→pandas→pyarrow round-trip per batch. For purely columnar
transforms that never need pandas semantics, ``mapInArrow`` hands the
task's Arrow record batches to Python directly — zero conversion, zero
copy on the fixed-width columns — and numpy views the buffers in
place. This is the lowest-overhead Python escape hatch the engine has;
use it when (a) built-in expressions can't express the kernel and
(b) the kernel is columnar (no per-group state, no pandas alignment).

Scale shape: one Python worker per task, Arrow IPC transfer, batch
size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` —
identical distribution properties to the JVM projection it replaces.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def l2_normalize_embeddings(
    df: DataFrame, col: str = "embedding", out: str = "unit"
) -> DataFrame:
    """Append a unit-L2-norm copy of an ``array<float>`` column,
    computed with numpy over raw Arrow buffers (``mapInArrow``).
    Zero-norm vectors pass through unchanged (no NaN poisoning).

    Equivalent to the expression form
    ``transform(v, x -> x / sqrt(aggregate(...)))`` — the Arrow path
    wins when the kernel grows past what codegen handles well (e.g.
    fused normalize + quantize + pack for ANN index builds).
    """
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

    schema = StructType(
        df.schema.fields + [StructField(out, ArrayType(FloatType()))]
    )

    def batches(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        for rb in it:
            arr = rb.column(rb.schema.get_field_index(col))
            if isinstance(arr, pa.ChunkedArray):  # defensive; RBs are flat
                arr = arr.combine_chunks()
            # fixed-length lists of floats → one flat values buffer
            lst = arr.cast(pa.list_(pa.float32()))
            values = np.asarray(lst.values)
            offsets = np.asarray(lst.offsets)
            lengths = np.diff(offsets)
            if len(values):
                # segment L2 norms via reduceat on squared values
                sq = values.astype(np.float64) ** 2
                seg = np.add.reduceat(sq, offsets[:-1].astype(np.int64))
                norms = np.sqrt(seg)
                norms[norms == 0.0] = 1.0
                unit = (
                    values / np.repeat(norms, lengths)
                ).astype(np.float32)
            else:
                unit = values
            out_arr = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(unit, type=pa.float32())
            )
            yield pa.RecordBatch.from_arrays(
                [rb.column(i) for i in range(rb.num_columns)] + [out_arr],
                names=[f.name for f in rb.schema] + [out],
            )

    return df.mapInArrow(batches, schema)
