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


def _l2_normalize_batch(rb, col: str, out: str):
    """Append a unit-normalized copy of list column ``col`` to one
    Arrow record batch. Module-level so the edge cases (empty/null
    rows, sliced ListArray inputs) are unit-testable without a Spark
    job.

    Correctness notes baked into the kernel:

    - ``.values`` / ``.offsets`` on a *sliced* ``ListArray`` still
      expose the full parent buffers (``offsets[0] != 0``), which would
      misalign every downstream ``np.repeat``. ``flatten()`` returns
      only this slice's values with null slots' ranges dropped, and
      ``list_value_length`` pairs with it exactly — so we rebase and
      never read the raw buffers.
    - Segment sums use prefix sums of squares instead of
      ``np.add.reduceat``: an empty row gets exactly 0, and a trailing
      start offset equal to ``len(values)`` stays in range — both
      break ``reduceat`` (IndexError / picks up the next segment's
      first element).
    - Null rows are preserved as nulls in the output via the validity
      mask (a null embedding must not become an empty list).
    """
    import numpy as np
    import pyarrow as pa

    arr = rb.column(rb.schema.get_field_index(col))
    if isinstance(arr, pa.ChunkedArray):  # defensive; RBs are flat
        arr = arr.combine_chunks()
    lst = arr.cast(pa.list_(pa.float32()))
    values = np.asarray(lst.flatten(), dtype=np.float32)
    lengths = np.asarray(
        pa.compute.list_value_length(lst).fill_null(0), dtype=np.int64
    )
    offsets = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(lengths)])
    if len(values):
        csum = np.concatenate([[0.0], np.cumsum(values.astype(np.float64) ** 2)])
        norms = np.sqrt(csum[offsets[1:]] - csum[offsets[:-1]])
        norms[norms == 0.0] = 1.0  # zero vectors pass through, no NaN
        unit = (values / np.repeat(norms, lengths)).astype(np.float32)
    else:
        unit = values
    mask = pa.array(np.asarray(lst.is_null())) if lst.null_count else None
    out_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(unit, type=pa.float32()),
        mask=mask,
    )
    return pa.RecordBatch.from_arrays(
        [rb.column(i) for i in range(rb.num_columns)] + [out_arr],
        names=[f.name for f in rb.schema] + [out],
    )


def l2_normalize_embeddings(
    df: DataFrame, col: str = "embedding", out: str = "unit"
) -> DataFrame:
    """Append a unit-L2-norm copy of an ``array<float>`` column,
    computed with numpy over raw Arrow buffers (``mapInArrow``).
    Zero-norm vectors pass through unchanged (no NaN poisoning);
    null embeddings stay null; empty embeddings stay empty.

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
        for rb in it:
            yield _l2_normalize_batch(rb, col, out)

    return df.mapInArrow(batches, schema)
