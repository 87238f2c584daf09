"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind ``decode_image_stub`` (clearly marked; a real
deployment swaps in PIL/ffmpeg inside the same UDF signature). The
Spark-side plumbing — binary schema, Arrow batch shape, mapInPandas
partitioning, metadata extraction — is real and tested.

The testdata has no binary table, so ``with_binary_payload``
manufactures one from ``documents.text`` (utf-8 encode). At 100 TB the
same plan applies to real parquet ``binary`` columns: mapInPandas
streams Arrow batches per partition — no collect, memory bounded by
batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load

#: fake "decoded image" geometry parameters — deterministic from the
#: payload length so the pipeline is oracle-checkable end-to-end
FAKE_W_MOD, FAKE_H_MOD = 576, 344


def with_binary_payload(d: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type) — the opaque
    multimodal column + typed metadata pattern."""
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side metadata over binary payloads: size, content digest,
    magic-prefix — no Python, full codegen."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "media_type",
        F.octet_length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("magic_hex"),
    ).orderBy("doc_id")


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake geometry from payload length.

    A real deployment replaces this body with e.g.::

        from PIL import Image
        img = Image.open(io.BytesIO(payload)); return img.width, ...

    (image libs are not available in this container).
    """
    n = len(payload)
    width = 64 + n % FAKE_W_MOD
    height = 64 + n % FAKE_H_MOD
    n_frames = 1 + n % 4
    return width, height, n_frames


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: Arrow batch in → decoded-metadata batch out.
    Runs once per Arrow batch per partition; memory is bounded by
    batch size, not partition size."""
    for pdf in batches:
        decoded = pdf["payload"].map(decode_image_stub)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len),
                "width": decoded.map(lambda t: t[0]),
                "height": decoded.map(lambda t: t[1]),
                "n_frames": decoded.map(lambda t: t[2]),
            }
        )
        yield out


DECODE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, n_frames int"
)


def decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal decode pipeline: binary column →
    mapInPandas(stub decode) → typed metadata. The Python stage is
    Arrow-batched; everything before/after stays JVM-side.

    The UDF body is a nested closure so cloudpickle ships it *by
    value* — executors need no importable copy of this package (the
    driver harness may run from any cwd without our PYTHONPATH)."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    w_mod, h_mod = FAKE_W_MOD, FAKE_H_MOD

    def _decode(batches):
        import pandas as _pd

        for pdf in batches:
            n = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": 64 + n % w_mod,
                    "height": 64 + n % h_mod,
                    "n_frames": 1 + n % 4,
                }
            )

    return d.mapInPandas(_decode, DECODE_SCHEMA).orderBy("doc_id")


def frame_sample(spark: SparkSession, sf_dir: str, stride: int = 1000) -> DataFrame:
    """'Frame sampling' over binary payloads: slice fixed-offset chunks
    (as a video frame sampler would) — pure JVM substring over binary,
    exploded to one row per sampled frame."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return (
        d.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.floor((F.octet_length("payload") - 1) / stride).cast("int"),
                        F.lit(0),
                    ),
                )
            ).alias("frame_no"),
            F.col("payload"),
        )
        .select(
            "doc_id",
            "frame_no",
            F.lower(
                F.hex(
                    F.expr(f"substring(payload, frame_no * {stride} + 1, 16)")
                )
            ).alias("frame_hex"),
        )
        .orderBy("doc_id", "frame_no")
    )


def phash_stub_col(payload_col: str = "payload", bits: int = 32):
    """STUB perceptual hash over a binary payload: the top ``bits`` of
    md5(payload) as an integer signature — deterministic, engine-
    portable, oracle-checkable. A REAL pHash (decode → grayscale 8×8 →
    DCT sign bits, via a pandas UDF over the binary column) produces
    the same ``(doc_id, signature)`` frame shape; everything downstream
    (banding, hamming verify, transitive collapse) is signer-agnostic.
    The stub has no perceptual locality — only identical payloads
    collide — which is exactly what makes it exactly verifiable."""
    return F.conv(F.substring(F.md5(F.col(payload_col)), 1, bits // 4), 16, 10).cast(
        "long"
    )


def binary_near_dup(spark: SparkSession, sf_dir: str, max_hamming: int = 0) -> DataFrame:
    """Query form (oracle-checked): near-duplicate pairs over BINARY
    payloads via the generic banded hamming join
    (``dedup.hamming_band_pairs``) on stub perceptual-hash signatures.
    The multimodal dedup plumbing end to end — binary column → integer
    signature → banded candidates → exact hamming verify — with the
    decode/DCT step stubbed (see ``phash_stub_col``).

    The corpus carries text near-dups but no byte-identical payloads,
    so (as in the snapshot queries' synthetic generation 2) every 50th
    document is re-ingested under a shifted id — the duplicate shape a
    re-crawled image corpus actually produces; the expected pair set is
    exactly those clones plus any organic collisions."""
    from dump_es_parquet_spark.operators.dedup import hamming_band_pairs

    base = load(spark, sf_dir, "documents")
    clones = base.where(F.col("doc_id") % 50 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    d = with_binary_payload(base.unionByName(clones))
    sigs = d.select("doc_id", phash_stub_col().alias("phash"))
    return hamming_band_pairs(sigs, "phash", bits=32, bands=4,
                              max_hamming=max_hamming)
