"""Z-order layout: the written files must actually enable min/max
pruning — per-file column spans far tighter than the table span on
EVERY participating column, which a single-column sort cannot give."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.layout import (
    interleave_bits,
    quantize,
    zorder,
    zvalue_for,
)


def test_quantize_edges(spark):
    df = spark.range(1).select(
        quantize(F.lit(5.0), F.lit(0.0), F.lit(10.0), 8).alias("mid"),
        quantize(F.lit(0.0), F.lit(0.0), F.lit(10.0), 8).alias("lo"),
        quantize(F.lit(10.0), F.lit(0.0), F.lit(10.0), 8).alias("hi"),
        quantize(F.lit(7.0), F.lit(7.0), F.lit(7.0), 8).alias("degenerate"),
        quantize(F.lit(None).cast("double"), F.lit(0.0), F.lit(1.0), 8).alias("null"),
        quantize(F.lit(99.0), F.lit(0.0), F.lit(10.0), 8).alias("above"),
    )
    r = df.first()
    assert r.lo == 0 and r.hi == 255 and 120 <= r.mid <= 135
    assert r.degenerate == 0 and r.null == 0 and r.above == 255


def test_interleave_bits_morton():
    # z(x=0b11, y=0b00) with 2 bits: x bits at even positions -> 0b0101
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    r = spark.range(1).select(
        interleave_bits([F.lit(3).cast("long"), F.lit(0).cast("long")], 2).alias("a"),
        interleave_bits([F.lit(0).cast("long"), F.lit(3).cast("long")], 2).alias("b"),
        interleave_bits([F.lit(3).cast("long"), F.lit(3).cast("long")], 2).alias("c"),
    ).first()
    assert (r.a, r.b, r.c) == (0b0101, 0b1010, 0b1111)


def _file_spans(path, col):
    spans = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    los.append(c.statistics.min)
                    his.append(c.statistics.max)
        if los:
            spans.append(max(his) - min(los))
    return spans


def test_zorder_tightens_file_spans(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "value")
    n_files = 8
    naive = str(tmp_path / "naive")
    zed = str(tmp_path / "zorder")
    # naive: whatever partitioning the scan had, rebalanced round-robin
    ev.repartition(n_files).write.parquet(naive)
    zorder(ev, ["user_id", "value"], bits=8, num_files=n_files).write.parquet(zed)

    table_span_u = ev.agg(F.max("user_id") - F.min("user_id")).first()[0]
    naive_spans = _file_spans(naive, "user_id")
    z_spans = _file_spans(zed, "user_id")
    # round-robin files each cover ~the whole domain; z-ordered files
    # cover tight slices -> average span at most half the naive average
    assert sum(naive_spans) / len(naive_spans) > 0.8 * table_span_u
    assert sum(z_spans) / len(z_spans) < 0.5 * sum(naive_spans) / len(naive_spans)
    # AND the second column also tightens (single-column sort can't)
    naive_v = _file_spans(naive, "value")
    z_v = _file_spans(zed, "value")
    assert sum(z_v) / len(z_v) < 0.8 * sum(naive_v) / len(naive_v)


def test_zvalue_deterministic(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = zvalue_for(ev, ["user_id", "value"]).agg(F.sum("__zvalue")).first()[0]
    b = zvalue_for(ev, ["user_id", "value"]).agg(F.sum("__zvalue")).first()[0]
    assert a == b


def test_compact_files(spark, sf_dir, tmp_path):
    from dump_es_parquet_spark.operators.layout import compact_files

    frag = str(tmp_path / "fragmented")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ev.repartition(40).write.parquet(frag)  # simulate a streamy dump
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 40

    out = str(tmp_path / "compacted")
    # target sized so the whole table fits in one file at test scale
    n = compact_files(spark, frag, out, target_mb=64)
    files = glob.glob(f"{out}/part-*.parquet")
    assert n == 1 and len(files) == 1
    back = spark.read.parquet(out)
    assert back.count() == ev.count()

    # sort_col variant clusters while compacting
    out2 = str(tmp_path / "compacted_sorted")
    compact_files(spark, frag, out2, target_mb=64, sort_col="user_id")
    spans = _file_spans(out2, "user_id")
    assert spans  # stats exist; single file spans whole domain, but sorted
    first = spark.read.parquet(out2).limit(1).first()
    assert first.user_id == spark.read.parquet(frag).agg(F.min("user_id")).first()[0]


def test_cached_artifact_lifecycle(tmp_path, monkeypatch):
    """The shared build-once cache (artifacts.cached_artifact): builds
    when the marker is missing, skips when present, surfaces a rename
    failure when no winner exists, and prunes only idle stale
    generations matching the caller's prefixes."""
    import os
    import time

    import dump_es_parquet_spark.artifacts as A

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    calls = []

    def build(stage):
        calls.append(stage)
        os.makedirs(os.path.join(stage, "sub"), exist_ok=True)
        open(os.path.join(stage, "sub", "_OK"), "w").close()

    p1 = A.cached_artifact("art_x", os.path.join("sub", "_OK"), build)
    assert os.path.exists(os.path.join(p1, "sub", "_OK")) and len(calls) == 1
    # second call: marker present, no rebuild
    assert A.cached_artifact("art_x", os.path.join("sub", "_OK"), build) == p1
    assert len(calls) == 1

    # a failing build cleans its staging dir and propagates
    def bad(stage):
        raise RuntimeError("boom")

    try:
        A.cached_artifact("art_y", "_OK", bad)
        raise AssertionError("should have raised")
    except RuntimeError:
        pass
    assert not [d for d in os.listdir(tmp_path) if d.startswith("art_y_stage_")]

    # stale pruning: an idle old generation with the prefix goes, the
    # fresh one and non-matching dirs stay
    old = tmp_path / "art_old_gen"
    old.mkdir()
    os.utime(old, (time.time() - 2 * A.STALE_AFTER_S,) * 2)
    keepme = tmp_path / "unrelated"
    keepme.mkdir()
    os.utime(keepme, (time.time() - 2 * A.STALE_AFTER_S,) * 2)
    A.cached_artifact("art_z", os.path.join("sub", "_OK"), build,
                      stale_prefixes=("art_",))
    assert not old.exists() and keepme.exists()
    assert os.path.isdir(tmp_path / "art_x")  # fresh mtime → survives

    # a cache HIT refreshes mtime, so a days-old but still-read cache
    # is never "idle" for the pruning cutoff
    os.utime(tmp_path / "art_x", (time.time() - 2 * A.STALE_AFTER_S,) * 2)
    A.cached_artifact("art_x", os.path.join("sub", "_OK"), build)
    assert os.stat(tmp_path / "art_x").st_mtime > time.time() - 60
