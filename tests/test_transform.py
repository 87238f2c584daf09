"""ES-transforms parity invariants: the continuous (incremental
additive merge) form must equal the one-shot batch pivot, replays
must not double-count, and only mergeable aggregations compile."""

import pytest
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.tables import load
from dump_es_parquet_spark.operators.transform import (
    AGGREGATIONS,
    GROUP_BY,
    read_transform,
    transform_merge,
    transform_pivot,
)


def _canon(df):
    return sorted(
        tuple(str(v) for v in row)
        for row in df.select(*sorted(df.columns)).collect()
    )


def test_two_batch_merge_equals_pivot(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    state = str(tmp_path / "tf_state")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    transform_merge(half1, state, GROUP_BY, AGGREGATIONS, epoch=0)
    transform_merge(half2, state, GROUP_BY, AGGREGATIONS, epoch=1)
    got = read_transform(spark, state, AGGREGATIONS)
    want = transform_pivot(ev, GROUP_BY, AGGREGATIONS)
    assert _canon(got) == _canon(want)
    assert got.count() > 0


def test_replayed_epoch_is_ignored(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events")
    state = str(tmp_path / "tf_state")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    transform_merge(half1, state, GROUP_BY, AGGREGATIONS, epoch=0)
    transform_merge(half2, state, GROUP_BY, AGGREGATIONS, epoch=1)
    before = _canon(read_transform(spark, state, AGGREGATIONS))
    # at-least-once replay of epoch 1 (and a stale epoch 0) must be
    # no-ops — additive merges would otherwise double-count
    transform_merge(half2, state, GROUP_BY, AGGREGATIONS, epoch=1)
    transform_merge(half1, state, GROUP_BY, AGGREGATIONS, epoch=0)
    assert _canon(read_transform(spark, state, AGGREGATIONS)) == before


def test_merge_math_min_max_avg(spark, tmp_path):
    state = str(tmp_path / "tf_state")
    gb = {"k": {"terms": {"field": "k"}}}
    aggs = {
        "lo": {"min": {"field": "n"}},
        "hi": {"max": {"field": "n"}},
        "mean": {"avg": {"field": "n"}},
    }
    b1 = spark.createDataFrame([("a", 1.0), ("a", 3.0)], ["k", "n"])
    b2 = spark.createDataFrame([("a", 10.0), ("b", 5.0)], ["k", "n"])
    transform_merge(b1, state, gb, aggs, epoch=0)
    transform_merge(b2, state, gb, aggs, epoch=1)
    rows = {r.k: r for r in read_transform(spark, state, aggs).collect()}
    a = rows["a"]
    assert (a.lo, a.hi, a.doc_count) == (1.0, 10.0, 3)
    assert abs(a.mean - 14.0 / 3.0) < 1e-12
    assert rows["b"].doc_count == 1


def test_unmergeable_aggs_refused(spark):
    df = spark.createDataFrame([("a", 1.0)], ["k", "n"])
    with pytest.raises(ValueError, match="sketches"):
        transform_pivot(
            df,
            {"k": {"terms": {"field": "k"}}},
            {"u": {"cardinality": {"field": "n"}}},
        )


def test_transform_latest(spark):
    """Round 13: the latest transform — most recent doc per entity
    under (sort, tiebreak); docs missing the key or sort drop;
    missing columns raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.transform import (
        transform_latest,
    )

    t = dt.datetime
    rows = [
        ("u1", t(2024, 1, 1), 1, "a"),
        ("u1", t(2024, 1, 3), 2, "b"),
        ("u1", t(2024, 1, 3), 3, "c"),   # sort tie → higher id wins
        ("u2", t(2024, 1, 2), 4, "d"),
        (None, t(2024, 1, 9), 5, "e"),   # no key → dropped
        ("u3", None, 6, "f"),            # no sort → entity absent
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, payload string"
    )
    got = {
        r.k: (r.ts, r.id, r.payload)
        for r in transform_latest(df, ["k"], "ts", "id").collect()
    }
    assert got == {
        "u1": (t(2024, 1, 3), 3, "c"),
        "u2": (t(2024, 1, 2), 4, "d"),
    }
    with pytest.raises(ValueError, match="no column"):
        transform_latest(df, ["k"], "nope", "id")
