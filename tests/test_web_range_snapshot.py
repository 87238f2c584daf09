"""Unit tests for the round-6 additions: binned range join, snapshot
compaction, and web-corpus curation (URL canonicalization / domain
caps). The end-to-end oracle checks live in test_operators.py via the
demoted-query harness; these pin the operator APIs directly."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.rangejoin import bin_range_join
from dump_es_parquet_spark.operators.snapshot import compact_latest
from dump_es_parquet_spark.operators.web import (
    cap_per_group,
    normalize_url,
    registrable_domain,
)


# ---------------------------------------------------------------------------
# bin_range_join
# ---------------------------------------------------------------------------


def _naive(points, ranges, closed):
    ops = {
        "left": lambda p, lo, hi: (p >= lo) & (p < hi),
        "right": lambda p, lo, hi: (p > lo) & (p <= hi),
        "both": lambda p, lo, hi: (p >= lo) & (p <= hi),
        "neither": lambda p, lo, hi: (p > lo) & (p < hi),
    }[closed]
    return points.crossJoin(ranges).where(
        ops(F.col("p"), F.col("lo"), F.col("hi"))
    )


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
def test_bin_range_join_matches_naive(spark, closed):
    # irregular, overlapping, boundary-touching ranges; points on the
    # exact boundaries exercise every closed-ness mode
    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0.0, 1.0, 2.5, 7.0, 7.5, 15.0, 63.9, 64.0])],
        ["pid", "p"],
    )
    ranges = spark.createDataFrame(
        [(0, 0.0, 1.0), (1, 1.0, 7.5), (2, 5.0, 64.0), (3, 7.0, 7.0), (4, 60.0, 100.0)],
        ["rid", "lo", "hi"],
    )
    for w in (0.5, 3.0, 50.0):  # correctness must not depend on bin width
        got = sorted(
            (r.pid, r.rid)
            for r in bin_range_join(
                points, ranges, "p", "lo", "hi", bin_width=w, closed=closed
            ).collect()
        )
        want = sorted((r.pid, r.rid) for r in _naive(points, ranges, closed).collect())
        assert got == want, f"closed={closed} w={w}"


def test_bin_range_join_no_nested_loop(spark):
    """The whole point: the physical plan must be a hash/broadcast
    equi-join, never BroadcastNestedLoopJoin."""
    points = spark.range(100).select(F.col("id").cast("double").alias("p"))
    ranges = spark.range(5).select(
        (F.col("id") * 10).cast("double").alias("lo"),
        (F.col("id") * 10 + 15).cast("double").alias("hi"),
    )
    binned = bin_range_join(points, ranges, "p", "lo", "hi", bin_width=10.0)
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMerge" in plan
    # and the un-hinted naive formulation indeed degenerates, proving
    # the rewrite is load-bearing
    naive_plan = (
        points.join(
            ranges, (F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi"))
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" in naive_plan


def test_bin_range_join_validates(spark):
    df = spark.range(1).select(F.col("id").cast("double").alias("p"))
    r = spark.createDataFrame([(0.0, 1.0)], ["lo", "hi"])
    with pytest.raises(ValueError):
        bin_range_join(df, r, "p", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError):
        bin_range_join(df, r, "p", "lo", "hi", bin_width=1.0, closed="open")


# ---------------------------------------------------------------------------
# compact_latest
# ---------------------------------------------------------------------------


def test_compact_latest_last_write_wins(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, payload="old", ts=1, gen=1),
            Row(id=1, payload="new", ts=2, gen=1),
            Row(id=1, payload="newer", ts=2, gen=2),  # ts tie → gen breaks it
            Row(id=2, payload="only", ts=5, gen=1),
        ]
    )
    out = compact_latest(df, ["id"], ["ts", "gen"])
    assert out.columns == df.columns  # column order preserved
    rows = {r.id: r.payload for r in out.collect()}
    assert rows == {1: "newer", 2: "only"}


def test_compact_latest_validates(spark):
    df = spark.createDataFrame([Row(id=1, v=1)])
    with pytest.raises(ValueError):
        compact_latest(df, ["id"], ["nope"])


def test_compact_latest_is_aggregate_not_window(spark):
    """Plan check: partial aggregation before the shuffle (map-side
    collapse of co-resident generations), and no Window/Sort node."""
    df = spark.createDataFrame([Row(id=1, v="a", gen=1)])
    plan = (
        compact_latest(df, ["id"], ["gen"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "partial_max_by" in plan.lower() or "HashAggregate" in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

finite = st.floats(
    min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(finite, min_size=0, max_size=8),
    ranges=st.lists(st.tuples(finite, finite), min_size=0, max_size=5),
    width=st.sampled_from([0.5, 7.0, 100.0]),
    closed=st.sampled_from(["left", "right", "both", "neither"]),
)
def test_bin_range_join_property(spark, points, ranges, width, closed):
    """Arbitrary floats (boundary-coincident, negative, empty frames):
    binned result set-equals the naive cross-join filter, for every
    closed-ness and bin width."""
    pdf = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(points)], "pid long, p double"
    )
    rdf = spark.createDataFrame(
        [(i, float(min(a, b)), float(max(a, b))) for i, (a, b) in enumerate(ranges)],
        "rid long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.rid)
        for r in bin_range_join(
            pdf, rdf, "p", "lo", "hi", bin_width=width, closed=closed
        ).collect()
    )
    want = sorted((r.pid, r.rid) for r in _naive(pdf, rdf, closed).collect())
    assert got == want


def test_snapshot_diff_statuses(spark):
    from dump_es_parquet_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", None), (2, "b", "x"), (3, "c", "y"), (4, None, "z")],
        ["id", "v", "w"],
    )
    new = spark.createDataFrame(
        [(2, "b", "x"), (3, "CHANGED", "y"), (4, None, "z"), (5, "e", None)],
        ["id", "v", "w"],
    )
    got = {r.id: r.change_status for r in snapshot_diff(old, new, ["id"]).collect()}
    # null-safe compare: id=4 has NULL v on both sides -> unchanged
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"}


def test_snapshot_diff_compare_subset(spark):
    from dump_es_parquet_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame([(1, "a", 10)], ["id", "v", "noise"])
    new = spark.createDataFrame([(1, "a", 99)], ["id", "v", "noise"])
    full = snapshot_diff(old, new, ["id"]).first().change_status
    sub = snapshot_diff(old, new, ["id"], compare_cols=["v"]).first().change_status
    assert (full, sub) == ("changed", "unchanged")


# ---------------------------------------------------------------------------
# web curation
# ---------------------------------------------------------------------------

URL_CASES = [
    # lowercase scheme+host, default port stripped, fragment dropped,
    # tracking param removed, real param kept, path case preserved
    (
        "HTTP://Example.COM:80/Path?utm_source=x&q=1#frag",
        "http://example.com/Path?q=1",
    ),
    ("https://example.com:443/a", "https://example.com/a"),
    ("https://example.com:8443/a?b=2", "https://example.com:8443/a?b=2"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com/?utm_campaign=z&fbclid=1", "https://example.com/"),
    ("https://example.com/a?gclid=9&x=1&y=2", "https://example.com/a?x=1&y=2"),
    (None, None),
    ("not a url", None),
]


def test_normalize_url(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(URL_CASES)], ["i", "url"]
    )
    got = {
        r.i: r.n
        for r in df.select("i", normalize_url(F.col("url")).alias("n")).collect()
    }
    for i, (_, want) in enumerate(URL_CASES):
        assert got[i] == want, f"case {i}: {URL_CASES[i][0]!r} -> {got[i]!r}"


DOMAIN_CASES = [
    ("www.example.co.uk", "example.co.uk"),
    ("a.b.example.com", "example.com"),
    ("example.com", "example.com"),
    ("localhost", "localhost"),
    ("192.168.0.1", "192.168.0.1"),
    ("news.bbc.co.uk", "bbc.co.uk"),
]


def test_registrable_domain(spark):
    df = spark.createDataFrame(DOMAIN_CASES, ["host", "want"])
    for r in df.select(
        "host", "want", registrable_domain(F.col("host")).alias("got")
    ).collect():
        assert r.got == r.want, f"{r.host}: {r.got!r} != {r.want!r}"


def test_cap_per_group(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b") for i in range(5 if g == "a" else 2)],
        ["g", "i"],
    )
    out = cap_per_group(df, ["g"], 3, F.col("i"))
    counts = {r.g: r.n for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 3, "b": 2}
    # order_col=i ascending keeps the smallest i's
    assert sorted(r.i for r in out.where(F.col("g") == "a").collect()) == [0, 1, 2]


# ---------------------------------------------------------------------------
# bucket-partitioned parquet upsert (the parquet-only MERGE)
# ---------------------------------------------------------------------------


def _state_rows(spark, path):
    return {
        r.id: (r.v, r.gen)
        for r in spark.read.parquet(path).select("id", "v", "gen").collect()
    }


def test_upsert_latest_merges_and_prunes(spark, tmp_path):
    import glob
    import os

    from dump_es_parquet_spark.operators.snapshot import upsert_latest

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(20)], ["id", "v", "gen"]
    )
    upsert_latest(b1, state, ["id"], ["gen"], n_buckets=8)
    assert _state_rows(spark, state) == {i: (f"v{i}", 1) for i in range(20)}

    # snapshot per-bucket file listing before the incremental merge
    before = {
        d: sorted(os.listdir(os.path.join(state, d)))
        for d in os.listdir(state)
        if d.startswith("__kbucket=")
    }
    b2 = spark.createDataFrame([(3, "UPDATED", 2), (99, "NEW", 1)], ["id", "v", "gen"])
    upsert_latest(b2, state, ["id"], ["gen"], n_buckets=8)
    rows = _state_rows(spark, state)
    assert rows[3] == ("UPDATED", 2) and rows[99] == ("NEW", 1)
    assert len(rows) == 21 and rows[5] == ("v5", 1)

    # untouched buckets keep their exact files (partition-scoped rewrite)
    from pyspark.sql import functions as F

    touched = {
        f"__kbucket={r[0]}"
        for r in spark.createDataFrame([(3,), (99,)], ["id"])
        .select(F.pmod(F.xxhash64("id"), F.lit(8)))
        .collect()
    }
    after = {
        d: sorted(os.listdir(os.path.join(state, d)))
        for d in os.listdir(state)
        if d.startswith("__kbucket=")
    }
    untouched = set(before) - touched
    assert untouched, "test needs at least one untouched bucket"
    for d in untouched:
        assert after[d] == before[d], f"bucket {d} was rewritten needlessly"


def test_upsert_latest_idempotent(spark, tmp_path):
    from dump_es_parquet_spark.operators.snapshot import upsert_latest

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], ["id", "v", "gen"])
    b2 = spark.createDataFrame([(2, "B", 2)], ["id", "v", "gen"])
    upsert_latest(b1, state, ["id"], ["gen"], n_buckets=4)
    upsert_latest(b2, state, ["id"], ["gen"], n_buckets=4)
    first = _state_rows(spark, state)
    upsert_latest(b2, state, ["id"], ["gen"], n_buckets=4)  # at-least-once replay
    assert _state_rows(spark, state) == first == {1: ("a", 1), 2: ("B", 2)}


def test_follow_upsert_stream(spark, tmp_path):
    """foreachBatch wrapper: tail a growing parquet dir as a stream,
    state converges to last-write-wins across restarts."""
    import time

    from dump_es_parquet_spark.operators.snapshot import follow_upsert

    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    spark.createDataFrame([(1, "a", 1), (2, "b", 1)], ["id", "v", "gen"]).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("id long, v string, gen long").parquet(src)
    q = follow_upsert(stream, state, ck, ["id"], ["gen"], n_buckets=4)
    q.awaitTermination(60)
    assert _state_rows(spark, state) == {1: ("a", 1), 2: ("B", 2)} or _state_rows(
        spark, state
    ) == {1: ("a", 1), 2: ("b", 1)}

    # second increment, new stream run from the same checkpoint
    spark.createDataFrame([(2, "B", 2), (3, "c", 1)], ["id", "v", "gen"]).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema("id long, v string, gen long").parquet(src)
    q = follow_upsert(stream, state, ck, ["id"], ["gen"], n_buckets=4)
    q.awaitTermination(60)
    assert _state_rows(spark, state) == {1: ("a", 1), 2: ("B", 2), 3: ("c", 1)}


def test_upsert_latest_recovers_mid_swap_crash(spark, tmp_path):
    """Crash window the old dynamic-partition-overwrite could not
    survive (ADVICE r06): live bucket renamed away, staged bucket not
    yet in place. Simulate exactly that filesystem state and assert the
    next upsert call first ROLLS BACK (no data loss), then re-applies
    the batch to the full prior state."""
    import os
    import shutil

    from dump_es_parquet_spark.operators.snapshot import upsert_latest

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(20)], ["id", "v", "gen"]
    )
    upsert_latest(b1, state, ["id"], ["gen"], n_buckets=4)
    before = _state_rows(spark, state)

    # forge the mid-swap crash: one live bucket sits in _backup-, its
    # replacement sits in a _staging- dir that never got renamed in
    bucket = next(d for d in os.listdir(state) if d.startswith("__kbucket="))
    bkt_id = bucket.split("=")[1]
    os.rename(os.path.join(state, bucket), os.path.join(state, f"_backup-b{bkt_id}"))
    staging = os.path.join(state, "_staging-deadbeef")
    os.makedirs(os.path.join(staging, bucket))

    # readers between crash and recovery simply miss the bucket —
    # but nothing is permanently lost:
    assert len(_state_rows(spark, state)) < 20

    b2 = spark.createDataFrame([(3, "UPDATED", 2)], ["id", "v", "gen"])
    upsert_latest(b2, state, ["id"], ["gen"], n_buckets=4)
    rows = _state_rows(spark, state)
    assert rows[3] == ("UPDATED", 2)
    assert {k: v for k, v in rows.items() if k != 3} == {
        k: v for k, v in before.items() if k != 3
    }
    # recovery swept the staging/backup litter
    assert not [d for d in os.listdir(state) if d.startswith(("_staging", "_backup"))]
    shutil.rmtree(staging, ignore_errors=True)


def test_upsert_latest_recovers_completed_swap_backup(spark, tmp_path):
    """The other crash window: staged dir already renamed into place,
    backup not yet deleted. Recovery must keep the NEW bucket and drop
    the stale backup — not resurrect old generations."""
    import os

    from dump_es_parquet_spark.operators.snapshot import upsert_latest

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], ["id", "v", "gen"])
    upsert_latest(b1, state, ["id"], ["gen"], n_buckets=2)
    b2 = spark.createDataFrame([(2, "B", 2)], ["id", "v", "gen"])
    upsert_latest(b2, state, ["id"], ["gen"], n_buckets=2)

    # forge: a stale backup of SOME bucket alongside its live (newer) dir
    bucket = next(d for d in os.listdir(state) if d.startswith("__kbucket="))
    backup = os.path.join(state, f"_backup-b{bucket.split('=')[1]}")
    os.makedirs(backup)
    with open(os.path.join(backup, "junk.parquet"), "wb") as f:
        f.write(b"not read")

    upsert_latest(
        spark.createDataFrame([(1, "a2", 2)], ["id", "v", "gen"]),
        state, ["id"], ["gen"], n_buckets=2,
    )
    assert _state_rows(spark, state) == {1: ("a2", 2), 2: ("B", 2)}
    assert not os.path.exists(backup)


def test_upsert_latest_crash_at_every_rename_never_loses_rows(spark, tmp_path):
    """Fault injection: kill the merge at EVERY successive rename in
    the swap loop; after each crash the next (uninjected) merge must
    recover to the exact correct state — no bucket lost, no stale
    resurrection, regardless of where the previous attempt died."""
    import dump_es_parquet_spark.operators.snapshot as snap

    b1 = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(40)], ["id", "v", "gen"]
    )
    b2 = spark.createDataFrame(
        [(i, f"V{i}", 2) for i in range(0, 40, 3)] + [(99, "NEW", 1)],
        ["id", "v", "gen"],
    )
    expected = {i: (f"V{i}", 2) if i % 3 == 0 else (f"v{i}", 1) for i in range(40)}
    expected[99] = ("NEW", 1)

    real_rename = snap._rename_or_raise
    crash_point = 0
    while True:
        state = str(tmp_path / f"state_{crash_point}")
        snap.upsert_latest(b1, state, ["id"], ["gen"], n_buckets=4)

        calls = {"n": 0}

        def failing(fs, src, dst, _cp=crash_point):
            if calls["n"] >= _cp:
                raise IOError("injected crash")
            calls["n"] += 1
            return real_rename(fs, src, dst)

        snap._rename_or_raise = failing
        try:
            snap.upsert_latest(b2, state, ["id"], ["gen"], n_buckets=4)
            crashed = False
        except IOError:
            crashed = True
        finally:
            snap._rename_or_raise = real_rename

        # whatever the crash point, a clean re-merge must converge
        snap.upsert_latest(b2, state, ["id"], ["gen"], n_buckets=4)
        assert _state_rows(spark, state) == expected, f"crash point {crash_point}"
        if not crashed:  # swap completed without hitting the injection
            break
        crash_point += 1
    assert crash_point >= 2  # the loop actually exercised mid-swap crashes


def test_recover_state_reader_side(spark, tmp_path):
    """A read-only consumer can heal a crashed swap without merging:
    recover_state restores the hidden bucket, and the full row set is
    visible again."""
    import os

    from dump_es_parquet_spark.operators.snapshot import (
        recover_state,
        upsert_latest,
    )

    state = str(tmp_path / "state")
    b1 = spark.createDataFrame(
        [(i, f"v{i}", 1) for i in range(20)], ["id", "v", "gen"]
    )
    upsert_latest(b1, state, ["id"], ["gen"], n_buckets=4)
    before = _state_rows(spark, state)
    bucket = next(d for d in os.listdir(state) if d.startswith("__kbucket="))
    os.rename(
        os.path.join(state, bucket),
        os.path.join(state, f"_backup-b{bucket.split('=')[1]}"),
    )
    assert len(_state_rows(spark, state)) < 20  # bucket hidden
    recover_state(spark, state)
    assert _state_rows(spark, state) == before
    recover_state(spark, state)  # idempotent
    assert _state_rows(spark, state) == before
