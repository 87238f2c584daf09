"""Snapshot compaction for incremental re-dumps.

The reference dumps an index once; real operation re-dumps it (or
tails it with ``--follow``), so the lake accumulates MULTIPLE
generations of the same document ``_id`` — exactly Elasticsearch's
own versioning model (``_id`` + ``_version``/``_seq_no``: last write
wins). ``compact_latest`` collapses the union of generations back to
one row per key.

Scale shape: the naive plan is a window
(``row_number() OVER (PARTITION BY key ORDER BY version DESC)``),
which shuffles EVERY generation row and then sorts each key group.
We use ``max_by(struct(payload), struct(version))`` instead — an
aggregate, so Spark runs a map-side partial aggregation first:
duplicate generations co-resident in an input partition collapse
BEFORE the shuffle, and no per-key sort ever happens. On a lake where
most keys have 2-5 generations that is a several-fold shuffle-volume
cut over the window plan; at worst (all keys unique) it degrades to
the same one-shuffle cost.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_latest(
    df: DataFrame, keys: list[str], version_cols: list[str]
) -> DataFrame:
    """One row per ``keys``: the payload of the row with the greatest
    ``version_cols`` tuple (lexicographic struct comparison — put a
    unique tiebreaker last, e.g. ``["_seq_no"]`` or ``["ts", "gen"]``;
    ties are otherwise nondeterministic, as in any last-write-wins
    system). Output column order is preserved."""
    missing = [c for c in keys + version_cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    payload = [c for c in df.columns if c not in keys]
    latest = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(*[F.col(c) for c in version_cols]),
    ).alias("__latest")
    out = df.groupBy(*[F.col(k) for k in keys]).agg(latest)
    return out.select(
        *[F.col(c) if c in keys else F.col("__latest")[c].alias(c) for c in df.columns]
    )


BUCKET_COL = "__kbucket"


def upsert_latest(
    batch: DataFrame,
    state_path: str,
    keys: list[str],
    version_cols: list[str],
    n_buckets: int = 64,
) -> None:
    """Merge a batch of new document generations into a persisted
    "latest state" parquet table, last-write-wins — the parquet-only
    MERGE.

    Plain parquet cannot update in place, and rewriting the whole
    state per increment is O(state) — the 100 TB killer. Instead the
    state table is hive-partitioned by a key-hash bucket
    (``pmod(xxhash64(keys), n_buckets)``); an increment rewrites ONLY
    the buckets its keys touch (dynamic partition overwrite), so merge
    cost is O(state/n_buckets × touched_buckets + batch), independent
    of total state when increments are concentrated. Size ``n_buckets``
    so one bucket ≈ a comfortable task (state_bytes / ~512 MB).

    Idempotent by construction: re-applying the same batch (foreachBatch
    is at-least-once) recomputes identical bucket contents. Not safe
    for CONCURRENT writers — one merge job at a time.

    Crash safety (ADVICE r06): dynamic partition overwrite deletes the
    old bucket files before renaming the staged ones into place, so a
    crash in that window would permanently lose the touched buckets.
    Instead the merged buckets are fully written to an
    underscore-prefixed staging dir (invisible to partition discovery),
    then each bucket dir is swapped in two renames with a backup held
    in between — NO crash point loses data: every bucket's complete
    old or complete new contents survive on disk, and the next merge's
    ``_recover_interrupted_merge`` rolls the swap forward or back
    before reading state. Reader caveat: between a mid-swap crash and
    the next merge, a bucket can sit in its ``_backup-`` name and be
    invisible to partition discovery — a reader that must not observe
    that window calls :func:`recover_state` first (recovery is
    idempotent and cheap: one directory listing when nothing is
    wrong). On stores without atomic dir rename — raw S3 — front this
    with a rename-capable layer, the same caveat every rename-committer
    pipeline carries."""
    spark = batch.sparkSession
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    b = batch.withColumn(BUCKET_COL, bucket)
    # Hadoop FS (not os.path) so object-store state paths work
    Path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = Path(state_path + "/_SUCCESS")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        # bootstrap still compacts: one batch can carry several
        # generations of a key (a backfill drain always does)
        compact_latest(b, keys, version_cols).write.partitionBy(
            BUCKET_COL
        ).mode("overwrite").parquet(state_path)
        return
    _recover_interrupted_merge(fs, Path, state_path)
    touched = [r[BUCKET_COL] for r in b.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    state = spark.read.parquet(state_path).where(
        F.col(BUCKET_COL).isin(touched)  # partition-pruned scan
    )
    merged = compact_latest(
        state.select(b.columns).unionByName(b), keys, version_cols
    )
    # Phase 1: materialize the merged buckets WITHOUT touching live
    # dirs (the lazy `state` read above executes here, against the
    # still-intact live buckets).
    staging = f"{state_path}/{STAGING_PREFIX}-{uuid.uuid4().hex}"
    merged.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(staging)
    # Phase 2: per-bucket swap — backup-rename the live dir, rename the
    # staged dir into place, drop the backup.
    for bkt in touched:
        live = Path(f"{state_path}/{BUCKET_COL}={bkt}")
        backup = Path(f"{state_path}/{BACKUP_PREFIX}{bkt}")
        if fs.exists(live):
            _rename_or_raise(fs, live, backup)
        _rename_or_raise(fs, Path(f"{staging}/{BUCKET_COL}={bkt}"), live)
        fs.delete(backup, True)
    fs.delete(Path(staging), True)


#: Underscore-prefixed names with NO ``=``: Spark prunes ``_``/``.``
#: dirs from recursive listing, so in-flight staging (and the nested
#: ``__kbucket=`` dirs under it) and backups are invisible to readers
#: of ``state_path`` — but a top-level dir name CONTAINING ``=`` would
#: still be parsed as a partition column and break discovery, so the
#: backup name carries only the numeric bucket id.
STAGING_PREFIX = "_staging"
BACKUP_PREFIX = "_backup-b"


def _rename_or_raise(fs, src, dst) -> None:
    """Hadoop FileSystem.rename reports failure by returning False —
    surface it, or a failed swap would silently drop a bucket."""
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst}")


def recover_state(spark: SparkSession, state_path: str) -> None:
    """Reader-side crash recovery: finish or roll back an interrupted
    ``upsert_latest`` swap so every bucket is visible again. Call
    before reading a state table whose writer may have died mid-merge
    (the next merge would also recover, but a read-only consumer never
    triggers one). Idempotent; single-writer contract applies — don't
    run concurrently with a live merge."""
    Path = spark._jvm.org.apache.hadoop.fs.Path
    fs = Path(state_path).getFileSystem(spark._jsc.hadoopConfiguration())
    _recover_interrupted_merge(fs, Path, state_path)


def _recover_interrupted_merge(fs, Path, state_path: str) -> None:
    """Single-writer crash recovery for ``upsert_latest``'s bucket
    swap: a leftover ``_backup-…`` dir means a previous merge died
    mid-swap — if its live bucket dir exists the swap completed (drop
    the backup), otherwise roll back (rename the backup into place).
    Leftover ``_staging-…`` dirs are never referenced once their swap
    loop finished, so they are plain garbage."""
    root = Path(state_path)
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(BACKUP_PREFIX):
            bkt = name[len(BACKUP_PREFIX):]
            live = Path(f"{state_path}/{BUCKET_COL}={bkt}")
            if fs.exists(live):
                fs.delete(st.getPath(), True)
            else:
                _rename_or_raise(fs, st.getPath(), live)
        elif name.startswith(STAGING_PREFIX + "-"):
            fs.delete(st.getPath(), True)


def follow_upsert(
    stream_df: DataFrame,
    state_path: str,
    checkpoint: str,
    keys: list[str],
    version_cols: list[str],
    n_buckets: int = 64,
    trigger: dict | None = None,
):
    """Streaming tail of ``upsert_latest``: each ``--follow``
    micro-batch merges into the latest-state table instead of
    appending history (``foreachBatch`` — Structured Streaming's idiom
    for sinks with external state). At-least-once delivery composes
    with the merge's idempotence to effectively-once state."""

    def _merge(b: DataFrame, _epoch: int) -> None:
        upsert_latest(b, state_path, keys, version_cols, n_buckets)

    w = stream_df.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    return w.trigger(**(trigger or {"availableNow": True})).start()


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change-data capture between two dump generations: one row per
    key present in either, with ``change_status`` ∈ added / removed /
    changed / unchanged (ES has no CDC API below 're-dump and diff' —
    this is the diff).

    Scale shape: a single full-outer sort-merge join on the keys (both
    sides shuffle once); change detection is a null-safe struct
    comparison (``<=>``), evaluated inside the join's projection — no
    per-column join conditions, no second pass. For very wide rows
    pass ``compare_cols`` to diff a subset (e.g. exclude ingest
    timestamps that always churn)."""
    missing = [k for k in keys if k not in old.columns or k not in new.columns]
    if missing:
        raise ValueError(f"key columns not in both frames: {missing}")
    payload = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c) for c in payload]).alias("__old"),
    )
    n = new.select(
        *[F.col(k).alias(k) for k in keys],
        F.struct(*[F.col(c) for c in payload]).alias("__new"),
    )
    joined = o.join(n, on=keys, how="full_outer")
    status = (
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .when(F.col("__old").eqNullSafe(F.col("__new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("change_status"))


def q_events_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo: generation 2 re-dump where every 97th doc was deleted,
    every 10th surviving doc updated, and a shifted-id clone of every
    101st doc added. The diff summary must count each class exactly;
    the oracle recomputes it with FULL JOIN + IS DISTINCT FROM."""
    from dump_es_parquet_spark.operators.tables import load

    ev = load(spark, sf_dir, "events")
    survivors = ev.where(F.col("event_id") % 97 != 0)
    updated = survivors.withColumn(
        "value",
        F.when(F.col("event_id") % 10 == 0, F.col("value") * 2).otherwise(
            F.col("value")
        ),
    )
    added = ev.where(F.col("event_id") % 101 == 0).withColumn(
        "event_id", F.col("event_id") + 10_000_000
    )
    new = updated.unionByName(added)
    d = snapshot_diff(ev, new, ["event_id"], compare_cols=["value", "event_type"])
    return (
        d.groupBy("change_status")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("event_id").cast("long").alias("key_sum"),
        )
        .orderBy("change_status")
    )


def q_events_compact_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo on the events table: generation 1 is the original dump;
    generation 2 "re-dumps" every 10th document a day later with an
    updated value. ``compact_latest`` keyed on ``event_id`` versioned
    by ``gen`` must keep exactly the updated rows for those keys, then
    summarize per event type. The oracle recomputes last-write-wins
    with a QUALIFY row_number window — same answer, different (slower)
    plan, which is the point."""
    from dump_es_parquet_spark.operators.tables import load

    ev = load(spark, sf_dir, "events")
    gen1 = ev.withColumn("gen", F.lit(1))
    gen2 = (
        ev.where(F.col("event_id") % 10 == 0)
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
        .withColumn("value", F.col("value") * 2)
        .withColumn("gen", F.lit(2))
    )
    latest = compact_latest(
        gen1.unionByName(gen2), ["event_id"], ["gen"]
    )
    return (
        latest.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("gen") == 2, 1).otherwise(0))
            .cast("long")
            .alias("n_updated"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("event_type")
    )
