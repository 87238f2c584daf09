"""ES transforms, lake-side: entity-centric continuous aggregation
(the ``_transform`` API — pivot a document stream into a per-entity
summary table, batch or continuous).

The reference dumps raw documents and stops; an ES user's transform
jobs (the "entity-centric index" pattern: per-customer totals,
per-day-per-user rollups) die with the cluster. ``transform_pivot``
is the one-shot batch form — composite-style ``group_by`` sources ×
metric aggregations, one shuffle. ``transform_merge`` +
``read_transform`` are the continuous form: each micro-batch is
partial-aggregated (map-side combine does most of the work), then
ADDITIVELY merged into a bucket-partitioned parquet state table
using the same staged-swap crash machinery as the latest-state
upsert (operators/snapshot.py) — an increment rewrites only the
key-hash buckets it touches, O(state/n_buckets × touched + batch),
never O(state).

Exactly-once under at-least-once replay: additive merges are NOT
naturally idempotent (replaying a micro-batch would double-count —
the last-write-wins upsert never had this problem), so every state
row carries the epoch of the merge that last rewrote its bucket,
and a merge SKIPS any touched bucket whose recorded epoch is >= the
incoming one. A crash mid-swap replays the batch and applies it
only to the buckets that missed it — per-bucket exactly-once, which
is exactly the granularity of the swap.

Only MERGEABLE aggregations are accepted (value_count / sum / min /
max, and avg carried as sum+count and finalized at read — the same
partial/final split Spark itself uses); exact cardinality and
percentiles are refused with the mergeable-sketch pointer
(operators/profile.py), mirroring es_search.streamable_aggs.

Reference: the ES _transform API surface the dump loses
(dump-es-parquet has no post-dump aggregation story at all —
README's endgame is DuckDB read_parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .es_search import _Level
from .snapshot import (
    BUCKET_COL,
    STAGING_PREFIX,
    _recover_interrupted_merge,
    _rename_or_raise,
)

__all__ = [
    "transform_pivot",
    "transform_merge",
    "read_transform",
]

EPOCH_COL = "__tf_epoch"

_MERGEABLE = ("value_count", "sum", "min", "max", "avg")


def _sources(group_by: dict) -> list[_Level]:
    out = []
    for name, spec in group_by.items():
        kinds = [k for k in spec if k in ("terms", "date_histogram", "histogram")]
        if len(kinds) != 1:
            raise ValueError(
                f"group_by {name!r} must be terms/date_histogram/histogram"
            )
        out.append(_Level(name, kinds[0], spec[kinds[0]]))
    return out


def _parse_aggs(aggregations: dict):
    """(name, kind, field) triples; only mergeable kinds pass."""
    out = []
    for name, spec in aggregations.items():
        kinds = [k for k in spec if k in _MERGEABLE]
        if len(kinds) != 1:
            raise ValueError(
                f"aggregation {name!r} must be one of {_MERGEABLE} — exact "
                "cardinality/percentiles are not mergeable; use the "
                "HLL/KLL sketches in operators/profile.py"
            )
        out.append((name, kinds[0], spec[kinds[0]]["field"]))
    return out


def _keyed(df: DataFrame, sources: list[_Level]) -> DataFrame:
    names = [s.name for s in sources]
    out = df.select(
        *[s.key_expr().alias(s.name) for s in sources],
        *[c for c in df.columns if c not in names],
    )
    for nm in names:
        out = out.filter(F.col(nm).isNotNull())
    return out


def _partial_exprs(aggs):
    """Partial (mergeable) columns for one batch: avg splits into
    ``<name>__sum`` (DECIMAL, association-free) + ``<name>__cnt``."""
    exprs = [F.count(F.lit(1)).alias("doc_count")]
    for name, kind, field in aggs:
        col = F.col(field)
        dec = col.cast("decimal(28,6)")
        if kind == "value_count":
            exprs.append(F.count(col).alias(name))
        elif kind == "sum":
            exprs.append(F.sum(dec).alias(name))
        elif kind == "min":
            exprs.append(F.min(col).alias(name))
        elif kind == "max":
            exprs.append(F.max(col).alias(name))
        else:  # avg
            exprs.append(F.sum(dec).alias(f"{name}__sum"))
            exprs.append(F.count(col).alias(f"{name}__cnt"))
    return exprs


def _merge_exprs(aggs):
    """Re-reduce already-partial columns (state ∪ new batch)."""
    exprs = [F.sum("doc_count").alias("doc_count")]
    for name, kind, _ in aggs:
        if kind in ("value_count", "sum"):
            exprs.append(F.sum(name).alias(name))
        elif kind == "min":
            exprs.append(F.min(name).alias(name))
        elif kind == "max":
            exprs.append(F.max(name).alias(name))
        else:
            exprs.append(F.sum(f"{name}__sum").alias(f"{name}__sum"))
            exprs.append(F.sum(f"{name}__cnt").alias(f"{name}__cnt"))
    return exprs


def _finalize(df: DataFrame, aggs) -> DataFrame:
    """Derive the user-facing columns from partials (avg = sum/cnt,
    decimal sums surfaced as double)."""
    proj, partial_cols = [], {"doc_count", EPOCH_COL, BUCKET_COL}
    for name, kind, _ in aggs:
        if kind == "avg":
            proj.append(
                (F.col(f"{name}__sum").cast("double") / F.col(f"{name}__cnt"))
                .alias(name)
            )
            partial_cols |= {f"{name}__sum", f"{name}__cnt"}
        elif kind == "sum":
            proj.append(F.col(name).cast("double").alias(name))
            partial_cols.add(name)
        elif kind == "value_count":
            proj.append(F.col(name).cast("long").alias(name))
            partial_cols.add(name)
        else:
            proj.append(F.col(name))
            partial_cols.add(name)
    keys = [c for c in df.columns if c not in partial_cols]
    return df.select(
        *keys, F.col("doc_count").cast("long").alias("doc_count"), *proj
    )


def transform_pivot(
    df: DataFrame, group_by: dict, aggregations: dict
) -> DataFrame:
    """One-shot batch transform: the entity summary frame. One
    shuffle on the composite key."""
    sources = _sources(group_by)
    aggs = _parse_aggs(aggregations)
    partial = (
        _keyed(df, sources)
        .groupBy(*[s.name for s in sources])
        .agg(*_partial_exprs(aggs))
    )
    return _finalize(partial, aggs)


def transform_merge(
    batch: DataFrame,
    state_path: str,
    group_by: dict,
    aggregations: dict,
    epoch: int,
    n_buckets: int = 64,
) -> None:
    """Merge one micro-batch into the continuous transform state.

    The batch is partial-aggregated FIRST (the shuffle moves one row
    per touched entity, not per document), bucketed by key hash, and
    additively combined with the state rows of the touched buckets
    only. Buckets whose recorded epoch is already >= ``epoch`` are
    skipped — the replay/crash-retry guard (see module docstring).
    Single writer at a time, like the upsert."""
    spark = batch.sparkSession
    sources = _sources(group_by)
    aggs = _parse_aggs(aggregations)
    keys = [s.name for s in sources]

    partial = (
        _keyed(batch, sources).groupBy(*keys).agg(*_partial_exprs(aggs))
    )
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    b = partial.withColumn(BUCKET_COL, bucket).withColumn(
        EPOCH_COL, F.lit(int(epoch))
    )

    Path = spark._jvm.org.apache.hadoop.fs.Path
    jpath = Path(state_path + "/_SUCCESS")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        b.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(state_path)
        return
    _recover_interrupted_merge(fs, Path, state_path)

    touched = [r[BUCKET_COL] for r in b.select(BUCKET_COL).distinct().collect()]
    if not touched:
        return
    state = spark.read.parquet(state_path).where(F.col(BUCKET_COL).isin(touched))
    # replay guard: buckets that already absorbed this (or a later)
    # epoch are excluded from the merge AND the swap
    seen = {
        r[BUCKET_COL]: r["e"]
        for r in state.groupBy(BUCKET_COL)
        .agg(F.max(EPOCH_COL).alias("e"))
        .collect()
    }
    todo = [bkt for bkt in touched if seen.get(bkt, -1) < int(epoch)]
    if not todo:
        return
    merged = (
        state.where(F.col(BUCKET_COL).isin(todo))
        .select(b.columns)
        .unionByName(b.where(F.col(BUCKET_COL).isin(todo)))
        .groupBy(*keys, BUCKET_COL)
        .agg(*_merge_exprs(aggs))
        .withColumn(EPOCH_COL, F.lit(int(epoch)))
    )
    import uuid

    staging = f"{state_path}/{STAGING_PREFIX}-{uuid.uuid4().hex}"
    merged.write.partitionBy(BUCKET_COL).mode("overwrite").parquet(staging)
    for bkt in todo:
        live = Path(f"{state_path}/{BUCKET_COL}={bkt}")
        backup = Path(f"{state_path}/_backup-b{bkt}")
        if fs.exists(live):
            _rename_or_raise(fs, live, backup)
        _rename_or_raise(fs, Path(f"{staging}/{BUCKET_COL}={bkt}"), live)
        fs.delete(backup, True)
    fs.delete(Path(staging), True)


def read_transform(
    spark: SparkSession, state_path: str, aggregations: dict
) -> DataFrame:
    """The user-facing entity summary from the continuous state:
    partials finalized (avg = sum/cnt), bookkeeping columns dropped."""
    aggs = _parse_aggs(aggregations)
    return _finalize(spark.read.parquet(state_path), aggs)


# ---------------------------------------------------------------------------
# oracle-checked query form
# ---------------------------------------------------------------------------

GROUP_BY = {
    "user": {"terms": {"field": "user_id"}},
    "day": {"date_histogram": {"field": "ts", "calendar_interval": "day"}},
}
AGGREGATIONS = {
    "total_value": {"sum": {"field": "value"}},
    "peak_value": {"max": {"field": "value"}},
    "avg_value": {"avg": {"field": "value"}},
    "n_values": {"value_count": {"field": "value"}},
}


def q_es_transform_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch form of the entity-centric transform (per-user
    per-day rollup). The continuous form is pinned equal to this in
    tests/test_transform.py (two-batch merge ≡ one-shot pivot, replay
    ignored)."""
    from .tables import load

    ev = load(spark, sf_dir, "events")
    return transform_pivot(ev, GROUP_BY, AGGREGATIONS).orderBy("user", "day")


def transform_latest(
    df: DataFrame,
    unique_key: list[str],
    sort: str,
    tiebreak: str,
) -> DataFrame:
    """ES's second transform type, ``latest`` (round 13): per
    ``unique_key`` entity, the MOST RECENT document by ``sort`` —
    the "current state per customer" pattern (ES: `"latest":
    {"unique_key": [...], "sort": "ts"}`).

    ES breaks sort ties by internal doc order, which has no
    deterministic lake reading, so (like the sampler's sort rule) a
    ``tiebreak`` column unique within (entity, sort) is REQUIRED.
    One shuffle: max over a (sort, tiebreak, payload...) struct whose
    lexicographic order never reaches the payload — partial
    aggregation keeps one candidate row per entity per map task
    (never a raw-data sort, unlike the window form). Docs missing
    the entity key or the sort field drop, ES-style; entities whose
    docs all lack ``sort`` are not emitted."""
    for c in (*unique_key, sort, tiebreak):
        if c not in df.columns:
            raise ValueError(f"transform_latest: no column {c!r}")
    if "_latest" in df.columns:
        raise ValueError(
            "transform_latest: the input frame may not carry a "
            "'_latest' column (internal struct name)"
        )
    rest = [
        c for c in df.columns
        if c not in (*unique_key, sort, tiebreak)
    ]
    pair = F.when(
        F.col(sort).isNotNull() & F.col(tiebreak).isNotNull(),
        F.struct(
            F.col(sort), F.col(tiebreak), *[F.col(c) for c in rest]
        ),
    )
    keys_present = F.lit(True)
    for k in unique_key:
        keys_present = keys_present & F.col(k).isNotNull()
    out = (
        df.filter(keys_present)
        .groupBy(*unique_key)
        .agg(F.max(pair).alias("_latest"))
        .filter(F.col("_latest").isNotNull())
    )
    return out.select(
        *unique_key,
        *[
            F.col(f"_latest.{c}").alias(c)
            for c in (sort, tiebreak, *rest)
        ],
    )


def q_es_transform_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``latest`` transform: each user's most recent event — sort on
    ts, event_id as the deterministic tie-break."""
    from .tables import load

    ev = load(spark, sf_dir, "events")
    return transform_latest(
        ev, ["user_id"], "ts", "event_id"
    ).orderBy("user_id")
