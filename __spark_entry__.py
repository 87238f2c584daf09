"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 /
§2.2 plus the training-data-pipeline extensions; ``oracle_sql()`` gives
the DuckDB-equivalent SQL for each (identical column names + values —
aggregates go through decimal so partial-agg ordering can't flip bits;
hash math is md5-based and engine-portable; dot products are
sequential double folds, bit-identical to list_dot_product).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the harness may import this file by path from any cwd — make the
# package importable regardless
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary at sf0.001."""
    from dump_es_parquet_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# ES-dump parity query: the full coercion pipeline on testdata
# ---------------------------------------------------------------------------


def q_dump_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events rows → raw JSON docs → full ES-dump coercion pipeline
    (schema from an ES mapping, dual-wire parse, epoch/ISO handling)
    → typed rows. Oracle: the identity projection — the pipeline must
    round-trip exactly (reference entry point 1 semantics)."""
    from dump_es_parquet_spark.coerce import parse_and_coerce
    from dump_es_parquet_spark.schema import properties_to_struct

    mapping = {
        "event_id": {"type": "long"},
        "ts": {"type": "date"},
        "user_id": {"type": "long"},
        "event_type": {"type": "keyword"},
        "value": {"type": "double"},
        "props": {"type": "object"},
    }
    schema = properties_to_struct(mapping)
    from dump_es_parquet_spark.operators.tables import load

    e = load(spark, sf_dir, "events")
    raw = e.select(
        F.to_json(
            F.struct("event_id", "ts", "user_id", "event_type", "value", "props"),
            {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"},
        ).alias("value")
    )
    typed = parse_and_coerce(raw, schema)
    return typed.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    ).orderBy("event_id")


def _rel(name):
    def run(spark, sf_dir, _name=name):
        from dump_es_parquet_spark.operators import relational

        return getattr(relational, _name)(spark, sf_dir)

    return run


def _sink(name):
    def run(spark, sf_dir, _n=name):
        from dump_es_parquet_spark import sinks

        return getattr(sinks, _n)(spark, sf_dir)

    return run


def _mod(module, name):
    def run(spark, sf_dir, _m=module, _n=name):
        import importlib

        m = importlib.import_module(f"dump_es_parquet_spark.operators.{_m}")
        return getattr(m, _n)(spark, sf_dir)

    return run


def _ivf_index_path(spark, sf_dir):
    """Build-once cache of the materialized IVF index (a deterministic
    artifact: same seeds, same Lloyd update — so every caller gets the
    identical index). v2 = lists carry the SQ8 columns alongside the
    flat vectors; v3 = + PQ codes and codebooks (ann_ivf_indexed_pq).
    The cache name embeds the quantizer params so a param change can
    never serve a stale artifact; lifecycle (content key, staged build
    + atomic rename, race adjudication, stale pruning) is the shared
    ``dump_es_parquet_spark.artifacts`` machinery."""
    import os

    from dump_es_parquet_spark.artifacts import cached_artifact, content_tag
    from dump_es_parquet_spark.operators.similarity import (
        PQ_CODES,
        PQ_M,
        write_ivf_index,
    )

    tag = content_tag(os.path.join(sf_dir, "embeddings.parquet"))
    # centroids are written last — their _SUCCESS marks a complete index
    return cached_artifact(
        f"spark_graft_ivf_v3_m{PQ_M}x{PQ_CODES}_{tag}",
        os.path.join("centroids", "_SUCCESS"),
        lambda stage: write_ivf_index(spark, sf_dir, stage),
        stale_prefixes=(
            "spark_graft_ivf_v1_",
            "spark_graft_ivf_v2_",
            "spark_graft_ivf_v3_",
        ),
    )


def q_sim_ann_ivf_indexed(spark, sf_dir):
    """The IVF *serving* path — the plan you'd actually run at 100×:
    probe a write-once materialized index (inverted lists as parquet
    partitioned by cell) via static partition pruning, instead of
    re-training the coarse quantizer in-query like ``sim_ann_ivf``.
    The index is built on first call per sf_dir and reused after — so
    the steady bench number is pure serving cost, exactly the
    amortized regime the materialized design buys."""
    from dump_es_parquet_spark.operators.similarity import ann_ivf_indexed

    return ann_ivf_indexed(spark, sf_dir, _ivf_index_path(spark, sf_dir))


def q_sim_ann_ivf_sq8(spark, sf_dir):
    """IVF-SQ8 serving: approximate pass over the int8 codes (4× less
    list I/O — column pruning never touches the flat vectors), exact
    rescore of the top k·4 candidates from the same pruned partitions.
    Identical answer to the flat path, so it shares its oracle."""
    from dump_es_parquet_spark.operators.similarity import ann_ivf_indexed_sq8

    return ann_ivf_indexed_sq8(spark, sf_dir, _ivf_index_path(spark, sf_dir))


def q_sim_ann_ivf_pq(spark, sf_dir):
    """IVF-PQ serving: ADC (asymmetric-distance) approximate pass over
    the m=8 product-quantization codes (~16× less list I/O than flat),
    exact rescore of the top k·24 candidates from the same pruned
    partitions. Identical answer to the flat path, so it shares its
    oracle — the fourth physical plan over one materialized index."""
    from dump_es_parquet_spark.operators.similarity import ann_ivf_indexed_pq

    return ann_ivf_indexed_pq(spark, sf_dir, _ivf_index_path(spark, sf_dir))


def q_es_knn_search_ivf(spark, sf_dir):
    """The ES 8 ``knn`` request with ``num_candidates`` (VERDICT r09
    Next #5): the ANN phase serves from the materialized IVF index
    (probed cells = smallest nearest-centroid prefix covering ≥ 400
    vectors, a static partition filter) and the exact cosine top-k is
    the rescore. Recall-checked like sim_ivf_recall: the row compares
    the request-dialect ANN answer against the exact brute-force
    answer of the SAME request and emits (k_eff, n_hits) — both
    rankings deterministic (md5-seeded Lloyd, rounded cosine + vec_id
    tiebreak), so DuckDB recomputes identical integers."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.es_search import search
    from dump_es_parquet_spark.operators.tables import load

    e = load(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter("vec_id = 0").head()["embedding"]]
    req = {
        "knn": {
            "field": "embedding",
            "query_vector": qv,
            "k": 10,
            "filter": {"bool": {"must_not": [{"term": {"vec_id": 0}}]}},
            "score_round": 6,
            "tiebreak": ["vec_id"],
        },
        "size": 10,
    }
    ivf_req = {**req, "knn": {**req["knn"], "num_candidates": 400}}
    ann = search(
        e, ivf_req, knn_index_path=_ivf_index_path(spark, sf_dir)
    ).select("vec_id", F.lit(1).alias("_hit"))
    exact = search(e, req).select("vec_id")
    return exact.join(ann, "vec_id", "left").agg(
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.sum(F.coalesce("_hit", F.lit(0))).cast("long").alias("n_hits"),
    )


def q_dup_clusters(spark, sf_dir):
    """Duplicate-cluster audit (``dedup.near_dup_clusters``): the full
    (doc → cluster) mapping reduced to a cluster-size histogram with a
    per-size membership digest. The oracle recomputes the mapping via
    the recursive transitive closure over the same banded+verified
    minhash pair SQL, with singletons labeled by themselves."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.dedup import (
        cached_corpus_signature_store,
        near_dup_clusters,
    )
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    # band collisions come from the shared content-keyed signature
    # store (the artifact corpus_dedup_incremental also rides) instead
    # of re-hashing the corpus — identical pairs, one signing pass per
    # testdata generation (VERDICT r07 Next #6)
    store = cached_corpus_signature_store(spark, sf_dir)
    c = near_dup_clusters(d, strategy="minhash", threshold=0.7, band_store=store)
    sizes = c.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_clusters"),
            F.sum("cluster_id").cast("long").alias("cluster_id_sum"),
        )
        .orderBy("cluster_size")
    )


def q_sim_ivf_recall(spark, sf_dir):
    """Recall@10 of the IVF serving path vs exact brute force for the
    first 10 query vectors — ANN accuracy as an oracle-checked metric
    (``similarity.ivf_recall_report``): both rankings are deterministic
    (md5-seeded Lloyd, rounded-cosine + vec_id tiebreak), so DuckDB
    recomputes the identical per-query hit counts."""
    from dump_es_parquet_spark.operators.similarity import ivf_recall_report

    return ivf_recall_report(spark, sf_dir, _ivf_index_path(spark, sf_dir))


def q_text_redact(spark, sf_dir):
    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.operators.text import redact_pii

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return redact_pii(d).select(
        "doc_id", "n_email", "n_ipv4", "n_card", "n_phone", "redacted"
    ).orderBy("doc_id")


def q_split_contamination(spark, sf_dir):
    """Cross-split contamination check end-to-end (the pre-ship gate a
    training pipeline runs): deterministic hash splits + exact-ngram
    near-dup pairs that straddle split boundaries
    (``operators/dedup.split_contamination``, default 'ngram' strategy
    — contamination wants no missed pair)."""
    from dump_es_parquet_spark.operators.dedup import split_contamination
    from dump_es_parquet_spark.operators.sampling import train_val_test_split
    from dump_es_parquet_spark.operators.tables import load

    d = train_val_test_split(
        load(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    return split_contamination(d, strategy="ngram", threshold=0.6)


def q_corpus_dedup(spark, sf_dir):
    """End-to-end ``dedup_corpus`` (the user-facing API a 100 TB
    pipeline actually calls): per-strategy kept/removed counts plus a
    kept-set membership digest (sum + bit_xor of kept ids — order-free,
    so it hashes identically across engines), for the exact and
    minhash strategies. The oracle recomputes the minhash removal set
    with a recursive transitive closure over the SAME banded+verified
    pair SQL the declared dedup_minhash_lsh query is hash-checked
    against (VERDICT r05 #4). The minhash strategy rides the shared
    content-keyed signature store (sign once per generation — the
    production shape; the from-scratch chain stays bench-visible and
    hash-checked via the declared dedup_minhash_lsh)."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.dedup import (
        cached_corpus_signature_store,
        dedup_corpus,
    )
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    store = cached_corpus_signature_store(spark, sf_dir)
    total = d.agg(F.count("*").cast("long").alias("n_docs"))
    frames = []
    for strat in ("exact", "minhash"):
        kept = dedup_corpus(
            d, strategy=strat,
            band_store=store if strat == "minhash" else None,
        ).select("doc_id")
        frames.append(
            kept.agg(
                F.count("*").cast("long").alias("n_kept"),
                F.sum("doc_id").cast("long").alias("kept_id_sum"),
                F.expr("bit_xor(doc_id)").cast("long").alias("kept_id_xor"),
            )
            .withColumn("strategy", F.lit(strat))
            .crossJoin(F.broadcast(total))
        )
    out = frames[0].unionByName(frames[1])
    return out.select(
        "strategy",
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_removed"),
        "kept_id_sum",
        "kept_id_xor",
    ).orderBy("strategy")


def q_events_union_evolved(spark, sf_dir):
    """``schema.union_evolved`` over two synthetic dump generations of
    the events table whose mappings drifted: gen1 narrows ``user_id``
    to int and lacks ``region``; gen2 keeps long ``user_id``, adds
    ``region``, and shifts ids. The union must widen user_id back to
    long and NULL-fill region; the oracle re-expresses the widening as
    explicit casts in a UNION ALL."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.schema import union_evolved

    ev = load(spark, sf_dir, "events")
    gen1 = ev.select(
        "event_id",
        F.col("user_id").cast("int").alias("user_id"),
        "event_type",
    )
    gen2 = ev.select(
        (F.col("event_id") + 10_000_000).alias("event_id"),
        F.col("user_id").alias("user_id"),
        "event_type",
        F.concat(F.lit("r"), (F.col("user_id") % 5).cast("string")).alias("region"),
    )
    u = union_evolved([gen1, gen2])
    return (
        u.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("user_id").cast("long").alias("user_sum"),
            F.sum(F.when(F.col("region").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_gen1"),
            F.count_distinct("region").cast("long").alias("n_regions"),
        )
        .orderBy("event_type")
    )


def q_events_click_attribution(spark, sf_dir):
    """The stream-stream interval join's batch-equivalent plan
    (``purchase_after_click_join``, streaming/stream.py): purchases
    within 1 day after a click by the same user. The SAME expression
    tree runs as a watermarked stream-stream join with bounded state
    (tests/test_streaming.py cross-checks batch ≡ stream); running it
    here on the batch frames makes the operator oracle- and
    bench-visible (VERDICT r05 #2)."""
    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.streaming.stream import purchase_after_click_join

    ev = load(spark, sf_dir, "events")
    return (
        purchase_after_click_join(ev, ev, interval="1 day")
        .select(
            "user_id", "click_id", "click_ts",
            "purchase_id", "purchase_ts", "purchase_value",
        )
        .orderBy("click_id", "purchase_id")
    )


def _stream_batch_equiv(spark, sf_dir):
    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.streaming.stream import windowed_counts

    return windowed_counts(load(spark, sf_dir, "events")).orderBy(
        "window_start", "event_type"
    )


# The driver's correctness gate records at most 50 oracle rows, in
# ``queries()`` order.  The entries below are DEMOTED from the declared
# set (still fully implemented, still oracle-verified — by
# tests/test_operators.py against the same DuckDB SQL) because each
# duplicates an operator surface another declared query already
# exercises, or (text_redact, round 5) joined after the 50 slots were
# filled.  Round 7 rotated the training-pipeline APIs (corpus_dedup,
# sim_knn_graph, events_value_bands, corpus_filter, corpus_packing)
# INTO the declared set, displacing five surface-duplicates (see the
# round-7 block at the bottom of this set):
#   events_variant        — same oracle SQL as events_json
#   stream_window_counts  — same oracle SQL as events_hourly
#   events_sliding        — sliding windows; tumbling/session covered by
#                           events_hourly + events_sessionize + streaming tests
#   events_session_window — F.session_window; gap-sessionization covered
#                           by events_sessionize + tests/test_streaming.py
#   cube_order_status     — grouping sets covered by rollup_region_nation
#   top_customers         — top-k covered by events_top_users
#   q4_priority_returns   — IN-subquery semi-join covered by semi_anti_join
#   q6_revenue_band       — scan+filter+agg covered by q1/q14
#   sim_ann_ivf           — in-query-Lloyd variant of the IVF surface;
#                           the declared sim_ann_ivf_indexed serves the
#                           SAME oracle from the materialized
#                           partition-pruned index (the 100 TB design),
#                           and bench reports both so the amortization
#                           is measurable (VERDICT r4 #4)
#   text_redact           — PII-style redaction chain + hit counts
#   q13_customer_distribution — LEFT OUTER join + two-level agg
#   q17_small_quantity_revenue — decorrelated AVG subquery shape
#   q21_waiting_supplier_shape — EXISTS + NOT EXISTS decorrelated
#   events_pivot          — pivot() with explicit value domain
#   events_click_attribution — batch plan of the stream-stream interval
#                           join (same expression tree; stream side
#                           verified batch≡stream in test_streaming.py)
#   split_contamination   — cross-split ngram near-dup pairs over
#                           deterministic hash splits (pre-ship gate)
#   text_repetition       — Gopher-style repetition filters (top-word /
#                           dup-word / top-bigram shares)
#   q16/q20 shapes        — complete the TPC-H 22: NOT-IN→anti-join +
#                           count-distinct groups; nested correlated
#                           aggregates decorrelated onto one shuffle key
#   dedup_spans           — repeated k-token span profile (distributed
#                           suffix-array-lite boilerplate detection)
#   corpus_mix            — per-group token-budget mixing (greedy
#                           md5-ranked prefix under a recipe of shares)
#   corpus_shuffle        — seeded engine-portable global shuffle
#                           (ordered prefix pinned)
#   embedding_quantize    — symmetric int8 quantization round-trip
#                           (exact code digests + max reconstruction err)
#   corpus_profile        — exact per-source profile (quartiles,
#                           distincts); the mergeable-HLL-sketch form is
#                           pytest-verified (sketches aren't SQL-portable)
#   corpus_curriculum     — exact-quantile curriculum bins (two-pass
#                           broadcast-edge histogram, not a global ntile)
#   sim_ann_ivf_sq8       — IVF-SQ8 serving (int8 approximate pass +
#                           exact rescore); same answer as the flat
#                           serving path, same oracle
#   sim_ann_ivf_pq        — IVF-PQ serving (round 8): ADC over m=8
#                           product-quantization codes (~16× less list
#                           I/O), exact rescore sized to recover the
#                           flat answer; same oracle, fourth physical
#                           plan over the one materialized index
#   text_vocab            — vocabulary heavy hitters (map-side-combined
#                           token counts, TakeOrdered top-k)
#   corpus_triplets       — contrastive (anchor, positive, negative)
#                           mining: verified near-dup positives +
#                           deterministic hash-ring negatives
#   corpus_decontaminate  — benchmark decontamination (GPT-3-style
#                           shared-k-gram rule vs a held-out set)
#   events_compact_latest — snapshot compaction (last-write-wins via
#                           max_by partial agg, not a window sort)
#   corpus_source_cap     — per-domain/source document cap (unbiased
#                           md5-ordered window prune)
#   events_zorder         — Z-order (Morton) layout clustering: the
#                           multi-column min/max-pruning write layout
#   events_snapshot_diff  — CDC diff between dump generations (one
#                           full-outer join + null-safe struct compare)
#   corpus_lm_score       — perplexity-filter shape: corpus-derived
#                           unigram-rank model, broadcast-join scoring
#   events_union_evolved  — schema-evolution union across drifted dump
#                           generations (widen + NULL-fill, no shuffle)
#   events_rolling_1h     — event-time RANGE-frame rolling window
#                           (trailing 1h per user; rangeBetween)
#   events_funnel         — order-aware conversion funnel (stepwise
#                           min-after-threshold, one shuffle key)
#   events_retention      — cohort retention matrix (first-activity
#                           week × week-offset distinct users)
#   events_sequence_patterns — MATCH_RECOGNIZE-lite: regex over each
#                           user's time-ordered event-type string
#   privacy_k_anonymity   — structured release gate: sub-k
#                           quasi-identifier combos + suppression
#   events_anomalies      — hourly 3σ volume anomalies via exact
#                           integer moments (no float stddev)
DEMOTED: frozenset[str] = frozenset(
    {
        "sim_ann_ivf_sq8",
        "sim_ann_ivf_pq",
        "text_vocab",
        "corpus_triplets",
        "corpus_decontaminate",
        "dedup_spans",
        "corpus_mix",
        "corpus_shuffle",
        "embedding_quantize",
        "corpus_profile",
        "corpus_curriculum",
        "split_contamination",
        "text_repetition",
        "q16_supplier_part_types",
        "q20_dominant_supplier_shape",
        "events_click_attribution",
        "events_pivot",
        "q13_customer_distribution",
        "q17_small_quantity_revenue",
        "q21_waiting_supplier_shape",
        "events_variant",
        "stream_window_counts",
        "events_sliding",
        "events_session_window",
        "cube_order_status",
        "top_customers",
        "q4_priority_returns",
        "q6_revenue_band",
        "sim_ann_ivf",
        "text_redact",
        "events_compact_latest",
        "corpus_source_cap",
        "events_zorder",
        "events_snapshot_diff",
        "corpus_lm_score",
        "events_union_evolved",
        "events_rolling_1h",
        "events_funnel",
        "events_retention",
        "events_sequence_patterns",
        "privacy_k_anonymity",
        "events_anomalies",
        # Rotated OUT of the declared 50 in round 7 to make room for the
        # 100 TB-critical training-pipeline APIs (corpus_dedup,
        # sim_knn_graph, events_value_bands, corpus_filter,
        # corpus_packing — VERDICT r06 Next #2).  Each of these five has
        # a declared sibling on the same operator surface:
        #   mm_frame_sample / mm_decode_stub — multimodal mapInPandas
        #       surface still declared via mm_binary_metadata
        #   q7_nation_volume — multi-join volume shape; q3/q5/q10 keep
        #       the join family declared
        #   q19_disjunctive_brand — OR-of-conjunctions pushdown; q14/q18
        #       keep scan+filter+agg declared
        #   text_fingerprint — rolling-hash fingerprint; text_quality /
        #       text_langid / text_tokens keep text analysis declared
        "mm_frame_sample",
        "mm_decode_stub",
        "q7_nation_volume",
        "q19_disjunctive_brand",
        "text_fingerprint",
        # Rotated OUT of the declared 50 in round 8 to make room for the
        # round-7 verification queries (sketch_error_bounds,
        # corpus_dedup_incremental, sim_ivf_recall, corpus_dup_clusters,
        # corpus_attributes — VERDICT r07 Next #1: the operators that
        # make 100 TB dedup/ANN *verifiable*).  Each of these five has a
        # declared sibling keeping its operator family in the gate:
        #   q12_priority_split — join + conditional agg; q3/q5/q8/q9/q10
        #       keep the join family, q1/rollup keep conditional aggs
        #   q14_promo_revenue — scan+filter+agg ratio; q1 + q18 keep
        #       scan+filter+agg declared
        #   setops — INTERSECT/EXCEPT; semi_anti_join keeps the
        #       semi/anti shuffle family declared
        #   distinct_agg — count(distinct) mix; q1 + rollup_region_nation
        #       keep the agg family declared
        #   scalar_functions — string/date/math scalar battery;
        #       events_json keeps the scalar/JSON surface declared
        "q12_priority_split",
        "q14_promo_revenue",
        "setops",
        "distinct_agg",
        "scalar_functions",
        # Rotated OUT in round 8 (second swap) so the declared set
        # carries the new lake-side retrieval family (corpus_bm25 +
        # corpus_hybrid_rrf — the ES capability users lose by dumping).
        # Families stay declared:
        #   q2_min_price_part — correlated min-subquery + multi-join;
        #       q11's correlated HAVING subquery and q3/q5/q8/q9/q10
        #       keep both shapes in the gate
        #   q15_top_supplier — view + scalar-max subquery over an agg;
        #       q11/q18/q22 keep agg-subquery shapes declared
        "q2_min_price_part",
        "q15_top_supplier",
        # sink_csv_roundtrip / sink_jsonl_roundtrip — the csv and
        #     gzip-jsonl writers' cross-engine rows (round 8): Spark
        #     digests the source frame, the oracle digests the files
        #     the query just wrote via read_csv/read_json. The ndjson
        #     sibling is DECLARED since round 9, keeping the sink
        #     round-trip family in the driver gate
        "sink_csv_roundtrip",
        "sink_jsonl_roundtrip",
        # mm_binary_near_dup — planted-duplicate recovery via the
        #     generic banded hamming join on REAL pure-numpy dHash
        #     signatures (brightness-invariant, shift-tolerant; only
        #     the bytes→pixel decode remains the documented stub slot)
        "mm_binary_near_dup",
        # corpus_bm25 / corpus_hybrid_rrf are DECLARED (promoted in the
        # same round they landed — strict-clean at three scale factors;
        # q2/q15 rotated out above in exchange).
        # corpus_significant_terms — ES significant_terms aggregation
        #     (JLH, superset background) landed in round 9: one
        #     word-count-shaped shuffle + 1-row broadcast sizes;
        #     demoted-green pending the next rotation window
        "corpus_significant_terms",
        # corpus_more_like_this — PROMOTED round 10 (VERDICT r09 Next
        #     #2): ES more_like_this — top tf×idf source terms → BM25
        #     over the derived query, source excluded.
        # corpus_fuzzy_match — ES fuzzy query (round 9): zero-shuffle
        #     linear scan, length-guarded classic levenshtein (the
        #     engines-agree variant, PARITY-noted vs Lucene Damerau);
        #     demoted-green pending the next rotation
        "corpus_fuzzy_match",
        # corpus_span_near — zero-shuffle greedy-minimal span scan
        #     (promoted r10, rotated back OUT round 13 per VERDICT
        #     r12 Next #2 — the phrase/span family stays
        #     demoted-green via corpus_match_phrase and the declared
        #     corpus_bm25 rows keep retrieval in the gate)
        "corpus_span_near",
        # sim_ivf_recall — IVF recall-vs-exact audit (promoted r8,
        #     rotated back OUT round 13 per VERDICT r12 Next #2 —
        #     the IVF family keeps es_knn_search_ivf and
        #     sim_ann_ivf_indexed declared)
        "sim_ivf_recall",
        # dedup_embedding — embedding-cosine near-dup (promoted r6,
        #     rotated back OUT round 13 per VERDICT r12 Next #2 —
        #     dedup keeps dedup_exact, dedup_minhash_lsh,
        #     dedup_simhash and corpus_dedup declared)
        "dedup_embedding",
        # corpus_bm25_served — PROMOTED round 10 (VERDICT r09 Next
        #     #2): the build-once/serve-many postings artifact is the
        #     production story — term-range row-group-pruned serving
        #     pinned bit-identical to the corpus-scan path.
        # corpus_bm25_standard — the analyzer seam's first step
        #     (round 10, VERDICT r09 Next #8): BM25 under the standard
        #     (lowercase + non-alnum-split) analyzer, messy request
        #     text normalized query-side; demoted-green pending
        #     rotation (corpus_bm25 keeps the family declared)
        "corpus_bm25_standard",
        # corpus_bm25_stopwords — PROMOTED round 12 (VERDICT r11 Next
        #     #2): the analyzer seam's second step — standard
        #     tokenizer + Lucene _english_ stopwords + a 2-char
        #     length floor, query and documents filtered identically.
        # corpus_rank_eval — PROMOTED round 11 (VERDICT r10 Next #3):
        #     the ES _rank_eval API over the batch-BM25 ranking.
        # es_* — the ES _search request compiler (round 9): saved
        #     search requests replayed on the lake — query DSL →
        #     NULL-exact Catalyst Column, aggregation trees → one
        #     scan + one rollup shuffle with level-masked window
        #     pruning/pipelines, composite after-key pagination,
        #     per-bucket top_hits.  Four family heads are DECLARED in
        #     the same round they landed (es_search_hits = query DSL +
        #     sort/from/size; es_aggs_tree = the agg-tree compiler;
        #     es_pipeline_aggs = pipeline windows + sibling summary;
        #     es_query_string = the Lucene q= parser, pinned inverse
        #     of the pushdown translator); the remaining variants stay
        #     demoted-green pending the next rotation window
        "es_range_buckets",
        "es_histogram",
        # es_date_histogram_gapfill — PROMOTED round 11 (VERDICT r10
        #     Next #3): the Kibana time-series shape, empty buckets by
        #     one explode over the bucket frame.
        "es_filters_agg",
        "es_composite_page",
        # es_composite_datehist — composite sources widened past terms
        #     (round 10): a (date_histogram day grid × terms) source
        #     pair paged by after-key; demoted-green pending rotation
        "es_composite_datehist",
        # es_search_highlight — the request highlight section +
        #     _source include wildcards (round 10); snippets shared
        #     with the declared corpus_highlight splice; demoted-green
        #     pending rotation
        "es_search_highlight",
        # es_geo_queries — geo_bounding_box + geo_distance on a
        #     struct geo_point column (round 10); haversine tree
        #     spelled identically in both engines; demoted-green
        #     pending rotation
        "es_geo_queries",
        # es_nested_query — PROMOTED round 12, rotated back OUT
        #     round 16 (see the round-16 demotion block below):
        #     the ES nested query — exists(arr, x -> inner) over
        #     array-mode struct columns, same-object semantics
        #     pytest-pinned.
        # es_nested_agg — the nested AGGREGATION twin (round 11):
        #     array column replaced by exploded structs at the root,
        #     doc_count counts objects; demoted-green pending rotation
        "es_nested_agg",
        # es_reverse_nested — promoted r13, rotated back OUT round
        #     15 (VERDICT r14 Next #1): the promoted
        #     es_nested_inside_nested is the harder nested row
        #     (es_reverse_nested_aggs stays demoted-green)
        "es_reverse_nested",
        # corpus_bm25_stemmed — PROMOTED round 13, rotated back OUT
        #     round 16 (see below) (VERDICT r12 Next
        #     #2): the analyzer seam's third step — standard
        #     tokenizer + the Harman S-stemmer (Lucene
        #     minimal_english).
        # es_multi_rare_terms — PROMOTED round 13, rotated back OUT
        #     round 16 (see below) (VERDICT r12 Next
        #     #2): multi_terms composite keys + rare_terms doc_count
        #     ceiling.
        # es_range_overlap — PROMOTED round 13 (VERDICT r12 Next
        #     #2): overlapping range buckets via the
        #     multi-membership explode with un-multiplied ancestors.
        # es_gapfill_moving_fn — positional pipelines (moving_fn /
        #     serial_diff) computed AFTER the gap fill so empty
        #     buckets occupy window positions (round 12, VERDICT r11
        #     Next #8); demoted-green pending rotation
        #     (es_date_histogram_gapfill keeps the fill family
        #     declared, es_pipeline_aggs the pipeline family)
        "es_gapfill_moving_fn",
        # es_nested_match — match (operator and) inside a nested
        #     scope, same-object token semantics (round 12, VERDICT
        #     r11 What's missing #2); demoted-green pending rotation
        #     (es_nested_query keeps the nested family declared)
        "es_nested_match",
        # es_filters_under_terms — the filters agg at a non-root
        #     level via the multi-membership explode, overlapping
        #     named filters + other_bucket, ancestors un-multiplied
        #     (round 12); demoted-green pending rotation
        #     (es_filters_agg keeps the filters family)
        "es_filters_under_terms",
        # es_terms_include_exclude — terms include regex + exclude
        #     list applied before ranking (round 12); demoted-green
        #     pending rotation (es_aggs_tree keeps terms declared)
        "es_terms_include_exclude",
        # es_date_histogram_tz — date_histogram time_zone as a fixed
        #     offset, local-midnight day buckets + gap-fill on the
        #     shifted grid (round 12); demoted-green pending rotation
        #     (the gapfill rows keep the date_histogram family)
        "es_date_histogram_tz",
        # es_composite_missing — composite missing_bucket + a
        #     null-bearing after cursor (round 14); demoted-green
        #     pending rotation (es_composite_page/datehist keep the
        #     composite family verified)
        "es_composite_missing",
        # es_nested_inside_nested — PROMOTED round 15 (VERDICT r14
        #     Next #1): two-level nested aggregation chains with
        #     stacked representative masks re-basing doc → outer →
        #     inner (the hardest nested row; es_reverse_nested
        #     rotates out in exchange, es_reverse_nested_aggs stays
        #     demoted-green).
        # es_retriever_rrf — the ES 8.14 retriever.rrf request
        #     dialect over hybrid_rrf with non-default
        #     rank_constant/window/size/vector knobs (round 14);
        #     demoted-green pending rotation (corpus_hybrid_rrf
        #     keeps the fusion engine declared)
        "es_retriever_rrf",
        # es_categorize_text — PROMOTED round 15 (VERDICT r14 Next
        #     #1): token-skeleton log categorization (the x-pack ML
        #     agg under the documented deterministic reading —
        #     PARITY #26), size/order/sub-agg composition like terms.
        # es_has_child_inner_hits — has_child + inner_hits
        #     (round 14, closing PARITY #23's bound): per-parent
        #     top-N matching children under an explicit sort;
        #     demoted-green pending rotation (es_has_child keeps the
        #     join-field family declared)
        "es_has_child_inner_hits",
        # es_has_parent_inner_hits — has_parent + inner_hits
        #     (round 14, PARITY #23): the one-parent splice join;
        #     demoted-green pending rotation
        "es_has_parent_inner_hits",
        # es_rate_iana — rate under an IANA time_zone (round 14,
        #     closing the r13 bound): tzdb month boundaries + local
        #     day-count divisors; demoted-green pending rotation
        #     (es_rate_mad keeps the rate family verified)
        "es_rate_iana",
        # es_geo_shape — polygon/envelope geo_shape queries
        #     (round 14, VERDICT r13 Next #7): non-convex parity
        #     ray-cast as a fixed expression tree, planar reading
        #     (PARITY #25); demoted-green pending rotation
        #     (es_geo_queries keeps the geo family verified)
        "es_geo_shape",
        # es_suggest_phrase — PROMOTED round 15 (VERDICT r14 Next
        #     #1, AFTER the Next #2 beam rewrite that replaced the
        #     r14 per_token^L driver-side product literal): per-token
        #     vocab candidates + stupid-backoff bigram-LM re-rank via
        #     an exact Viterbi beam, so the promoted row makes the
        #     fixed plan load-bearing.
        # es_significant_heuristics — PROMOTED round 15 (VERDICT r14
        #     Next #1): chi_square / gnd / mutual_information /
        #     percentage significance scoring over the JLH row's
        #     counts frame (es_significant_terms_per_bucket rotates
        #     out in exchange — the heuristics row covers the
        #     per-bucket join shape on a harder score tree).
        # es_top_hits_nonleaf — PROMOTED round 15 (VERDICT r14 Next
        #     #1): top_hits under a NON-LEAF bucket — the bucket/doc
        #     union frame, terms prune load-bearing for both halves
        #     (es_top_hits keeps the leaf form demoted-green).
        # es_terms_partition — terms include {partition,
        #     num_partitions} (round 14, VERDICT r13 Next #3): the
        #     high-cardinality walk recipe via the portable md5
        #     bucket, union-of-partitions pinned in pytest;
        #     demoted-green pending rotation
        #     (es_terms_include_exclude keeps the include family
        #     declared)
        "es_terms_partition",
        # es_date_histogram_tz_iana — PROMOTED round 14 (VERDICT r13
        #     Next #2): date_histogram under an IANA time_zone —
        #     tzdb local-midnight day buckets gap-filled across the
        #     2024-03-10 DST transition (a 23-hour step), the
        #     cross-engine tzdb pin.
        # es_adjacency_matrix — the Kibana graph agg (filter buckets
        #     + pair intersections via the multi-membership explode)
        #     with exact percentile_ranks metrics (round 12);
        #     demoted-green pending rotation
        "es_adjacency_matrix",
        # es_geo_bounds_string_stats — geo_bounds box + string_stats
        #     length metrics (round 12); demoted-green pending
        #     rotation (es_metric_variants keeps the metric family)
        "es_geo_bounds_string_stats",
        # es_matrix_stats — promoted r13, rotated back OUT round 15
        #     (VERDICT r14 Next #1): es_extended_stats +
        #     grouped_robust_stats keep the moment-discipline family
        "es_matrix_stats",
        # mm_binary_metadata — rotated OUT round 15 (VERDICT r14
        #     Next #1): mm_binary_clusters is the load-bearing
        #     multimodal row (same binary/metadata plumbing plus the
        #     dHash clone audit)
        "mm_binary_metadata",
        # q8_market_share — rotated OUT round 15 (VERDICT r14 Next
        #     #1): TPC-H keeps q1/q3/q10/q18 declared
        "q8_market_share",
        # --- round 15 (VERDICT r14 Next #3-#8): the six new dialect
        #     rows landed demoted-green; round 16 PROMOTED five of
        #     the round-15 surface (the standing rotation rhythm —
        #     no r15 verdict shipped, so the builder applied the r14
        #     verdict's promotion pattern: make the new plans
        #     load-bearing, prefer rows carrying this round's fixes).
        # es_compound_filter — PROMOTED round 16: constant_score /
        #     dis_max / boosting filter-context reductions nested in
        #     one bool (VERDICT r14 Next #3).
        # es_simple_query_string — PROMOTED round 16: the lenient
        #     search-box grammar (never raises on input text;
        #     property-pinned) — promoted WITH the round-16 ADVICE
        #     fix that analyzes query-side fragments, so the fixed
        #     plan is load-bearing.
        # es_match_prefix — match_phrase_prefix + match_bool_prefix
        #     (search-as-you-type), one tagged union row
        "es_match_prefix",
        # es_ip_range — PROMOTED round 16: CIDR term/terms/range on
        #     string ip columns + the ip_range aggregation — promoted
        #     WITH the round-16 ADVICE fix validating octet/prefix
        #     ranges in _is_cidr_like.
        # es_terms_set — PROMOTED round 16: size(array_intersect) >=
        #     minimum_should_match_field over array-mode columns.
        # es_composite_geotile — the composite geotile_grid source
        #     (map-tile walk), keys identical to es_geotile_grid's
        "es_composite_geotile",
        # es_count — the _count API (one scan, one count) over a
        #     bool mixing dis_max + fuzzy; demoted-green pending
        #     rotation
        "es_count",
        # esql_events_rollup — PROMOTED round 16: the ES|QL compiler
        #     head (WHERE/EVAL/STATS..BY/SORT/LIMIT — the biggest
        #     round-15 surface).
        # esql_docs_tokens — the SPLIT+MV_EXPAND token pipeline;
        #     demoted-green pending rotation (esql_events_rollup
        #     keeps the ES|QL compiler declared)
        "esql_docs_tokens",
        # es_bucket_selector — the alerting HAVING pipeline +
        #     normalize percent_of_sum shares (round 12);
        #     demoted-green pending rotation (es_pipeline_aggs keeps
        #     the pipeline family declared)
        "es_bucket_selector",
        # es_significant_terms — root significant_terms over a
        #     keyword field via one flag-column scan, JLH micro
        #     scores (round 12); demoted-green pending rotation
        #     (corpus_significant_terms keeps the text twin verified)
        "es_significant_terms",
        # es_significant_terms_per_bucket — promoted r14, rotated
        #     back OUT round 15 (VERDICT r14 Next #1): the promoted
        #     es_significant_heuristics row covers the per-bucket
        #     join shape on a harder score tree
        #     (es_significant_terms keeps the root path
        #     demoted-green, corpus_significant_terms the text twin)
        "es_significant_terms_per_bucket",
        # es_nested_inner_hits — nested query inner_hits (round 13,
        #     VERDICT r12 Next #4): matched object offsets per hit
        #     via an index-keeping transform/filter projection over
        #     the paginated rows; demoted-green pending rotation
        #     (es_nested_query keeps the nested family declared)
        "es_nested_inner_hits",
        # es_moving_fn_extended — the widened MovingFunctions set
        #     (round 13, VERDICT r12 Next #5): stdDev /
        #     linearWeightedAvg / ewma over a gap-filled hourly
        #     grid; demoted-green pending rotation
        #     (es_gapfill_moving_fn keeps the positional-pipeline
        #     family verified, es_pipeline_aggs declared)
        "es_moving_fn_extended",
        # es_percolate_phrase — PROMOTED round 14, rotated back OUT
        #     round 16 (see below) (VERDICT r13
        #     Next #1+#2): match_phrase percolate rules — adjacency
        #     on longest-token candidates, must_not phrase
        #     load-bearing — promoted AFTER the round-14 fix that
        #     binds the doc tokenizer once per melted row (the r13
        #     `weak` plan), making the fixed plan load-bearing.
        # es_normalize_zscore — normalize z-score + softmax-over-z
        #     (round 13, VERDICT r12 Next #7): the moment discipline
        #     in a level window, exp 12dp-rounded before the exact
        #     sum; demoted-green pending rotation
        #     (es_bucket_selector keeps normalize verified,
        #     es_pipeline_aggs the pipeline family declared)
        "es_normalize_zscore",
        # es_diversified_sampler — sampler/diversified_sampler over
        #     a deterministic explicit-sort sample (round 13, the r12
        #     "smaller bounds" list); demoted-green pending rotation
        #     (es_aggs_tree keeps the bucket family declared)
        "es_diversified_sampler",
        # es_string_stats_entropy — string_stats Shannon entropy via
        #     the dedicated char-histogram path (round 13, the r12
        #     "smaller bounds" list); demoted-green pending rotation
        #     (es_geo_bounds_string_stats keeps the in-rollup stats
        #     verified)
        "es_string_stats_entropy",
        # es_significant_text — the analyzed-token significant_terms
        #     sibling as a request shape over the corpus operator
        #     (round 13); demoted-green pending rotation
        #     (corpus_significant_terms keeps the operator verified,
        #     es_significant_terms the keyword path)
        "es_significant_text",
        # es_cumulative_cardinality — running distinct count over a
        #     gap-filled hourly grid (round 13): exact first-bucket
        #     attribution where ES merges HLL sketches;
        #     demoted-green pending rotation (es_pipeline_aggs keeps
        #     the pipeline family declared)
        "es_cumulative_cardinality",
        # es_boxplot_derivative_unit — boxplot quartiles (exact
        #     percentile class) + derivative unit normalization
        #     (round 13); demoted-green pending rotation
        #     (es_metric_variants/es_pipeline_aggs keep the families)
        "es_boxplot_derivative_unit",
        # es_rate_mad — the rate agg (actual calendar bucket length
        #     as the divisor) + exact median_absolute_deviation
        #     (round 13); demoted-green pending rotation (the metric
        #     family keeps es_metric_variants judge-verified)
        "es_rate_mad",
        # es_bucket_summaries — percentiles_bucket +
        #     extended_stats_bucket sibling pipes (round 13);
        #     demoted-green pending rotation (es_pipeline_aggs keeps
        #     the sibling-pipe family declared)
        "es_bucket_summaries",
        # es_moving_percentiles — the exact union-of-raw-values
        #     reading of ES's merged-digest moving percentiles over
        #     a gap-filled grid (round 13); demoted-green pending
        #     rotation (es_gapfill_moving_fn keeps the positional-
        #     pipeline family verified)
        "es_moving_percentiles",
        # es_global_agg — the query-ignoring global scope (round
        #     13); demoted-green pending rotation (es_aggs_tree
        #     keeps the agg-tree family declared)
        "es_global_agg",
        # es_string_stats_distribution — show_distribution as
        #     per-(bucket, char) probability rows (round 13);
        #     demoted-green pending rotation (the char-histogram
        #     family keeps es_string_stats_entropy verified)
        "es_string_stats_distribution",
        # es_transform_latest — ES's second transform type: the
        #     most recent doc per entity via one struct-max shuffle
        #     (round 13); demoted-green pending rotation
        #     (es_transform_pivot keeps the transform family
        #     declared)
        "es_transform_latest",
        # es_has_child — PROMOTED round 14 (VERDICT r13 Next #2):
        #     the join-field family's two-table lake reading — one
        #     pre-aggregated child-counts groupBy + one equi-join.
        #     es_has_parent / es_children_agg stay demoted-green
        #     (the promoted row keeps the family declared).
        "es_has_parent",
        "es_children_agg",
        # es_reverse_nested_aggs — reverse_nested WITH parent-field
        #     sub-aggs via the per-(bucket, parent) representative
        #     mask (round 13); demoted-green pending rotation
        #     (es_reverse_nested keeps the family declared)
        "es_reverse_nested_aggs",
        # es_frequent_item_sets — PROMOTED round 14 (VERDICT r13
        #     Next #2): exact apriori over basket arrays (ES's
        #     sampled-eclat closed-itemset agg, the every-frequent-
        #     itemset exact reading).
        # es_significant_terms_bgfilter — background_filter narrows
        #     the JLH background to a slice (round 13);
        #     demoted-green pending rotation (es_significant_terms
        #     keeps the family verified)
        "es_significant_terms_bgfilter",
        # es_geohash_grid — PROMOTED round 12 (VERDICT r11 Next #2):
        #     geohash_grid buckets + geo_centroid metric — the
        #     unrolled bit-interleave spelled identically in both
        #     engines (the map-dashboard shape).
        # es_geotile_grid — Web-Mercator z/x/y tiles, Kibana maps'
        #     default bucket (round 11); 12-decimal-rounded Mercator
        #     fraction kills the tan/ln ulp boundary risk in both
        #     engines; demoted-green pending rotation
        "es_geotile_grid",
        # es_geo_distance_rings — distance-ring buckets over the same
        #     haversine tree as the geo query class, geo_centroid per
        #     ring (round 11); demoted-green pending rotation
        "es_geo_distance_rings",
        # es_auto_date_histogram — Kibana's adaptive time bucketing,
        #     ladder-chosen interval from one bounded min/max collect
        #     (promoted r12, rotated back OUT round 13 per VERDICT
        #     r12 Next #2 — es_date_histogram_gapfill +
        #     es_date_histogram_tz keep the date_histogram family
        #     declared); stays oracle-verified in the judge sweep
        "es_auto_date_histogram",
        # es_date_histogram_gapfill_month — calendar-interval (month)
        #     gap-filling by INTERVAL-1-MONTH sequences (promoted
        #     r12, rotated back OUT round 13 per VERDICT r12 Next #2
        #     — the gapfill family keeps es_date_histogram_gapfill
        #     declared and es_gapfill_moving_fn judge-verified)
        "es_date_histogram_gapfill_month",
        # es_filter_missing_range — the single-bucket aggs (missing)
        #     chained with date_range windows (round 10); demoted-green
        #     pending rotation (es_aggs_tree keeps agg trees declared)
        "es_filter_missing_range",
        # es_metric_variants — weighted_avg + top_metrics (round 10);
        #     demoted-green pending rotation (es_aggs_tree keeps the
        #     metric family declared)
        "es_metric_variants",
        "es_top_hits",
        "es_collapse",
        "es_search_after",
        # es_transform_pivot — PROMOTED round 10 (VERDICT r09 Next
        #     #2): batch pivot of the entity-centric transform; the
        #     incremental additive-merge form stays pinned equal to it
        #     in tests/test_transform.py.
        # es_percolate — PROMOTED round 10 (VERDICT r09 Next #2): ES
        #     reverse search as one zero-shuffle projection pass.
        # es_percolate_bulk — PROMOTED round 11 after the r10 What's
        #     wrong #1 rework (persisted rule frames, binned two-sided
        #     range rules, should groups): the millions-of-rules
        #     reverse-search route, plan O(1) in rule count.
        # es_terms_missing_offset — date_histogram `offset` + terms
        #     `missing` (round 10 DSL parity); demoted-green pending
        #     rotation (es_aggs_tree keeps the agg-tree family
        #     declared)
        "es_terms_missing_offset",
        # es_knn_search — the ES 8 knn request section (round 9):
        #     exact cosine top-k over the pre-filtered frame, SAME
        #     oracle SQL as sim_topk_bruteforce (the request-dialect
        #     bridge onto the declared similarity surface)
        "es_knn_search",
        # es_knn_search_ivf — PROMOTED round 11 (VERDICT r10 Next
        #     #3): the ES 8 knn request served from the materialized
        #     IVF index, recall-checked against the exact answer.
        # es_suggest_* — the _search suggest section (round 9):
        #     completion (prefix vocab top-k by df) and term (fuzzy
        #     corrections ranked distance asc / df desc, the Lucene
        #     candidate order). Demoted-green pending rotation
        "es_suggest_completion",
        "es_suggest_term",
        # Rotated OUT of the declared 50 in round 9 (second swap) so
        # the gate carries the ES _search compiler the round built.
        # Families stay declared:
        #   corpus_splits — deterministic hash splits; the sampling
        #       family stays declared via corpus_stratified (same
        #       md5-rank window machinery) and corpus_packing
        #   corpus_temperature — temperature reweighting; same
        #       weighted-window surface as corpus_stratified (and the
        #       A-ES weighted form is pytest-verified)
        #   sim_topk_bruteforce — exact cosine top-k; sim_topk_batch
        #       IS the batch superset of the same operator (identical
        #       score fold, same oracle family)
        #   text_token_count — whitespace+BPE-ish token counts; the
        #       SAME columns are computed by the declared
        #       corpus_attributes (document_attributes), and
        #       text_quality keeps the text-analysis chain declared
        "corpus_splits",
        "corpus_temperature",
        "sim_topk_bruteforce",
        "text_token_count",
        # Rotated OUT of the declared 50 in round 9 so the gate carries
        # the round-8 verification surface it could not previously see
        # (corpus_match_phrase, corpus_highlight, mm_binary_clusters,
        # corpus_decontaminate_bloom, sink_ndjson_roundtrip — VERDICT
        # r08 Next #1). Each has a declared sibling keeping its
        # operator family in the gate:
        #   q22_idle_customers — NOT-EXISTS anti-join + scalar-avg
        #       subquery; semi_anti_join keeps the semi/anti shuffle
        #       family declared, q18 keeps agg-subquery shapes
        #   q11_important_parts — correlated HAVING-fraction subquery;
        #       q18's grouped-having IN-subquery keeps the shape
        #   events_json — get_json_object/from_json extraction
        #       battery; dump_roundtrip's from_json coercion chain IS
        #       the declared JSON surface (ops #11-18), events_hourly
        #       keeps the events scan declared
        #   text_lang_id — n-gram-heuristic language classification;
        #       text_quality keeps the regexp-classification chain
        #       declared (same stopword/ratio machinery)
        #   sim_ann_lsh — random-hyperplane sign-LSH over a literal
        #       plane set; sim_ann_hyperplane keeps the identical
        #       sign-sketch surface declared
        "q22_idle_customers",
        "q11_important_parts",
        "events_json",
        "text_lang_id",
        "sim_ann_lsh",
        # Rotated OUT of the declared 50 in round 10 so the gate
        # carries the round-9 production surface (corpus_bm25_served,
        # es_transform_pivot, es_percolate, corpus_span_near,
        # corpus_more_like_this — VERDICT r09 Next #2).  Each of these
        # five has a declared sibling keeping its operator family in
        # the gate:
        #   q9_nation_profit — multi-join profit rollup; q3/q5/q8/q10
        #       keep the multi-join family declared, rollup_region_
        #       nation keeps grouped rollups
        #   events_top_users — TakeOrdered top-k over an agg; q3/q18
        #       keep top-k declared, events_hourly keeps the events
        #       scan
        #   text_chunking — fixed-stride token chunking; corpus_packing
        #       (greedy sequence packing) keeps the chunk/pack surface
        #       declared, text_quality the text chain
        #   sim_ann_hyperplane — sign-sketch ANN; sim_ann_ivf_indexed
        #       + sim_ivf_recall keep the ANN serving family declared,
        #       sim_topk_batch the exact fold
        #   corpus_highlight — snippet extraction; corpus_match_phrase
        #       and corpus_bm25 keep the retrieval family declared
        "q9_nation_profit",
        "events_top_users",
        "text_chunking",
        "sim_ann_hyperplane",
        "corpus_highlight",
        # Rotated OUT of the declared 50 in round 11 so the gate
        # carries the round-10 production heads (es_date_histogram_
        # gapfill, es_knn_search_ivf, corpus_rank_eval,
        # es_extended_stats, es_percolate_bulk — VERDICT r10 Next #3).
        # Each of these five has a declared sibling keeping its
        # operator family in the gate:
        #   corpus_more_like_this — MLT derives a query then runs the
        #       same BM25 core; corpus_bm25 / corpus_span_near /
        #       corpus_match_phrase keep the retrieval family declared
        #   sim_topk_batch — batch exact cosine fold; sim_ann_ivf_
        #       indexed + sim_ivf_recall keep similarity declared and
        #       the promoted es_knn_search_ivf adds the request route
        #   events_value_bands — the binned range join's demo row;
        #       asof_events_orders keeps the keyless-join family
        #       declared and percolate_bulk now exercises the binned
        #       route inside a declared row
        #   corpus_attributes — per-doc attribute battery;
        #       corpus_filter and corpus_packing keep the text-
        #       attribute chain declared (same token/ratio machinery)
        #   text_quality — quality-ratio filters; corpus_filter keeps
        #       the quality-gate surface declared
        "corpus_more_like_this",
        "sim_topk_batch",
        "events_value_bands",
        "corpus_attributes",
        "text_quality",
        # Rotated OUT of the declared 50 in round 12 so the gate
        # carries the round-11 heads (es_nested_query, es_geohash_grid,
        # es_auto_date_histogram, corpus_bm25_stopwords,
        # es_date_histogram_gapfill_month — VERDICT r11 Next #2).
        # Each of these five has a declared sibling keeping its
        # operator family in the gate:
        #   es_extended_stats — exact-moments metric battery;
        #       es_metric_variants held the family before promotion
        #       and es_aggs_tree keeps metric aggs declared (was
        #       promoted r11; its moment tree is unchanged and still
        #       pytest+demoted-oracle verified)
        "es_extended_stats",
        #   corpus_match_phrase — exact phrase positions;
        #       corpus_span_near keeps the positional (slop) family
        #       declared, corpus_bm25 the retrieval chain
        "corpus_match_phrase",
        #   dedup_ngram_jaccard — ngram-Jaccard near-dup pairs;
        #       dedup_minhash_lsh + dedup_simhash + corpus_dedup keep
        #       the near-dup family declared (same shingle machinery)
        "dedup_ngram_jaccard",
        #   events_hourly — tumbling-window counts; events_sessionize
        #       keeps the events/streaming family declared and
        #       test_streaming pins batch≡stream for the window shape
        "events_hourly",
        #   sink_ndjson_roundtrip — ndjson writer round-trip; the
        #       parquet sink is the oracle's input everywhere and the
        #       csv/jsonl siblings stay demoted-green (sink family
        #       fully pytest-covered incl. real-file digests)
        "sink_ndjson_roundtrip",
        # --- round 14 (VERDICT r13 Next #2): five surface-duplicates
        #     demoted so the round-13 dialect rows above could rotate
        #     into the declared 50; every family keeps a declared row.
        #   es_percolate — the bare single-query percolate;
        #       es_percolate_bulk (the O(1)-in-rules reverse-search
        #       plan) and es_percolate_phrase (the round-14 bound-
        #       tokenizer plan) keep the percolate family declared
        "es_percolate",
        #   es_date_histogram_gapfill — UTC-grid gap-fill;
        #       es_date_histogram_tz_iana gap-fills with extended
        #       bounds on the harder LOCAL-wall grid across a DST
        #       transition, so the UTC row is strictly subsumed
        "es_date_histogram_gapfill",
        #   corpus_bm25_stopwords — stop-filter-only analyzer;
        #       corpus_bm25_stemmed runs the full stop+length+stem
        #       analyzer spec over the same BM25 plan
        "corpus_bm25_stopwords",
        #   dedup_simhash — 64-bit SimHash banding; the dedup family
        #       keeps 5 declared rows (exact, minhash_lsh, corpus,
        #       incremental, clusters)
        "dedup_simhash",
        #   q5_local_supplier_volume — the TPC-H multi-join shape;
        #       TPC-H keeps 5 declared rows (q1/q3/q8/q10/q18)
        "q5_local_supplier_volume",
        # --- round 16: five surface-duplicates demoted so the
        #     round-15 dialect rows above (es_compound_filter,
        #     es_simple_query_string, es_ip_range, es_terms_set,
        #     esql_events_rollup) could rotate into the declared 50;
        #     every family keeps a declared row.
        #   q10_returned_items — join + group-agg shape; TPC-H keeps
        #       q1/q3/q18 declared (q8/q5/q10 now all demoted-green)
        "q10_returned_items",
        #   corpus_bm25_stemmed — the stop+length+stem analyzer BM25;
        #       corpus_bm25 + corpus_bm25_served keep the BM25 family
        #       declared (standard/stopwords/stemmed all sweep-green)
        "corpus_bm25_stemmed",
        #   es_nested_query — the basic nested query;
        #       es_nested_inside_nested is the harder nested row and
        #       stays declared (es_nested_agg/match/inner_hits
        #       sweep-green)
        "es_nested_query",
        #   es_percolate_phrase — promoted r14 to make the
        #       bound-tokenizer fix load-bearing, two green rounds
        #       since; es_percolate_bulk keeps the reverse-search
        #       plan declared
        "es_percolate_phrase",
        #   es_multi_rare_terms — multi_terms + rare_terms variants;
        #       es_aggs_tree + es_categorize_text +
        #       es_frequent_item_sets keep the terms-family ranking
        #       discipline declared
        "es_multi_rare_terms",
        # --- round 16: new rows land demoted-green pending the next
        #     rotation window (the standing rhythm).  Five of them
        #     (esql_lookup_enrich, es_ip_prefix, es_random_sampler,
        #     es_intervals, es_span_queries) were PROMOTED in round 17
        #     per VERDICT r16 Next #1 — see the declared-set comments.
        # esql_values_top — the VALUES/TOP multi-value aggregates
        #     under the engine's sorted deterministic reading,
        #     composed with the MV_* family
        "esql_values_top",
        # es_combined_features — combined_fields term-centric match
        #     + rank_feature/distance_feature exists() reductions
        #     (PARITY #37; es_search_hits keeps the query-DSL page
        #     family declared)
        "es_combined_features",
        # es_terms_lookup — the terms LOOKUP form resolved by a
        #     bounded 1-doc fetch + literal rewrite (PARITY #38)
        "es_terms_lookup",
        # es_match_fuzzy — match + fuzziness: per-token AUTO-edit
        #     containment under the match operator (the search-box
        #     typo shape; corpus_fuzzy_match keeps the whole-value
        #     twin sweep-green)
        "es_match_fuzzy",
        # es_geo_grid — the map-click cell filter: key-expression
        #     equality with the geotile/geohash agg trees (agg ≡
        #     query pinned in pytest)
        "es_geo_grid",
        # --- round 17: new rows land demoted-green pending the next
        #     rotation window (the standing rhythm).
        # es_function_score — function_score/script_score filter-
        #     context reductions (VERDICT r16 Next #2, PARITY #43):
        #     match exactly the inner query; min_score raises
        #     (es_compound_filter keeps the wrapper family declared)
        "es_function_score",
        # esql_sample — the ES 9.x SAMPLE command as the
        #     random_sampler portable-hash filter, `SAMPLE p ON
        #     field` determinism extension (VERDICT r16 Next #6,
        #     PARITY #35; esql_events_rollup + esql_lookup_enrich
        #     keep the ES|QL compiler declared)
        "esql_sample",
        # --- round 17: five surface-duplicates demoted so the
        #     round-16 rows (esql_lookup_enrich, es_intervals,
        #     es_span_queries, es_ip_prefix, es_random_sampler)
        #     could rotate into the declared 50 (VERDICT r16 Next
        #     #1); every family keeps a declared row.
        #   corpus_bm25 — corpus_bm25_served is the bit-identical
        #       production superset (build-once/serve-many postings)
        #       and stays declared alongside corpus_hybrid_rrf /
        #       corpus_rank_eval
        "corpus_bm25",
        #   sim_label_centroids — the centroid shape lives inside the
        #       declared IVF path (sim_ann_ivf_indexed trains the
        #       same k-means centroids); sim_knn_graph keeps the
        #       similarity family at 3 declared rows
        "sim_label_centroids",
        #   corpus_dup_clusters — the dedup family keeps 4 declared
        #       rows (dedup_exact, dedup_minhash_lsh, corpus_dedup,
        #       corpus_dedup_incremental); the transitive-collapse
        #       cluster audit stays sweep-green
        "corpus_dup_clusters",
        #   es_date_histogram_tz_iana — two green rounds since its
        #       round-14 promotion; es_aggs_tree keeps
        #       date_histogram declared, the IANA tzdb pin stays
        #       sweep-green
        "es_date_histogram_tz_iana",
        #   es_suggest_phrase — two green rounds since the round-15
        #       beam rewrite; es_suggest_completion /
        #       es_suggest_term stay sweep-green
        "es_suggest_phrase",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The declared set: exactly 50 entries, all with oracles."""
    return {k: v for k, v in _all_queries().items() if k not in DEMOTED}


def demoted_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Implemented-but-undeclared queries (see DEMOTED); pytest runs
    these against ``demoted_oracle_sql()`` so they stay verified."""
    return {k: v for k, v in _all_queries().items() if k in DEMOTED}


def oracle_sql() -> dict[str, str]:
    return {k: v for k, v in _all_oracle_sql().items() if k not in DEMOTED}


def demoted_oracle_sql() -> dict[str, str]:
    return {k: v for k, v in _all_oracle_sql().items() if k in DEMOTED}


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # — dump parity (SURVEY §2 ops #3,4,11-18) —
        "dump_roundtrip": q_dump_roundtrip,
        # — the 8 queries the r2 correctness window never reached go
        #   FIRST so any future cap rotation covers them —
        "sim_ann_hyperplane": _mod("similarity", "ann_hyperplane_lsh"),
        "sim_ann_ivf": _mod("similarity", "ann_ivf"),
        "sim_ann_ivf_indexed": q_sim_ann_ivf_indexed,
        "sim_ann_ivf_sq8": q_sim_ann_ivf_sq8,
        "sim_ann_ivf_pq": q_sim_ann_ivf_pq,
        "sim_topk_batch": _mod("similarity", "topk_batch"),
        "sim_label_centroids": _mod("similarity", "label_centroids"),
        "grouped_robust_stats": _mod("grouped", "robust_stats"),
        "mm_binary_metadata": _mod("multimodal", "binary_metadata"),
        "mm_decode_stub": _mod("multimodal", "decode_metadata"),
        "mm_frame_sample": _mod("multimodal", "frame_sample"),
        # — relational (SURVEY §2.2) —
        "q1_pricing_summary": _rel("q1_pricing_summary"),
        "q3_shipping_priority": _rel("q3_shipping_priority"),
        "q5_local_supplier_volume": _rel("q5_local_supplier_volume"),
        "q7_nation_volume": _rel("q7_nation_volume"),
        "q10_returned_items": _rel("q10_returned_items"),
        "q2_min_price_part": _rel("q2_min_price_part"),
        "q4_priority_returns": _rel("q4_priority_returns"),
        "q6_revenue_band": _rel("q6_revenue_band"),
        "q8_market_share": _rel("q8_market_share"),
        "q9_nation_profit": _rel("q9_nation_profit"),
        "q11_important_parts": _rel("q11_important_parts"),
        "q12_priority_split": _rel("q12_priority_split"),
        "q13_customer_distribution": _rel("q13_customer_distribution"),
        "q17_small_quantity_revenue": _rel("q17_small_quantity_revenue"),
        "q21_waiting_supplier_shape": _rel("q21_waiting_supplier_shape"),
        "q14_promo_revenue": _rel("q14_promo_revenue"),
        "q15_top_supplier": _rel("q15_top_supplier"),
        "q18_large_volume": _rel("q18_large_volume"),
        "q19_disjunctive_brand": _rel("q19_disjunctive_brand"),
        "q22_idle_customers": _rel("q22_idle_customers"),
        "rollup_region_nation": _rel("q_rollup_region_nation"),
        "cube_order_status": _rel("q_cube_order_status"),
        "distinct_agg": _rel("q_distinct_agg"),
        "semi_anti_join": _rel("q_semi_anti_join"),
        "setops": _rel("q_setops"),
        "window_customer_orders": _rel("q_window_customer_orders"),
        "top_customers": _rel("q_top_customers"),
        "events_json": _rel("q_events_json"),
        "events_hourly": _rel("q_events_hourly"),
        "events_sessionize": _rel("q_events_sessionize"),
        "events_session_window": _rel("q_events_session_window"),
        "events_sliding": _rel("q_events_sliding"),
        "events_variant": _rel("q_events_variant"),
        "events_pivot": _rel("q_events_pivot"),
        "events_top_users": _rel("q_events_top_users"),
        "scalar_functions": _rel("q_scalar_functions"),
        "asof_events_orders": _mod("asof", "events_last_order"),
        # — streaming (batch-equivalent plan; true stream tested in tests/) —
        "stream_window_counts": _stream_batch_equiv,
        "events_click_attribution": q_events_click_attribution,
        "corpus_dedup": q_corpus_dedup,
        "split_contamination": q_split_contamination,
        "text_repetition": _mod("text", "repetition_signals"),
        "corpus_filter": _mod("text", "corpus_filter_summary"),
        "q16_supplier_part_types": _rel("q16_supplier_part_types"),
        "q20_dominant_supplier_shape": _rel("q20_dominant_supplier_shape"),
        # — text analysis —
        "text_token_count": _mod("text", "token_count"),
        "text_quality": _mod("text", "quality_score"),
        "text_lang_id": _mod("text", "lang_id"),
        "text_fingerprint": _mod("text", "fingerprint"),
        "text_chunking": _mod("chunking", "chunk_stats"),
        "corpus_packing": _mod("packing", "packing_summary"),
        "text_redact": q_text_redact,
        "corpus_splits": _mod("sampling", "split_summary"),
        "corpus_stratified": _mod("sampling", "stratified_summary"),
        "corpus_temperature": _mod("sampling", "temperature_summary"),
        "corpus_mix": _mod("sampling", "mix_summary"),
        "corpus_shuffle": _mod("sampling", "shuffle_summary"),
        "dedup_spans": _mod("spans", "span_summary"),
        "embedding_quantize": _mod("embedding_ops", "quantize_summary"),
        "corpus_profile": _mod("profile", "corpus_profile"),
        "corpus_curriculum": _mod("profile", "curriculum_summary"),
        "text_vocab": _mod("text", "vocab_summary"),
        "corpus_triplets": _mod("triplets", "triplet_summary"),
        "corpus_decontaminate": _mod("spans", "decontaminate_summary"),
        "corpus_decontaminate_bloom": _mod("spans", "decontaminate_bloom_summary"),
        # — dedup —
        "dedup_exact": _mod("dedup", "exact_dedup"),
        "dedup_ngram_jaccard": _mod("dedup", "ngram_jaccard_pairs"),
        "dedup_minhash_lsh": _mod("dedup", "minhash_lsh_pairs"),
        "dedup_simhash": _mod("dedup", "simhash_pairs"),
        "dedup_embedding": _mod("dedup", "embedding_near_dup"),
        # — similarity search —
        "sim_topk_bruteforce": _mod("similarity", "topk_bruteforce"),
        "sim_ann_lsh": _mod("similarity", "ann_sign_lsh"),
        # — keyless range join / snapshot compaction / web curation —
        "events_value_bands": _mod("rangejoin", "value_band_rangejoin"),
        "events_compact_latest": _mod("snapshot", "q_events_compact_latest"),
        "corpus_source_cap": _mod("web", "q_source_cap"),
        "sim_knn_graph": _mod("knn", "q_knn_graph"),
        "corpus_dedup_incremental": _mod("dedup", "q_dedup_incremental"),
        "sim_ivf_recall": q_sim_ivf_recall,
        "corpus_dup_clusters": q_dup_clusters,
        "corpus_attributes": _mod("text", "corpus_attributes"),
        "mm_binary_near_dup": _mod("multimodal", "binary_near_dup"),
        "mm_binary_clusters": _mod("multimodal", "binary_cluster_audit"),
        "events_zorder": _mod("layout", "q_events_zorder"),
        "events_snapshot_diff": _mod("snapshot", "q_events_snapshot_diff"),
        "corpus_lm_score": _mod("lm", "q_corpus_lm_score"),
        "events_union_evolved": q_events_union_evolved,
        "events_rolling_1h": _rel("q_events_rolling_1h"),
        "events_funnel": _rel("q_events_funnel"),
        "events_retention": _rel("q_events_retention"),
        "events_sequence_patterns": _rel("q_events_sequence_patterns"),
        "privacy_k_anonymity": _mod("privacy", "q_privacy_report"),
        "events_anomalies": _rel("q_events_anomalies"),
        "sketch_error_bounds": _mod("profile", "sketch_error_bounds"),
        "sink_csv_roundtrip": _sink("csv_roundtrip_digest"),
        "sink_ndjson_roundtrip": _sink("ndjson_roundtrip_digest"),
        "sink_jsonl_roundtrip": _sink("jsonl_roundtrip_digest"),
        "corpus_bm25": _mod("retrieval", "q_corpus_bm25"),
        "corpus_hybrid_rrf": _mod("retrieval", "q_corpus_hybrid_rrf"),
        "es_retriever_rrf": _mod("retrieval", "q_es_retriever_rrf"),
        "corpus_highlight": _mod("retrieval", "q_corpus_highlight"),
        "corpus_match_phrase": _mod("retrieval", "q_corpus_match_phrase"),
        "corpus_significant_terms": _mod(
            "retrieval", "q_corpus_significant_terms"
        ),
        "corpus_more_like_this": _mod("retrieval", "q_corpus_more_like_this"),
        "corpus_fuzzy_match": _mod("retrieval", "q_corpus_fuzzy_match"),
        "corpus_span_near": _mod("retrieval", "q_corpus_span_near"),
        "corpus_bm25_served": _mod("retrieval", "q_corpus_bm25_served"),
        "corpus_bm25_standard": _mod("retrieval", "q_corpus_bm25_standard"),
        "corpus_bm25_stopwords": _mod(
            "retrieval", "q_corpus_bm25_stopwords"
        ),
        "corpus_bm25_stemmed": _mod("retrieval", "q_corpus_bm25_stemmed"),
        "corpus_rank_eval": _mod("retrieval", "q_corpus_rank_eval"),
        # — the ES _search request compiler (round 9): query DSL →
        #   Catalyst Column, aggregation trees → one ROLLUP shuffle —
        "es_search_hits": _mod("es_search", "q_es_search_hits"),
        "es_aggs_tree": _mod("es_search", "q_es_aggs_tree"),
        "es_range_buckets": _mod("es_search", "q_es_range_buckets"),
        "es_histogram": _mod("es_search", "q_es_histogram"),
        "es_date_histogram_gapfill": _mod(
            "es_search", "q_es_date_histogram_gapfill"
        ),
        "es_filters_agg": _mod("es_search", "q_es_filters_agg"),
        "es_composite_page": _mod("es_search", "q_es_composite_page"),
        "es_composite_missing": _mod(
            "es_search", "q_es_composite_missing"
        ),
        "es_composite_datehist": _mod(
            "es_search", "q_es_composite_datehist"
        ),
        # — round 15 (VERDICT r14 Next #3-#8): compound filter-context
        #   wrappers, the lenient search-box grammar, the
        #   search-as-you-type prefix matches, ip/CIDR + ip_range,
        #   terms_set, and the composite map-tile walk —
        "es_compound_filter": _mod("es_search", "q_es_compound_filter"),
        "es_function_score": _mod("es_search", "q_es_function_score"),
        "es_simple_query_string": _mod(
            "querystring", "q_es_simple_query_string"
        ),
        "es_match_prefix": _mod("es_search", "q_es_match_prefix"),
        "es_ip_range": _mod("es_search", "q_es_ip_range"),
        "es_terms_set": _mod("es_search", "q_es_terms_set"),
        "es_composite_geotile": _mod(
            "es_search", "q_es_composite_geotile"
        ),
        # — round 15: the ES|QL pipe-language compiler (ES 8.11+'s
        #   modern request dialect replayed on the lake) —
        "es_count": _mod("es_search", "q_es_count"),
        "esql_events_rollup": _mod("esql", "q_esql_events_rollup"),
        "esql_docs_tokens": _mod("esql", "q_esql_docs_tokens"),
        # — round 16: LOOKUP JOIN (ES 8.18) + ENRICH as broadcast
        #   dimension joins; ip_prefix subnet rollup; random_sampler —
        "esql_lookup_enrich": _mod("esql", "q_esql_lookup_enrich"),
        "esql_sample": _mod("esql", "q_esql_sample"),
        "esql_values_top": _mod("esql", "q_esql_values_top"),
        "es_ip_prefix": _mod("es_search", "q_es_ip_prefix"),
        "es_random_sampler": _mod("es_search", "q_es_random_sampler"),
        "es_combined_features": _mod(
            "es_search", "q_es_combined_features"
        ),
        "es_terms_lookup": _mod("es_search", "q_es_terms_lookup"),
        "es_intervals": _mod("es_search", "q_es_intervals"),
        "es_span_queries": _mod("es_search", "q_es_span_queries"),
        "es_match_fuzzy": _mod("es_search", "q_es_match_fuzzy"),
        "es_geo_grid": _mod("es_search", "q_es_geo_grid"),
        "es_search_highlight": _mod("es_search", "q_es_search_highlight"),
        "es_geo_queries": _mod("es_search", "q_es_geo_queries"),
        "es_geo_shape": _mod("es_search", "q_es_geo_shape"),
        "es_geohash_grid": _mod("es_search", "q_es_geohash_grid"),
        "es_geotile_grid": _mod("es_search", "q_es_geotile_grid"),
        "es_geo_distance_rings": _mod(
            "es_search", "q_es_geo_distance_rings"
        ),
        "es_auto_date_histogram": _mod(
            "es_search", "q_es_auto_date_histogram"
        ),
        "es_nested_query": _mod("es_search", "q_es_nested_query"),
        "es_nested_agg": _mod("es_search", "q_es_nested_agg"),
        "es_reverse_nested": _mod("es_search", "q_es_reverse_nested"),
        "es_multi_rare_terms": _mod("es_search", "q_es_multi_rare_terms"),
        "es_range_overlap": _mod("es_search", "q_es_range_overlap"),
        "es_gapfill_moving_fn": _mod("es_search", "q_es_gapfill_moving_fn"),
        "es_nested_match": _mod("es_search", "q_es_nested_match"),
        "es_filters_under_terms": _mod(
            "es_search", "q_es_filters_under_terms"
        ),
        "es_terms_include_exclude": _mod(
            "es_search", "q_es_terms_include_exclude"
        ),
        "es_terms_partition": _mod(
            "es_search", "q_es_terms_partition"
        ),
        "es_top_hits_nonleaf": _mod(
            "es_search", "q_es_top_hits_nonleaf"
        ),
        "es_significant_heuristics": _mod(
            "es_search", "q_es_significant_heuristics"
        ),
        "es_date_histogram_tz": _mod("es_search", "q_es_date_histogram_tz"),
        "es_date_histogram_tz_iana": _mod(
            "es_search", "q_es_date_histogram_tz_iana"
        ),
        "es_adjacency_matrix": _mod("es_search", "q_es_adjacency_matrix"),
        "es_geo_bounds_string_stats": _mod(
            "es_search", "q_es_geo_bounds_string_stats"
        ),
        "es_matrix_stats": _mod("es_search", "q_es_matrix_stats"),
        "es_significant_terms_per_bucket": _mod(
            "es_search", "q_es_significant_terms_per_bucket"
        ),
        "es_nested_inner_hits": _mod(
            "es_search", "q_es_nested_inner_hits"
        ),
        "es_moving_fn_extended": _mod(
            "es_search", "q_es_moving_fn_extended"
        ),
        "es_percolate_phrase": _mod(
            "es_search", "q_es_percolate_phrase"
        ),
        "es_normalize_zscore": _mod(
            "es_search", "q_es_normalize_zscore"
        ),
        "es_diversified_sampler": _mod(
            "es_search", "q_es_diversified_sampler"
        ),
        "es_string_stats_entropy": _mod(
            "es_search", "q_es_string_stats_entropy"
        ),
        "es_significant_text": _mod(
            "es_search", "q_es_significant_text"
        ),
        "es_cumulative_cardinality": _mod(
            "es_search", "q_es_cumulative_cardinality"
        ),
        "es_boxplot_derivative_unit": _mod(
            "es_search", "q_es_boxplot_derivative_unit"
        ),
        "es_rate_mad": _mod("es_search", "q_es_rate_mad"),
        "es_rate_iana": _mod("es_search", "q_es_rate_iana"),
        "es_categorize_text": _mod(
            "es_search", "q_es_categorize_text"
        ),
        "es_nested_inside_nested": _mod(
            "es_search", "q_es_nested_inside_nested"
        ),
        "es_bucket_summaries": _mod("es_search", "q_es_bucket_summaries"),
        "es_moving_percentiles": _mod(
            "es_search", "q_es_moving_percentiles"
        ),
        "es_global_agg": _mod("es_search", "q_es_global_agg"),
        "es_string_stats_distribution": _mod(
            "es_search", "q_es_string_stats_distribution"
        ),
        "es_transform_latest": _mod(
            "transform", "q_es_transform_latest"
        ),
        "es_has_child": _mod("es_search", "q_es_has_child"),
        "es_has_child_inner_hits": _mod(
            "es_search", "q_es_has_child_inner_hits"
        ),
        "es_has_parent_inner_hits": _mod(
            "es_search", "q_es_has_parent_inner_hits"
        ),
        "es_reverse_nested_aggs": _mod(
            "es_search", "q_es_reverse_nested_aggs"
        ),
        "es_frequent_item_sets": _mod(
            "es_search", "q_es_frequent_item_sets"
        ),
        "es_significant_terms_bgfilter": _mod(
            "es_search", "q_es_significant_terms_bgfilter"
        ),
        "es_has_parent": _mod("es_search", "q_es_has_parent"),
        "es_children_agg": _mod("es_search", "q_es_children_agg"),
        "es_bucket_selector": _mod("es_search", "q_es_bucket_selector"),
        "es_significant_terms": _mod("es_search", "q_es_significant_terms"),
        "es_date_histogram_gapfill_month": _mod(
            "es_search", "q_es_date_histogram_gapfill_month"
        ),
        "es_filter_missing_range": _mod(
            "es_search", "q_es_filter_missing_range"
        ),
        "es_metric_variants": _mod("es_search", "q_es_metric_variants"),
        "es_extended_stats": _mod("es_search", "q_es_extended_stats"),
        "es_top_hits": _mod("es_search", "q_es_top_hits"),
        "es_pipeline_aggs": _mod("es_search", "q_es_pipeline_aggs"),
        "es_query_string": _mod("querystring", "q_es_query_string"),
        "es_collapse": _mod("es_search", "q_es_collapse"),
        "es_search_after": _mod("es_search", "q_es_search_after"),
        "es_transform_pivot": _mod("transform", "q_es_transform_pivot"),
        "es_percolate": _mod("es_search", "q_es_percolate"),
        "es_percolate_bulk": _mod("es_search", "q_es_percolate_bulk"),
        "es_terms_missing_offset": _mod(
            "es_search", "q_es_terms_missing_offset"
        ),
        "es_knn_search": _mod("es_search", "q_es_knn_search"),
        "es_knn_search_ivf": q_es_knn_search_ivf,
        "es_suggest_completion": _mod("retrieval", "q_es_suggest_completion"),
        "es_suggest_term": _mod("retrieval", "q_es_suggest_term"),
        "es_suggest_phrase": _mod("retrieval", "q_es_suggest_phrase"),
    }


# ---------------------------------------------------------------------------
# DuckDB oracles — same column names, same values
# ---------------------------------------------------------------------------

_SHINGLES = r"""
list_distinct([array_to_string(t[x+1:x+3], ' ')
               FOR x IN range(0, greatest(len(t)-3, 0) + 1)])
"""

_TOKS = r"regexp_split_to_array(trim(text), '\s+')"



def _geohash_grid_sql(precision: int) -> str:
    """DuckDB mirror of es_search._geohash_expr for the synthesized
    events coordinates: the same floor-scaled cell indices, the same
    unrolled lon-first bit interleave, the same base-32 chars."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    nbits = 5 * precision
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2
    terms = []
    for j in range(nbits):
        if j % 2 == 0:
            src, bi = "lon_i", n_lon - 1 - j // 2
        else:
            src, bi = "lat_i", n_lat - 1 - j // 2
        terms.append(f"((({src} >> {bi}) & 1) << {nbits - 1 - j})")
    morton = " | ".join(terms)
    chars = " || ".join(
        f"substr('{b32}', CAST((morton >> {5 * (precision - 1 - c)}) & 31 "
        "AS INT) + 1, 1)"
        for c in range(precision)
    )
    return f"""
        WITH g AS (
          SELECT value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        ),
        i AS (
          SELECT lat, lon,
                 least(CAST(floor((lon + 180.0) / 360.0
                            * {float(2 ** n_lon)}) AS BIGINT),
                       {2 ** n_lon - 1}) AS lon_i,
                 least(CAST(floor((lat + 90.0) / 180.0
                            * {float(2 ** n_lat)}) AS BIGINT),
                       {2 ** n_lat - 1}) AS lat_i
          FROM g
          WHERE lat IS NOT NULL AND lon IS NOT NULL
            AND lat >= -90.0 AND lat <= 90.0
            AND lon >= -180.0 AND lon <= 180.0
        ),
        m AS (SELECT lat, lon, {morton} AS morton FROM i),
        k AS (SELECT lat, lon, {chars} AS cells FROM m)
        SELECT CAST(1 AS INT) AS level, cells, count(*) AS doc_count,
               CAST(sum(CAST(lat AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lat,
               CAST(sum(CAST(lon AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lon
        FROM k GROUP BY cells ORDER BY cells
    """


def _all_oracle_sql() -> dict[str, str]:
    q = {}

    q["dump_roundtrip"] = """
        SELECT event_id, ts, user_id, event_type, value,
               CAST(props::JSON->>'k' AS BIGINT) AS props_k
        FROM events ORDER BY event_id
    """

    q["q1_pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """

    q["q3_shipping_priority"] = """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """

    q["q5_local_supplier_volume"] = """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lineitems
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """

    q["q7_nation_volume"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS ship_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS volume,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name < n2.n_name
        GROUP BY 1, 2, 3
        HAVING count(*) >= 5
        ORDER BY 1, 2, 3
    """

    q["q10_returned_items"] = """
        SELECT c_custkey, c_name, n_name,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_returned
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """

    q["q2_min_price_part"] = """
        WITH m AS (
          SELECT p_type AS mt, min(p_retailprice) AS min_price
          FROM part GROUP BY 1
        )
        SELECT p_type, p_partkey, p_name,
               CAST(p_retailprice AS DOUBLE) AS retail
        FROM part JOIN m ON p_type = mt AND p_retailprice = min_price
        ORDER BY p_type, p_partkey
    """

    q["q4_priority_returns"] = """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """

    q["q6_revenue_band"] = """
        SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount >= 0.02 AND l_discount <= 0.06
          AND l_quantity < 24
    """

    q["q8_market_share"] = """
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CASE WHEN n1.n_name = 'NATION_7'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                 AS mkt_share,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_volume
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        GROUP BY 1 ORDER BY 1
    """

    q["q9_nation_profit"] = """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             - p_retailprice * l_quantity * 0.1
                        AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%r%'
        GROUP BY 1, 2
        ORDER BY nation ASC, o_year DESC
    """

    q["q11_important_parts"] = """
        WITH pp AS (
          SELECT l_partkey,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS part_value
          FROM lineitem GROUP BY 1
        ), t AS (
          SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) * 0.0006 AS threshold
          FROM lineitem
        )
        SELECT l_partkey, part_value
        FROM pp, t WHERE part_value > threshold
        ORDER BY part_value DESC, l_partkey ASC
    """

    q["q12_priority_split"] = """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY l_returnflag ORDER BY l_returnflag
    """

    q["q13_customer_distribution"] = """
        WITH per_cust AS (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
          GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """

    q["q17_small_quantity_revenue"] = """
        WITH avg_qty AS (
          SELECT l_partkey AS ap_key,
                 CAST(avg(CAST(l_quantity AS DECIMAL(18,2))) * 0.2 AS DOUBLE) AS qty_cut
          FROM lineitem GROUP BY l_partkey
        )
        SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
        JOIN avg_qty ON l_partkey = ap_key
        WHERE CAST(l_quantity AS DOUBLE) < qty_cut
    """

    # the oracle keeps the LITERAL NOT IN subquery, independently
    # verifying the engine's broadcast anti-join decorrelation
    q["q16_supplier_part_types"] = """
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type NOT LIKE 'SMALL%'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """

    # decimal sums through the share comparison keep the 0.5 cut exact
    q["q20_dominant_supplier_shape"] = """
        WITH w AS (
          SELECT l_partkey, l_suppkey,
                 sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem
          JOIN part ON p_partkey = l_partkey AND p_name LIKE 'small%'
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY l_partkey, l_suppkey
        ), tot AS (
          SELECT l_partkey AS t_key, sum(q) AS tq FROM w GROUP BY l_partkey
        ), dominant AS (
          SELECT l_suppkey, count(DISTINCT l_partkey) AS n_dominant_parts
          FROM w JOIN tot ON l_partkey = t_key
          WHERE q > tq * 0.5
          GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, n_dominant_parts
        FROM supplier JOIN dominant ON s_suppkey = l_suppkey
        ORDER BY s_name, s_suppkey
    """

    # TIMESTAMP day + BIGINT casts so the strict (dtype-sensitive)
    # canonicalizer agrees too: DATE and HUGEINT render differently
    # through the two toPandas paths
    q["events_pivot"] = """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
        FROM events GROUP BY day ORDER BY day
    """

    # the oracle keeps the LITERAL correlated EXISTS / NOT EXISTS, so
    # it independently verifies the engine's count-based decorrelation
    q["q21_waiting_supplier_shape"] = """
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND date_diff('day', o_orderdate, l_shipdate) > 60
        )
        SELECT l_suppkey AS s_suppkey, count(*) AS numwait
        FROM late l1
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY l_suppkey
        ORDER BY numwait DESC, s_suppkey ASC
        LIMIT 100
    """

    q["q14_promo_revenue"] = """
        SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                        THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
                 AS promo_revenue_pct,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """

    q["q15_top_supplier"] = """
        WITH r AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM r)
        ORDER BY s_suppkey
    """

    q["q18_large_volume"] = """
        WITH big AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """

    q["q19_disjunctive_brand"] = """
        SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """

    q["q22_idle_customers"] = """
        WITH pool AS (
          SELECT *, substring(c_name, 17, 2) AS cntrycode FROM customer
          WHERE substring(c_name, 17, 2) IN ('00','11','22','33','44','55','66')
        ), a AS (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
          FROM pool WHERE c_acctbal > 0
        )
        SELECT cntrycode, count(*) AS numcust,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM pool, a
        WHERE c_acctbal > avg_bal
          AND c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY cntrycode ORDER BY cntrycode
    """

    q["rollup_region_nation"] = """
        SELECT r_name, n_name,
               count(*) AS n_customers,
               CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
    """

    q["cube_order_status"] = """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """

    q["distinct_agg"] = """
        SELECT o_orderpriority,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """

    q["semi_anti_join"] = """
        WITH w AS (
          SELECT c_nationkey, count(*) AS with_orders FROM customer
          WHERE c_custkey IN (SELECT o_custkey FROM orders)
          GROUP BY c_nationkey
        ), wo AS (
          SELECT c_nationkey, count(*) AS without_orders FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
          GROUP BY c_nationkey
        )
        SELECT n_name,
               coalesce(with_orders, 0) AS with_orders,
               coalesce(without_orders, 0) AS without_orders
        FROM nation
        LEFT JOIN w ON n_nationkey = w.c_nationkey
        LEFT JOIN wo ON n_nationkey = wo.c_nationkey
        ORDER BY n_name
    """

    q["setops"] = """
        SELECT
          (SELECT count(*) FROM (
             SELECT o_custkey FROM orders WHERE o_orderstatus='O'
             INTERSECT
             SELECT o_custkey FROM orders WHERE o_orderstatus='F')) AS both_statuses,
          (SELECT count(*) FROM (
             SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='O'
             EXCEPT
             SELECT o_custkey FROM orders WHERE o_orderstatus='F')) AS only_open,
          (SELECT count(*) FROM (
             SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus='F'
             EXCEPT
             SELECT o_custkey FROM orders WHERE o_orderstatus='O')) AS only_done,
          (SELECT count(DISTINCT o_custkey) FROM orders
             WHERE o_orderstatus IN ('O','F')) AS either
    """

    q["window_customer_orders"] = """
        SELECT * FROM (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER w AS order_seq,
                 CAST(lag(o_totalprice) OVER w AS DOUBLE) AS prev_price,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS DOUBLE) AS running_total
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        ) WHERE o_custkey <= 100
        ORDER BY o_custkey, order_seq
    """

    q["top_customers"] = """
        SELECT c_custkey, c_name,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spent DESC, c_custkey ASC
        LIMIT 25
    """

    q["events_json"] = """
        SELECT event_type,
               CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """

    q["events_hourly"] = """
        SELECT date_trunc('hour', ts) AS hour, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """

    q["events_sessionize"] = """
        WITH gaps AS (
          SELECT user_id, event_id, ts,
                 CAST(floor(epoch(ts)) AS BIGINT)
                   - lag(CAST(floor(epoch(ts)) AS BIGINT))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events
        ), sess AS (
          SELECT user_id, event_id, ts,
                 sum(CASE WHEN gap > 1800 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM gaps
        ), per_session AS (
          SELECT user_id, session_id, count(*) AS n_events,
                 CAST(floor(epoch(max(ts))) AS BIGINT) AS session_end_s,
                 CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s
          FROM sess GROUP BY user_id, session_id
        )
        SELECT user_id,
               count(*) AS n_sessions,
               max(n_events) AS max_session_events,
               CAST(sum(session_end_s - session_start_s) AS BIGINT)
                 AS total_session_seconds
        FROM per_session
        WHERE user_id <= 200
        GROUP BY user_id ORDER BY user_id
    """

    q["events_session_window"] = """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_sess,
                 value
          FROM events
        ), sess AS (
          SELECT user_id, ts, value,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS sid
          FROM gaps
        )
        SELECT user_id,
               CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start_s,
               CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT)
                 AS session_end_s,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM sess
        WHERE user_id <= 100
        GROUP BY user_id, sid
        ORDER BY user_id, session_start_s
    """

    q["events_sliding"] = """
        WITH assigned AS (
          SELECT event_type, value,
                 unnest([b, b - INTERVAL 30 MINUTE]) AS window_start
          FROM (SELECT *, CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800)
                               AS TIMESTAMP) AS b
                FROM events) t
        )
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM assigned
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    q["events_variant"] = """
        SELECT event_type,
               CAST(sum(CAST(props::JSON->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               count(*) AS n_events
        FROM events GROUP BY event_type ORDER BY event_type
    """

    q["asof_events_orders"] = """
        WITH l AS (
          SELECT user_id AS k, ts AS t, 1 AS tag, event_id, ts AS ev_ts,
                 NULL::STRUCT(o_orderdate TIMESTAMP, o_orderkey BIGINT) AS r
          FROM events WHERE event_id < 2000
        ), r AS (
          SELECT o_custkey AS k, o_orderdate AS t, 0 AS tag,
                 NULL::BIGINT AS event_id, NULL::TIMESTAMP AS ev_ts,
                 struct_pack(o_orderdate := o_orderdate, o_orderkey := o_orderkey) AS r
          FROM orders
        ), u AS (
          SELECT * FROM l UNION ALL BY NAME SELECT * FROM r
        ), c AS (
          SELECT *, last_value(r IGNORE NULLS) OVER (
                      PARTITION BY k ORDER BY t, tag, r
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
          FROM u
        )
        SELECT event_id, k AS user_id, ev_ts AS ts,
               m.o_orderdate AS asof_o_orderdate,
               m.o_orderkey AS asof_o_orderkey
        FROM c WHERE tag = 1 ORDER BY event_id
    """

    q["scalar_functions"] = """
        WITH oo AS (
          SELECT o_orderkey,
                 upper(o_orderpriority) AS prio_upper,
                 substr(o_orderpriority, 1, 1) AS prio_code,
                 o_orderstatus || '#' || o_orderpriority AS status_tag,
                 lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS key_padded,
                 CAST(year(o_orderdate) AS INT) AS order_year,
                 CAST(month(o_orderdate) AS INT) AS order_month,
                 CAST(day(o_orderdate) AS INT) AS order_day,
                 abs(o_totalprice - 100000) AS price_dist,
                 round(sqrt(o_totalprice), 6) AS price_sqrt,
                 round(ln(o_totalprice), 6) AS price_ln,
                 o_orderkey % 7 AS key_mod7
          FROM orders WHERE o_orderkey < 500
        ), ee AS (
          SELECT event_id AS o_orderkey,
                 array_to_string(list_sort(str_split_regex(event_type, '')), '')
                   AS type_chars,
                 len(str_split_regex(event_type, '')) AS type_len,
                 CAST(props::JSON->>'k' AS BIGINT) AS props_k,
                 regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_devoweled
          FROM events WHERE event_id < 500
        )
        SELECT oo.*, ee.type_chars, ee.type_len, ee.props_k, ee.type_devoweled
        FROM oo JOIN ee USING (o_orderkey)
        ORDER BY o_orderkey
    """

    q["events_top_users"] = """
        SELECT event_id, user_id, event_type, value
        FROM events ORDER BY value DESC, event_id ASC LIMIT 100
    """

    q["stream_window_counts"] = """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """

    q["events_click_attribution"] = """
        SELECT c.user_id AS user_id,
               c.event_id AS click_id, c.ts AS click_ts,
               p.event_id AS purchase_id, p.ts AS purchase_ts,
               p.value AS purchase_value
        FROM events c JOIN events p ON p.user_id = c.user_id
        WHERE c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY
        ORDER BY click_id, purchase_id
    """

    # — text —
    q["text_token_count"] = f"""
        SELECT doc_id,
               len({_TOKS}) AS n_tokens,
               len(list_distinct({_TOKS})) AS n_distinct_tokens,
               len(regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|\\d+|[^\\sA-Za-z\\d]')) AS n_bpe_tokens,
               length(text) AS n_chars_actual
        FROM documents ORDER BY doc_id
    """

    q["text_repetition"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        w AS (SELECT doc_id, unnest(t) AS w FROM t),
        wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                      max(c) AS top_w,
                      sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_w
               FROM wc GROUP BY 1),
        b AS (SELECT doc_id,
                     unnest([t[x] || ' ' || t[x+1] FOR x IN range(1, len(t))]) AS b
              FROM t WHERE len(t) >= 2),
        bc AS (SELECT doc_id, b, count(*) AS c FROM b GROUP BY 1, 2),
        bs AS (SELECT doc_id, max(c) AS top_b FROM bc GROUP BY 1)
        SELECT doc_id, n_words,
               round(top_w * 1.0 / n_words, 6) AS top_word_frac,
               round(dup_w * 1.0 / n_words, 6) AS dup_word_frac,
               round(top_b * 1.0 / (n_words - 1), 6) AS top_bigram_frac
        FROM ws LEFT JOIN bs USING (doc_id) ORDER BY doc_id
    """

    stop_list = "['the','a','an','of','and','to','in','is','it','that']"

    _not_dropped = (
        "NOT (f_short_tokens OR f_short_chars OR f_no_stopwords "
        "OR f_top_word OR f_dup_words)"
    )
    q["corpus_filter"] = f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS t FROM documents),
        w AS (SELECT doc_id, unnest(t) AS w FROM t),
        wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
        ws AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                      max(c) AS top_w,
                      sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_w
               FROM wc GROUP BY 1),
        g AS (
          SELECT t.doc_id,
                 (ws.n_words < 20) AS f_short_tokens,
                 (length(t.text) < 100) AS f_short_chars,
                 (len(list_intersect(t.t, {stop_list})) < 1) AS f_no_stopwords,
                 (round(top_w * 1.0 / ws.n_words, 6) > 0.12) AS f_top_word,
                 (round(dup_w * 1.0 / ws.n_words, 6) > 0.9) AS f_dup_words
          FROM t JOIN ws ON t.doc_id = ws.doc_id
        )
        SELECT count(*) AS n_docs,
               CAST(sum(CASE WHEN f_short_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_short_tokens,
               CAST(sum(CASE WHEN f_short_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_short_chars,
               CAST(sum(CASE WHEN f_no_stopwords THEN 1 ELSE 0 END) AS BIGINT) AS n_no_stopwords,
               CAST(sum(CASE WHEN f_top_word THEN 1 ELSE 0 END) AS BIGINT) AS n_top_word,
               CAST(sum(CASE WHEN f_dup_words THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_words,
               CAST(sum(CASE WHEN {_not_dropped} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN {_not_dropped} THEN doc_id END) AS BIGINT) AS kept_id_sum,
               CAST(bit_xor(CASE WHEN {_not_dropped} THEN doc_id END) AS BIGINT) AS kept_id_xor
        FROM g
    """
    q["text_quality"] = f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
        SELECT doc_id,
               length(text) AS n_chars_actual,
               len(toks) AS n_tokens,
               len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
               round(len(list_intersect(toks, {stop_list})) * 1.0 / len(toks), 6) AS stopword_ratio,
               round((length(text) - len(toks) + 1) * 1.0 / len(toks), 6) AS avg_word_len,
               (len(toks) >= 10 AND length(text) >= 50
                AND len(list_intersect(toks, {stop_list})) * 1.0 / len(toks) < 0.5) AS passes_filter
        FROM t ORDER BY doc_id
    """

    en = "['the','a','of','and','to']"
    es = "['el','la','de','que','los']"
    zh = "['de','shi','le','zai','he']"
    q["text_lang_id"] = f"""
        WITH t AS (
          SELECT doc_id, lang, list_distinct({_TOKS}) AS toks FROM documents
        ), s AS (
          SELECT doc_id, lang,
                 len(list_intersect(toks, {en})) AS score_en,
                 len(list_intersect(toks, {es})) AS score_es,
                 len(list_intersect(toks, {zh})) AS score_zh
          FROM t
        )
        SELECT doc_id, lang, score_en, score_es, score_zh,
               CASE WHEN greatest(score_en, score_es, score_zh) <= 0 THEN 'und'
                    WHEN score_en = greatest(score_en, score_es, score_zh) THEN 'en'
                    WHEN score_es = greatest(score_en, score_es, score_zh) THEN 'es'
                    ELSE 'zh' END AS guessed
        FROM s ORDER BY doc_id
    """

    q["text_fingerprint"] = r"""
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                                     '\s+', ' ', 'g')) AS norm
          FROM documents
        ), t AS (
          SELECT doc_id, norm, regexp_split_to_array(norm, ' ') AS toks FROM n
        )
        SELECT doc_id,
               md5(norm) AS fingerprint,
               list_min([md5(array_to_string(toks[x+1:x+3], ' '))
                         FOR x IN range(0, greatest(len(toks)-3, 0) + 1)]) AS min_shingle_hash
        FROM t ORDER BY doc_id
    """

    q["text_chunking"] = r"""
        WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
                   FROM documents),
        starts AS (
          SELECT doc_id, t,
                 greatest(CAST(ceil((len(t) - 64) / 48.0) AS INT), 0) * 48 AS last_start
          FROM t
        ), ch AS (
          SELECT doc_id,
                 array_to_string(t[s.x + 1 : s.x + 64], ' ') AS chunk_text,
                 least(len(t) - s.x, 64) AS n_chunk_tokens
          FROM starts, LATERAL (SELECT unnest(range(0, last_start + 1, 48)) AS x) s
        )
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(n_chunk_tokens) AS BIGINT) AS total_chunk_tokens,
               min(md5(chunk_text)) AS min_chunk_digest
        FROM ch GROUP BY doc_id ORDER BY doc_id
    """

    q["corpus_stratified"] = """
        WITH ranked AS (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                             doc_id) AS rk,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM documents
        )
        SELECT lang, count(*) AS n_sampled,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS membership_digest
        FROM ranked
        WHERE rk <= ceil(n * 0.2)
        GROUP BY lang ORDER BY lang
    """

    q["corpus_temperature"] = """
        WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        t AS (SELECT CAST(sum(CAST(sqrt(n) AS DECIMAL(28,12))) AS DOUBLE) AS z,
                     CAST(sum(n) AS BIGINT) AS total
              FROM c),
        k AS (SELECT lang, n,
                     least(n, CAST(ceil(CAST(total AS DOUBLE) * 0.3 *
                           (CAST(CAST(sqrt(n) AS DECIMAL(28,12)) AS DOUBLE) / z))
                         AS BIGINT)) AS keep
              FROM c, t),
        ranked AS (SELECT lang, doc_id,
                          row_number() OVER (PARTITION BY lang
                                             ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                                      doc_id) AS rk
                   FROM documents)
        SELECT r.lang,
               CAST(max(k.n) AS BIGINT) AS n_total,
               count(*) AS n_sampled,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS membership_digest
        FROM ranked r JOIN k ON r.lang = k.lang
        WHERE r.rk <= k.keep
        GROUP BY r.lang ORDER BY r.lang
    """

    q["corpus_splits"] = """
        WITH h AS (
          SELECT doc_id, n_chars,
                 md5('split' || CAST(doc_id AS VARCHAR)) AS hh
          FROM documents
        ), dig AS (
          SELECT doc_id, n_chars,
                 (ascii(substr(hh,1,1)) - CASE WHEN ascii(substr(hh,1,1)) >= 97 THEN 87 ELSE 48 END) * 4096
               + (ascii(substr(hh,2,1)) - CASE WHEN ascii(substr(hh,2,1)) >= 97 THEN 87 ELSE 48 END) * 256
               + (ascii(substr(hh,3,1)) - CASE WHEN ascii(substr(hh,3,1)) >= 97 THEN 87 ELSE 48 END) * 16
               + (ascii(substr(hh,4,1)) - CASE WHEN ascii(substr(hh,4,1)) >= 97 THEN 87 ELSE 48 END) AS v
          FROM h
        ), s AS (
          SELECT doc_id, n_chars,
                 CASE WHEN v % 10000 < 1000 THEN 'val'
                      WHEN v % 10000 < 2000 THEN 'test'
                      ELSE 'train' END AS split
          FROM dig
        )
        SELECT split, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(doc_id) AS min_doc_id,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS membership_digest
        FROM s GROUP BY split ORDER BY split
    """

    # — corpus mixing / shuffle (operators/sampling.py) —
    # budgets replicate mix_summary: floor(w * 0.5 * total_chars),
    # same left-assoc double arithmetic
    q["corpus_mix"] = """
        WITH w(lang, weight) AS (
          VALUES ('de', 0.15), ('en', 0.4), ('es', 0.15),
                 ('fr', 0.1), ('zh', 0.2)
        ),
        tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents),
        b AS (
          SELECT lang,
                 CAST(floor(weight * 0.5 * CAST(total AS DOUBLE)) AS BIGINT)
                   AS budget
          FROM w, tot
        ),
        r AS (
          SELECT d.lang, d.doc_id, d.n_chars, b.budget,
                 sum(d.n_chars) OVER (
                   PARTITION BY d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM documents d JOIN b USING (lang)
        )
        SELECT lang, count(*) AS n_kept,
               CAST(sum(n_chars) AS BIGINT) AS chars_kept,
               max(budget) AS budget,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS membership_digest
        FROM r WHERE cum - n_chars < budget
        GROUP BY lang ORDER BY lang
    """

    q["corpus_shuffle"] = """
        WITH h AS (
          SELECT doc_id, lang,
                 md5('epoch0' || CAST(doc_id AS VARCHAR)) AS hh
          FROM documents
        ),
        r AS (
          SELECT doc_id, lang,
                 row_number() OVER (ORDER BY hh, doc_id) AS rank
          FROM h
        )
        SELECT rank, doc_id, lang FROM r WHERE rank <= 20 ORDER BY rank
    """

    # — benchmark decontamination (operators/spans.py, k = 8) —
    q["corpus_decontaminate"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sp AS (
          SELECT doc_id,
                 unnest([md5(array_to_string(t[x+1:x+8], ' '))
                         FOR x IN range(0, greatest(len(t)-8, 0) + 1)]) AS span_h
          FROM t
        ),
        bspans AS (
          SELECT DISTINCT span_h FROM sp WHERE doc_id % 10 = 0
        ),
        hits AS (
          SELECT DISTINCT s.doc_id, s.span_h
          FROM sp s JOIN bspans b USING (span_h)
          WHERE s.doc_id % 10 != 0
        )
        SELECT doc_id, count(*) AS n_shared_spans
        FROM hits GROUP BY doc_id
        HAVING count(*) >= 1
        ORDER BY doc_id
    """

    # The bloom variant is a PREFILTER + exact verify — its output is
    # identical to the exact operator by construction, so the oracle
    # is literally the same exact-overlap SQL.
    q["corpus_decontaminate_bloom"] = q["corpus_decontaminate"]

    # — span-level dup detection (operators/spans.py, k = 8) —
    q["dedup_spans"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sp AS (
          SELECT doc_id,
                 unnest([md5(array_to_string(t[x+1:x+8], ' '))
                         FOR x IN range(0, greatest(len(t)-8, 0) + 1)]) AS span_h
          FROM t
        ),
        shared AS (
          SELECT span_h FROM sp GROUP BY span_h
          HAVING count(DISTINCT doc_id) >= 2
        )
        SELECT sp.doc_id, count(*) AS n_spans,
               CAST(sum(CASE WHEN sh.span_h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared_spans,
               round(sum(CASE WHEN sh.span_h IS NOT NULL THEN 1 ELSE 0 END)
                     * 1.0 / count(*), 6) AS dup_frac
        FROM sp LEFT JOIN shared sh USING (span_h)
        GROUP BY sp.doc_id ORDER BY doc_id
    """

    # — int8 embedding quantization (operators/embedding_ops.py) —
    q["embedding_quantize"] = """
        WITH v AS (
          SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
          FROM v
        ),
        c AS (
          SELECT vec_id, v, scale,
                 list_transform(v, x ->
                   CAST(coalesce(floor(x / nullif(scale, 0.0) + 0.5), 0)
                        AS INTEGER)) AS codes
          FROM s
        )
        SELECT vec_id,
               len(v) AS n_dims,
               round(scale, 6) AS scale_r6,
               md5(array_to_string(codes, ',')) AS code_digest,
               CAST(list_sum(codes) AS BIGINT) AS sum_codes,
               round(list_max([abs(v[i] - codes[i] * scale)
                               FOR i IN range(1, len(v) + 1)]), 6)
                 AS max_abs_err_r6
        FROM c ORDER BY vec_id
    """

    # — corpus profiling (operators/profile.py) —
    q["corpus_profile"] = """
        SELECT source,
               count(*) AS n_rows,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct_keys,
               CAST(sum(n_chars) AS BIGINT) AS total_size,
               CAST(min(n_chars) AS BIGINT) AS min_size,
               CAST(max(n_chars) AS BIGINT) AS max_size,
               round(avg(n_chars), 6) AS avg_size_r6,
               round(quantile_cont(n_chars, 0.25), 6) AS p25_r6,
               round(quantile_cont(n_chars, 0.5), 6) AS p50_r6,
               round(quantile_cont(n_chars, 0.75), 6) AS p75_r6
        FROM documents GROUP BY source ORDER BY source
    """

    # replicate quantile_bins: edges at i/5 exact continuous quantiles,
    # bin = 1 + Σ(score > edge_i)
    q["corpus_curriculum"] = """
        WITH e AS (
          SELECT quantile_cont(n_chars, 0.2) AS e1,
                 quantile_cont(n_chars, 0.4) AS e2,
                 quantile_cont(n_chars, 0.6) AS e3,
                 quantile_cont(n_chars, 0.8) AS e4
          FROM documents
        ),
        b AS (
          SELECT d.doc_id, d.n_chars,
                 1 + (CASE WHEN d.n_chars > e.e1 THEN 1 ELSE 0 END)
                   + (CASE WHEN d.n_chars > e.e2 THEN 1 ELSE 0 END)
                   + (CASE WHEN d.n_chars > e.e3 THEN 1 ELSE 0 END)
                   + (CASE WHEN d.n_chars > e.e4 THEN 1 ELSE 0 END) AS bin
          FROM documents d, e
        )
        SELECT bin, count(*) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               md5(array_to_string(list_sort(list(doc_id)), ',')) AS membership_digest
        FROM b GROUP BY bin ORDER BY bin
    """

    q["text_vocab"] = f"""
        WITH tok AS (
          SELECT doc_id, unnest({_TOKS}) AS token FROM documents
        )
        SELECT token, count(*) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM tok GROUP BY token
        ORDER BY n_occurrences DESC, token ASC LIMIT 50
    """

    # — dedup —
    q["dedup_exact"] = """
        WITH g AS (
          SELECT md5(text) AS digest, count(*) AS n_copies, min(doc_id) AS keep_id
          FROM documents GROUP BY md5(text)
        )
        SELECT count(*) AS n_unique,
               CAST(sum(n_copies) AS BIGINT) AS n_docs,
               CAST(sum(n_copies - 1) AS BIGINT) AS n_duplicates_removed,
               CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_groups
        FROM g
    """

    shingle_cte = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        docs AS (SELECT doc_id, {_SHINGLES} AS sh FROM t),
        sh AS (SELECT doc_id, unnest(sh) AS shingle FROM docs)
    """

    q["dedup_ngram_jaccard"] = f"""
        {shingle_cte},
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), sizes AS (SELECT doc_id, len(sh) AS n FROM docs)
        SELECT id_a, id_b,
               round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.doc_id
        JOIN sizes sb ON id_b = sb.doc_id
        WHERE n_shared * 1.0 / (sa.n + sb.n - n_shared) >= 0.6
        ORDER BY id_a, id_b
    """

    # contrastive triplets: the ngram pair CTE + the hash-ring negative
    # (same md5 16-bit fold as corpus_splits, salt 'neg', mod n_docs)
    _ring = """
        (  (ascii(substr(nh,1,1)) - CASE WHEN ascii(substr(nh,1,1)) >= 97 THEN 87 ELSE 48 END) * 4096
         + (ascii(substr(nh,2,1)) - CASE WHEN ascii(substr(nh,2,1)) >= 97 THEN 87 ELSE 48 END) * 256
         + (ascii(substr(nh,3,1)) - CASE WHEN ascii(substr(nh,3,1)) >= 97 THEN 87 ELSE 48 END) * 16
         + (ascii(substr(nh,4,1)) - CASE WHEN ascii(substr(nh,4,1)) >= 97 THEN 87 ELSE 48 END)
        ) % 10000"""
    q["corpus_triplets"] = f"""
        {shingle_cte},
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
        pairs AS (
          SELECT id_a, id_b,
                 round(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
          FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE n_shared * 1.0 / (sa.n + sb.n - n_shared) >= 0.6
        ),
        nn AS (SELECT count(*) AS n FROM documents),
        hb AS (
          SELECT id_a, id_b, jaccard, n,
                 ({_ring}) % n AS base
          FROM (SELECT p.*, nn.n,
                       md5('neg' || CAST(id_a AS VARCHAR)) AS nh
                FROM pairs p, nn) t
        )
        SELECT id_a AS anchor_id, id_b AS positive_id,
               CAST(CASE
                 WHEN base != id_a AND base != id_b THEN base
                 WHEN ((base+1) % n) != id_a AND ((base+1) % n) != id_b
                   THEN (base+1) % n
                 ELSE (base+2) % n
               END AS BIGINT) AS negative_id,
               jaccard
        FROM hb ORDER BY anchor_id, positive_id
    """

    # 8 minhashes = four 8-hex-char slices of each of two md5s
    # (mirrors dedup.minhash_signatures)
    mh_cols = ", ".join(
        f"list_min(list_transform(sh, s -> "
        f"substr(md5('{i // 4}|' || s), {1 + 8 * (i % 4)}, 8))) AS mh{i}"
        for i in range(8)
    )
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, {bi} AS band, md5(mh{2*bi} || '|' || mh{2*bi+1}) AS bhash FROM sigs"
        for bi in range(4)
    )
    q["dedup_minhash_lsh"] = f"""
        {shingle_cte},
        sigs AS (SELECT doc_id, {mh_cols} FROM docs),
        bands AS ({band_union}),
        cand AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
        )
        SELECT id_a, id_b,
               round(len(list_intersect(da.sh, db.sh)) * 1.0
                     / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))), 6) AS jaccard
        FROM cand
        JOIN docs da ON id_a = da.doc_id
        JOIN docs db ON id_b = db.doc_id
        WHERE len(list_intersect(da.sh, db.sh)) * 1.0
              / (len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh))) >= 0.7
        ORDER BY id_a, id_b
    """

    sim_bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(toks, tok -> "
        f"CASE WHEN ascii(substr(md5(tok), {b + 1}, 1)) >= 56 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(32)
    )
    q["dedup_simhash"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sigs AS (SELECT doc_id, CAST({sim_bits} AS BIGINT) AS simhash FROM t)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
        ORDER BY id_a, id_b
    """

    # end-to-end dedup_corpus: the minhash removal set is the
    # transitive closure (recursive reachability, min-id label) over
    # the SAME banded+verified pair SQL dedup_minhash_lsh hash-checks;
    # membership digests (sum + bit_xor of kept ids) are order-free.
    jac = (
        "len(list_intersect(da.sh, db.sh)) * 1.0 / "
        "(len(da.sh) + len(db.sh) - len(list_intersect(da.sh, db.sh)))"
    )
    q["corpus_dedup"] = f"""
        {shingle_cte.replace("WITH ", "WITH RECURSIVE ", 1)},
        sigs AS (SELECT doc_id, {mh_cols} FROM docs),
        bands AS ({band_union}),
        cand AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
        ),
        ver AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON id_a = da.doc_id
          JOIN docs db ON id_b = db.doc_id
          WHERE {jac} >= 0.7
        ),
        adj AS (SELECT id_a AS u, id_b AS v FROM ver
                UNION ALL SELECT id_b, id_a FROM ver),
        reach(node, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM adj)
          UNION
          SELECT a.u, reach.r FROM adj a JOIN reach ON a.v = reach.node
        ),
        removed_mh AS (
          SELECT node AS doc_id FROM reach GROUP BY node
          HAVING min(r) <> node
        ),
        kept_mh AS (
          SELECT doc_id FROM documents
          WHERE doc_id NOT IN (SELECT doc_id FROM removed_mh)
        ),
        kept_ex AS (
          SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
        ),
        tot AS (SELECT count(*) AS n_docs FROM documents)
        SELECT 'exact' AS strategy, n_docs,
               count(*) AS n_kept,
               n_docs - count(*) AS n_removed,
               CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
               CAST(bit_xor(doc_id) AS BIGINT) AS kept_id_xor
        FROM kept_ex, tot GROUP BY n_docs
        UNION ALL
        SELECT 'minhash' AS strategy, n_docs,
               count(*) AS n_kept,
               n_docs - count(*) AS n_removed,
               CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
               CAST(bit_xor(doc_id) AS BIGINT) AS kept_id_xor
        FROM kept_mh, tot GROUP BY n_docs
        ORDER BY strategy
    """

    # near_dup_clusters audit: same recursive closure as corpus_dedup,
    # but exposing the FULL (doc -> cluster) mapping (singletons label
    # themselves) reduced to a cluster-size histogram + digest.
    q["corpus_dup_clusters"] = f"""
        {shingle_cte.replace("WITH ", "WITH RECURSIVE ", 1)},
        sigs AS (SELECT doc_id, {mh_cols} FROM docs),
        bands AS ({band_union}),
        cand AS (
          SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
        ),
        ver AS (
          SELECT id_a, id_b FROM cand
          JOIN docs da ON id_a = da.doc_id
          JOIN docs db ON id_b = db.doc_id
          WHERE {jac} >= 0.7
        ),
        adj AS (SELECT id_a AS u, id_b AS v FROM ver
                UNION ALL SELECT id_b, id_a FROM ver),
        reach(node, r) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM adj)
          UNION
          SELECT a.u, reach.r FROM adj a JOIN reach ON a.v = reach.node
        ),
        lab AS (SELECT node AS doc_id, min(r) AS cluster_id
                FROM reach GROUP BY node),
        all_lab AS (
          SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN lab l ON d.doc_id = l.doc_id
        ),
        sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                  FROM all_lab GROUP BY cluster_id)
        SELECT cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(cluster_id) AS BIGINT) AS cluster_id_sum
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """

    # cross-split contamination: the engine's deterministic hash split
    # (same md5-hex-digit arithmetic as corpus_splits) + the SAME
    # exact-ngram pair SQL dedup_ngram_jaccard hash-checks, keeping
    # only pairs that straddle split boundaries.
    hexd = (
        "(ascii(substr(hh,{p},1)) - CASE WHEN ascii(substr(hh,{p},1)) >= 97 "
        "THEN 87 ELSE 48 END)"
    )
    split_val = " + ".join(
        f"{hexd.format(p=i + 1)} * {16 ** (3 - i)}" for i in range(4)
    )
    q["split_contamination"] = f"""
        {shingle_cte},
        inter AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
        pairs AS (
          SELECT id_a, id_b FROM inter
          JOIN sizes sa ON id_a = sa.doc_id
          JOIN sizes sb ON id_b = sb.doc_id
          WHERE n_shared * 1.0 / (sa.n + sb.n - n_shared) >= 0.6
        ),
        h AS (SELECT doc_id, md5('split' || CAST(doc_id AS VARCHAR)) AS hh
              FROM documents),
        dig AS (SELECT doc_id, {split_val} AS v FROM h),
        s AS (SELECT doc_id,
                     CASE WHEN v % 10000 < 1000 THEN 'val'
                          WHEN v % 10000 < 2000 THEN 'test'
                          ELSE 'train' END AS split
              FROM dig)
        SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b
        FROM pairs
        JOIN s sa ON id_a = sa.doc_id
        JOIN s sb ON id_b = sb.doc_id
        WHERE sa.split <> sb.split
        ORDER BY id_a, id_b
    """

    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    q["dedup_embedding"] = f"""
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({cos}, 6) AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE {cos} >= 0.45
        ORDER BY id_a, id_b
    """

    qcos = (
        "list_dot_product(e.v, q.qv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv)))"
    )
    q["sim_topk_bruteforce"] = f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
        SELECT vec_id, label, round({qcos}, 6) AS cos_sim
        FROM e, q WHERE vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """

    bucket_expr = " + ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
    )
    q["sim_ann_lsh"] = f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, label, v, {bucket_expr} AS bucket FROM e),
        q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
        SELECT vec_id, label, bucket,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
        FROM b e, q
        WHERE e.bucket = q.qbucket AND e.vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """

    from dump_es_parquet_spark.operators.similarity import _hyperplanes

    def _plane_sql(w: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in w) + "]::DOUBLE[]"

    hp_buckets = " + ".join(
        f"(CASE WHEN list_dot_product(v, {_plane_sql(w)}) >= 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j, w in enumerate(_hyperplanes())
    )
    q["sim_ann_hyperplane"] = f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        b AS (SELECT vec_id, label, v,
                     {hp_buckets} AS bucket
              FROM e),
        q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
        SELECT vec_id, label, bucket,
               round(list_dot_product(e.v, q.qv)
                     / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
        FROM b e, q
        WHERE bit_count(xor(CAST(e.bucket AS BIGINT), CAST(q.qbucket AS BIGINT))) <= 1
          AND e.vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """

    q["sim_ann_ivf"] = """
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        hs AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM e),
        seeds AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid, v AS cv
                  FROM hs ORDER BY h LIMIT 8),
        a1 AS (SELECT vec_id, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.v, s.cid,
                            -2 * list_dot_product(e.v, s.cv)
                              + list_dot_product(s.cv, s.cv) AS dist
                     FROM e CROSS JOIN seeds s) t1),
        asg1 AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
        comp AS (SELECT cid, u.dim - 1 AS dim, u.x
                 FROM asg1,
                      LATERAL (SELECT unnest(v) AS x,
                                      generate_subscripts(v, 1) AS dim) u),
        means AS (SELECT cid, dim,
                         CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS m
                  FROM comp GROUP BY cid, dim),
        cents AS (SELECT cid, list(m ORDER BY dim) AS cv FROM means GROUP BY cid),
        a2 AS (SELECT vec_id, label, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.label, e.v, c.cid,
                            -2 * list_dot_product(e.v, c.cv)
                              + list_dot_product(c.cv, c.cv) AS dist
                     FROM e CROSS JOIN cents c) t2),
        asg2 AS (SELECT vec_id, label, v, cid FROM a2 WHERE rn = 1),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        probes AS (SELECT c.cid FROM cents c, q
                   ORDER BY -2 * list_dot_product(q.qv, c.cv)
                              + list_dot_product(c.cv, c.cv), c.cid
                   LIMIT 2)
        SELECT a.vec_id, a.label, a.cid AS cell,
               round(list_dot_product(a.v, q.qv)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cos_sim
        FROM asg2 a JOIN probes p ON a.cid = p.cid, q
        WHERE a.vec_id != 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """

    # Recall@10 of the IVF path vs exact brute force for query vectors
    # 0..9: the full Lloyd pipeline (same CTEs as sim_ann_ivf) batched
    # over all queries, per-query ANN top-10 from the probed cells,
    # exact top-10 over the corpus, hit counts joined — every ranking
    # deterministic (rounded cosine, vec_id tiebreak), so recall is an
    # exact integer on both engines.
    _COS = (
        "round(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    q["sim_ivf_recall"] = f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        hs AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM e),
        seeds AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid, v AS cv
                  FROM hs ORDER BY h LIMIT 8),
        a1 AS (SELECT vec_id, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.v, s.cid,
                            -2 * list_dot_product(e.v, s.cv)
                              + list_dot_product(s.cv, s.cv) AS dist
                     FROM e CROSS JOIN seeds s) t1),
        asg1 AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
        comp AS (SELECT cid, u.dim - 1 AS dim, u.x
                 FROM asg1,
                      LATERAL (SELECT unnest(v) AS x,
                                      generate_subscripts(v, 1) AS dim) u),
        means AS (SELECT cid, dim,
                         CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS m
                  FROM comp GROUP BY cid, dim),
        cents AS (SELECT cid, list(m ORDER BY dim) AS cv FROM means GROUP BY cid),
        a2 AS (SELECT vec_id, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.v, c.cid,
                            -2 * list_dot_product(e.v, c.cv)
                              + list_dot_product(c.cv, c.cv) AS dist
                     FROM e CROSS JOIN cents c) t2),
        asg2 AS (SELECT vec_id, v, cid FROM a2 WHERE rn = 1),
        qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
        probes AS (SELECT query_id, qv, cid FROM (
                     SELECT q.query_id, q.qv, c.cid,
                            row_number() OVER (PARTITION BY q.query_id
                              ORDER BY -2 * list_dot_product(q.qv, c.cv)
                                         + list_dot_product(c.cv, c.cv), c.cid
                            ) AS rn
                     FROM qs q CROSS JOIN cents c) t WHERE rn <= 2),
        ann AS (SELECT query_id, vec_id FROM (
                  SELECT p.query_id, a.vec_id,
                         row_number() OVER (PARTITION BY p.query_id
                           ORDER BY {_COS.format(a="a.v", b="p.qv")} DESC,
                                    a.vec_id ASC) AS rank
                  FROM asg2 a JOIN probes p ON a.cid = p.cid
                  WHERE a.vec_id != p.query_id) t WHERE rank <= 10),
        ex AS (SELECT query_id, vec_id FROM (
                 SELECT q.query_id, e.vec_id,
                        row_number() OVER (PARTITION BY q.query_id
                          ORDER BY {_COS.format(a="e.v", b="q.qv")} DESC,
                                   e.vec_id ASC) AS rank
                 FROM e CROSS JOIN qs q
                 WHERE e.vec_id != q.query_id) t WHERE rank <= 10)
        SELECT x.query_id AS query_id, CAST(count(*) AS BIGINT) AS k_eff,
               CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM ex x LEFT JOIN ann a
          ON x.query_id = a.query_id AND x.vec_id = a.vec_id
        GROUP BY x.query_id ORDER BY x.query_id
    """

    # es_knn_search_ivf: the ES 8 knn request with num_candidates —
    # the IVF serving path recall-checked against the exact answer of
    # the SAME request (one row: k_eff, n_hits). Same Lloyd CTE chain
    # as sim_ivf_recall; the probe set is the smallest nearest-
    # centroid prefix whose cells cover >= 400 vectors (cum_before
    # < 400), exactly similarity.ivf_candidate_lists' rule.
    q["es_knn_search_ivf"] = f"""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        hs AS (SELECT vec_id, v, md5(CAST(vec_id AS VARCHAR)) AS h FROM e),
        seeds AS (SELECT row_number() OVER (ORDER BY h) - 1 AS cid, v AS cv
                  FROM hs ORDER BY h LIMIT 8),
        a1 AS (SELECT vec_id, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.v, s.cid,
                            -2 * list_dot_product(e.v, s.cv)
                              + list_dot_product(s.cv, s.cv) AS dist
                     FROM e CROSS JOIN seeds s) t1),
        asg1 AS (SELECT vec_id, v, cid FROM a1 WHERE rn = 1),
        comp AS (SELECT cid, u.dim - 1 AS dim, u.x
                 FROM asg1,
                      LATERAL (SELECT unnest(v) AS x,
                                      generate_subscripts(v, 1) AS dim) u),
        means AS (SELECT cid, dim,
                         CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) / count(*) AS m
                  FROM comp GROUP BY cid, dim),
        cents AS (SELECT cid, list(m ORDER BY dim) AS cv FROM means GROUP BY cid),
        a2 AS (SELECT vec_id, v, cid,
                      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM (SELECT e.vec_id, e.v, c.cid,
                            -2 * list_dot_product(e.v, c.cv)
                              + list_dot_product(c.cv, c.cv) AS dist
                     FROM e CROSS JOIN cents c) t2),
        asg2 AS (SELECT vec_id, v, cid FROM a2 WHERE rn = 1),
        qs AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        cellsz AS (SELECT cid, count(*) AS n FROM asg2 GROUP BY cid),
        cord AS (SELECT c.cid,
                        row_number() OVER (
                          ORDER BY -2 * list_dot_product(q.qv, c.cv)
                                     + list_dot_product(c.cv, c.cv), c.cid
                        ) AS rn
                 FROM cents c CROSS JOIN qs q),
        cum AS (SELECT o.cid,
                       coalesce(sum(z.n) OVER (
                         ORDER BY o.rn
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS cum_before
                FROM cord o LEFT JOIN cellsz z ON o.cid = z.cid),
        probes AS (SELECT cid FROM cum WHERE cum_before < 400),
        ann AS (SELECT vec_id FROM (
                  SELECT a.vec_id,
                         row_number() OVER (
                           ORDER BY {_COS.format(a="a.v", b="q.qv")} DESC,
                                    a.vec_id ASC) AS rank
                  FROM asg2 a JOIN probes p ON a.cid = p.cid
                       CROSS JOIN qs q
                  WHERE a.vec_id != 0) t WHERE rank <= 10),
        ex AS (SELECT vec_id FROM (
                 SELECT e.vec_id,
                        row_number() OVER (
                          ORDER BY {_COS.format(a="e.v", b="q.qv")} DESC,
                                   e.vec_id ASC) AS rank
                 FROM e CROSS JOIN qs q
                 WHERE e.vec_id != 0) t WHERE rank <= 10)
        SELECT CAST(count(*) AS BIGINT) AS k_eff,
               CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hits
        FROM ex x LEFT JOIN ann a ON x.vec_id = a.vec_id
    """

    # the serving path answers the exact same question from the
    # materialized index — one oracle, two physical plans
    q["sim_ann_ivf_indexed"] = q["sim_ann_ivf"]
    # the SQ8 serving path rescores to the exact flat answer — one
    # oracle, three physical plans
    q["sim_ann_ivf_sq8"] = q["sim_ann_ivf"]
    # ... and the PQ serving path too (ADC approximate pass + exact
    # rescore sized to recover the flat answer) — one oracle, FOUR
    # physical plans over the same materialized index
    q["sim_ann_ivf_pq"] = q["sim_ann_ivf"]

    q["corpus_packing"] = r"""
        WITH toks AS (
          SELECT doc_id,
                 len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
          FROM documents
        ),
        off AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) AS tok_end
          FROM toks
        ),
        packed AS (
          SELECT s.seq_id, doc_id,
                 greatest(tok_end - n_tokens - s.seq_id * 512, 0) AS fill_start,
                 least(tok_end - s.seq_id * 512, 512) AS fill_end
          FROM off,
               LATERAL (SELECT unnest(range(
                   CAST((tok_end - n_tokens) // 512 AS BIGINT),
                   CAST((tok_end - 1) // 512 + 1 AS BIGINT))) AS seq_id) s
          WHERE n_tokens > 0
        )
        SELECT seq_id, count(*) AS n_docs,
               CAST(sum(fill_end - fill_start) AS BIGINT) AS n_filled
        FROM packed GROUP BY seq_id ORDER BY seq_id
    """

    # sequential redaction chain, generated from the SAME pattern table
    # the engine applies (order is load-bearing — see text.PII_PATTERNS)
    from dump_es_parquet_spark.operators.text import PII_PATTERNS

    stage = "text"
    count_exprs = []
    for pname, pat, token in PII_PATTERNS:
        lit = pat.replace("'", "''")
        count_exprs.append(
            f"len(regexp_extract_all({stage}, '{lit}')) AS n_{pname}"
        )
        stage = f"regexp_replace({stage}, '{lit}', '{token}', 'g')"
    q["text_redact"] = f"""
        SELECT doc_id,
               {', '.join(count_exprs)},
               {stage} AS redacted
        FROM documents ORDER BY doc_id
    """

    # the tag-once attributes table: every signal the dedicated text_*
    # oracles hash-check, composed into one per-doc row — generated
    # from the SAME constants (stopword list, language markers, PII
    # pattern table) the engine applies
    from dump_es_parquet_spark.operators.text import (
        BPE_ISH,
        LANG_MARKERS,
        STOPWORDS,
    )

    _stop_list = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"
    _langs = sorted(LANG_MARKERS)
    _score = {
        lang: (
            "len(list_intersect(dtoks, ["
            + ",".join(f"'{w}'" for w in LANG_MARKERS[lang])
            + "]))"
        )
        for lang in _langs
    }
    _best = "greatest(" + ", ".join(_score[lang] for lang in _langs) + ")"
    _lang_case = (
        f"CASE WHEN {_best} <= 0 THEN 'und' "
        + " ".join(
            f"WHEN {_score[lang]} = {_best} THEN '{lang}'" for lang in _langs[:-1]
        )
        + f" ELSE '{_langs[-1]}' END"
    )
    _bpe = BPE_ISH.replace("'", "''")
    q["corpus_attributes"] = f"""
        WITH t AS (SELECT doc_id, text, {_TOKS} AS toks,
                          list_distinct({_TOKS}) AS dtoks
                   FROM documents),
        base AS (
          SELECT doc_id,
                 length(text) AS n_chars,
                 len(toks) AS n_tokens,
                 len(list_distinct(toks)) AS n_distinct_tokens,
                 len(regexp_extract_all(text, '{_bpe}')) AS n_bpe_tokens,
                 len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
                 round(len(list_intersect(toks, {_stop_list})) * 1.0
                       / len(toks), 6) AS stopword_ratio,
                 round((length(text) - len(toks) + 1) * 1.0 / len(toks), 6)
                       AS avg_word_len,
                 {_lang_case} AS lang_guess,
                 {', '.join(count_exprs)}
          FROM t
        ),
        rw AS (SELECT doc_id, unnest(toks) AS w FROM t),
        rwc AS (SELECT doc_id, w, count(*) AS c FROM rw GROUP BY 1, 2),
        rws AS (SELECT doc_id, sum(c) AS n_words, max(c) AS top_w,
                       sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_w
                FROM rwc GROUP BY 1),
        rb AS (SELECT doc_id,
                      unnest([toks[x] || ' ' || toks[x+1]
                              FOR x IN range(1, len(toks))]) AS b
               FROM t WHERE len(toks) >= 2),
        rbc AS (SELECT doc_id, b, count(*) AS c FROM rb GROUP BY 1, 2),
        rbs AS (SELECT doc_id, max(c) AS top_b FROM rbc GROUP BY 1),
        rep AS (SELECT rws.doc_id,
                       round(top_w * 1.0 / n_words, 6) AS top_word_frac,
                       round(dup_w * 1.0 / n_words, 6) AS dup_word_frac,
                       round(top_b * 1.0 / (n_words - 1), 6) AS top_bigram_frac
                FROM rws LEFT JOIN rbs ON rws.doc_id = rbs.doc_id)
        SELECT base.*, top_word_frac, dup_word_frac, top_bigram_frac
        FROM base LEFT JOIN rep ON base.doc_id = rep.doc_id
        ORDER BY base.doc_id
    """

    # binary-payload near-dup: payload = encode(text, utf-8), so
    # md5(payload) == DuckDB's md5(text) (VARCHAR md5 hashes the utf-8
    # bytes); the 32-bit stub signature is the top 8 hex digits decoded
    # mm_binary_near_dup: the Spark side hashes payloads with a REAL
    # pure-numpy dHash (operators/multimodal.py) — lossy and not
    # SQL-expressible — so the oracle checks the PLANTED duplicate
    # relation exhaustively: every 50th doc is cloned under id+1e6,
    # identical payloads must hash identically (hamming 0) and the
    # banded discovery join must recover every such pair
    # (recovered 1, deterministic by pigeonhole at hamming 0).
    q["mm_binary_near_dup"] = """
        SELECT doc_id AS id_a,
               doc_id + 1000000 AS id_b,
               0 AS hamming,
               1 AS recovered
        FROM documents WHERE doc_id % 50 = 0
        ORDER BY id_a
    """

    # mm_binary_clusters: planted-clone audit of binary_dup_clusters —
    # identical payloads must co-cluster (same_cluster 1) under a
    # canonical min label (cluster_id ≤ the smaller member, so
    # canonical_min 1); organic dHash collisions can only lower the
    # min, never split the planted pair, so both bits are deterministic
    q["mm_binary_clusters"] = """
        SELECT doc_id AS id_a,
               doc_id + 1000000 AS id_b,
               1 AS same_cluster,
               1 AS canonical_min
        FROM documents WHERE doc_id % 50 = 0
        ORDER BY id_a
    """

    q["grouped_robust_stats"] = """
        WITH m AS (
          SELECT event_type, count(*) AS n_events,
                 quantile_cont(value, 0.5) AS med,
                 quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
          FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               any_value(m.n_events) AS n_events,
               round(any_value(m.med), 6) AS median_value,
               round(any_value(m.iqr), 6) AS iqr,
               round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
        FROM events e JOIN m USING (event_type)
        GROUP BY e.event_type ORDER BY e.event_type
    """

    q["sim_topk_batch"] = """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        qs AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
        scored AS (
          SELECT query_id, vec_id,
                 round(list_dot_product(e.v, qs.qv)
                       / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(qs.qv, qs.qv))), 6) AS cos_sim
          FROM e CROSS JOIN qs WHERE e.vec_id != qs.query_id
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_sim DESC, vec_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank
        FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
    """

    q["sim_label_centroids"] = """
        WITH x AS (
          SELECT label, u.dim - 1 AS dim, u.x
          FROM embeddings,
               LATERAL (SELECT unnest(embedding) AS x,
                               generate_subscripts(embedding, 1) AS dim) u
        )
        SELECT label, dim,
               round(CAST(sum(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,9))) AS DOUBLE)
                     / count(*), 6) AS centroid_x,
               count(*) AS n_vectors
        FROM x WHERE dim < 8
        GROUP BY label, dim ORDER BY label, dim
    """

    # — multimodal —
    media = ("CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
             "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END")
    q["mm_binary_metadata"] = f"""
        SELECT doc_id,
               {media} AS media_type,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256,
               lower(substr(hex(encode(text)), 1, 16)) AS magic_hex
        FROM documents ORDER BY doc_id
    """

    q["mm_decode_stub"] = f"""
        SELECT doc_id,
               {media} AS media_type,
               octet_length(encode(text)) AS n_bytes,
               64 + octet_length(encode(text)) % 576 AS width,
               64 + octet_length(encode(text)) % 344 AS height,
               1 + octet_length(encode(text)) % 4 AS n_frames
        FROM documents ORDER BY doc_id
    """

    q["mm_frame_sample"] = """
        WITH d AS (SELECT doc_id, hex(encode(text)) AS hexp,
                          octet_length(encode(text)) AS n FROM documents),
        f AS (SELECT doc_id, hexp,
                     unnest(range(0, CAST(floor((n - 1) / 1000.0) AS INT) + 1)) AS frame_no
              FROM d)
        SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
               lower(substr(hexp, frame_no * 2000 + 1, 32)) AS frame_hex
        FROM f ORDER BY doc_id, frame_no
    """

    # keyless range join: irregular quadratic value bands [i^2, (i+1)^2).
    # DuckDB plans this range predicate natively (IEJoin); the engine
    # restores an equi-key via binning (operators/rangejoin.py).
    q["events_value_bands"] = """
        WITH bands AS (
          SELECT range AS band_id, range * range AS lo,
                 (range + 1) * (range + 1) AS hi
          FROM range(23)
        )
        SELECT band_id, lo, hi,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events JOIN bands ON value >= lo AND value < hi
        GROUP BY band_id, lo, hi
        ORDER BY band_id
    """

    # snapshot compaction: last-write-wins over two dump generations;
    # the oracle uses the window formulation the engine deliberately
    # avoids (operators/snapshot.py uses max_by partial aggregation).
    q["events_compact_latest"] = """
        WITH gen1 AS (
          SELECT event_id, ts, user_id, event_type, value, props, 1 AS gen
          FROM events
        ),
        gen2 AS (
          SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id, event_type,
                 value * 2 AS value, props, 2 AS gen
          FROM events WHERE event_id % 10 = 0
        ),
        unioned AS (SELECT * FROM gen1 UNION ALL SELECT * FROM gen2),
        latest AS (
          SELECT * FROM unioned
          QUALIFY row_number() OVER (PARTITION BY event_id ORDER BY gen DESC) = 1
        )
        SELECT event_type,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN gen = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM latest GROUP BY event_type ORDER BY event_type
    """

    # per-source cap: both engines pick the same 15 docs per source
    # because the order key md5(doc_id-as-string) hashes identical
    # strings.
    q["corpus_source_cap"] = """
        WITH capped AS (
          SELECT doc_id, source FROM documents
          QUALIFY row_number() OVER (
            PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))
          ) <= 15
        )
        SELECT source,
               count(*) AS n_kept,
               CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
               CAST(bit_xor(doc_id) AS BIGINT) AS kept_id_xor
        FROM capped GROUP BY source ORDER BY source
    """

    # z-order layout: quantize (user_id, value) to 8-bit codes from the
    # table's min/max, Morton-interleave, bucket by the top bits. The
    # per-bucket column spans being tight vs the table span IS the
    # min/max file-pruning benefit (operators/layout.py).
    interleave = " + ".join(
        f"(((cu >> {i}) & 1) << {2 * i}) + (((cv >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    q["events_zorder"] = f"""
        WITH b AS (SELECT CAST(min(user_id) AS DOUBLE) AS lou,
                          CAST(max(user_id) AS DOUBLE) AS hiu,
                          CAST(min(value) AS DOUBLE) AS lov,
                          CAST(max(value) AS DOUBLE) AS hiv
                   FROM events),
        c AS (SELECT user_id, value,
                     greatest(0, least(255, CAST(floor(
                       (CAST(user_id AS DOUBLE) - lou) * 255 / (hiu - lou)
                     ) AS BIGINT))) AS cu,
                     greatest(0, least(255, CAST(floor(
                       (CAST(value AS DOUBLE) - lov) * 255 / (hiv - lov)
                     ) AS BIGINT))) AS cv
              FROM events, b),
        z AS (SELECT user_id, value, {interleave} AS zv FROM c)
        SELECT zv >> 8 AS z_bucket,
               count(*) AS n_events,
               CAST(min(user_id) AS BIGINT) AS min_user,
               CAST(max(user_id) AS BIGINT) AS max_user,
               min(value) AS min_value,
               max(value) AS max_value
        FROM z GROUP BY z_bucket ORDER BY z_bucket
    """

    # hourly 3σ anomalies with the σ test in pure integer arithmetic
    # ((c·n − Σc)² > 9·(n·Σc² − (Σc)²)) — engine stddev algorithms
    # (Welford vs naive) disagree in float bits, exact moments don't
    q["events_anomalies"] = """
        WITH hourly AS (
          SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                 event_type, CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY hour, event_type
        ),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(cnt) AS BIGINT) AS s1,
                 CAST(sum(cnt * cnt) AS BIGINT) AS s2
          FROM hourly GROUP BY event_type
        )
        SELECT h.event_type, h.hour, h.cnt, m.n, m.s1, m.s2
        FROM hourly h JOIN m USING (event_type)
        WHERE (h.cnt * m.n - m.s1) * (h.cnt * m.n - m.s1)
              > 9 * (m.n * m.s2 - m.s1 * m.s1)
        ORDER BY h.event_type, h.hour
    """

    # k-anonymity release gate over (nation, segment) quasi-identifiers
    q["privacy_k_anonymity"] = """
        WITH combos AS (
          SELECT c_nationkey, c_mktsegment, count(*) AS n_rows
          FROM customer GROUP BY c_nationkey, c_mktsegment
        ),
        kept AS (
          SELECT c.c_custkey
          FROM customer c JOIN combos x
            ON c.c_nationkey = x.c_nationkey
           AND c.c_mktsegment = x.c_mktsegment
          WHERE x.n_rows >= 3
        ),
        totals AS (
          SELECT CAST(count(*) AS BIGINT) AS n_kept_rows,
                 CAST(sum(c_custkey) AS BIGINT) AS kept_key_sum
          FROM kept
        )
        SELECT c_nationkey, c_mktsegment, n_rows,
               n_rows < 3 AS violates_k,
               n_kept_rows, kept_key_sum
        FROM combos, totals
        ORDER BY c_nationkey, c_mktsegment
    """

    # MATCH_RECOGNIZE-lite: per-user event-type strings in (ts, id)
    # order; both engines run the same unanchored regexes over them
    q["events_sequence_patterns"] = """
        WITH seqs AS (
          SELECT user_id,
                 string_agg(substr(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS seq
          FROM events GROUP BY user_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN regexp_matches(seq, 'v.*c.*p')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_v_c_p,
               CAST(sum(CASE WHEN regexp_matches(seq, '^[^p]*e.*p')
                        THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_error_before_purchase,
               CAST(sum(CASE WHEN regexp_matches(seq, 'eee')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_error_burst
        FROM seqs
    """

    # cohort retention: ISO-Monday week truncation in both engines;
    # offsets are exact multiples of 7 days by construction
    q["events_retention"] = """
        WITH first AS (
          SELECT user_id,
                 CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
          FROM events GROUP BY user_id
        ),
        active AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
          FROM events
        )
        SELECT cohort_week,
               CAST(date_diff('day', CAST(cohort_week AS DATE),
                              CAST(active_week AS DATE)) // 7 AS BIGINT)
                 AS week_offset,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM active JOIN first USING (user_id)
        GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
    """

    # order-aware conversion funnel: step N only counts AFTER the
    # user's step N-1 time (chained conditional mins, not independent)
    q["events_funnel"] = """
        WITH t1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        t2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN t1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts >= t1.t1
          GROUP BY e.user_id
        ),
        t3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN t2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts >= t2.t2
          GROUP BY e.user_id
        ),
        f AS (
          SELECT t1.user_id, t1.t1, t2.t2, t3.t3
          FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
        )
        SELECT count(*) AS n_viewed,
               count(t2) AS n_clicked,
               count(t3) AS n_purchased,
               median(CASE WHEN t2 IS NOT NULL
                      THEN (epoch_us(t2) - epoch_us(t1)) / 1000000.0 END)
                 AS median_view_to_click_s,
               median(CASE WHEN t3 IS NOT NULL
                      THEN (epoch_us(t3) - epoch_us(t2)) / 1000000.0 END)
                 AS median_click_to_purchase_s
        FROM f
    """

    # event-time RANGE-frame rolling window (trailing 1 hour per user)
    q["events_rolling_1h"] = """
        SELECT event_id, user_id,
               count(*) OVER w AS n_1h,
               CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
        FROM events
        WINDOW w AS (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
        ORDER BY event_id
    """

    # schema-evolution union: gen1 narrowed user_id + no region, gen2
    # long user_id + region; widening = explicit casts in the oracle.
    q["events_union_evolved"] = """
        WITH gen1 AS (
          SELECT event_id, CAST(user_id AS INTEGER) AS user_id, event_type
          FROM events
        ),
        gen2 AS (
          SELECT event_id + 10000000 AS event_id, user_id, event_type,
                 'r' || CAST(user_id % 5 AS VARCHAR) AS region
          FROM events
        ),
        u AS (
          SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type,
                 CAST(NULL AS VARCHAR) AS region
          FROM gen1
          UNION ALL
          SELECT event_id, user_id, event_type, region FROM gen2
        )
        SELECT event_type,
               count(*) AS n,
               CAST(sum(user_id) AS BIGINT) AS user_sum,
               CAST(sum(CASE WHEN region IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gen1,
               CAST(count(DISTINCT region) AS BIGINT) AS n_regions
        FROM u GROUP BY event_type ORDER BY event_type
    """

    # perplexity-filter shape: rank model from the corpus's own token
    # stats, integer Zipf scores (floor(1e6/rank); float logprobs would
    # hinge the oracle on libm log bit-parity), broadcast-join apply.
    q["corpus_lm_score"] = r"""
        WITH toks AS (
          SELECT doc_id, t AS token FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(text), '\s+')) AS t
            FROM documents
          ) WHERE t <> ''
        ),
        counts AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
        model AS (
          SELECT token,
                 row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
          FROM counts ORDER BY cnt DESC, token ASC LIMIT 1000
        ),
        m2 AS (SELECT token, CAST(1000000 // rank AS BIGINT) AS score_ppm
               FROM model),
        j AS (SELECT t.doc_id, m2.score_ppm
              FROM toks t LEFT JOIN m2 USING (token))
        SELECT doc_id,
               count(*) AS n_tokens,
               CAST(sum(CASE WHEN score_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
               CAST(sum(COALESCE(score_ppm, 0)) AS BIGINT) AS score_sum_ppm,
               CAST(sum(COALESCE(score_ppm, 0)) // count(*) AS BIGINT) AS mean_score_ppm
        FROM j GROUP BY doc_id ORDER BY doc_id
    """

    # CDC diff between dump generations: deletes (every 97th), updates
    # (every 10th survivor), adds (shifted-id clones of every 101st).
    q["events_snapshot_diff"] = """
        WITH survivors AS (SELECT * FROM events WHERE event_id % 97 <> 0),
        updated AS (
          SELECT event_id,
                 CASE WHEN event_id % 10 = 0 THEN value * 2 ELSE value END AS value,
                 event_type
          FROM survivors
        ),
        added AS (
          SELECT event_id + 10000000 AS event_id, value, event_type
          FROM events WHERE event_id % 101 = 0
        ),
        newgen AS (SELECT * FROM updated UNION ALL SELECT * FROM added),
        old AS (SELECT event_id, value, event_type FROM events),
        d AS (
          SELECT COALESCE(o.event_id, n.event_id) AS event_id,
                 CASE WHEN o.event_id IS NULL THEN 'added'
                      WHEN n.event_id IS NULL THEN 'removed'
                      WHEN (o.value IS DISTINCT FROM n.value)
                        OR (o.event_type IS DISTINCT FROM n.event_type)
                        THEN 'changed'
                      ELSE 'unchanged' END AS change_status
          FROM old o FULL OUTER JOIN newgen n ON o.event_id = n.event_id
        )
        SELECT change_status, count(*) AS n,
               CAST(sum(event_id) AS BIGINT) AS key_sum
        FROM d GROUP BY change_status ORDER BY change_status
    """

    # corpus kNN graph: every vector's exact top-5 cosine neighbors.
    # DuckDB evaluates the O(n^2) self-join directly; the engine's
    # blocked-GEMM candidate pruning (operators/knn.py) must land on
    # the identical edge set and (rounded, fold-exact) sims.
    q["sim_knn_graph"] = """
        WITH e AS (SELECT vec_id,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        p AS (SELECT a.vec_id AS src, b.vec_id AS dst,
                     round(list_dot_product(a.v, b.v)
                           / (sqrt(list_dot_product(a.v, a.v))
                              * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
              FROM e a JOIN e b ON a.vec_id <> b.vec_id)
        SELECT src, dst, cos_sim FROM p
        QUALIFY row_number() OVER (
          PARTITION BY src ORDER BY cos_sim DESC, dst ASC
        ) <= 5
        ORDER BY src, cos_sim DESC, dst
    """

    # Incremental dedup vs the persisted signature store: history =
    # doc_id % 3 != 0, increment = the rest. History matches use the
    # store's contract — signature-ESTIMATED Jaccard (matching-minhash
    # fraction ≥ 0.7 ⟺ ≥ 6 of 8 for integers); intra-batch pairs are
    # exact-verified, min-id survivor — the same md5-slice signature
    # SQL dedup_minhash_lsh hash-checks.
    est_matches = " + ".join(
        f"(CASE WHEN ns.mh{i} = hs.mh{i} THEN 1 ELSE 0 END)" for i in range(8)
    )
    q["corpus_dedup_incremental"] = f"""
        {shingle_cte},
        sigs AS (SELECT doc_id, {mh_cols} FROM docs),
        bands AS ({band_union}),
        matched AS (
          SELECT nb.doc_id, min(hb.doc_id) AS hist_id
          FROM bands nb
          JOIN bands hb ON nb.band = hb.band AND nb.bhash = hb.bhash
          JOIN sigs ns ON ns.doc_id = nb.doc_id
          JOIN sigs hs ON hs.doc_id = hb.doc_id
          WHERE nb.doc_id % 3 = 0 AND hb.doc_id % 3 != 0
            AND ({est_matches}) >= 6
          GROUP BY nb.doc_id
        ),
        shadowed AS (
          SELECT DISTINCT y.doc_id
          FROM bands x JOIN bands y
            ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
          JOIN docs da ON x.doc_id = da.doc_id
          JOIN docs db ON y.doc_id = db.doc_id
          WHERE x.doc_id % 3 = 0 AND y.doc_id % 3 = 0 AND {jac} >= 0.7
        ),
        j AS (
          SELECT d.doc_id, m.hist_id,
                 (s.doc_id IS NOT NULL) AS is_shadowed,
                 (m.hist_id IS NULL AND s.doc_id IS NULL) AS keep
          FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) d
          LEFT JOIN matched m ON d.doc_id = m.doc_id
          LEFT JOIN shadowed s ON d.doc_id = s.doc_id
        )
        SELECT CAST(count(*) AS BIGINT) AS n_increment,
               CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(sum(CASE WHEN hist_id IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dropped_hist,
               CAST(sum(CASE WHEN hist_id IS NULL AND is_shadowed
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_intra,
               CAST(sum(CASE WHEN keep THEN doc_id END) AS BIGINT) AS kept_id_sum,
               CAST(bit_xor(CASE WHEN keep THEN doc_id END) AS BIGINT)
                    AS kept_id_xor,
               CAST(sum(hist_id) AS BIGINT) AS hist_match_id_sum
        FROM j
    """

    # Sketch estimates aren't SQL-portable, so the contract is
    # inverted: the Spark side computes |estimate − exact| inside one
    # plan and reduces it to within_bound ∈ {0,1}; the oracle asserts
    # the bound HOLDS (within_bound = 1) plus the portable input count.
    # A sketch drifting outside its published error envelope is a
    # driver-visible hash mismatch.
    q["sketch_error_bounds"] = """
        WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_input FROM events)
        SELECT * FROM (
          SELECT 'hll_user_distinct' AS metric, n_input, 1 AS within_bound FROM n
          UNION ALL
          SELECT 'kll_value_quantile_ranks', n_input, 1 FROM n
          UNION ALL
          SELECT 'theta_user_overlap', n_input, 1 FROM n
        ) ORDER BY metric
    """

    # sink round-trip oracles: the Spark side digests the SOURCE frame
    # and writes csv/ndjson through the real sink first (fixed path —
    # sinks.SINK_ORACLE_DIR — overwritten per run); the oracle digests
    # the WRITTEN FILES, so the two agree only if the encode is
    # lossless and another engine can read it (VERDICT r07 missing #3).
    q["sink_csv_roundtrip"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(o_orderkey AS BIGINT)) AS BIGINT) AS key_sum,
               bit_xor(CAST(o_orderkey AS BIGINT)) AS key_xor,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS price_sum,
               min(o_odate) AS min_odate,
               max(o_odate) AS max_odate,
               CAST(sum(length(qfield)) AS BIGINT) AS q_len_sum
        FROM read_csv('/tmp/spark_graft_sink_oracle/csv_orders/*.csv',
                      header=true, all_varchar=true)
    """

    q["sink_ndjson_roundtrip"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               bit_xor(doc_id) AS id_xor,
               CAST(sum(length(text)) AS BIGINT) AS text_len_sum,
               CAST(sum(length(tricky)) AS BIGINT) AS tricky_len_sum,
               CAST(sum(len(tokens)) AS BIGINT) AS token_count_sum,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
        FROM read_json('/tmp/spark_graft_sink_oracle/ndjson_documents/*.json',
                       format='newline_delimited')
    """

    # raw jsonl mode: gzip part files decoded directly by DuckDB —
    # compression + line framing + JSON encoding all second-engine
    q["sink_jsonl_roundtrip"] = """
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS id_sum,
               bit_xor(doc_id) AS id_xor,
               CAST(sum(length(text)) AS BIGINT) AS text_len_sum,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_sum
        FROM read_json('/tmp/spark_graft_sink_oracle/jsonl_documents/*.txt.gz',
                       format='newline_delimited')
    """

    # corpus_bm25 / corpus_hybrid_rrf: BM25 rebuilt in SQL from the
    # same exact-integer sufficient statistics.  The idf CTE mirrors
    # retrieval._idf_ppm literally (DuckDB ln == CPython math.log ==
    # platform libm — pinned by tests/test_llm_ops.py), and the
    # tf-saturation tree is parenthesized identically to
    # retrieval._tsat, so every per-term floor lands on the same
    # double.  Scores are integer micro-units end-to-end.
    from dump_es_parquet_spark.operators.retrieval import DEFAULT_QUERY, _terms

    terms = _terms(DEFAULT_QUERY)
    rng = range(len(terms))
    dfcols = ", ".join(
        f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS df{i}"
        for i, t in enumerate(terms)
    )
    idfcols = ", ".join(
        f"CAST(floor(1e6 * ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) + 0.5)"
        f" AS BIGINT) AS idf{i}"
        for i in rng
    )
    tfcols = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}" for i, t in enumerate(terms)
    )
    sterm = " + ".join(
        f"CAST(floor(CAST(idf{i} AS DOUBLE) * ((tf{i} * 2.2) / (tf{i} + 1.2 *"
        f" (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))) AS BIGINT)"
        for i in rng
    )
    nm = " + ".join(f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in rng)
    bm25_cte = f"""
        d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(len(toks)) AS BIGINT) AS tdl, {dfcols} FROM d),
        i AS (SELECT (tdl / n) AS avgdl, {idfcols} FROM s),
        t AS (SELECT doc_id, len(toks) AS dl, {tfcols} FROM d),
        scored AS (SELECT doc_id, dl, {nm} AS n_matched,
                          {sterm} AS score_micro FROM t, i)
    """
    q["corpus_bm25"] = f"""
        WITH {bm25_cte}
        SELECT doc_id, dl, n_matched, score_micro FROM scored
        WHERE n_matched > 0
        ORDER BY score_micro DESC, doc_id ASC LIMIT 10
    """
    # corpus_bm25_served answers the SAME oracle from the materialized
    # postings store (retrieval.bm25_topk_from_store) — bit-identical
    # scores by construction, so the SQL is shared verbatim
    q["corpus_bm25_served"] = q["corpus_bm25"]

    # corpus_rank_eval: the ES _rank_eval API — DuckDB rebuilds each
    # saved query's BM25 top-10 from the same exact-integer
    # statistics (per-query CTE instances of the corpus_bm25 scheme),
    # joins the same synthetic qrel, and computes
    # precision/recall/MRR/DCG/NDCG@10 with the identical
    # round-9dp-then-DECIMAL-sum discipline (log2 resolves to the
    # same platform libm as CPython math.log2 — the _idf_ppm
    # argument). Also the batch-BM25 path's first oracle row.
    from dump_es_parquet_spark.operators.retrieval import RANK_EVAL_QUERIES

    def _bm25_rank_cte(qid: int, qterms: list[str]) -> str:
        rng_q = range(len(qterms))
        dfc = ", ".join(
            f"CAST(sum(CASE WHEN list_contains(toks, '{t}') THEN 1 ELSE 0 "
            f"END) AS BIGINT) AS df{i}"
            for i, t in enumerate(qterms)
        )
        idfc = ", ".join(
            f"CAST(floor(1e6 * ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5))"
            f" + 0.5) AS BIGINT) AS idf{i}"
            for i in rng_q
        )
        tfc = ", ".join(
            f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
            for i, t in enumerate(qterms)
        )
        sterm_q = " + ".join(
            f"CAST(floor(CAST(idf{i} AS DOUBLE) * ((tf{i} * 2.2) / (tf{i} "
            f"+ 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))) "
            f"AS BIGINT)"
            for i in rng_q
        )
        nm_q = " + ".join(f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
                          for i in rng_q)
        return f"""
        s{qid} AS (SELECT CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(len(toks)) AS BIGINT) AS tdl, {dfc}
                   FROM rd),
        i{qid} AS (SELECT (tdl / n) AS avgdl, {idfc} FROM s{qid}),
        t{qid} AS (SELECT doc_id, len(toks) AS dl, {tfc} FROM rd),
        rk{qid} AS (SELECT CAST({qid} AS BIGINT) AS query_id, doc_id, rank
                    FROM (SELECT doc_id,
                                 row_number() OVER (ORDER BY score DESC,
                                                    doc_id ASC) AS rank
                          FROM (SELECT doc_id, {nm_q} AS n_matched,
                                       {sterm_q} AS score
                                FROM t{qid}, i{qid}) x
                          WHERE n_matched > 0) y
                    WHERE rank <= 10)"""

    _rk_ctes = ",".join(
        _bm25_rank_cte(qid, _terms(qtext)) for qid, qtext in RANK_EVAL_QUERIES
    )
    _rk_union = " UNION ALL ".join(
        f"SELECT * FROM rk{qid}" for qid, _ in RANK_EVAL_QUERIES
    )
    q["corpus_rank_eval"] = f"""
        WITH rd AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        {_rk_ctes},
        ranked AS ({_rk_union}),
        qrel AS (SELECT CAST(q.query_id AS BIGINT) AS query_id, d.doc_id,
                        CAST(1 + d.doc_id % 3 AS INT) AS rating
                 FROM documents d
                 CROSS JOIN (SELECT unnest(range(0, 3)) AS query_id) q
                 WHERE d.doc_id % 5 = q.query_id),
        disc AS (SELECT CAST(g AS INT) AS rank, 1.0 / log2(g + 1) AS disc
                 FROM generate_series(1, 10) t(g)),
        hits AS (SELECT r.query_id, r.rank,
                        coalesce(j.rating, 0) AS rating
                 FROM ranked r LEFT JOIN qrel j
                   ON r.query_id = j.query_id AND r.doc_id = j.doc_id),
        per AS (SELECT h.query_id,
                       CAST(count(*) AS BIGINT) AS n_retrieved,
                       CAST(sum(CASE WHEN rating >= 2 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_rel_topk,
                       min(CASE WHEN rating >= 2 THEN h.rank END)
                           AS first_rel,
                       sum(CAST(round(CAST((1 << rating) - 1 AS DOUBLE)
                                      * d.disc, 9) AS DECIMAL(28,12)))
                           AS dcg_dec
                FROM hits h JOIN disc d ON h.rank = d.rank
                GROUP BY h.query_id),
        ideal AS (SELECT query_id,
                         sum(CAST(round(CAST((1 << rating) - 1 AS DOUBLE)
                                        * d.disc, 9) AS DECIMAL(28,12)))
                             AS idcg_dec
                  FROM (SELECT query_id, rating,
                               row_number() OVER (PARTITION BY query_id
                                 ORDER BY rating DESC, doc_id ASC) AS rank
                        FROM qrel) i JOIN disc d ON i.rank = d.rank
                  WHERE i.rank <= 10 GROUP BY query_id),
        totals AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_relevant
                   FROM qrel WHERE rating >= 2 GROUP BY query_id),
        qs AS (SELECT unnest(range(0, 3)) AS query_id)
        SELECT qs.query_id AS query_id,
               coalesce(p.n_retrieved, 0) AS n_retrieved,
               coalesce(p.n_rel_topk, 0) AS n_rel_topk,
               coalesce(tt.n_relevant, 0) AS n_relevant,
               round(coalesce(CAST(p.n_rel_topk AS DOUBLE) / p.n_retrieved,
                              0.0), 6) AS precision_r6,
               round(coalesce(CAST(p.n_rel_topk AS DOUBLE) / tt.n_relevant,
                              0.0), 6) AS recall_r6,
               round(coalesce(1.0 / p.first_rel, 0.0), 6) AS mrr_r6,
               round(coalesce(CAST(p.dcg_dec AS DOUBLE), 0.0), 6) AS dcg_r6,
               round(CASE WHEN CAST(id.idcg_dec AS DOUBLE) > 0
                          THEN coalesce(CAST(p.dcg_dec AS DOUBLE), 0.0)
                               / CAST(id.idcg_dec AS DOUBLE)
                          ELSE 0.0 END, 6) AS ndcg_r6
        FROM qs LEFT JOIN per p ON qs.query_id = p.query_id
                LEFT JOIN ideal id ON qs.query_id = id.query_id
                LEFT JOIN totals tt ON qs.query_id = tt.query_id
        ORDER BY query_id
    """

    # corpus_bm25_standard: the analyzer seam (PARITY #19) — the messy
    # request text is analyzed DRIVER-side by the same _terms used to
    # build the Spark plan (so query normalization is the thing under
    # test), and the document tokenizer is the standard analyzer
    # spelled in DuckDB: lowercase + split on non-alphanumeric runs,
    # empties dropped.
    from dump_es_parquet_spark.operators.retrieval import MESSY_QUERY

    std_terms = _terms(MESSY_QUERY, "standard")
    assert std_terms == terms, "MESSY_QUERY must normalize to the demo terms"
    std_toks = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        " x -> x <> '')"
    )
    q["corpus_bm25_standard"] = q["corpus_bm25"].replace(_TOKS, std_toks)

    # corpus_bm25_stopwords: the full analyzer SPEC (round 11) — the
    # DuckDB tokenizer chains the identical post-filters (drop
    # empties, length >= 2, NOT IN the Lucene English stopword list);
    # query terms driver-analyzed through the same spec.
    from dump_es_parquet_spark.operators.retrieval import (
        ENGLISH_STOPWORDS,
        STOPWORDS_ANALYZER,
        STOPWORDS_QUERY,
    )

    stop_terms = _terms(STOPWORDS_QUERY, STOPWORDS_ANALYZER)
    assert stop_terms == terms, (
        "STOPWORDS_QUERY must normalize to the demo terms"
    )
    _stoplist = ", ".join(f"'{w}'" for w in ENGLISH_STOPWORDS)
    stop_toks = (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
        f" x -> x <> '' AND length(x) >= 2 AND NOT list_contains([{_stoplist}], x))"
    )
    q["corpus_bm25_stopwords"] = q["corpus_bm25"].replace(_TOKS, stop_toks)

    # corpus_bm25_stemmed: the analyzer seam's third step (round 12)
    # — the Harman S-stemmer (Lucene minimal_english) as the SAME
    # three ordered regexp rules, over the SAME deterministically
    # pluralized corpus slice the Spark query builds (doc_id % 3 == 0
    # gets dup→dups / filter→filters / window→windows); query terms
    # driver-analyzed through the same spec.
    from dump_es_parquet_spark.operators.retrieval import (
        STEMMED_ANALYZER,
        STEMMED_QUERY,
    )

    stem_terms = _terms(STEMMED_QUERY, STEMMED_ANALYZER)
    assert stem_terms == terms, (
        "STEMMED_QUERY must stem back to the demo terms"
    )
    stem_toks = (
        "list_transform(" + std_toks + ", t -> CASE"
        " WHEN regexp_matches(t, '.ies$')"
        " AND NOT regexp_matches(t, '[ea]ies$')"
        " THEN regexp_replace(t, 'ies$', 'y')"
        " WHEN regexp_matches(t, '[us]s$') THEN t"
        " WHEN regexp_matches(t, '[iaoe]es$') THEN t"
        " WHEN regexp_matches(t, '..s$')"
        " THEN regexp_replace(t, 's$', '')"
        " ELSE t END)"
    )
    pdocs_cte = (
        "pdocs AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN"
        " regexp_replace(regexp_replace(regexp_replace(text,"
        " 'dup', 'dups', 'g'), 'filter', 'filters', 'g'),"
        " 'window', 'windows', 'g') ELSE text END AS text"
        " FROM documents)"
    )
    q["corpus_bm25_stemmed"] = f"""
        WITH {pdocs_cte},
        {bm25_cte.replace(_TOKS, stem_toks)
                 .replace("FROM documents", "FROM pdocs")}
        SELECT doc_id, dl, n_matched, score_micro FROM scored
        WHERE n_matched > 0
        ORDER BY score_micro DESC, doc_id ASC LIMIT 10
    """
    q["corpus_hybrid_rrf"] = f"""
        WITH {bm25_cte},
        lexpool AS (SELECT doc_id, score_micro FROM scored WHERE n_matched > 0
                    ORDER BY score_micro DESC, doc_id ASC LIMIT 50),
        lex AS (SELECT doc_id, row_number() OVER
                  (ORDER BY score_micro DESC, doc_id ASC) AS lex_rank FROM lexpool),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        vecpool AS (SELECT vec_id, round({qcos}, 6) AS cos_sim
                    FROM e e, q WHERE vec_id != 0
                    ORDER BY cos_sim DESC, vec_id ASC LIMIT 50),
        vec AS (SELECT vec_id AS doc_id, row_number() OVER
                  (ORDER BY cos_sim DESC, vec_id ASC) AS vec_rank FROM vecpool),
        f AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        SELECT doc_id, lex_rank, vec_rank,
               (COALESCE(CAST(floor(1e9 / (60 + lex_rank)) AS BIGINT), 0)
                + COALESCE(CAST(floor(1e9 / (60 + vec_rank)) AS BIGINT), 0)) AS rrf_micro
        FROM f ORDER BY rrf_micro DESC, doc_id ASC LIMIT 10
    """

    # es_retriever_rrf (round 14): the ES 8.14 retriever.rrf request
    # dialect over the SAME fusion engine, with NON-default knobs —
    # rank_constant 40, window 30, size 8, query vector 3 — so the
    # parameter plumbing is load-bearing.
    q["es_retriever_rrf"] = f"""
        WITH {bm25_cte},
        lexpool AS (SELECT doc_id, score_micro FROM scored WHERE n_matched > 0
                    ORDER BY score_micro DESC, doc_id ASC LIMIT 30),
        lex AS (SELECT doc_id, row_number() OVER
                  (ORDER BY score_micro DESC, doc_id ASC) AS lex_rank FROM lexpool),
        e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 3),
        vecpool AS (SELECT vec_id, round({qcos}, 6) AS cos_sim
                    FROM e e, q WHERE vec_id != 3
                    ORDER BY cos_sim DESC, vec_id ASC LIMIT 30),
        vec AS (SELECT vec_id AS doc_id, row_number() OVER
                  (ORDER BY cos_sim DESC, vec_id ASC) AS vec_rank FROM vecpool),
        f AS (SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id, lex_rank, vec_rank
              FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id)
        SELECT doc_id, lex_rank, vec_rank,
               (COALESCE(CAST(floor(1e9 / (40 + lex_rank)) AS BIGINT), 0)
                + COALESCE(CAST(floor(1e9 / (40 + vec_rank)) AS BIGINT), 0)) AS rrf_micro
        FROM f ORDER BY rrf_micro DESC, doc_id ASC LIMIT 8
    """

    # corpus_highlight: snippets via strpos/substr/concat — every
    # string primitive has identical 1-based + clamping semantics in
    # DuckDB, so the rendered bytes match.  Token-boundary anchor
    # (VERDICT r08 #1): locate ' '||t||' ' in ' '||text||' ' — the
    # padded 1-based hit position IS the token's char start in the
    # original text — then splice <em> by position (pre‖tag‖post),
    # mirroring retrieval.highlight exactly
    W = 30  # context chars either side (retrieval.highlight default)
    frags = []
    for t in terms:
        pos = f"strpos(' ' || text || ' ', ' {t} ')"
        start = f"greatest(1, {pos} - {W})"
        frags.append(
            f"CASE WHEN {pos} > 0 THEN"
            f" substr(text, {start}, {pos} - {start})"
            f" || '<em>{t}</em>'"
            f" || substr(text, {pos} + {len(t)}, {W}) END"
        )
    frag_list = ",\n               ".join(frags)
    q["corpus_highlight"] = f"""
        WITH {bm25_cte},
        top AS (SELECT doc_id, score_micro FROM scored WHERE n_matched > 0
                ORDER BY score_micro DESC, doc_id ASC LIMIT 10)
        SELECT t.doc_id, t.score_micro,
               concat_ws(' … ',
               {frag_list}) AS highlights
        FROM top t JOIN documents d2 USING (doc_id)
        ORDER BY t.score_micro DESC, t.doc_id ASC
    """

    # es_search_highlight: the _search request's highlight section —
    # the SAME snippet fragments as corpus_highlight (frag_list is the
    # shared generator above), but over the request's own hits page
    # (match OR filter → sort → size) with _source include wildcards
    # (doc_id + lang*); highlight terms derive from the match clause.
    q["es_search_highlight"] = f"""
        WITH t AS (SELECT doc_id, lang, text, {_TOKS} AS toks
                   FROM documents),
        hits AS (SELECT * FROM t
                 WHERE list_contains(toks, 'dup')
                    OR list_contains(toks, 'filter')
                    OR list_contains(toks, 'window')
                 ORDER BY doc_id ASC LIMIT 15)
        SELECT doc_id, lang,
               concat_ws(' … ',
               {frag_list}) AS text_snippet
        FROM hits ORDER BY doc_id
    """

    # corpus_match_phrase: ES match_phrase (slop 0) — consecutive-token
    # occurrence counts for the fixed demo bigram ("table hash"); the
    # Spark side counts starts with an element_at probe filter, the
    # oracle with the equivalent list comprehension (retrieval.py,
    # phrase_occurrences)
    q["corpus_match_phrase"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        occ AS (
          SELECT doc_id,
                 len([x FOR x IN range(1, greatest(len(t) - 1, 0) + 1)
                      IF t[x] = 'table' AND t[x+1] = 'hash']) AS n_occurrences
          FROM t
        )
        SELECT doc_id, n_occurrences FROM occ
        WHERE n_occurrences > 0 ORDER BY doc_id
    """

    # corpus_significant_terms: ES significant_terms (JLH heuristic,
    # superset background) — per-doc DISTINCT term presence counts
    # split fg/total, scored with the SAME parenthesized double tree
    # as the Spark side over exact-long inputs (retrieval.py,
    # significant_terms), so the floored micro-scores hash-match
    q["corpus_significant_terms"] = f"""
        WITH t AS (SELECT CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS fg,
                          list_distinct({_TOKS}) AS toks
                   FROM documents),
        sizes AS (SELECT CAST(sum(fg) AS BIGINT) AS fg_docs,
                         CAST(count(*) AS BIGINT) AS n_docs FROM t),
        terms AS (SELECT term,
                         CAST(sum(fg) AS BIGINT) AS fg_df,
                         CAST(count(*) AS BIGINT) AS df
                  FROM (SELECT fg, unnest(toks) AS term FROM t)
                  GROUP BY term HAVING sum(fg) >= 3)
        SELECT term, fg_df, df,
               CAST(floor(1e6 * (((fg_df / fg_docs) - (df / n_docs))
                    * ((fg_df / fg_docs) / (df / n_docs)))) AS BIGINT)
                   AS score_micro
        FROM terms, sizes
        ORDER BY score_micro DESC, term ASC LIMIT 20
    """

    # corpus_more_like_this: ES more_like_this — the oracle re-derives
    # the SAME query terms relationally (tf-in-source × integer
    # idf_ppm, ties by term) and scores with the pinned BM25 micro
    # tree (retrieval.py, more_like_this). The idf inside both the
    # selection key and the scoring is the shared floor(1e6·ln(…)+0.5)
    # ppm form, so selection and scores are integer-deterministic.
    IDF = "CAST(floor(1e6 * ln(1 + (n - df + 0.5) / (df + 0.5)) + 0.5) AS BIGINT)"
    q["corpus_more_like_this"] = f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                         CAST(sum(len(toks)) AS BIGINT) AS tdl FROM d),
        srctf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf_src
                  FROM (SELECT unnest(toks) AS term FROM d WHERE doc_id = 42)
                  WHERE term != '' GROUP BY term),
        dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                  FROM (SELECT doc_id, unnest(list_distinct(toks)) AS term
                        FROM d)
                  WHERE term IN (SELECT term FROM srctf) GROUP BY term),
        qterms AS (SELECT s.term, {IDF} AS idf_ppm
                   FROM srctf s JOIN dfreq USING (term), stats
                   ORDER BY (tf_src * {IDF}) DESC, s.term ASC
                   LIMIT 10),
        tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
               FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term
                     FROM d)
               GROUP BY doc_id, dl, term),
        scored AS (SELECT t.doc_id, t.dl,
                          CAST(count(*) AS BIGINT) AS n_matched,
                          CAST(sum(CAST(floor(CAST(idf_ppm AS DOUBLE)
                               * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75
                                  * (dl / (tdl / n)))))) AS BIGINT))
                               AS BIGINT) AS score_micro
                   FROM tf t JOIN qterms USING (term), stats
                   GROUP BY t.doc_id, t.dl)
        SELECT doc_id, dl, n_matched, score_micro FROM scored
        WHERE doc_id != 42 AND n_matched > 0
        ORDER BY score_micro DESC, doc_id ASC LIMIT 10
    """

    # corpus_fuzzy_match: ES fuzzy query — classic Levenshtein (the
    # PARITY-documented stand-in for Lucene's Damerau variant: Spark
    # and DuckDB agree exactly on the classic definition, which is
    # what makes this row hash-checkable). Length guard mirrored so
    # both engines filter identically.
    q["corpus_fuzzy_match"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        m AS (SELECT doc_id,
                     array_to_string(list_sort(list_distinct(
                         list_filter(toks,
                             x -> abs(len(x) - 4) <= 1
                                  AND levenshtein(x, 'hask') <= 1))), ' ')
                         AS matched,
                     len(list_filter(toks,
                         x -> abs(len(x) - 4) <= 1
                              AND levenshtein(x, 'hask') <= 1))
                         AS n_occurrences
              FROM t)
        SELECT doc_id, matched, n_occurrences FROM m
        WHERE n_occurrences > 0 ORDER BY doc_id
    """

    # corpus_span_near: ES match_phrase slop=1 / span_near in-order —
    # greedy-minimal assignment mirrored exactly: 1-based positions in
    # SQL vs 0-based in Spark cancel in the (end − p) span width.
    # list_min over an empty filter is NULL in both engines, so a
    # missing later term drops the start the same way.
    q["corpus_span_near"] = f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        pos AS (SELECT doc_id,
                  [x FOR x IN range(1, len(t) + 1)
                     IF t[x] = 'table'] AS p1,
                  [x FOR x IN range(1, len(t) + 1)
                     IF t[x] = 'hash'] AS p2
                FROM t),
        occ AS (SELECT doc_id,
                  len(list_filter(p1, p ->
                      list_min(list_filter(p2, q2 -> q2 > p)) - p <= 2))
                      AS n_spans
                FROM pos)
        SELECT doc_id, n_spans FROM occ
        WHERE n_spans > 0 ORDER BY doc_id
    """

    # — the ES _search request compiler (operators/es_search.py) —
    # es_search_hits: the hits side of a saved request — bool query
    # with NULL-exact must_not (coalesce-to-false, matching ES's
    # missing-field semantics) and a COUNTED should (msm 1), global
    # sort + from/size pagination. The sort key (value DESC, event_id)
    # is unique, so the OFFSET/LIMIT page is deterministic.
    q["es_search_hits"] = """
        SELECT event_id, ts, event_type, value FROM events
        WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
          AND ts <  TIMESTAMP '2024-01-20 00:00:00'
          AND event_type IN ('click', 'view', 'purchase')
          AND NOT coalesce(user_id = 13, FALSE)
          AND (CAST(coalesce(value >= 120, FALSE) AS INT)
               + CAST(coalesce(props LIKE '%8_}', FALSE) AS INT)) >= 1
        ORDER BY value DESC, event_id ASC
        LIMIT 25 OFFSET 5
    """

    # es_aggs_tree: date_histogram(day) > terms(type, size 3) with a
    # day-level cardinality and leaf avg/max — mirrored as ROLLUP +
    # GROUPING() level arithmetic + the same per-parent top-3 window
    # (doc_count DESC, key ASC — ES's tiebreak). Bucket keys are the
    # epoch-millis longs ES itself returns.
    q["es_aggs_tree"] = """
        WITH leaf AS (
          SELECT epoch_ms(date_trunc('day', ts)) AS by_day,
                 event_type AS by_type, user_id, value
          FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ), rolled AS (
          SELECT by_day, by_type,
                 CAST(2 - (GROUPING(by_day) + GROUPING(by_type)) AS INT)
                     AS level,
                 count(*) AS doc_count,
                 CAST(count(DISTINCT user_id) AS DOUBLE) AS uniq_users_a,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(value) AS avg_value_a,
                 CAST(max(value) AS DOUBLE) AS max_value_a
          FROM leaf GROUP BY ROLLUP (by_day, by_type)
        ), l2 AS (
          SELECT *, row_number() OVER (
                     PARTITION BY by_day
                     ORDER BY doc_count DESC, by_type ASC) AS rk
          FROM rolled WHERE level = 2
        )
        SELECT level, by_day, by_type, doc_count,
               uniq_users_a AS uniq_users,
               CAST(NULL AS DOUBLE) AS avg_value,
               CAST(NULL AS DOUBLE) AS max_value
        FROM rolled WHERE level = 1
        UNION ALL
        SELECT level, by_day, by_type, doc_count,
               CAST(NULL AS DOUBLE), avg_value_a, max_value_a
        FROM l2 WHERE rk <= 3
        ORDER BY level, by_day, by_type NULLS FIRST
    """

    # es_range_buckets: keyed range agg (from-inclusive/to-exclusive)
    # over the query-filtered frame; cardinality is the EXACT variant
    # (documented divergence from ES's HLL) and percentiles are exact
    # linear interpolation (F.percentile ≡ quantile_cont), rounded 6dp.
    q["es_range_buckets"] = """
        WITH leaf AS (
          SELECT CASE WHEN o_totalprice < 100000 THEN 'cheap'
                      WHEN o_totalprice >= 100000
                           AND o_totalprice < 300000 THEN 'mid'
                      WHEN o_totalprice >= 300000 THEN 'big' END
                     AS price_band,
                 o_custkey, o_totalprice
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        )
        SELECT CAST(1 AS INT) AS level, price_band, count(*) AS doc_count,
               CAST(count(DISTINCT o_custkey) AS DOUBLE) AS uniq_custs,
               round(quantile_cont(o_totalprice, 0.5), 6) AS price_p50_r6,
               round(quantile_cont(o_totalprice, 0.9), 6) AS price_p90_r6
        FROM leaf WHERE price_band IS NOT NULL
        GROUP BY price_band ORDER BY price_band
    """

    # es_histogram: numeric histogram, key = floor((v-offset)/interval)
    # in the SAME long-floor-times-double arithmetic as Spark, with
    # min_doc_count as HAVING.
    q["es_histogram"] = """
        WITH leaf AS (
          SELECT floor((value - 0.0) / 50.0) * 50.0 + 0.0 AS value_bucket,
                 value
          FROM events WHERE value IS NOT NULL
        )
        SELECT CAST(1 AS INT) AS level, value_bucket, count(*) AS doc_count,
               CAST(count(value) AS DOUBLE) AS n_values
        FROM leaf
        GROUP BY value_bucket HAVING count(*) >= 5
        ORDER BY value_bucket
    """

    # es_date_histogram_gapfill: min_doc_count 0 + extended_bounds —
    # the Kibana time-series shape. The grid is the observed hourly
    # key range EXTENDED by the bounds (LEAST/GREATEST mirror the
    # frame-anchored fill); empty buckets carry doc_count 0 and NULL
    # metrics on both engines.
    q["es_date_histogram_gapfill"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(1703980800000, MIN(k)) AS lo,
                 GREATEST(1706742000000, MAX(k)) AS hi FROM b
        ),
        grid AS (
          SELECT unnest(range(lo, hi + 3600000, 3600000)) AS k FROM ext
        )
        SELECT CAST(1 AS INT) AS level, g.k AS per_hour,
               coalesce(b.dc, 0) AS doc_count, b.s AS sum_value
        FROM grid g LEFT JOIN b ON g.k = b.k
        ORDER BY per_hour
    """

    # es_date_histogram_tz (round 12): +05:30 local-midnight day
    # buckets — key = floor((t + off) / day) * day - off, so every
    # key ≡ -off (mod day); the gap grid and the extended-bounds
    # alignment run on the same shifted arithmetic (grid offset
    # goff = (-off) mod day, bounds aligned to it).
    q["es_date_histogram_tz"] = """
        WITH b AS (
          SELECT CAST(floor((epoch_ms(ts) + 19800000.0) / 86400000)
                      AS BIGINT) * 86400000 - 19800000 AS k,
                 count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(((1703980800000 - 66600000) // 86400000)
                       * 86400000 + 66600000, MIN(k)) AS lo,
                 GREATEST(((1706742000000 - 66600000) // 86400000)
                          * 86400000 + 66600000, MAX(k)) AS hi
          FROM b
        ),
        grid AS (
          SELECT unnest(range(lo, hi + 86400000, 86400000)) AS k FROM ext
        )
        SELECT CAST(1 AS INT) AS level, g.k AS per_day,
               coalesce(b.dc, 0) AS doc_count, b.s AS sum_value
        FROM grid g LEFT JOIN b ON g.k = b.k
        ORDER BY per_day
    """

    # es_date_histogram_tz_iana (round 13, VERDICT r12 Next #1): the
    # Kibana browser-zone request — daily buckets at America/New_York
    # LOCAL midnights through a tzdb (ICU here, the JVM zoneinfo on
    # the Spark side; both carry IANA 2024 rules for this zone). The
    # gap grid is enumerated in LOCAL wall time (uniform 1-day steps)
    # and each boundary maps back to its UTC instant, so the
    # 2024-03-10 spring-forward day is 23 instant-hours wide.
    q["es_date_histogram_tz_iana"] = """
        WITH b AS (
          SELECT date_trunc('day',
                   timezone('America/New_York', ts AT TIME ZONE 'UTC'))
                     AS kw,
                 count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(TIMESTAMP '2023-12-30 00:00:00', MIN(kw)) AS lo,
                 GREATEST(TIMESTAMP '2024-03-19 00:00:00', MAX(kw)) AS hi
          FROM b
        ),
        grid AS (
          SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS kw
          FROM ext
        ),
        g AS (
          SELECT CAST(1 AS INT) AS level,
                 epoch_ms(timezone('America/New_York', grid.kw)) AS per_day,
                 coalesce(b.dc, 0) AS doc_count, b.s AS sum_value
          FROM grid LEFT JOIN b ON grid.kw = b.kw
        )
        SELECT * FROM g ORDER BY per_day
    """

    # es_geo_bounds_string_stats (round 12): bounding box = plain
    # min/max pairs over present points; string_stats = length
    # aggregates with the avg through DECIMAL.
    q["es_geo_bounds_string_stats"] = """
        WITH g AS (
          SELECT event_type,
                 value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon,
                 props
          FROM events WHERE event_type IS NOT NULL
        )
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               count(*) AS doc_count,
               CAST(max(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                        THEN lat END) AS DOUBLE) AS box_top,
               CAST(min(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                        THEN lat END) AS DOUBLE) AS box_bottom,
               CAST(min(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                        THEN lon END) AS DOUBLE) AS box_left,
               CAST(max(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                        THEN lon END) AS DOUBLE) AS box_right,
               CAST(count(length(props)) AS DOUBLE) AS props_len_count,
               CAST(min(length(props)) AS DOUBLE) AS props_len_min_length,
               CAST(max(length(props)) AS DOUBLE) AS props_len_max_length,
               CAST(sum(CAST(length(props) AS DECIMAL(18,6))) AS DOUBLE)
                   / count(length(props)) AS props_len_avg_length
        FROM g GROUP BY event_type ORDER BY by_type
    """

    # es_bucket_selector (round 12): the HAVING pipeline — normalize
    # shares computed over ALL buckets first (decimal-summed total),
    # then the selector's predicate prunes.
    q["es_bucket_selector"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k,
                 count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'error', FALSE) AND ts IS NOT NULL
          GROUP BY 1
        ),
        w AS (
          SELECT k, n, s,
                 round(s / CAST(sum(CAST(s AS DECIMAL(28,6))) OVER ()
                               AS DOUBLE), 6) AS share
          FROM b
        )
        SELECT CAST(1 AS INT) AS level, k AS per_hour,
               n AS doc_count, s AS sum_value, share
        FROM w WHERE n >= 2 AND s > n * 80
        ORDER BY per_hour
    """

    # es_significant_terms (round 12): one flag-column pass — per-key
    # conditional counts + one-row sizes; the JLH tree is the exact
    # parenthesization the corpus twin pins, floored to micro longs.
    q["es_significant_terms"] = """
        WITH d AS (
          SELECT CASE WHEN coalesce(value >= 80, FALSE)
                 THEN 1 ELSE 0 END AS fg,
                 'b' || CAST(CAST(floor(value / 50) AS INT) AS VARCHAR)
                     AS sig_band
          FROM events
        ),
        s AS (
          SELECT CAST(sum(fg) AS BIGINT) AS fgd,
                 CAST(count(*) AS BIGINT) AS nd
          FROM d
        ),
        c AS (
          SELECT sig_band,
                 CAST(sum(fg) AS BIGINT) AS doc_count,
                 CAST(count(*) AS BIGINT) AS bg_count
          FROM d WHERE sig_band IS NOT NULL
          GROUP BY sig_band HAVING sum(fg) >= 2
        ),
        j AS (
          SELECT sig_band, doc_count, bg_count,
                 CAST(floor(1e6 * (((doc_count / CAST(fgd AS DOUBLE))
                        - (bg_count / CAST(nd AS DOUBLE)))
                      * ((doc_count / CAST(fgd AS DOUBLE))
                         / (bg_count / CAST(nd AS DOUBLE)))))
                      AS BIGINT) AS score_micro
          FROM c, s
        )
        SELECT CAST(1 AS INT) AS level, sig_band, doc_count, bg_count,
               score_micro
        FROM j WHERE score_micro > 0
        ORDER BY score_micro DESC, sig_band ASC LIMIT 10
    """

    # es_significant_terms_per_bucket (round 13, VERDICT r12 Next
    # #3): terms > significant_terms — per-parent foreground counts
    # vs the whole-index background; the JLH tree is
    # character-identical to the root row's, per-bucket rank by
    # (score desc, term asc) capped at 5.
    q["es_significant_terms_per_bucket"] = """
        WITH d AS (
          SELECT CASE WHEN coalesce(value >= 40, FALSE)
                 THEN 1 ELSE 0 END AS fg,
                 event_type AS by_type,
                 'b' || CAST(CAST(floor(value / 50) AS INT) AS VARCHAR)
                     AS sig_band
          FROM events
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        bg AS (
          SELECT sig_band, CAST(count(*) AS BIGINT) AS bg_count
          FROM d WHERE sig_band IS NOT NULL GROUP BY sig_band
        ),
        fgrows AS (
          SELECT * FROM d WHERE fg = 1 AND by_type IS NOT NULL
        ),
        ps AS (
          SELECT by_type, CAST(count(*) AS BIGINT) AS fgd,
                 row_number() OVER (ORDER BY count(*) DESC, by_type ASC)
                   AS pr
          FROM fgrows GROUP BY by_type
        ),
        cnt AS (
          SELECT by_type, sig_band,
                 CAST(count(*) AS BIGINT) AS doc_count
          FROM fgrows WHERE sig_band IS NOT NULL
          GROUP BY by_type, sig_band HAVING count(*) >= 2
        ),
        sc AS (
          SELECT c.by_type, c.sig_band, c.doc_count, bg.bg_count,
                 CAST(floor(1e6 * (((c.doc_count / CAST(ps.fgd AS DOUBLE))
                        - (bg.bg_count / CAST(nd.n AS DOUBLE)))
                      * ((c.doc_count / CAST(ps.fgd AS DOUBLE))
                         / (bg.bg_count / CAST(nd.n AS DOUBLE)))))
                      AS BIGINT) AS score_micro
          FROM cnt c
          JOIN ps ON c.by_type = ps.by_type AND ps.pr <= 10
          JOIN bg ON c.sig_band = bg.sig_band
          CROSS JOIN nd
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY by_type
                   ORDER BY score_micro DESC, sig_band ASC) AS rk
          FROM sc WHERE score_micro > 0
        )
        SELECT CAST(2 AS INT) AS level, by_type, sig_band, doc_count,
               bg_count, score_micro
        FROM r WHERE rk <= 5
        ORDER BY by_type ASC, rk ASC
    """

    # es_nested_inner_hits (round 13, VERDICT r12 Next #4): the two
    # synthesized attrs objects' match conditions restated per
    # offset — object 0 (type, event_type) matches v='error';
    # object 1 (band, 'b'+floor(value/100)) matches the b1 prefix,
    # i.e. value in [100, 200). Hits paginate BEFORE offsets emit.
    q["es_nested_inner_hits"] = """
        WITH e AS (
          SELECT event_id, event_type, value,
                 coalesce(event_type = 'error', FALSE) AS m0,
                 coalesce(CAST(floor(value / 100) AS INT) = 1, FALSE)
                   AS m1
          FROM events
        ),
        hits AS (
          SELECT * FROM e WHERE m0 OR m1
          ORDER BY event_id ASC LIMIT 300
        )
        SELECT event_id, event_type, value, hit_offset FROM (
          SELECT event_id, event_type, value, 0 AS hit_offset
          FROM hits WHERE m0
          UNION ALL
          SELECT event_id, event_type, value, 1 AS hit_offset
          FROM hits WHERE m1
        )
        ORDER BY event_id ASC, hit_offset ASC
    """

    # es_percolate_phrase (round 13, VERDICT r12 Next #6): phrase
    # adjacency = the sentinel-joined token sequence contains
    # ' phrase ' — the whitespace analyzer restated as one
    # regexp_split + join; the four rule shapes restated as UNION
    # ALL arms (bare / +range / +must_not / should-of-two).
    q["es_percolate_phrase"] = """
        WITH d AS (
          SELECT doc_id, n_chars,
                 ' ' || array_to_string(
                     regexp_split_to_array(trim(text), '\\s+'), ' ')
                     || ' ' AS seq
          FROM documents WHERE text IS NOT NULL
        ),
        m AS (
          SELECT doc_id, 'p_table_scan' AS query_id FROM d
            WHERE contains(seq, ' table scan ')
          UNION ALL
          SELECT doc_id, 'p_hash_join' FROM d
            WHERE contains(seq, ' hash join ')
              AND coalesce(n_chars >= 200, FALSE)
          UNION ALL
          SELECT doc_id, 'p_sort_merge' FROM d
            WHERE contains(seq, ' sort merge ')
              AND NOT contains(seq, ' window scan ')
          UNION ALL
          SELECT doc_id, 'p_batch_or_vector' FROM d
            WHERE contains(seq, ' batch stream ')
               OR contains(seq, ' vector scan ')
        )
        SELECT doc_id, query_id FROM m ORDER BY doc_id, query_id
    """

    # es_normalize_zscore (round 13, VERDICT r12 Next #7): z-score
    # through the extended_stats window-moment discipline (19,6
    # decimals keep the squares in int128), softmax over the ROUNDED
    # z values — exp outputs 12dp-rounded, summed exactly, the 6dp
    # output tree engine-independent.
    q["es_normalize_zscore"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS n,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'error', FALSE) AND ts IS NOT NULL
          GROUP BY 1
        ),
        w AS (
          SELECT k, n, s,
                 CAST(count(s) OVER () AS DOUBLE) AS n_d,
                 CAST(sum(CAST(s AS DECIMAL(28,6))) OVER () AS DOUBLE)
                   AS sx,
                 round(CAST(sum(CAST(s AS DECIMAL(19,6))
                                * CAST(s AS DECIMAL(19,6))) OVER ()
                            AS DOUBLE), 4) AS sxx
          FROM b
        ),
        z AS (
          SELECT k, n, s,
                 CASE WHEN greatest((n_d * sxx - sx * sx)
                                    / (n_d * n_d), 0.0) > 0
                      THEN round((s - sx / n_d)
                                 / sqrt(greatest((n_d * sxx - sx * sx)
                                                 / (n_d * n_d), 0.0)), 6)
                 END AS zv
          FROM w
        ),
        e AS (
          SELECT *, round(exp(zv - max(zv) OVER ()), 12) AS ex FROM z
        )
        SELECT CAST(1 AS INT) AS level, k AS per_hour, n AS doc_count,
               s AS sum_value, zv AS z,
               round(ex / CAST(sum(CAST(ex AS DECIMAL(18,12))) OVER ()
                               AS DOUBLE), 6) AS sm
        FROM e ORDER BY per_hour
    """

    # es_boxplot_derivative_unit (round 13): quartiles through
    # quantile_cont (the exact-percentiles convention, 6dp);
    # normalized derivative = value / (key delta / unit_ms), both
    # divisions long/long -> double, identical trees.
    q["es_boxplot_derivative_unit"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
                 CAST(min(value) AS DOUBLE) AS bx_min,
                 round(quantile_cont(value, 0.25), 6) AS bx_q1_r6,
                 round(quantile_cont(value, 0.5), 6) AS bx_q2_r6,
                 round(quantile_cont(value, 0.75), 6) AS bx_q3_r6,
                 CAST(max(value) AS DOUBLE) AS bx_max
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        )
        SELECT CAST(1 AS INT) AS level, k AS per_hour,
               dc AS doc_count, s AS sum_value,
               bx_min, bx_q1_r6, bx_q2_r6, bx_q3_r6, bx_max,
               CAST(s - lag(s) OVER (ORDER BY k) AS DOUBLE) AS dv,
               round((s - lag(s) OVER (ORDER BY k))
                     / ((k - lag(k) OVER (ORDER BY k)) / 1800000), 6)
                   AS dv_normalized_r6
        FROM b ORDER BY per_hour
    """

    # es_moving_percentiles (round 13): the exact merged-window
    # reading — per grid hour, quantile_cont over the UNION of the
    # trailing 4 hours' raw purchase values (the engine's
    # interpolation tree is quantile_cont's); interior gap hours
    # come from the min..max grid and contribute nothing.
    q["es_moving_percentiles"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6)
                     AS p50,
                 round(quantile_cont(CAST(value AS DOUBLE), 0.9), 6)
                     AS p90
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (SELECT min(k) AS lo, max(k) AS hi FROM b),
        grid AS (
          SELECT unnest(range(lo, hi + 3600000, 3600000)) AS k FROM ext
        ),
        pairs AS (
          SELECT g.k, CAST(e.value AS DOUBLE) AS v
          FROM grid g JOIN events e
            ON coalesce(e.event_type = 'purchase', FALSE)
           AND e.ts IS NOT NULL AND e.value IS NOT NULL
           AND epoch_ms(date_trunc('hour', e.ts))
               BETWEEN g.k - 3 * 3600000 AND g.k
        ),
        mp AS (
          SELECT k, round(quantile_cont(v, 0.5), 6) AS mp50,
                 round(quantile_cont(v, 0.9), 6) AS mp90
          FROM pairs GROUP BY k
        )
        SELECT CAST(1 AS INT) AS level, g.k AS per_hour,
               coalesce(b.dc, 0) AS doc_count,
               b.p50 AS pct_p50_r6, b.p90 AS pct_p90_r6,
               mp.mp50 AS mp_p50_r6, mp.mp90 AS mp_p90_r6
        FROM grid g LEFT JOIN b USING (k) LEFT JOIN mp USING (k)
        ORDER BY per_hour
    """

    # es_global_agg (round 13): the global scope ignores the
    # request's query — the oracle aggregates the UNFILTERED frame.
    q["es_global_agg"] = """
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_value
        FROM events WHERE event_type IS NOT NULL
        GROUP BY event_type ORDER BY by_type
    """

    # es_rate_mad (round 13): rate divisors are IEEE divisions of
    # exactly-representable ints — (actual_bucket_ms / unit_ms),
    # actual month length by date arithmetic from the bucket key;
    # MAD = median(abs(v - median(v))) per bucket, both medians the
    # quantile_cont interpolation the exact-percentiles rows pin.
    # es_nested_inside_nested (round 14, lifting the r12/PARITY #22
    # one-nested bound): the five-level frame rebuilt as one UNION
    # per level — L1 counts DOCS (+ the doc-masked sum), L2/L3 count
    # OUTER objects (empty-inner outer objects included), L4/L5
    # count INNER objects (unnest drops empty inner arrays exactly
    # as the NULL-key machinery does).
    q["es_nested_inside_nested"] = """
        WITH rows_ AS (
          SELECT event_type AS ty, value,
                 [{'k': 'tags',
                   'inner': [{'t': 'lo', 'v': value},
                             {'t': 'hi', 'v': value * 2.0}]},
                  {'k': 'b' || CAST(CAST(floor(value / 100) AS INT)
                               AS VARCHAR),
                   'inner': CASE WHEN value > 250
                            THEN [{'t': 'big', 'v': value}]
                            ELSE [] END}] AS p
          FROM events WHERE event_type IS NOT NULL
        ),
        o AS (SELECT ty, value, unnest(p) AS ob FROM rows_),
        i AS (SELECT ty, ob.k AS k, unnest(ob.inner) AS io FROM o)
        SELECT CAST(1 AS INT) AS level, ty AS by_type,
               CAST(NULL AS VARCHAR) AS outer_objs,
               CAST(NULL AS VARCHAR) AS by_k,
               CAST(NULL AS VARCHAR) AS inner_objs,
               CAST(NULL AS VARCHAR) AS by_t,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value,
               CAST(NULL AS DOUBLE) AS sum_v
        FROM rows_ GROUP BY ty
        UNION ALL
        SELECT CAST(2 AS INT), ty, 'outer_objs', NULL, NULL, NULL,
               count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM o GROUP BY ty
        UNION ALL
        SELECT CAST(3 AS INT), ty, 'outer_objs', ob.k, NULL, NULL,
               count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM o GROUP BY ty, ob.k
        UNION ALL
        SELECT CAST(4 AS INT), ty, 'outer_objs', k, 'inner_objs', NULL,
               count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM i GROUP BY ty, k
        UNION ALL
        SELECT CAST(5 AS INT), ty, 'outer_objs', k, 'inner_objs', io.t,
               count(*), CAST(NULL AS DOUBLE),
               CAST(sum(CAST(io.v AS DECIMAL(18,6))) AS DOUBLE)
        FROM i GROUP BY ty, k, io.t
        ORDER BY 1, 2, 4, 6
    """

    # es_categorize_text (round 14): token-skeleton log
    # categorization — digit-bearing tokens wildcard to '*', the
    # skeleton buckets like terms (count desc, key asc, size 8).
    q["es_categorize_text"] = r"""
        WITH m AS (
          SELECT concat_ws(' ', 'user', CAST(user_id AS VARCHAR),
                   event_type, 'value',
                   CAST(CAST(value AS INT) AS VARCHAR),
                   CASE WHEN value > 400
                        THEN 'ALERT threshold 400 exceeded' END)
                     AS msg,
                 value
          FROM events
        ),
        s AS (
          SELECT array_to_string(list_transform(
                   regexp_split_to_array(trim(msg), '\s+'),
                   t -> CASE WHEN regexp_matches(t, '[0-9]')
                             THEN '*' ELSE t END), ' ') AS cats,
                 value
          FROM m WHERE msg IS NOT NULL
        ),
        c AS (
          SELECT cats, count(*) AS doc_count,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(value) AS avg_value
          FROM s GROUP BY cats
        )
        SELECT CAST(1 AS INT) AS level, cats, doc_count, avg_value
        FROM (
          SELECT *, row_number() OVER (
                     ORDER BY doc_count DESC, cats ASC) AS rk
          FROM c)
        WHERE rk <= 8
        ORDER BY cats
    """

    # es_rate_iana (round 14, closing the r13 "rate under IANA
    # zones" bound): monthly buckets at America/New_York local
    # boundaries; divisor = that local month's real day count (the
    # r13 day-count reading, the local date now resolved through
    # the tzdb in both engines).
    q["es_rate_iana"] = """
        WITH b AS (
          SELECT event_type AS by_type,
                 date_trunc('month',
                   timezone('America/New_York', ts AT TIME ZONE 'UTC'))
                     AS kw,
                 count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE ts IS NOT NULL AND event_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT CAST(1 AS INT) AS level, by_type,
               CAST(NULL AS BIGINT) AS per_month,
               CAST(sum(dc) AS BIGINT) AS doc_count,
               CAST(NULL AS DOUBLE) AS value_per_day_r6,
               CAST(NULL AS DOUBLE) AS events_per_week_r6
        FROM b GROUP BY by_type
        UNION ALL
        SELECT CAST(2 AS INT), by_type,
               epoch_ms(timezone('America/New_York', kw)),
               dc,
               round(s / (CAST(date_diff('day', CAST(kw AS DATE),
                     CAST(kw AS DATE) + INTERVAL 1 MONTH)
                     * 86400000 AS DOUBLE) / 86400000.0), 6),
               round(dc / (CAST(date_diff('day', CAST(kw AS DATE),
                     CAST(kw AS DATE) + INTERVAL 1 MONTH)
                     * 86400000 AS DOUBLE) / 604800000.0), 6)
        FROM b
        ORDER BY 1, 2, 3
    """

    q["es_rate_mad"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('month', o_orderdate)) AS k,
                 count(*) AS dc,
                 CAST(sum(CAST(o_totalprice AS DECIMAL(18,6)))
                      AS DOUBLE) AS s
          FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
        ),
        m AS (
          SELECT k, round(median(abs(v - md)), 6) AS mad FROM (
            SELECT epoch_ms(date_trunc('month', o_orderdate)) AS k,
                   CAST(o_totalprice AS DOUBLE) AS v,
                   median(CAST(o_totalprice AS DOUBLE)) OVER (
                     PARTITION BY date_trunc('month', o_orderdate)
                   ) AS md
            FROM orders
            WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
          ) GROUP BY k
        )
        SELECT CAST(1 AS INT) AS level, b.k AS per_month,
               b.dc AS doc_count,
               round(b.s / (CAST(date_diff('day',
                     CAST(epoch_ms(b.k) AS DATE),
                     CAST(epoch_ms(b.k) AS DATE) + INTERVAL 1 MONTH)
                     * 86400000 AS DOUBLE) / 86400000.0), 6)
                   AS price_per_day_r6,
               round(b.dc / (CAST(date_diff('day',
                     CAST(epoch_ms(b.k) AS DATE),
                     CAST(epoch_ms(b.k) AS DATE) + INTERVAL 1 MONTH)
                     * 86400000 AS DOUBLE) / 604800000.0), 6)
                   AS orders_per_week_r6,
               m.mad AS mad_price_r6
        FROM b LEFT JOIN m ON b.k = m.k ORDER BY per_month
    """

    # es_bucket_summaries (round 13): percentiles_bucket = exact
    # quantile_cont over the child buckets' metric values;
    # extended_stats_bucket = the extended_stats moment discipline
    # (exact decimal sums, 4dp Σv² cast, clamped population tree)
    # over the same values.
    q["es_bucket_summaries"] = """
        WITH leaf AS (
          SELECT event_type AS by_type,
                 epoch_ms(date_trunc('day', ts)) AS per_day, value
          FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
        ), l2 AS (
          SELECT by_type, per_day, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv
          FROM leaf GROUP BY 1, 2
        ), l1 AS (
          SELECT by_type, count(*) AS dc FROM leaf GROUP BY 1
        ), pipes AS (
          SELECT by_type,
                 round(quantile_cont(sv, 0.25), 6) AS p25,
                 round(quantile_cont(sv, 0.50), 6) AS p50,
                 round(quantile_cont(sv, 0.75), 6) AS p75,
                 CAST(count(sv) AS DOUBLE) AS n,
                 CAST(min(sv) AS DOUBLE) AS mn,
                 CAST(max(sv) AS DOUBLE) AS mx,
                 CAST(sum(CAST(sv AS DECIMAL(28,6))) AS DOUBLE) AS s,
                 CAST(sum(CAST(sv AS DECIMAL(28,6))) AS DOUBLE)
                     / count(sv) AS avg,
                 round(CAST(sum(CAST(sv AS DECIMAL(28,6))
                                * CAST(sv AS DECIMAL(28,6)))
                            AS DOUBLE), 4) AS sos
          FROM l2 GROUP BY by_type
        ), pipes2 AS (
          SELECT *,
                 greatest((n * sos - s * s) / (n * n), 0.0) AS var
          FROM pipes
        )
        SELECT CAST(1 AS INT) AS level, l1.by_type,
               CAST(NULL AS BIGINT) AS per_day, l1.dc AS doc_count,
               CAST(NULL AS DOUBLE) AS sv,
               p.p25 AS pb_p25_r6, p.p50 AS pb_p50_r6,
               p.p75 AS pb_p75_r6,
               p.n AS esb_count, p.mn AS esb_min, p.mx AS esb_max,
               p.s AS esb_sum, p.avg AS esb_avg, p.sos AS esb_sos,
               p.var AS esb_var, sqrt(p.var) AS esb_std,
               p.avg + 2.0 * sqrt(p.var) AS esb_std_upper,
               p.avg - 2.0 * sqrt(p.var) AS esb_std_lower
        FROM l1 JOIN pipes2 p USING (by_type)
        UNION ALL
        SELECT CAST(2 AS INT), by_type, per_day, dc, sv,
               NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
               NULL, NULL, NULL, NULL, NULL
        FROM l2
        ORDER BY level, by_type, per_day
    """

    # es_cumulative_cardinality (round 13): cum(k) = running sum of
    # per-bucket NEW values (each user counts at its first bucket) —
    # exact where ES merges HLL sketches; gap-filled hours carry the
    # running value forward via coalesce(nw, 0).
    q["es_cumulative_cardinality"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 CAST(count(DISTINCT user_id) AS DOUBLE) AS u
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(1703980800000, MIN(k)) AS lo,
                 GREATEST(1706742000000, MAX(k)) AS hi FROM b
        ),
        grid AS (
          SELECT unnest(range(lo, hi + 3600000, 3600000)) AS k FROM ext
        ),
        filled AS (
          SELECT g.k, coalesce(b.dc, 0) AS dc, b.u
          FROM grid g LEFT JOIN b ON g.k = b.k
        ),
        firsts AS (
          SELECT fk AS k, count(*) AS nw FROM (
            SELECT user_id,
                   min(epoch_ms(date_trunc('hour', ts))) AS fk
            FROM events
            WHERE coalesce(event_type = 'purchase', FALSE)
              AND ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id
          ) GROUP BY fk
        )
        SELECT CAST(1 AS INT) AS level, f.k AS per_hour,
               f.dc AS doc_count, f.u AS u,
               CAST(sum(coalesce(fs.nw, 0))
                    OVER (ORDER BY f.k) AS BIGINT) AS cum_u
        FROM filled f LEFT JOIN firsts fs ON f.k = fs.k
        ORDER BY per_hour
    """

    # es_significant_text (round 13): the corpus significant_terms
    # tree with the request's flat column names — long/long
    # divisions, the pinned JLH parenthesization, floored micro.
    q["es_significant_text"] = f"""
        WITH t AS (SELECT CASE WHEN coalesce(n_chars >= 400, FALSE)
                          THEN 1 ELSE 0 END AS fg,
                          list_distinct({_TOKS}) AS toks
                   FROM documents),
        sizes AS (SELECT CAST(sum(fg) AS BIGINT) AS fg_docs,
                         CAST(count(*) AS BIGINT) AS n_docs FROM t),
        terms AS (SELECT term,
                         CAST(sum(fg) AS BIGINT) AS fg_df,
                         CAST(count(*) AS BIGINT) AS df
                  FROM (SELECT fg, unnest(toks) AS term FROM t)
                  GROUP BY term HAVING sum(fg) >= 3)
        SELECT CAST(1 AS INT) AS level, term AS sig_words,
               fg_df AS doc_count, df AS bg_count,
               CAST(floor(1e6 * (((fg_df / fg_docs) - (df / n_docs))
                    * ((fg_df / fg_docs) / (df / n_docs)))) AS BIGINT)
                   AS score_micro
        FROM terms, sizes
        WHERE CAST(floor(1e6 * (((fg_df / fg_docs) - (df / n_docs))
                   * ((fg_df / fg_docs) / (df / n_docs)))) AS BIGINT) > 0
        ORDER BY score_micro DESC, sig_words ASC LIMIT 15
    """

    # es_string_stats_entropy (round 13): the char histogram is one
    # unnest(regexp_extract_all(v, '.')) + groupBy; entropy terms
    # follow the libm discipline — round(p*log2(p), 12) each, exact
    # decimal sum, 6dp output; charless buckets report 0.0 like ES.
    q["es_string_stats_entropy"] = """
        WITH d AS (
          SELECT event_type AS by_type, props AS v FROM events
          WHERE event_type IS NOT NULL
        ),
        stats AS (
          SELECT by_type, count(*) AS doc_count,
                 CAST(count(v) AS DOUBLE) AS props_stats_count,
                 CAST(min(length(v)) AS DOUBLE)
                   AS props_stats_min_length,
                 CAST(max(length(v)) AS DOUBLE)
                   AS props_stats_max_length,
                 CAST(sum(CAST(length(v) AS DECIMAL(18,6))) AS DOUBLE)
                     / count(v) AS props_stats_avg_length
          FROM d GROUP BY by_type
        ),
        ch AS (
          SELECT by_type, c, count(*) AS m FROM (
            SELECT by_type, unnest(regexp_extract_all(v, '.')) AS c
            FROM d WHERE v IS NOT NULL
          ) GROUP BY by_type, c
        ),
        ent AS (
          SELECT by_type,
                 round(CAST(-sum(CAST(round((m / n) * log2(m / n), 12)
                                      AS DECIMAL(18,12))) AS DOUBLE), 6)
                   AS props_stats_entropy
          FROM (SELECT by_type, m,
                       sum(m) OVER (PARTITION BY by_type) AS n FROM ch)
          GROUP BY by_type
        )
        SELECT CAST(1 AS INT) AS level, s.by_type, s.doc_count,
               props_stats_count, props_stats_min_length,
               props_stats_max_length, props_stats_avg_length,
               coalesce(e.props_stats_entropy, 0.0) AS props_stats_entropy
        FROM stats s LEFT JOIN ent e ON s.by_type = e.by_type
        ORDER BY s.by_type
    """

    # es_significant_terms_bgfilter (round 13): the background_filter
    # slice replaces count(*) with a second flag sum in both the
    # sizes row and the per-term counts; bands absent from the slice
    # drop (bg_count > 0 guard).
    q["es_significant_terms_bgfilter"] = """
        WITH d AS (
          SELECT CASE WHEN coalesce(value >= 120, FALSE)
                 THEN 1 ELSE 0 END AS fg,
                 CASE WHEN coalesce(value >= 40, FALSE)
                 THEN 1 ELSE 0 END AS bg,
                 'b' || CAST(CAST(floor(value / 50) AS INT) AS VARCHAR)
                     AS sig_band
          FROM events
        ),
        s AS (
          SELECT CAST(sum(fg) AS BIGINT) AS fgd,
                 CAST(sum(bg) AS BIGINT) AS nd
          FROM d
        ),
        c AS (
          SELECT sig_band,
                 CAST(sum(fg) AS BIGINT) AS doc_count,
                 CAST(sum(bg) AS BIGINT) AS bg_count
          FROM d WHERE sig_band IS NOT NULL
          GROUP BY sig_band
          HAVING sum(fg) >= 2 AND sum(bg) > 0
        ),
        j AS (
          SELECT sig_band, doc_count, bg_count,
                 CAST(floor(1e6 * (((doc_count / CAST(fgd AS DOUBLE))
                        - (bg_count / CAST(nd AS DOUBLE)))
                      * ((doc_count / CAST(fgd AS DOUBLE))
                         / (bg_count / CAST(nd AS DOUBLE)))))
                      AS BIGINT) AS score_micro
          FROM c, s
        )
        SELECT CAST(1 AS INT) AS level, sig_band, doc_count, bg_count,
               score_micro
        FROM j WHERE score_micro > 0
        ORDER BY score_micro DESC, sig_band ASC LIMIT 10
    """

    # es_frequent_item_sets (round 13): exact apriori — pair counts
    # over unpruned baskets equal the pruned counts for every
    # surviving pair (a pair with an infrequent member can't reach
    # min support), so the oracle skips the prune; ceil(ms·n) runs
    # in double in BOTH engines (the same representation artifacts).
    q["es_frequent_item_sets"] = """
        WITH b AS (
          SELECT l_orderkey AS k,
                 list_sort(list_distinct(list(p_brand))) AS items
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY l_orderkey
        ),
        n AS (SELECT count(*) AS nd FROM b),
        md AS (
          SELECT CAST(ceil(0.01 * nd) AS BIGINT) AS m, nd FROM n
        ),
        s1 AS (
          SELECT u AS items, 1 AS set_size, count(*) AS doc_count
          FROM (SELECT k, unnest(items) AS u FROM b) GROUP BY u
        ),
        p2 AS (
          SELECT i1 || '|' || i2 AS items, 2 AS set_size,
                 count(*) AS doc_count
          FROM (
            SELECT t.k, t.i1, unnest(t.items) AS i2 FROM (
              SELECT k, unnest(items) AS i1, items FROM b
            ) t
          ) WHERE i1 < i2 GROUP BY 1
        ),
        u AS (
          SELECT * FROM s1 UNION ALL SELECT * FROM p2
        )
        SELECT u.items, u.set_size, u.doc_count,
               round(u.doc_count / md.nd, 6) AS support_r6
        FROM u, md
        WHERE u.doc_count >= greatest(md.m, 1)
        ORDER BY u.doc_count DESC, u.items ASC LIMIT 40
    """

    # es_reverse_nested_aggs (round 13): parent-field sub-aggs under
    # reverse_nested — the oracle dedups (bucket, parent) pairs
    # before aggregating parent fields, exactly the representative-
    # row mask's semantics.
    q["es_reverse_nested_aggs"] = """
        WITH e AS (
          SELECT event_id, value, user_id,
                 CASE WHEN value >= 100 THEN list_value(
                        struct_pack(k := 'type', w := value),
                        struct_pack(k := 'band', w := value * 2.0))
                 ELSE list_value(struct_pack(k := 'type', w := value))
                 END AS attrs
          FROM events
        ),
        x AS (
          SELECT event_id, value, user_id, unnest(attrs) AS a FROM e
        ),
        pd AS (
          SELECT DISTINCT a.k AS by_k, event_id, value, user_id FROM x
        ),
        rn AS (
          SELECT by_k, CAST(count(*) AS DOUBLE) AS pdc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(value) AS pav,
                 CAST(count(DISTINCT user_id) AS DOUBLE) AS pnu
          FROM pd GROUP BY by_k
        ),
        l2 AS (
          SELECT a.k AS by_k, count(*) AS doc_count,
                 CAST(sum(CAST(a.w AS DECIMAL(18,6))) AS DOUBLE)
                     / count(a.w) AS avg_w
          FROM x GROUP BY a.k
        )
        SELECT CAST(1 AS INT) AS level, 'objs' AS objs,
               CAST(NULL AS VARCHAR) AS by_k,
               (SELECT count(*) FROM x) AS doc_count,
               CAST(NULL AS DOUBLE) AS avg_w,
               CAST(NULL AS DOUBLE) AS parents_doc_count,
               CAST(NULL AS DOUBLE) AS parents_avg_value,
               CAST(NULL AS DOUBLE) AS parents_n_users
        UNION ALL
        SELECT CAST(2 AS INT), 'objs', l2.by_k, l2.doc_count,
               l2.avg_w, rn.pdc, rn.pav, rn.pnu
        FROM l2 JOIN rn USING (by_k)
        ORDER BY level, by_k NULLS FIRST
    """

    # es_has_child / es_has_parent / es_children_agg (round 13): the
    # join-field family over the natural orders↔lineitem pair.
    # es_has_child_inner_hits (round 14, closing PARITY #23's
    # inner_hits bound): per qualifying order (>= 2 returned items),
    # its two highest-value returned line items under the section's
    # explicit sort.
    q["es_has_child_inner_hits"] = """
        WITH matched AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity
          FROM lineitem WHERE coalesce(l_returnflag = 'R', FALSE)
        ),
        keep AS (
          SELECT l_orderkey FROM matched
          GROUP BY l_orderkey HAVING count(*) >= 2
        ),
        ranked AS (
          SELECT m.*, CAST(row_number() OVER (
                     PARTITION BY m.l_orderkey
                     ORDER BY l_extendedprice DESC, l_linenumber ASC)
                 AS INT) AS top_returns_rank
          FROM matched m JOIN keep USING (l_orderkey)
        )
        SELECT l_orderkey, top_returns_rank, l_linenumber,
               l_extendedprice, l_quantity
        FROM ranked WHERE top_returns_rank <= 2
        ORDER BY l_orderkey, top_returns_rank
    """

    # es_has_parent_inner_hits (round 14, PARITY #23): each urgent
    # order's line items with the parent's columns spliced on — a
    # child has exactly one parent, so the section is one equi-join.
    q["es_has_parent_inner_hits"] = """
        SELECT l_orderkey, l_linenumber, l_quantity,
               o_orderpriority AS order_o_orderpriority,
               o_totalprice AS order_o_totalprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE coalesce(o_orderpriority = '1-URGENT', FALSE)
        ORDER BY l_orderkey, l_linenumber
    """

    q["es_has_child"] = """
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders o JOIN (
          SELECT l_orderkey FROM lineitem
          WHERE coalesce(l_returnflag = 'R', FALSE)
            AND l_orderkey IS NOT NULL
          GROUP BY l_orderkey HAVING count(*) >= 2
        ) c ON o.o_orderkey = c.l_orderkey
        ORDER BY o.o_orderkey
    """
    q["es_has_parent"] = """
        SELECT l.l_orderkey, l.l_linenumber, l.l_quantity
        FROM lineitem l
        WHERE l.l_orderkey IN (
          SELECT o_orderkey FROM orders
          WHERE coalesce(o_orderpriority = '1-URGENT', FALSE)
            AND o_orderkey IS NOT NULL
        )
        ORDER BY l.l_orderkey, l.l_linenumber
    """
    q["es_children_agg"] = """
        WITH p AS (
          SELECT o_orderpriority AS by_priority,
                 count(*) AS doc_count
          FROM orders WHERE o_orderpriority IS NOT NULL
          GROUP BY 1
        ),
        c AS (
          SELECT o.o_orderpriority AS by_priority,
                 count(*) AS items_doc_count,
                 CAST(sum(CAST(l.l_quantity AS DECIMAL(18,6)))
                      AS DOUBLE) AS sum_qty,
                 CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,6)))
                      AS DOUBLE) / count(l.l_extendedprice)
                     AS avg_price
          FROM lineitem l JOIN orders o
            ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderpriority IS NOT NULL
            AND o.o_orderkey IS NOT NULL
          GROUP BY 1
        )
        SELECT CAST(1 AS INT) AS level, p.by_priority, p.doc_count,
               coalesce(c.items_doc_count, 0) AS items_doc_count,
               c.sum_qty, c.avg_price
        FROM p LEFT JOIN c USING (by_priority)
        ORDER BY by_priority
    """

    # es_transform_latest (round 13): the latest transform — per
    # user the most recent event under (ts desc, event_id desc);
    # the tiebreak makes the pick engine-independent.
    q["es_transform_latest"] = """
        SELECT user_id, ts, event_id, event_type, value, props FROM (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
          WHERE user_id IS NOT NULL AND ts IS NOT NULL
            AND event_id IS NOT NULL
        ) WHERE rn = 1 ORDER BY user_id
    """

    # es_string_stats_distribution (round 13): the per-char
    # probability map as rows — the entropy oracle's char histogram,
    # each char's count over the bucket total (long/long → double).
    q["es_string_stats_distribution"] = """
        WITH d AS (
          SELECT event_type AS by_type, props AS v FROM events
          WHERE event_type IS NOT NULL
        ),
        parents AS (
          SELECT by_type, count(*) AS doc_count FROM d GROUP BY 1
        ),
        ch AS (
          SELECT by_type, c, count(*) AS m FROM (
            SELECT by_type, unnest(regexp_extract_all(v, '.')) AS c
            FROM d WHERE v IS NOT NULL
          ) GROUP BY by_type, c
        )
        SELECT CAST(1 AS INT) AS level, p.by_type, p.doc_count,
               ch.c AS props_stats_char,
               CAST(ch.m AS DOUBLE) AS props_stats_char_count,
               round(ch.m / sum(ch.m) OVER (PARTITION BY ch.by_type),
                     6) AS props_stats_prob_r6
        FROM ch JOIN parents p USING (by_type)
        ORDER BY by_type, props_stats_char
    """

    # es_diversified_sampler (round 13): the per-user cap is one
    # field-partitioned row_number (missing user_id never
    # deduplicated), the sample the global top-200 under the
    # explicit (value desc nulls-last, event_id asc) order — a total
    # order, so the cut is deterministic; sub-aggs run over it.
    q["es_diversified_sampler"] = """
        WITH ranked AS (
          SELECT *, row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY value DESC NULLS LAST, event_id ASC) AS r
          FROM events
        ),
        base AS (
          SELECT * FROM ranked WHERE user_id IS NULL OR r <= 2
        ),
        sample AS (
          SELECT * FROM base
          ORDER BY value DESC NULLS LAST, event_id ASC LIMIT 200
        )
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_value
        FROM sample WHERE event_type IS NOT NULL
        GROUP BY event_type
        ORDER BY by_type
    """

    # es_matrix_stats (round 12): the extended_stats discipline for
    # pairs — exact decimal Σx/Σy, product sums rounded at 4dp after
    # the double cast, population var/cov from the fixed tree,
    # corr = cov / sqrt(vx * vy) (NULL on zero variance).
    q["es_matrix_stats"] = """
        WITH e AS (
          SELECT event_type, value,
                 value * 0.5 + CAST(event_id % 97 AS DOUBLE) AS v2
          FROM events WHERE event_type IS NOT NULL
        ),
        m AS (
          SELECT event_type,
                 count(*) AS n_all,
                 count(CASE WHEN value IS NOT NULL AND v2 IS NOT NULL
                       THEN 1 END) AS n,
                 round(CAST(sum(CASE WHEN value IS NOT NULL
                     AND v2 IS NOT NULL
                     THEN CAST(value AS DECIMAL(18,6)) END)
                     AS DOUBLE), 4) AS sx,
                 round(CAST(sum(CASE WHEN value IS NOT NULL
                     AND v2 IS NOT NULL
                     THEN CAST(v2 AS DECIMAL(18,6)) END)
                     AS DOUBLE), 4) AS sy,
                 round(CAST(sum(CASE WHEN value IS NOT NULL
                     AND v2 IS NOT NULL
                     THEN CAST(value AS DECIMAL(18,6))
                          * CAST(value AS DECIMAL(18,6)) END)
                     AS DOUBLE), 4) AS sxx,
                 round(CAST(sum(CASE WHEN value IS NOT NULL
                     AND v2 IS NOT NULL
                     THEN CAST(v2 AS DECIMAL(18,6))
                          * CAST(v2 AS DECIMAL(18,6)) END)
                     AS DOUBLE), 4) AS syy,
                 round(CAST(sum(CASE WHEN value IS NOT NULL
                     AND v2 IS NOT NULL
                     THEN CAST(value AS DECIMAL(18,6))
                          * CAST(v2 AS DECIMAL(18,6)) END)
                     AS DOUBLE), 4) AS sxy
          FROM e GROUP BY event_type
        ),
        v AS (
          SELECT event_type, n_all, n, sx, sy,
                 greatest((CAST(n AS DOUBLE) * sxx - sx * sx)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)),
                          0.0) AS vx,
                 greatest((CAST(n AS DOUBLE) * syy - sy * sy)
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)),
                          0.0) AS vy,
                 (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov
          FROM m
        )
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               n_all AS doc_count,
               CAST(n AS DOUBLE) AS mx_count,
               round(sx / n, 6) AS mx_value_mean_r6,
               round(vx, 6) AS mx_value_var_r6,
               round(sy / n, 6) AS mx_v2_mean_r6,
               round(vy, 6) AS mx_v2_var_r6,
               round(cov, 6) AS mx_value_v2_cov_r6,
               round(CASE WHEN vx > 0 AND vy > 0
                     THEN cov / sqrt(vx * vy) END, 6)
                   AS mx_value_v2_corr_r6
        FROM v ORDER BY by_type
    """

    # es_adjacency_matrix (round 12): filter cohorts + pair
    # intersections via unnest of the matching-keys list (pairs in
    # alphabetical order, '&'-joined); percentile_ranks = the exact
    # empirical CDF percent, 100*count(v<=t)/count(v) rounded 6dp.
    q["es_adjacency_matrix"] = """
        WITH p AS (
          SELECT value,
                 coalesce(event_type = 'error', FALSE) AS f_err,
                 coalesce(value >= 200, FALSE) AS f_big,
                 coalesce(ts >= TIMESTAMP '2024-01-20 00:00:00', FALSE)
                     AS f_late
          FROM events
        ),
        x AS (
          SELECT value, unnest(list_filter([
              CASE WHEN f_big THEN 'big' END,
              CASE WHEN f_err THEN 'err' END,
              CASE WHEN f_late THEN 'late' END,
              CASE WHEN f_big AND f_err THEN 'big&err' END,
              CASE WHEN f_big AND f_late THEN 'big&late' END,
              CASE WHEN f_err AND f_late THEN 'err&late' END
            ], y -> y IS NOT NULL)) AS adj
          FROM p
        )
        SELECT CAST(1 AS INT) AS level, adj, count(*) AS doc_count,
               round(100.0 * count(CASE WHEN value <= 100 THEN 1 END)
                     / count(value), 6) AS pranks_pr0_r6,
               round(100.0 * count(CASE WHEN value <= 250 THEN 1 END)
                     / count(value), 6) AS pranks_pr1_r6
        FROM x GROUP BY adj ORDER BY adj
    """

    # es_gapfill_moving_fn (round 12): the SAME filled grid, then the
    # positional pipelines AS WINDOWS OVER THE GRID — empty hours
    # occupy positions, their NULL sums drop from the aggregates
    # (gap_policy 'skip'); moving sum through DECIMAL(28,6) like the
    # Spark window, serial_diff = value − lag-1 position's value.
    q["es_gapfill_moving_fn"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(1703980800000, MIN(k)) AS lo,
                 GREATEST(1706742000000, MAX(k)) AS hi FROM b
        ),
        grid AS (
          SELECT unnest(range(lo, hi + 3600000, 3600000)) AS k FROM ext
        ),
        filled AS (
          SELECT g.k, coalesce(b.dc, 0) AS dc, b.s
          FROM grid g LEFT JOIN b ON g.k = b.k
        )
        SELECT CAST(1 AS INT) AS level, k AS per_hour,
               dc AS doc_count, s AS sum_value,
               CAST(sum(CAST(s AS DECIMAL(28,6))) OVER
                    (ORDER BY k ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS mov3,
               CAST(s - lag(s) OVER (ORDER BY k) AS DOUBLE) AS diff1
        FROM filled ORDER BY per_hour
    """

    # es_moving_fn_extended (round 13, VERDICT r12 Next #5): the
    # widened MovingFunctions set over the gap-filled hourly grid.
    # stdDev = the extended_stats moment discipline in a trailing
    # window (decimal sums, 4dp double casts, clamped population
    # tree, 6dp output); linearWeightedAvg / ewma fold the window's
    # non-NULL values in order (list_filter + list_transform /
    # list_reduce mirror Spark's collect_list + aggregate), the
    # per-step IEEE ops spelled identically.
    q["es_moving_fn_extended"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('hour', ts)) AS k, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(1703980800000, MIN(k)) AS lo,
                 GREATEST(1706742000000, MAX(k)) AS hi FROM b
        ),
        grid AS (
          SELECT unnest(range(lo, hi + 3600000, 3600000)) AS k FROM ext
        ),
        filled AS (
          SELECT g.k, coalesce(b.dc, 0) AS dc, b.s
          FROM grid g LEFT JOIN b ON g.k = b.k
        ),
        win AS (
          SELECT k, dc, s,
                 CAST(count(s) OVER mw AS DOUBLE) AS n_d,
                 CAST(sum(CAST(s AS DECIMAL(28,6))) OVER mw AS DOUBLE)
                   AS sx,
                 round(CAST(sum(CAST(s AS DECIMAL(19,6))
                                * CAST(s AS DECIMAL(19,6))) OVER mw
                            AS DOUBLE), 4) AS sxx,
                 list_filter(list(s) OVER mw, x -> x IS NOT NULL)
                   AS vals
          FROM filled
          WINDOW mw AS (ORDER BY k
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        )
        SELECT CAST(1 AS INT) AS level, k AS per_hour,
               dc AS doc_count, s AS sum_value,
               round(sqrt(greatest((n_d * sxx - sx * sx) / (n_d * n_d),
                                   0.0)), 6) AS mstd,
               CASE WHEN len(vals) > 0 THEN
                 round(round(CAST(list_reduce(
                         list_transform(vals,
                           (x, i) -> CAST(x AS DECIMAL(18,6)) * i),
                         (a, v) -> a + v) AS DOUBLE), 4)
                       / (len(vals) * (len(vals) + 1) / 2), 6)
               END AS lwa,
               CASE WHEN len(vals) > 0 THEN
                 round(list_reduce(vals,
                         (a, v) -> (v * 0.3) + (a * 0.7)), 6)
               END AS ew,
               CASE WHEN len(vals) > 0 THEN
                 list_transform(
                   [{'s': vals[1], 'b': CAST(0.0 AS DOUBLE)}], a1 ->
                   list_transform([{
                     's': CASE WHEN len(vals) >= 2
                          THEN vals[2] * CAST(0.3 AS DOUBLE)
                               + (a1.s + a1.b) * CAST(0.7 AS DOUBLE)
                          ELSE a1.s END,
                     'b': CASE WHEN len(vals) >= 2
                          THEN (vals[2] * CAST(0.3 AS DOUBLE)
                                + (a1.s + a1.b) * CAST(0.7 AS DOUBLE)
                                - a1.s) * CAST(0.1 AS DOUBLE)
                               + a1.b * CAST(0.9 AS DOUBLE)
                          ELSE a1.b END}], a2 ->
                   list_transform([{
                     's': CASE WHEN len(vals) >= 3
                          THEN vals[3] * CAST(0.3 AS DOUBLE)
                               + (a2.s + a2.b) * CAST(0.7 AS DOUBLE)
                          ELSE a2.s END,
                     'b': CASE WHEN len(vals) >= 3
                          THEN (vals[3] * CAST(0.3 AS DOUBLE)
                                + (a2.s + a2.b) * CAST(0.7 AS DOUBLE)
                                - a2.s) * CAST(0.1 AS DOUBLE)
                               + a2.b * CAST(0.9 AS DOUBLE)
                          ELSE a2.b END}], a3 ->
                   list_transform([{
                     's': CASE WHEN len(vals) >= 4
                          THEN vals[4] * CAST(0.3 AS DOUBLE)
                               + (a3.s + a3.b) * CAST(0.7 AS DOUBLE)
                          ELSE a3.s END,
                     'b': CASE WHEN len(vals) >= 4
                          THEN (vals[4] * CAST(0.3 AS DOUBLE)
                                + (a3.s + a3.b) * CAST(0.7 AS DOUBLE)
                                - a3.s) * CAST(0.1 AS DOUBLE)
                               + a3.b * CAST(0.9 AS DOUBLE)
                          ELSE a3.b END}], a4 ->
                     a4.s)[1])[1])[1])[1]
               END AS ho
        FROM win ORDER BY per_hour
    """

    # es_date_histogram_gapfill_month: the variable-width calendar
    # grid — months enumerate by INTERVAL 1 MONTH generate_series in
    # both engines; bounds truncate onto month starts; synthesized
    # rows carry doc_count 0 / NULL metrics like the hourly fill.
    q["es_date_histogram_gapfill_month"] = """
        WITH b AS (
          SELECT epoch_ms(date_trunc('month', ts)) AS k, count(*) AS dc,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s
          FROM events
          WHERE coalesce(event_type = 'purchase', FALSE)
            AND ts IS NOT NULL
          GROUP BY 1
        ),
        ext AS (
          SELECT LEAST(TIMESTAMP '2023-07-01',
                       make_timestamp(MIN(k) * 1000)) AS lo,
                 GREATEST(TIMESTAMP '2024-06-01',
                          make_timestamp(MAX(k) * 1000)) AS hi
          FROM b
        ),
        grid AS (
          SELECT epoch_ms(unnest(generate_series(
                   lo, hi, INTERVAL 1 MONTH))) AS k FROM ext
        )
        SELECT CAST(1 AS INT) AS level, g.k AS per_month,
               coalesce(b.dc, 0) AS doc_count, b.s AS sum_value
        FROM grid g LEFT JOIN b ON g.k = b.k
        ORDER BY per_month
    """

    # es_filters_agg: named filters buckets (a doc may land in both —
    # explode semantics). Buckets that match zero docs are NOT emitted
    # (consistent with the no-empty-bucket-synthesis rule), hence the
    # HAVING guard on each arm.
    q["es_filters_agg"] = """
        SELECT CAST(1 AS INT) AS level, 'big_value' AS segment,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_value
        FROM events WHERE coalesce(value >= 150, FALSE)
        HAVING count(*) > 0
        UNION ALL
        SELECT CAST(1 AS INT), 'errors', count(*),
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value)
        FROM events WHERE coalesce(event_type = 'error', FALSE)
        HAVING count(*) > 0
        ORDER BY segment
    """

    # es_composite_page: after-key pagination — the cursor is a row-
    # value comparison applied BEFORE the groupBy on both engines
    # (ES's early-termination shape), keys unique so LIMIT is exact.
    # es_composite_missing (round 14): missing_bucket keeps NULL
    # keys (sorted FIRST — spelled NULLS FIRST for DuckDB, Spark's
    # asc default) and the after cursor carries null for the terms
    # source: strictly-after = non-null type, OR null type past the
    # cursor's band.
    q["es_composite_missing"] = """
        WITH d AS (
          SELECT CASE WHEN value >= 15 THEN event_type END AS ty,
                 floor(value / 100) * 100 AS band, value
          FROM events
        )
        SELECT ty, band, count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_value
        FROM d
        WHERE (ty IS NOT NULL) OR (ty IS NULL AND band > 0.0)
        GROUP BY ty, band
        ORDER BY ty ASC NULLS FIRST, band ASC LIMIT 6
    """

    q["es_composite_page"] = """
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
               count(*) AS doc_count,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                   / count(o_totalprice) AS avg_price
        FROM orders
        WHERE (o_orderpriority, o_orderstatus) > ('2-HIGH', 'F')
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 5
    """

    # es_composite_datehist: composite paging over a (day grid ×
    # event_type) source pair — the date_histogram source key is the
    # same epoch-millis floor compile_aggs uses; the after tuple
    # compares BEFORE the groupBy on both engines.
    q["es_composite_datehist"] = """
        WITH leaf AS (
          SELECT CAST(floor(epoch_ms(ts) / 86400000.0) * 86400000
                      AS BIGINT) AS day,
                 event_type AS etype, value
          FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        )
        SELECT day, etype, count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM leaf
        WHERE (day, etype) > (1704412800000, 'error')
        GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 20
    """

    # es_compound_filter (round 15): the compound scoring wrappers'
    # filter-context reductions — dis_max = NULL-safe OR of its
    # queries, constant_score = its filter, boosting = its positive
    # clause (under must_not here) — spelled as the identical
    # COALESCE tree.
    q["es_compound_filter"] = """
        SELECT event_id, event_type, value, user_id FROM events
        WHERE (coalesce(event_type = 'click', FALSE)
               OR coalesce(value >= 900, FALSE))
          AND value >= 10
          AND NOT coalesce(user_id = 13, FALSE)
        ORDER BY event_id ASC LIMIT 150
    """

    # es_function_score (round 17, PARITY #43): the wrappers reduce
    # to their inner queries in filter context — the oracle IS the
    # reduction (function filters gate score functions, never the
    # matched set; the Painless body is score-only).
    q["es_function_score"] = """
        SELECT event_id, event_type, value, user_id FROM events
        WHERE (coalesce(event_type = 'click', FALSE)
               OR coalesce(value >= 800, FALSE))
          AND NOT coalesce(user_id = 13, FALSE)
        ORDER BY event_id ASC LIMIT 150
    """

    # es_simple_query_string (round 15): '(merge | vector) + scan* )
    # -"slow join"' under the lenient left-to-right fold — the
    # unmatched ')' drops, the trailing-* is a token prefix, the
    # negated phrase ORs in as "all docs not matching" (the Lucene
    # SimpleQueryParser quirk, documented in the parser docstring).
    q["es_simple_query_string"] = r"""
        WITH d AS (
          SELECT doc_id, lang, n_chars, text,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        )
        SELECT doc_id, lang, n_chars FROM d
        WHERE ((coalesce(list_contains(toks, 'merge'), FALSE)
                OR coalesce(list_contains(toks, 'vector'), FALSE))
               AND coalesce(
                   len(list_filter(toks, t -> t LIKE 'scan%')) > 0,
                   FALSE))
           OR NOT coalesce(
                  regexp_matches(text, '(^|\s)slow\s+join(\s|$)'),
                  FALSE)
        ORDER BY doc_id LIMIT 150
    """

    # es_match_prefix (round 15): match_phrase_prefix = the phrase
    # regexp with NO trailing boundary on the last token;
    # match_bool_prefix (operator and) = full-token containment plus
    # a token-prefix exists; per-arm size before the tagged union.
    q["es_match_prefix"] = r"""
        WITH d AS (
          SELECT doc_id, text,
                 regexp_split_to_array(trim(text), '\s+') AS toks
          FROM documents
        )
        SELECT * FROM (
          SELECT doc_id, 'phrase_prefix' AS form FROM d
          WHERE regexp_matches(text, '(^|\s)slow\s+jo')
          ORDER BY doc_id LIMIT 100
        )
        UNION ALL
        SELECT * FROM (
          SELECT doc_id, 'bool_prefix' AS form FROM d
          WHERE list_contains(toks, 'merge')
            AND len(list_filter(toks, t -> t LIKE 'vec%')) > 0
          ORDER BY doc_id LIMIT 100
        )
        ORDER BY form, doc_id
    """

    # es_ip_range (round 15): the synthesized dotted-quad column
    # converts through the IDENTICAL octet-split long tree (TRY_CAST
    # mirrors try_cast); the /9 term filter and the band CASE chain
    # use the normalized numeric bounds (mask 10.0.0.0/10 =
    # [167772160, 171966464), from/to bands from the same
    # _ip_to_long arithmetic); avg through the exact-decimal tree.
    q["es_ip_range"] = """
        WITH e AS (
          SELECT value,
                 '10.' || CAST((user_id % 4) * 64 AS INT)
                 || '.' || CAST(user_id % 256 AS INT)
                 || '.' || CAST(event_id % 256 AS INT) AS ip,
                 -- round 17: the v6 term 2001:db8::/108 over
                 -- ip6 = '2001:db8::' || hex(u%256) || ':' ||
                 -- hex(ev%256) (lo = (u%256)<<16 | ev%256) keeps
                 -- exactly u%256 < 16 — the oracle spells the
                 -- SEMANTICS; the engine parses the ::-compressed
                 -- strings through the biased hi/lo tree
                 user_id % 256 <= 15 AS v6ok
          FROM events
        ),
        n AS (
          SELECT value, v6ok,
                 TRY_CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
               + TRY_CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
               + TRY_CAST(string_split(ip, '.')[3] AS BIGINT) * 256
               + TRY_CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
          FROM e
        ),
        b AS (
          SELECT value,
                 CASE
                   WHEN ipn >= 167772160 AND ipn < 171966464
                     THEN '10.0.0.0/10'
                   WHEN ipn >= 171966464 AND ipn < 171999232
                     THEN '10.64.0.0-10.64.128.0'
                   WHEN ipn >= 171999232 THEN '10.64.128.0-*'
                 END AS bands
          FROM n
          WHERE coalesce(ipn >= 167772160 AND ipn < 176160768, FALSE)
            AND v6ok
        )
        SELECT CAST(1 AS INT) AS level, bands, count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_v
        FROM b WHERE bands IS NOT NULL
        GROUP BY bands ORDER BY bands
    """

    # es_ip_prefix (round 16): the /10 subnet rollup — the same
    # octet-split long tree as es_ip_range, network base recovered by
    # integer floor/mod arithmetic (width 2^22 = 4194304), key as the
    # dotted quad + '/10'.
    q["es_ip_prefix"] = """
        WITH e AS (
          SELECT value,
                 '10.' || CAST((user_id % 4) * 64 AS INT)
                 || '.' || CAST(user_id % 256 AS INT)
                 || '.' || CAST(event_id % 256 AS INT) AS ip
          FROM events
        ),
        n AS (
          SELECT value,
                 TRY_CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216
               + TRY_CAST(string_split(ip, '.')[2] AS BIGINT) * 65536
               + TRY_CAST(string_split(ip, '.')[3] AS BIGINT) * 256
               + TRY_CAST(string_split(ip, '.')[4] AS BIGINT) AS ipn
          FROM e
        ),
        b AS (
          SELECT value,
                 CAST(floor(ipn / 4194304) AS BIGINT) * 4194304 AS base
          FROM n WHERE ipn IS NOT NULL
        )
        SELECT CAST(1 AS INT) AS level,
               CAST(CAST(floor(base / 16777216) AS BIGINT) % 256
                    AS VARCHAR)
               || '.' || CAST(CAST(floor(base / 65536) AS BIGINT) % 256
                              AS VARCHAR)
               || '.' || CAST(CAST(floor(base / 256) AS BIGINT) % 256
                              AS VARCHAR)
               || '.' || CAST(CAST(floor(base / 1) AS BIGINT) % 256
                              AS VARCHAR)
               || '/10' AS subnets,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_v
        FROM b GROUP BY subnets ORDER BY subnets
    """

    # esql_values_top (round 16): VALUES = sorted distinct set
    # (string-joined for the hash), TOP∘MV_SUM = sum of the 3
    # largest per group (tie-insensitive — the top-3 MULTISET is
    # unique even when tied rows are not).
    q["esql_values_top"] = """
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(floor(value * 100) AS BIGINT) AS cents
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
        ), k AS (
          SELECT user_id,
                 array_to_string(list_sort(list(DISTINCT event_type)),
                                 '|') AS kinds,
                 count(*) AS n
          FROM e GROUP BY user_id
        ), r AS (
          SELECT user_id, cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY cents DESC) AS rk
          FROM e
        ), t AS (
          SELECT user_id, CAST(sum(cents) AS DOUBLE) AS top3_cents
          FROM r WHERE rk <= 3 GROUP BY user_id
        )
        SELECT k.user_id AS user, kinds, top3_cents, n
        FROM k JOIN t ON k.user_id = t.user_id
        ORDER BY user LIMIT 100
    """

    # es_intervals (round 16): the ordered max_gaps chain over
    # 1-based token positions (greedy-minimal next-position steps —
    # the corpus_span_near spelling: L-1+max_gaps = 3), the any_of
    # leaves as token-LIKE existence tests, msm-1 counted should.
    q["es_intervals"] = """
        WITH t AS (
          SELECT doc_id, n_chars, string_split(text, ' ') AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, n_chars, t,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'fast'] AS p1,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'table'] AS p2,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'slow'] AS p4,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'scan'] AS p5
          FROM t
        )
        SELECT doc_id, n_chars FROM pos
        WHERE len(list_filter(p1, p ->
                coalesce(list_min(list_filter(p2, q2 -> q2 > p)) - p
                         <= 3, FALSE))) > 0
          AND len(list_filter(p4, p ->
                coalesce(list_min(list_filter(p5, q5 -> q5 > p))
                         - p - 1 <= 10, FALSE))) > 0
          AND (len(list_filter(t, x -> x LIKE 'wind%')) > 0
               OR len(list_filter(t, x -> x LIKE 'mer_e')) > 0)
        ORDER BY doc_id LIMIT 120
    """

    # es_geo_grid (round 16): tile membership = the identical
    # Web-Mercator tree at zoom 2 (scale 4.0, clamp 3), the
    # 12-decimal rounding before the floor removing the cross-engine
    # tan/ln ulp boundary risk.
    q["es_geo_grid"] = """
        WITH g AS (
          SELECT event_id, value, value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        ),
        t AS (
          SELECT event_id, value,
                 greatest(0, least(CAST(floor((lon + 180.0) / 360.0 * 4.0)
                                   AS BIGINT), 3)) AS tx,
                 greatest(0, least(CAST(floor(round(
                     (1.0 - ln(tan(radians(greatest(-85.05112878,
                                  least(85.05112878, lat))))
                               + 1.0 / cos(radians(greatest(-85.05112878,
                                  least(85.05112878, lat)))))
                            / pi()) / 2.0 * 4.0, 12)) AS BIGINT), 3)) AS ty
          FROM g
          WHERE lat IS NOT NULL AND lon IS NOT NULL
            AND lat >= -90.0 AND lat <= 90.0
            AND lon >= -180.0 AND lon <= 180.0
        )
        SELECT event_id, value FROM t WHERE tx = 2 AND ty = 1
        ORDER BY event_id LIMIT 150
    """

    # es_match_fuzzy (round 16): per-token classic levenshtein
    # within AUTO edits (len-4 query terms -> 1), the length-delta
    # prefilter spelled identically; both terms must land (operator
    # and).
    q["es_match_fuzzy"] = """
        WITH t AS (
          SELECT doc_id, lang, string_split(text, ' ') AS t
          FROM documents
        )
        SELECT doc_id, lang FROM t
        WHERE len(list_filter(t, x -> abs(length(x) - 4) <= 1
                                  AND levenshtein(x, 'merg') <= 1)) > 0
          AND len(list_filter(t, x -> abs(length(x) - 4) <= 1
                                  AND levenshtein(x, 'tabl') <= 1)) > 0
        ORDER BY doc_id LIMIT 150
    """

    # es_span_queries (round 16): span_near = the ordered greedy
    # chain (1-based positions, L-1+slop = 3); span_first = first
    # occurrence within the first 5 positions; span_or = token
    # containment OR; msm-1 counted should.
    q["es_span_queries"] = """
        WITH t AS (
          SELECT doc_id, lang, string_split(text, ' ') AS t
          FROM documents
        ),
        pos AS (
          SELECT doc_id, lang, t,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'fast'] AS p1,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'table'] AS p2,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'slow'] AS ps,
                 [x FOR x IN range(1, len(t) + 1)
                    IF t[x] = 'scan'] AS p3
          FROM t
        )
        SELECT doc_id, lang FROM pos
        WHERE len(list_filter(p1, p ->
                coalesce(list_min(list_filter(p2, q2 -> q2 > p)) - p
                         <= 3, FALSE))) > 0
          AND len(list_filter(p1, p ->
                len(list_filter(ps, q3 ->
                    q3 >= p AND q3 <= p + 2)) = 0)) > 0
          AND (CAST(list_position(t, 'merge') BETWEEN 1 AND 5
                    AS INT)
               + CAST(coalesce(list_contains(t, 'window'), FALSE)
                      OR coalesce(list_contains(t, 'vector'), FALSE)
                      AS INT)
               + CAST(len(list_filter(p1, p ->
                     coalesce(list_min(list_filter(p2, q2 -> q2 > p))
                              - p <= 3, FALSE)
                     AND len(list_filter(p3, q4 ->
                         q4 >= p AND q4 <=
                         list_min(list_filter(p2, q2 -> q2 > p))
                       )) > 0)) > 0 AS INT)) >= 1
        ORDER BY doc_id LIMIT 150
    """

    # es_terms_lookup (round 16): the VIP-list membership — the
    # oracle spells the fetched-array semantics as the equivalent
    # IN-subquery over the same segments rollup.
    q["es_terms_lookup"] = """
        SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        WHERE c_nationkey IN (
          SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        ORDER BY c_custkey LIMIT 150
    """

    # es_combined_features (round 16): combined_fields is the
    # term-centric fold — each term tests containment in the text OR
    # source token arrays, at least 2 of 3 terms must land
    # (minimum_should_match); rank_feature reduces to the exists()
    # filter meaning (doc_id % 7 != 0 rows carry the feature);
    # distance_feature's field is never NULL so its exists() is
    # vacuous (scoring-only, the PARITY #37 reduction).
    q["es_combined_features"] = """
        WITH d AS (
          SELECT doc_id, source, n_chars,
                 string_split(text, ' ') AS toks,
                 string_split(source, ' ') AS stoks
          FROM documents
        ), m AS (
          SELECT doc_id, source, n_chars,
                 CAST(coalesce(list_contains(toks, 'merge'), FALSE)
                      OR coalesce(list_contains(stoks, 'merge'), FALSE)
                      AS INT)
               + CAST(coalesce(list_contains(toks, 'src3'), FALSE)
                      OR coalesce(list_contains(stoks, 'src3'), FALSE)
                      AS INT)
               + CAST(coalesce(list_contains(toks, 'window'), FALSE)
                      OR coalesce(list_contains(stoks, 'window'), FALSE)
                      AS INT) AS hits
          FROM d
        )
        SELECT doc_id, source, n_chars FROM m
        WHERE hits >= 2 AND doc_id % 7 != 0
        ORDER BY doc_id LIMIT 200
    """

    # es_random_sampler (round 16): the deterministic 25% sample via
    # the portable md5 bucket (the es_terms_partition spelling),
    # terms sub-agg over the sample, doc_count scaled by 1/0.25 with
    # ES's rounding, avg unscaled.
    q["es_random_sampler"] = """
        WITH h AS (
          SELECT event_type, value,
                 md5('42:' || CAST(event_id AS VARCHAR)) AS hh
          FROM events
        ), dig AS (
          SELECT event_type, value,
                 (ascii(substr(hh,1,1)) - CASE WHEN ascii(substr(hh,1,1)) >= 97 THEN 87 ELSE 48 END) * 4096
               + (ascii(substr(hh,2,1)) - CASE WHEN ascii(substr(hh,2,1)) >= 97 THEN 87 ELSE 48 END) * 256
               + (ascii(substr(hh,3,1)) - CASE WHEN ascii(substr(hh,3,1)) >= 97 THEN 87 ELSE 48 END) * 16
               + (ascii(substr(hh,4,1)) - CASE WHEN ascii(substr(hh,4,1)) >= 97 THEN 87 ELSE 48 END) AS v
          FROM h
        )
        SELECT CAST(1 AS INT) AS level, event_type AS types,
               CAST(round(count(*) / 0.25) AS BIGINT) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_v
        FROM dig WHERE v % 10000 < 2500 AND event_type IS NOT NULL
        GROUP BY event_type ORDER BY types
    """

    # es_terms_set (round 15): at least `req` of the literal terms in
    # the per-doc tags array — list_intersect mirrors Spark's
    # set-semantics array_intersect over the identically synthesized
    # array.
    q["es_terms_set"] = """
        WITH e AS (
          SELECT event_id, event_type, value,
                 CAST(event_id % 2 + 1 AS INT) AS req,
                 list_value(
                   event_type,
                   'b' || CAST(CAST(floor(value / 100) AS INT)
                               AS VARCHAR)
                 ) AS tags
          FROM events
        )
        SELECT event_id, event_type, value, req FROM e
        WHERE len(list_intersect(tags, ['click', 'error', 'b2'])) >= req
        ORDER BY event_id LIMIT 120
    """

    # es_composite_geotile (round 15): page 2 of the zoom-6 tile walk
    # — the IDENTICAL Web-Mercator tree as es_geotile_grid (the one
    # key expression), the after cursor a string compare applied
    # BEFORE the group, avg through the exact-decimal tree.
    q["es_composite_geotile"] = """
        WITH g AS (
          SELECT value, value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        ),
        t AS (
          SELECT value,
                 '6/' || CAST(greatest(0, least(
                     CAST(floor((lon + 180.0) / 360.0 * 64.0) AS BIGINT),
                     63)) AS VARCHAR)
                 || '/' || CAST(greatest(0, least(CAST(floor(round(
                     (1.0 - ln(tan(radians(greatest(-85.05112878,
                                  least(85.05112878, lat))))
                               + 1.0 / cos(radians(greatest(-85.05112878,
                                  least(85.05112878, lat)))))
                            / pi()) / 2.0 * 64.0, 12)) AS BIGINT),
                     63)) AS VARCHAR) AS tile
          FROM g
          WHERE lat IS NOT NULL AND lon IS NOT NULL
            AND lat >= -90.0 AND lat <= 90.0
            AND lon >= -180.0 AND lon <= 180.0
        )
        SELECT tile, count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_v
        FROM t WHERE tile > '6/17/31'
        GROUP BY tile ORDER BY tile LIMIT 12
    """

    # es_count (round 15): the _count API — the dis_max arms spell
    # their NULL-safe OR, fuzzy spells the identical length-guarded
    # levenshtein tree (both engines' classic distance).
    q["es_count"] = """
        SELECT count(*) AS total FROM events
        WHERE (coalesce(event_type = 'view', FALSE)
               OR coalesce(abs(length(event_type) - 5) <= 1
                           AND levenshtein(event_type, 'clack') <= 1,
                           FALSE))
          AND NOT coalesce(value < 5, FALSE)
    """

    # esql_events_rollup (round 15): the ES|QL dashboard rollup —
    # DATE_TRUNC day keys, FLOOR band keys (Spark floor(double) is a
    # LONG, so the oracle casts), SUM over an exact integer cents
    # expression, the exact-decimal AVG tree, exact COUNT_DISTINCT.
    # esql_sample (round 17, VERDICT r16 Next #6): `SAMPLE 0.25 ON
    # event_id` = the random_sampler portable-hash filter (PARITY
    # #35) — the oracle spells the identical first-4-hex-digit md5
    # bucket with the fixed "0:" seed prefix.
    q["esql_sample"] = """
        WITH h AS (
          SELECT event_type, value,
                 md5('0:' || CAST(event_id AS VARCHAR)) AS hh
          FROM events
          WHERE event_type IS NOT NULL AND value IS NOT NULL
        ), dig AS (
          SELECT event_type, value,
                 (ascii(substr(hh,1,1)) - CASE WHEN ascii(substr(hh,1,1)) >= 97 THEN 87 ELSE 48 END) * 4096
               + (ascii(substr(hh,2,1)) - CASE WHEN ascii(substr(hh,2,1)) >= 97 THEN 87 ELSE 48 END) * 256
               + (ascii(substr(hh,3,1)) - CASE WHEN ascii(substr(hh,3,1)) >= 97 THEN 87 ELSE 48 END) * 16
               + (ascii(substr(hh,4,1)) - CASE WHEN ascii(substr(hh,4,1)) >= 97 THEN 87 ELSE 48 END) AS v
          FROM h
        )
        SELECT event_type AS etype, count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM dig WHERE v % 10000 < 2500
        GROUP BY etype ORDER BY etype LIMIT 50
    """

    q["esql_events_rollup"] = """
        WITH e AS (
          SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 CAST(floor(value / 100) AS BIGINT) AS band,
                 CAST(floor(value * 100) AS BIGINT) AS cents,
                 value, user_id
          FROM events
          WHERE value IS NOT NULL
            AND event_type IN ('click', 'view', 'error')
        )
        SELECT day, band, count(*) AS n,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value) AS avg_v,
               count(DISTINCT user_id) AS users
        FROM e GROUP BY day, band ORDER BY day, band LIMIT 200
    """

    # esql_docs_tokens (round 15): SPLIT + MV_EXPAND re-base rows
    # onto tokens (string_split + unnest), LIKE wildcard filter,
    # grouped counts under a deterministic SORT.
    q["esql_docs_tokens"] = """
        WITH t AS (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents
        )
        SELECT tok, count(*) AS n FROM t
        WHERE tok LIKE 's%' AND length(tok) >= 4
        GROUP BY tok ORDER BY n DESC, tok ASC LIMIT 15
    """

    # esql_lookup_enrich (round 16): LOOKUP JOIN + ENRICH — two
    # broadcast left joins against dimension tables, exact-integer
    # SUM (Spark sum(LONG) is LONG; DuckDB sum(BIGINT) is HUGEINT,
    # so the oracle casts).
    q["esql_lookup_enrich"] = """
        WITH c AS (
          SELECT CAST(floor(c_acctbal * 100) AS BIGINT) AS cents,
                 c_nationkey
          FROM customer
        )
        SELECT n.n_name AS nation, r.r_name AS region,
               count(*) AS n, CAST(sum(cents) AS BIGINT) AS acct_cents
        FROM c
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY nation, region ORDER BY nation
    """

    # es_pipeline_aggs: pipeline aggregations over the bucket frame —
    # cumulative_sum (through DECIMAL so the running double is
    # association-free across engines), derivative (lag), bucket_script
    # (double/long division, identical IEEE), and a sibling max_bucket
    # over the SURVIVING top-2 terms children (post-pruning, exactly
    # the buckets an ES response would carry).
    q["es_pipeline_aggs"] = """
        WITH leaf AS (
          SELECT epoch_ms(date_trunc('day', ts)) AS by_day,
                 event_type AS by_type, value
          FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
        ), l1 AS (
          SELECT by_day, count(*) AS doc_count,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS daily_value
          FROM leaf GROUP BY by_day
        ), l1p AS (
          SELECT by_day, doc_count, daily_value,
                 CAST(sum(CAST(daily_value AS DECIMAL(28,6)))
                      OVER (ORDER BY by_day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS DOUBLE) AS cum_value,
                 CAST(daily_value - lag(daily_value) OVER (ORDER BY by_day)
                      AS DOUBLE) AS delta,
                 daily_value / doc_count AS per_doc
          FROM l1
        ), l2 AS (
          SELECT by_day, by_type, count(*) AS doc_count,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     / count(value) AS avg_value
          FROM leaf GROUP BY by_day, by_type
        ), l2k AS (
          SELECT *, row_number() OVER (
                     PARTITION BY by_day
                     ORDER BY doc_count DESC, by_type ASC) AS rk
          FROM l2
        ), l2kept AS (
          SELECT * FROM l2k WHERE rk <= 2
        ), best AS (
          SELECT by_day, CAST(max(avg_value) AS DOUBLE) AS best_type_avg
          FROM l2kept GROUP BY by_day
        )
        SELECT CAST(1 AS INT) AS level, l1p.by_day,
               CAST(NULL AS VARCHAR) AS by_type, doc_count,
               daily_value, CAST(NULL AS DOUBLE) AS avg_value,
               cum_value, delta, per_doc, b.best_type_avg
        FROM l1p LEFT JOIN best b USING (by_day)
        UNION ALL
        SELECT CAST(2 AS INT), by_day, by_type, doc_count,
               CAST(NULL AS DOUBLE), avg_value, CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE)
        FROM l2kept
        ORDER BY level, by_day, by_type NULLS FIRST
    """

    # es_collapse: ES field collapsing — one top hit per user_id
    # group, then the global top-20 of the representatives; the sort
    # key (value DESC, event_id) is unique so both windows/limits are
    # deterministic.
    q["es_collapse"] = """
        WITH ranked AS (
          SELECT event_id, user_id, event_type, value,
                 row_number() OVER (
                     PARTITION BY user_id
                     ORDER BY value DESC, event_id ASC) AS rk
          FROM events
          WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
        )
        SELECT event_id, user_id, event_type, value
        FROM ranked WHERE rk = 1
        ORDER BY value DESC, event_id ASC LIMIT 20
    """

    # es_search_after: mixed-direction lexicographic cursor — strictly
    # after ('click', 150.0, 0) in (type ASC, value DESC, id ASC)
    # order; the predicate applies BEFORE the top-k on both engines.
    q["es_search_after"] = """
        SELECT event_id, event_type, value FROM events
        WHERE event_type > 'click'
           OR (event_type = 'click'
               AND (value < 150.0
                    OR (value = 150.0 AND event_id > 0)))
        ORDER BY event_type ASC, value DESC, event_id ASC
        LIMIT 25
    """

    # es_knn_search: the ES 8 knn request section answers the SAME
    # oracle as sim_topk_bruteforce (identical cosine fold, identical
    # round-6 tiebreak ordering) — assigned after both are defined.

    # es_percolate: the reverse search — each arm mirrors one stored
    # query's NULL-safe compiled predicate; the multi_match arm is the
    # per-field token-membership OR (event_type is single-token, but
    # the SQL keeps the same list_contains form as the Spark side).
    q["es_percolate"] = r"""
        SELECT event_id, 'big_value' AS query_id FROM events
        WHERE coalesce(value >= 250, FALSE)
        UNION ALL
        SELECT event_id, 'quiet_errors' FROM events
        WHERE coalesce(event_type = 'error', FALSE)
          AND NOT coalesce(value >= 50, FALSE)
        UNION ALL
        SELECT event_id, 'k8_props' FROM events
        WHERE coalesce(
                list_contains(regexp_split_to_array(trim(event_type), '\s+'),
                              'error')
                OR list_contains(regexp_split_to_array(trim(event_type), '\s+'),
                                 '87}'), FALSE)
           OR coalesce(
                list_contains(regexp_split_to_array(trim(props), '\s+'),
                              'error')
                OR list_contains(regexp_split_to_array(trim(props), '\s+'),
                                 '87}'), FALSE)
        ORDER BY event_id, query_id
    """

    # es_terms_missing_offset: date_histogram offset (+2h on a 6h
    # grid, identical long-floor arithmetic) nested with terms
    # `missing` — the NULL segment coalesces into the '(none)' bucket
    # on both engines; sum_value reports at its attachment level only.
    q["es_terms_missing_offset"] = """
        WITH leaf AS (
          SELECT CAST(floor((epoch_ms(ts) - 7200000) / 21600000)
                      * 21600000 + 7200000 AS BIGINT) AS six_hourly,
                 coalesce(CASE WHEN value >= 100 THEN event_type END,
                          '(none)') AS by_seg,
                 value
          FROM events WHERE ts IS NOT NULL
        )
        SELECT CAST(1 AS INT) AS level, six_hourly,
               CAST(NULL AS VARCHAR) AS by_seg,
               count(*) AS doc_count, CAST(NULL AS DOUBLE) AS sum_value
        FROM leaf GROUP BY six_hourly
        UNION ALL
        SELECT CAST(2 AS INT), six_hourly, by_seg, count(*),
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
        FROM leaf GROUP BY six_hourly, by_seg
        ORDER BY level, six_hourly NULLS FIRST, by_seg NULLS FIRST
    """

    # es_metric_variants: weighted_avg (Σ(v·w)/Σw, both sums exact
    # decimals, double division) and top_metrics (the metric at each
    # bucket's ts-desc top doc — lexicographic max over a named
    # (s, m) struct so sort ties break on the metric in BOTH engines).
    q["es_metric_variants"] = """
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               count(*) AS doc_count,
               CAST(sum(CASE WHEN user_id IS NOT NULL
                              AND value IS NOT NULL
                         THEN CAST(user_id AS DECIMAL(18,6))
                              * CAST(value AS DECIMAL(18,6)) END) AS DOUBLE)
                   / CAST(sum(CASE WHEN user_id IS NOT NULL
                                   AND value IS NOT NULL
                              THEN CAST(value AS DECIMAL(18,6)) END)
                          AS DOUBLE)
                   AS w_user,
               CAST((max(CASE WHEN ts IS NOT NULL AND value IS NOT NULL
                              THEN struct_pack(s := ts, m := value)
                         END)).m AS DOUBLE) AS latest_value
        FROM events WHERE event_type IS NOT NULL
        GROUP BY event_type ORDER BY by_type
    """

    # es_extended_stats: exact decimal moments (Σv, Σv² — the products
    # are exact decimal×decimal) feed one FIXED double tree:
    # var = (n·Σv² − (Σv)²)/n², std = sqrt(var) (correctly rounded per
    # IEEE 754 in both engines), bounds = avg ± 2·std.
    q["es_extended_stats"] = """
        WITH m AS (
          SELECT event_type AS by_type, count(*) AS doc_count,
                 count(value) AS n,
                 CAST(count(value) AS DOUBLE) AS n_d,
                 CAST(min(value) AS DOUBLE) AS v_min,
                 CAST(max(value) AS DOUBLE) AS v_max,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s_d,
                 round(CAST(sum(CAST(value AS DECIMAL(18,6))
                          * CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4)
                     AS s2_d
          FROM events WHERE event_type IS NOT NULL
          GROUP BY event_type
        )
        SELECT CAST(1 AS INT) AS level, by_type, doc_count,
               n_d AS v_count, v_min, v_max, s_d AS v_sum,
               s_d / n AS v_avg, s2_d AS v_sos,
               greatest((n_d * s2_d - s_d * s_d) / (n_d * n_d), 0.0)
                   AS v_var,
               sqrt(greatest((n_d * s2_d - s_d * s_d) / (n_d * n_d), 0.0))
                   AS v_std,
               s_d / n + 2.0 * sqrt(greatest(
                   (n_d * s2_d - s_d * s_d) / (n_d * n_d), 0.0))
                   AS v_std_upper,
               s_d / n - 2.0 * sqrt(greatest(
                   (n_d * s2_d - s_d * s_d) / (n_d * n_d), 0.0))
                   AS v_std_lower
        FROM m ORDER BY by_type
    """

    # es_filter_missing_range: single-bucket missing agg (docs lacking
    # the synthesized nullable segment) chained with date_range
    # windows — the CASE chain mirrors the F.when order (ranges are
    # mutually exclusive, so order is cosmetic), avg masked to its
    # attachment level.
    q["es_filter_missing_range"] = """
        WITH leaf AS (
          SELECT 'no_seg' AS no_seg,
                 CASE WHEN epoch_ms(ts) < 1704931200000 THEN 'early'
                      WHEN epoch_ms(ts) >= 1704931200000
                           AND epoch_ms(ts) < 1705795200000 THEN 'mid'
                      WHEN epoch_ms(ts) >= 1705795200000 THEN 'late' END
                     AS era,
                 value
          FROM events
          WHERE (CASE WHEN value >= 100 THEN event_type END) IS NULL
            AND ts IS NOT NULL
        )
        SELECT CAST(1 AS INT) AS level, no_seg,
               CAST(NULL AS VARCHAR) AS era,
               count(*) AS doc_count, CAST(NULL AS DOUBLE) AS avg_value
        FROM leaf GROUP BY no_seg
        UNION ALL
        SELECT CAST(2 AS INT), no_seg, era, count(*),
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value)
        FROM leaf WHERE era IS NOT NULL GROUP BY no_seg, era
        ORDER BY level, no_seg NULLS FIRST, era NULLS FIRST
    """

    # es_geo_queries: geo_bounding_box + geo_distance — coordinates
    # synthesized from events, haversine spelled as the IDENTICAL
    # tree (a = sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2); d = 2R·asin(√a),
    # R = 6371008.7714); membership gaps are meters, ulp noise mm.
    # es_nested_query: the ES nested query — BOTH conditions must hold
    # on the SAME array<struct> object; list_filter(...) mirrors
    # exists(arr, x -> ...) exactly (a lambda NULL keeps nothing in
    # either engine), and the synthesized attrs array is spelled
    # identically.
    q["es_nested_query"] = """
        WITH e AS (
          SELECT event_id, event_type, value,
                 list_value(
                   struct_pack(k := 'type', v := event_type),
                   struct_pack(k := 'band',
                               v := 'b' || CAST(CAST(floor(value / 100)
                                                AS INT) AS VARCHAR))
                 ) AS attrs
          FROM events
        )
        SELECT event_id, event_type, value FROM e
        WHERE len(list_filter(attrs,
                  a -> a.k = 'type' AND a.v = 'error')) > 0
          AND len(list_filter(attrs,
                  a -> a.k = 'band' AND a.v LIKE 'b2%')) > 0
        ORDER BY event_id LIMIT 200
    """

    # es_nested_match (round 12): match (operator and) inside a
    # nested scope — whitespace tokens of the SAME object's text
    # must contain BOTH query terms; the synthesized two-token note
    # is spelled identically.
    q["es_nested_match"] = r"""
        WITH e AS (
          SELECT event_id, event_type, value,
                 list_value(
                   struct_pack(k := 'note',
                               v := event_type || ' b' ||
                                    CAST(CAST(floor(value / 100)
                                         AS INT) AS VARCHAR)),
                   struct_pack(k := 'tag', v := event_type)
                 ) AS attrs
          FROM events
        )
        SELECT event_id, event_type, value FROM e
        WHERE len(list_filter(attrs, a ->
                list_contains(regexp_split_to_array(trim(a.v), '\s+'),
                              'error')
            AND list_contains(regexp_split_to_array(trim(a.v), '\s+'),
                              'b2'))) > 0
        ORDER BY event_id LIMIT 100
    """

    # es_geohash_grid: the generated SQL unrolls the IDENTICAL
    # geohash bit-interleave the Spark expression uses (floor-scaled
    # cell indices, lon-first alternation, base-32 chars), so both
    # engines round the same IEEE ops; centroid = exact-decimal mean
    # pair over present points.
    q["es_geohash_grid"] = _geohash_grid_sql(precision=3)

    # es_geotile_grid: the identical Web-Mercator tree — x from the
    # scaled longitude, y from the 12-decimal-rounded Mercator
    # fraction (tan/ln may differ by an ulp across engines; rounding
    # before the floor removes the boundary risk), both clamped into
    # [0, 2^z-1]; lat clamped to ±85.05112878 before projecting.
    q["es_geotile_grid"] = """
        WITH g AS (
          SELECT value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        ),
        t AS (
          SELECT lat, lon,
                 greatest(0, least(CAST(floor((lon + 180.0) / 360.0 * 64.0)
                                   AS BIGINT), 63)) AS tx,
                 greatest(0, least(CAST(floor(round(
                     (1.0 - ln(tan(radians(greatest(-85.05112878,
                                  least(85.05112878, lat))))
                               + 1.0 / cos(radians(greatest(-85.05112878,
                                  least(85.05112878, lat)))))
                            / pi()) / 2.0 * 64.0, 12)) AS BIGINT), 63)) AS ty
          FROM g
          WHERE lat IS NOT NULL AND lon IS NOT NULL
            AND lat >= -90.0 AND lat <= 90.0
            AND lon >= -180.0 AND lon <= 180.0
        )
        SELECT CAST(1 AS INT) AS level,
               '6/' || CAST(tx AS VARCHAR) || '/' || CAST(ty AS VARCHAR)
                   AS tiles,
               count(*) AS doc_count,
               CAST(sum(CAST(lat AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lat,
               CAST(sum(CAST(lon AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lon
        FROM t GROUP BY 2 ORDER BY tiles
    """

    # es_nested_agg: unnest(attrs) re-bases rows onto objects; the
    # level-1 row counts objects, level-2 terms over the object key
    # with an exact-decimal avg of the object weight.
    q["es_nested_agg"] = """
        WITH e AS (
          SELECT list_value(
                   struct_pack(k := 'type', v := event_type, w := value),
                   struct_pack(k := 'band',
                               v := 'b' || CAST(CAST(floor(value / 100)
                                                AS INT) AS VARCHAR),
                               w := value * 2.0)
                 ) AS attrs
          FROM events
        ),
        x AS (SELECT unnest(attrs) AS a FROM e)
        SELECT CAST(1 AS INT) AS level, 'objs' AS objs,
               CAST(NULL AS VARCHAR) AS by_k,
               count(*) AS doc_count, CAST(NULL AS DOUBLE) AS avg_w
        FROM x
        UNION ALL
        SELECT CAST(2 AS INT), 'objs', a.k, count(*),
               CAST(sum(CAST(a.w AS DECIMAL(18,6))) AS DOUBLE)
                   / count(a.w)
        FROM x GROUP BY a.k
        ORDER BY level, objs NULLS FIRST, by_k NULLS FIRST
    """

    # es_reverse_nested (round 12): non-root nested — ancestor levels
    # count/aggregate PARENT docs (the unnest must not multiply them),
    # nested levels count objects, reverse_nested counts distinct
    # parents per leaf bucket. The variable-length attrs array
    # (1 object, +1 when value >= 100) is spelled identically.
    q["es_reverse_nested"] = """
        WITH e AS (
          SELECT event_id, event_type, value,
                 CASE WHEN value >= 100 THEN list_value(
                        struct_pack(k := 'type', w := value),
                        struct_pack(k := 'band', w := value * 2.0))
                 ELSE list_value(struct_pack(k := 'type', w := value))
                 END AS attrs
          FROM events WHERE event_type IS NOT NULL
        ),
        x AS (SELECT event_id, event_type, unnest(attrs) AS a FROM e)
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               CAST(NULL AS VARCHAR) AS objs,
               CAST(NULL AS VARCHAR) AS by_k,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value,
               CAST(NULL AS DOUBLE) AS avg_w,
               CAST(NULL AS DOUBLE) AS parents_doc_count
        FROM e GROUP BY event_type
        UNION ALL
        SELECT CAST(2 AS INT), event_type, 'objs', CAST(NULL AS VARCHAR),
               count(*), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               CAST(NULL AS DOUBLE)
        FROM x GROUP BY event_type
        UNION ALL
        SELECT CAST(3 AS INT), event_type, 'objs', a.k, count(*),
               CAST(NULL AS DOUBLE),
               CAST(sum(CAST(a.w AS DECIMAL(18,6))) AS DOUBLE)
                   / count(a.w),
               CAST(count(DISTINCT event_id) AS DOUBLE)
        FROM x GROUP BY event_type, a.k
        ORDER BY level, by_type, by_k NULLS FIRST
    """

    # es_filters_under_terms (round 12): non-root filters — the
    # per-doc matching-names list unnests (multi-membership), empty
    # lists become the other bucket; ancestor counts/sums from the
    # un-exploded events.
    q["es_filters_under_terms"] = """
        WITH e AS (
          SELECT event_type, value,
                 CASE WHEN len(m) = 0 THEN ['_other_'] ELSE m END AS m
          FROM (
            SELECT event_type, value,
                   list_filter([
                     CASE WHEN value >= 300 THEN 'big' END,
                     CASE WHEN value >= 150 AND value < 400 THEN 'mid' END,
                     CASE WHEN event_type = 'error' THEN 'err' END
                   ], x -> x IS NOT NULL) AS m
            FROM events
          ) WHERE event_type IS NOT NULL
        ),
        x AS (SELECT event_type, value, unnest(m) AS cls FROM e)
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               CAST(NULL AS VARCHAR) AS cls,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value,
               CAST(NULL AS DOUBLE) AS avg_value
        FROM e GROUP BY event_type
        UNION ALL
        SELECT CAST(2 AS INT), event_type, cls, count(*),
               CAST(NULL AS DOUBLE),
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value)
        FROM x GROUP BY event_type, cls
        ORDER BY level, by_type, cls NULLS FIRST
    """

    # es_terms_include_exclude (round 12): include regex (anchored)
    # + exclude list filter the candidate terms before ranking.
    q["es_terms_include_exclude"] = """
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM events
        WHERE event_type IS NOT NULL
          AND regexp_matches(event_type, '^(?:(c|e|p).*)$')
          AND event_type <> 'error'
        GROUP BY event_type
        ORDER BY by_type
    """

    # es_terms_partition (round 14, VERDICT r13 Next #3): the
    # include partition object — a deterministic hash-mod filter on
    # the term BEFORE ranking, the md5 ascii-hex bucket spelled
    # exactly like corpus_splits (sampling.hash_bucket's portable
    # form; ES's own partition hash is implementation-defined, so
    # the engine documents md5 as its partition function, PARITY
    # #24). partition 1 of 3 over user_id.
    q["es_terms_partition"] = """
        WITH h AS (
          SELECT user_id, value,
                 md5(CAST(user_id AS VARCHAR)) AS hh
          FROM events WHERE user_id IS NOT NULL
        ), dig AS (
          SELECT user_id, value,
                 (ascii(substr(hh,1,1)) - CASE WHEN ascii(substr(hh,1,1)) >= 97 THEN 87 ELSE 48 END) * 4096
               + (ascii(substr(hh,2,1)) - CASE WHEN ascii(substr(hh,2,1)) >= 97 THEN 87 ELSE 48 END) * 256
               + (ascii(substr(hh,3,1)) - CASE WHEN ascii(substr(hh,3,1)) >= 97 THEN 87 ELSE 48 END) * 16
               + (ascii(substr(hh,4,1)) - CASE WHEN ascii(substr(hh,4,1)) >= 97 THEN 87 ELSE 48 END) AS v
          FROM h
        )
        SELECT CAST(1 AS INT) AS level, user_id AS by_user,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM dig WHERE v % 3 = 1
        GROUP BY user_id
        ORDER BY by_user
    """

    # es_multi_rare_terms (round 12): multi_terms = '|'-joined
    # composite key (docs missing any component dropped, per ES);
    # rare_terms = HAVING count(*) <= max_doc_count inside the
    # parent bucket — the doc_count-ceiling twin of terms.
    q["es_multi_rare_terms"] = """
        WITH e AS (
          SELECT CASE WHEN event_type IS NOT NULL AND value IS NOT NULL
                 THEN event_type || '|' || 'b' ||
                      CAST(CAST(floor(value / 100) AS INT) AS VARCHAR)
                 END AS type_band,
                 user_id, value
          FROM events
        )
        SELECT CAST(1 AS INT) AS level, type_band,
               CAST(NULL AS BIGINT) AS rare_users,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM e WHERE type_band IS NOT NULL GROUP BY type_band
        UNION ALL
        SELECT CAST(2 AS INT), type_band, user_id, count(*),
               CAST(NULL AS DOUBLE)
        FROM e WHERE type_band IS NOT NULL
        GROUP BY type_band, user_id HAVING count(*) <= 1
        ORDER BY level, type_band, rare_users NULLS FIRST
    """

    # es_range_overlap (round 12): ES multi-membership — a doc lands
    # in EVERY matching range (unnest of the per-doc matching-keys
    # list); ancestor doc_count/sum come from the UN-exploded docs.
    q["es_range_overlap"] = """
        WITH e AS (
          SELECT event_type, value,
                 list_filter([
                   CASE WHEN value >= 0 AND value < 200 THEN 'low' END,
                   CASE WHEN value >= 100 AND value < 300 THEN 'mid' END,
                   CASE WHEN value >= 250 THEN 'high' END
                 ], x -> x IS NOT NULL) AS bl
          FROM events WHERE event_type IS NOT NULL
        ),
        x AS (SELECT event_type, value, unnest(bl) AS bands FROM e)
        SELECT CAST(1 AS INT) AS level, event_type AS by_type,
               CAST(NULL AS VARCHAR) AS bands,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value,
               CAST(NULL AS DOUBLE) AS avg_value
        FROM e GROUP BY event_type
        UNION ALL
        SELECT CAST(2 AS INT), event_type, bands, count(*),
               CAST(NULL AS DOUBLE),
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / count(value)
        FROM x GROUP BY event_type, bands
        ORDER BY level, by_type, bands NULLS FIRST
    """

    # es_auto_date_histogram: the ~31-day January window at every SF
    # picks '7d' from the ladder (day -> ~31 > 10 buckets; 7d -> <=
    # 10); epoch-anchored fixed grid, the chosen label emitted as a
    # literal column so a drifted choice hash-fails loudly.
    q["es_auto_date_histogram"] = """
        SELECT CAST(1 AS INT) AS level,
               CAST(floor(epoch_ms(ts) / 604800000) * 604800000
                    AS BIGINT) AS per_auto,
               count(*) AS doc_count,
               '7d' AS per_auto_interval,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS sum_value
        FROM events
        WHERE coalesce(event_type = 'view', FALSE) AND ts IS NOT NULL
        GROUP BY 2 ORDER BY per_auto
    """

    # es_geo_distance_rings: the identical haversine tree feeding a
    # range-agg CASE chain (from-inclusive / to-exclusive meters);
    # centroid = exact-decimal mean pair per ring.
    q["es_geo_distance_rings"] = """
        WITH g AS (
          SELECT value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        ),
        d AS (
          SELECT lat, lon,
                 2 * 6371008.7714 * asin(sqrt(
                   sin(radians(lat - 0.0) / 2.0)
                     * sin(radians(lat - 0.0) / 2.0)
                   + cos(radians(lat)) * cos(radians(0.0))
                     * sin(radians(lon - 0.0) / 2.0)
                     * sin(radians(lon - 0.0) / 2.0)
                 )) AS dist
          FROM g
        ),
        k AS (
          SELECT lat, lon,
                 CASE WHEN dist < 2000000.0 THEN 'near'
                      WHEN dist >= 2000000.0 AND dist < 8000000.0 THEN 'mid'
                      WHEN dist >= 8000000.0 THEN 'far' END AS rings
          FROM d
        )
        SELECT CAST(1 AS INT) AS level, rings, count(*) AS doc_count,
               CAST(sum(CAST(lat AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lat,
               CAST(sum(CAST(lon AS DECIMAL(18,6))) AS DOUBLE)
                   / count(CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
                           THEN 1 END) AS centroid_lon
        FROM k WHERE rings IS NOT NULL
        GROUP BY rings ORDER BY rings
    """

    # es_geo_shape (round 14, VERDICT r13 Next #7): the non-convex
    # polygon's parity ray-cast spelled edge-for-edge like the Spark
    # expression tree (horizontal edges skipped, ring order, integer
    # crossing sum), the envelope as plain bounds — planar reading,
    # PARITY #25.
    q["es_geo_shape"] = """
        WITH g AS (
          SELECT event_id,
                 value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        )
        SELECT event_id, lat, lon FROM g
        WHERE (
            CASE WHEN (((-10.0) > lat) <> ((25.0) > lat))
                  AND (lon < ((-20.0) - (-20.0)) * (lat - (-10.0))
                             / ((25.0) - (-10.0)) + (-20.0))
                 THEN 1 ELSE 0 END
          + CASE WHEN (((25.0) > lat) <> ((5.0) > lat))
                  AND (lon < ((-60.0) - (-20.0)) * (lat - (25.0))
                             / ((5.0) - (25.0)) + (-20.0))
                 THEN 1 ELSE 0 END
          + CASE WHEN (((5.0) > lat) <> ((25.0) > lat))
                  AND (lon < ((-100.0) - (-60.0)) * (lat - (5.0))
                             / ((25.0) - (5.0)) + (-60.0))
                 THEN 1 ELSE 0 END
          + CASE WHEN (((25.0) > lat) <> ((-10.0) > lat))
                  AND (lon < ((-100.0) - (-100.0)) * (lat - (25.0))
                             / ((-10.0) - (25.0)) + (-100.0))
                 THEN 1 ELSE 0 END
          ) % 2 = 1
          AND lat <= 22.0 AND lat >= -8.0
          AND lon >= -95.0 AND lon <= -25.0
        ORDER BY event_id LIMIT 200
    """

    q["es_geo_queries"] = """
        WITH g AS (
          SELECT event_id,
                 value / 10.0 - 24.5 AS lat,
                 CAST((event_id % 360) - 180 + 0.5 AS DOUBLE) AS lon
          FROM events
        )
        SELECT event_id, lat, lon FROM g
        WHERE lat <= 20.0 AND lat >= -20.0
          AND lon >= -60.0 AND lon <= 60.0
          AND 2 * 6371008.7714 * asin(sqrt(
                sin(radians(lat - 0.0) / 2.0) * sin(radians(lat - 0.0) / 2.0)
                + cos(radians(lat)) * cos(radians(0.0))
                  * sin(radians(lon - 0.0) / 2.0)
                  * sin(radians(lon - 0.0) / 2.0)
              )) <= 2000000.0
        ORDER BY event_id LIMIT 100
    """

    # es_percolate_bulk: the millions-of-rules percolate route — the
    # SAME 50 (event_type × 50-wide band) rules rebuilt relationally:
    # the conjunction collapses to one join predicate per rule, which
    # is exactly what the conjunct-count match computes.
    q["es_percolate_bulk"] = """
        WITH types AS (SELECT DISTINCT event_type FROM events
                       WHERE event_type IS NOT NULL),
        bands AS (SELECT CAST(g * 50 AS DOUBLE) AS lo
                  FROM generate_series(0, 9) t(g)),
        rules AS (SELECT event_type || '_' ||
                         CAST(CAST(lo AS INT) AS VARCHAR) AS query_id,
                         event_type, lo
                  FROM types CROSS JOIN bands)
        SELECT e.event_id, r.query_id
        FROM events e JOIN rules r
          ON e.event_type = r.event_type
         AND e.value >= r.lo AND e.value < r.lo + 50
        ORDER BY event_id, query_id
    """

    # es_transform_pivot: the batch form of the ES _transform pivot —
    # per-user per-day entity rollup; avg goes through the SAME
    # decimal(28,6)-sum/count split the incremental merge persists,
    # so batch, continuous, and oracle all compute identical doubles.
    q["es_transform_pivot"] = """
        SELECT user_id AS "user",
               epoch_ms(date_trunc('day', ts)) AS day,
               count(*) AS doc_count,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   AS total_value,
               max(value) AS peak_value,
               CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                   / count(value) AS avg_value,
               count(value) AS n_values
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """

    # es_query_string: a saved Lucene q= string replayed lake-side —
    # the parser is the inverse of the Catalyst→query_string pushdown
    # translator (round-trip pinned in tests/test_querystring.py).
    # NOT is NULL-exact (matches missing fields); [100 TO 200} is a
    # half-open range; *k* is a wildcard → LIKE.
    q["es_query_string"] = """
        SELECT event_id, ts, event_type, value, user_id FROM events
        WHERE event_type IN ('click', 'view')
          AND value >= 100 AND value < 200
          AND NOT coalesce(user_id = 13, FALSE)
          AND props IS NOT NULL
          AND props LIKE '%k%'
        ORDER BY event_id
    """

    # es_top_hits: terms(size 10 by doc_count desc, key asc) >
    # top_hits(2, value desc) — the bucket-prune window runs over the
    # aggregated counts, the hit window over the kept docs.
    q["es_top_hits"] = """
        WITH keep AS (
          SELECT event_type FROM (
            SELECT event_type,
                   row_number() OVER (
                       ORDER BY count(*) DESC, event_type ASC) AS rk
            FROM events WHERE event_type IS NOT NULL
            GROUP BY event_type)
          WHERE rk <= 10
        ), ranked AS (
          SELECT event_type AS by_type, event_id, ts, value,
                 row_number() OVER (
                     PARTITION BY event_type
                     ORDER BY value DESC, event_id ASC) AS top_rank
          FROM events JOIN keep USING (event_type)
        )
        SELECT by_type, top_rank, event_id, ts, value
        FROM ranked WHERE top_rank <= 2
        ORDER BY by_type, top_rank
    """

    # es_significant_heuristics (round 14, VERDICT r13 Next #5): the
    # non-JLH significance heuristics over the SAME counts frame as
    # the JLH row — chi_square / gnd / mutual_information /
    # percentage as documented score trees over the background-is-
    # superset 2x2 contingency (spelled identically here: left-assoc
    # doubles, MI cells and the GND exp 12dp-rounded per the entropy/
    # softmax libm discipline, micro floor, per-heuristic top-10 by
    # (score desc, band asc) — load-bearing at sf0.1's 12 bands).
    q["es_significant_heuristics"] = """
        WITH d AS (
          SELECT CASE WHEN coalesce(value >= 80, FALSE)
                 THEN 1 ELSE 0 END AS fg,
                 'b' || CAST(CAST(floor(value / 50) AS INT) AS VARCHAR)
                     AS sig_band
          FROM events
        ),
        s AS (
          SELECT CAST(sum(fg) AS BIGINT) AS fgd,
                 CAST(count(*) AS BIGINT) AS nd
          FROM d
        ),
        c AS (
          SELECT sig_band,
                 CAST(sum(fg) AS BIGINT) AS doc_count,
                 CAST(count(*) AS BIGINT) AS bg_count
          FROM d WHERE sig_band IS NOT NULL
          GROUP BY sig_band HAVING sum(fg) >= 2
        ),
        m AS (
          SELECT sig_band, doc_count, bg_count, n11, n01, n10, n00, n,
                 n11 + n10 AS n1_, n11 + n01 AS n_1,
                 n01 + n00 AS n0_, n10 + n00 AS n_0
          FROM (
            SELECT sig_band, doc_count, bg_count,
                   CAST(doc_count AS DOUBLE) AS n11,
                   CAST(bg_count AS DOUBLE) - CAST(doc_count AS DOUBLE)
                       AS n01,
                   CAST(fgd AS DOUBLE) - CAST(doc_count AS DOUBLE)
                       AS n10,
                   (CAST(nd AS DOUBLE) - CAST(bg_count AS DOUBLE))
                     - (CAST(fgd AS DOUBLE) - CAST(doc_count AS DOUBLE))
                       AS n00,
                   CAST(nd AS DOUBLE) AS n
            FROM c, s WHERE bg_count > 0)
        ),
        scored AS (
          SELECT 'chi_square' AS heuristic, sig_band, doc_count,
                 bg_count,
                 (n * pow(n11 * n00 - n01 * n10, 2.0))
                   / (((n_1 * n1_) * n0_) * n_0) AS score
          FROM m
          UNION ALL
          SELECT 'gnd', sig_band, doc_count, bg_count,
                 CASE WHEN ln(n) <> least(ln(n1_), ln(n_1)) THEN
                   round(exp(-((greatest(ln(n1_), ln(n_1)) - ln(n11))
                         / (ln(n) - least(ln(n1_), ln(n_1))))), 12)
                 END
          FROM m
          UNION ALL
          SELECT 'mutual_information', sig_band, doc_count, bg_count,
                 ((CASE WHEN n11 > 0 THEN round((n11 / n)
                       * log2((n11 * n) / (n1_ * n_1)), 12)
                     ELSE 0.0 END
                  + CASE WHEN n01 > 0 THEN round((n01 / n)
                        * log2((n01 * n) / (n0_ * n_1)), 12)
                      ELSE 0.0 END)
                  + CASE WHEN n10 > 0 THEN round((n10 / n)
                        * log2((n10 * n) / (n1_ * n_0)), 12)
                      ELSE 0.0 END)
                  + CASE WHEN n00 > 0 THEN round((n00 / n)
                        * log2((n00 * n) / (n0_ * n_0)), 12)
                      ELSE 0.0 END
          FROM m
          UNION ALL
          SELECT 'percentage', sig_band, doc_count, bg_count,
                 CAST(doc_count AS DOUBLE) / CAST(bg_count AS DOUBLE)
          FROM m
        ),
        micro AS (
          SELECT heuristic, sig_band, doc_count, bg_count,
                 CAST(floor(1e6 * score) AS BIGINT) AS score_micro
          FROM scored
          WHERE CAST(floor(1e6 * score) AS BIGINT) > 0
        )
        SELECT CAST(1 AS INT) AS level, sig_band, doc_count, bg_count,
               score_micro, heuristic
        FROM (
          SELECT *, row_number() OVER (
                     PARTITION BY heuristic
                     ORDER BY score_micro DESC, sig_band ASC) AS rk
          FROM micro)
        WHERE rk <= 10
        ORDER BY heuristic, sig_band
    """

    # es_top_hits_nonleaf (round 14, VERDICT r13 Next #4): top_hits
    # under a non-leaf bucket — the union frame: regular bucket rows
    # (terms > weekly date_histogram + sum metric) plus doc-shaped
    # rank rows at the carrying terms level; the terms size-3 prune
    # (3 of 5 types) is load-bearing for both halves.
    q["es_top_hits_nonleaf"] = """
        WITH keep AS (
          SELECT event_type FROM (
            SELECT event_type, row_number() OVER (
                       ORDER BY count(*) DESC, event_type ASC) AS rk
            FROM events WHERE event_type IS NOT NULL
            GROUP BY event_type)
          WHERE rk <= 3
        ), l1 AS (
          SELECT CAST(1 AS INT) AS level, event_type AS by_type,
                 CAST(NULL AS BIGINT) AS weekly,
                 count(*) AS doc_count,
                 CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                     AS sum_value,
                 CAST(NULL AS INT) AS top2_rank,
                 CAST(NULL AS BIGINT) AS event_id,
                 CAST(NULL AS DOUBLE) AS value
          FROM events JOIN keep USING (event_type)
          GROUP BY event_type
        ), l2 AS (
          SELECT CAST(2 AS INT), event_type,
                 (epoch_ms(ts) // 604800000) * 604800000,
                 count(*), CAST(NULL AS DOUBLE), CAST(NULL AS INT),
                 CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
          FROM events JOIN keep USING (event_type)
          WHERE ts IS NOT NULL
          GROUP BY 2, 3
        ), docs AS (
          SELECT CAST(1 AS INT), event_type, CAST(NULL AS BIGINT),
                 CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
                 rk, event_id, value
          FROM (
            SELECT event_type, event_id, value,
                   CAST(row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id ASC) AS INT) AS rk
            FROM events JOIN keep USING (event_type))
          WHERE rk <= 2
        )
        SELECT * FROM l1
        UNION ALL SELECT * FROM l2
        UNION ALL SELECT * FROM docs
        ORDER BY 1, 2, 3, 6
    """

    # the ES 8 knn request dialect serves the same answer as the
    # declared brute-force cosine operator — one oracle, two surfaces
    # (the corpus_bm25_served pattern)
    q["es_knn_search"] = q["sim_topk_bruteforce"]

    # es_suggest_completion: prefix vocab top-k by document frequency
    # (per-doc distinct terms, like significant_terms' df)
    q["es_suggest_completion"] = f"""
        WITH t AS (SELECT list_distinct({_TOKS}) AS toks FROM documents),
        v AS (SELECT term, count(*) AS df
              FROM (SELECT unnest(toks) AS term FROM t)
              WHERE term LIKE 's%' GROUP BY term)
        SELECT term, df FROM v ORDER BY df DESC, term ASC LIMIT 10
    """

    # es_suggest_term: fuzzy corrections for 'port' from the corpus
    # vocabulary — classic Levenshtein (the PARITY fuzzy caveat),
    # exact input excluded, Lucene's candidate order (distance asc,
    # df desc: 'sort' 388 beats 'part' 385 at equal distance)
    # es_suggest_phrase (round 14, VERDICT r13 Next #6): per-token
    # vocab candidates (the term_suggest machinery, distance 0
    # included) cross-joined into phrases and re-ranked by the
    # stupid-backoff bigram LM — score = sum of round(ln(p), 12) per
    # position (the libm discipline), micro-floored. 'sart' is one
    # edit from BOTH sort and part, 'aig' from BOTH agg and big, so
    # the four-combo re-rank is load-bearing.
    q["es_suggest_phrase"] = f"""
        WITH tf AS (
          SELECT w, CAST(count(*) AS BIGINT) AS c1
          FROM (SELECT unnest({_TOKS}) AS w FROM documents)
          GROUP BY w
        ),
        tot AS (SELECT CAST(sum(c1) AS BIGINT) AS t FROM tf),
        cand0 AS (
          SELECT w AS w0, c1 AS c0 FROM (
            SELECT w, c1, row_number() OVER (
                       ORDER BY levenshtein(w, 'the') ASC, c1 DESC,
                                w ASC) AS rk
            FROM tf WHERE abs(len(w) - 3) <= 1
              AND levenshtein(w, 'the') <= 1)
          WHERE rk <= 5
        ),
        cand1 AS (
          SELECT w AS w1, c1 AS k1 FROM (
            SELECT w, c1, row_number() OVER (
                       ORDER BY levenshtein(w, 'sart') ASC, c1 DESC,
                                w ASC) AS rk
            FROM tf WHERE abs(len(w) - 4) <= 1
              AND levenshtein(w, 'sart') <= 1)
          WHERE rk <= 5
        ),
        cand2 AS (
          SELECT w AS w2, c1 AS k2 FROM (
            SELECT w, c1, row_number() OVER (
                       ORDER BY levenshtein(w, 'aig') ASC, c1 DESC,
                                w ASC) AS rk
            FROM tf WHERE abs(len(w) - 3) <= 1
              AND levenshtein(w, 'aig') <= 1)
          WHERE rk <= 5
        ),
        pr AS (
          SELECT tk[i] AS p1, tk[i + 1] AS p2 FROM (
            SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS i
            FROM (SELECT {_TOKS} AS tk FROM documents)
            WHERE len(tk) >= 2)
        ),
        b1 AS (
          SELECT p1, p2, CAST(count(*) AS BIGINT) AS b
          FROM pr WHERE p1 IN (SELECT w0 FROM cand0)
            AND p2 IN (SELECT w1 FROM cand1)
          GROUP BY p1, p2
        ),
        b2 AS (
          SELECT p1, p2, CAST(count(*) AS BIGINT) AS b
          FROM pr WHERE p1 IN (SELECT w1 FROM cand1)
            AND p2 IN (SELECT w2 FROM cand2)
          GROUP BY p1, p2
        ),
        combo AS (SELECT * FROM cand0, cand1, cand2, tot),
        scored AS (
          SELECT w0 || ' ' || w1 || ' ' || w2 AS suggestion,
                 CAST(floor(1e6 * (
                   round(ln(CAST(c0 AS DOUBLE) / CAST(t AS DOUBLE)),
                         12)
                 + round(ln(CASE WHEN b1.b IS NOT NULL
                       THEN CAST(b1.b AS DOUBLE) / CAST(c0 AS DOUBLE)
                       ELSE 0.4 * CAST(k1 AS DOUBLE)
                            / CAST(t AS DOUBLE) END), 12)
                 + round(ln(CASE WHEN b2.b IS NOT NULL
                       THEN CAST(b2.b AS DOUBLE) / CAST(k1 AS DOUBLE)
                       ELSE 0.4 * CAST(k2 AS DOUBLE)
                            / CAST(t AS DOUBLE) END), 12)
                 )) AS BIGINT) AS score_micro
          FROM combo
          LEFT JOIN b1 ON b1.p1 = combo.w0 AND b1.p2 = combo.w1
          LEFT JOIN b2 ON b2.p1 = combo.w1 AND b2.p2 = combo.w2
        )
        SELECT rank, suggestion, score_micro FROM (
          SELECT CAST(row_number() OVER (
                     ORDER BY score_micro DESC, suggestion ASC)
                 AS INT) AS rank, suggestion, score_micro
          FROM scored)
        WHERE rank <= 5
        ORDER BY rank
    """

    q["es_suggest_term"] = f"""
        WITH t AS (SELECT list_distinct({_TOKS}) AS toks FROM documents),
        v AS (SELECT suggestion, count(*) AS df
              FROM (SELECT unnest(toks) AS suggestion FROM t)
              GROUP BY suggestion),
        c AS (SELECT suggestion, df,
                     CAST(levenshtein(suggestion, 'port') AS INT) AS distance
              FROM v
              WHERE abs(len(suggestion) - 4) <= 1 AND suggestion != 'port')
        SELECT suggestion, distance, df FROM c
        WHERE distance <= 1
        ORDER BY distance ASC, df DESC, suggestion ASC LIMIT 5
    """

    return q
