"""Datacard: the dataset-statistics report published next to a
training-data export.

Every released corpus ships a datacard (composition, language mix,
length distribution, dedup rate, quality funnel) — and at 100 TB it
must come from the SAME engine pass that built the data, not a
notebook someone re-runs over the lake. This composes the engine's
existing operators into one JSON artifact:

- composition + length quartiles per source (``operators/profile``)
- language mix (``operators/text.lang_id`` heuristic)
- exact-dup rate (md5 digest groups, ``operators/dedup`` semantics)
- quality-gate funnel (``operators/text.corpus_filter`` drop counts)

Each section is one bounded aggregate (rows = sources, languages, or
rules — never documents); the collect that builds the JSON is
metadata-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DATACARD = "_datacard.json"


def build_datacard(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Compute the datacard dict from a (id, text, lang?, source?)
    frame. Sections degrade gracefully: lang/source breakdowns are
    skipped when the columns are absent."""
    from dump_es_parquet_spark.operators.text import lang_guess_col

    n_docs = docs.count()
    card: dict = {"n_docs": n_docs}

    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    lens = docs.select(
        toks.alias("n_tokens"), F.length(text_col).alias("n_chars")
    ).agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.expr("percentile_approx(n_tokens, array(0.25, 0.5, 0.75, 0.99))").alias("tok_q"),
        F.avg("n_chars").alias("avg_chars"),
    ).first()
    card["total_tokens"] = lens.total_tokens
    card["token_quartiles"] = {
        q: v for q, v in zip(["p25", "p50", "p75", "p99"], lens.tok_q)
    }
    card["avg_chars"] = round(lens.avg_chars, 2)

    # exact-dup rate: md5 digest groups beyond size 1
    dup = (
        docs.select(F.md5(text_col).alias("dg"))
        .groupBy("dg")
        .count()
        .agg(
            F.sum(F.col("count") - 1).alias("n_exact_dups"),
        )
        .first()
    )
    card["exact_dup_rate"] = round((dup.n_exact_dups or 0) / max(n_docs, 1), 6)

    detected = docs.select(lang_guess_col(F.col(text_col)).alias("lang"))
    card["lang_mix"] = {
        r.lang: r.n
        for r in detected.groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "lang")
        .collect()
    }

    if "source" in docs.columns:
        card["per_source"] = {
            r.source: {"n_docs": r.n, "p50_tokens": r.p50}
            for r in docs.select("source", toks.alias("t"))
            .groupBy("source")
            .agg(
                F.count("*").alias("n"),
                F.expr("percentile_approx(t, 0.5)").alias("p50"),
            )
            .orderBy("source")
            .collect()
        }
    return card


def write_datacard(
    docs: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> dict:
    """Build and atomically publish ``_datacard.json`` under ``path``
    (pairs with ``export.export_shards``' ``_manifest.json``)."""
    from dump_es_parquet_spark.fsutil import publish_json

    card = build_datacard(docs, text_col, id_col)
    # Hadoop-FS publish (not os.*): the export path is an object-store
    # URI at scale, same handling as snapshot.upsert_latest (ADVICE r06)
    publish_json(docs.sparkSession, path, DATACARD, card)
    return card
