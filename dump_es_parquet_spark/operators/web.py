"""Web-corpus curation: URL canonicalization, registrable domains,
per-domain document caps.

Standard front-of-pipeline steps for a crawl-derived training corpus
(C4/RefinedWeb-style): dedup needs canonical URLs (tracking params
and fragments make spurious uniques), and per-domain caps stop a few
megasites from dominating the token budget. All JVM-side expressions
— ``parse_url`` / ``regexp_replace`` / higher-order array functions —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Query parameters that never change page identity — the usual
#: tracking/attribution set dropped by every canonicalizer.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref", "ref_src",
)

#: Country-code second-level registries where the registrable domain is
#: three labels, not two (heuristic subset of the public-suffix list —
#: the full PSL is a data file, not an algorithm; swap it in at deploy).
_SECOND_LEVEL = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.sg", "com.tr", "com.ar",
)


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default ports stripped,
    fragment dropped, tracking query params removed (surviving params
    kept IN ORIGINAL ORDER — full param sorting changes semantics on
    some sites), empty path normalized to ``/``, trailing ``?``
    dropped. NULL stays NULL."""
    scheme = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    # parse_url HOST excludes the port; strip :80/:443 only for the
    # matching scheme, keep exotic ports.
    port = F.regexp_extract(url, r"^[^:]+://[^/:?#]+:(\d+)", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when((path == "") | path.isNull(), F.lit("/")).otherwise(path)
    query = F.try_parse_url(url, F.lit("QUERY"))
    tracked = F.array(*[F.lit(p) for p in TRACKING_PARAMS])
    kept_params = F.filter(
        F.split(query, "&"),
        lambda kv: (kv != "")
        & ~F.array_contains(tracked, F.lower(F.split_part(kv, F.lit("="), F.lit(1)))),
    )
    qs = F.when(
        query.isNotNull() & (F.size(kept_params) > 0),
        F.concat(F.lit("?"), F.array_join(kept_params, "&")),
    ).otherwise(F.lit(""))
    out = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        qs,
    )
    return F.when(scheme.isNotNull() & host.isNotNull(), out)


def registrable_domain(host: Column) -> Column:
    """eTLD+1 heuristic: last two host labels, or last three when the
    two-label suffix is a known second-level registry (``co.uk`` ...).
    IP literals pass through unchanged."""
    h = F.lower(host)
    is_ip = h.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    parts = F.split(h, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    sl = F.array(*[F.lit(s) for s in _SECOND_LEVEL])
    return (
        F.when(is_ip | (n <= 2), h)
        .when(F.array_contains(sl, last2) & (n >= 3), last3)
        .otherwise(last2)
    )


def cap_per_group(
    df: DataFrame, group_cols: list[str], k: int, order_col: Column
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by ``order_col``
    ascending — pass a deterministic pseudo-random key (e.g.
    ``md5(doc_id)``) for an unbiased cap, or a quality score to keep
    the best ``k``.

    Scale shape: one shuffle on the group key; the window's rank is
    computed per partition after the shuffle and rows beyond ``k``
    are dropped before anything downstream. A skewed megadomain still
    lands on one reducer — for pathological skew, pre-filter with an
    approximate per-group count and sample the whale groups first."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap the documents table at 15 docs per source, ordered by
    ``md5(doc_id)`` (deterministic unbiased pick, identical string
    input on both engines), then report per-source kept counts and an
    order-free membership digest."""
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    capped = cap_per_group(
        d, ["source"], 15, F.md5(F.col("doc_id").cast("string"))
    )
    return (
        capped.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_id_sum"),
            F.expr("bit_xor(doc_id)").cast("long").alias("kept_id_xor"),
        )
        .orderBy("source")
    )
