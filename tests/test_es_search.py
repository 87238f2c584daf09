"""The ES ``_search`` compiler's semantic contracts: NULL-exactness
of the query DSL (the places a naive ``Column`` translation silently
diverges from ES), wildcard/regexp translation, the agg tree's
pruning rules (per-parent size, min_doc_count, descendant drop), and
composite after-key pagination."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dump_es_parquet_spark.operators.es_search import (
    _false_safe,
    compile_aggs,
    compile_query,
    composite_agg,
    search,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(id=1, kind="a", tag="red", n=10.0, text="the fast cat"),
            Row(id=2, kind="a", tag=None, n=20.0, text="slow cat runs"),
            Row(id=3, kind="b", tag="blue", n=None, text="the slow dog"),
            Row(id=4, kind="b", tag="red", n=40.0, text=None),
            Row(id=5, kind="c", tag="red_x", n=50.0, text="cat dog cat"),
        ]
    )


def _ids(df, q):
    return sorted(r.id for r in df.filter(compile_query(q)).select("id").collect())


# ---------------------------------------------------------------------------
# query DSL NULL-exactness
# ---------------------------------------------------------------------------


def test_must_not_matches_missing_field(docs):
    # ES: must_not(term tag=red) matches docs WITHOUT tag (id=2).
    # A naive ~(col == v) would drop the NULL row.
    q = {"bool": {"must_not": [{"term": {"tag": "red"}}]}}
    assert _ids(docs, q) == [2, 3, 5]


def test_should_counts_null_as_nomatch(docs):
    # doc 3 has n NULL: the range clause must count as no-match (not
    # poison the msm sum to NULL), so doc 3 still matches via tag.
    q = {
        "bool": {
            "should": [{"range": {"n": {"gte": 15}}}, {"term": {"tag": "blue"}}],
            "minimum_should_match": 1,
        }
    }
    assert _ids(docs, q) == [2, 3, 4, 5]


def test_minimum_should_match_two(docs):
    q = {
        "bool": {
            "should": [
                {"range": {"n": {"gte": 15}}},
                {"term": {"kind": "b"}},
                {"term": {"tag": "red"}},
            ],
            "minimum_should_match": 2,
        }
    }
    # 1: red only (1) — no; 2: n>=15 (1) — no; 3: kind b (1) — no;
    # 4: kind b + red + n>=15 (3) — yes; 5: n>=15 + red? tag is red_x — (1) no
    assert _ids(docs, q) == [4]


def test_should_is_optional_beside_filter(docs):
    # with a filter present, should defaults to msm 0 (pure scoring
    # in ES; a no-op in filter context)
    q = {
        "bool": {
            "filter": [{"term": {"kind": "a"}}],
            "should": [{"term": {"tag": "nope"}}],
        }
    }
    assert _ids(docs, q) == [1, 2]


def test_wildcard_escapes_like_metachars(docs):
    # the literal _ in "red_x" must be matched by ? (single char),
    # while a literal _ in the PATTERN must not act as LIKE's _
    assert _ids(docs, {"wildcard": {"tag": "red?x"}}) == [5]
    assert _ids(docs, {"wildcard": {"tag": "red_x"}}) == [5]  # literal _
    assert _ids(docs, {"wildcard": {"tag": "re*"}}) == [1, 4, 5]


def test_regexp_is_anchored(docs):
    # ES regexp matches the WHOLE term: "red" must not match "red_x"
    assert _ids(docs, {"regexp": {"tag": "red"}}) == [1, 4]
    assert _ids(docs, {"regexp": {"tag": "red.*"}}) == [1, 4, 5]


def test_match_and_or(docs):
    assert _ids(docs, {"match": {"text": "cat dog"}}) == [1, 2, 3, 5]
    assert _ids(
        docs, {"match": {"text": {"query": "cat dog", "operator": "and"}}}
    ) == [5]


def test_match_phrase_token_boundaries(docs):
    assert _ids(docs, {"match_phrase": {"text": "slow cat"}}) == [2]
    # "cat" alone is a phrase of one token; "ca" is not a token
    assert _ids(docs, {"match_phrase": {"text": "ca"}}) == []


def test_multi_match_or_across_fields(docs):
    # "cat" appears in text of 1,2,5; kind "b" for 3,4 — the OR of
    # per-field matches, NULL-safe (doc 4 has text NULL)
    q = {"multi_match": {"query": "cat b", "fields": ["text", "kind"]}}
    assert _ids(docs, q) == [1, 2, 3, 4, 5]
    q_and = {"multi_match": {"query": "slow cat", "operator": "and",
                             "fields": ["text", "kind"]}}
    assert _ids(docs, q_and) == [2]


def test_percolate_reverse_search(docs):
    from dump_es_parquet_spark.operators.es_search import percolate

    out = percolate(
        docs,
        {
            "reds": {"term": {"tag": "red"}},
            "no_tag": {"bool": {"must_not": [{"exists": {"field": "tag"}}]}},
            "cats": {"match": {"text": "cat"}},
        },
        id_cols=["id"],
    ).collect()
    hits = sorted((r.id, r.query_id) for r in out)
    assert hits == [
        (1, "cats"), (1, "reds"), (2, "cats"), (2, "no_tag"),
        (4, "reds"), (5, "cats"),
    ]


def test_exists_prefix_terms_range(docs):
    assert _ids(docs, {"exists": {"field": "tag"}}) == [1, 3, 4, 5]
    assert _ids(docs, {"prefix": {"kind": "a"}}) == [1, 2]
    assert _ids(docs, {"terms": {"kind": ["a", "c"]}}) == [1, 2, 5]
    assert _ids(docs, {"range": {"n": {"gt": 10, "lte": 40}}}) == [2, 4]


# ---------------------------------------------------------------------------
# aggs
# ---------------------------------------------------------------------------


def test_terms_size_prunes_descendants(spark):
    # kind 'a' has 4 docs, 'b' 2, 'c' 1 → terms size 2 keeps a, b.
    # Every level-2 row under 'c' must vanish with its parent.
    df = spark.createDataFrame(
        [Row(kind=k, sub=s) for k, s in
         [("a", "x")] * 3 + [("a", "y")] + [("b", "x")] * 2 + [("c", "z")]]
    )
    out = compile_aggs(
        df,
        {
            "by_kind": {
                "terms": {"field": "kind", "size": 2},
                "aggs": {"by_sub": {"terms": {"field": "sub"}}},
            }
        },
    ).collect()
    l1 = {r.by_kind for r in out if r.level == 1}
    l2 = {(r.by_kind, r.by_sub) for r in out if r.level == 2}
    assert l1 == {"a", "b"}
    assert l2 == {("a", "x"), ("a", "y"), ("b", "x")}


def test_terms_order_by_key_and_metric(spark):
    df = spark.createDataFrame(
        [Row(kind="a", n=1.0), Row(kind="a", n=3.0),
         Row(kind="b", n=100.0), Row(kind="c", n=5.0)]
    )
    by_key = compile_aggs(
        df,
        {"k": {"terms": {"field": "kind", "size": 2,
                         "order": {"_key": "asc"}}}},
    ).collect()
    assert [r.k for r in by_key] == ["a", "b"]
    by_metric = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind", "size": 1,
                          "order": {"m": "desc"}},
                "aggs": {"m": {"max": {"field": "n"}}},
            }
        },
    ).collect()
    assert [r.k for r in by_metric] == ["b"]


def test_min_doc_count_filters_buckets(spark):
    df = spark.createDataFrame(
        [Row(kind="a")] * 3 + [Row(kind="b")]
    )
    out = compile_aggs(
        df, {"k": {"terms": {"field": "kind", "min_doc_count": 2}}}
    ).collect()
    assert [r.k for r in out] == ["a"]


def test_null_keys_are_dropped(spark):
    df = spark.createDataFrame(
        [Row(kind="a", n=1.0), Row(kind=None, n=2.0)]
    )
    out = compile_aggs(df, {"k": {"terms": {"field": "kind"}}}).collect()
    assert [r.k for r in out] == ["a"]
    assert out[0].doc_count == 1


def test_metrics_report_at_attachment_level(spark):
    df = spark.createDataFrame(
        [Row(kind="a", sub="x", n=10.0), Row(kind="a", sub="y", n=30.0)]
    )
    out = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind"},
                "aggs": {
                    "k_avg": {"avg": {"field": "n"}},
                    "s": {"terms": {"field": "sub"},
                          "aggs": {"s_max": {"max": {"field": "n"}}}},
                },
            }
        },
    ).collect()
    lvl1 = [r for r in out if r.level == 1][0]
    assert lvl1.k_avg == 20.0 and lvl1.s_max is None
    lvl2 = {r.s: r for r in out if r.level == 2}
    assert lvl2["x"].s_max == 10.0 and lvl2["x"].k_avg is None


def test_filters_agg_multi_membership(spark):
    df = spark.createDataFrame(
        [Row(kind="a", n=200.0), Row(kind="a", n=1.0), Row(kind="b", n=300.0)]
    )
    out = compile_aggs(
        df,
        {
            "seg": {
                "filters": {"filters": {
                    "is_a": {"term": {"kind": "a"}},
                    "big": {"range": {"n": {"gte": 100}}},
                }},
            }
        },
    ).collect()
    counts = {r.seg: r.doc_count for r in out}
    # the n=200 'a' doc lands in BOTH buckets
    assert counts == {"is_a": 2, "big": 2}


def test_composite_datehist_source_tiles_pages(spark):
    """Composite with a date_histogram source (round 10): keys are the
    same epoch-millis floor compile_aggs uses, and consecutive
    after-key pages tile the full bucket space without overlap."""
    import datetime as dt

    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, d, h), k=k)
         for d in (1, 2) for h in (0, 12) for k in ("a", "b")]
    )
    sources = [
        {"day": {"date_histogram": {"field": "ts", "fixed_interval": "1d"}}},
        {"kk": {"terms": {"field": "k"}}},
    ]
    page1 = composite_agg(df, sources, size=3).collect()
    assert len(page1) == 3
    after = {"day": page1[-1].day, "kk": page1[-1].kk}
    page2 = composite_agg(df, sources, size=3, after=after).collect()
    keys = [(r.day, r.kk) for r in page1 + page2]
    assert keys == sorted(set(keys)) and len(keys) == 4
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert [k for k, _ in keys] == [t0, t0, t0 + 86400000, t0 + 86400000]
    # every bucket counts its two hour-rows
    assert all(r.doc_count == 2 for r in page1 + page2)

    with pytest.raises(ValueError, match="terms/histogram/date_histogram"):
        composite_agg(df, [{"x": {"range": {"field": "k"}}}])


def test_composite_geotile_source(spark):
    """Round 11: composite sources accept the geo grid kinds through
    the same _Level.key_expr as agg trees — a paged map query."""
    from dump_es_parquet_spark.operators.es_search import composite_agg

    df = spark.createDataFrame(
        [Row(loc=Row(lat=10.0 + 5 * i, lon=20.0 + 25 * i), n=float(i))
         for i in range(4)]  # 25°-spaced lons → 4 distinct 22.5° tiles
    )
    page = composite_agg(
        df,
        [{"tile": {"geotile_grid": {"field": "loc", "precision": 4}}}],
        size=3,
    ).collect()
    assert [r.tile for r in page] == sorted(r.tile for r in page)
    assert len(page) == 3 and all(r.doc_count == 1 for r in page)
    assert all(r.tile.startswith("4/") for r in page)
    after = {"tile": page[-1].tile}
    page2 = composite_agg(
        df,
        [{"tile": {"geotile_grid": {"field": "loc", "precision": 4}}}],
        size=3,
        after=after,
    ).collect()
    assert len(page2) == 1 and page2[0].tile > after["tile"]


def test_composite_after_key_pagination(spark):
    df = spark.createDataFrame(
        [Row(a=a, b=b) for a in ("p", "q") for b in ("1", "2")] * 2
    )
    page1 = composite_agg(df, sources=["a", "b"], size=2).collect()
    assert [(r.a, r.b) for r in page1] == [("p", "1"), ("p", "2")]
    page2 = composite_agg(
        df, sources=["a", "b"], size=2,
        after={"a": page1[-1].a, "b": page1[-1].b},
    ).collect()
    assert [(r.a, r.b) for r in page2] == [("q", "1"), ("q", "2")]
    assert all(r.doc_count == 2 for r in page1 + page2)


def test_geo_queries_box_and_distance(spark):
    """geo_bounding_box / geo_distance on a struct geo_point column:
    box edges inclusive, haversine ≈ 111.2 km per degree of latitude,
    dateline-wrapping boxes match the two half-bands (round 11 —
    previously raised), malformed distances raise."""
    pts = spark.createDataFrame(
        [Row(id=i, loc=Row(lat=float(lat), lon=float(lon)))
         for i, (lat, lon) in enumerate(
             [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (0.0, 3.0), (20.0, 0.0)])]
    )

    def ids(q):
        return sorted(r.id for r in pts.filter(compile_query(q)).collect())

    box = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 2.0, "lon": -1.0},
        "bottom_right": {"lat": 0.0, "lon": 1.0}}}}
    assert ids(box) == [0, 1, 2]  # edges inclusive; lon 3 and lat 20 out

    # one degree of latitude is ~111.19 km on the mean-radius sphere
    near = {"geo_distance": {"distance": "112km",
                             "loc": {"lat": 0.0, "lon": 0.0}}}
    assert ids(near) == [0, 1]
    nearer = {"geo_distance": {"distance": "111km",
                               "loc": {"lat": 0.0, "lon": 0.0}}}
    assert ids(nearer) == [0]
    miles = {"geo_distance": {"distance": "70mi",
                              "loc": {"lat": 0.0, "lon": 0.0}}}
    assert ids(miles) == [0, 1]  # 70 mi ≈ 112.7 km

    # dateline wrap: none of the fixture lons sit in [170,180]∪[-180,-170]
    assert ids({"geo_bounding_box": {"loc": {
        "top_left": {"lat": 2.0, "lon": 170.0},
        "bottom_right": {"lat": 0.0, "lon": -170.0}}}}) == []
    with pytest.raises(ValueError, match="distance"):
        ids({"geo_distance": {"distance": "12 parsecs",
                              "loc": {"lat": 0.0, "lon": 0.0}}})


def test_search_source_wildcards_and_highlight(docs):
    """_source include/exclude wildcards and the highlight section:
    snippet terms come from the request's own match clause; must_not
    text never highlights; a highlight field with no query text
    raises."""
    req = {
        "query": {
            "bool": {
                "must": [{"match": {"text": "cat"}}],
                "must_not": [{"match": {"text": "slow"}}],
            }
        },
        "sort": [{"id": "asc"}],
        "size": 10,
        "_source": {"includes": ["id", "t*"], "excludes": ["tag"]},
        "highlight": {"fields": {"text": {}}, "fragment_size": 20},
    }
    from dump_es_parquet_spark.operators.es_search import search

    out = search(docs, req)
    assert out.columns == ["id", "text", "text_snippet"]
    rows = out.collect()
    # docs with 'cat' but not 'slow': 1 and 5
    assert [r.id for r in rows] == [1, 5]
    # only 'cat' (the must text) is tagged — 'slow' never highlights
    assert all("<em>cat</em>" in r.text_snippet for r in rows)
    assert not any("slow" in (r.text_snippet or "") and "<em>slow" in r.text_snippet for r in rows)

    with pytest.raises(ValueError, match="no\\s+match"):
        search(docs, {"query": {"term": {"kind": "a"}},
                      "highlight": {"fields": {"text": {}}}})
    with pytest.raises(ValueError, match="selects no columns"):
        search(docs, {"_source": ["nope*"]})


def test_search_from_size_pagination(docs):
    req = {
        "query": {"exists": {"field": "n"}},
        "sort": [{"n": {"order": "desc"}}],
        "size": 2,
        "_source": ["id", "n"],
    }
    assert [r.id for r in search(docs, req).collect()] == [5, 4]
    assert [r.id for r in search(docs, {**req, "from": 2}).collect()] == [2, 1]


def test_pipeline_cumulative_and_derivative(spark):
    df = spark.createDataFrame(
        [Row(x=float(b), n=v) for b, vs in
         [(0, [1.0, 2.0]), (1, [4.0]), (2, [10.0, 20.0, 30.0])]
         for v in vs]
    )
    out = compile_aggs(
        df,
        {
            "h": {
                "histogram": {"field": "x", "interval": 1},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "cum": {"cumulative_sum": {"buckets_path": "s"}},
                    "d": {"derivative": {"buckets_path": "s"}},
                    "cum_n": {"cumulative_sum": {"buckets_path": "_count"}},
                },
            }
        },
    ).collect()
    assert [(r.s, r.cum, r.d, r.cum_n) for r in out] == [
        (3.0, 3.0, None, 2.0),
        (4.0, 7.0, 1.0, 3.0),
        (60.0, 67.0, 56.0, 6.0),
    ]


def test_pipeline_needs_sequential_parent(spark):
    df = spark.createDataFrame([Row(kind="a", n=1.0)])
    with pytest.raises(ValueError, match="sequential"):
        compile_aggs(
            df,
            {
                "k": {
                    "terms": {"field": "kind"},
                    "aggs": {
                        "s": {"sum": {"field": "n"}},
                        "c": {"cumulative_sum": {"buckets_path": "s"}},
                    },
                }
            },
        )


def test_bucket_script_substitution(spark):
    df = spark.createDataFrame(
        [Row(x=0.0, n=10.0), Row(x=0.5, n=30.0), Row(x=1.0, n=8.0)]
    )
    out = compile_aggs(
        df,
        {
            "h": {
                "histogram": {"field": "x", "interval": 1},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "ratio": {
                        "bucket_script": {
                            "buckets_path": {"v": "s", "vc": "_count"},
                            "script": "params.v / params.vc",
                        }
                    },
                },
            }
        },
    ).collect()
    # params.vc must not be clobbered by the shorter params.v substitution
    assert [(r.s, r.ratio) for r in out] == [(40.0, 20.0), (8.0, 8.0)]


def test_sibling_max_bucket_over_surviving_children(spark):
    df = spark.createDataFrame(
        [Row(day=0.0, kind=k, n=v) for k, v in
         [("a", 10.0), ("a", 20.0), ("b", 100.0), ("c", 999.0)]]
    )
    # terms size 2 keeps a (2 docs) and b (tie with c, key asc wins);
    # max_bucket must see ONLY the surviving buckets: max(15, 100),
    # not c's 999
    out = compile_aggs(
        df,
        {
            "d": {
                "histogram": {"field": "day", "interval": 1},
                "aggs": {
                    "k": {"terms": {"field": "kind", "size": 2},
                          "aggs": {"m": {"avg": {"field": "n"}}}},
                    "best": {"max_bucket": {"buckets_path": "k>m"}},
                },
            }
        },
    ).collect()
    lvl1 = [r for r in out if r.level == 1][0]
    assert lvl1.best == 100.0
    assert {r.k for r in out if r.level == 2} == {"a", "b"}


def test_bucket_sort_prunes_by_metric_with_from_size(spark):
    # bucket_sort (ADVICE r09): size/from truncation over the parent's
    # buckets, ordered by a sibling metric — and the dropped bucket's
    # DESCENDANTS must drop with it
    df = spark.createDataFrame(
        [Row(kind=k, sub=s, n=v) for k, s, v in
         [("a", "x", 1.0), ("a", "y", 2.0),
          ("b", "x", 50.0), ("c", "x", 10.0), ("c", "y", 20.0)]]
    )
    out = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind", "size": 100},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "keep2": {
                        "bucket_sort": {
                            "sort": [{"s": {"order": "desc"}}],
                            "size": 2,
                        }
                    },
                    "sub": {"terms": {"field": "sub", "size": 100}},
                },
            }
        },
    ).collect()
    # sums: a=3, b=50, c=30 → keep b and c
    assert sorted(r.k for r in out if r.level == 1) == ["b", "c"]
    # a's sub-buckets are gone too
    assert sorted((r.k, r.sub) for r in out if r.level == 2) == [
        ("b", "x"), ("c", "x"), ("c", "y")
    ]

    # from=1: skip the top bucket, keep the rest
    out2 = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind", "size": 100},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "pg": {
                        "bucket_sort": {
                            "sort": [{"s": {"order": "desc"}}],
                            "from": 1,
                        }
                    },
                },
            }
        },
    ).collect()
    assert sorted(r.k for r in out2 if r.level == 1) == ["a", "c"]


def test_moving_fn_and_serial_diff_windows(spark):
    df = spark.createDataFrame(
        [Row(x=float(b), n=v) for b, v in
         [(0, 1.0), (1, 4.0), (2, 2.0), (3, 8.0)]]
    )
    out = compile_aggs(
        df,
        {
            "h": {
                "histogram": {"field": "x", "interval": 1},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "mmax": {
                        "moving_fn": {
                            "buckets_path": "s",
                            "window": 2,
                            "script": "MovingFunctions.max(values)",
                        }
                    },
                    "mavg": {
                        "moving_fn": {
                            "buckets_path": "s",
                            "window": 2,
                            "script": "MovingFunctions.unweightedAvg(values)",
                        }
                    },
                    "sd2": {"serial_diff": {"buckets_path": "s", "lag": 2}},
                },
            }
        },
    ).collect()
    got = [(r.s, r.mmax, r.mavg, r.sd2) for r in sorted(out, key=lambda r: r.h)]
    # trailing window of 2 INCLUDING current; serial_diff lag 2
    assert got == [
        (1.0, 1.0, 1.0, None),
        (4.0, 4.0, 2.5, None),
        (2.0, 4.0, 3.0, 1.0),
        (8.0, 8.0, 5.0, 4.0),
    ]


def test_date_histogram_time_zone_fixed_offset(spark):
    """Round 12: date_histogram ``time_zone`` (fixed ±HH:MM offsets —
    the Kibana browser-tz default): buckets at LOCAL unit boundaries,
    keys = those boundaries' UTC epoch millis. Day + month units;
    gap-fill composes (day grid shifts by -offset); IANA names and
    fixed_interval+time_zone raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    # 2024-01-01T22:00Z is already Jan 2 in +05:30 (03:30 local)
    rows = [
        (dt.datetime(2024, 1, 1, 10, 0), 1.0),
        (dt.datetime(2024, 1, 1, 22, 0), 2.0),
        (dt.datetime(2024, 1, 4, 1, 0), 3.0),   # local Jan 3 is a gap
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    off = int(5.5 * 3_600_000)
    day = 86_400_000

    def day_key(d, h):
        t = int(dt.datetime(2024, 1, d, h).timestamp() * 1000)
        return ((t + off) // day) * day - off

    out = {r.d: r.doc_count for r in compile_aggs(
        df, {"d": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day",
                                      "time_zone": "+05:30"}}}
    ).collect()}
    assert out == {day_key(1, 10): 1, day_key(1, 22): 1,
                   day_key(4, 1): 1}
    assert day_key(1, 22) != day_key(1, 10)  # 22:00Z crossed local midnight
    # gap-fill on the shifted grid: the local Jan-3 day is empty
    filled = sorted(r.d for r in compile_aggs(
        df, {"d": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "day",
                                      "time_zone": "+05:30",
                                      "min_doc_count": 0}}}
    ).collect())
    assert filled == [day_key(1, 10), day_key(1, 22),
                      day_key(1, 22) + day, day_key(4, 1)]
    assert all((k + off) % day == 0 for k in filled)
    # month boundary in local time: 2024-01-31T20:00Z is Feb 1 in +05:30
    mdf = spark.createDataFrame(
        [(dt.datetime(2024, 1, 31, 20, 0), 1.0)], "ts timestamp, v double"
    )
    mout = [r.m for r in compile_aggs(
        mdf, {"m": {"date_histogram": {"field": "ts",
                                       "calendar_interval": "month",
                                       "time_zone": "+05:30"}}}
    ).collect()]
    feb1_local = int(dt.datetime(2024, 2, 1).timestamp() * 1000) - off
    assert mout == [feb1_local]
    with pytest.raises(ValueError, match="not a known IANA zone"):
        compile_aggs(df, {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "time_zone": "Not/A_Zone"}}}).collect()
    with pytest.raises(ValueError, match=r"\[-18:00, \+18:00\]"):
        compile_aggs(df, {"d": {"date_histogram": {
            "field": "ts", "calendar_interval": "day",
            "time_zone": "+99:99"}}}).collect()
    with pytest.raises(ValueError, match="calendar_interval only"):
        compile_aggs(df, {"d": {"date_histogram": {
            "field": "ts", "fixed_interval": "1d",
            "time_zone": "+05:30"}}}).collect()


def test_date_histogram_time_zone_iana(spark):
    """Round 13 (VERDICT r12 Next #1): date_histogram under an IANA
    ``time_zone`` — local-calendar day buckets through the tzdb, the
    spring-forward local day 23 instant-hours wide, gap-fill stepping
    the LOCAL grid; sub-day units keep exact per-instant offsets so
    the fall-back overlap hours stay distinct buckets."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    def utc_ms(*a):
        return int(
            dt.datetime(*a, tzinfo=dt.timezone.utc).timestamp() * 1000
        )

    H = 3_600_000
    # NY: EST = UTC-5 through 2024-03-10 02:00 local, then EDT = UTC-4
    mar9 = utc_ms(2024, 3, 9, 5)    # Mar 9 00:00 EST
    mar10 = utc_ms(2024, 3, 10, 5)  # Mar 10 00:00 EST
    mar11 = utc_ms(2024, 3, 11, 4)  # Mar 11 00:00 EDT — 23 h after mar10
    assert mar11 - mar10 == 23 * H
    rows = [
        (dt.datetime(2024, 3, 9, 12, 0), 1.0),   # Mar 9 07:00 EST
        (dt.datetime(2024, 3, 10, 6, 30), 2.0),  # Mar 10 01:30 EST
        (dt.datetime(2024, 3, 11, 3, 0), 3.0),   # Mar 10 23:00 EDT!
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    body = {"field": "ts", "calendar_interval": "day",
            "time_zone": "America/New_York"}
    out = {r.d: r.doc_count for r in compile_aggs(
        df, {"d": {"date_histogram": dict(body)}}).collect()}
    assert out == {mar9: 1, mar10: 2}
    # gap-fill: extended bounds Mar 7 .. Mar 13 (UTC instants inside
    # those local days) — the grid steps 24,24,24,23,24,24 hours
    filled = sorted(r.d for r in compile_aggs(
        df, {"d": {"date_histogram": {
            **body, "min_doc_count": 0,
            "extended_bounds": {"min": utc_ms(2024, 3, 7, 12),
                                "max": utc_ms(2024, 3, 13, 12)},
        }}}).collect())
    assert filled == [
        utc_ms(2024, 3, 7, 5), utc_ms(2024, 3, 8, 5), mar9, mar10,
        mar11, utc_ms(2024, 3, 12, 4), utc_ms(2024, 3, 13, 4),
    ]
    # hour unit at the 2024-11-03 fall-back: 01:30 EDT and 01:30 EST
    # are DISTINCT instants and must stay distinct hour buckets
    fb = spark.createDataFrame(
        [(dt.datetime(2024, 11, 3, 5, 30), 1.0),   # 01:30 EDT
         (dt.datetime(2024, 11, 3, 6, 30), 2.0)],  # 01:30 EST
        "ts timestamp, v double",
    )
    hout = sorted(r.h for r in compile_aggs(
        fb, {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "hour",
            "time_zone": "America/New_York"}}}).collect())
    assert hout == [utc_ms(2024, 11, 3, 5), utc_ms(2024, 11, 3, 6)]
    # month under IANA: 2024-03-01 00:00 EST anchor despite the
    # mid-month transition
    mout = [r.m for r in compile_aggs(
        df, {"m": {"date_histogram": {
            "field": "ts", "calendar_interval": "month",
            "time_zone": "America/New_York"}}}).collect()]
    assert mout == [utc_ms(2024, 3, 1, 5)]
    # sub-day gap-fill under a named zone: allowed when every offset
    # the zone uses is congruent mod the unit width (whole-hour-shift
    # zones — hourly keys stay on ONE epoch grid across DST); a
    # half-hour-offset zone shifts the grid phase; Lord Howe's
    # 30-minute DST jump leaves any single grid and raises
    filled_h = sorted(r.h for r in compile_aggs(
        spark.createDataFrame(
            [(dt.datetime(2024, 3, 10, 5, 30), 1.0),    # 00:30 EST
             (dt.datetime(2024, 3, 10, 9, 30), 2.0)],   # 05:30 EDT
            "ts timestamp, v double"),
        {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "hour",
            "time_zone": "America/New_York",
            "min_doc_count": 0}}}).collect())
    assert len(filled_h) == 5 and {
        filled_h[i + 1] - filled_h[i] for i in range(4)} == {H}
    kolk = sorted(r.h for r in compile_aggs(
        spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 0, 10), 1.0),
             (dt.datetime(2024, 1, 1, 2, 40), 2.0)],
            "ts timestamp, v double"),
        {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "hour",
            "time_zone": "Asia/Kolkata",
            "min_doc_count": 0}}}).collect())
    assert len(kolk) == 4 and {k % H for k in kolk} == {1_800_000}
    with pytest.raises(ValueError, match="single epoch grid"):
        compile_aggs(fb, {"h": {"date_histogram": {
            "field": "ts", "calendar_interval": "hour",
            "time_zone": "Australia/Lord_Howe",
            "min_doc_count": 0}}}).collect()


def test_moving_fn_extended_functions(spark):
    """Round 13 (VERDICT r12 Next #5): MovingFunctions.stdDev /
    linearWeightedAvg / ewma — trailing window over the grid, gap
    buckets' NULLs dropping from every function's values array;
    unknown scripts (custom Painless) and bad alphas still raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(hours=h), float(v))
            for h, v in [(0, 2), (1, 4), (3, 8), (4, 1)]]  # hour 2 gap
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {r.h: r for r in compile_aggs(df, {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour",
                           "min_doc_count": 0},
        "aggs": {
            "sv": {"sum": {"field": "v"}},
            "mstd": {"moving_fn": {"buckets_path": "sv", "window": 3,
                     "script": "MovingFunctions.stdDev(values, "
                               "MovingFunctions.unweightedAvg(values))"}},
            "lwa": {"moving_fn": {"buckets_path": "sv", "window": 3,
                    "script":
                        "MovingFunctions.linearWeightedAvg(values)"}},
            "ew": {"moving_fn": {"buckets_path": "sv", "window": 3,
                   "script": "MovingFunctions.ewma(values, 0.3)"}},
        }}}).collect()}
    H = 3_600_000
    k0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
    got = [(out[k0 + i * H].mstd, out[k0 + i * H].lwa, out[k0 + i * H].ew)
           for i in range(5)]
    # hand-computed: windows of the non-NULL values
    # h0 [2] | h1 [2,4] | h2(gap) [2,4] | h3 [4,8] | h4 [8,1]
    assert got == [
        (0.0, 2.0, 2.0),
        (1.0, round(10 / 3, 6), 2.6),         # lwa (2·1+4·2)/3
        (1.0, round(10 / 3, 6), 2.6),         # gap: same values array
        (2.0, round(20 / 3, 6), 5.2),         # ewma 8·.3+4·.7
        (3.5, round(10 / 3, 6), 5.9),         # std √((64+1)/2−4.5²)
    ]
    with pytest.raises(ValueError, match="moving_fn script"):
        # custom Painless stays the documented bound (holt landed
        # round 14 — test_moving_fn_holt_randomized pins it)
        compile_aggs(df, {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "bad": {"moving_fn": {"buckets_path": "sv",
                             "window": 3,
                             "script": "values.stream().map(v -> v*2)"
                                       ".sum()"}}}}})
    with pytest.raises(ValueError, match="alpha"):
        compile_aggs(df, {"h": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "bad": {"moving_fn": {"buckets_path": "sv",
                             "window": 3,
                             "script":
                                 "MovingFunctions.ewma(values, 1.5)"}}}}})


def test_gapfill_positional_pipelines_stride_empties(spark):
    """Round 12 (VERDICT r11 Next #8): moving_fn / serial_diff /
    bucket_sort at a gap-filled level run AFTER the fill, so empty
    buckets occupy window POSITIONS (their NULL values drop from the
    aggregates — ES's gap_policy 'skip') — the r11 raise removed."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), 10.0),
        (dt.datetime(2024, 1, 1, 0, 30), 20.0),
        (dt.datetime(2024, 1, 1, 1, 5), 30.0),
        (dt.datetime(2024, 1, 1, 4, 0), 40.0),  # hours 2-3 are gaps
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    aggs = {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "1h", "min_doc_count": 0},
        "aggs": {
            "s": {"sum": {"field": "v"}},
            "mv": {"moving_fn": {"buckets_path": "s", "window": 3,
                                 "script": "MovingFunctions.sum(values)"}},
            "sd": {"serial_diff": {"buckets_path": "s", "lag": 1}},
        }}}
    out = {r.h: (r.doc_count, r.s, r.mv, r.sd)
           for r in compile_aggs(df, aggs).collect()}
    h0 = 1704067200000
    H = 3600000
    assert len(out) == 5
    # hour 4's trailing-3 window covers two EMPTY positions → 40, not
    # 30+30+40 (which the pre-fill windows produced)
    assert out[h0 + 4 * H] == (1, 40.0, 40.0, None)
    # a gap position carries the window over its empty self
    assert out[h0 + 2 * H] == (0, None, 60.0, None)
    assert out[h0 + 3 * H] == (0, None, 30.0, None)
    # serial_diff at hour 1 sees hour 0 (real): 30 - 30 = 0
    assert out[h0 + 1 * H] == (1, 30.0, 60.0, 0.0)
    # bucket_sort at a gap level ranks the FILLED grid: top-3 by
    # _key asc keeps hours 0,1,2 — including the empty hour 2
    bs = {"h": {"date_histogram": {
        "field": "ts", "fixed_interval": "1h", "min_doc_count": 0},
        "aggs": {
            "s": {"sum": {"field": "v"}},
            "trunc": {"bucket_sort": {"sort": [{"_key": "asc"}],
                                      "size": 3}},
        }}}
    kept = sorted(r.h for r in compile_aggs(df, bs).collect())
    assert kept == [h0, h0 + H, h0 + 2 * H]


def test_moving_fn_rejects_unknown_script_and_shift(spark):
    df = spark.createDataFrame([Row(x=0.0, n=1.0)])
    base = {"histogram": {"field": "x", "interval": 1}}
    with pytest.raises(ValueError, match="MovingFunctions"):
        compile_aggs(df, {"h": {**base, "aggs": {
            "s": {"sum": {"field": "n"}},
            "m": {"moving_fn": {"buckets_path": "s", "window": 2,
                                "script": "MovingFunctions.stdDev(values)"}},
        }}})
    with pytest.raises(ValueError, match="shift"):
        compile_aggs(df, {"h": {**base, "aggs": {
            "s": {"sum": {"field": "n"}},
            "m": {"moving_fn": {"buckets_path": "s", "window": 2, "shift": 1,
                                "script": "MovingFunctions.max(values)"}},
        }}})


def test_date_histogram_gapfill_interior_and_bounds(spark):
    # min_doc_count 0 + extended_bounds (VERDICT r09 Next #4): empty
    # buckets synthesized on the grid — interior gaps AND the bound
    # extensions — with doc_count 0 / NULL metrics
    import datetime as dt

    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, h), n=float(h))
         for h in (0, 3)]  # hours 1, 2 are gaps
    )
    h = 3_600_000
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    out = compile_aggs(
        df,
        {
            "per_hour": {
                "date_histogram": {
                    "field": "ts",
                    "calendar_interval": "hour",
                    "min_doc_count": 0,
                    "extended_bounds": {"min": t0 - h, "max": t0 + 4 * h},
                },
                "aggs": {"s": {"sum": {"field": "n"}}},
            }
        },
    ).collect()
    got = [(r.per_hour, r.doc_count, r.s) for r in out]
    assert got == [
        (t0 - h, 0, None),      # bound extension before
        (t0, 1, 0.0),
        (t0 + h, 0, None),      # interior gap
        (t0 + 2 * h, 0, None),  # interior gap
        (t0 + 3 * h, 1, 3.0),
        (t0 + 4 * h, 0, None),  # bound extension after
    ]


def test_date_histogram_gapfill_default_off_and_variable_width(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, h), n=1.0) for h in (0, 3)]
    )
    # no explicit min_doc_count / extended_bounds: NO synthesis (the
    # documented default — flipping ES's implicit 0 on would change
    # every existing date_histogram answer)
    plain = compile_aggs(
        df,
        {"per_hour": {"date_histogram": {"field": "ts",
                                         "calendar_interval": "hour"}}},
    ).collect()
    assert len(plain) == 2


def test_auto_date_histogram_ladder(spark):
    """Round 11: auto_date_histogram picks the smallest ladder
    interval fitting the buckets target, reports it as a literal
    column, and equals the explicit date_histogram at that interval."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import (
        _auto_dh_choice,
        compile_aggs,
    )

    h = 3_600_000
    # pure-chooser cases: (span_ms, target) -> label
    assert _auto_dh_choice(0, 9 * 1000, 10)[1] == "1s"
    assert _auto_dh_choice(0, 50 * 1000, 10)[1] == "10s"
    assert _auto_dh_choice(0, 4 * h, 10)[1] == "30m"
    assert _auto_dh_choice(0, 20 * h, 10)[1] == "3h"
    assert _auto_dh_choice(0, 9 * 24 * h, 10)[1] == "day"
    assert _auto_dh_choice(0, 30 * 24 * h, 10)[1] == "7d"
    assert _auto_dh_choice(0, 200 * 24 * h, 10)[1] == "month"
    assert _auto_dh_choice(0, 3000 * 24 * h, 10)[1] == "year"
    with pytest.raises(ValueError, match="ladder"):
        _auto_dh_choice(0, 400 * 366 * 24 * h, 10)

    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1 + 3 * i), n=float(i))
         for i in range(9)]  # 25-day span -> 7d at target 10, day at 40
    )
    out = compile_aggs(
        df,
        {"a": {"auto_date_histogram": {"field": "ts"},
               "aggs": {"s": {"sum": {"field": "n"}}}}},
    ).collect()
    assert all(r.a_interval == "7d" for r in out)
    explicit = compile_aggs(
        df,
        {"a": {"date_histogram": {"field": "ts", "fixed_interval": "7d"},
               "aggs": {"s": {"sum": {"field": "n"}}}}},
    ).select("a", "doc_count", "s").collect()
    assert sorted((r.a, r.doc_count, r.s) for r in out) == sorted(
        map(tuple, explicit)
    )
    out2 = compile_aggs(
        df,
        {"a": {"auto_date_histogram": {"field": "ts", "buckets": 40}}},
    ).collect()
    assert all(r.a_interval == "day" for r in out2) and len(out2) == 9


def test_range_overlap_multi_membership(spark):
    """Round 11 raised on overlapping ranges; round 12 (VERDICT r11
    Next #5) supports them — ES puts a doc in EVERY range it fits,
    compiled as a multi-membership explode. Touching ranges
    (to == next from) stay single-membership (the CASE fast path)."""
    df = spark.createDataFrame([Row(v=5.0)])
    out = compile_aggs(df, {"b": {"range": {"field": "v", "ranges": [
        {"key": "a", "to": 10}, {"key": "b", "from": 5},
    ]}}}).collect()
    assert sorted((r.b, r.doc_count) for r in out) == [("a", 1), ("b", 1)]
    # touching is fine (from-inclusive / to-exclusive) — one bucket
    out = compile_aggs(df, {"b": {"range": {"field": "v", "ranges": [
        {"key": "a", "to": 5}, {"key": "b", "from": 5},
    ]}}}).collect()
    assert [(r.b, r.doc_count) for r in out] == [("b", 1)]


def test_search_aggs_runtime_mappings(spark):
    """Round 11: the aggs side of a request honors runtime_mappings —
    a runtime field can be both queried and bucketed on."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [Row(n=5.0), Row(n=15.0), Row(n=25.0)]
    )
    out = search_aggs(
        df,
        {
            "runtime_mappings": {"band": {"script_sql": "floor(n / 10)"}},
            "query": {"range": {"band": {"gte": 1}}},
            "aggs": {"by_band": {"terms": {"field": "band",
                                           "order": {"_key": "asc"}}}},
        },
    ).collect()
    assert [(r.by_band, r.doc_count) for r in out] == [(1, 1), (2, 1)]


def test_pipeline_gap_policy_insert_zeros(spark):
    """Round 11: pipeline gap_policy — 'skip' is the pinned SQL-NULL
    behavior; 'insert_zeros' coalesces the source to 0 before the
    window (cumulative_sum keeps accumulating, derivative measures
    against 0), incl. bucket_script params; unknown policies raise."""
    df = spark.createDataFrame(
        [Row(d=0.0, n=10.0), Row(d=1.0, n=None), Row(d=2.0, n=30.0)]
    )
    aggs = {
        "b": {"histogram": {"field": "d", "interval": 1},
              "aggs": {
                  "m": {"avg": {"field": "n"}},
                  "cs": {"cumulative_sum": {"buckets_path": "m",
                                            "gap_policy": "insert_zeros"}},
                  "dv": {"derivative": {"buckets_path": "m",
                                        "gap_policy": "insert_zeros"}},
                  "bs": {"bucket_script": {
                      "buckets_path": {"v": "m"},
                      "script": "params.v * 2",
                      "gap_policy": "insert_zeros"}},
              }},
    }
    out = {r.b: (r.cs, r.dv, r.bs) for r in compile_aggs(df, aggs).collect()}
    assert out == {
        0.0: (10.0, None, 20.0),
        1.0: (10.0, -10.0, 0.0),
        2.0: (40.0, 30.0, 60.0),
    }
    with pytest.raises(ValueError, match="gap_policy"):
        compile_aggs(df, {"b": {"histogram": {"field": "d", "interval": 1},
                                "aggs": {"cs": {"cumulative_sum": {
                                    "buckets_path": "_count",
                                    "gap_policy": "keep"}}}}}).collect()


def test_terms_order_list(spark):
    """Round 11: terms `order` as a tie-breaking LIST of criteria."""
    df = spark.createDataFrame(
        [Row(k="a", n=1.0), Row(k="b", n=9.0), Row(k="c", n=5.0),
         Row(k="c", n=5.0)]
    )
    out = compile_aggs(
        df,
        {"t": {"terms": {"field": "k", "size": 2,
                         "order": [{"_count": "desc"}, {"m": "desc"}]},
               "aggs": {"m": {"max": {"field": "n"}}}}},
    ).collect()
    # counts: c=2, a=1, b=1 → tie a/b broken by max(n) desc → b
    assert sorted(r.t for r in out) == ["b", "c"]


def test_filters_other_bucket(spark):
    """Round 11: ES filters `other_bucket` — docs matching NO filter
    land in one extra bucket (named by other_bucket_key) instead of
    vanishing; a doc matching several filters still explodes into
    each, never into the other bucket; name collisions raise."""
    df = spark.createDataFrame(
        [Row(k="a", n=10.0), Row(k="b", n=200.0), Row(k="c", n=50.0)]
    )
    spec = {
        "seg": {
            "filters": {
                "filters": {
                    "is_a": {"term": {"k": "a"}},
                    "big": {"range": {"n": {"gte": 40}}},
                },
                "other_bucket_key": "rest",
            },
            "aggs": {"s": {"sum": {"field": "n"}}},
        }
    }
    out = compile_aggs(df, spec).collect()
    assert sorted((r.seg, r.doc_count, r.s) for r in out) == [
        ("big", 2, 250.0), ("is_a", 1, 10.0),
    ]
    # add a no-match doc: it lands in 'rest'
    df2 = df.union(spark.createDataFrame([Row(k="z", n=1.0)]))
    out2 = compile_aggs(df2, spec).collect()
    assert sorted((r.seg, r.doc_count, r.s) for r in out2) == [
        ("big", 2, 250.0), ("is_a", 1, 10.0), ("rest", 1, 1.0),
    ]
    with pytest.raises(ValueError, match="collides"):
        compile_aggs(df, {"seg": {"filters": {
            "filters": {"is_a": {"term": {"k": "a"}}},
            "other_bucket_key": "is_a"}}})


def test_histogram_gapfill_numeric(spark):
    """Round 11: numeric histogram gap-fill — interior gaps and
    extended_bounds on a float grid (interval 25, offset 5);
    synthesized buckets carry doc_count 0 / NULL metrics."""
    df = spark.createDataFrame(
        [Row(v=10.0, n=1.0), Row(v=112.0, n=2.0)]
    )
    out = compile_aggs(
        df,
        {"b": {"histogram": {"field": "v", "interval": 25.0,
                             "offset": 5.0, "min_doc_count": 0,
                             "extended_bounds": {"min": -40, "max": 150}},
               "aggs": {"s": {"sum": {"field": "n"}}}}},
    ).collect()
    got = [(r.b, r.doc_count, r.s) for r in out]
    assert got == [
        (-45.0, 0, None), (-20.0, 0, None),
        (5.0, 1, 1.0),
        (30.0, 0, None), (55.0, 0, None), (80.0, 0, None),
        (105.0, 1, 2.0),
        (130.0, 0, None),
    ]


def test_date_histogram_gapfill_month_and_quarter(spark):
    """Round 11 (VERDICT r10 Next #5): the variable-width calendar
    units fill by INTERVAL-n-MONTH sequences — interior gaps between
    real buckets AND extended_bounds edges, bounds truncated onto
    the unit grid; synthesized rows carry doc_count 0 / NULL
    metrics."""
    import datetime as dt

    def ms(y, m):
        return int(dt.datetime(y, m, 1, tzinfo=dt.timezone.utc)
                   .timestamp() * 1000)

    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 5), n=1.0),
         Row(ts=dt.datetime(2024, 4, 20), n=2.0)]
    )
    out = compile_aggs(
        df,
        {"m": {"date_histogram": {"field": "ts",
                                  "calendar_interval": "month",
                                  "min_doc_count": 0,
                                  # mid-November 2023 .. mid-June 2024:
                                  # bounds truncate onto month starts
                                  "extended_bounds": {
                                      "min": ms(2023, 11) + 86_400_000,
                                      "max": ms(2024, 6) + 86_400_000,
                                  }},
               "aggs": {"s": {"sum": {"field": "n"}}}}},
    ).collect()
    got = [(r.m, r.doc_count, r.s) for r in out]
    assert got == [
        (ms(2023, 11), 0, None), (ms(2023, 12), 0, None),
        (ms(2024, 1), 1, 1.0),
        (ms(2024, 2), 0, None), (ms(2024, 3), 0, None),
        (ms(2024, 4), 1, 2.0),
        (ms(2024, 5), 0, None), (ms(2024, 6), 0, None),
    ]
    # quarter: Q1/Q3 real, Q2 interior gap; no bounds
    df2 = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 2, 5), n=1.0),
         Row(ts=dt.datetime(2024, 8, 20), n=2.0)]
    )
    out2 = compile_aggs(
        df2,
        {"q": {"date_histogram": {"field": "ts",
                                  "calendar_interval": "quarter",
                                  "min_doc_count": 0}}},
    ).collect()
    assert [(r.q, r.doc_count) for r in out2] == [
        (ms(2024, 1), 1), (ms(2024, 4), 0), (ms(2024, 7), 1)
    ]


def test_date_histogram_offset_and_terms_missing(spark):
    """ES date_histogram `offset` shifts every bucket boundary; terms
    `missing` routes NULL-field docs into the substitute bucket
    instead of dropping them; calendar_interval + offset raises."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, 1), k="a", n=1.0),
            Row(ts=dt.datetime(2024, 1, 1, 3), k=None, n=2.0),
        ]
    )
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    h = 3_600_000
    out = compile_aggs(
        df,
        {
            "g": {
                "date_histogram": {"field": "ts", "fixed_interval": "2h",
                                   "offset": "+1h"},
                "aggs": {"k": {"terms": {"field": "k",
                                         "missing": "(none)"}}},
            }
        },
    ).collect()
    # boundaries at 01:00, 03:00 — the 01:00 doc and 03:00 doc land in
    # different buckets (without offset both would share [00:00,02:00)
    # / [02:00,04:00) differently)
    lvl1 = sorted(r.g for r in out if r.level == 1)
    assert lvl1 == [t0 + h, t0 + 3 * h]
    lvl2 = sorted((r.g, r.k) for r in out if r.level == 2)
    assert lvl2 == [(t0 + h, "a"), (t0 + 3 * h, "(none)")]

    with pytest.raises(ValueError, match="fixed_interval only"):
        compile_aggs(
            df,
            {"g": {"date_histogram": {"field": "ts",
                                      "calendar_interval": "hour",
                                      "offset": "+1h"}}},
        )
    # gap-filling respects the shifted grid
    gap = compile_aggs(
        df,
        {
            "g": {
                "date_histogram": {"field": "ts", "fixed_interval": "1h",
                                   "offset": "+30m", "min_doc_count": 0}
            }
        },
    ).collect()
    halfh = 1_800_000
    assert [r.g for r in gap] == [
        t0 + halfh, t0 + halfh + h, t0 + halfh + 2 * h
    ]
    assert [r.doc_count for r in gap] == [1, 0, 1]


def test_streamable_aggs_fixed_offset_equals_batch(spark, sf_dir):
    from dump_es_parquet_spark.operators.es_search import streamable_aggs
    from dump_es_parquet_spark.operators.tables import load

    tree = {
        "g": {
            "date_histogram": {"field": "ts", "fixed_interval": "6h",
                               "offset": "+2h"},
            "aggs": {"sum_value": {"sum": {"field": "value"}}},
        }
    }
    events = load(spark, sf_dir, "events")
    batch = sorted(map(tuple, streamable_aggs(events, tree).collect()))
    leaf = (
        compile_aggs(events, tree)
        .filter("level = 1")
        .select("g", "doc_count", "sum_value")
    )
    assert sorted(map(tuple, leaf.collect())) == batch and batch


def test_date_histogram_gapfill_per_parent_partition(spark):
    # nested under terms: each parent bucket fills ITS OWN gaps only
    import datetime as dt

    df = spark.createDataFrame(
        [
            Row(kind="a", ts=dt.datetime(2024, 1, 1, 0), n=1.0),
            Row(kind="a", ts=dt.datetime(2024, 1, 1, 2), n=2.0),
            Row(kind="b", ts=dt.datetime(2024, 1, 1, 5), n=5.0),
        ]
    )
    out = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind"},
                "aggs": {
                    "per_hour": {
                        "date_histogram": {
                            "field": "ts",
                            "calendar_interval": "hour",
                            "min_doc_count": 0,
                        }
                    }
                },
            }
        },
    ).collect()
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1000)
    h = 3_600_000
    lvl2 = [(r.k, r.per_hour, r.doc_count) for r in out if r.level == 2]
    # a: hour 1 filled between 0 and 2; b: single bucket, nothing to fill
    assert sorted(lvl2) == [
        ("a", t0, 1), ("a", t0 + h, 0), ("a", t0 + 2 * h, 1),
        ("b", t0 + 5 * h, 1),
    ]


def test_top_hits_on_non_leaf_bucket(spark):
    """Round 14 (VERDICT r13 Next #4, lifting the r10 innermost-only
    bound): top_hits beside a deeper bucket returns the union frame —
    regular bucket rows for every level PLUS rank-bearing doc rows at
    the carrying level, each half NULL on the other's columns."""
    df = spark.createDataFrame(
        [
            Row(kind="a", sub="x", n=3.0, id=1),
            Row(kind="a", sub="x", n=9.0, id=2),
            Row(kind="a", sub="y", n=1.0, id=3),
            Row(kind="b", sub="x", n=5.0, id=4),
        ]
    )
    out = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind"},
                "aggs": {
                    "examples": {
                        "top_hits": {
                            "size": 1,
                            "sort": [{"n": "desc"}, {"id": "asc"}],
                            "_source": ["id"],
                        }
                    },
                    "sub": {"terms": {"field": "sub"}},
                    "sn": {"sum": {"field": "n"}},
                },
            }
        },
    ).collect()
    bucket1 = {(r.k, r.doc_count, r.sn)
               for r in out if r.level == 1 and r.examples_rank is None}
    assert bucket1 == {("a", 3, 13.0), ("b", 1, 5.0)}
    bucket2 = {(r.k, r.sub, r.doc_count) for r in out if r.level == 2}
    assert bucket2 == {("a", "x", 2), ("a", "y", 1), ("b", "x", 1)}
    docs = {(r.k, r.examples_rank, r.id)
            for r in out if r.examples_rank is not None}
    assert docs == {("a", 1, 2), ("b", 1, 4)}
    # doc rows carry NULLs on the bucket half and vice versa
    assert all(r.doc_count is None and r.sn is None and r.sub is None
               for r in out if r.examples_rank is not None)
    assert all(r.id is None for r in out if r.examples_rank is None)

    # two top_hits sections in one chain raise
    with pytest.raises(ValueError, match="one top_hits"):
        compile_aggs(
            df,
            {
                "k": {
                    "terms": {"field": "kind"},
                    "aggs": {
                        "e1": {"top_hits": {"size": 1}},
                        "sub": {
                            "terms": {"field": "sub"},
                            "aggs": {"e2": {"top_hits": {"size": 1}}},
                        },
                    },
                }
            },
        )
    # a _source column colliding with a bucket-frame column (here: a
    # metric named like the source column) raises
    with pytest.raises(ValueError, match="collide"):
        compile_aggs(
            df,
            {
                "k": {
                    "terms": {"field": "kind"},
                    "aggs": {
                        "examples": {
                            "top_hits": {
                                "size": 1,
                                "sort": [{"id": "asc"}],
                                "_source": ["id"],
                            }
                        },
                        "id": {"sum": {"field": "n"}},
                        "sub": {"terms": {"field": "sub"}},
                    },
                }
            },
        )


def test_extended_stats_exact_moments(spark):
    """extended_stats: population variance/std/±σ bounds from exact
    decimal moments — hand-checked on values whose moments are exact."""
    df = spark.createDataFrame(
        [Row(k="a", v=v) for v in (2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)]
    )
    out = compile_aggs(
        df,
        {"k": {"terms": {"field": "k"},
               "aggs": {"v": {"extended_stats": {"field": "v",
                                                 "sigma": 1.0}}}}},
    ).collect()[0]
    # classic example: mean 5, population variance 4, std 2
    assert (out.v_count, out.v_min, out.v_max, out.v_sum) == (8.0, 2.0, 9.0, 40.0)
    assert out.v_avg == 5.0 and out.v_var == 4.0 and out.v_std == 2.0
    assert out.v_sos == 232.0
    assert (out.v_std_lower, out.v_std_upper) == (3.0, 7.0)


def test_weighted_avg_and_top_metrics(spark):
    """weighted_avg = Σ(v·w)/Σw; top_metrics returns the metric at
    the top-sorted doc, sort ties broken by the metric value (the
    struct-max discipline both engines share); NULL sort/metric rows
    drop from the aggregate."""
    df = spark.createDataFrame(
        [
            Row(k="a", v=10.0, w=1.0, s=1.0),
            Row(k="a", v=40.0, w=3.0, s=2.0),
            Row(k="b", v=5.0, w=2.0, s=2.0),   # tie on s...
            Row(k="b", v=9.0, w=2.0, s=2.0),   # ...max picks v=9
            Row(k="b", v=99.0, w=None, s=None),  # drops from top_metrics
        ]
    )
    out = {r.k: r for r in compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "k"},
                "aggs": {
                    "wa": {"weighted_avg": {"value": {"field": "v"},
                                            "weight": {"field": "w"}}},
                    "top": {"top_metrics": {"metrics": {"field": "v"},
                                            "sort": {"s": "desc"}}},
                },
            }
        },
    ).collect()}
    assert out["a"].wa == (10 * 1 + 40 * 3) / 4.0  # 32.5
    assert out["a"].top == 40.0
    assert out["b"].top == 9.0  # tie on s=2.0 → larger metric
    # weighted_avg ignores NULL weights' products (NULL product drops)
    assert out["b"].wa == (5 * 2 + 9 * 2) / 4.0


def test_filter_missing_and_date_range_buckets(spark):
    """The single-bucket aggs (filter, missing) and date_range: filter
    holds a full query DSL body, missing is the complement of the
    terms `missing` substitute, date_range buckets on epoch-millis
    bounds (from-inclusive / to-exclusive; non-int bounds raise)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(ts=t0, kind="a", n=10.0),
            Row(ts=dt.datetime(2024, 1, 2), kind=None, n=200.0),
            Row(ts=dt.datetime(2024, 1, 3), kind="b", n=300.0),
        ]
    )
    out = compile_aggs(
        df,
        {
            "big": {
                "filter": {"range": {"n": {"gte": 100}}},
                "aggs": {"s": {"sum": {"field": "n"}}},
            }
        },
    ).collect()
    assert [(r.big, r.doc_count, r.s) for r in out] == [("big", 2, 500.0)]

    out2 = compile_aggs(
        df, {"no_kind": {"missing": {"field": "kind"}}}
    ).collect()
    assert [(r.no_kind, r.doc_count) for r in out2] == [("no_kind", 1)]

    ms0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
              .timestamp() * 1000)
    day = 86_400_000
    out3 = compile_aggs(
        df,
        {
            "era": {
                "date_range": {
                    "field": "ts",
                    "ranges": [
                        {"key": "early", "to": ms0 + day},
                        {"key": "late", "from": ms0 + day},
                    ],
                }
            }
        },
    ).collect()
    assert sorted((r.era, r.doc_count) for r in out3) == [
        ("early", 1), ("late", 2)
    ]
    # round 15: ISO-8601 string bounds WORK (normalized to epoch
    # millis once, the original string in the default key) — the
    # pre-r15 raise is upgraded; junk strings still raise
    out4 = compile_aggs(df, {"e": {"date_range": {
        "field": "ts", "ranges": [{"from": "2024-01-02"}]}}}).collect()
    assert [(r.e, r.doc_count) for r in out4] == [("2024-01-02-*", 2)]
    with pytest.raises(ValueError, match="epoch millis|ISO"):
        compile_aggs(df, {"e": {"date_range": {
            "field": "ts", "ranges": [{"from": "not-a-date"}]}}}).collect()


def _geohash_ref(lat, lon, precision):
    """Pure-python textbook geohash (bisection) to pin the unrolled
    bit-interleave expression against."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, [], True
    n = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits = (bits << 1) | 1
                lon_lo = mid
            else:
                bits <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        n += 1
        if n == 5:
            out.append(b32[bits])
            bits, n = 0, 0
    return "".join(out)


def test_geohash_grid_and_geo_centroid(spark):
    """geohash_grid (round 11, VERDICT r10 Next #6): the unrolled
    bit-interleave must reproduce the textbook geohash — including
    the canonical u4pruydqqvj example — and geo_centroid reports the
    exact-decimal mean pair, ignoring docs missing the point."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    pts = [
        (57.64911, 10.40744),   # canonical: u4pruydqqvj
        (0.0, 0.0), (-89.9, -179.9), (89.9, 179.9),
        (48.8583, 2.2945), (-33.8568, 151.2153),
    ]
    df = spark.createDataFrame(
        [Row(i=i, loc=Row(lat=la, lon=lo)) for i, (la, lo) in enumerate(pts)]
    )
    for p in (1, 5, 11):
        got = {
            r.i: r.cell
            for r in df.select(
                "i",
                compile_aggs.__globals__["_geohash_expr"](
                    F.col("loc.lat"), F.col("loc.lon"), p
                ).alias("cell"),
            ).collect()
        }
        for i, (la, lo) in enumerate(pts):
            assert got[i] == _geohash_ref(la, lo, p), (p, la, lo)
    assert _geohash_ref(57.64911, 10.40744, 11) == "u4pruydqqvj"

    # bucket + centroid: two cells, NULL point ignored by the
    # centroid but counted nowhere (NULL key drops the doc from the
    # level; no ancestor here)
    df2 = spark.createDataFrame(
        [
            Row(loc=Row(lat=10.0, lon=10.0)),
            Row(loc=Row(lat=10.2, lon=10.2)),
            Row(loc=Row(lat=-50.0, lon=-50.0)),
            Row(loc=Row(lat=None, lon=None)),
        ]
    )
    out = compile_aggs(
        df2,
        {"cells": {
            "geohash_grid": {"field": "loc", "precision": 1},
            "aggs": {"c": {"geo_centroid": {"field": "loc"}}},
        }},
    ).collect()
    got2 = sorted((r.cells, r.doc_count, r.c_lat, r.c_lon) for r in out)
    assert got2 == [
        ("4", 1, -50.0, -50.0),
        ("s", 2, 10.1, 10.1),
    ]


def test_nested_agg_counts_objects(spark):
    """The nested AGGREGATION re-bases rows onto array objects:
    doc_count counts OBJECTS, empty/NULL arrays contribute nothing,
    sub-aggs reference nested fields via their full path;
    nested-inside-nested raises (one re-basing per chain)."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="x", attrs=[Row(k="a", w=10.0), Row(k="b", w=20.0)]),
            Row(g="y", attrs=[Row(k="a", w=30.0)]),
            Row(g="z", attrs=[]),
            Row(g="w", attrs=None),
        ]
    )
    out = compile_aggs(
        df,
        {"objs": {"nested": {"path": "attrs"},
                  "aggs": {"by_k": {"terms": {"field": "attrs.k"},
                                    "aggs": {"aw": {"avg": {"field":
                                                            "attrs.w"}}}}}}},
    ).collect()
    assert [(r.objs, r.doc_count) for r in out if r.level == 1] == [
        ("objs", 3)
    ]
    assert sorted((r.by_k, r.doc_count, r.aw) for r in out
                  if r.level == 2) == [("a", 2, 20.0), ("b", 1, 20.0)]
    # a second nested level must name an inner array INSIDE the
    # outer path (two-level chains work since round 14 —
    # test_nested_inside_nested_aggregation); re-nesting the SAME
    # path is not an inner array and raises
    with pytest.raises(ValueError, match="absolute path under"):
        compile_aggs(
            df,
            {"objs": {"nested": {"path": "attrs"},
                      "aggs": {"again": {"nested": {"path": "attrs"}}}}},
        )


def test_nested_agg_non_root_and_reverse_nested(spark):
    """Round 12 (VERDICT r11 Next #3): nested under terms — the
    "per category, per attribute" shape real nested mappings exist
    for. Ancestor levels count PARENT DOCS and aggregate parent
    fields once per doc (the object explode must not multiply them);
    the nested level and below count OBJECTS; reverse_nested
    re-bases a bucket's doc_count onto distinct parents."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(id=1, cat="a", val=10.0,
                attrs=[Row(k="x", v=1.0), Row(k="y", v=2.0)]),
            Row(id=2, cat="a", val=20.0, attrs=[Row(k="x", v=3.0)]),
            Row(id=3, cat="b", val=30.0, attrs=[]),
            Row(id=4, cat="b", val=40.0,
                attrs=[Row(k="y", v=4.0), Row(k="y", v=5.0)]),
            Row(id=5, cat=None, val=50.0, attrs=None),
        ]
    )
    out = compile_aggs(
        df,
        {"by_cat": {"terms": {"field": "cat", "size": 10}, "aggs": {
            "sum_val": {"sum": {"field": "val"}},
            "objs": {"nested": {"path": "attrs"}, "aggs": {
                "by_k": {"terms": {"field": "attrs.k", "size": 10},
                         "aggs": {
                             "avg_v": {"avg": {"field": "attrs.v"}},
                             "parents": {"reverse_nested": {}},
                         }},
            }},
        }}},
    ).collect()
    # ancestor: parent docs, parent-field sum NOT object-multiplied
    assert sorted((r.by_cat, r.doc_count, r.sum_val) for r in out
                  if r.level == 1) == [("a", 2, 30.0), ("b", 2, 70.0)]
    # nested level: objects per category (empty array → none)
    assert sorted((r.by_cat, r.doc_count) for r in out
                  if r.level == 2) == [("a", 3), ("b", 2)]
    # leaf: objects per key; reverse_nested = distinct parent docs
    assert sorted(
        (r.by_cat, r.by_k, r.doc_count, r.avg_v, r.parents_doc_count)
        for r in out if r.level == 3
    ) == [
        ("a", "x", 2, 2.0, 2.0),
        ("a", "y", 1, 2.0, 1.0),
        ("b", "y", 2, 4.5, 1.0),
    ]
    # reverse_nested outside a nested scope fails loudly
    with pytest.raises(ValueError, match="reverse_nested"):
        compile_aggs(
            df,
            {"by_cat": {"terms": {"field": "cat"},
                        "aggs": {"p": {"reverse_nested": {}}}}},
        )


def test_overlapping_ranges_multi_membership(spark):
    """Round 12 (VERDICT r11 Next #5): ES puts a doc in EVERY range
    it fits — overlapping ranges now take a multi-membership explode
    instead of raising. Ancestor doc_counts and metrics must come
    from the pre-explode frame (one representative row per doc), and
    the single-membership consumers (composite) still raise."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="a", n=5.0, v=1.0),
            Row(g="a", n=15.0, v=2.0),   # lands in BOTH bands
            Row(g="a", n=25.0, v=3.0),
            Row(g="b", n=15.0, v=4.0),
            Row(g="b", n=None, v=5.0),   # no band, still counts in g=b
        ]
    )
    ranges = [
        {"key": "low", "from": 0, "to": 20},
        {"key": "mid", "from": 10, "to": 30},
    ]
    out = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "sum_v": {"sum": {"field": "v"}},
            "bands": {"range": {"field": "n", "ranges": ranges},
                      "aggs": {"avg_n": {"avg": {"field": "n"}}}},
        }}},
    ).collect()
    # ancestors: parent docs and parent-field sums, NOT membership-
    # multiplied (the ADVICE-r10 uncorrupted-ancestor pattern)
    assert sorted((r.byg, r.doc_count, r.sum_v) for r in out
                  if r.level == 1) == [("a", 3, 6.0), ("b", 2, 9.0)]
    # multi-membership: n=15 in both low and mid
    assert sorted((r.byg, r.bands, r.doc_count, r.avg_n) for r in out
                  if r.level == 2) == [
        ("a", "low", 2, 10.0), ("a", "mid", 2, 20.0),
        ("b", "low", 1, 15.0), ("b", "mid", 1, 15.0),
    ]
    # geo_distance overlapping rings take the same route
    gdf = spark.createDataFrame(
        [Row(id=1, loc=Row(lat=0.0, lon=0.0)),
         Row(id=2, loc=Row(lat=0.0, lon=5.0))]
    )
    gout = compile_aggs(
        gdf,
        {"rings": {"geo_distance": {
            "field": "loc", "origin": {"lat": 0.0, "lon": 0.0},
            "ranges": [{"key": "r1", "to": 300000.0},
                       {"key": "r2", "to": 1000000.0}],
        }}},
    ).collect()
    assert sorted((r.rings, r.doc_count) for r in gout) == [
        ("r1", 1), ("r2", 2)
    ]
    # the single-membership key path (composite/streaming/top_hits
    # consumers) still raises on overlap
    from dump_es_parquet_spark.operators.es_search import _Level

    with pytest.raises(ValueError, match="overlap"):
        _Level("bands", "range",
               {"field": "n", "ranges": ranges}).key_expr()


def test_gapfill_grid_completeness_randomized(spark):
    """Round 12 property: for seeded random SPARSE hourly series, the
    gap-filled date_histogram emits every grid key between the
    extended bounds exactly once, real buckets keep their counts,
    synthesized ones report doc_count 0 / NULL metrics — and the
    same holds on a +05:30-shifted grid (every key ≡ -offset mod
    width)."""
    import datetime as dt
    import random

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rnd = random.Random(77)
    H = 3_600_000
    base = dt.datetime(2024, 1, 1)
    for trial in range(3):
        hours = sorted(rnd.sample(range(0, 72), rnd.randint(3, 8)))
        rows = [
            (base + dt.timedelta(hours=h, minutes=rnd.randint(0, 59)),
             float(rnd.randint(1, 9)))
            for h in hours for _ in range(rnd.randint(1, 3))
        ]
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        eb = {"min": int(base.timestamp() * 1000) - 5 * H,
              "max": int(base.timestamp() * 1000) + 80 * H}
        for tz, off in ((None, 0), ("+05:30", int(5.5 * H))):
            body = {"field": "ts", "calendar_interval": "hour",
                    "min_doc_count": 0, "extended_bounds": eb}
            if tz:
                body["time_zone"] = tz
            out = compile_aggs(
                df, {"h": {"date_histogram": body,
                           "aggs": {"sv": {"sum": {"field": "v"}}}}}
            ).collect()
            keys = [r.h for r in out]
            assert len(keys) == len(set(keys)), "duplicate grid keys"
            assert all((k + off) % H == 0 for k in keys)
            lo_grid = ((eb["min"] + off) // H) * H - off
            hi_grid = ((eb["max"] + off) // H) * H - off
            assert min(keys) == lo_grid and max(keys) == hi_grid
            assert keys == sorted(keys) and len(keys) == (
                (hi_grid - lo_grid) // H + 1
            ), "grid has holes"
            total_docs = sum(r.doc_count for r in out)
            assert total_docs == len(rows)
            for r in out:
                if r.doc_count == 0:
                    assert r.sv is None


def test_multi_membership_ancestor_invariance_randomized(spark):
    """Round 12 property: adding ANY multi-membership child level
    (nested / overlapping ranges / non-root filters /
    adjacency_matrix) must leave the parent level's rows EXACTLY as
    they are without it — seeded random docs with NULLs and
    variable-length arrays, ancestor rows compared bit-for-bit. This
    is the invariant the representative-row machinery exists for
    (ADVICE r10 #1's wrong-answer class, generalized)."""
    import random

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rnd = random.Random(31)
    for trial in range(4):
        rows = []
        for i in range(24):
            arr = (
                None
                if rnd.random() < 0.15
                else [
                    Row(k=rnd.choice("xyz"), w=float(rnd.randint(0, 9)))
                    for _ in range(rnd.randint(0, 3))
                ]
            )
            rows.append(
                Row(
                    g=rnd.choice(["a", "b", None]),
                    n=(None if rnd.random() < 0.2
                       else float(rnd.randint(0, 100))),
                    v=float(rnd.randint(0, 50)),
                    attrs=arr,
                )
            )
        df = spark.createDataFrame(rows)
        parent = {"terms": {"field": "g", "size": 10}}
        parent_metrics = {
            "sv": {"sum": {"field": "v"}},
            "av": {"avg": {"field": "n"}},
            "cd": {"cardinality": {"field": "n"}},
        }
        base = compile_aggs(
            df, {"byg": {**parent, "aggs": dict(parent_metrics)}}
        )
        base_rows = sorted(
            map(tuple, base.filter(F.col("level") == 1)
                .select("byg", "doc_count", "sv", "av", "cd").collect())
        )
        children = {
            "nested": {"objs": {"nested": {"path": "attrs"}, "aggs": {
                "byk": {"terms": {"field": "attrs.k"}}}}},
            "overlap": {"bands": {"range": {"field": "n", "ranges": [
                {"key": "lo", "from": 0, "to": 60},
                {"key": "mid", "from": 40, "to": 80},
                {"key": "hi", "from": 70},
            ]}}},
            "filters": {"cls": {"filters": {"filters": {
                "big": {"range": {"n": {"gte": 50}}},
                "band": {"range": {"n": {"gte": 30, "lte": 70}}},
            }, "other_bucket": True}}},
            "adjacency": {"adj": {"adjacency_matrix": {"filters": {
                "A": {"range": {"n": {"gte": 40}}},
                "B": {"range": {"v": {"gte": 25}}},
            }}}},
        }
        for cname, child in children.items():
            out = compile_aggs(
                df,
                {"byg": {**parent, "aggs": {**parent_metrics, **child}}},
            )
            got = sorted(
                map(tuple, out.filter(F.col("level") == 1)
                    .select("byg", "doc_count", "sv", "av", "cd")
                    .collect())
            )
            assert got == base_rows, (
                f"trial {trial} child {cname}: ancestors changed "
                f"{got} != {base_rows}"
            )


def test_significant_terms_keyword_jlh(spark):
    """Round 12: root significant_terms over a keyword field — one
    flag-column scan, JLH = (fg% − bg%)·(fg%/bg%) in micro longs,
    min_doc_count on the FOREGROUND count, negative-signal buckets
    dropped; sub-aggs raise."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = ([Row(t="error", host="h-err")] * 6
            + [Row(t="error", host="h-mix")] * 3
            + [Row(t="ok", host="h-mix")] * 8
            + [Row(t="ok", host="h-ok")] * 8
            + [Row(t="ok", host="h-err")] * 1)
    df = spark.createDataFrame(rows)
    out = search_aggs(df, {
        "query": {"term": {"t": "error"}},
        "aggs": {"sig_hosts": {"significant_terms": {
            "field": "host", "size": 5, "min_doc_count": 2}}},
    }).collect()
    # h-err: fg 6/9 vs bg 7/26 → JLH (.667−.269)·(.667/.269) ≈ .984;
    # h-mix is UNDER-represented (negative) and h-ok has fg 0
    assert [(r.sig_hosts, r.doc_count, r.bg_count, r.score_micro)
            for r in out] == [("h-err", 6, 7, 984126)]
    with pytest.raises(ValueError, match="sub-agg"):
        search_aggs(df, {"aggs": {"s": {
            "significant_terms": {"field": "host"},
            "aggs": {"m": {"value_count": {"field": "t"}}}}}})


def test_string_stats_entropy(spark):
    """Round 13: string_stats ``entropy: true`` — Shannon entropy of
    the bucket's character distribution via the dedicated
    char-histogram path; a bucket with only NULL/empty values
    reports 0.0 like ES."""
    import math

    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame([
        Row(g="x", s="ab"), Row(g="x", s="bba"),
        Row(g="y", s=None), Row(g="y", s=""),
    ])
    out = {r.byg: r for r in search_aggs(df, {"aggs": {"byg": {
        "terms": {"field": "g"},
        "aggs": {"st": {"string_stats": {"field": "s",
                                         "entropy": True}}}}}}).collect()}
    # x: chars a:2 b:3 → -(0.4·log2 0.4 + 0.6·log2 0.6)
    want = round(-sum(
        round(p * math.log2(p), 12) for p in (2 / 5, 3 / 5)), 6)
    assert (out["x"].doc_count, out["x"].st_count, out["x"].st_min_length,
            out["x"].st_max_length, out["x"].st_avg_length,
            out["x"].st_entropy) == (2, 2.0, 2.0, 3.0, 2.5, want)
    assert out["y"].st_entropy == 0.0 and out["y"].st_count == 1.0


def test_string_stats_show_distribution(spark):
    """Round 13: show_distribution flattens ES's per-char probability
    map to one row per (bucket, char); probabilities sum to 1 within
    a bucket; inside the one-rollup plan it still raises with the
    routing pointer."""
    from dump_es_parquet_spark.operators.es_search import (
        compile_aggs,
        search_aggs,
    )

    df = spark.createDataFrame([
        Row(g="x", s="ab"), Row(g="x", s="bba"),
        Row(g="y", s="cc"),
    ])
    out = search_aggs(df, {"aggs": {"byg": {
        "terms": {"field": "g"},
        "aggs": {"st": {"string_stats": {
            "field": "s", "show_distribution": True}}}}}}).collect()
    got = {(r.byg, r.st_char): (r.doc_count, r.st_char_count,
                                r.st_prob_r6) for r in out}
    assert got == {
        ("x", "a"): (2, 2.0, 0.4),
        ("x", "b"): (2, 3.0, 0.6),
        ("y", "c"): (1, 2.0, 1.0),
    }
    with pytest.raises(ValueError, match="dedicated per-"):
        compile_aggs(df, {"byg": {
            "terms": {"field": "g"},
            "aggs": {"n": {"value_count": {"field": "s"}},
                     "st": {"string_stats": {
                         "field": "s", "show_distribution": True}}}}})


def test_boxplot_and_derivative_unit(spark):
    """Round 13: boxplot = exact quartiles in the one rollup;
    derivative unit = value / (actual key delta / unit) so a bucket
    after a gap normalizes over the wider span; unit on a
    non-date_histogram parent raises."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rows = [(dt.datetime(2024, 1, 1, 0, 0), 2.0),
            (dt.datetime(2024, 1, 1, 0, 30), 4.0),
            (dt.datetime(2024, 1, 1, 2, 15), 9.0),
            (dt.datetime(2024, 1, 2, 0, 0), 1.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = sorted(compile_aggs(df, {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "b": {"boxplot": {"field": "v"}},
                 "d": {"derivative": {"buckets_path": "sv",
                                      "unit": "1h"}}}}}).collect(),
        key=lambda r: r.h)
    got = [(r.sv, r.b_min, r.b_q1_r6, r.b_q2_r6, r.b_q3_r6, r.b_max,
            r.d, r.d_normalized_r6) for r in out]
    assert got == [
        (6.0, 2.0, 2.5, 3.0, 3.5, 4.0, None, None),
        (9.0, 9.0, 9.0, 9.0, 9.0, 9.0, 3.0, 1.5),     # 2-hour gap
        (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, -8.0, round(-8 / 22, 6)),
    ]
    with pytest.raises(ValueError, match="date_histogram parent"):
        compile_aggs(df, {"g": {
            "histogram": {"field": "v", "interval": 1},
            "aggs": {"c": {"value_count": {"field": "v"}},
                     "d": {"derivative": {"buckets_path": "c",
                                          "unit": "1h"}}}}})


def test_rate_and_mad(spark):
    """Round 13: rate divides the bucket total by the bucket's
    ACTUAL length in `unit` (leap February = 29 days), doc-count
    mode without a field, value_count mode; MAD is the exact
    median of absolute deviations (odd + even counts, NULLs
    dropped). Non-date_histogram parents and IANA zones raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rows = [
        (dt.datetime(2024, 1, 3), 2.0),
        (dt.datetime(2024, 1, 9), 4.0),
        (dt.datetime(2024, 1, 20), 12.0),
        (dt.datetime(2024, 2, 5), 5.0),
        (dt.datetime(2024, 2, 6), None),
        (dt.datetime(2024, 2, 7), 11.0),
        (dt.datetime(2024, 2, 8), 1.0),
        (dt.datetime(2024, 2, 9), 3.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = sorted(
        compile_aggs(df, {"m": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "month"},
            "aggs": {
                "per_day": {"rate": {"field": "v", "unit": "day"}},
                "docs_per_week": {"rate": {"unit": "week"}},
                "vals_per_day": {"rate": {"field": "v", "unit": "day",
                                          "mode": "value_count"}},
                "mad": {"median_absolute_deviation": {"field": "v"}},
            }}}).collect(),
        key=lambda r: r.m,
    )
    jan, feb = out
    # January: 31 days; sum 18, 3 docs, 3 values
    assert jan.per_day_r6 == round(18.0 / 31, 6)
    assert jan.docs_per_week_r6 == round(3.0 / (31 * 86400000 / 604800000.0), 6)
    assert jan.vals_per_day_r6 == round(3.0 / 31, 6)
    # January values 2,4,12 → median 4, devs (0,2,8) → MAD 2
    assert jan.mad_r6 == 2.0
    # February 2024: LEAP — 29 days; 5 docs, 4 non-NULL values sum 20
    assert feb.per_day_r6 == round(20.0 / 29, 6)
    assert feb.docs_per_week_r6 == round(5.0 / (29 * 86400000 / 604800000.0), 6)
    assert feb.vals_per_day_r6 == round(4.0 / 29, 6)
    # February values 1,3,5,11 → median 4, devs (1,1,3,7) → MAD 2
    assert feb.mad_r6 == 2.0
    with pytest.raises(ValueError, match="date_histogram parent"):
        compile_aggs(df, {"g": {
            "histogram": {"field": "v", "interval": 1},
            "aggs": {"r": {"rate": {"unit": "day"}}}}})
    # rate under an IANA time_zone works since round 14 (the local
    # boundary date resolves through the tzdb): a doc at Jan 1
    # 02:00 UTC is still DECEMBER in New_York, so its month divides
    # by 31 December days
    out = compile_aggs(df.limit(0).union(spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 2, 0,
                      tzinfo=dt.timezone.utc), 10.0)],
        df.schema)), {"m": {
        "date_histogram": {"field": "ts",
                           "calendar_interval": "month",
                           "time_zone": "America/New_York"},
        "aggs": {"r": {"rate": {"field": "v", "unit": "day"}}}}}
    ).collect()
    dec_key = int(dt.datetime(
        2023, 12, 1, 5, 0, tzinfo=dt.timezone.utc).timestamp() * 1000)
    assert [(r.m, r.r_r6) for r in out] == [(dec_key, round(10 / 31, 6))]
    with pytest.raises(ValueError, match="month-family"):
        compile_aggs(df, {"h": {
            "date_histogram": {"field": "ts", "fixed_interval": "1d"},
            "aggs": {"r": {"rate": {"unit": "month"}}}}})


def test_percentiles_and_extended_stats_bucket(spark):
    """Round 13: the two remaining sibling *_bucket pipes —
    percentiles_bucket (exact interpolation over the child buckets'
    values) and extended_stats_bucket (the moment tree) report on
    the PARENT row; a dangling buckets_path still raises."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    rows = [
        ("a", dt.datetime(2024, 1, 1), 1.0),
        ("a", dt.datetime(2024, 1, 2), 3.0),
        ("a", dt.datetime(2024, 1, 3), 5.0),
        ("a", dt.datetime(2024, 1, 4), 7.0),
        ("b", dt.datetime(2024, 1, 1), 10.0),
    ]
    df = spark.createDataFrame(rows, "t string, ts timestamp, v double")
    out = compile_aggs(df, {"by_t": {
        "terms": {"field": "t", "size": 10},
        "aggs": {
            "per_day": {
                "date_histogram": {"field": "ts", "fixed_interval": "1d"},
                "aggs": {"sv": {"sum": {"field": "v"}}},
            },
            "pb": {"percentiles_bucket": {"buckets_path": "per_day>sv",
                                          "percents": [50, 75]}},
            "esb": {"extended_stats_bucket": {
                "buckets_path": "per_day>sv"}},
        }}}).collect()
    a = next(r for r in out if r.level == 1 and r.by_t == "a")
    b = next(r for r in out if r.level == 1 and r.by_t == "b")
    # a's daily sums: 1,3,5,7 → p50 = 4, p75 = 5.5
    assert (a.pb_p50_r6, a.pb_p75_r6) == (4.0, 5.5)
    assert (a.esb_count, a.esb_min, a.esb_max, a.esb_sum, a.esb_avg) == (
        4.0, 1.0, 7.0, 16.0, 4.0)
    # Σv² = 1+9+25+49 = 84; var = (4·84 − 256)/16 = 5; std = √5
    assert (a.esb_sos, a.esb_var) == (84.0, 5.0)
    assert a.esb_std == 5.0 ** 0.5
    assert a.esb_std_upper == 4.0 + 2.0 * 5.0 ** 0.5
    assert (b.pb_p50_r6, b.esb_var, b.esb_std) == (10.0, 0.0, 0.0)
    # child rows carry no pipe values
    assert all(r.pb_p50_r6 is None for r in out if r.level == 2)
    with pytest.raises(ValueError, match="child bucket agg"):
        compile_aggs(df, {"by_t": {
            "terms": {"field": "t", "size": 10},
            "aggs": {
                "per_day": {"date_histogram": {"field": "ts",
                                               "fixed_interval": "1d"}},
                "pb": {"percentiles_bucket": {
                    "buckets_path": "nope>sv"}}}}})


def test_moving_percentiles_and_global(spark):
    """Round 13: moving_percentiles merges the trailing buckets' RAW
    value multisets (gap-filled empties occupy positions and
    contribute nothing); global compiles its sub-tree over the
    UNFILTERED frame. Dangling paths / parameters raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import (
        compile_aggs,
        search_aggs,
    )

    rows = [(dt.datetime(2024, 1, 1, 0), 1.0),
            (dt.datetime(2024, 1, 1, 0), 3.0),
            (dt.datetime(2024, 1, 1, 1), 5.0),
            (dt.datetime(2024, 1, 1, 3), 7.0),
            (dt.datetime(2024, 1, 1, 3), 9.0)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = sorted(
        compile_aggs(df, {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour",
                               "min_doc_count": 0},
            "aggs": {
                "pct": {"percentiles": {"field": "v",
                                        "percents": [50, 100]}},
                "mp": {"moving_percentiles": {"buckets_path": "pct",
                                              "window": 2}},
            }}}).collect(),
        key=lambda r: r.h,
    )
    got = [(r.doc_count, r.pct_p50_r6, r.mp_p50_r6, r.mp_p100_r6)
           for r in out]
    assert got == [
        (2, 2.0, 2.0, 3.0),   # {1,3}
        (1, 5.0, 3.0, 5.0),   # {1,3} ∪ {5}
        (0, None, 5.0, 5.0),  # gap hour: window = {5} only
        (2, 8.0, 8.0, 9.0),   # {7,9} (gap hour contributed nothing)
    ]
    # the hidden _hmp plumbing never reaches the output schema
    assert not [c for c in out[0].asDict() if c.startswith("_hmp")]
    with pytest.raises(ValueError, match="sibling percentiles"):
        compile_aggs(df, {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "mp": {"moving_percentiles": {
                         "buckets_path": "sv", "window": 2}}}}})

    gdf = df.withColumn("t", (df.v > 4).cast("string"))
    g = search_aggs(gdf, {
        "query": {"range": {"v": {"gte": 100}}},  # matches nothing
        "aggs": {"all": {"global": {}, "aggs": {
            "by_t": {"terms": {"field": "t", "size": 10},
                     "aggs": {"av": {"avg": {"field": "v"}}}}}}}})
    assert sorted((r.by_t, r.doc_count, r.av) for r in g.collect()) == [
        ("false", 2, 2.0), ("true", 3, 7.0)]
    with pytest.raises(ValueError, match="no parameters"):
        search_aggs(gdf, {"aggs": {"all": {
            "global": {"field": "t"}, "aggs": {}}}})
    with pytest.raises(ValueError, match="sub-aggregations"):
        search_aggs(gdf, {"aggs": {"all": {"global": {}}}})


def test_cumulative_cardinality(spark):
    """Round 13: cumulative_cardinality — each value counts at its
    FIRST bucket, the running sum carried across gap-filled empties;
    non-sequential parents and deeper bucket chains raise."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), 1),
        (dt.datetime(2024, 1, 1, 0, 40), 2),
        (dt.datetime(2024, 1, 1, 1, 10), 1),   # repeat: no new user
        (dt.datetime(2024, 1, 1, 3, 10), 3),   # hour 2 is a gap
        (dt.datetime(2024, 1, 1, 3, 20), 1),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, uid long")
    req = {"aggs": {"per_hour": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour",
                           "min_doc_count": 0},
        "aggs": {"u": {"cardinality": {"field": "uid"}},
                 "cum_u": {"cumulative_cardinality":
                           {"buckets_path": "u"}}},
    }}}
    out = sorted(search_aggs(df, req).collect(),
                 key=lambda r: r.per_hour)
    assert [(r.doc_count, r.u, r.cum_u) for r in out] == [
        (2, 2.0, 2), (1, 1.0, 2), (0, None, 2), (2, 2.0, 3)]
    with pytest.raises(ValueError, match="sequential"):
        search_aggs(df, {"aggs": {"g": {
            "terms": {"field": "uid"},
            "aggs": {"u": {"cardinality": {"field": "uid"}},
                     "c": {"cumulative_cardinality":
                           {"buckets_path": "u"}}}}}})
    with pytest.raises(ValueError, match="single-level"):
        search_aggs(df, {"aggs": {"per_hour": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour"},
            "aggs": {"u": {"cardinality": {"field": "uid"}},
                     "c": {"cumulative_cardinality":
                           {"buckets_path": "u"}},
                     "sub": {"terms": {"field": "uid"}}}}}})
    with pytest.raises(ValueError, match="sibling cardinality"):
        search_aggs(df, {"aggs": {"per_hour": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour"},
            "aggs": {"u": {"value_count": {"field": "uid"}},
                     "c": {"cumulative_cardinality":
                           {"buckets_path": "u"}}}}}})


def test_sampler_and_diversified_sampler(spark):
    """Round 13: sampler / diversified_sampler — sub-aggs over a
    deterministic explicit-sort sample; the diversified per-value
    cap never deduplicates docs MISSING the field (ES rule); a body
    without sort raises (per-shard score sampling has no lake
    reading)."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = [
        Row(id=1, u=1, t="a", v=9.0),
        Row(id=2, u=1, t="a", v=8.0),
        Row(id=3, u=1, t="a", v=7.0),   # third doc of u=1: capped out
        Row(id=4, u=2, t="b", v=6.0),
        Row(id=5, u=None, t="b", v=5.0),
        Row(id=6, u=None, t="b", v=4.0),  # missing u: never deduped
        Row(id=7, u=3, t="a", v=1.0),     # below the top-5 cut
    ]
    df = spark.createDataFrame(rows)
    req = {"aggs": {"sample": {
        "diversified_sampler": {
            "field": "u", "max_docs_per_value": 2, "shard_size": 5,
            "sort": [{"v": {"order": "desc"}}, {"id": {"order": "asc"}}],
        },
        "aggs": {"by_t": {"terms": {"field": "t"},
                          "aggs": {"sv": {"sum": {"field": "v"}}}}},
    }}}
    out = sorted((r.by_t, r.doc_count, r.sv)
                 for r in search_aggs(df, req).collect())
    # survivors of the cap: ids 1,2 (u=1), 4 (u=2), 5,6 (u missing),
    # 7 (u=3) → top-5 by (v desc, id): 1,2,4,5,6
    assert out == [("a", 2, 17.0), ("b", 3, 15.0)]
    # plain sampler: no cap, top-5 = ids 1,2,3,4,5
    req2 = {"aggs": {"sample": {
        "sampler": {"shard_size": 5,
                    "sort": [{"v": {"order": "desc"}},
                             {"id": {"order": "asc"}}]},
        "aggs": {"by_t": {"terms": {"field": "t"},
                          "aggs": {"sv": {"sum": {"field": "v"}}}}},
    }}}
    out2 = sorted((r.by_t, r.doc_count, r.sv)
                  for r in search_aggs(df, req2).collect())
    assert out2 == [("a", 3, 24.0), ("b", 2, 11.0)]
    with pytest.raises(ValueError, match="explicit 'sort'"):
        search_aggs(df, {"aggs": {"s": {
            "sampler": {"shard_size": 5},
            "aggs": {"by_t": {"terms": {"field": "t"}}}}}})
    with pytest.raises(ValueError, match="sub-agg"):
        search_aggs(df, {"aggs": {"s": {
            "sampler": {"shard_size": 5, "sort": ["id"]}}}})


def test_significant_text_request_shape(spark):
    """Round 13: significant_text — the analyzed-token sibling of
    significant_terms as a request shape over the corpus operator;
    flat ES-row columns, query as foreground, sub-aggs raise."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [Row(t="error", msg="disk failing badly")] * 4
        + [Row(t="ok", msg="all systems nominal")] * 8
        + [Row(t="error", msg="disk nominal")] * 1
    )
    out = search_aggs(df, {
        "query": {"term": {"t": "error"}},
        "aggs": {"sig": {"significant_text": {
            "field": "msg", "size": 5, "min_doc_count": 2}}},
    }).collect()
    # disk fg 5/5 scores highest; badly/failing (fg 4) tie and break
    # on term asc; the ok-side words are under-represented and drop
    assert [r.sig for r in out] == ["disk", "badly", "failing"]
    r = out[0]
    assert (r.level, r.doc_count, r.bg_count) == (1, 5, 5)
    assert r.score_micro > out[1].score_micro > 0
    with pytest.raises(ValueError, match="sub-agg"):
        search_aggs(df, {"aggs": {"s": {
            "significant_text": {"field": "msg"},
            "aggs": {"m": {"value_count": {"field": "t"}}}}}})


def test_significant_terms_under_terms(spark):
    """Round 13 (VERDICT r12 Next #3): terms > significant_terms —
    per parent bucket the foreground is that bucket's query hits,
    the background stays the WHOLE index; per-bucket JLH micro
    scores, parent size cap, NULL parents dropped, NULL terms
    counted in bucket sizes but never as term buckets."""
    import math

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = (
        # svc a: errors concentrate on host hx (4/5 fg vs 6/20 bg)
        [Row(svc="a", t="error", host="hx")] * 4
        + [Row(svc="a", t="error", host=None)] * 1
        + [Row(svc="a", t="ok", host="hy")] * 5
        # svc b: errors concentrate on hy (3/3 fg vs 8/20 bg)
        + [Row(svc="b", t="error", host="hy")] * 3
        + [Row(svc="b", t="ok", host="hx")] * 2
        + [Row(svc="b", t="ok", host="hz")] * 4
        # a NULL parent error row: drops from parents, stays in bg
        + [Row(svc=None, t="error", host="hx")] * 1
    )
    df = spark.createDataFrame(rows)
    out = search_aggs(df, {
        "query": {"term": {"t": "error"}},
        "aggs": {"by_svc": {"terms": {"field": "svc", "size": 10},
                            "aggs": {"sig_host": {"significant_terms": {
                                "field": "host", "size": 5,
                                "min_doc_count": 2}}}}},
    }).collect()
    got = [(r.by_svc, r.sig_host, r.doc_count, r.bg_count,
            r.score_micro) for r in out]

    def jlh(fg, fgd, bg, nd):
        fgp, bgp = fg / fgd, bg / nd
        return math.floor(1e6 * ((fgp - bgp) * (fgp / bgp)))

    # svc a: 5 fg docs (the NULL-host one counts in the size), hx
    # fg 4 ≥ min_doc_count; svc b: 3 fg docs, hy fg 3. Backgrounds
    # are INDEX-wide: hx 7 of 20 docs, hy 8 of 20.
    assert got == [
        ("a", "hx", 4, 7, jlh(4, 5, 7, 20)),
        ("b", "hy", 3, 8, jlh(3, 3, 8, 20)),
    ]
    # parent size cap: size 1 keeps only the largest fg bucket (a)
    capped = search_aggs(df, {
        "query": {"term": {"t": "error"}},
        "aggs": {"by_svc": {"terms": {"field": "svc", "size": 1},
                            "aggs": {"sig_host": {"significant_terms": {
                                "field": "host",
                                "min_doc_count": 2}}}}},
    }).collect()
    assert [(r.by_svc, r.sig_host) for r in capped] == [("a", "hx")]


def test_bucket_selector_and_normalize(spark):
    """Round 12: bucket_selector = HAVING for buckets (script over
    buckets_path columns, descendants dropped with their bucket,
    evaluated AFTER the other pipelines like ES); normalize =
    rescale_0_1/0_100/percent_of_sum windows over the level's
    buckets, computed BEFORE selection prunes."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [Row(g=k, v=float(i)) for i, k in enumerate(
            ["a", "a", "a", "b", "b", "c"])]
    )
    out = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "sv": {"sum": {"field": "v"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"n": "_count"},
                "script": "params.n >= 2"}},
            "share": {"normalize": {"buckets_path": "sv",
                                    "method": "percent_of_sum"}},
            "scaled": {"normalize": {"buckets_path": "sv",
                                     "method": "rescale_0_100"}},
        }}},
    ).collect()
    got = sorted((r.byg, r.doc_count, r.share, r.scaled) for r in out)
    # c (1 doc) dropped by the selector — but its sv=5 participated
    # in the normalize windows computed before selection (ES order)
    assert got == [("a", 3, 0.2, 0.0), ("b", 2, 0.466667, 100.0)]
    # round 13 (VERDICT r12 Next #7): z-score + softmax (the latter
    # chained onto the z column via buckets_path)
    import math

    zout = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "sv": {"sum": {"field": "v"}},
            "z": {"normalize": {"buckets_path": "sv",
                                "method": "z-score"}},
            "sm": {"normalize": {"buckets_path": "z",
                                 "method": "softmax"}},
        }}},
    ).collect()
    zgot = sorted((r.byg, r.z, r.sm) for r in zout)
    vals = {"a": 3.0, "b": 7.0, "c": 5.0}
    mean = 5.0
    std = math.sqrt(sum(x * x for x in vals.values()) / 3 - mean * mean)
    zs = {k: round((x - mean) / std, 6) for k, x in vals.items()}
    mx = max(zs.values())
    es = {k: round(math.exp(z - mx), 12) for k, z in zs.items()}
    tot = sum(es.values())
    assert zgot == [(k, zs[k], round(es[k] / tot, 6))
                    for k in ("a", "b", "c")]
    # round-13 ADVICE: under gap_policy 'skip' a bucket whose
    # buckets_path value is NULL is RETAINED without evaluating the
    # script (ES BucketSelectorPipelineAggregator); insert_zeros
    # coalesces and evaluates; undeclared params.* raise; a var that
    # prefixes another (params.s / params.s2) substitutes by word
    # boundary
    import datetime as dt

    gdf = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0), 5.0),
         (dt.datetime(2024, 1, 1, 2), 1.0)],
        "ts timestamp, v double",
    )
    body = {"field": "ts", "calendar_interval": "hour",
            "min_doc_count": 0}
    sel = {"buckets_path": {"s": "sv"}, "script": "params.s >= 5"}
    kept = compile_aggs(gdf, {"h": {
        "date_histogram": dict(body),
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "keep": {"bucket_selector": dict(sel)}}}}).collect()
    assert sorted((r.sv is None, r.sv) for r in kept) == [
        (False, 5.0), (True, None)]  # the empty hour survives skip
    zkept = compile_aggs(gdf, {"h": {
        "date_histogram": dict(body),
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "keep": {"bucket_selector": {
                     **sel, "gap_policy": "insert_zeros"}}}}}).collect()
    assert [r.sv for r in zkept] == [5.0]  # gap reads 0, evaluated
    with pytest.raises(ValueError, match="undeclared params"):
        compile_aggs(gdf, {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour"},
            "aggs": {"sv": {"sum": {"field": "v"}},
                     "keep": {"bucket_selector": {
                         "buckets_path": {"s": "sv"},
                         "script": "params.s >= 5 AND params.oops > 0",
                     }}}}}).collect()
    wb = compile_aggs(gdf, {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"sv": {"sum": {"field": "v"}},
                 "s2v": {"max": {"field": "v"}},
                 "keep": {"bucket_selector": {
                     "buckets_path": {"s2": "s2v", "s": "sv"},
                     "script": "params.s2 >= 1 AND params.s >= 1",
                 }}}}}).collect()
    assert len(wb) == 2  # params.s2 not clobbered into "sv2"
    # ES's mean method (round 13): (x − mean)/(max − min)
    mout = compile_aggs(df, {"byg": {"terms": {"field": "g"}, "aggs": {
        "sv": {"sum": {"field": "v"}},
        "m": {"normalize": {"buckets_path": "sv",
                            "method": "mean"}}}}}).collect()
    # sv = a:3, b:7, c:5 → mean 5, range 4
    assert sorted((r.byg, r.m) for r in mout) == [
        ("a", -0.5), ("b", 0.5), ("c", 0.0)]
    # zero-variance level: z-score reports NULL
    flat = spark.createDataFrame([Row(g="x", v=2.0), Row(g="y", v=2.0)])
    zf = compile_aggs(flat, {"byg": {"terms": {"field": "g"}, "aggs": {
        "sv": {"sum": {"field": "v"}},
        "z": {"normalize": {"buckets_path": "sv",
                            "method": "z-score"}}}}}).collect()
    assert [r.z for r in zf] == [None, None]
    # selector under a parent: descendants of dropped buckets go too
    df2 = spark.createDataFrame(
        [Row(g="x", h="p", v=1.0), Row(g="x", h="q", v=2.0),
         Row(g="y", h="p", v=3.0)]
    )
    out2 = compile_aggs(
        df2,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "keep": {"bucket_selector": {
                "buckets_path": {"n": "_count"},
                "script": "params.n >= 2"}},
            "byh": {"terms": {"field": "h"}},
        }}},
    ).collect()
    assert sorted((r.level, r.byg, r.byh) for r in out2) == [
        (1, "x", None), (2, "x", "p"), (2, "x", "q")
    ]
    # unsupported normalize methods raise
    with pytest.raises(ValueError, match="normalize method"):
        compile_aggs(
            df,
            {"byg": {"terms": {"field": "g"}, "aggs": {
                "sv": {"sum": {"field": "v"}},
                "z": {"normalize": {"buckets_path": "sv",
                                    "method": "quantile"}}}}},
        )


def test_matrix_stats_listwise_and_population(spark):
    """Round 12: matrix_stats — listwise deletion (rows missing ANY
    field excluded), population variance/covariance, correlation =
    cov/sqrt(vx*vy); zero-variance pairs report NULL corr."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    xs = [1.0, 2.0, 3.0, 4.0, 5.0]
    ys = [2.0, 4.0, 5.0, 4.0, 6.0]
    rows = [Row(g="a", x=x, y=y) for x, y in zip(xs, ys)]
    rows.append(Row(g="a", x=9.0, y=None))     # listwise-dropped
    rows.append(Row(g="b", x=7.0, y=1.0))      # single row → var 0
    df = spark.createDataFrame(rows)
    out = {r.byg: r for r in compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "mx": {"matrix_stats": {"fields": ["x", "y"]}}}}},
    ).collect()}
    a = out["a"]
    assert (a.mx_count, a.mx_x_mean_r6, a.mx_x_var_r6) == (5.0, 3.0, 2.0)
    assert a.mx_x_y_cov_r6 == 1.6
    assert a.mx_x_y_corr_r6 == 0.852803  # = numpy corrcoef at 6dp
    b = out["b"]
    assert (b.mx_count, b.mx_x_var_r6, b.mx_x_y_corr_r6) == (
        1.0, 0.0, None
    )


def test_geo_bounds_and_string_stats(spark):
    """Round 12: geo_bounds = the bucket's bounding box (max/min
    lat, min/max lon — the wrap_longitude=false reading);
    string_stats = count/min/max/avg length over non-NULL strings
    (entropy is a documented omission — show_distribution raises)."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="x", loc=Row(lat=10.0, lon=-20.0), s="abc"),
            Row(g="x", loc=Row(lat=-5.0, lon=30.0), s="defgh"),
            Row(g="x", loc=None, s=None),
        ]
    )
    out = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "box": {"geo_bounds": {"field": "loc"}},
            "ss": {"string_stats": {"field": "s"}},
        }}},
    ).collect()[0]
    assert (out.box_top, out.box_bottom, out.box_left, out.box_right) == (
        10.0, -5.0, -20.0, 30.0
    )
    assert (out.ss_count, out.ss_min_length, out.ss_max_length,
            out.ss_avg_length) == (2.0, 3.0, 5.0, 4.0)
    with pytest.raises(ValueError, match="show_distribution"):
        compile_aggs(
            df,
            {"byg": {"terms": {"field": "g"}, "aggs": {
                "ss": {"string_stats": {"field": "s",
                                        "show_distribution": True}}}}},
        )


def test_adjacency_matrix_and_percentile_ranks(spark):
    """Round 12: adjacency_matrix = one bucket per matching filter
    plus one per matching PAIR intersection (Kibana graph shape),
    via the multi-membership explode — ancestors un-multiplied when
    nested under terms; percentile_ranks = the exact empirical CDF
    percent at each threshold."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="x", a=True, b=True, c=False, v=1.0),
            Row(g="x", a=True, b=False, c=False, v=2.0),
            Row(g="y", a=False, b=True, c=True, v=3.0),
            Row(g="y", a=False, b=False, c=False, v=4.0),
        ]
    )
    filters = {
        "A": {"term": {"a": True}},
        "B": {"term": {"b": True}},
        "C": {"term": {"c": True}},
    }
    out = compile_aggs(
        df, {"adj": {"adjacency_matrix": {"filters": filters}}}
    ).collect()
    assert sorted((r.adj, r.doc_count) for r in out) == [
        ("A", 2), ("A&B", 1), ("B", 2), ("B&C", 1), ("C", 1)
    ]
    # custom separator + under terms: parent counts stay per-doc
    out2 = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "adj": {"adjacency_matrix": {"filters": filters,
                                         "separator": "|"}}}}},
    ).collect()
    assert sorted((r.byg, r.doc_count) for r in out2
                  if r.level == 1) == [("x", 2), ("y", 2)]
    assert sorted((r.byg, r.adj, r.doc_count) for r in out2
                  if r.level == 2) == [
        ("x", "A", 2), ("x", "A|B", 1), ("x", "B", 1),
        ("y", "B", 1), ("y", "B|C", 1), ("y", "C", 1),
    ]
    # percentile_ranks: exact percent of values <= threshold
    pr = compile_aggs(
        df,
        {"all": {"filter": {"match_all": {}}, "aggs": {
            "pr": {"percentile_ranks": {"field": "v",
                                        "values": [2, 3.5]}}}}},
    ).collect()[0]
    assert (pr.pr_pr0_r6, pr.pr_pr1_r6) == (50.0, 75.0)


def test_terms_include_exclude_and_post_filter(spark):
    """Round 12: terms include/exclude (value lists or an anchored
    regex) filter the candidate terms BEFORE ranking — excluded keys
    go NULL so the doc drops from the level but still counts in
    ancestors; post_filter narrows the hits side after the query."""
    from dump_es_parquet_spark.operators.es_search import (
        compile_aggs,
        search,
    )

    df = spark.createDataFrame(
        [Row(id=i, k=k, n=float(i)) for i, k in enumerate(
            ["alpha", "alpha", "beta", "beta", "beta", "gamma", "delta"]
        )]
    )
    # regex include: only a* and d* keys compete for size
    out = compile_aggs(
        df, {"byk": {"terms": {"field": "k", "include": "(a|d).*"}}}
    ).collect()
    assert sorted((r.byk, r.doc_count) for r in out) == [
        ("alpha", 2), ("delta", 1)
    ]
    # list exclude
    out2 = compile_aggs(
        df,
        {"byk": {"terms": {"field": "k", "exclude": ["beta", "gamma"]}}},
    ).collect()
    assert sorted((r.byk, r.doc_count) for r in out2) == [
        ("alpha", 2), ("delta", 1)
    ]
    # include BEFORE ranking: size=1 picks the best SURVIVING key
    out3 = compile_aggs(
        df,
        {"byk": {"terms": {"field": "k", "size": 1,
                           "include": ["alpha", "delta"]}}},
    ).collect()
    assert [(r.byk, r.doc_count) for r in out3] == [("alpha", 2)]
    # exclusion at a non-root level keeps the ancestor count intact
    out4 = compile_aggs(
        df,
        {"even": {"filter": {"range": {"n": {"lt": 5}}}, "aggs": {
            "byk": {"terms": {"field": "k", "exclude": ["alpha"]}}}}},
    ).collect()
    assert [(r.even, r.doc_count) for r in out4 if r.level == 1] == [
        ("even", 5)
    ]
    assert sorted((r.byk, r.doc_count) for r in out4
                  if r.level == 2) == [("beta", 3)]
    # post_filter narrows hits after the query, before sort/size
    hits = search(
        df,
        {
            "query": {"range": {"n": {"lt": 6}}},
            "post_filter": {"term": {"k": "beta"}},
            "sort": [{"id": "asc"}],
            "size": 2,
            "_source": ["id", "k"],
        },
    ).collect()
    assert [(r.id, r.k) for r in hits] == [(2, "beta"), (3, "beta")]


def test_filters_agg_under_terms(spark):
    """Round 12: the filters agg works at ANY chain depth through the
    multi-membership explode — a doc matching several filters lands
    in each bucket, other_bucket catches the rest, and ancestor
    doc_counts/metrics stay un-multiplied."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="a", n=5.0, v=1.0),
            Row(g="a", n=150.0, v=2.0),   # matches big AND mid
            Row(g="b", n=150.0, v=3.0),
            Row(g="b", n=None, v=4.0),    # matches nothing → other
        ]
    )
    out = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "sum_v": {"sum": {"field": "v"}},
            "cls": {"filters": {"filters": {
                "big": {"range": {"n": {"gte": 100}}},
                "mid": {"range": {"n": {"gte": 50, "lte": 200}}},
            }, "other_bucket": True},
                "aggs": {"avg_n": {"avg": {"field": "n"}}}},
        }}},
    ).collect()
    assert sorted((r.byg, r.doc_count, r.sum_v) for r in out
                  if r.level == 1) == [("a", 2, 3.0), ("b", 2, 7.0)]
    assert sorted((r.byg, r.cls, r.doc_count) for r in out
                  if r.level == 2) == [
        ("a", "_other_", 1), ("a", "big", 1), ("a", "mid", 1),
        ("b", "_other_", 1), ("b", "big", 1), ("b", "mid", 1),
    ]
    # without other_bucket the no-match doc drops from the level but
    # still counts in its ancestor
    out2 = compile_aggs(
        df,
        {"byg": {"terms": {"field": "g"}, "aggs": {
            "cls": {"filters": {"filters": {
                "big": {"range": {"n": {"gte": 100}}},
            }}},
        }}},
    ).collect()
    assert sorted((r.byg, r.doc_count) for r in out2
                  if r.level == 1) == [("a", 2), ("b", 2)]
    assert sorted((r.byg, r.cls, r.doc_count) for r in out2
                  if r.level == 2) == [("a", "big", 1), ("b", "big", 1)]
    # two NON-ROOT multi-membership levels in one chain raise
    with pytest.raises(ValueError, match="one multi-membership"):
        compile_aggs(
            df,
            {"byg": {"terms": {"field": "g"}, "aggs": {
                "cls": {"filters": {"filters": {
                    "big": {"range": {"n": {"gte": 100}}}}},
                    "aggs": {"cls2": {"filters": {"filters": {
                        "small": {"range": {"n": {"lt": 100}}}}},
                    }}}}}},
        )


def test_multi_terms_and_rare_terms(spark):
    """Round 12 (VERDICT r11 Next #4): multi_terms drops docs missing
    ANY component, joins keys with '|', and honors terms' size/order
    cap; rare_terms keeps buckets with doc_count <= max_doc_count —
    a ceiling, not a rank cap — and works as a sub-level (rarity
    inside the parent bucket)."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame(
        [
            Row(g="a", h="x", u=1),
            Row(g="a", h="x", u=1),
            Row(g="a", h="x", u=2),
            Row(g="a", h="y", u=3),
            Row(g="b", h="x", u=1),
            Row(g="b", h=None, u=4),   # missing component → dropped
            Row(g=None, h="y", u=5),   # missing component → dropped
        ]
    )
    out = compile_aggs(
        df,
        {"gh": {"multi_terms": {"terms": [{"field": "g"},
                                          {"field": "h"}]},
                "aggs": {"rare_u": {"rare_terms": {"field": "u"}}}}},
    ).collect()
    assert sorted((r.gh, r.doc_count) for r in out if r.level == 1) == [
        ("a|x", 3), ("a|y", 1), ("b|x", 1)
    ]
    # u=1 appears twice in a|x (not rare there) but once in b|x (rare)
    assert sorted((r.gh, r.rare_u) for r in out if r.level == 2) == [
        ("a|x", 2), ("a|y", 3), ("b|x", 1)
    ]
    # rare_terms max_doc_count=2 admits the 2-doc bucket
    out2 = compile_aggs(
        df, {"ru": {"rare_terms": {"field": "u", "max_doc_count": 2}}}
    ).collect()
    assert sorted((r.ru, r.doc_count) for r in out2) == [
        (2, 1), (3, 1), (4, 1), (5, 1)
    ]  # u=1 has 3 docs → excluded
    # multi_terms honors the size cap, count-desc + key-asc default
    out3 = compile_aggs(
        df,
        {"gh": {"multi_terms": {"terms": [{"field": "g"},
                                          {"field": "h"}],
                                "size": 1}}},
    ).collect()
    assert [(r.gh, r.doc_count) for r in out3] == [("a|x", 3)]


def test_geotile_grid_keys(spark):
    """geotile_grid must emit the OSM/slippy z/x/y keys — pinned
    against the textbook formula and the canonical Eiffel-Tower tile
    10/518/352; polar latitudes clamp into the edge tiles instead of
    producing NaN."""
    import math as _m

    from dump_es_parquet_spark.operators.es_search import _geotile_expr

    def ref(lat, lon, z):
        n = 2 ** z
        x = max(0, min(int((lon + 180.0) / 360.0 * n), n - 1))
        lat = max(-85.05112878, min(85.05112878, lat))
        r = _m.radians(lat)
        merc = round(
            (1.0 - _m.log(_m.tan(r) + 1.0 / _m.cos(r)) / _m.pi) / 2.0 * n,
            12,
        )
        y = max(0, min(int(_m.floor(merc)), n - 1))
        return f"{z}/{x}/{y}"

    pts = [
        (48.8583, 2.2945), (0.0, 0.0), (90.0, 0.0), (-90.0, 179.9),
        (-33.8568, 151.2153), (85.3, -179.9),
    ]
    df = spark.createDataFrame(
        [Row(i=i, loc=Row(lat=la, lon=lo)) for i, (la, lo) in enumerate(pts)]
    )
    for z in (0, 6, 10):
        got = {
            r.i: r.t
            for r in df.select(
                "i",
                _geotile_expr(
                    F.col("loc.lat"), F.col("loc.lon"), z
                ).alias("t"),
            ).collect()
        }
        for i, (la, lo) in enumerate(pts):
            assert got[i] == ref(la, lo, z), (z, la, lo, got[i])
    assert ref(48.8583, 2.2945, 10) == "10/518/352"


def test_nested_query_same_object_semantics(spark):
    """The nested query's reason to exist: conditions must hold on
    the SAME array object. A doc whose array contains k='band' on one
    object and v='error' on ANOTHER must NOT match — the flattened
    cross-match would. NULL/missing arrays match nothing; analyzer-
    seam kinds and nested-inside-nested raise."""
    from dump_es_parquet_spark.operators.es_search import compile_query

    df = spark.createDataFrame(
        [
            Row(id=1, attrs=[Row(k="type", v="error"),
                             Row(k="band", v="b2")]),
            Row(id=2, attrs=[Row(k="type", v="click"),
                             Row(k="band", v="error")]),
            Row(id=3, attrs=[]),
            Row(id=4, attrs=None),
        ]
    )
    q = {"nested": {"path": "attrs", "query": {"bool": {"must": [
        {"term": {"attrs.k": "type"}},
        {"term": {"attrs.v": "error"}},
    ]}}}}
    got = sorted(r.id for r in df.filter(compile_query(q)).collect())
    assert got == [1]  # doc 2 cross-matches only when flattened
    # a flat formulation over the exploded values WOULD match doc 2:
    flat = df.filter(
        F.exists("attrs", lambda x: x["k"] == "type")
        & F.exists("attrs", lambda x: x["v"] == "error")
    )
    assert sorted(r.id for r in flat.collect()) == [1, 2]
    # range + exists inside the scope; must_not NULL-exactness
    q2 = {"nested": {"path": "attrs", "query": {"bool": {
        "must": [{"exists": {"field": "attrs.v"}}],
        "must_not": [{"term": {"attrs.v": "b2"}}],
    }}}}
    got2 = sorted(r.id for r in df.filter(compile_query(q2)).collect())
    assert got2 == [1, 2]
    with pytest.raises(ValueError, match="must live under path"):
        df.filter(compile_query(
            {"nested": {"path": "attrs",
                        "query": {"term": {"other.k": "x"}}}}
        )).collect()
    # nested-inside-nested (round 13, PARITY #22 bound closed on the
    # QUERY side): absolute inner paths, same-object semantics at
    # BOTH depths — outer object must pair its own k with an inner
    # object satisfying the whole inner query
    nn = spark.createDataFrame([
        Row(id=1, attrs=[Row(k="a", sub=[Row(v="hit"), Row(v="x")]),
                         Row(k="b", sub=[Row(v="y")])]),
        # k="a" and v="hit" live on DIFFERENT outer objects: no match
        Row(id=2, attrs=[Row(k="a", sub=[Row(v="y")]),
                         Row(k="b", sub=[Row(v="hit")])]),
        Row(id=3, attrs=[Row(k="a", sub=None)]),
        Row(id=4, attrs=None),
    ])
    qn = {"nested": {"path": "attrs", "query": {"bool": {"must": [
        {"term": {"attrs.k": "a"}},
        {"nested": {"path": "attrs.sub",
                    "query": {"term": {"attrs.sub.v": "hit"}}}},
    ]}}}}
    assert sorted(r.id for r in nn.filter(compile_query(qn)).collect()) \
        == [1]
    with pytest.raises(ValueError, match="must live under the outer"):
        nn.filter(compile_query({"nested": {"path": "attrs", "query": {
            "nested": {"path": "other.sub",
                       "query": {"match_all": {}}}}}})).collect()


def test_nested_inner_hits(spark):
    """Round 13 (VERDICT r12 Next #4): ``inner_hits`` on a nested
    query reports WHICH objects matched — 0-based offsets per hit,
    capped at the section's ``size`` (ES default 3), ``name``
    renaming the column; a should-composed nested clause can emit
    an empty offsets array on a hit carried by the other arm."""
    from dump_es_parquet_spark.operators.es_search import search

    df = spark.createDataFrame(
        [
            Row(id=1, flag="y", attrs=[Row(k="a", v="hit"),
                                       Row(k="b", v="miss"),
                                       Row(k="c", v="hit"),
                                       Row(k="d", v="hit"),
                                       Row(k="e", v="hit")]),
            Row(id=2, flag="n", attrs=[Row(k="a", v="miss"),
                                       Row(k="b", v="hit")]),
            Row(id=3, flag="y", attrs=[Row(k="a", v="miss")]),
            Row(id=4, flag="n", attrs=None),
        ]
    )
    req = {
        "query": {"nested": {"path": "attrs",
                             "query": {"term": {"attrs.v": "hit"}},
                             "inner_hits": {}}},
        "sort": [{"id": "asc"}],
        "_source": ["id"],
    }
    out = search(df, req).collect()
    # default size 3 truncates doc 1's four matches to the first 3
    assert [(r.id, r.attrs_inner_hits) for r in out] == [
        (1, [0, 2, 3]), (2, [1])]
    # explicit size + name
    req2 = {
        "query": {"nested": {"path": "attrs",
                             "query": {"term": {"attrs.v": "hit"}},
                             "inner_hits": {"size": 1, "name": "m"}}},
        "sort": [{"id": "asc"}],
        "_source": ["id"],
    }
    out2 = search(df, req2).collect()
    assert [(r.id, r.m_inner_hits) for r in out2] == [(1, [0]), (2, [1])]
    # inside a should: doc 3 matches via the flag arm with NO
    # matching nested object — its offsets array is empty, and a
    # NULL attrs doc matching the other arm reports NULL offsets
    req3 = {
        "query": {"bool": {"should": [
            {"term": {"flag": "y"}},
            {"nested": {"path": "attrs",
                        "query": {"term": {"attrs.v": "hit"}},
                        "inner_hits": {}}},
        ], "minimum_should_match": 1}},
        "sort": [{"id": "asc"}],
        "_source": ["id"],
    }
    out3 = search(df, req3).collect()
    assert [(r.id, r.attrs_inner_hits) for r in out3] == [
        (1, [0, 2, 3]), (2, [1]), (3, [])]
    # inner_hits on a nested-inside-nested clause has no flat shape
    nn = spark.createDataFrame(
        [Row(id=1, attrs=[Row(k="a", sub=[Row(v="hit")])])])
    with pytest.raises(ValueError, match="INSIDE another"):
        search(nn, {"query": {"nested": {
            "path": "attrs",
            "query": {"nested": {"path": "attrs.sub",
                                 "query": {"term": {"attrs.sub.v":
                                                    "hit"}},
                                 "inner_hits": {}}},
        }}}).collect()


def test_nested_match_and_multi_match(spark):
    """Round 12 (VERDICT r11 What's missing #2): match / multi_match
    inside a nested scope — the analyzer seam tokenizes the struct
    element column, same-object semantics preserved (a doc whose
    tokens span two objects must NOT match an operator-and query)."""
    from dump_es_parquet_spark.operators.es_search import compile_query

    df = spark.createDataFrame(
        [
            Row(id=1, attrs=[Row(k="note", v="disk error on boot"),
                             Row(k="tag", v="prod")]),
            Row(id=2, attrs=[Row(k="note", v="disk full"),
                             Row(k="tag", v="error prod")]),
            Row(id=3, attrs=[Row(k="note", v="Clean Run"),
                             Row(k="tag", v=None)]),
            Row(id=4, attrs=None),
        ]
    )
    # match with operator and: both tokens on the SAME object's v
    q = {"nested": {"path": "attrs", "query": {"match": {
        "attrs.v": {"query": "disk error", "operator": "and"}}}}}
    assert sorted(
        r.id for r in df.filter(compile_query(q)).collect()
    ) == [1]  # doc 2 has 'disk' and 'error' on DIFFERENT objects
    # the standard analyzer normalizes case inside the scope
    q2 = {"nested": {"path": "attrs", "query": {"match": {
        "attrs.v": {"query": "CLEAN", "analyzer": "standard"}}}}}
    assert sorted(
        r.id for r in df.filter(compile_query(q2)).collect()
    ) == [3]
    # multi_match across two nested fields of the same object
    q3 = {"nested": {"path": "attrs", "query": {"multi_match": {
        "query": "prod", "fields": ["attrs.k", "attrs.v"]}}}}
    assert sorted(
        r.id for r in df.filter(compile_query(q3)).collect()
    ) == [1, 2]


def test_nested_null_keys_keep_ancestor_counts(spark):
    """ADVICE r10 #1 (high): a doc rejected by a NON-ROOT filter /
    missing / range / nullable-terms level must still count in every
    ancestor bucket's doc_count and metrics — ES parents cover all
    their docs regardless of how children partition them. The old
    pre-rollup NULL-key drop reported terms>filter parent = 1 where
    ES says 2."""
    df = spark.createDataFrame(
        [
            Row(kind="a", n=10.0),
            Row(kind="a", n=200.0),
            Row(kind="b", n=None),
        ]
    )
    out = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind"},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "big": {
                        "filter": {"range": {"n": {"gte": 100}}},
                        "aggs": {"bs": {"sum": {"field": "n"}}},
                    },
                },
            }
        },
    ).collect()
    lvl1 = sorted((r.k, r.doc_count, r.s) for r in out if r.level == 1)
    # parent 'a' counts BOTH docs (10 fails the child filter), its
    # sum covers both; 'b' has one doc with NULL n
    assert lvl1 == [("a", 2, 210.0), ("b", 1, None)]
    lvl2 = sorted((r.k, r.big, r.doc_count, r.bs) for r in out if r.level == 2)
    assert lvl2 == [("a", "big", 1, 200.0)]

    # nested missing: docs HAVING the field still count in the parent
    out2 = compile_aggs(
        df,
        {
            "k": {
                "terms": {"field": "kind"},
                "aggs": {"no_n": {"missing": {"field": "n"}}},
            }
        },
    ).collect()
    assert sorted((r.k, r.doc_count) for r in out2 if r.level == 1) == [
        ("a", 2), ("b", 1)
    ]
    assert sorted((r.k, r.doc_count) for r in out2 if r.level == 2) == [
        ("b", 1)
    ]

    # nested terms over a nullable field: the NULL-kind doc is in no
    # level-2 bucket but counts at level 1
    df3 = spark.createDataFrame(
        [Row(kind="a", n=1.0), Row(kind=None, n=2.0)]
    ).withColumn("g", F.lit("all"))
    out3 = compile_aggs(
        df3,
        {
            "g": {
                "terms": {"field": "g"},
                "aggs": {"k": {"terms": {"field": "kind"}}},
            }
        },
    ).collect()
    assert [(r.g, r.doc_count) for r in out3 if r.level == 1] == [("all", 2)]
    assert sorted((r.k, r.doc_count) for r in out3 if r.level == 2) == [
        ("a", 1)
    ]


def test_stats_bucket_summary_over_children(spark):
    """stats_bucket: the 5-column sibling summary over the SURVIVING
    child buckets, reported on the parent row."""
    df = spark.createDataFrame(
        [Row(day=0.0, kind=k, n=v) for k, v in
         [("a", 10.0), ("a", 20.0), ("b", 100.0)]]
    )
    out = compile_aggs(
        df,
        {
            "d": {
                "histogram": {"field": "day", "interval": 1},
                "aggs": {
                    "k": {"terms": {"field": "kind"},
                          "aggs": {"m": {"avg": {"field": "n"}}}},
                    "st": {"stats_bucket": {"buckets_path": "k>m"}},
                },
            }
        },
    ).collect()
    lvl1 = [r for r in out if r.level == 1][0]
    # child avgs: a=15, b=100
    assert (lvl1.st_count, lvl1.st_min, lvl1.st_max,
            lvl1.st_sum, lvl1.st_avg) == (2.0, 15.0, 100.0, 115.0, 57.5)
    # children report NULL summary (level-masked)
    for r in out:
        if r.level == 2:
            assert r.st_count is None


def test_sibling_pipe_without_child_bucket_raises(spark):
    df = spark.createDataFrame([Row(kind="a", n=1.0)])
    with pytest.raises(ValueError, match="sibling"):
        compile_aggs(
            df,
            {
                "k": {
                    "terms": {"field": "kind"},
                    "aggs": {
                        "best": {"max_bucket": {"buckets_path": "x>m"}}
                    },
                }
            },
        )


def test_search_after_mixed_direction_cursor(docs):
    # sort: kind ASC, n DESC — full order over non-null-n docs:
    # (a,20)=2, (a,10)=1, (b,40)=4, (c,50)=5
    req = {
        "query": {"exists": {"field": "n"}},
        "sort": [{"kind": "asc"}, {"n": {"order": "desc"}}],
        "size": 10,
        "_source": ["id"],
    }
    full = [r.id for r in search(docs, req).collect()]
    assert full == [2, 1, 4, 5]
    page = [
        r.id
        for r in search(docs, {**req, "search_after": ["a", 20.0]}).collect()
    ]
    assert page == [1, 4, 5]


def test_search_after_pages_tile_the_full_order(docs):
    req = {
        "query": {"exists": {"field": "n"}},
        "sort": [{"kind": "asc"}, {"n": {"order": "desc"}}],
        "size": 2,
        "_source": ["id", "kind", "n"],
    }
    seen, after = [], None
    for _ in range(4):
        r = {**req, **({"search_after": after} if after else {})}
        rows = search(docs, r).collect()
        if not rows:
            break
        seen.extend(x.id for x in rows)
        after = [rows[-1].kind, rows[-1].n]
    assert seen == [2, 1, 4, 5]


def test_collapse_keeps_top_hit_per_group(docs):
    req = {
        "query": {"exists": {"field": "n"}},
        "collapse": {"field": "kind"},
        "sort": [{"n": {"order": "desc"}}],
        "size": 10,
        "_source": ["id", "kind", "n"],
    }
    rows = search(docs, req).collect()
    assert [(r.kind, r.id) for r in rows] == [("c", 5), ("b", 4), ("a", 2)]


def test_streamable_aggs_stream_equals_batch(spark, sf_dir):
    from dump_es_parquet_spark.operators.es_search import streamable_aggs
    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.streaming.stream import stream_events

    tree = {
        "by_hour": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {
                "by_type": {
                    "terms": {"field": "event_type"},
                    "aggs": {
                        "sum_value": {"sum": {"field": "value"}},
                        "avg_value": {"avg": {"field": "value"}},
                    },
                }
            },
        }
    }
    q = (
        streamable_aggs(stream_events(spark, sf_dir), tree)
        .writeStream.format("memory")
        .queryName("t_es_stream_aggs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("t_es_stream_aggs")
    batch = streamable_aggs(load(spark, sf_dir, "events"), tree)
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert s == b and len(s) > 0
    # and the batch run of the SAME tree equals compile_aggs' leaf
    # level (size pruning disabled on both sides)
    leaf = (
        compile_aggs(
            load(spark, sf_dir, "events"),
            {
                "by_hour": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "hour"},
                    "aggs": {
                        "by_type": {
                            "terms": {"field": "event_type", "size": 10**6},
                            "aggs": {
                                "sum_value": {"sum": {"field": "value"}},
                                "avg_value": {"avg": {"field": "value"}},
                            },
                        }
                    },
                }
            },
        )
        .filter("level = 2")
        .select("by_hour", "by_type", "doc_count", "sum_value", "avg_value")
    )
    assert sorted(map(tuple, leaf.collect())) == b


def test_percolate_bulk_matches_and_agrees_with_percolate(spark):
    """percolate_bulk (VERDICT r09 What's wrong #3): conjunct-class
    rules held as data must produce exactly percolate()'s answer for
    the same rules — including NULL/missing-field docs satisfying
    nothing — while keeping the plan O(1) in rule count."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", n=10.0),
            Row(id=2, kind="a", n=200.0),
            Row(id=3, kind="b", n=None),
            Row(id=4, kind=None, n=50.0),
        ]
    )
    rules = {
        "small_a": {"bool": {"must": [{"term": {"kind": "a"}},
                                      {"range": {"n": {"lt": 100}}}]}},
        "any_big": {"range": {"n": {"gte": 100}}},
        "exact_n": {"term": {"n": 50.0}},
        "is_b": {"term": {"kind": {"value": "b"}}},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (1, "small_a"), (2, "any_big"), (3, "is_b"), (4, "exact_n")
    ]


def test_percolate_bulk_should_minimum_should_match(spark):
    """Round 11 (VERDICT r10 Next #7): a should list with
    minimum_should_match becomes ONE count-threshold group — mixed
    must/should rules must agree with percolate()'s full-DSL answer,
    including the ES default msm (1 alone, 0 beside must/filter)."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", city="x", n=10.0),
            Row(id=2, kind="a", city="y", n=200.0),
            Row(id=3, kind="b", city="x", n=150.0),
            Row(id=4, kind="a", city="z", n=None),
        ]
    )
    rules = {
        # must + should(msm=1): kind=a AND (city=x OR n>=100)
        "a_and_or": {"bool": {
            "must": [{"term": {"kind": "a"}}],
            "should": [{"term": {"city": "x"}},
                       {"range": {"n": {"gte": 100}}}],
            "minimum_should_match": 1,
        }},
        # pure should, msm=2 of 3
        "two_of_three": {"bool": {
            "should": [{"term": {"city": "x"}},
                       {"term": {"kind": "b"}},
                       {"range": {"n": {"gte": 100}}}],
            "minimum_should_match": 2,
        }},
        # should beside a filter with NO explicit msm: ES default 0 —
        # the should list imposes nothing in filter context
        "filter_only": {"bool": {
            "filter": [{"term": {"kind": "b"}}],
            "should": [{"term": {"city": "zzz"}}],
        }},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (1, "a_and_or"), (2, "a_and_or"),
        (3, "filter_only"), (3, "two_of_three"),
    ]
    # a multi-bound range inside should is ONE clause — refuse to
    # split it into two countable rows
    with pytest.raises(ValueError, match="multi-bound"):
        queries_to_conjuncts(
            spark,
            {"q": {"bool": {"should": [
                {"range": {"n": {"gte": 1, "lt": 2}}},
                {"term": {"kind": "a"}},
            ], "minimum_should_match": 1}}},
        )


def test_percolate_bulk_exists_and_dateline_and_missing(spark):
    """Round 11 batch: exists conjuncts (must / should / must_not)
    agree with percolate(); dateline-wrapping geo_bounding_box is
    the union of the two half-bands; histogram/date_histogram
    `missing` buckets NULL-field docs at the substitute."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import (
        compile_query,
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", n=10.0),
            Row(id=2, kind=None, n=20.0),
            Row(id=3, kind="b", n=None),
        ]
    )
    rules = {
        "has_kind": {"bool": {"must": [{"exists": {"field": "kind"}},
                                       {"range": {"n": {"gte": 0}}}]}},
        "no_n": {"bool": {"filter": [{"exists": {"field": "kind"}}],
                          "must_not": [{"exists": {"field": "n"}}]}},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [(1, "has_kind"), (3, "no_n")]

    # dateline wrap: lon in [170, 180] ∪ [-180, -170]
    g = spark.createDataFrame(
        [Row(id=1, loc=Row(lat=0.0, lon=175.0)),
         Row(id=2, loc=Row(lat=0.0, lon=-175.0)),
         Row(id=3, loc=Row(lat=0.0, lon=0.0))]
    )
    q = {"geo_bounding_box": {"loc": {
        "top_left": {"lat": 10.0, "lon": 170.0},
        "bottom_right": {"lat": -10.0, "lon": -170.0}}}}
    assert sorted(r.id for r in g.filter(compile_query(q)).collect()) == [
        1, 2
    ]

    # histogram / date_histogram missing substitutes
    h = spark.createDataFrame(
        [Row(v=12.0, ts=dt.datetime(2024, 1, 1, 5)),
         Row(v=None, ts=None)]
    )
    out = compile_aggs(h, {"b": {"histogram": {
        "field": "v", "interval": 10, "missing": 55.0}}}).collect()
    assert sorted((r.b, r.doc_count) for r in out) == [(10.0, 1), (50.0, 1)]
    out2 = compile_aggs(h, {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "day",
        "missing": "2024-02-01 00:00:00"}}}).collect()
    feb1 = int(dt.datetime(2024, 2, 1, tzinfo=dt.timezone.utc)
               .timestamp() * 1000)
    jan1 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
               .timestamp() * 1000)
    assert sorted((r.d, r.doc_count) for r in out2) == [
        (jan1, 1), (feb1, 1)
    ]


def test_percolate_bulk_must_not(spark):
    """Round 11: must_not conjuncts kill (doc, query) pairs via one
    left_anti join — agreement with percolate()'s full-DSL answer,
    including ES's NULL semantics (a missing field never matches the
    negated leaf, so the doc survives). must_not-only rules raise."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", n=10.0),
            Row(id=2, kind="a", n=200.0),
            Row(id=3, kind="a", n=None),
            Row(id=4, kind=None, n=5.0),
        ]
    )
    rules = {
        # kind=a AND NOT n >= 100: doc 1 yes, doc 2 killed, doc 3
        # survives (NULL n never matches the negation)
        "a_small": {"bool": {
            "must": [{"term": {"kind": "a"}}],
            "must_not": [{"range": {"n": {"gte": 100}}}],
        }},
        # n < 100 AND NOT kind = a: only doc 4 (NULL kind survives)
        "not_a": {"bool": {
            "filter": [{"range": {"n": {"lt": 100}}}],
            "must_not": [{"term": {"kind": "a"}}],
        }},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [(1, "a_small"), (3, "a_small"), (4, "not_a")]
    with pytest.raises(ValueError, match="must_not-only"):
        queries_to_conjuncts(
            spark,
            {"q": {"bool": {"must_not": [{"term": {"kind": "a"}}]}}},
        )
    with pytest.raises(ValueError, match="multi-bound"):
        queries_to_conjuncts(
            spark,
            {"q": {"bool": {
                "must": [{"term": {"kind": "a"}}],
                "must_not": [{"range": {"n": {"gte": 1, "lt": 2}}}],
            }}},
        )


def test_percolate_bulk_range_merge_strictness(spark):
    """The binned route merges must-range conjuncts per (query,
    field): the binding bound must win with its strictness (gt 5 +
    gte 5 → >5), and an unsatisfiable merged interval (lo > hi, or
    touching with a strict end) must kill the query, not crash."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [Row(id=1, n=5.0), Row(id=2, n=6.0), Row(id=3, n=7.0)]
    )
    rules = {
        # gt 5 AND gte 5 AND lte 6 → (5, 6]
        "strict_lo": {"bool": {"must": [
            {"range": {"n": {"gt": 5}}},
            {"range": {"n": {"gte": 5}}},
            {"range": {"n": {"lte": 6}}},
        ]}},
        # touching bounds, non-strict both ends → exactly 6
        "point": {"bool": {"must": [
            {"range": {"n": {"gte": 6}}},
            {"range": {"n": {"lte": 6}}},
        ]}},
        # empty: gte 7 AND lt 6
        "empty": {"bool": {"must": [
            {"range": {"n": {"gte": 7}}},
            {"range": {"n": {"lt": 6}}},
        ]}},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [(2, "point"), (2, "strict_lo")]


def test_percolate_bulk_two_bound_must_range_is_conjunction(spark):
    """VERDICT r11 What's wrong #1 / ADVICE r11 (high): a two-bound
    range LEAF in must position — {"range": {"n": {"gte": 5, "lte":
    10}}} — must AND its bounds. The r11 normalizer put both bound
    rows under ONE group with min_match=1, so percolate_bulk ORed
    them and matched docs outside the band (judge repro: n=3/7/20
    all matched; only n=7 should). Each bound must get its own
    singleton group — which also routes bands built via the dict API
    into the two-sided binned merge path. Covers the bare,
    must-list, and must-plus-term forms the verdict prescribed."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", n=3.0),
            Row(id=2, kind="a", n=7.0),
            Row(id=3, kind="a", n=20.0),
            Row(id=4, kind="b", n=7.0),
            Row(id=5, kind="a", n=None),
        ]
    )
    rules = {
        # the judge's exact repro: bare two-bound range
        "bare_band": {"range": {"n": {"gte": 5, "lte": 10}}},
        # same band as a must-list leaf
        "must_band": {"bool": {"must": [
            {"range": {"n": {"gte": 5, "lte": 10}}},
        ]}},
        # band beside a term — the alert-band shape
        "a_band": {"bool": {"must": [
            {"term": {"kind": "a"}},
            {"range": {"n": {"gte": 5, "lte": 10}}},
        ]}},
        # strict band via gt/lt in one leaf
        "strict_band": {"bool": {"filter": [
            {"range": {"n": {"gt": 3, "lt": 7}}},
        ]}},
    }
    conj = queries_to_conjuncts(spark, rules)
    # each bound of a must-position multi-bound range is its own
    # singleton group (the structural fix, checked directly)
    nrows = conj.filter(F.col("query_id") == "bare_band")
    assert nrows.select("group_id").distinct().count() == 2
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (2, "a_band"), (2, "bare_band"), (2, "must_band"),
        (4, "bare_band"), (4, "must_band"),
    ]


def test_percolate_driver_twins_match_distributed(spark):
    """VERDICT r17 What's wrong #4 pin: percolate_bulk has TWO
    implementations of every rule-side statistic — plain Python over
    the local conjunct tuples (queries_to_conjuncts carries them) and
    the distributed aggregations (the frame-as-data path for
    millions-scale rule corpora). They must stay semantically
    identical forever. This runs BOTH paths on the same rules/docs —
    covering every channel: string/numeric eq, strict/non-strict
    two-sided bands, one-sided ranges, exists, prefix, token, phrase,
    must_not, and a should group (grouped=True) — and compares the
    final hits, every _ConjStats attribute, and the merged-interval
    rows field by field."""
    from dump_es_parquet_spark.operators.es_search import (
        _distributed_conjunct_stats,
        _distributed_merged_intervals,
        _driver_conjunct_stats,
        _driver_merged_intervals,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", msg="error disk full now", n=10.0),
            Row(id=2, kind="ab", msg="ok all good", n=150.0),
            Row(id=3, kind="b", msg="error net down", n=250.0),
            Row(id=4, kind=None, msg=None, n=50.0),
            Row(id=5, kind="abc", msg="disk error full", n=None),
        ]
    )
    rules = {
        "band": {"bool": {"must": [
            {"range": {"n": {"gt": 20, "lte": 200}}}]}},
        "one_sided": {"range": {"n": {"gte": 200}}},
        "strict_touch": {"bool": {"must": [
            {"range": {"n": {"gt": 50}}}, {"range": {"n": {"lt": 50}}}]}},
        "eq_s": {"term": {"kind": "b"}},
        "eq_n": {"term": {"n": 50.0}},
        "exists_k": {"exists": {"field": "kind"}},
        "pfx": {"prefix": {"kind": "ab"}},
        "tok": {"match": {"msg": "error"}},
        "phr": {"match_phrase": {"msg": "disk full"}},
        "not_b": {"bool": {
            "must": [{"exists": {"field": "n"}}],
            "must_not": [{"term": {"kind": "b"}}],
        }},
        "two_of": {"bool": {
            "should": [{"term": {"kind": "a"}},
                       {"range": {"n": {"lt": 100}}},
                       {"prefix": {"msg": "err"}}],
            "minimum_should_match": 2,
        }},
    }
    conj = queries_to_conjuncts(spark, rules)
    local_rows = conj._local_conjunct_rows
    assert local_rows
    stripped = conj.select("*")  # frame-as-data: no local tuples
    assert not hasattr(stripped, "_local_conjunct_rows")

    got_local = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    got_dist = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, stripped, id_cols=["id"]).collect()
    )
    assert got_local == got_dist
    assert len({q for _, q in got_local}) >= 8  # most rules fired

    # stats twins, attribute by attribute
    st_l = _driver_conjunct_stats(local_rows)
    st_d = _distributed_conjunct_stats(stripped)
    for attr in (
        "_n", "_ng", "_mm", "_mm0", "_bad", "_eq_s", "_eq_n", "_rng",
        "_ex", "_pf", "_tok", "_neg_tok", "_ph", "_neg_ph", "_neg_s",
        "_neg_n", "_neg_ex", "_neg_pf",
    ):
        assert getattr(st_l, attr) == st_d[attr], attr
    assert sorted(st_l._fields) == sorted(st_d["_fields"])

    # merged-interval twins, row by row (grouped=True here: the
    # should list makes multi-leaf groups, so the singleton-group
    # filter is exercised too)
    grouped = (st_l._mm or 0) > 1 or st_l._ng < st_l._n
    assert grouped
    pos = ~F.col("negated")
    rng = stripped.filter(
        pos & F.col("op").isin("gt", "gte", "lt", "lte")
    ).select("query_id", "group_id", "field", "op", "nval", "min_match")
    gsz = stripped.filter(pos).groupBy("query_id", "group_id").agg(
        F.count(F.lit(1)).alias("_gsz")
    )
    mergeable = (
        rng.filter(F.col("min_match") == 1)
        .join(gsz, ["query_id", "group_id"])
        .filter(F.col("_gsz") == 1)
    )
    dist_rows = sorted(
        tuple(r)
        for r in _distributed_merged_intervals(mergeable)
        .select("query_id", "field", "_gw", "lo", "hi",
                "lo_strict", "hi_strict")
        .collect()
    )
    local_merged = sorted(_driver_merged_intervals(local_rows, grouped))
    assert local_merged == dist_rows
    assert any(r[3] is not None and r[4] is not None for r in local_merged)
    assert any(r[3] is None or r[4] is None for r in local_merged)


def test_percolate_bulk_prefix_conjuncts(spark):
    """Round 12 (VERDICT r11 Next #7): prefix conjuncts — matched
    through per-field fixed-length prefix bins — must agree with
    percolate()'s full-DSL answer in must, should, and must_not
    positions; an empty prefix normalizes to exists."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, host="web-01", kind="a"),
            Row(id=2, host="web-02", kind="b"),
            Row(id=3, host="db-01", kind="a"),
            Row(id=4, host="w", kind="a"),          # shorter than bin
            Row(id=5, host=None, kind="a"),
        ]
    )
    rules = {
        # bare prefix
        "web": {"prefix": {"host": "web-"}},
        # dict value form + term beside it
        "web_a": {"bool": {"must": [
            {"prefix": {"host": {"value": "web"}}},
            {"term": {"kind": "a"}},
        ]}},
        # mixed-length prefixes on ONE field: bin length = shortest
        "w_any": {"prefix": {"host": "w"}},
        # should with msm=1: db prefix OR kind=b
        "db_or_b": {"bool": {"should": [
            {"prefix": {"host": "db-"}},
            {"term": {"kind": "b"}},
        ], "minimum_should_match": 1}},
        # must_not prefix kills
        "a_not_web": {"bool": {"must": [{"term": {"kind": "a"}}],
                               "must_not": [{"prefix": {"host": "web"}}]}},
        # empty prefix == exists
        "has_host": {"prefix": {"host": ""}},
    }
    conj = queries_to_conjuncts(spark, rules)
    assert conj.filter(
        (F.col("query_id") == "has_host") & (F.col("op") == "exists")
    ).count() == 1
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (1, "has_host"), (1, "w_any"), (1, "web"), (1, "web_a"),
        (2, "db_or_b"), (2, "has_host"), (2, "w_any"), (2, "web"),
        (3, "a_not_web"), (3, "db_or_b"), (3, "has_host"),
        (4, "a_not_web"), (4, "has_host"), (4, "w_any"),
        (5, "a_not_web"),  # NULL host never matches must_not → survives
    ]


def test_percolate_bulk_terms_and_wildcard_conjuncts(spark):
    """Round 12: a terms leaf normalizes to an IN group (eq rows
    sharing one min_match-1 group); a prefix-shaped wildcard ("lit*")
    normalizes to a prefix conjunct; general wildcards raise.
    Agreement with percolate() across must/should/must_not."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, kind="a", host="web-01", n=10.0),
            Row(id=2, kind="b", host="web-02", n=20.0),
            Row(id=3, kind="c", host="db-01", n=30.0),
            Row(id=4, kind=None, host="web-03", n=40.0),
        ]
    )
    rules = {
        # bare terms (IN)
        "ab": {"terms": {"kind": ["a", "b"]}},
        # terms in must beside a range
        "ab_small": {"bool": {"must": [
            {"terms": {"kind": ["a", "b"]}},
            {"range": {"n": {"lt": 15}}},
        ]}},
        # numeric terms
        "n_in": {"terms": {"n": [20, 30]}},
        # terms inside should with msm=2: needs kind-IN AND web host
        "two": {"bool": {"should": [
            {"terms": {"kind": ["b", "c"]}},
            {"wildcard": {"host": "web-*"}},
        ], "minimum_should_match": 2}},
        # must_not terms kills any listed value
        "not_ab": {"bool": {"must": [{"exists": {"field": "kind"}}],
                            "must_not": [{"terms": {"kind": ["a", "b"]}}]}},
        # prefix-shaped wildcard
        "webw": {"wildcard": {"host": "web-*"}},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (1, "ab"), (1, "ab_small"), (1, "webw"),
        (2, "ab"), (2, "n_in"), (2, "two"), (2, "webw"),
        (3, "n_in"), (3, "not_ab"),
        (4, "webw"),
    ]
    # general wildcards are not conjunct-expressible
    with pytest.raises(ValueError, match="full DSL"):
        queries_to_conjuncts(spark, {"q": {"wildcard": {"host": "w*b"}}})
    with pytest.raises(ValueError, match="full DSL"):
        queries_to_conjuncts(spark, {"q": {"wildcard": {"host": "we?-*"}}})
    with pytest.raises(ValueError, match="non-empty"):
        queries_to_conjuncts(spark, {"q": {"terms": {"kind": []}}})


def test_percolate_bulk_match_token_conjuncts(spark):
    """Round 12: match rules normalize to TOKEN conjuncts — the
    "message contains X" alert class: operator and = one singleton
    group per token, or = any-token group; repeated doc tokens count
    a leaf ONCE (the distinct guard); must_not match kills on any
    token; should with a multi-token match raises."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            (1, "disk error on boot", "prod"),
            (2, "disk full full full", "prod"),   # repeated token
            (3, "clean run", "dev"),
            (4, None, "prod"),
        ],
        "id int, msg string, env string",
    )
    rules = {
        "derr": {"match": {"msg": {"query": "disk error",
                                   "operator": "and"}}},
        "any": {"match": {"msg": "error clean"}},
        "prod_disk": {"bool": {"must": [
            {"term": {"env": "prod"}},
            {"match": {"msg": "disk"}},
        ], "must_not": [{"match": {"msg": "full"}}]}},
        # single-token match inside should composes
        "dev_or_clean": {"bool": {"should": [
            {"term": {"env": "dev"}},
            {"match": {"msg": "clean"}},
        ], "minimum_should_match": 1}},
    }
    conj = queries_to_conjuncts(spark, rules)
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [
        (1, "any"), (1, "derr"), (1, "prod_disk"),
        (3, "any"), (3, "dev_or_clean"),
    ]
    # and-match: each token its own group (the band pattern)
    derr = conj.filter(F.col("query_id") == "derr")
    assert derr.select("group_id").distinct().count() == 2
    # multi-token match inside should raises
    with pytest.raises(ValueError, match="one clause"):
        queries_to_conjuncts(spark, {"q": {"bool": {"should": [
            {"match": {"msg": "a b"}}], "minimum_should_match": 1}}})
    # token rules on numeric fields fail loudly
    ndocs = spark.createDataFrame([(1, 5.0)], "id int, n double")
    nconj = queries_to_conjuncts(spark, {"q": {"match": {"n": "5"}}})
    with pytest.raises(ValueError, match="string field"):
        percolate_bulk(ndocs, nconj, id_cols=["id"]).collect()


def test_percolate_bulk_geo_box_conjuncts(spark):
    """Round 12: a geo_bounding_box rule normalizes to TWO numeric
    bands over the struct's dotted sub-fields (lat/lon, each bound a
    singleton group → the binned two-sided route); dotted paths
    resolve through the doc schema; dateline-wrapping boxes and
    should/must_not positions raise."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame(
        [
            Row(id=1, loc=Row(lat=10.0, lon=20.0), kind="a"),
            Row(id=2, loc=Row(lat=50.0, lon=20.0), kind="a"),
            Row(id=3, loc=Row(lat=10.0, lon=90.0), kind="a"),
            Row(id=4, loc=None, kind="a"),
        ]
    )
    rules = {
        "box": {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 30.0, "lon": 0.0},
            "bottom_right": {"lat": 0.0, "lon": 45.0}}}},
        "box_a": {"bool": {"must": [
            {"term": {"kind": "a"}},
            {"geo_bounding_box": {"loc": {
                "top_left": {"lat": 90.0, "lon": 10.0},
                "bottom_right": {"lat": -90.0, "lon": 30.0}}}},
        ]}},
    }
    conj = queries_to_conjuncts(spark, rules)
    # the box is four singleton groups (two mergeable bands)
    assert conj.filter(F.col("query_id") == "box").select(
        "group_id"
    ).distinct().count() == 4
    got = sorted(
        (r.id, r.query_id)
        for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
    )
    want = sorted(
        (r.id, r.query_id)
        for r in percolate(docs, rules, id_cols=["id"]).collect()
    )
    assert got == want == [(1, "box"), (1, "box_a"), (2, "box_a")]
    with pytest.raises(ValueError, match="dateline"):
        queries_to_conjuncts(spark, {"q": {"geo_bounding_box": {"loc": {
            "top_left": {"lat": 10.0, "lon": 170.0},
            "bottom_right": {"lat": 0.0, "lon": -170.0}}}}})


def test_percolate_bulk_min_match_zero_rejected(spark):
    """ADVICE r11 (low): an externally supplied conjuncts frame with
    min_match=0 must raise, not silently render the query
    unmatchable (the old `(mm0 or 1) < 1` mapped 0 → 1)."""
    from dump_es_parquet_spark.operators.es_search import percolate_bulk

    docs = spark.createDataFrame([Row(id=1, k="x")])
    conj = spark.createDataFrame(
        [("q", 0, "k", "eq", "x", None, 0, 0, False)],
        "query_id string, conjunct_id int, field string, op string, "
        "sval string, nval double, group_id int, min_match int, "
        "negated boolean",
    )
    with pytest.raises(ValueError, match="min_match"):
        percolate_bulk(docs, conj, id_cols=["id"]).collect()


def test_percolate_bulk_exposes_persist_handles(spark):
    """ADVICE r11 (low): the result carries the persisted frames so
    long-lived sessions can release the cache eagerly."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame([Row(id=1, n=7.0)])
    conj = queries_to_conjuncts(
        spark, {"band": {"range": {"n": {"gte": 5, "lte": 10}}}}
    )
    out = percolate_bulk(docs, conj, id_cols=["id"])
    assert out.count() == 1
    handles = out._percolate_persisted
    assert len(handles) >= 1
    for h in handles:
        h.unpersist()


def test_percolate_bulk_phrase_conjuncts(spark):
    """Round 13 (VERDICT r12 Next #6): ``match_phrase`` rules — ONE
    phrase conjunct per leaf, adjacency decided by the sentinel-
    joined token sequence on longest-token candidates; composes in
    must / should / must_not; slop and numeric fields raise."""
    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    docs = spark.createDataFrame([
        Row(id=1, msg="disk error on node a", sev=3.0),
        Row(id=2, msg="error disk full", sev=1.0),
        Row(id=3, msg="disk ok error elsewhere", sev=2.0),
        Row(id=4, msg=None, sev=5.0),
        Row(id=5, msg="disk error", sev=None),
    ])
    rules = {
        "r_must": {"match_phrase": {"msg": "disk error"}},
        "r_dict": {"bool": {"must": [
            {"match_phrase": {"msg": {"query": "disk error",
                                      "slop": 0}}},
            {"range": {"sev": {"gte": 2}}}]}},
        "r_should": {"bool": {"should": [
            {"match_phrase": {"msg": "disk full"}},
            {"term": {"sev": 5.0}}], "minimum_should_match": 1}},
        "r_not": {"bool": {
            "must": [{"range": {"sev": {"gte": 1}}}],
            "must_not": [{"match_phrase": {"msg": "disk ok"}}]}},
        "r_single": {"match_phrase": {"msg": "elsewhere"}},
    }
    cj = queries_to_conjuncts(spark, rules)
    got = sorted((r.id, r.query_id)
                 for r in percolate_bulk(docs, cj, ["id"]).collect())
    want = sorted((r.id, r.query_id)
                  for r in percolate(docs, rules, ["id"]).collect())
    assert got == want
    # adjacency is load-bearing: doc 3 has both tokens NON-adjacent
    assert (3, "r_must") not in got and (1, "r_must") in got
    with pytest.raises(ValueError, match="slop"):
        queries_to_conjuncts(spark, {"r": {"match_phrase": {
            "msg": {"query": "disk error", "slop": 2}}}})
    with pytest.raises(ValueError, match="zero tokens"):
        queries_to_conjuncts(spark, {"r": {"match_phrase": {
            "msg": "   "}}})
    with pytest.raises(ValueError, match="need a string field"):
        percolate_bulk(docs, queries_to_conjuncts(spark, {
            "r": {"match_phrase": {"sev": "1 2"}}}), ["id"]).collect()


def test_percolate_bulk_randomized_agreement(spark):
    """Round 12: seeded randomized agreement percolate_bulk ≡
    percolate over the whole conjunct-expressible grammar (term /
    terms / 1-2-bound ranges / exists / prefix / prefix-wildcard /
    match or+and / geo boxes / bool must+must_not+should with
    minimum_should_match) against docs with NULLs — the test class
    that catches grouping bugs like the r11 two-bound-band OR (each
    trial is tiny; 10 seeded trials sweep many shape combinations)."""
    import random

    from dump_es_parquet_spark.operators.es_search import (
        percolate,
        percolate_bulk,
        queries_to_conjuncts,
    )

    rnd = random.Random(1207)
    vocab = ["disk", "error", "boot", "net", "slow", "ok"]
    kinds = ["a", "b", "c", None]
    hosts = ["web-01", "web-02", "db-01", "db-02", None]

    def rand_leaf(must_pos: bool):
        r = rnd.random()
        if r < 0.15:
            return {"term": {"k": rnd.choice(["a", "b", "c"])}}
        if r < 0.3:
            return {"terms": {"k": rnd.sample(["a", "b", "c"], 2)}}
        if r < 0.5:
            lo = rnd.randint(0, 8) * 10
            spec = {}
            if rnd.random() < 0.7:
                spec[rnd.choice(["gte", "gt"])] = lo
            if (must_pos and rnd.random() < 0.7) or not spec:
                spec[rnd.choice(["lte", "lt"])] = lo + rnd.randint(1, 5) * 10
            return {"range": {"n": spec}}
        if r < 0.6:
            return {"exists": {"field": rnd.choice(["k", "h", "n"])}}
        if r < 0.75:
            return {"prefix": {"h": rnd.choice(["web", "web-0", "db", "d"])}}
        if r < 0.85:
            return {"wildcard": {"h": rnd.choice(["web*", "db-*"])}}
        if r < 0.92:
            # match_phrase (round 13): single conjunct row — legal in
            # every position, including multi-token inside should /
            # must_not (unlike match)
            return {"match_phrase": {
                "msg": " ".join(rnd.sample(vocab, rnd.randint(1, 2)))}}
        q = " ".join(rnd.sample(vocab, rnd.randint(1, 2 if must_pos else 1)))
        spec = {"query": q}
        if must_pos and rnd.random() < 0.5 and " " in q:
            spec["operator"] = "and"
        return {"match": {"msg": spec}}

    for trial in range(10):
        docs = spark.createDataFrame(
            [
                Row(
                    id=i,
                    k=rnd.choice(kinds),
                    h=rnd.choice(hosts),
                    n=(None if rnd.random() < 0.15
                       else float(rnd.randint(0, 100))),
                    msg=(None if rnd.random() < 0.15
                         else " ".join(rnd.sample(vocab, 3))),
                )
                for i in range(10)
            ]
        )
        rules = {}
        for qi in range(5):
            shape = rnd.random()
            if shape < 0.3:
                rules[f"r{qi}"] = rand_leaf(True)
            else:
                must = [rand_leaf(True) for _ in range(rnd.randint(1, 2))]
                b = {"must": must}
                if shape < 0.55:
                    b["must_not"] = [rand_leaf(False)]
                if shape > 0.8:
                    should = [rand_leaf(False) for _ in range(2)]
                    b["should"] = should
                    b["minimum_should_match"] = rnd.randint(1, 2)
                rules[f"r{qi}"] = {"bool": b}
        conj = queries_to_conjuncts(spark, rules)
        got = sorted(
            (r.id, r.query_id)
            for r in percolate_bulk(docs, conj, id_cols=["id"]).collect()
        )
        want = sorted(
            (r.id, r.query_id)
            for r in percolate(docs, rules, id_cols=["id"]).collect()
        )
        assert got == want, (
            f"trial {trial}: bulk {got} != full {want}; rules={rules}"
        )


def test_percolate_bulk_guards(spark):
    from dump_es_parquet_spark.operators.es_search import (
        percolate_bulk,
        queries_to_conjuncts,
    )

    # non-conjunct DSL shapes are rejected with a pointer at the
    # full-DSL path, not silently mis-matched
    with pytest.raises(ValueError, match="full DSL"):
        queries_to_conjuncts(
            spark, {"q": {"bool": {"must_not": [{"term": {"k": "x"}}]}}}
        )
    # match is conjunct-expressible since round 12 (token rows);
    # regexp remains full-DSL-only
    with pytest.raises(ValueError, match="full DSL"):
        queries_to_conjuncts(spark, {"q": {"regexp": {"k": "x.*y"}}})
    # a rule on a non-scalar field type raises instead of never
    # matching
    docs = spark.createDataFrame(
        [Row(id=1, tags=["a"], k="x")],
    )
    conj = queries_to_conjuncts(spark, {"q": {"term": {"tags": "a"}}})
    with pytest.raises(ValueError, match="scalar"):
        percolate_bulk(docs, conj, id_cols=["id"]).collect()
    # a rule on a field absent from the docs simply never matches
    conj2 = queries_to_conjuncts(spark, {"q": {"term": {"nope": "a"}}})
    assert percolate_bulk(docs, conj2, id_cols=["id"]).count() == 0


def test_streamable_aggs_week_aligns_to_monday(spark, sf_dir):
    # ADVICE r09: F.window aligns '1 week' tumbling windows to the
    # epoch (a THURSDAY); compile_aggs / ES calendar weeks start
    # Monday. streamable_aggs must shift the grid so the documented
    # batch ≡ compile_aggs contract holds for 'week' too.
    from dump_es_parquet_spark.operators.es_search import streamable_aggs
    from dump_es_parquet_spark.operators.tables import load

    tree = {
        "by_week": {
            "date_histogram": {"field": "ts", "calendar_interval": "week"},
            "aggs": {"sum_value": {"sum": {"field": "value"}}},
        }
    }
    events = load(spark, sf_dir, "events")
    batch = streamable_aggs(events, tree)
    leaf = (
        compile_aggs(
            events,
            {
                "by_week": {
                    "date_histogram": {"field": "ts",
                                       "calendar_interval": "week"},
                    "aggs": {"sum_value": {"sum": {"field": "value"}}},
                }
            },
        )
        .filter("level = 1")
        .select("by_week", "doc_count", "sum_value")
    )
    b = sorted(map(tuple, batch.collect()))
    assert sorted(map(tuple, leaf.collect())) == b and len(b) > 0
    # and every bucket key is a Monday
    import datetime as dt

    for ms, _, _ in b:
        day = dt.datetime.fromtimestamp(ms / 1000, dt.timezone.utc)
        assert day.weekday() == 0, day


def test_streamable_aggs_geo_grid_sub_bucket(spark):
    """Round 11: the geo grid kinds are stateless key expressions, so
    a live map dashboard (date_histogram root → geotile cells) is
    streamable and equals compile_aggs' leaf level on a batch frame."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import streamable_aggs

    df = spark.createDataFrame(
        [
            Row(ts=dt.datetime(2024, 1, 1, 0, 5),
                loc=Row(lat=10.0, lon=20.0), n=1.0),
            Row(ts=dt.datetime(2024, 1, 1, 0, 25),
                loc=Row(lat=10.2, lon=20.2), n=2.0),
            Row(ts=dt.datetime(2024, 1, 1, 1, 5),
                loc=Row(lat=-50.0, lon=-120.0), n=3.0),
        ]
    )
    aggs = {
        "per_hour": {
            "date_histogram": {"field": "ts", "calendar_interval": "hour"},
            "aggs": {
                "cell": {"geotile_grid": {"field": "loc", "precision": 4},
                         "aggs": {"s": {"sum": {"field": "n"}}}},
            },
        }
    }
    got = sorted(
        map(tuple, streamable_aggs(df, aggs).collect())
    )
    leaf = compile_aggs(df, aggs).filter("level = 2").select(
        "per_hour", "cell", "doc_count", "s"
    )
    assert got == sorted(map(tuple, leaf.collect()))
    assert len(got) == 2 and got[0][2] + got[1][2] == 3


def test_streamable_aggs_rejects_unmaintainable_shapes(spark):
    from dump_es_parquet_spark.operators.es_search import streamable_aggs

    df = spark.createDataFrame([Row(ts="2024-01-01 00:00:00", k="a", n=1.0)]) \
        .select(F.col("ts").cast("timestamp").alias("ts"), "k", "n")
    with pytest.raises(ValueError, match="date_histogram root"):
        streamable_aggs(df, {"k": {"terms": {"field": "k"}}})
    with pytest.raises(ValueError, match="size pruning"):
        streamable_aggs(df, {
            "h": {"date_histogram": {"field": "ts", "fixed_interval": "1h"},
                  "aggs": {"k": {"terms": {"field": "k", "size": 3}}}}})
    with pytest.raises(ValueError, match="no fixed width"):
        streamable_aggs(df, {
            "h": {"date_histogram": {"field": "ts",
                                     "calendar_interval": "month"}}})
    with pytest.raises(ValueError, match="streamable"):
        streamable_aggs(df, {
            "h": {"date_histogram": {"field": "ts", "fixed_interval": "1h"},
                  "aggs": {"u": {"cardinality": {"field": "k"}}}}})


def test_agg_tree_plans_one_scan(spark):
    # the whole multi-level tree (pruning + pipelines included) must
    # compile to ONE scan of the raw data — the per-level-branch
    # formulation regressed to one scan PER level (Catalyst pushes
    # level filters below the Expand and specializes each branch)
    df = spark.createDataFrame(
        [Row(day=float(i % 3), kind="k" + str(i % 2), n=float(i))
         for i in range(30)]
    )
    out = compile_aggs(
        df,
        {
            "d": {
                "histogram": {"field": "day", "interval": 1},
                "aggs": {
                    "s": {"sum": {"field": "n"}},
                    "cum": {"cumulative_sum": {"buckets_path": "s"}},
                    "k": {"terms": {"field": "kind", "size": 1},
                          "aggs": {"m": {"avg": {"field": "n"}}}},
                    "best": {"max_bucket": {"buckets_path": "k>m"}},
                },
            }
        },
    )
    out.collect()
    final_plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final_plan.count("Scan ExistingRDD") + final_plan.count(
        "FileScan"
    ) == 1, final_plan


def test_date_histogram_fixed_interval_key_is_epoch_millis(spark):
    df = spark.createDataFrame(
        [Row(ts="2024-01-01 00:10:00"), Row(ts="2024-01-01 00:40:00"),
         Row(ts="2024-01-01 01:10:00")]
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    out = compile_aggs(
        df,
        {"h": {"date_histogram": {"field": "ts", "fixed_interval": "30m"}}},
    ).collect()
    base = 1704067200000  # 2024-01-01T00:00:00Z epoch millis
    assert [(r.h, r.doc_count) for r in out] == [
        (base, 1), (base + 1_800_000, 1), (base + 3_600_000, 1)
    ]


def test_join_field_family(spark):
    """Round 13: has_child (min/max child-count window, min_children 0
    keeps childless parents), has_parent (semi-join), and the
    children aggregation (parent doc_count vs child-side metrics)."""
    from dump_es_parquet_spark.operators.es_search import (
        children_aggs,
        has_child_filter,
        has_parent_filter,
    )

    parents = spark.createDataFrame(
        [(1, "hi"), (2, "hi"), (3, "lo"), (4, "lo")],
        "pid long, prio string",
    )
    children = spark.createDataFrame(
        [(1, "R", 10.0), (1, "R", 20.0), (1, "N", 5.0),
         (2, "R", 7.0), (3, "N", 1.0)],
        "cid long, flag string, qty double",
    )
    q_r = {"term": {"flag": "R"}}
    got = sorted(
        r.pid for r in has_child_filter(
            parents, children, "pid", "cid", q_r, min_children=2
        ).collect()
    )
    assert got == [1]
    # min_children 0 + max_children 0: parents with NO matching child
    got0 = sorted(
        r.pid for r in has_child_filter(
            parents, children, "pid", "cid", q_r,
            min_children=0, max_children=0,
        ).collect()
    )
    assert got0 == [3, 4]
    got_p = sorted(
        (r.cid, r.qty) for r in has_parent_filter(
            children, parents, "cid", "pid",
            {"term": {"prio": "lo"}},
        ).collect()
    )
    assert got_p == [(3, 1.0)]
    agg = {r.by_prio: r for r in children_aggs(
        parents, children, "pid", "cid",
        "by_prio", {"field": "prio", "size": 10},
        "items", {"sum_qty": {"sum": {"field": "qty"}}},
    ).collect()}
    assert (agg["hi"].doc_count, agg["hi"].items_doc_count,
            agg["hi"].sum_qty) == (2, 4, 42.0)
    assert (agg["lo"].doc_count, agg["lo"].items_doc_count,
            agg["lo"].sum_qty) == (2, 1, 1.0)


def test_reverse_nested_subaggs(spark):
    """Round 13 (closing the r12 doc_count-only bound):
    reverse_nested sub-aggs aggregate PARENT fields with each parent
    counted once per bucket, however many of its objects land there;
    unsupported sub-agg kinds raise."""
    from dump_es_parquet_spark.operators.es_search import compile_aggs

    df = spark.createDataFrame([
        (1, 10.0, "a", [Row(k="x"), Row(k="x"), Row(k="y")]),
        (2, 20.0, "b", [Row(k="x")]),
        (3, 99.0, "c", None),
    ], "id long, v double, u string, attrs array<struct<k string>>")
    req = {"objs": {
        "nested": {"path": "attrs"},
        "aggs": {"by_k": {"terms": {"field": "attrs.k", "size": 10},
            "aggs": {"parents": {"reverse_nested": {},
                "aggs": {"avg_v": {"avg": {"field": "v"}},
                         "sum_v": {"sum": {"field": "v"}},
                         "users": {"cardinality": {"field": "u"}}}}}}}}}
    out = {r.by_k: r for r in compile_aggs(df, req).collect()
           if r.level == 2}
    # x holds 3 objects from 2 parents: p1 twice must not double-count
    assert (out["x"].doc_count, out["x"].parents_doc_count,
            out["x"].parents_avg_v, out["x"].parents_sum_v,
            out["x"].parents_users) == (3, 2.0, 15.0, 30.0, 2.0)
    assert (out["y"].parents_doc_count, out["y"].parents_sum_v) == (
        1.0, 10.0)
    with pytest.raises(ValueError, match="simple parent-field"):
        compile_aggs(df, {"objs": {
            "nested": {"path": "attrs"},
            "aggs": {"parents": {"reverse_nested": {},
                "aggs": {"p": {"percentiles": {"field": "v"}}}}}}})


def test_frequent_item_sets(spark):
    """Round 13: exact apriori — singleton/pair/triple supports over
    dedup'd baskets; the singleton prune never changes a surviving
    pair's count; bad params raise."""
    from dump_es_parquet_spark.operators.es_search import (
        frequent_item_sets,
    )

    df = spark.createDataFrame([
        (["a", "b", "c"],), (["a", "b"],), (["a", "b", "b"],),
        (["a", "c"],), (["z"],),
    ], "items array<string>")
    out = {(r.items, r.set_size): (r.doc_count, r.support_r6)
           for r in frequent_item_sets(
               df, "items", min_support=0.4, max_size=3
           ).collect()}
    # n=5, min_docs=2: a:4 b:3 c:2 frequent; z:1 not
    assert out[("a", 1)] == (4, 0.8)
    assert out[("b", 1)] == (3, 0.6)
    assert out[("c", 1)] == (2, 0.4)
    assert ("z", 1) not in out
    # pairs: a|b 3 (duplicate b in one basket counts once), a|c 2
    assert out[("a|b", 2)] == (3, 0.6)
    assert out[("a|c", 2)] == (2, 0.4)
    assert ("b|c", 2) not in out  # support 1
    assert ("a|b|c", 3) not in out  # support 1 < 2
    with pytest.raises(ValueError, match="up to 3"):
        frequent_item_sets(df, "items", max_size=4)
    with pytest.raises(ValueError, match="min_support"):
        frequent_item_sets(df, "items", min_support=0.0)


def test_moving_percentiles_randomized(spark):
    """Round 13 property: for seeded random sparse hourly series, the
    moving_percentiles window over the gap-filled grid equals a
    Python brute force over the union of the trailing buckets' raw
    value multisets (quantile_cont interpolation), empty buckets
    occupying positions and contributing nothing."""
    import datetime as dt
    import random

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    def q_cont(vals, p):
        a = sorted(vals)
        pos = (len(a) - 1) * p
        k = int(pos)
        lo = a[k]
        hi = a[min(k + 1, len(a) - 1)]
        return lo + (pos - k) * (hi - lo)

    rnd = random.Random(1313)
    base = dt.datetime(2024, 3, 1)
    for trial in range(3):
        hours = sorted(rnd.sample(range(0, 36), rnd.randint(4, 9)))
        per_hour = {
            h: [float(rnd.randint(-50, 50)) for _ in range(rnd.randint(1, 4))]
            for h in hours
        }
        rows = [
            (base + dt.timedelta(hours=h, minutes=rnd.randint(0, 59)), v)
            for h, vs in per_hour.items() for v in vs
        ]
        win = rnd.randint(2, 5)
        percents = sorted(rnd.sample([1, 25, 50, 75, 90, 99], 2))
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        out = sorted(
            compile_aggs(df, {"h": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "hour",
                                   "min_doc_count": 0},
                "aggs": {
                    "pct": {"percentiles": {"field": "v",
                                            "percents": percents}},
                    "mp": {"moving_percentiles": {
                        "buckets_path": "pct", "window": win}},
                }}}).collect(),
            key=lambda r: r.h,
        )
        grid = list(range(min(hours), max(hours) + 1))
        assert [r.h for r in out] == [
            int((base + dt.timedelta(hours=h)).timestamp() * 1000)
            for h in grid
        ]
        for pos, h in enumerate(grid):
            merged = [
                v
                for hh in grid[max(0, pos - win + 1): pos + 1]
                for v in per_hour.get(hh, [])
            ]
            row = out[pos]
            for p in percents:
                got = getattr(row, f"mp_p{p}_r6")
                if not merged:
                    assert got is None, (trial, h, p)
                else:
                    assert got == round(q_cont(merged, p / 100), 6), (
                        trial, h, p, merged)


def test_rate_and_mad_randomized(spark):
    """Round 13 property: for seeded random multi-year monthly data
    (leap Februaries included), rate equals total / actual bucket
    length in `unit` and MAD equals the brute-force median of
    absolute deviations, both per Python reimplementations."""
    import calendar
    import datetime as dt
    import random

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    def med(a):
        a = sorted(a)
        n = len(a)
        lo = a[(n + 1) // 2 - 1]
        hi = a[n // 2]
        return lo if n % 2 == 1 else lo + 0.5 * (hi - lo)

    rnd = random.Random(4242)
    for trial in range(3):
        months = sorted(
            rnd.sample([(y, m) for y in (1999, 2000) for m in range(1, 13)],
                       rnd.randint(3, 7))
        )
        data = {
            ym: [float(rnd.randint(1, 500)) for _ in range(rnd.randint(1, 9))]
            for ym in months
        }
        rows = [
            (dt.datetime(y, m, rnd.randint(1, 28)), v)
            for (y, m), vs in data.items() for v in vs
        ]
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        out = {
            (dt.datetime.utcfromtimestamp(r.m / 1000).year,
             dt.datetime.utcfromtimestamp(r.m / 1000).month): r
            for r in compile_aggs(df, {"m": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "month"},
                "aggs": {
                    "r_day": {"rate": {"field": "v", "unit": "day"}},
                    "r_week": {"rate": {"unit": "week"}},
                    "mad": {"median_absolute_deviation": {"field": "v"}},
                }}}).collect()
        }
        for (y, m), vs in data.items():
            row = out[(y, m)]
            days = calendar.monthrange(y, m)[1]
            assert row.r_day_r6 == round(
                sum(vs) / ((days * 86400000) / 86400000.0), 6)
            assert row.r_week_r6 == round(
                len(vs) / ((days * 86400000) / 604800000.0), 6)
            mm = med(vs)
            assert row.mad_r6 == round(med([abs(v - mm) for v in vs]), 6)


def test_frequent_item_sets_randomized(spark):
    """Round 13 property: for seeded random baskets, every emitted
    itemset's doc_count equals the brute-force subset count and
    NOTHING at or above min_support is missing (sizes 1-3)."""
    import itertools
    import math as _math
    import random

    from dump_es_parquet_spark.operators.es_search import (
        frequent_item_sets,
    )

    rnd = random.Random(909)
    alphabet = list("abcdefg")
    for trial in range(2):
        baskets = [
            sorted(set(rnd.sample(alphabet, rnd.randint(1, 5))))
            for _ in range(rnd.randint(8, 14))
        ]
        ms = rnd.choice([0.2, 0.3])
        df = spark.createDataFrame([(b,) for b in baskets],
                                   "items array<string>")
        got = {
            (r.items, r.set_size): r.doc_count
            for r in frequent_item_sets(
                df, "items", min_support=ms, max_size=3, size=1000
            ).collect()
        }
        min_docs = max(int(_math.ceil(ms * len(baskets))), 1)
        want = {}
        for sz in (1, 2, 3):
            for combo in itertools.combinations(alphabet, sz):
                n = sum(1 for b in baskets if set(combo) <= set(b))
                if n >= min_docs:
                    want[("|".join(combo), sz)] = n
        assert got == want, (trial, ms, len(baskets))


def test_join_and_reverse_nested_randomized(spark):
    """Round 13 property: seeded random parent/child tables — the
    has_child survivor set equals the brute-force per-parent matching
    count filter for random (min, max) windows; reverse_nested
    parent-field sums equal the brute-force distinct-parent sums per
    bucket."""
    import random

    from dump_es_parquet_spark.operators.es_search import (
        compile_aggs,
        has_child_filter,
    )

    rnd = random.Random(2718)
    for trial in range(2):
        n_parents = rnd.randint(6, 12)
        parents = [(p, float(rnd.randint(1, 99))) for p in range(n_parents)]
        children = [
            (rnd.randrange(n_parents), rnd.choice(["R", "N"]))
            for _ in range(rnd.randint(10, 30))
        ]
        pdf = spark.createDataFrame(parents, "pid long, pv double")
        cdf = spark.createDataFrame(children, "cid long, flag string")
        mn = rnd.randint(0, 2)
        mx = rnd.choice([None, mn + rnd.randint(0, 2)])
        got = sorted(
            r.pid for r in has_child_filter(
                pdf, cdf, "pid", "cid", {"term": {"flag": "R"}},
                min_children=mn, max_children=mx,
            ).collect()
        )
        counts = {p: 0 for p, _ in parents}
        for c, f in children:
            if f == "R":
                counts[c] += 1
        want = sorted(
            p for p, n in counts.items()
            if n >= mn and (mx is None or n <= mx)
        )
        assert got == want, (trial, mn, mx)

        # reverse_nested sub-agg sums: objects = children re-packed
        # onto their parents as an array column
        by_parent = {p: [] for p, _ in parents}
        for c, f in children:
            by_parent[c].append(f)
        rows = [
            (p, pv, [(f,) for f in by_parent[p]] or None)
            for p, pv in parents
        ]
        ndf = spark.createDataFrame(
            rows, "pid long, pv double, objs array<struct<f string>>"
        )
        out = {
            r.by_f: (r.back_doc_count, r.back_sum_pv)
            for r in compile_aggs(ndf, {"o": {
                "nested": {"path": "objs"},
                "aggs": {"by_f": {"terms": {"field": "objs.f"},
                    "aggs": {"back": {"reverse_nested": {},
                        "aggs": {"sum_pv": {
                            "sum": {"field": "pv"}}}}}}}}}).collect()
            if r.level == 2
        }
        pv_of = dict(parents)
        for flag in ("R", "N"):
            ps = {p for p, fs in by_parent.items() if flag in fs}
            if not ps:
                assert flag not in out
                continue
            assert out[flag] == (
                float(len(ps)), float(sum(pv_of[p] for p in ps))
            ), (trial, flag)


def test_frequent_item_sets_null_items(spark):
    """Round 13 edge: a NULL element inside a basket is not an item —
    no NULL itemset row is emitted and other counts are unchanged."""
    from dump_es_parquet_spark.operators.es_search import (
        frequent_item_sets,
    )

    df = spark.createDataFrame(
        [(["a", None, "b"],), (["a", None],), ([None],)],
        "items array<string>",
    )
    got = {(r.items, r.set_size): r.doc_count
           for r in frequent_item_sets(
               df, "items", min_support=0.5, max_size=2).collect()}
    # 2 non-empty baskets after NULL drop: a:2, b:1 (<1? min_docs =
    # ceil(0.5*2)=1 so b kept), a|b:1
    assert got == {("a", 1): 2, ("b", 1): 1, ("a|b", 2): 1}
    assert all(k[0] is not None for k in got)


def test_significant_terms_background_filter(spark):
    """Round 13: background_filter narrows the JLH background to a
    slice — bg_count counts slice docs only, terms absent from the
    slice drop (no inf scores), and omitting the key reproduces the
    whole-index background exactly."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = [("t1", 9.0)] * 4 + [("t1", 1.0)] + [("t2", 9.0)] * 2 + \
        [("t2", 5.0)] * 5 + [("t3", 1.0)] * 6
    df = spark.createDataFrame(rows, "t string, v double")
    req = {
        "query": {"range": {"v": {"gte": 8}}},
        "aggs": {"sig": {"significant_terms": {
            "field": "t", "min_doc_count": 1,
            "background_filter": {"range": {"v": {"gte": 4}}}}}},
    }
    out = {r.sig: r for r in search_aggs(df, req).collect()}
    # background slice (v>=4): t1 4 of 11; t2 drops on NEGATIVE JLH
    # (fg 2/6 < bg 7/11); t3 is absent from the slice entirely
    assert set(out) == {"t1"}
    assert out["t1"].bg_count == 4
    fgd, nd = 6, 11
    fgp, bgp = 4 / fgd, 4 / nd
    import math
    assert out["t1"].score_micro == math.floor(
        1e6 * ((fgp - bgp) * (fgp / bgp)))
    # without the key: the old whole-index background (nd = 18)
    req2 = {k: v for k, v in req.items()}
    req2["aggs"] = {"sig": {"significant_terms": {
        "field": "t", "min_doc_count": 1}}}
    out2 = {r.sig: r for r in search_aggs(df, req2).collect()}
    assert set(out2) == {"t1"} and out2["t1"].bg_count == 5
    fgp2, bgp2 = 4 / 6, 5 / 18
    assert out2["t1"].score_micro == math.floor(
        1e6 * ((fgp2 - bgp2) * (fgp2 / bgp2)))


def test_bucket_summaries_pruning_randomized(spark):
    """Round 13 property: percentiles_bucket / extended_stats_bucket
    summarize only the SURVIVING children — with a terms size cap on
    the child level, the window must see exactly the kept buckets'
    values (seeded brute force recomputes the survivor set)."""
    import random

    from dump_es_parquet_spark.operators.es_search import compile_aggs

    def q_cont(vals, p):
        a = sorted(vals)
        pos = (len(a) - 1) * p
        k = int(pos)
        hi = a[min(k + 1, len(a) - 1)]
        return a[k] + (pos - k) * (hi - a[k])

    rnd = random.Random(555)
    for trial in range(3):
        rows = []
        groups = ["g1", "g2"]
        subkeys = [f"s{i}" for i in range(rnd.randint(4, 7))]
        for g in groups:
            for s in subkeys:
                for _ in range(rnd.randint(0, 4)):
                    rows.append((g, s, float(rnd.randint(1, 40))))
        if not rows:
            continue
        size = rnd.randint(2, 3)
        df = spark.createDataFrame(rows, "g string, s string, v double")
        out = compile_aggs(df, {"by_g": {
            "terms": {"field": "g", "size": 10},
            "aggs": {
                "by_s": {"terms": {"field": "s", "size": size},
                         "aggs": {"sv": {"sum": {"field": "v"}}}},
                "pb": {"percentiles_bucket": {"buckets_path": "by_s>sv",
                                              "percents": [50]}},
                "esb": {"extended_stats_bucket": {
                    "buckets_path": "by_s>sv"}},
            }}}).collect()
        for g in groups:
            # brute force: terms keeps top-`size` by (count desc, key)
            per_s = {}
            for gg, s, v in rows:
                if gg == g:
                    per_s.setdefault(s, []).append(v)
            kept = sorted(
                per_s, key=lambda s: (-len(per_s[s]), s)
            )[:size]
            sums = [round(sum(per_s[s]), 10) for s in kept]
            row = next(r for r in out if r.level == 1 and r.by_g == g)
            if not sums:
                assert row.pb_p50_r6 is None
                continue
            assert row.pb_p50_r6 == round(q_cont(sums, 0.5), 6), (
                trial, g, sums)
            assert row.esb_count == float(len(sums))
            assert row.esb_sum == round(sum(sums), 10), (trial, g)
            assert row.esb_min == min(sums) and row.esb_max == max(sums)


def test_transform_latest_randomized(spark):
    """Round 13 property: transform_latest equals the brute-force
    (sort, tiebreak) argmax per entity on seeded random data with
    NULL keys/sorts sprinkled in."""
    import datetime as dt
    import random

    from dump_es_parquet_spark.operators.transform import (
        transform_latest,
    )

    rnd = random.Random(31415)
    base = dt.datetime(2024, 1, 1)
    for trial in range(3):
        rows = []
        for i in range(rnd.randint(10, 25)):
            k = rnd.choice(["a", "b", "c", None])
            ts = (None if rnd.random() < 0.15
                  else base + dt.timedelta(hours=rnd.randint(0, 5)))
            rows.append((k, ts, i, float(rnd.randint(0, 99))))
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, id long, v double")
        got = {r.k: (r.ts, r.id, r.v)
               for r in transform_latest(df, ["k"], "ts", "id").collect()}
        want = {}
        for k, ts, i, v in rows:
            if k is None or ts is None:
                continue
            if k not in want or (ts, i) > (want[k][0], want[k][1]):
                want[k] = (ts, i, v)
        assert got == want, trial


def test_show_distribution_randomized(spark):
    """Round 13 property: per bucket the emitted char probabilities
    match a Python Counter and sum to 1 (at rounding tolerance)."""
    import collections
    import random

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rnd = random.Random(888)
    for trial in range(2):
        rows = [
            (rnd.choice(["x", "y"]),
             "".join(rnd.choice("abc ") for _ in range(rnd.randint(1, 9))))
            for _ in range(rnd.randint(5, 15))
        ]
        df = spark.createDataFrame(rows, "g string, s string")
        out = search_aggs(df, {"aggs": {"byg": {
            "terms": {"field": "g"},
            "aggs": {"st": {"string_stats": {
                "field": "s", "show_distribution": True}}}}}}).collect()
        per_g = {}
        for g, s in rows:
            per_g.setdefault(g, collections.Counter()).update(
                c for c in s if c != "\n")
        for g, cnt in per_g.items():
            tot = sum(cnt.values())
            mine = {r.st_char: (r.st_char_count, r.st_prob_r6)
                    for r in out if r.byg == g}
            assert mine == {
                c: (float(n), round(n / tot, 6)) for c, n in cnt.items()
            }, (trial, g)
            assert abs(sum(p for _, p in mine.values()) - 1.0) < 1e-4


def test_terms_partition_union_is_unpartitioned(spark):
    """Round 14 (VERDICT r13 Next #3): the ES high-cardinality walk
    pin — the UNION of all ``include: {partition, num_partitions}``
    slices equals the unpartitioned terms answer exactly (every term
    in exactly one partition, counts/metrics unchanged), for both
    string and numeric keys and composing with exclude."""
    import random

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rng = random.Random(1414)
    rows = [
        (f"u{rng.randrange(40)}", float(rng.randrange(100)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "user string, v double")

    def run(extra_include=None, exclude=None):
        terms = {"field": "user", "size": 1000}
        if extra_include is not None:
            terms["include"] = extra_include
        if exclude is not None:
            terms["exclude"] = exclude
        out = search_aggs(
            df,
            {"aggs": {"by": {
                "terms": terms,
                "aggs": {"sv": {"sum": {"field": "v"}}},
            }}},
        ).collect()
        return {r.by: (r.doc_count, r.sv) for r in out}

    for m in (1, 3, 7):
        parts = [
            run({"partition": p, "num_partitions": m}) for p in range(m)
        ]
        # disjoint …
        seen = [k for d in parts for k in d]
        assert len(seen) == len(set(seen)), m
        # … and exhaustive with identical counts/metrics
        merged = {k: v for d in parts for k, v in d.items()}
        assert merged == run(), m

    # composes with exclude (applied alongside, like the other forms)
    full_noex = run()
    excluded = sorted(full_noex)[:5]
    parts = [
        run({"partition": p, "num_partitions": 4}, exclude=excluded)
        for p in range(4)
    ]
    merged = {k: v for d in parts for k, v in d.items()}
    assert merged == {
        k: v for k, v in full_noex.items() if k not in excluded
    }

    # validation raises
    for bad in (
        {"partition": 3, "num_partitions": 3},
        {"partition": -1, "num_partitions": 3},
        {"partition": 0, "num_partitions": 0},
        {"partition": 0, "num_partitions": 2, "typo": 1},
    ):
        with pytest.raises(ValueError):
            run(bad)


def test_significance_heuristics_hand_checked(spark):
    """Round 14 (VERDICT r13 Next #5): the non-JLH score trees on a
    hand-computed 2x2 contingency. Frame: 10 docs, fg = 4 (v >= 6),
    term 'a' in 3 fg docs and 5 docs overall -> N11=3, N01=2, N10=1,
    N00=4, N=10."""
    import math

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rows = (
        [("a", 9.0)] * 3 + [("b", 9.0)]          # fg: 3x a, 1x b
        + [("a", 1.0)] * 2 + [("b", 1.0)] * 4    # bg-only
    )
    df = spark.createDataFrame(rows, "t string, v double")

    def run(heur, opts=None):
        out = search_aggs(
            df,
            {
                "query": {"range": {"v": {"gte": 6}}},
                "aggs": {"sig": {"significant_terms": {
                    "field": "t", "min_doc_count": 1,
                    heur: (opts or {}),
                }}},
            },
        ).collect()
        return {r.sig: r.score_micro for r in out}

    n11, n01, n10, n00, n = 3.0, 2.0, 1.0, 4.0, 10.0
    n1_, n_1, n0_, n_0 = 4.0, 5.0, 6.0, 5.0
    chi = (n * (n11 * n00 - n01 * n10) ** 2) / (n_1 * n1_ * n0_ * n_0)
    assert run("chi_square")["a"] == math.floor(1e6 * chi)
    assert run("percentage")["a"] == math.floor(1e6 * (3.0 / 5.0))
    mi = sum(
        round((nxy / n) * math.log2((nxy * n) / (nx * ny)), 12)
        for nxy, nx, ny in [(n11, n1_, n_1), (n01, n0_, n_1),
                            (n10, n1_, n_0), (n00, n0_, n_0)]
    )
    assert run("mutual_information")["a"] == math.floor(1e6 * mi)
    d = (max(math.log(n1_), math.log(n_1)) - math.log(n11)) / (
        math.log(n) - min(math.log(n1_), math.log(n_1))
    )
    assert run("gnd")["a"] == math.floor(1e6 * round(math.exp(-d), 12))

    # include_negatives=false drops anti-correlated terms: 'b' has
    # fg share 1/5 < 4/5 rest share -> NULL score -> gone, while
    # include_negatives default keeps its (positive) chi/mi score
    assert "b" in run("chi_square")
    assert "b" not in run("chi_square", {"include_negatives": False})
    assert "b" not in run("mutual_information",
                          {"include_negatives": False})
    # 'a' is positively correlated and survives the flag
    assert "a" in run("chi_square", {"include_negatives": False})

    # two heuristics in one body raise; non-superset raises
    with pytest.raises(ValueError, match="one significance"):
        search_aggs(df, {"aggs": {"sig": {"significant_terms": {
            "field": "t", "gnd": {}, "percentage": {}}}}})
    with pytest.raises(ValueError, match="superset"):
        search_aggs(df, {"aggs": {"sig": {"significant_terms": {
            "field": "t",
            "chi_square": {"background_is_superset": False}}}}})

    # the per-bucket path routes through the same tree: one parent
    # bucket of the whole frame reproduces the root chi score
    per = search_aggs(
        df.withColumn("p", F.lit("x")),
        {
            "query": {"range": {"v": {"gte": 6}}},
            "aggs": {"by_p": {
                "terms": {"field": "p"},
                "aggs": {"sig": {"significant_terms": {
                    "field": "t", "min_doc_count": 1,
                    "chi_square": {},
                }}},
            }},
        },
    ).collect()
    assert {r.sig: r.score_micro for r in per}["a"] == \
        math.floor(1e6 * chi)


def test_geo_shape_polygon_and_envelope(spark):
    """Round 14 (VERDICT r13 Next #7): point-in-polygon by parity
    ray-cast on a hand-checked NON-CONVEX arrow polygon
    (0,0)-(4,0)-(4,4)-(2,1.5)-(0,4): points in the top-middle notch
    are OUTSIDE though the convex hull holds them; envelope = plain
    bounds; guards raise."""
    rows = [
        (1, 1.0, 1.0, True),    # deep inside
        (2, 2.0, 3.0, False),   # in the notch (convex hull would keep)
        (3, 2.0, 1.0, True),    # below the notch tip
        (4, 5.0, 1.0, False),   # right of the polygon
        (5, 3.5, 3.0, True),    # right lobe
        (6, 0.5, 3.5, False),   # left of the left lobe's slant
        (7, -1.0, 2.0, False),  # left of everything
    ]
    df = spark.createDataFrame(
        [(i, lon, lat) for i, lon, lat, _ in rows],
        "id long, lon double, lat double",
    ).withColumn("loc", F.struct(F.col("lat"), F.col("lon")))
    poly = {"geo_shape": {"loc": {"shape": {
        "type": "polygon",
        "coordinates": [[[0.0, 0.0], [4.0, 0.0], [4.0, 4.0],
                         [2.0, 1.5], [0.0, 4.0], [0.0, 0.0]]],
    }}}}
    got = {r.id for r in df.filter(compile_query(poly)).collect()}
    assert got == {i for i, _, _, inside in rows if inside}

    env = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[0.0, 3.5], [2.0, 0.5]],
    }}}}
    got = {r.id for r in df.filter(compile_query(env)).collect()}
    assert got == {1, 2, 3, 6}
    # dateline-wrapping envelope (left > right): the half-band union
    wrap = {"geo_shape": {"loc": {"shape": {
        "type": "envelope", "coordinates": [[3.0, 4.0], [-0.5, 0.0]],
    }}}}
    got = {r.id for r in df.filter(compile_query(wrap)).collect()}
    assert got == {4, 5, 7}  # lon >= 3 or lon <= -0.5, lat in [0, 4]

    for bad, msg in (
        ({"type": "polygon", "coordinates": [[[0, 0], [1, 0],
          [1, 1], [0, 0]], [[0, 0], [1, 0], [0, 1], [0, 0]]]},
         "holes"),
        ({"type": "point", "coordinates": [0, 0]}, "envelope or"),
        ({"type": "polygon", "coordinates": [[[0, 0], [1, 0],
          [0, 0]]]}, ">= 3"),
    ):
        with pytest.raises(ValueError, match=msg):
            compile_query({"geo_shape": {"loc": {"shape": bad}}})
    with pytest.raises(ValueError, match="intersects"):
        compile_query({"geo_shape": {"loc": {
            "shape": {"type": "envelope",
                      "coordinates": [[0.0, 1.0], [1.0, 0.0]]},
            "relation": "within"}}})
    # zero-area all-horizontal ring matches nothing
    flat = {"geo_shape": {"loc": {"shape": {
        "type": "polygon",
        "coordinates": [[[0.0, 1.0], [2.0, 1.0], [4.0, 1.0],
                         [0.0, 1.0]]],
    }}}}
    assert df.filter(compile_query(flat)).count() == 0


def test_moving_fn_holt_randomized(spark):
    """Round 14: MovingFunctions.holt column == the Python reference
    fold (single-pass seeding s1=v1, b1=0) on randomized data with
    gaps, windows 1/3/5, several (alpha, beta) incl. the degenerate
    beta=0 (== ewma with that alpha) and alpha=1."""
    import random

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rng = random.Random(1441)
    t0 = 1704067200000
    rows = [
        (t0 + h * 3600000, round(rng.uniform(1, 500), 2))
        for h in range(40) if rng.random() < 0.7  # gaps
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "ms long, value double"
    ).withColumn("ts", F.timestamp_millis(F.col("ms")))

    def holt_ref(vals, a, b):
        if not vals:
            return None
        s, tr = vals[0], 0.0
        for v in vals[1:]:
            s2 = v * a + (s + tr) * (1.0 - a)
            tr = (s2 - s) * b + tr * (1.0 - b)
            s = s2
        return s

    for win, a, b in ((1, 0.3, 0.1), (3, 0.5, 0.25), (5, 0.7, 0.0),
                      (4, 1.0, 0.4)):
        out = search_aggs(
            df,
            {"aggs": {"h": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "hour",
                                   "min_doc_count": 0},
                "aggs": {
                    "sv": {"sum": {"field": "value"}},
                    "ho": {"moving_fn": {
                        "buckets_path": "sv", "window": win,
                        "script": f"MovingFunctions.holt(values, "
                                  f"{a}, {b})"}},
                },
            }}},
        ).orderBy("h").collect()
        series = [r.sv for r in out]
        for i, r in enumerate(out):
            window_vals = [v for v in series[max(0, i - win + 1): i + 1]
                           if v is not None]
            ref = holt_ref(window_vals, a, b)
            assert (r.ho is None and ref is None) or r.ho == ref, (
                win, a, b, i, r.ho, ref)

    # validation raises
    for bad in ("MovingFunctions.holt(values, 1.5, 0.1)",
                "MovingFunctions.holt(values, 0.3, 1.5)"):
        with pytest.raises(ValueError, match="holt"):
            search_aggs(df, {"aggs": {"h": {
                "date_histogram": {"field": "ts",
                                   "calendar_interval": "hour"},
                "aggs": {"sv": {"sum": {"field": "value"}},
                         "ho": {"moving_fn": {
                             "buckets_path": "sv", "window": 3,
                             "script": bad}}},
            }}})
    with pytest.raises(ValueError, match="32"):
        search_aggs(df, {"aggs": {"h": {
            "date_histogram": {"field": "ts",
                               "calendar_interval": "hour"},
            "aggs": {"sv": {"sum": {"field": "value"}},
                     "ho": {"moving_fn": {
                         "buckets_path": "sv", "window": 33,
                         "script":
                         "MovingFunctions.holt(values, 0.3, 0.1)"}}},
        }}})


def test_has_child_inner_hits(spark):
    """Round 14 (PARITY #23 bound): per matching parent the top-N
    matching children; explicit sort required; min_children gates
    which parents report at all."""
    from dump_es_parquet_spark.operators.es_search import (
        has_child_inner_hits,
    )

    parents = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "pk long, name string"
    )
    children = spark.createDataFrame(
        [(1, 10.0, "x"), (1, 30.0, "x"), (1, 20.0, "x"),
         (2, 5.0, "x"), (2, 7.0, "y"), (3, 1.0, "y")],
        "fk long, v double, tag string",
    )
    out = has_child_inner_hits(
        parents, children, "pk", "fk", {"term": {"tag": "x"}},
        {"size": 2, "name": "kids", "sort": [{"v": "desc"}],
         "_source": ["v"]},
        min_children=2,
    ).collect()
    # parent 1 has 3 'x' children (top 2 by v: 30, 20); parent 2 has
    # only ONE 'x' child -> fails min_children=2; parent 3 none
    assert [(r.fk, r.kids_rank, r.v) for r in out] == [
        (1, 1, 30.0), (1, 2, 20.0)]

    with pytest.raises(ValueError, match="explicit sort"):
        has_child_inner_hits(
            parents, children, "pk", "fk", {"term": {"tag": "x"}},
            {"size": 2})


def test_categorize_text_skeleton(spark):
    """Round 14 (PARITY #26): digit-bearing tokens wildcard to '*',
    pure-word tokens survive, categories rank like terms and carry
    sub-metrics; NULL messages drop."""
    df = spark.createDataFrame(
        [
            ("connection from 10.0.0.1 failed", 1.0),
            ("connection from 10.0.0.2 failed", 2.0),
            ("user u42 logged in", 3.0),
            ("user u7 logged in", 4.0),
            ("connection from 10.0.0.3 failed", 5.0),
            (None, 9.0),
        ],
        "msg string, v double",
    )
    from dump_es_parquet_spark.operators.es_search import search_aggs

    out = search_aggs(
        df,
        {"aggs": {"cats": {
            "categorize_text": {"field": "msg", "size": 10},
            "aggs": {"sv": {"sum": {"field": "v"}}},
        }}},
    ).collect()
    got = {r.cats: (r.doc_count, r.sv) for r in out}
    assert got == {
        "connection from * failed": (3, 8.0),
        "user * logged in": (2, 7.0),
    }
    # size cap ranks count desc, key asc
    out = search_aggs(
        df,
        {"aggs": {"cats": {
            "categorize_text": {"field": "msg", "size": 1},
        }}},
    ).collect()
    assert [r.cats for r in out] == ["connection from * failed"]


def test_has_parent_inner_hits(spark):
    """Round 14 (PARITY #23): each matching child carries its
    parent's _source columns; non-matching parents' children drop;
    a missing _source list raises."""
    from dump_es_parquet_spark.operators.es_search import (
        has_parent_inner_hits,
    )

    parents = spark.createDataFrame(
        [(1, "gold", 9.0), (2, "base", 1.0)],
        "pk long, tier string, score double",
    )
    children = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c")], "fk long, cname string"
    )
    out = has_parent_inner_hits(
        children, parents, "fk", "pk", {"term": {"tier": "gold"}},
        {"name": "p", "_source": ["tier", "score"]},
    ).collect()
    assert sorted((r.fk, r.cname, r.p_tier, r.p_score) for r in out) \
        == [(1, "a", "gold", 9.0), (1, "b", "gold", 9.0)]
    with pytest.raises(ValueError, match="_source"):
        has_parent_inner_hits(
            children, parents, "fk", "pk", {"term": {"tier": "gold"}})


def test_nested_inside_nested_aggregation(spark):
    """Round 14 (lifting the r12/PARITY #22 one-nested bound):
    terms > nested > terms > nested > terms — doc counts per level
    re-base doc -> outer object -> inner object, ancestor metrics
    mask to one row per doc through BOTH explodes, and empty inner
    arrays / NULL outer arrays still carry their ancestors."""
    rows = [
        ("g", 10.0, [
            {"k": "a", "inner": [{"t": "x", "v": 1.0},
                                 {"t": "y", "v": 2.0}]},
            {"k": "b", "inner": [{"t": "x", "v": 3.0}]},
        ]),
        ("g", 20.0, [{"k": "a", "inner": []}]),
        ("h", 30.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "ext string, val double, p array<struct<k string, "
        "inner array<struct<t string, v double>>>>",
    )
    out = compile_aggs(
        df,
        {
            "by_ext": {
                "terms": {"field": "ext"},
                "aggs": {
                    "sum_val": {"sum": {"field": "val"}},
                    "outer": {
                        "nested": {"path": "p"},
                        "aggs": {
                            "by_k": {
                                "terms": {"field": "p.k"},
                                "aggs": {
                                    "inner": {
                                        "nested": {"path": "p.inner"},
                                        "aggs": {
                                            "by_t": {
                                                "terms": {
                                                    "field": "p.inner.t"
                                                },
                                                "aggs": {
                                                    "sum_v": {"sum": {
                                                        "field":
                                                        "p.inner.v"
                                                    }}
                                                },
                                            }
                                        },
                                    }
                                },
                            }
                        },
                    },
                },
            }
        },
    ).collect()
    l1 = {r.by_ext: (r.doc_count, r.sum_val) for r in out if r.level == 1}
    assert l1 == {"g": (2, 30.0), "h": (1, 30.0)}  # DOC counts + sums
    l2 = {r.by_ext: r.doc_count for r in out if r.level == 2}
    assert l2 == {"g": 3}  # OUTER objects; h's NULL array drops here
    l3 = {(r.by_ext, r.by_k): r.doc_count for r in out if r.level == 3}
    assert l3 == {("g", "a"): 2, ("g", "b"): 1}  # outer objects per k
    l4 = {(r.by_ext, r.by_k): r.doc_count for r in out if r.level == 4}
    assert l4 == {("g", "a"): 2, ("g", "b"): 1}  # INNER objects
    l5 = {(r.by_ext, r.by_k, r.by_t): (r.doc_count, r.sum_v)
          for r in out if r.level == 5}
    assert l5 == {
        ("g", "a", "x"): (1, 1.0), ("g", "a", "y"): (1, 2.0),
        ("g", "b", "x"): (1, 3.0),
    }

    # three nested levels raise; a non-absolute inner path raises
    with pytest.raises(ValueError, match="two nested"):
        compile_aggs(df, {"o": {"nested": {"path": "p"}, "aggs": {
            "i": {"nested": {"path": "p.inner"}, "aggs": {
                "x": {"nested": {"path": "p.inner.t"}}}}}}})
    with pytest.raises(ValueError, match="absolute"):
        compile_aggs(df, {"o": {"nested": {"path": "p"}, "aggs": {
            "i": {"nested": {"path": "inner"}}}}})


def test_round14_review_guards(spark):
    """Round-14 self-review fixes: silent-wrong paths now raise —
    (a) non-leaf top_hits under a custom terms survival rule (the
    doc half prunes by the default count-desc rule only), (b) two
    top_hits sections in ONE node (previously last-wins-dropped),
    (c) significant_text with a heuristic knob (previously silently
    JLH), (d) inner_hits _source collisions."""
    from dump_es_parquet_spark.operators.es_search import (
        has_child_inner_hits,
        has_parent_inner_hits,
        search_aggs,
    )

    df = spark.createDataFrame(
        [Row(kind="a", sub="x", n=1.0, id=1),
         Row(kind="b", sub="y", n=2.0, id=2)]
    )
    with pytest.raises(ValueError, match="survival rule"):
        compile_aggs(df, {"k": {
            "terms": {"field": "kind", "order": {"_key": "desc"}},
            "aggs": {
                "e": {"top_hits": {"size": 1, "sort": [{"id": "asc"}],
                                   "_source": ["id"]}},
                "sub": {"terms": {"field": "sub"}},
            }}})
    with pytest.raises(ValueError, match="survival rule"):
        compile_aggs(df, {"k": {
            "terms": {"field": "kind", "min_doc_count": 2},
            "aggs": {
                "e": {"top_hits": {"size": 1, "sort": [{"id": "asc"}],
                                   "_source": ["id"]}},
                "sub": {"terms": {"field": "sub"}},
            }}})
    with pytest.raises(ValueError, match="per agg node"):
        compile_aggs(df, {"k": {
            "terms": {"field": "kind"},
            "aggs": {
                "t1": {"top_hits": {"size": 1, "sort": [{"id": "asc"}]}},
                "t2": {"top_hits": {"size": 1, "sort": [{"id": "desc"}]}},
                "sub": {"terms": {"field": "sub"}},
            }}})
    docs = spark.createDataFrame([("w w", )], "text string")
    with pytest.raises(ValueError, match="JLH default"):
        search_aggs(docs, {"aggs": {"s": {"significant_text": {
            "field": "text", "chi_square": {}}}}})
    parents = spark.createDataFrame([(1, "g")], "pk long, t string")
    children = spark.createDataFrame([(1, 2.0)], "fk long, v double")
    with pytest.raises(ValueError, match="collides"):
        has_child_inner_hits(
            parents, children, "pk", "fk", None,
            {"sort": [{"v": "asc"}], "_source": ["fk", "v"]})
    with pytest.raises(ValueError, match="collide"):
        has_parent_inner_hits(
            children, parents, "fk", "pk", None,
            {"name": "p", "_source": ["t"]}, source=["fk", "p_t"])


def test_round15_review_guards(spark):
    """Round-15 ADVICE fixes: (a) non-leaf top_hits under a
    rare_terms / multi_terms / categorize_text carrier-prefix level
    raises — the bucket half prunes those kinds (max_doc_count
    ceiling / size rank) but the doc half reproduces only the terms
    rule, so letting them through would break the halves-agree
    invariant; (b) chi_square on a degenerate contingency (a zero
    margin — here fg = the whole frame, so N0_ = 0) DROPS the term
    by explicit convention (the gnd precedent) instead of through
    an accidental NULL division."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [Row(kind="a", sub="x", n=1.0, id=1),
         Row(kind="b", sub="y", n=2.0, id=2)]
    )
    th = {"e": {"top_hits": {"size": 1, "sort": [{"id": "asc"}],
                             "_source": ["id"]}},
          "sub": {"terms": {"field": "sub"}}}
    for prefix in (
        {"rare_terms": {"field": "kind"}},
        {"multi_terms": {"terms": [{"field": "kind"},
                                   {"field": "sub"}]}},
        {"categorize_text": {"field": "kind"}},
    ):
        with pytest.raises(ValueError, match="does not reproduce"):
            compile_aggs(df, {"k": {**prefix, "aggs": th}})

    rows = [("a", 9.0)] * 3 + [("b", 9.0)] + [("b", 1.0)] * 2
    sdf = spark.createDataFrame(rows, "t string, v double")
    run = lambda q: search_aggs(  # noqa: E731
        sdf,
        {"query": q, "aggs": {"sig": {"significant_terms": {
            "field": "t", "min_doc_count": 1, "chi_square": {},
        }}}},
    ).collect()
    # non-degenerate: both margins positive, 'a' scores and survives
    assert any(r.sig == "a" for r in run({"range": {"v": {"gte": 6}}}))
    # degenerate: fg = everything -> N0_ = 0 for every term -> all
    # rows drop by the documented convention, no error, no NULL rows
    assert run({"match_all": {}}) == []


def test_nested_inside_nested_randomized(spark):
    """Round-14 property pin: the five-level two-explode frame
    equals a pure-Python reference on randomized docs with NULL
    outer arrays, empty outer arrays, and empty inner arrays — doc
    counts re-base doc -> outer -> inner at every level and the
    level-1 sum never multiplies through either explode."""
    import random
    from collections import defaultdict

    rng = random.Random(14014)
    for trial in range(3):
        docs = []
        for i in range(60):
            ext = rng.choice(["g", "h", "j"])
            val = float(rng.randrange(1, 50))
            shape = rng.random()
            if shape < 0.15:
                p = None
            elif shape < 0.3:
                p = []
            else:
                p = []
                for _ in range(rng.randrange(1, 4)):
                    inner = [
                        {"t": rng.choice(["x", "y"]),
                         "v": float(rng.randrange(1, 9))}
                        for _ in range(rng.randrange(0, 3))
                    ]
                    p.append({"k": rng.choice(["a", "b"]),
                              "inner": inner})
            docs.append((ext, val, p))
        df = spark.createDataFrame(
            docs,
            "ext string, val double, p array<struct<k string, "
            "inner array<struct<t string, v double>>>>",
        )
        out = compile_aggs(
            df,
            {"by_ext": {"terms": {"field": "ext", "size": 10},
                        "aggs": {
                "sv": {"sum": {"field": "val"}},
                "o": {"nested": {"path": "p"}, "aggs": {
                    "by_k": {"terms": {"field": "p.k", "size": 10},
                             "aggs": {
                        "i": {"nested": {"path": "p.inner"},
                              "aggs": {
                            "by_t": {"terms": {"field": "p.inner.t",
                                               "size": 10},
                                     "aggs": {
                                "sv2": {"sum": {"field":
                                                "p.inner.v"}}}},
                        }},
                    }},
                }},
            }}},
        ).collect()

        l1c, l1s = defaultdict(int), defaultdict(float)
        l2, l3, l4 = (defaultdict(int), defaultdict(int),
                      defaultdict(int))
        l5c, l5s = defaultdict(int), defaultdict(float)
        for ext, val, p in docs:
            l1c[ext] += 1
            l1s[ext] += val
            for ob in (p or []):
                l2[ext] += 1
                l3[(ext, ob["k"])] += 1
                for io in ob["inner"]:
                    l4[(ext, ob["k"])] += 1
                    l5c[(ext, ob["k"], io["t"])] += 1
                    l5s[(ext, ob["k"], io["t"])] += io["v"]
        assert {r.by_ext: r.doc_count for r in out if r.level == 1} \
            == dict(l1c), trial
        assert {r.by_ext: r.sv for r in out if r.level == 1} \
            == {k: round(v, 10) for k, v in l1s.items()}, trial
        assert {r.by_ext: r.doc_count for r in out if r.level == 2} \
            == dict(l2), trial
        assert {(r.by_ext, r.by_k): r.doc_count
                for r in out if r.level == 3} == dict(l3), trial
        got4 = {(r.by_ext, r.by_k): r.doc_count
                for r in out if r.level == 4}
        assert got4 == dict(l4), trial
        got5 = {(r.by_ext, r.by_k, r.by_t): (r.doc_count, r.sv2)
                for r in out if r.level == 5}
        assert got5 == {k: (c, l5s[k]) for k, c in l5c.items()}, trial


def test_composite_missing_bucket_paging(spark):
    """Round 14: missing_bucket keeps NULL keys sorted FIRST and the
    after cursor pages through them — the union of all pages equals
    the whole keyed space exactly once (the composite walk pin),
    null cursor included."""
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 1.0), ("a", 2.0), ("b", 1.0)],
        "t string, v double",
    )
    srcs = [{"ty": {"terms": {"field": "t", "missing_bucket": True}}},
            {"band": {"histogram": {"field": "v", "interval": 1}}}]
    pages, after = [], None
    while True:
        page = composite_agg(df, srcs, size=2, after=after).collect()
        if not page:
            break
        pages.extend((r.ty, r.band, r.doc_count) for r in page)
        last = page[-1]
        after = {"ty": last.ty, "band": last.band}
        if len(page) < 2:
            break
    assert pages == [
        (None, 1.0, 1), (None, 2.0, 1),
        ("a", 1.0, 1), ("a", 2.0, 1), ("b", 1.0, 1),
    ]
    # without missing_bucket the NULL-key docs drop (the default)
    srcs2 = [{"ty": {"terms": {"field": "t"}}},
             {"band": {"histogram": {"field": "v", "interval": 1}}}]
    assert composite_agg(df, srcs2, size=10).count() == 3


def test_geo_shape_polygon_randomized(spark):
    """Round-14 property pin: the parity ray-cast column equals a
    pure-Python ray-cast on random (often non-convex) polygons and
    random points — same edge rule (horizontal edges skipped, strict
    lon < intersect), so boundary conventions agree by construction."""
    import random

    rng = random.Random(1450)
    for trial in range(4):
        nv = rng.randrange(3, 8)
        ring = [(round(rng.uniform(-50, 50), 3),
                 round(rng.uniform(-50, 50), 3)) for _ in range(nv)]
        pts = [(i, round(rng.uniform(-60, 60), 3),
                round(rng.uniform(-60, 60), 3)) for i in range(120)]

        def py_inside(x, y):
            c = 0
            for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
                if y1 == y2:
                    continue
                if ((y1 > y) != (y2 > y)) and (
                    x < (x2 - x1) * (y - y1) / (y2 - y1) + x1
                ):
                    c += 1
            return c % 2 == 1

        df = spark.createDataFrame(
            pts, "id long, lon double, lat double"
        ).withColumn("loc", F.struct(F.col("lat"), F.col("lon")))
        q = {"geo_shape": {"loc": {"shape": {
            "type": "polygon",
            "coordinates": [[list(v) for v in ring] + [list(ring[0])]],
        }}}}
        got = {r.id for r in df.filter(compile_query(q)).collect()}
        want = {i for i, x, y in pts if py_inside(x, y)}
        assert got == want, (trial, got ^ want)


def test_terms_partition_matches_python_md5(spark):
    """Round-14 property pin: the include-partition hash is the
    documented portable md5 bucket — the Spark column assignment
    equals hashlib.md5 in Python for string AND numeric keys."""
    import hashlib

    from dump_es_parquet_spark.operators.es_search import search_aggs

    def py_bucket(key, m):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return int(h[:4], 16) % m

    vals = [f"u{i}" for i in range(30)] + list(range(100, 130))
    df = spark.createDataFrame([(str(v),) for v in vals], "k string")
    m = 5
    got = {}
    for p in range(m):
        out = search_aggs(df, {"aggs": {"b": {"terms": {
            "field": "k", "size": 1000,
            "include": {"partition": p, "num_partitions": m}}}}}
        ).collect()
        for r in out:
            got[r.b] = p
    assert got == {str(v): py_bucket(v, m) for v in vals}


def test_categorize_text_randomized(spark):
    """Round-14 property pin: the skeleton column equals the Python
    reference (whitespace split, digit-bearing tokens -> '*') on
    random messages mixing words, numbers, hex-ish ids and blanks."""
    import random
    import re as _re
    from collections import Counter

    rng = random.Random(1451)
    words = ["conn", "from", "failed", "user", "login", "ok",
             "retry", "x9y", "10.0.0.7", "id42", "plain"]
    msgs = []
    for _ in range(200):
        n = rng.randrange(1, 6)
        msgs.append(" ".join(rng.choice(words) for _ in range(n)))

    def py_skel(m):
        return " ".join(
            "*" if _re.search(r"[0-9]", t) else t
            for t in _re.split(r"\s+", m.strip())
        )

    want = Counter(py_skel(m) for m in msgs)
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame([(m,) for m in msgs], "msg string")
    out = search_aggs(df, {"aggs": {"c": {"categorize_text": {
        "field": "msg", "size": 1000}}}}).collect()
    assert {r.c: r.doc_count for r in out} == dict(want)


def test_holt_alpha1_beta0_degenerates_to_last_value(spark):
    """Round-14 edge pin: alpha=1, beta=0 makes holt return the
    window's LAST non-NULL value exactly (s <- v each step, trend
    frozen at 0) — a closed-form check independent of the fold."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(1704067200000 + h * 3600000, float(v))
         for h, v in enumerate([5, 9, 2, 7, 3])],
        "ms long, value double",
    ).withColumn("ts", F.timestamp_millis(F.col("ms")))
    out = search_aggs(df, {"aggs": {"h": {
        "date_histogram": {"field": "ts", "calendar_interval": "hour"},
        "aggs": {"sv": {"sum": {"field": "value"}},
                 "ho": {"moving_fn": {
                     "buckets_path": "sv", "window": 3,
                     "script": "MovingFunctions.holt(values, 1.0, 0.0)"
                 }}},
    }}}).orderBy("h").collect()
    assert [r.ho for r in out] == [5.0, 9.0, 2.0, 7.0, 3.0]


# --- round 15: compound wrappers, prefix matches, terms_set, ip/CIDR


def test_compound_filter_context_reductions(spark):
    """Round 15 (VERDICT r14 Next #3): constant_score → its filter,
    dis_max → NULL-safe OR of its queries, boosting → its positive
    clause — the exact filter-context reductions, composing inside
    bool."""
    df = spark.createDataFrame(
        [(1, "quick brown fox", "a", 5.0),
         (2, "quick brow", "b", 1.0),
         (3, "slow brown foxtrot", "a", 9.0),
         (4, None, None, None)],
        "id int, text string, k string, v double")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids({"constant_score": {
        "filter": {"term": {"k": "a"}}, "boost": 2.0}}) == [1, 3]
    assert ids({"dis_max": {"queries": [
        {"term": {"k": "b"}}, {"range": {"v": {"gte": 9}}}],
        "tie_breaker": 0.7}}) == [2, 3]
    # a NULL field in one dis_max arm cannot poison the OR
    assert ids({"dis_max": {"queries": [
        {"term": {"text": "quick brow"}},
        {"term": {"k": "a"}}]}}) == [1, 2, 3]
    # boosting filters by positive ONLY (negative demotes scores)
    assert ids({"boosting": {"positive": {"term": {"k": "a"}},
                             "negative": {"range": {"v": {"gte": 9}}},
                             "negative_boost": 0.5}}) == [1, 3]
    # composition inside bool
    assert ids({"bool": {
        "must": [{"dis_max": {"queries": [
            {"term": {"k": "a"}}, {"term": {"k": "b"}}]}}],
        "must_not": [{"constant_score": {
            "filter": {"term": {"k": "b"}}}}]}}) == [1, 3]
    with pytest.raises(ValueError, match="at least one"):
        ids({"dis_max": {"queries": []}})


def test_ipv6_term_terms_range(spark):
    """Round 17 (VERDICT r16 Next #5, PARITY #30): IPv6 in the ip
    family — CIDR masks via the biased hi/lo two-long /64 split
    reading ('::' compression handled structurally, case folded),
    terms lists mixing v4 and v6 masks, lexicographic hi/lo range
    bounds; exact terms stay textual; v4 values parse NULL in the
    v6 tree (the mixed-column contract)."""
    df = spark.createDataFrame(
        [(1, "2001:db8::1"), (2, "2001:DB8::FFFF"),
         (3, "2001:db8:0:1::1"), (4, "10.0.0.1"), (5, "fe80::1"),
         (6, None), (7, "cafe:beef"), (8, "a::b::c"),
         (9, "2001:0db8:0000:0000:0000:0000:0000:0001")],
        "id int, ip string")

    def ids(q):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query(q))).collect())

    # /64 boundary cases: prefix < 64 (hi band), = 64 (hi band),
    # > 64 (hi pinned + lo band), 128 (exact), 0 (any valid v6)
    assert ids({"term": {"ip": "2001:db8::/32"}}) == [1, 2, 3, 9]
    assert ids({"term": {"ip": "2001:db8::/64"}}) == [1, 2, 9]
    assert ids({"term": {"ip": "2001:db8::/112"}}) == [1, 2, 9]
    assert ids({"term": {"ip": "2001:db8::1/128"}}) == [1, 9]
    assert ids({"term": {"ip": "::/0"}}) == [1, 2, 3, 5, 9]
    # non-base address masks to its network (ES non-strict)
    assert ids({"term": {"ip": "2001:db8::abcd/112"}}) == [1, 2, 9]
    # exact terms are TEXTUAL (the documented bound)
    assert ids({"term": {"ip": "2001:db8::1"}}) == [1]
    assert ids({"term": {"ip": "cafe:beef"}}) == [7]
    # terms: v4 + v6 masks in one list
    assert ids({"terms": {"ip": ["10.0.0.0/8", "fe80::/10"]}}) \
        == [4, 5]
    # range: lexicographic over (hi, lo); a CIDR lte bound takes
    # its band end
    assert ids({"range": {"ip": {"gte": "2001:db8::1",
                                 "lt": "2001:db8::ffff"}}}) == [1, 9]
    assert ids({"range": {"ip": {"lte": "2001:db8::/64"}}}) \
        == [1, 2, 9]
    assert ids({"range": {"ip": {"gt": "2001:db8::ffff"}}}) == [3, 5]
    # mixed v4/v6 bounds raise; malformed masks raise
    with pytest.raises(ValueError, match="mix"):
        compile_query({"range": {"ip": {
            "gte": "10.0.0.0", "lt": "2001:db8::"}}})
    with pytest.raises(ValueError, match="out of range"):
        compile_query({"term": {"ip": "2001:db8::/129"}})
    with pytest.raises(ValueError, match="bad IPv6"):
        compile_query({"term": {"ip": "2001:db8::1::2/64"}})
    # a '/'-bearing value that fails the hex-group shape stays plain
    # string equality (the path-term rule), never a silent band
    assert ids({"term": {"ip": "2001:db8::zz/64"}}) == []


def test_function_score_script_score_reductions(spark):
    """Round 17 (VERDICT r16 Next #2, PARITY #43): function_score /
    script_score match EXACTLY their inner query in filter context —
    per-function `filter` clauses gate score functions, never the
    matched set; min_score (score-dependent matching) raises."""
    df = spark.createDataFrame(
        [(1, "quick brown fox", "a", 5.0),
         (2, "quick brow", "b", 1.0),
         (3, "slow brown foxtrot", "a", 9.0),
         (4, None, None, None)],
        "id int, text string, k string, v double")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    # function filters do NOT restrict matches (ES: a doc matching
    # no function filter still returns at the unmodified score)
    assert ids({"function_score": {
        "query": {"term": {"k": "a"}},
        "functions": [
            {"filter": {"range": {"v": {"gte": 9}}}, "weight": 10},
            {"random_score": {"seed": 7}},
        ],
        "score_mode": "sum", "boost_mode": "multiply",
        "max_boost": 3.0}}) == [1, 3]
    # no query → match_all (ES default); NULL rows still excluded
    # only by their own predicates, so all 4 rows return
    assert ids({"function_score": {
        "functions": [{"weight": 2}]}}) == [1, 2, 3, 4]
    # field_value_factor / decay forms: score-only, ignored
    assert ids({"function_score": {
        "query": {"term": {"k": "b"}},
        "field_value_factor": {"field": "v", "factor": 1.2}}}) == [2]
    # script_score → its inner query; the Painless body is scoring-
    # only and never consulted for the matched set
    assert ids({"script_score": {
        "query": {"range": {"v": {"gte": 5}}},
        "script": {"source": "doc['v'].value * 2"}}}) == [1, 3]
    # NULL-exactness: wrapper under must_not composes NULL-safe
    assert ids({"bool": {"must_not": [{"function_score": {
        "query": {"term": {"k": "b"}}}}]}}) == [1, 3, 4]
    assert ids({"bool": {"must_not": [{"script_score": {
        "query": {"term": {"k": "b"}},
        "script": {"source": "1"}}}]}}) == [1, 3, 4]
    # min_score is the one knob that changes the matched set — raise
    with pytest.raises(ValueError, match="min_score"):
        ids({"function_score": {"query": {"term": {"k": "a"}},
                                "min_score": 1.5}})
    with pytest.raises(ValueError, match="min_score"):
        ids({"script_score": {"query": {"term": {"k": "a"}},
                              "script": {"source": "1"},
                              "min_score": 1.5}})
    with pytest.raises(ValueError, match="query"):
        ids({"script_score": {"script": {"source": "1"}}})
    with pytest.raises(ValueError, match="not modeled"):
        ids({"function_score": {"query": {"term": {"k": "a"}},
                                "nope": 1}})


def test_match_prefix_queries(spark):
    """Round 15 (VERDICT r14 Next #5): match_phrase_prefix anchors
    every token at a boundary with the LAST one a prefix;
    match_bool_prefix is token containment + a last-token prefix
    under the match operator."""
    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quick brow"),
         (3, "slow brown foxtrot"), (4, None)],
        "id int, text string")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids({"match_phrase_prefix": {"text": {"query": "quick bro"}}}) \
        == [1, 2]
    # full tokens still need boundaries; the last is a pure prefix
    assert ids({"match_phrase_prefix": {"text": "brown fox"}}) == [1, 3]
    assert ids({"match_phrase_prefix": {"text": "rown fox"}}) == []
    assert ids({"match_bool_prefix": {"text": {
        "query": "brown fo", "operator": "and"}}}) == [1, 3]
    assert ids({"match_bool_prefix": {"text": {
        "query": "slow fo", "operator": "or"}}}) == [1, 3]
    # empty query matches nothing, both kinds
    assert ids({"match_phrase_prefix": {"text": "  "}}) == []
    assert ids({"match_bool_prefix": {"text": "  "}}) == []


def test_terms_set_query(spark):
    """Round 15 (VERDICT r14 Next #7): per-doc minimum from
    minimum_should_match_field; the script form raises with the
    Painless pointer."""
    df = spark.createDataFrame(
        [(1, ["x", "y"], 2), (2, ["x"], 1), (3, ["y", "z"], 2),
         (4, None, 1), (5, ["x", "y", "z"], None)],
        "id int, tags array<string>, req int")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids({"terms_set": {"tags": {
        "terms": ["x", "y"],
        "minimum_should_match_field": "req"}}}) == [1, 2]
    # NULL array / NULL minimum → no match, never an error
    assert 4 not in ids({"terms_set": {"tags": {
        "terms": ["x"], "minimum_should_match_field": "req"}}})
    with pytest.raises(ValueError, match="minimum_should_match_field"):
        compile_query({"terms_set": {"tags": {
            "terms": ["x"],
            "minimum_should_match_script": {"source": "params..."}}}})


def test_ip_cidr_and_ip_range(spark):
    """Round 15 (VERDICT r14 Next #6): CIDR terms, dotted-quad range
    bounds ordering NUMERICALLY, malformed ips matching nothing,
    IPv6 raising loudly, and the ip_range agg (mask + from/to keys,
    overlap through the multi-membership explode)."""
    from dump_es_parquet_spark.operators.es_search import (
        _cidr_bounds,
        _ip_to_long,
        search_aggs,
    )

    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.0.200"), (3, "10.1.3.4"),
         (4, "192.168.1.1"), (5, "9.255.255.255"), (6, None),
         (7, "garbage")],
        "id int, ip string")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids({"term": {"ip": "10.0.0.0/8"}}) == [1, 2, 3]
    # malformed column values match NOTHING — the shape+range guard
    # is part of the octet tree (without it '1.2.3.4.5' parses as
    # 1.2.3.4 and '300.1.1.1' overflows into a wrong band)
    bad = spark.createDataFrame(
        [(10, "1.2.3.4.5"), (11, "300.1.1.1"), (12, "1.2.3"),
         (13, "01.2.3.4")],
        "id int, ip string")
    hits = bad.filter(_false_safe(compile_query(
        {"range": {"ip": {"gte": "0.0.0.0", "lte": "255.255.255.255"}}}
    ))).collect()
    assert [r.id for r in hits] == [13]  # leading zero is still 4 octets
    assert ids({"term": {"ip": "10.0.0.0/24"}}) == [1, 2]
    assert ids({"term": {"ip": "10.0.0.5"}}) == [1]  # plain equality
    assert ids({"terms": {"ip": ["192.168.0.0/16", "9.255.255.255"]}}) \
        == [4, 5]
    # numeric ordering: '9.x' sorts ABOVE '10.x' as a string but not
    # as an address
    assert ids({"range": {"ip": {"gte": "10.0.0.0",
                                 "lt": "10.1.0.0"}}}) == [1, 2]
    assert ids({"range": {"ip": {"gte": "9.0.0.0",
                                 "lte": "10.0.0.200"}}}) == [1, 2, 5]
    # a CIDR range bound takes its band edge
    assert ids({"range": {"ip": {"gte": "10.0.0.0/8",
                                 "lte": "10.255.255.255"}}}) == [1, 2, 3]
    # round 17: IPv6 masks no longer raise — they take the hi/lo
    # two-long band (test_ipv6_term_terms_range); the v4-mapped
    # dotted-tail form is the remaining loud raise
    with pytest.raises(ValueError):
        compile_query({"term": {"ip": "::ffff:1.2.3.4/96"}})
    # shape-like but VALUE-invalid masks (octet >255, prefix >32) are
    # NOT addresses — they stay plain string equality per the
    # _is_cidr_like contract (round 16, ADVICE): a keyword value like
    # '300.1.1.1/8' must neither raise nor take a numeric band
    weird = spark.createDataFrame(
        [(1, "300.1.1.1/8"), (2, "1.2.3.4/99"), (3, "10.0.0.300/8")],
        "id int, ip string")
    for wid, v in ((1, "300.1.1.1/8"), (2, "1.2.3.4/99"),
                   (3, "10.0.0.300/8")):
        assert sorted(r.id for r in weird.filter(_false_safe(
            compile_query({"term": {"ip": v}}))).collect()) == [wid]
    # a '/'-bearing value that is NOT address-shaped stays plain
    # string equality — keyword terms legitimately contain slashes
    paths = spark.createDataFrame(
        [(1, "foo/bar"), (2, "10.0.0/8"), (3, "GET /x")],
        "id int, p string")
    assert sorted(r.id for r in paths.filter(_false_safe(
        compile_query({"term": {"p": "foo/bar"}}))).collect()) == [1]
    assert sorted(r.id for r in paths.filter(_false_safe(
        compile_query({"terms": {"p": ["10.0.0/8", "GET /x"]}}))
    ).collect()) == [2, 3]
    # the non-base address masks down to its network (ES behavior)
    assert _cidr_bounds("10.0.0.7/8") == (
        _ip_to_long("10.0.0.0"), _ip_to_long("11.0.0.0"))

    out = search_aggs(df, {"aggs": {"bands": {"ip_range": {
        "field": "ip", "ranges": [
            {"to": "10.0.0.100"},
            {"from": "10.0.0.100", "to": "10.2.0.0"},
            {"mask": "192.168.0.0/16"},
        ]}}}}).collect()
    assert {r.bands: r.doc_count for r in out} == {
        "*-10.0.0.100": 2, "10.0.0.100-10.2.0.0": 2,
        "192.168.0.0/16": 1}
    # OVERLAPPING ip_range buckets: a doc lands in EVERY matching
    # band (the multi-membership explode, like range/date_range)
    out2 = search_aggs(df, {"aggs": {"bands": {"ip_range": {
        "field": "ip", "ranges": [
            {"mask": "10.0.0.0/8", "key": "wide"},
            {"mask": "10.0.0.0/24", "key": "narrow"},
        ]}}}}).collect()
    got = {r.bands: r.doc_count for r in out2 if r.bands is not None}
    assert got == {"wide": 3, "narrow": 2}
    # composite/streaming-class consumers stay single-membership:
    # key_expr raises on the overlap
    from dump_es_parquet_spark.operators.es_search import _Level

    with pytest.raises(ValueError, match="overlap"):
        _Level("b", "ip_range", {"field": "ip", "ranges": [
            {"mask": "10.0.0.0/8"}, {"mask": "10.0.0.0/24"},
        ]}).key_expr()


def test_composite_geotile_source(spark):
    """Round 15 (VERDICT r14 Next #8): the composite geotile_grid
    source pages the tile space — pages are disjoint, exhaustive,
    and the keys are IDENTICAL to the geotile_grid agg's (the one
    key expression)."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(i, float(i % 50) - 25.0, float(i * 11 % 360) - 180.0)
         for i in range(80)],
        "id int, lat double, lon double",
    ).withColumn("loc", F.struct(F.col("lat"), F.col("lon")))
    src = [{"tile": {"geotile_grid": {"field": "loc", "precision": 3}}}]
    pages, after = [], None
    for _ in range(20):
        page = composite_agg(df, src, size=4, after=after).collect()
        if not page:
            break
        pages.append(page)
        after = {"tile": page[-1].tile}
    walked = {r.tile: r.doc_count for p in pages for r in p}
    assert len(walked) == sum(len(p) for p in pages)  # disjoint
    agg = search_aggs(df, {"aggs": {"t": {"geotile_grid": {
        "field": "loc", "precision": 3,
        "size": 10_000}}}}).collect()
    assert walked == {r.t: r.doc_count for r in agg}  # exhaustive, same keys


def test_wrapper_case_insensitive_fuzzy(spark):
    """Round 15 extras: the `wrapper` query decodes its base64 JSON
    and recurses; the ES 7.10+ `case_insensitive` flag on
    term/prefix/wildcard/regexp (ASCII lower, both sides); the
    `fuzzy` query as whole-value classic Levenshtein with AUTO
    fuzziness (0/1/2 by term length) and prefix_length."""
    import base64
    import json

    df = spark.createDataFrame(
        [(1, "Click", "fast"), (2, "click", "fist"),
         (3, "VIEW", "feast"), (4, None, None)],
        "id int, k string, w string")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    b64 = base64.b64encode(
        json.dumps({"term": {"k": "click"}}).encode()
    ).decode()
    assert ids({"wrapper": {"query": b64}}) == [2]
    with pytest.raises(ValueError, match="decode"):
        compile_query({"wrapper": {"query": "not-base64-json!!"}})

    assert ids({"term": {"k": {"value": "click",
                               "case_insensitive": True}}}) == [1, 2]
    assert ids({"prefix": {"k": {"value": "cl",
                                 "case_insensitive": True}}}) == [1, 2]
    assert ids({"wildcard": {"k": {"value": "v*w",
                                   "case_insensitive": True}}}) == [3]
    assert ids({"regexp": {"k": {"value": "cl.*",
                                 "case_insensitive": True}}}) == [1, 2]
    assert ids({"regexp": {"k": "cl.*"}}) == [2]  # default stays exact

    # AUTO = 1 for a 4-char term; 'feast' is one insertion away
    assert ids({"fuzzy": {"w": {"value": "fast"}}}) == [1, 2, 3]
    assert ids({"fuzzy": {"w": {"value": "fast", "fuzziness": 0}}}) == [1]
    assert ids({"fuzzy": {"w": {"value": "fast", "fuzziness": 2,
                                "prefix_length": 2}}}) == [1]
    assert ids({"fuzzy": {"w": "of"}}) == []  # AUTO = 0 below 3 chars


def test_multi_match_types_and_date_range_iso(spark):
    """Round 15: multi_match `type` routes field arms through the
    matching kind (phrase / phrase_prefix / bool_prefix; the three
    scoring-only types match identically in filter context);
    date_range accepts ISO-8601 string bounds (normalized to epoch
    millis once, original strings in the default key) and raises on
    `now` math."""
    import datetime as dt

    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(1, "quick brown fox", "fox den"), (2, "quick brow", None),
         (3, "slow brown foxtrot", "quick nap")],
        "id int, a string, b string")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids({"multi_match": {"query": "brown fox",
                                "fields": ["a", "b"],
                                "type": "phrase"}}) == [1]
    assert ids({"multi_match": {"query": "brown fox",
                                "fields": ["a", "b"],
                                "type": "phrase_prefix"}}) == [1, 3]
    assert ids({"multi_match": {"query": "quick bro",
                                "fields": ["a", "b"],
                                "type": "bool_prefix",
                                "operator": "and"}}) == [1, 2]
    assert ids({"multi_match": {"query": "quick fox",
                                "fields": ["a", "b"],
                                "type": "cross_fields"}}) == [1, 2, 3]
    with pytest.raises(ValueError, match="multi_match type"):
        compile_query({"multi_match": {"query": "x", "fields": ["a"],
                                       "type": "nope"}})

    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1 + i, 12, 0, 0)) for i in range(6)],
        "id int, ts timestamp")
    out = search_aggs(ev, {"aggs": {"r": {"date_range": {
        "field": "ts", "ranges": [
            {"to": "2024-01-03T00:00:00"},
            {"from": "2024-01-03T00:00:00", "to": "2024-01-05"},
        ]}}}}).collect()
    got = {r.r: r.doc_count for r in out}
    assert got == {"*-2024-01-03T00:00:00": 2,
                   "2024-01-03T00:00:00-2024-01-05": 2}
    with pytest.raises(ValueError, match="now"):
        search_aggs(ev, {"aggs": {"r": {"date_range": {
            "field": "ts",
            "ranges": [{"from": "now-1d"}]}}}}).collect()


def test_search_count_api(spark):
    """Round 15: the _count API — one-row (total long); keys beyond
    `query` raise (the API accepts only a query)."""
    from dump_es_parquet_spark.operators.es_search import search_count

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", None), (3, "a", 9.0)],
        "id int, k string, v double")
    out = search_count(df, {"query": {"term": {"k": "a"}}}).collect()
    assert [(r.total,) for r in out] == [(2,)]
    assert search_count(df, {}).collect()[0].total == 3  # match_all
    with pytest.raises(ValueError, match="only 'query'"):
        search_count(df, {"query": {"term": {"k": "a"}}, "size": 5})


def test_ip_prefix_agg(spark):
    """Round 16: ip_prefix buckets by the network base of the first
    prefix_length bits — dotted-quad keys (optionally '/len'-
    suffixed), malformed/NULL ips dropped, is_ipv6 and out-of-range
    prefix lengths raise."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(1, "10.0.0.5"), (2, "10.0.3.200"), (3, "10.0.16.4"),
         (4, "192.168.1.1"), (5, None), (6, "garbage"),
         (7, "300.1.1.1")],
        "id int, ip string")
    out = search_aggs(df, {"aggs": {"nets": {"ip_prefix": {
        "field": "ip", "prefix_length": 20,
    }}}}).collect()
    assert {r.nets: r.doc_count for r in out} == {
        "10.0.0.0": 2, "10.0.16.0": 1, "192.168.0.0": 1}
    out = search_aggs(df, {"aggs": {"nets": {"ip_prefix": {
        "field": "ip", "prefix_length": 8,
        "append_prefix_length": True,
    }}}}).collect()
    assert {r.nets: r.doc_count for r in out} == {
        "10.0.0.0/8": 3, "192.0.0.0/8": 1}
    # /0 is one everything-bucket; /32 is per-address
    out = search_aggs(df, {"aggs": {"nets": {"ip_prefix": {
        "field": "ip", "prefix_length": 0}}}}).collect()
    assert {r.nets: r.doc_count for r in out} == {"0.0.0.0": 4}
    with pytest.raises(ValueError, match="is_ipv6"):
        search_aggs(df, {"aggs": {"n": {"ip_prefix": {
            "field": "ip", "prefix_length": 64, "is_ipv6": True}}}})
    with pytest.raises(ValueError, match="out of"):
        search_aggs(df, {"aggs": {"n": {"ip_prefix": {
            "field": "ip", "prefix_length": 33}}}})


def test_random_sampler_agg(spark):
    """Round 16: random_sampler — deterministic portable-hash sample
    (PARITY #35), doc_count scaled by 1/probability with rounding,
    metrics unscaled; p=1 is exact identity; the ES probability
    contract and the field requirement raise."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", float(i)) for i in range(400)],
        "id int, t string, v double")
    req = {"aggs": {"s": {
        "random_sampler": {"probability": 0.5, "seed": 7, "field": "id"},
        "aggs": {"types": {"terms": {"field": "t"}}},
    }}}
    a = {(r.types, r.doc_count) for r in search_aggs(df, req).collect()}
    b = {(r.types, r.doc_count) for r in search_aggs(df, req).collect()}
    assert a == b  # deterministic across runs
    # scaled counts approximate the full data (800 total after 2x)
    total = sum(dc for _, dc in a)
    assert abs(total - 400) < 80
    # p=1: identity with the unsampled plan
    req1 = {"aggs": {"s": {
        "random_sampler": {"probability": 1.0, "field": "id"},
        "aggs": {"types": {"terms": {"field": "t"}}},
    }}}
    exact = {(r.types, r.doc_count)
             for r in search_aggs(df, {"aggs": {
                 "types": {"terms": {"field": "t"}}}}).collect()}
    assert {(r.types, r.doc_count)
            for r in search_aggs(df, req1).collect()} == exact
    with pytest.raises(ValueError, match="probability"):
        search_aggs(df, {"aggs": {"s": {
            "random_sampler": {"probability": 0.7, "field": "id"},
            "aggs": {"n": {"terms": {"field": "t"}}}}}})
    with pytest.raises(ValueError, match="field"):
        search_aggs(df, {"aggs": {"s": {
            "random_sampler": {"probability": 0.5},
            "aggs": {"n": {"terms": {"field": "t"}}}}}})
    with pytest.raises(ValueError, match="sub-aggregations"):
        search_aggs(df, {"aggs": {"s": {
            "random_sampler": {"probability": 0.5, "field": "id"}}}})


def test_random_sampler_scales_sum_and_value_count(spark):
    """ADVICE r16: ES's finalizeSampling scales sum and value_count
    metrics by 1/probability too (avg/min/max stay unscaled). Pin on
    p=0.5 with a constant value column so the scaled sum is exactly
    2x the sampled sum, and on nested sub-agg trees."""
    from dump_es_parquet_spark.operators.es_search import search_aggs

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 10.0) for i in range(400)],
        "id int, t string, v double")
    req = {"aggs": {"s": {
        "random_sampler": {"probability": 0.5, "seed": 7, "field": "id"},
        "aggs": {"types": {
            "terms": {"field": "t"},
            "aggs": {
                "sum_v": {"sum": {"field": "v"}},
                "n_v": {"value_count": {"field": "v"}},
                "avg_v": {"avg": {"field": "v"}},
            },
        }},
    }}}
    rows = search_aggs(df, req).collect()
    for r in rows:
        # constant v=10 → scaled sum must equal 10 * scaled count;
        # value_count scales with rounding to match doc_count
        assert r.n_v == float(r.doc_count)
        assert abs(r.sum_v - 10.0 * r.doc_count) < 1e-6
        assert abs(r.avg_v - 10.0) < 1e-9  # avg unscaled
    # p=1: no scaling path at all, exact identity
    req1 = {"aggs": {"s": {
        "random_sampler": {"probability": 1.0, "field": "id"},
        "aggs": {"types": {
            "terms": {"field": "t"},
            "aggs": {"sum_v": {"sum": {"field": "v"}}},
        }},
    }}}
    assert {(r.types, r.sum_v) for r in search_aggs(df, req1).collect()} \
        == {("a", 2000.0), ("b", 2000.0)}


def test_combined_fields_and_feature_queries(spark):
    """Round 16 (PARITY #37): combined_fields is term-centric — a
    term matches if it appears in ANY field; operator and / integer
    minimum_should_match fold per-TERM verdicts; analyzer applies to
    both sides. rank_feature/distance_feature reduce to exists()."""
    df = spark.createDataFrame(
        [(1, "alpha beta", "web", 5),
         (2, "alpha", "beta", None),
         (3, "gamma", "web", 7),
         (4, None, "alpha beta", 2)],
        "id int, title string, body string, feat int")

    def ids(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    cf = {"combined_fields": {
        "query": "alpha beta", "fields": ["title", "body"],
        "operator": "and"}}
    # id=2 crosses fields: alpha in title, beta in body
    assert ids(cf) == [1, 2, 4]
    cf_or = {"combined_fields": {
        "query": "alpha gamma", "fields": ["title", "body"]}}
    assert ids(cf_or) == [1, 2, 3, 4]
    msm = {"combined_fields": {
        "query": "alpha beta gamma", "fields": ["title", "body"],
        "minimum_should_match": 2}}
    assert ids(msm) == [1, 2, 4]
    # analyzer normalizes the query side too (the round-16 sqs fix
    # discipline)
    up = {"combined_fields": {
        "query": "ALPHA Beta", "fields": ["title", "body"],
        "operator": "and", "analyzer": "standard"}}
    assert ids(up) == [1, 2, 4]
    with pytest.raises(ValueError, match="operator or"):
        compile_query({"combined_fields": {
            "query": "a b", "fields": ["title"],
            "operator": "and", "minimum_should_match": 2}})
    # the scoring features match exactly the docs carrying a value
    assert ids({"rank_feature": {"field": "feat"}}) == [1, 3, 4]
    assert ids({"distance_feature": {
        "field": "feat", "pivot": 3, "origin": 0}}) == [1, 3, 4]


def test_terms_lookup_resolution(spark):
    """Round 16 (PARITY #38): the terms LOOKUP form — fetched from
    another table by id and rewritten to a literal terms query;
    missing doc matches nothing; duplicate ids, a missing lookups=
    table, and a missing id_field raise; a scalar path wraps to a
    one-term list; literal terms bodies pass through untouched."""
    from dump_es_parquet_spark.operators.es_search import (
        resolve_terms_lookups,
        search,
    )

    lkp = spark.createDataFrame(
        [("vip", [1, 3], 7), ("emea", [2], 8)],
        "seg string, ids array<int>, one int")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "uid int, v string")
    req = {
        "query": {"bool": {"filter": [{"terms": {"uid": {
            "index": "segs", "id": "vip", "id_field": "seg",
            "path": "ids"}}}]}},
        "sort": [{"uid": "asc"}], "_source": ["uid"],
    }
    out = search(df, req, lookups={"segs": lkp}).collect()
    assert [r.uid for r in out] == [1, 3]
    # scalar path → one-term list
    r = resolve_terms_lookups(
        {"terms": {"uid": {"index": "segs", "id": "emea",
                           "id_field": "seg", "path": "one"}}},
        {"segs": lkp})
    assert r == {"terms": {"uid": [8]}}
    # missing doc → empty terms (matches nothing)
    r = resolve_terms_lookups(
        {"terms": {"uid": {"index": "segs", "id": "nope",
                           "id_field": "seg", "path": "ids"}}},
        {"segs": lkp})
    assert r == {"terms": {"uid": []}}
    dup = lkp.union(lkp)
    with pytest.raises(ValueError, match="ambiguous"):
        resolve_terms_lookups(
            {"terms": {"uid": {"index": "segs", "id": "vip",
                               "id_field": "seg", "path": "ids"}}},
            {"segs": dup})
    with pytest.raises(ValueError, match="lookups="):
        resolve_terms_lookups(
            {"terms": {"uid": {"index": "other", "id": "x",
                               "id_field": "seg", "path": "ids"}}},
            {"segs": lkp})
    with pytest.raises(ValueError, match="id_field"):
        resolve_terms_lookups(
            {"terms": {"uid": {"index": "segs", "id": "vip",
                               "path": "ids"}}},
            {"segs": lkp})
    # a literal terms body is untouched (no false lookup sniffing)
    lit = {"terms": {"uid": [1, 2]}}
    assert resolve_terms_lookups(lit, {"segs": lkp}) == lit


def test_terms_lookup_never_silently_compiles(spark):
    """ADVICE r16: a lookup-form terms dict that reaches the search
    entry points WITHOUT the lookups= kwarg must raise (it used to
    compile the dict's key names as the term list — a silent
    no-match), and a dict body reaching compile_query directly
    raises in the terms arm."""
    from dump_es_parquet_spark.operators.es_search import (
        compile_query,
        search,
        search_count,
        search_aggs,
    )

    df = spark.createDataFrame([(1, "index")], "id int, uid string")
    lookup_q = {"terms": {"uid": {
        "index": "segs", "id": "vip", "id_field": "k", "path": "ids"}}}
    # entry points resolve unconditionally now — lookups=None raises
    # the 'pass the table' message instead of silently no-matching
    with pytest.raises(ValueError, match="lookups= kwarg"):
        search(df, {"query": lookup_q})
    with pytest.raises(ValueError, match="lookups= kwarg"):
        search_count(df, {"query": lookup_q})
    with pytest.raises(ValueError, match="lookups= kwarg"):
        search_aggs(df, {"query": lookup_q,
                         "aggs": {"n": {"terms": {"field": "uid"}}}})
    # and the compile_query terms arm refuses ANY dict body (e.g. a
    # typo'd lookup missing 'path' that escapes the resolver)
    with pytest.raises(ValueError, match="lookup form"):
        compile_query({"terms": {"uid": {"index": "segs", "id": "v"}}})


def test_intervals_query(spark):
    """Round 16 (PARITY #39): intervals — ordered match with
    max_gaps (the span_near greedy reading), unlimited gaps,
    prefix/wildcard leaves, any_of OR; unordered multi-term and
    all_of raise loudly."""
    df = spark.createDataFrame(
        [(1, "fast table scan merge"),
         (2, "merge fast x y table"),
         (3, "fast x y z table"),
         (4, "table fast"),
         (5, None)],
        "id int, text string")

    def ids(rule):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query({"intervals": {"text": rule}}))).collect())

    # ordered adjacency: max_gaps 0
    m = {"match": {"query": "fast table", "ordered": True,
                   "max_gaps": 0}}
    assert ids(m) == [1]
    # doc 2 has 'fast x y table' (2 gaps); doc 3 needs 3
    m2 = {"match": {"query": "fast table", "ordered": True,
                    "max_gaps": 2}}
    assert ids(m2) == [1, 2]
    m2b = {"match": {"query": "fast table", "ordered": True,
                     "max_gaps": 3}}
    assert ids(m2b) == [1, 2, 3]
    # unlimited (default -1): any in-order chain
    m3 = {"match": {"query": "fast table", "ordered": True}}
    assert ids(m3) == [1, 2, 3]
    # single-term match needs no ordering
    assert ids({"match": {"query": "merge"}}) == [1, 2]
    assert ids({"prefix": {"prefix": "mer"}}) == [1, 2]
    assert ids({"wildcard": {"pattern": "t?ble"}}) == [1, 2, 3, 4]
    assert ids({"any_of": {"intervals": [
        {"match": {"query": "scan"}},
        {"prefix": {"prefix": "z"}},
    ]}}) == [1, 3]
    with pytest.raises(ValueError, match="ordered"):
        compile_query({"intervals": {"text": {
            "match": {"query": "fast table"}}}})
    with pytest.raises(ValueError, match="needs intervals"):
        compile_query({"intervals": {"text": {"all_of": {
            "intervals": []}}}})
    with pytest.raises(ValueError, match="exactly one"):
        compile_query({"intervals": {"text": {
            "match": {"query": "a"}, "prefix": {"prefix": "b"}}}})


def test_intervals_all_of_ordered(spark):
    """Round 17 (VERDICT r16 Next #4, PARITY #39): ordered all_of —
    sub-rule intervals in order, total between-interval gap ≤
    max_gaps; all_of of single-term matches ≡ the flat ordered
    match (the equivalence pin); unordered all_of and nested all_of
    raise."""
    df = spark.createDataFrame(
        [(1, "fast table scan merge"),
         (2, "merge fast x y table"),
         (3, "fast x y z table"),
         (4, "table fast"),
         (5, None)],
        "id int, text string")

    def ids(rule):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query({"intervals": {"text": rule}}))).collect())

    def all_of(subs, **kw):
        return {"all_of": {"intervals": subs, "ordered": True, **kw}}

    m = lambda q: {"match": {"query": q}}

    # equivalence pin: all_of(single-term matches) ≡ flat match, at
    # every gap budget
    for g in (0, 2, 3, -1):
        flat = {"match": {"query": "fast table", "ordered": True,
                          **({"max_gaps": g} if g >= 0 else {})}}
        assert ids(all_of([m("fast"), m("table")],
                          **({"max_gaps": g} if g >= 0 else {}))) \
            == ids(flat), f"gap budget {g}"
    # three-way chain with budget: fast..table..scan? only doc 1 has
    # all three in order (fast@0 table@1 scan@2, gaps 0)
    assert ids(all_of([m("fast"), m("table"), m("scan")],
                      max_gaps=0)) == [1]
    # a multi-term sub-match spends its OWN budget; the outer budget
    # only covers between-interval gaps: doc2 'merge' then the
    # chain fast..table (2 inner gaps) starting right after merge
    assert ids(all_of(
        [m("merge"),
         {"match": {"query": "fast table", "ordered": True,
                    "max_gaps": 2}}],
        max_gaps=0)) == [2]
    # same but outer budget 0 and inner 0: no doc qualifies
    assert ids(all_of(
        [m("merge"),
         {"match": {"query": "fast table", "ordered": True,
                    "max_gaps": 0}}],
        max_gaps=0)) == []
    # prefix / wildcard / any_of sub-rules produce position sets
    assert ids(all_of([{"prefix": {"prefix": "mer"}}, m("fast")],
                      max_gaps=0)) == [2]
    # doc1 fast@0→scan@2 (gap 1), doc3 fast@0→z@3 (gap 2)
    assert ids(all_of(
        [m("fast"),
         {"any_of": {"intervals": [m("scan"), m("z")]}}],
        max_gaps=2)) == [1, 3]
    assert ids(all_of(
        [m("fast"),
         {"any_of": {"intervals": [m("scan"), m("z")]}}],
        max_gaps=1)) == [1]
    # order matters: table before fast only in docs 2(no)/4
    assert ids(all_of([m("table"), m("fast")])) == [4]
    with pytest.raises(ValueError, match="ordered"):
        ids({"all_of": {"intervals": [m("a"), m("b")]}})
    with pytest.raises(ValueError, match="one composition level"):
        ids(all_of([all_of([m("a"), m("b")]), m("c")]))
    with pytest.raises(ValueError, match="not modeled"):
        ids(all_of([m("a")], filter={"before": m("b")}))


def test_intervals_prefix_wildcard_standard_analyzer_casing(spark):
    """ADVICE r16: under analyzer 'standard' the doc tokens are
    lowercased, so the prefix/wildcard query text must fold case the
    same way (Lucene's multi-term normalization — the prefix_leaf
    discipline); under 'whitespace' casing stays exact."""
    df = spark.createDataFrame(
        [(1, "Windows server"), (2, "window seat"), (3, "linux box")],
        "id int, text string")

    def ids(rule):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query({"intervals": {"text": rule}}))).collect())

    # standard: 'Wind' folds to 'wind' and matches both docs
    assert ids({"prefix": {"prefix": "Wind",
                           "analyzer": "standard"}}) == [1, 2]
    assert ids({"wildcard": {"pattern": "Wind*",
                             "analyzer": "standard"}}) == [1, 2]
    assert ids({"wildcard": {"pattern": "WINDOW?",
                             "analyzer": "standard"}}) == [1]
    # whitespace keeps exact case: 'Wind' only matches 'Windows'
    assert ids({"prefix": {"prefix": "Wind",
                           "analyzer": "whitespace"}}) == [1]
    assert ids({"prefix": {"prefix": "wind",
                           "analyzer": "whitespace"}}) == [2]


def test_ids_and_pinned_queries(spark):
    """Round 16: ids / pinned take the id_field engine extension
    (the PARITY #38 discipline) — values compare as strings (ES _id
    semantics); pinned = organic OR ids; pinned.docs and the
    field-less forms raise."""
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id int, t string")

    def ids_of(q):
        return sorted(
            r.id for r in df.filter(_false_safe(compile_query(q))).collect()
        )

    assert ids_of({"ids": {"values": ["1", "3"],
                           "id_field": "id"}}) == [1, 3]
    assert ids_of({"ids": {"values": [2], "id_field": "id"}}) == [2]
    assert ids_of({"ids": {"values": [], "id_field": "id"}}) == []
    assert ids_of({"pinned": {
        "ids": ["4"], "id_field": "id",
        "organic": {"term": {"t": "a"}}}}) == [1, 4]
    assert ids_of({"pinned": {
        "organic": {"term": {"t": "b"}}}}) == [2]
    with pytest.raises(ValueError, match="id_field"):
        compile_query({"ids": {"values": ["1"]}})
    with pytest.raises(ValueError, match="id_field"):
        compile_query({"pinned": {"ids": ["1"],
                                  "organic": {"match_all": {}}}})
    with pytest.raises(ValueError, match="docs"):
        compile_query({"pinned": {"docs": [{"_id": "1"}],
                                  "organic": {"match_all": {}}}})


def test_span_query_family(spark):
    """Round 16 (PARITY #41): span_term / span_first / span_or /
    span_near(in_order) in filter context; unordered span_near,
    mixed-field clauses, and the unmodeled span kinds raise."""
    df = spark.createDataFrame(
        [(1, "fast table scan"),
         (2, "scan x fast y table"),
         (3, "table fast"),
         (4, None)],
        "id int, text string")

    def ids(q):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query(q))).collect())

    assert ids({"span_term": {"text": "scan"}}) == [1, 2]
    assert ids({"span_term": {"text": {"value": "fast"}}}) == [1, 2, 3]
    # span_first: first occurrence within the first N positions
    assert ids({"span_first": {
        "match": {"span_term": {"text": "fast"}}, "end": 1}}) == [1]
    assert ids({"span_first": {
        "match": {"span_term": {"text": "fast"}}, "end": 3}}) == [1, 2, 3]
    assert ids({"span_first": {
        "match": {"span_term": {"text": "fast"}}, "end": 2}}) == [1, 3]
    assert ids({"span_or": {"clauses": [
        {"span_term": {"text": "scan"}},
        {"span_term": {"text": "nothing"}}]}}) == [1, 2]
    near = {"span_near": {"clauses": [
        {"span_term": {"text": "fast"}},
        {"span_term": {"text": "table"}}],
        "slop": 0, "in_order": True}}
    assert ids(near) == [1]
    near2 = {"span_near": {"clauses": [
        {"span_term": {"text": "fast"}},
        {"span_term": {"text": "table"}}],
        "slop": 1, "in_order": True}}
    assert ids(near2) == [1, 2]
    with pytest.raises(ValueError, match="in_order"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"text": "b"}}],
            "slop": 1}})
    with pytest.raises(ValueError, match="one field"):
        compile_query({"span_near": {"clauses": [
            {"span_term": {"text": "a"}}, {"span_term": {"other": "b"}}],
            "slop": 1, "in_order": True}})
    with pytest.raises(ValueError, match="not modeled"):
        compile_query({"span_multi": {"match": {
            "prefix": {"text": "fa"}}}})


def test_span_not_containing_within(spark):
    """Round 17 (VERDICT r16 Next #3, PARITY #41): span_not = an
    include-span overlapping NO exclude-span (pre/post dilation);
    span_containing/span_within = a big-span fully containing a
    little-span (one doc-level verdict). Overlap edge cases pinned:
    adjacent, nested, identical spans."""
    df = spark.createDataFrame(
        [(1, "fast table scan"),
         (2, "scan x fast y table"),
         (3, "table fast"),
         (4, "fast scan table fast x"),
         (5, None)],
        "id int, text string")

    def ids(q):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query(q))).collect())

    t = lambda v: {"span_term": {"text": v}}

    # identical spans always overlap: include==exclude matches nothing
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("fast")}}) == []
    # a 'fast' occurrence NOT adjacent-overlapping a 'scan' span:
    # doc1 fast@0 scan@2 (no overlap: spans are single positions),
    # doc2 fast@2 scan@0, doc3 no scan, doc4 fast@0 scan@1 + fast@3
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("scan")}}) == [1, 2, 3, 4]
    # post=1 dilates include to touch the NEXT position — doc4's
    # fast@0 now overlaps scan@1 but fast@3 survives; doc1's fast@0
    # still misses scan@2
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("scan"), "post": 1}}) \
        == [1, 2, 3, 4]
    # post=2: doc1's fast@0 now overlaps scan@2 and doc1 has no
    # other 'fast' — drops out; doc4 keeps fast@3 (scan@1 is 2 back
    # but pre=0)
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("scan"), "post": 2}}) \
        == [2, 3, 4]
    # pre dilation looks backwards: doc2's fast@2 with pre=2 reaches
    # scan@0 — but doc2 has no other fast, drops; dist = pre+post
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("scan"), "pre": 2}}) \
        == [1, 3, 4]
    # dist=2 = pre=post=2: doc4's fast@3 dilates to [1,5] which
    # reaches scan@1 — only the scan-free doc3 survives
    assert ids({"span_not": {"include": t("fast"),
                             "exclude": t("scan"), "dist": 2}}) == [3]
    # include may be a span_near chain: 'fast...table' in-order
    # chains overlap a 'scan' exclusion only where scan sits inside
    chain = {"span_near": {"clauses": [t("fast"), t("table")],
                           "slop": 2, "in_order": True}}
    # doc1 chain [0,1] (scan@2 outside), doc2 chain [2,4] (scan@0
    # outside), doc4 chain [0,2] contains scan@1 and no other chain
    assert ids({"span_not": {"include": chain,
                             "exclude": t("scan")}}) == [1, 2]
    # containing/within: big = the chain, little = a term inside it.
    # Nested-span case: doc4's chain [0,2] contains scan@1; doc1's
    # chain [0,1] does NOT contain scan@2 (adjacent, not nested)
    assert ids({"span_containing": {"big": chain,
                                    "little": t("scan")}}) == [4]
    assert ids({"span_within": {"little": t("scan"),
                                "big": chain}}) == [4]
    # identical little == big boundary: a single-term big contains
    # the identical single-term little
    assert ids({"span_containing": {"big": t("scan"),
                                    "little": t("scan")}}) == [1, 2, 4]
    # span_or union as the include set
    assert ids({"span_not": {
        "include": {"span_or": {"clauses": [t("fast"), t("x")]}},
        "exclude": t("fast")}}) == [2, 4]
    # guards: mixed fields, negative dilation, unknown keys
    with pytest.raises(ValueError, match="one field"):
        compile_query({"span_not": {
            "include": {"span_term": {"text": "a"}},
            "exclude": {"span_term": {"other": "b"}}}})
    with pytest.raises(ValueError, match=">= 0"):
        compile_query({"span_not": {"include": t("a"),
                                    "exclude": t("b"), "pre": -1}})
    with pytest.raises(ValueError, match="not modeled"):
        compile_query({"span_not": {"include": t("a"),
                                    "exclude": t("b"), "nope": 1}})
    with pytest.raises(ValueError, match="occurrence-set"):
        compile_query({"span_containing": {
            "big": {"span_first": {"match": t("a"), "end": 2}},
            "little": t("b")}})


def test_match_with_fuzziness(spark):
    """Round 16: match + fuzziness — each analyzed query term
    matches any doc TOKEN within the edit budget (AUTO by query-term
    length), folded under the match operator; prefix_length pins."""
    df = spark.createDataFrame(
        [(1, "quick brown fox"), (2, "quack brown fix"),
         (3, "slow green turtle"), (4, None)],
        "id int, text string")

    def ids(q):
        return sorted(r.id for r in df.filter(_false_safe(
            compile_query(q))).collect())

    # 'quick'~AUTO(1..2 edits for len 5) matches quack; fox~ matches fix
    assert ids({"match": {"text": {
        "query": "quick fox", "operator": "and",
        "fuzziness": "AUTO"}}}) == [1, 2]
    assert ids({"match": {"text": {
        "query": "quick fox", "operator": "and",
        "fuzziness": 0}}}) == [1]
    # prefix_length 2 pins 'fo' — 'fix' no longer matches 'fox'
    assert ids({"match": {"text": {
        "query": "fox", "fuzziness": 1,
        "prefix_length": 2}}}) == [1]
    # plain match (no fuzziness) is untouched
    assert ids({"match": {"text": {"query": "brown"}}}) == [1, 2]


def test_geo_grid_query_matches_agg_cell(spark):
    """Round 16: geo_grid ≡ the grid AGG's cell — filtering by a
    bucket's key returns exactly that bucket's docs, for BOTH the
    geotile and geohash arms; geohex raises."""
    import random

    from dump_es_parquet_spark.operators.es_search import search_aggs

    rng = random.Random(16016)
    rows = [(i, rng.uniform(-80, 80), rng.uniform(-170, 170))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id int, lat double, lon double") \
        .withColumn("loc", F.struct(F.col("lat"), F.col("lon"))) \
        .drop("lat", "lon")
    for kind, spec_key, precision in (
        ("geotile_grid", "geotile", 3),
        ("geohash_grid", "geohash", 2),
    ):
        buckets = search_aggs(df, {"aggs": {"cells": {
            kind: {"field": "loc", "precision": precision},
        }}}).collect()
        assert buckets
        # pick the fullest cell; the query must return exactly its
        # doc_count rows
        top = max(buckets, key=lambda r: r.doc_count)
        got = df.filter(_false_safe(compile_query(
            {"geo_grid": {"loc": {spec_key: top.cells}}}))).count()
        assert got == top.doc_count, (spec_key, top.cells)
        # the total over all cells partitions the data
        assert sum(r.doc_count for r in buckets) == 300
    with pytest.raises(ValueError, match="geohex"):
        compile_query({"geo_grid": {"loc": {"geohex": "8a1fb46622dffff"}}})
    with pytest.raises(ValueError, match="z/x/y"):
        compile_query({"geo_grid": {"loc": {"geotile": "nope"}}})
    # ADVICE r16: inside nested, geo_grid raises like the sibling geo
    # queries (the arm reads the TOP-LEVEL frame and would silently
    # resolve wrong under a nested scope)
    with pytest.raises(ValueError, match="nested"):
        compile_query({"nested": {"path": "pts", "query": {
            "geo_grid": {"loc": {"geotile": "3/4/2"}}}}})
