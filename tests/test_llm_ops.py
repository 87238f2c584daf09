"""API-level tests for the round-6 LLM-pipeline operators: span-level
dup detection, budget mixing, deterministic shuffle, int8 quantization.
(The query forms are oracle-verified in test_operators.py; these pin
the API semantics on constructed inputs.)"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def test_span_profile_flags_shared_boilerplate(spark):
    from dump_es_parquet_spark.operators.spans import doc_span_profile

    boiler = " ".join(f"legal{i}" for i in range(8))  # exactly one 8-token span
    rows = [
        (1, boiler + " unique one body text here now extra"),
        (2, boiler + " other words entirely different tail stream"),
        (3, "completely unrelated document with its own eight tokens"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {r.doc_id: r for r in doc_span_profile(d).collect()}
    # docs 1 and 2 share the leading boilerplate span; doc 3 shares none
    assert prof[1].n_shared_spans == 1
    assert prof[2].n_shared_spans == 1
    assert prof[3].n_shared_spans == 0
    # 15 tokens -> 8 spans per boilerplate doc
    assert prof[1].n_spans == 8
    assert prof[1].dup_frac == pytest.approx(1 / 8)


def test_span_profile_short_docs_one_whole_doc_span(spark):
    from dump_es_parquet_spark.operators.spans import doc_span_profile

    d = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc"), (3, "different tiny doc")],
        "doc_id long, text string",
    )
    prof = {r.doc_id: r for r in doc_span_profile(d).collect()}
    # <8 tokens => exactly one span covering the whole doc, so short
    # exact duplicates are caught
    assert all(prof[i].n_spans == 1 for i in (1, 2, 3))
    assert prof[1].n_shared_spans == 1 and prof[2].n_shared_spans == 1
    assert prof[3].n_shared_spans == 0


def test_span_stream_xxhash64_same_sharing_structure(spark):
    from dump_es_parquet_spark.operators.spans import shared_spans, span_stream

    rows = [(1, "a b c d e f g h i"), (2, "a b c d e f g h j")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    for hash_fn in ("md5", "xxhash64"):
        sh = shared_spans(span_stream(d, hash_fn=hash_fn)).count()
        assert sh == 1  # the one common window 'a..h'


def test_budget_mix_take_until_semantics(spark):
    from dump_es_parquet_spark.operators.sampling import budget_mix

    rows = [(i, "g", 10) for i in range(10)]  # 10 docs of size 10
    d = spark.createDataFrame(rows, "doc_id long, grp string, sz long")
    kept = budget_mix(d, "grp", "doc_id", "sz", {"g": 35})
    # 35-char budget over 10-char docs: 3 full + the crossing doc = 4
    assert kept.count() == 4
    # deterministic: same set on re-run and under different partitioning
    ids = {r.doc_id for r in kept.collect()}
    ids2 = {
        r.doc_id
        for r in budget_mix(
            d.repartition(7), "grp", "doc_id", "sz", {"g": 35}
        ).collect()
    }
    assert ids == ids2
    # zero budget keeps nothing; absent group keeps nothing (inner join)
    assert budget_mix(d, "grp", "doc_id", "sz", {"g": 0}).count() == 0
    assert budget_mix(d, "grp", "doc_id", "sz", {"other": 100}).count() == 0


def test_deterministic_shuffle_is_seeded_permutation(spark):
    from dump_es_parquet_spark.operators.sampling import deterministic_shuffle

    d = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    o1 = [r.doc_id for r in deterministic_shuffle(d, "doc_id", "s1").collect()]
    o1b = [
        r.doc_id
        for r in deterministic_shuffle(d.repartition(5), "doc_id", "s1").collect()
    ]
    o2 = [r.doc_id for r in deterministic_shuffle(d, "doc_id", "s2").collect()]
    assert sorted(o1) == list(range(100))  # a permutation
    assert o1 == o1b  # partitioning-independent
    assert o1 != o2  # seed changes the permutation
    assert o1 != list(range(100))  # actually shuffled


def test_incremental_dedup_against_store(spark, tmp_path):
    """The production incremental shape: batch2 checks against batch1's
    signature store; near-dups of history are dropped, novel docs kept
    and appended, and batch3 then sees batch2's survivors."""
    from dump_es_parquet_spark.operators.dedup import (
        dedup_incremental,
        write_signature_store,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )
    novel = (
        "completely different content about distributed query engines "
        "processing petabytes of training data with columnar formats"
    )
    store = str(tmp_path / "sigstore")
    b1 = spark.createDataFrame([(1, base)], "doc_id long, text string")
    write_signature_store(b1, store)

    b2 = spark.createDataFrame(
        [
            (10, base),  # exact dup of history
            (11, base + " extra trailing words"),  # near-dup of history
            (12, novel),  # novel -> kept
            (13, novel),  # intra-batch dup of 12 -> dropped, min-id wins
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_incremental(b2, store).collect()}
    assert not out[10].keep and out[10].matched_hist_id == 1
    assert not out[11].keep and out[11].matched_hist_id == 1
    assert out[12].keep and out[12].matched_hist_id is None
    assert not out[13].keep and out[13].matched_hist_id is None  # intra

    # batch3: a dup of batch2's survivor must now hit the store
    b3 = spark.createDataFrame([(20, novel)], "doc_id long, text string")
    out3 = dedup_incremental(b3, store).collect()[0]
    assert not out3.keep and out3.matched_hist_id == 12

    # store grew only by the kept docs (1 base + 1 novel = 2 docs,
    # BANDS rows each)
    from dump_es_parquet_spark.operators.dedup import BANDS

    assert spark.read.parquet(store).count() == 2 * BANDS


def test_incremental_dedup_no_update_leaves_store(spark, tmp_path):
    from dump_es_parquet_spark.operators.dedup import (
        dedup_incremental,
        write_signature_store,
    )

    store = str(tmp_path / "s2")
    b1 = spark.createDataFrame(
        [(1, "one doc of words " * 5)], "doc_id long, text string"
    )
    write_signature_store(b1, store)
    before = spark.read.parquet(store).count()
    b2 = spark.createDataFrame(
        [(2, "unrelated fresh text entirely " * 4)], "doc_id long, text string"
    )
    out = dedup_incremental(b2, store, update_store=False).collect()
    assert out[0].keep
    assert spark.read.parquet(store).count() == before


def test_contrastive_triplets_negative_disjoint(spark, sf_dir):
    from dump_es_parquet_spark.operators.tables import load
    from dump_es_parquet_spark.operators.triplets import (
        contrastive_triplets_for,
    )

    d = load(spark, sf_dir, "documents")
    rows = contrastive_triplets_for(d).collect()
    assert rows  # the testdata plants near-dups
    n = d.count()
    for r in rows:
        assert r.negative_id not in (r.anchor_id, r.positive_id)
        assert 0 <= r.negative_id < n
        assert r.jaccard >= 0.6
    # deterministic across partitionings
    rows2 = contrastive_triplets_for(d.repartition(7)).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_quantize_roundtrip_error_bound(spark):
    from dump_es_parquet_spark.operators.embedding_ops import (
        dequantize_int8,
        quantize_int8,
    )

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),
        (2, [127.0, -127.0, 63.5, 0.1]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # all-zero: scale 0, codes 0
    ]
    d = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dequantize_int8(quantize_int8(d)).collect()
    by_id = {r.vec_id: r for r in out}
    # codes bounded, reconstruction within scale/2 per element
    for r in out:
        assert all(-127 <= c <= 127 for c in r.q_codes)
        half = r.q_scale / 2 + 1e-12
        for orig, deq in zip(r.embedding, r.dequantized):
            assert abs(orig - deq) <= half
    assert by_id[3].q_scale == 0.0
    assert list(by_id[3].q_codes) == [0, 0, 0, 0]
    assert list(by_id[3].dequantized) == [0.0, 0.0, 0.0, 0.0]
    # max|v| maps to ±127 exactly
    assert max(by_id[2].q_codes) == 127 and min(by_id[2].q_codes) == -127


def test_hll_sketches_merge_equals_direct(spark, sf_dir):
    """The pre-aggregation contract: union of per-group sketches
    estimates the same cardinality as sketching the whole corpus
    directly (DataSketches' union gadget keeps HLL_8 state, so the
    estimates can differ by a hair — but both must sit within 5% of
    truth and within 1% of each other), and re-merging is
    deterministic."""
    from dump_es_parquet_spark.operators.profile import hll_rollup, hll_sketches
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents")
    per_source = hll_sketches(d, "source", "doc_id")
    merged = hll_rollup(per_source).collect()[0]
    direct = (
        d.groupBy(F.lit(1))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("doc_id").cast("string"), F.lit(12))
            ).alias("est")
        )
        .collect()[0]["est"]
    )
    truth = d.select("doc_id").distinct().count()
    assert abs(merged.distinct_estimate - direct) / truth < 0.01
    assert abs(merged.distinct_estimate - truth) / truth < 0.05
    assert abs(direct - truth) / truth < 0.05
    assert merged.n_rows == d.count()
    # determinism: the same merge yields the same estimate on re-run
    assert hll_rollup(per_source).collect()[0].distinct_estimate == (
        merged.distinct_estimate
    )


def test_hll_sketches_survive_parquet(spark, tmp_path):
    """Sketch blobs written to parquet merge identically after a
    round-trip — the store-next-to-the-data pattern."""
    from dump_es_parquet_spark.operators.profile import hll_rollup, hll_sketches

    d = spark.createDataFrame(
        [(i % 4, i % 97) for i in range(2000)], "grp int, key int"
    )
    sk = hll_sketches(d, "grp", "key")
    before = hll_rollup(sk).collect()[0].distinct_estimate
    path = str(tmp_path / "sketches.parquet")
    sk.write.parquet(path)
    after = hll_rollup(spark.read.parquet(path)).collect()[0].distinct_estimate
    assert before == after
    assert abs(after - 97) / 97 < 0.05


def test_profile_approx_close_to_exact(spark, sf_dir):
    from dump_es_parquet_spark.operators.profile import (
        profile_approx,
        profile_exact,
    )
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents")
    ex = {r.source: r for r in profile_exact(d, "source", "n_chars", "lang").collect()}
    ap = {r.source: r for r in profile_approx(d, "source", "n_chars", "lang").collect()}
    assert set(ex) == set(ap)
    for s, e in ex.items():
        a = ap[s]
        assert a.n_rows == e.n_rows and a.total_size == e.total_size
        # 5-distinct-lang groups: HLL is exact at this cardinality
        assert a.n_distinct_keys == e.n_distinct_keys
        # approx median lands within the exact quartile band
        assert e.min_size <= a.p50 <= e.max_size
        assert abs(a.p50 - e.p50_r6) / e.p50_r6 < 0.1


def test_quantile_bins_ties_and_approx(spark):
    from dump_es_parquet_spark.operators.profile import quantile_bins

    # 100 rows, only 4 distinct scores: ties must share a bin
    d = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "doc_id long, score long"
    )
    ex = quantile_bins(d, "score", n_bins=4)
    per_score = (
        ex.groupBy("score").agg(F.count_distinct("bin").alias("nb")).collect()
    )
    assert all(r.nb == 1 for r in per_score)
    # bins are monotone in score
    order = {r.score: r.bin for r in ex.select("score", "bin").distinct().collect()}
    assert [order[s] for s in sorted(order)] == sorted(order[s] for s in order)
    # approx mode agrees with exact on small data (accuracy >> n)
    ap = quantile_bins(d, "score", n_bins=4, exact=False)
    assert (
        ex.select("doc_id", "bin").exceptAll(ap.select("doc_id", "bin")).count()
        == 0
    )


def test_ivf_sq8_equals_flat_serving(spark, sf_dir, tmp_path):
    """The SQ8 approximate pass + exact rescore returns EXACTLY the
    flat serving path's top-k (same index, same probes), and the v2
    index carries byte codes."""
    from dump_es_parquet_spark.operators.similarity import (
        ann_ivf_indexed,
        ann_ivf_indexed_sq8,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_dir, path)
    flat = ann_ivf_indexed(spark, sf_dir, path).collect()
    sq8 = ann_ivf_indexed_sq8(spark, sf_dir, path).collect()
    assert [tuple(r) for r in flat] == [tuple(r) for r in sq8]

    lists = spark.read.parquet(f"{path}/lists")
    schema = {f.name: f.dataType.simpleString() for f in lists.schema.fields}
    assert schema["q_codes"] == "array<tinyint>"
    assert schema["q_scale"] == "double"
    row = lists.select("q_codes", "norm").first()
    assert all(-127 <= c <= 127 for c in row.q_codes)
    assert row.norm > 0


def test_knn_num_candidates_ivf_route(spark, sf_dir, tmp_path):
    """ES 8 knn.num_candidates (VERDICT r09 Next #5): the ANN phase
    serves from the probed IVF lists — a prefix of nearest cells
    covering >= num_candidates vectors — and without an index path it
    raises instead of silently answering exactly. A corpus-sized
    num_candidates makes the route exhaustive, so it must equal the
    exact brute-force answer of the same request."""
    import pytest as _pytest

    from dump_es_parquet_spark.operators.es_search import search
    from dump_es_parquet_spark.operators.similarity import (
        ivf_candidate_lists,
        write_ivf_index,
    )
    from dump_es_parquet_spark.operators.tables import load

    e = load(spark, sf_dir, "embeddings")
    qv = [float(x) for x in e.filter("vec_id = 0").head()["embedding"]]
    req = {
        "knn": {"field": "embedding", "query_vector": qv, "k": 5,
                "score_round": 6, "tiebreak": ["vec_id"],
                "num_candidates": 10},
        "size": 5,
    }
    with _pytest.raises(ValueError, match="knn_index_path"):
        search(e, req)

    path = str(tmp_path / "ivf_knn")
    write_ivf_index(spark, sf_dir, path)
    n = e.count()
    # prefix rule: smallest nearest-cell prefix covering the floor
    few = ivf_candidate_lists(spark, path, qv, 1)
    assert 0 < few.count() < n  # one cell only
    all_of_it = ivf_candidate_lists(spark, path, qv, n)
    assert all_of_it.count() == n  # every cell probed

    exhaustive = {**req, "knn": {**req["knn"], "num_candidates": n}}
    ann = search(e, exhaustive, knn_index_path=path) \
        .select("vec_id", "_score").collect()
    exact_req = {k: v for k, v in req.items()}
    exact_req["knn"] = {k: v for k, v in req["knn"].items()
                        if k != "num_candidates"}
    exact = search(e, exact_req).select("vec_id", "_score").collect()
    assert [tuple(r) for r in ann] == [tuple(r) for r in exact]


_finite32 = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, width=32
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.lists(_finite32, min_size=1, max_size=16), min_size=1, max_size=12
    )
)
def test_quantize_property_bounds_and_reconstruction(spark, vecs):
    """∀ finite float32 vectors: codes ∈ [-127,127], scale = max|v|/127,
    and |dequantized − original| ≤ scale/2 elementwise."""
    from dump_es_parquet_spark.operators.embedding_ops import (
        dequantize_int8,
        quantize_int8,
    )

    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    for r in dequantize_int8(quantize_int8(d)).collect():
        maxabs = max(abs(x) for x in r.embedding)
        assert r.q_scale == pytest.approx(maxabs / 127.0, rel=1e-12)
        assert all(-127 <= c <= 127 for c in r.q_codes)
        tol = r.q_scale / 2 + 1e-9 * max(1.0, maxabs)
        for orig, deq in zip(r.embedding, r.dequantized):
            assert abs(orig - deq) <= tol


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(1, 50), min_size=1, max_size=20),
    budget=st.integers(0, 600),
)
def test_budget_mix_property_is_md5_prefix(spark, sizes, budget):
    """∀ corpora and budgets: the kept set is exactly the md5-ordered
    prefix that take-until-budget selects — recomputed independently
    with Python's hashlib (pins the engine-portability of the order)."""
    from dump_es_parquet_spark.operators.sampling import budget_mix

    rows = [(i, "g", s) for i, s in enumerate(sizes)]
    d = spark.createDataFrame(rows, "doc_id long, grp string, sz long")
    kept = {
        r.doc_id
        for r in budget_mix(d, "grp", "doc_id", "sz", {"g": budget}).collect()
    }
    order = sorted(
        range(len(sizes)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    expect, cum = set(), 0
    for i in order:
        if cum < budget:
            expect.add(i)
        cum += sizes[i]
    assert kept == expect


def test_quantize_negative_half_rounding_matches_halfup(spark):
    """floor(x/scale + 0.5) is half-UP for negatives too (-0.5 -> 0):
    pin it so neither engine's native round() sneaks back in."""
    from dump_es_parquet_spark.operators.embedding_ops import quantize_int8

    # scale = 127/127 = 1.0; element -0.5 sits exactly on a half
    d = spark.createDataFrame(
        [(1, [127.0, -0.5, 0.5, -1.5])], "vec_id long, embedding array<float>"
    )
    codes = list(quantize_int8(d).collect()[0].q_codes)
    assert codes == [127, 0, 1, -1]


def test_unigram_rank_model_and_scoring(spark):
    """Rank model: deterministic ranks with string tiebreak; scoring:
    OOV handling and integer-exact means (operators/lm.py)."""
    from dump_es_parquet_spark.operators.lm import (
        score_documents,
        unigram_rank_model,
    )

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the dog"),
            (2, "zzz unseen-only tokens"),
        ],
        ["doc_id", "text"],
    )
    model = unigram_rank_model(docs, vocab_size=3)
    m = {r.token: (r.rank, r.score_ppm) for r in model.collect()}
    # 'the' x3 -> rank 1; then count-1 tokens tie -> lexicographic
    assert m["the"] == (1, 1_000_000)
    assert list(m) == sorted(m, key=lambda t: (-3 if t == "the" else -1, t))
    assert len(m) == 3

    scored = {r.doc_id: r for r in score_documents(docs, model).collect()}
    assert scored[0].n_tokens == 6
    # doc 2 shares no vocab: everything OOV, mean 0
    assert scored[2].n_oov == scored[2].n_tokens and scored[2].mean_score_ppm == 0
    # integer mean: floor(sum/n)
    r0 = scored[0]
    assert r0.mean_score_ppm == r0.score_sum_ppm // r0.n_tokens


def test_export_shards_manifest(spark, sf_dir, tmp_path):
    """Sharded export: manifest matches what's actually on disk, shard
    membership is stable across re-exports (operators/export.py)."""
    from dump_es_parquet_spark.operators.export import (
        export_shards,
        read_manifest,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    out = str(tmp_path / "shards")
    m = export_shards(d, out, n_shards=4, key_col="doc_id", token_col="n_chars")
    assert m == read_manifest(out)
    assert m["total_rows"] == d.count()
    assert m["total_tokens"] == d.agg({"n_chars": "sum"}).first()[0]
    assert {s["shard"] for s in m["shards"]} == {0, 1, 2, 3}

    # manifest per-shard stats equal a direct read of each shard dir
    for s in m["shards"]:
        back = spark.read.parquet(f"{out}/shard={s['shard']}")
        assert back.count() == s["n_rows"]
        assert back.agg({"n_chars": "sum"}).first()[0] == s["n_tokens"]

    # re-export: identical membership digests (stable hash sharding)
    m2 = export_shards(d, str(tmp_path / "again"), 4, "doc_id", "n_chars")
    assert [s["key_xor"] for s in m2["shards"]] == [
        s["key_xor"] for s in m["shards"]
    ]


def test_datacard(spark, sf_dir, tmp_path):
    """Datacard: section presence, internal consistency, atomic
    publish (operators/datacard.py)."""
    from dump_es_parquet_spark.operators.datacard import (
        build_datacard,
        write_datacard,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    card = write_datacard(docs, str(tmp_path / "card"))
    import json

    disk = json.load(open(tmp_path / "card" / "_datacard.json"))
    assert disk == card
    assert card["n_docs"] == docs.count()
    assert card["total_tokens"] > card["n_docs"]  # docs have >1 token
    assert sum(card["lang_mix"].values()) == card["n_docs"]
    assert set(card["per_source"]) == {
        r.source for r in docs.select("source").distinct().collect()
    }
    assert sum(s["n_docs"] for s in card["per_source"].values()) == card["n_docs"]
    assert 0 <= card["exact_dup_rate"] < 1
    q = card["token_quartiles"]
    assert q["p25"] <= q["p50"] <= q["p75"] <= q["p99"]

    # degrades without source/lang columns
    bare = docs.select("doc_id", "text")
    c2 = build_datacard(bare)
    assert "per_source" not in c2 and c2["n_docs"] == card["n_docs"]


def test_curate_and_export_end_to_end(spark, sf_dir, tmp_path):
    """One-call release pipeline: filter -> dedup -> cap -> LM-score
    tail drop -> chunk -> shards + manifest + datacard
    (operators/corpus.curate_and_export)."""
    import json
    import os

    from dump_es_parquet_spark.operators.corpus import curate_and_export

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "release")
    res = curate_and_export(
        docs,
        out,
        n_shards=4,
        per_source_cap=20,
        min_lm_score_ppm=1,
        dedup="exact",
        chunk_tokens=32,
        stride=24,
    )
    m, card = res["manifest"], res["datacard"]
    assert os.path.exists(f"{out}/_datacard.json")
    assert os.path.exists(f"{out}/shards/_manifest.json")
    # datacard describes the kept DOCUMENTS (capped at 20/source)
    assert card["n_docs"] <= docs.count()
    assert all(s["n_docs"] <= 20 for s in card["per_source"].values())
    # manifest totals equal what's on disk
    back = spark.read.parquet(f"{out}/shards")
    assert back.count() == m["total_rows"] > 0
    assert m["total_tokens"] == back.agg({"n_chunk_tokens": "sum"}).first()[0]
    # the datacard counts what SHIPPED: exactly the documents that
    # survive curate's quality filter + dedup and produced chunks —
    # not the pre-filter capped set (ADVICE r06: it used to overstate)
    assert card["n_docs"] == back.select("doc_id").distinct().count()


def test_weighted_sample_aes(spark):
    """A-ES weighted sampling: deterministic, excludes non-positive
    weights, and inclusion frequency orders by weight across seeds
    (operators/sampling.weighted_sample)."""
    from dump_es_parquet_spark.operators.sampling import weighted_sample

    rows = [(i, 10.0 if i < 5 else 1.0) for i in range(50)] + [
        (90, 0.0), (91, -1.0), (92, None)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w double")

    s1 = sorted(r.doc_id for r in weighted_sample(df, "w", 10, seed="a").collect())
    s2 = sorted(r.doc_id for r in weighted_sample(df, "w", 10, seed="a").collect())
    assert s1 == s2 and len(s1) == 10  # deterministic, exact n
    assert not {90, 91, 92} & set(s1)  # zero/negative/NULL never sample

    # heavy ids (w=10) must be included far more often than light ones
    from collections import Counter

    seen = Counter()
    for seed in "abcdefgh":
        for r in weighted_sample(df, "w", 10, seed=seed).collect():
            seen[r.doc_id] += 1
    heavy = sum(seen[i] for i in range(5)) / 5
    light = sum(seen[i] for i in range(5, 50)) / 45
    assert heavy > 2 * light

    # n >= population: everything with positive weight
    assert weighted_sample(df, "w", 100).count() == 50


def test_weighted_sample_per_group(spark):
    from dump_es_parquet_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    rows = [(g * 100 + i, "ab"[g], float(i + 1)) for g in range(2) for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w double")
    out = weighted_sample_per_group(df, ["src"], "w", 4)
    from pyspark.sql import functions as F

    counts = {r.src: r.n for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 4, "b": 4}
    again = weighted_sample_per_group(df, ["src"], "w", 4)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_k_anonymity(spark):
    from dump_es_parquet_spark.operators.privacy import (
        enforce_k_anonymity,
        k_anonymity_violations,
    )

    df = spark.createDataFrame(
        [(i, "us" if i < 8 else "rare", "A") for i in range(10)],
        "id long, region string, seg string",
    )
    bad = k_anonymity_violations(df, ["region", "seg"], k=3).collect()
    assert [(r.region, r.n_rows) for r in bad] == [("rare", 2)]
    kept = enforce_k_anonymity(df, ["region", "seg"], k=3)
    assert sorted(r.id for r in kept.collect()) == list(range(8))
    # k=1 is always anonymous
    assert k_anonymity_violations(df, ["region"], k=1).count() == 0


def test_kll_and_theta_sketches(spark, tmp_path):
    """KLL quantile sketches survive parquet and merge to accurate
    global quantiles; Theta sketches answer exact-ish set algebra
    between groups without joins (operators/profile.py)."""
    from dump_es_parquet_spark.operators.profile import (
        kll_rollup,
        kll_sketches,
        theta_overlap,
    )

    rows = [(g, float(v)) for g in range(4) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g int, v double")
    sk = kll_sketches(df, "g", "v")
    p = str(tmp_path / "kll")
    sk.write.parquet(p)  # blobs are parquet-storable
    roll = kll_rollup(spark.read.parquet(p)).first()
    assert roll.n_rows == 400
    assert abs(roll.p50 - 50) <= 3 and abs(roll.p99 - 99) <= 3

    ov = spark.createDataFrame(
        [("a", i) for i in range(100)] + [("b", i) for i in range(50, 200)],
        "src string, uid long",
    )
    est = theta_overlap(ov, "src", "uid", "a", "b").first()
    assert abs(est.n_a - 100) < 5 and abs(est.n_b - 150) < 8
    assert abs(est.n_intersection - 50) < 5
    assert abs(est.n_union - 200) < 10
    assert abs(est.n_a_minus_b - 50) < 5


def test_export_shards_string_key_digest(spark, tmp_path):
    """String doc ids must produce a real content digest — the old
    cast-to-long digest silently summed NULLs (ADVICE r06). Same data,
    different row order => identical digests; different data =>
    different digests."""
    from dump_es_parquet_spark.operators.export import export_shards

    rows = [(f"doc-{i:04d}", i * 10) for i in range(40)]
    d1 = spark.createDataFrame(rows, "doc_id string, n int")
    d2 = spark.createDataFrame(list(reversed(rows)), "doc_id string, n int")
    m1 = export_shards(d1, str(tmp_path / "a"), 4, key_col="doc_id")
    m2 = export_shards(d2, str(tmp_path / "b"), 4, key_col="doc_id")
    for s in m1["shards"]:
        assert s["key_sum"] is not None and s["key_xor"] is not None
    assert [s["key_sum"] for s in m1["shards"]] == [s["key_sum"] for s in m2["shards"]]
    assert [s["key_xor"] for s in m1["shards"]] == [s["key_xor"] for s in m2["shards"]]
    d3 = spark.createDataFrame(rows[:39] + [("doc-XXXX", 390)], "doc_id string, n int")
    m3 = export_shards(d3, str(tmp_path / "c"), 4, key_col="doc_id")
    assert [s["key_xor"] for s in m3["shards"]] != [s["key_xor"] for s in m1["shards"]]


def test_export_shards_decimal_key_digest(spark, tmp_path):
    """Decimal keys route through xxhash64 like strings (ADVICE r07):
    a fractional decimal under the old direct cast('long') path yields
    NULL (or an ANSI cast error) and a digest of nothing. Same data =>
    identical digests; changed data => xor digest moves."""
    from decimal import Decimal

    from dump_es_parquet_spark.operators.export import export_shards

    rows = [(Decimal(f"{i}.{i % 10}5"), i) for i in range(40)]
    d1 = spark.createDataFrame(rows, "k decimal(20,2), n int")
    m1 = export_shards(d1, str(tmp_path / "a"), 4, key_col="k")
    for s in m1["shards"]:
        assert s["key_sum"] is not None and s["key_xor"] is not None
    m2 = export_shards(
        spark.createDataFrame(list(reversed(rows)), "k decimal(20,2), n int"),
        str(tmp_path / "b"), 4, key_col="k",
    )
    assert [s["key_xor"] for s in m1["shards"]] == [s["key_xor"] for s in m2["shards"]]
    d3 = spark.createDataFrame(
        rows[:39] + [(Decimal("9999.99"), 390)], "k decimal(20,2), n int"
    )
    m3 = export_shards(d3, str(tmp_path / "c"), 4, key_col="k")
    assert [s["key_xor"] for s in m3["shards"]] != [s["key_xor"] for s in m1["shards"]]


def test_publish_json_hadoop_fs_roundtrip(spark, tmp_path):
    """fsutil.publish_json goes through the Hadoop FileSystem (so
    object-store URIs work); round-trips via read_json AND plain
    open() on a local path, overwrites atomically, leaves no temp."""
    import json
    import os

    from dump_es_parquet_spark.fsutil import publish_json, read_json

    d = str(tmp_path / "pub")
    publish_json(spark, d, "_card.json", {"a": 1})
    publish_json(spark, d, "_card.json", {"a": 2, "b": [1, 2]})
    assert read_json(spark, d, "_card.json") == {"a": 2, "b": [1, 2]}
    with open(os.path.join(d, "_card.json")) as f:
        assert json.load(f) == {"a": 2, "b": [1, 2]}
    assert not [x for x in os.listdir(d) if x.endswith(".tmp")]


def test_near_dup_clusters_consistent_with_dedup_corpus(spark):
    """near_dup_clusters is the audit form of dedup_corpus: survivors
    are exactly the docs whose cluster_id is their own id, and every
    chain member maps to the chain minimum."""
    from dump_es_parquet_spark.operators.dedup import (
        dedup_corpus,
        near_dup_clusters,
    )

    base = ["w%d" % i for i in range(40)]
    rows, text = [], base
    for i in range(4):  # a≈b≈c≈d chain (one substitution per step)
        rows.append((i + 1, " ".join(text)))
        text = text.copy()
        text[5 + i] = f"swap{i}"
    rows += [(50, "an unrelated singleton document entirely")]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    clusters = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(d, strategy="minhash", threshold=0.5).collect()
    }
    assert clusters == {1: 1, 2: 1, 3: 1, 4: 1, 50: 50}
    survivors = {r.doc_id for r in dedup_corpus(d, "minhash", 0.5).collect()}
    assert survivors == {k for k, v in clusters.items() if k == v}


def test_near_dup_clusters_exact_strategy(spark):
    from dump_es_parquet_spark.operators.dedup import near_dup_clusters

    d = spark.createDataFrame(
        [(3, "same text"), (7, "same text"), (9, "other")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.cluster_id for r in near_dup_clusters(d, "exact").collect()}
    assert out == {3: 3, 7: 3, 9: 9}


def test_ivf_recall_report_bounds(spark, sf_dir, tmp_path):
    """Recall@k is well-formed: k_eff == k for every query, 0 <= n_hits
    <= k_eff, and the report agrees with a direct set comparison of the
    exact and ANN top-k outputs."""
    from dump_es_parquet_spark.operators.similarity import (
        ann_ivf_indexed_batch,
        ivf_recall_report,
        topk_batch,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(spark, sf_dir, path)
    rep = {r.query_id: r for r in
           ivf_recall_report(spark, sf_dir, path, n_queries=5, k=5).collect()}
    exact = topk_batch(spark, sf_dir, 5, 5).collect()
    ann = ann_ivf_indexed_batch(spark, sf_dir, path, 5, 5).collect()
    ex_sets, ann_sets = {}, {}
    for r in exact:
        ex_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in ann:
        ann_sets.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(rep) == set(ex_sets)
    for qid, r in rep.items():
        assert r.k_eff == len(ex_sets[qid]) == 5
        assert r.n_hits == len(ex_sets[qid] & ann_sets.get(qid, set()))
        assert 0 <= r.n_hits <= r.k_eff


def test_document_attributes_one_scan_consistency(spark):
    """The one-pass attributes table must agree with the dedicated
    single-signal operators it composes, and filtering on it must
    reproduce filter_corpus' keep set without touching text again."""
    from pyspark.sql import functions as F

    from dump_es_parquet_spark.operators.text import (
        document_attributes,
        filter_corpus,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again today"),
        (2, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (3, "contact me at jane.doe@example.com or 192.168.0.1 for details of "
            "the plan that is in it and to a an of"),
        (4, "tiny"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    at = {r.doc_id: r for r in document_attributes(d).collect()}
    assert at[1].n_tokens == 13 and at[1].lang_guess == "en"
    assert at[2].top_word_frac == 1.0 and at[2].dup_word_frac == 1.0
    assert at[3].n_email == 1 and at[3].n_ipv4 == 1
    assert at[4].n_chars == 4 and at[4].top_bigram_frac is None

    # attribute-table filtering == filter_corpus (same thresholds),
    # computed WITHOUT re-reading the text column
    kept_text = {r.doc_id for r in filter_corpus(d, min_tokens=5, min_chars=20,
                                                 min_stop_hits=1,
                                                 max_top_word_frac=0.5,
                                                 max_dup_word_frac=0.9).collect()}
    attrs = document_attributes(d)
    kept_attrs = {
        r.doc_id
        for r in attrs.filter(
            (F.col("n_tokens") >= 5)
            & (F.col("n_chars") >= 20)
            & (F.col("stopword_ratio") > 0)
            & (F.col("top_word_frac") <= 0.5)
            & (F.col("dup_word_frac") <= 0.9)
        ).collect()
    }
    assert kept_attrs == kept_text


def test_dhash_perceptual_invariances():
    """The real dHash (replacing the round-7 md5 stub, VERDICT r07
    Next #3) must behave like a perceptual hash over the byte-grid:
    brightness-invariant exactly, shift-tolerant within a small hamming
    radius, and still discriminating between unrelated payloads."""
    from dump_es_parquet_spark.operators.multimodal import dhash_signature

    # a structured, non-constant payload: 7200 "pixels" (100 per grid
    # cell), bytes kept < 200 so a brightness shift cannot wrap
    base = bytes((37 * i * i + 11 * i) % 199 for i in range(7200))
    h = dhash_signature(base)

    # determinism + identity
    assert dhash_signature(bytes(base)) == h

    # global brightness shift: constant offsets cancel in adjacent-cell
    # differences — hash is IDENTICAL, not merely close
    brighter = bytes(b + 30 for b in base)
    assert dhash_signature(brighter) == h

    # small translation (3 of 100 bytes per cell): block means move a
    # little, most sign bits survive — within radius, never unrelated
    def hamming(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    shifted = base[3:] + base[:3]
    assert 0 <= hamming(dhash_signature(shifted), h) <= 16

    # discrimination: an unrelated payload lands far away
    other = bytes((131 * i + 17) % 251 for i in range(7200))
    assert hamming(dhash_signature(other), h) > 16

    # degenerate inputs stay total: empty and sub-grid payloads hash
    assert dhash_signature(b"") == 0
    assert isinstance(dhash_signature(b"xy"), int)


def test_binary_dup_clusters_maps_components(spark):
    """binary_dup_clusters: every payload gets a cluster_id — clones
    collapse onto the smallest member id transitively, unrelated
    payloads stay singletons labeled by themselves (the multimodal
    counterpart of near_dup_clusters)."""
    from dump_es_parquet_spark.operators.multimodal import binary_dup_clusters

    base = bytes((37 * i * i + 11 * i) % 199 for i in range(7200))
    other = bytes((131 * i + 17) % 251 for i in range(7200))
    rows = [
        (1, bytearray(base)),
        (2, bytearray(base)),          # clone of 1
        (3, bytearray(other)),         # unrelated singleton
        (4, bytearray(base)),          # second clone → same component
        (5, bytearray(bytes(b + 20 for b in base))),  # brightness shift
    ]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.cluster_id
           for r in binary_dup_clusters(d, max_hamming=0).collect()}
    # brightness invariance ⇒ doc 5 joins the base component too
    assert got == {1: 1, 2: 1, 3: 3, 4: 1, 5: 1}


def test_hamming_band_pairs_generic_signatures(spark):
    """The generic banded hamming join (factored out of simhash) finds
    every pair within max_hamming over an arbitrary signature frame —
    pigeonhole holds up to bands-1 — and never a pair beyond it."""
    from dump_es_parquet_spark.operators.dedup import hamming_band_pairs

    sigs = spark.createDataFrame(
        [
            (1, 0b10110000_00000000_00000000_00001111),
            (2, 0b10110000_00000000_00000000_00001110),  # hamming 1 vs id 1
            (3, 0b10110000_00000000_11111111_00001111),  # hamming 8 vs id 1
            (4, 0b10110000_00000000_00000000_00001111),  # identical to id 1
        ],
        "doc_id long, sig long",
    )
    out = {(r.id_a, r.id_b): r.hamming
           for r in hamming_band_pairs(sigs, "sig", 32, 4, max_hamming=1).collect()}
    assert out == {(1, 2): 1, (1, 4): 0, (2, 4): 1}


def test_bm25_matches_pure_python_reference(spark, sf_dir):
    """The distributed BM25 scorer agrees with a from-scratch Python
    implementation of Lucene BM25 on EVERY matched document — formula
    validation, not self-consistency (the oracle row only sees the
    top-10)."""
    import math

    from dump_es_parquet_spark.operators.retrieval import (
        B,
        DEFAULT_QUERY,
        K1,
        K1_PLUS_1,
        ONE_MINUS_B,
        _idf_ppm,
        _terms,
        bm25_scores,
    )
    from dump_es_parquet_spark.operators.tables import load

    terms = _terms(DEFAULT_QUERY)
    docs = [
        (r.doc_id, r.text.strip().split())
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    n = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n
    idf = {
        t: _idf_ppm(n, sum(1 for _, toks in docs if t in toks)) for t in terms
    }

    def ref_score(toks):
        dl = len(toks)
        s = 0
        for t in terms:
            tf = toks.count(t)
            s += math.floor(
                idf[t]
                * ((tf * K1_PLUS_1) / (tf + K1 * (ONE_MINUS_B + B * (dl / avgdl))))
            )
        return s

    expected = {d: ref_score(toks) for d, toks in docs if any(t in toks for t in terms)}
    got = {
        r.doc_id: r.score_micro
        for r in bm25_scores(load(spark, sf_dir, "documents")).collect()
    }
    assert got == expected


def test_bm25_batch_matches_single_query_path(spark, sf_dir):
    """The postings-join batch path scores bit-identically to the
    zero-shuffle single-query path (both derive idf_ppm driver-side
    from the same integer stats)."""
    from dump_es_parquet_spark.operators.retrieval import (
        DEFAULT_QUERY,
        bm25_topk,
        bm25_topk_batch,
    )
    from dump_es_parquet_spark.operators.tables import load

    queries = spark.createDataFrame(
        [(0, DEFAULT_QUERY), (1, "merge scan")], "query_id long, query_text string"
    )
    batch = bm25_topk_batch(load(spark, sf_dir, "documents"), queries, k=10)
    got = [
        (r.doc_id, r.score_micro) for r in batch.where(F.col("query_id") == 0).collect()
    ]
    want = [
        (r.doc_id, r.score_micro)
        for r in bm25_topk(spark, sf_dir, DEFAULT_QUERY, k=10).collect()
    ]
    assert got == want
    # the second query scored too, against its own term set
    assert batch.where(F.col("query_id") == 1).count() == 10


def test_idf_ppm_libm_parity_with_duckdb():
    """CPython math.log and DuckDB ln resolve to the same platform
    libm: the ppm-scaled Lucene idf is bit-identical for every df in
    1..N — the invariant the corpus_bm25 oracle leans on."""
    import duckdb

    from dump_es_parquet_spark.operators.retrieval import _idf_ppm

    n = 2000
    rows = duckdb.sql(
        f"SELECT df, CAST(floor(1e6 * ln(1.0 + ({n} - df + 0.5) / (df + 0.5)) + 0.5)"
        f" AS BIGINT) FROM (SELECT unnest(range(1, {n + 1})) AS df)"
    ).fetchall()
    assert all(ppm == _idf_ppm(n, df) for df, ppm in rows)


def test_hybrid_rrf_fuses_both_arms(spark, sf_dir):
    """RRF output: contributions are floor(1e9/(60+rank)) per arm,
    a doc present in only one pool still surfaces with the other rank
    NULL, and the top hit beats either single-arm pool bottom."""
    from dump_es_parquet_spark.operators.retrieval import hybrid_rrf

    rows = hybrid_rrf(spark, sf_dir, k=10).collect()
    assert len(rows) == 10
    for r in rows:
        want = 0
        if r.lex_rank is not None:
            want += 1_000_000_000 // (60 + r.lex_rank)
        if r.vec_rank is not None:
            want += 1_000_000_000 // (60 + r.vec_rank)
        assert r.rrf_micro == want
    # descending, ties by doc_id
    pairs = [(r.rrf_micro, r.doc_id) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_highlight_renders_window_and_tags(spark):
    """highlight: first occurrence, ±window chars of context, term
    wrapped in <em>, absent terms skipped, fragments joined in
    query-term order."""
    from dump_es_parquet_spark.operators.retrieval import highlight

    text = ("x" * 40) + " dup " + ("y" * 40) + " window tail"
    d = spark.createDataFrame(
        [(1, text), (2, "no match terms here at all " * 4)],
        "doc_id long, text string",
    )
    rows = highlight(d, "dup window", k=5, window=10).collect()
    assert [r.doc_id for r in rows] == [1]
    frags = rows[0].highlights.split(" … ")
    assert len(frags) == 2  # both terms present, query order
    assert "<em>dup</em>" in frags[0] and "<em>window</em>" in frags[1]
    # ±10 chars of context around the 3-char term -> at most 23 chars
    # before tagging; the <em></em> wrap adds 9
    assert len(frags[0]) <= 23 + 9
    # 10 context chars before the term: positions pos-10..pos-1 are
    # nine x's and the separating space
    pre, _, _ = frags[0].partition("<em>")
    assert pre == "x" * 9 + " "


def test_highlight_never_anchors_on_partial_token(spark):
    """Token-boundary pin (VERDICT r08 What's wrong #1): querying
    'dup' must NOT anchor a snippet inside 'duplicate' — the locator
    matches whole whitespace tokens, exactly like the BM25 scorer."""
    from dump_es_parquet_spark.operators.retrieval import highlight

    d = spark.createDataFrame(
        [
            # 'dup' only as a substring → doc scores 0, no snippet row
            (1, "duplicate rows need a dedup pass over duplicates"),
            # substring occurrence FIRST, whole token later: the
            # snippet must anchor on the whole token, not 'duplicate'
            (2, "duplicate detection uses dup marks for speed"),
        ],
        "doc_id long, text string",
    )
    rows = highlight(d, "dup", k=5, window=8).collect()
    assert [r.doc_id for r in rows] == [2]
    frag = rows[0].highlights
    # anchored on the whole token: 8 chars of context before 'dup'
    # come from '...n uses ' — never the 'duplicate' prefix
    assert frag == "on uses <em>dup</em> marks f"


def test_match_phrase_batch_matches_single_path(spark, sf_dir):
    """The positional-postings batch path returns exactly the single
    zero-shuffle path's (doc, count) set per phrase — including a
    reversed bigram (different result set) and an absent-term phrase
    (empty, pruned before any array work)."""
    from dump_es_parquet_spark.operators.retrieval import (
        DEFAULT_PHRASE,
        match_phrase_batch,
        phrase_occurrences,
    )
    from dump_es_parquet_spark.operators.tables import load

    docs = load(spark, sf_dir, "documents")
    phrases = spark.createDataFrame(
        [
            (0, DEFAULT_PHRASE),
            (1, "hash table"),
            (2, "table hash zz_not_a_token"),
        ],
        "phrase_id long, phrase_text string",
    )
    got = match_phrase_batch(docs, phrases).collect()
    by_phrase = {}
    for r in got:
        by_phrase.setdefault(r.phrase_id, {})[r.doc_id] = r.n_occurrences
    for pid, phrase in [(0, DEFAULT_PHRASE), (1, "hash table")]:
        want = {
            r.doc_id: r.n_occurrences
            for r in phrase_occurrences(docs, phrase).collect()
        }
        assert by_phrase.get(pid, {}) == want and want
    # a phrase containing a term absent from the corpus matches nothing
    assert 2 not in by_phrase


def test_bm25_store_serving_matches_direct(spark, sf_dir, tmp_path):
    """The materialized postings store serves bit-identical BM25
    results to the direct two-scan path for multiple queries, and the
    query's term filter is PUSHED to the postings parquet scan (the
    row-group-pruning claim)."""
    from dump_es_parquet_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_from_store,
        write_postings_store,
    )
    from dump_es_parquet_spark.operators.tables import load

    store = str(tmp_path / "postings_store")
    write_postings_store(load(spark, sf_dir, "documents"), store)
    for q in ("dup filter window", "table", "zz_absent_token table"):
        direct = [
            (r.doc_id, r.dl, r.n_matched, r.score_micro)
            for r in bm25_topk(spark, sf_dir, q, k=10).collect()
        ]
        served_df = bm25_topk_from_store(spark, store, q, k=10)
        served = [
            (r.doc_id, r.dl, r.n_matched, r.score_micro)
            for r in served_df.collect()
        ]
        assert served == direct and direct
    plan = served_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(term" in plan

    # batch serving: identical to the corpus-scan batch path
    from dump_es_parquet_spark.operators.retrieval import (
        bm25_topk_batch,
        bm25_topk_batch_from_store,
    )

    qs = spark.createDataFrame(
        [(0, "dup filter window"), (1, "table"), (2, "zz_absent table")],
        "query_id long, query_text string",
    )
    direct_b = [
        (r.query_id, r.doc_id, r.score_micro, r.rank)
        for r in bm25_topk_batch(
            load(spark, sf_dir, "documents"), qs, k=7
        ).collect()
    ]
    served_b = [
        (r.query_id, r.doc_id, r.score_micro, r.rank)
        for r in bm25_topk_batch_from_store(spark, store, qs, k=7).collect()
    ]
    assert served_b == direct_b and served_b


def test_public_operators_handle_empty_corpus(spark):
    """Empty-input hardening (ADVICE r08 found bm25_scores crashing on
    an empty corpus): every composable *_for / retrieval / dedup /
    decontamination API must return an empty frame with its normal
    schema, never raise — driver-side stats math included."""
    from dump_es_parquet_spark.operators import (
        dedup,
        multimodal,
        retrieval,
        spans,
        text,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    phrases = spark.createDataFrame(
        [(0, "a b")], "phrase_id long, phrase_text string"
    )
    for name, fn in {
        "minhash_lsh_pairs_for": lambda: dedup.minhash_lsh_pairs_for(docs),
        "simhash_pairs_for": lambda: dedup.simhash_pairs_for(docs),
        "ngram_jaccard_pairs_for": lambda: dedup.ngram_jaccard_pairs_for(docs),
        "dedup_corpus": lambda: dedup.dedup_corpus(docs, "minhash"),
        "near_dup_clusters": lambda: dedup.near_dup_clusters(docs),
        "embedding_near_dup": lambda: dedup.embedding_near_dup_pairs_for(emb, 0.9),
        "filter_corpus": lambda: text.filter_corpus(docs),
        "bm25_scores": lambda: retrieval.bm25_scores(docs),
        "bm25_topk_batch": lambda: retrieval.bm25_topk_batch(
            docs, spark.createDataFrame([(0, "x y")],
                                        "query_id long, query_text string")
        ),
        "highlight": lambda: retrieval.highlight(docs),
        "phrase_occurrences": lambda: retrieval.phrase_occurrences(docs),
        "span_near_occurrences": lambda: retrieval.span_near_occurrences(docs),
        "match_phrase_batch": lambda: retrieval.match_phrase_batch(docs, phrases),
        "fuzzy_term_match": lambda: retrieval.fuzzy_term_match(docs, "x"),
        "significant_terms": lambda: retrieval.significant_terms(docs, F.lit(True)),
        "decontaminate": lambda: spans.decontaminate(docs, docs),
        "bloom_decontaminate": lambda: spans.bloom_decontaminate(docs, docs),
        "binary_dup_clusters": lambda: multimodal.binary_dup_clusters(
            multimodal.with_binary_payload(docs)
        ),
    }.items():
        assert fn().count() == 0, name


def test_span_near_slop_semantics(spark, sf_dir):
    """span_near: slop=0 reduces EXACTLY to phrase_occurrences on real
    testdata; slop widens in-order matches by total gap; order still
    required; repeated terms need strictly later positions."""
    from dump_es_parquet_spark.operators.retrieval import (
        phrase_occurrences,
        span_near_occurrences,
    )
    from dump_es_parquet_spark.operators.tables import load

    docs = load(spark, sf_dir, "documents")
    exact = {(r.doc_id, r.n_occurrences)
             for r in phrase_occurrences(docs, "table hash").collect()}
    slop0 = {(r.doc_id, r.n_spans)
             for r in span_near_occurrences(docs, "table hash", slop=0).collect()}
    assert slop0 == exact and exact

    d = spark.createDataFrame(
        [
            (1, "a b"),        # consecutive
            (2, "a x b"),      # gap 1
            (3, "a x y b"),    # gap 2
            (4, "b a"),        # wrong order
            (5, "a a"),        # repeated term, strictly-later rule
        ],
        "doc_id long, text string",
    )
    def spans(phrase, slop):
        return {r.doc_id: r.n_spans
                for r in span_near_occurrences(d, phrase, slop=slop).collect()}

    assert spans("a b", 0) == {1: 1}
    assert spans("a b", 1) == {1: 1, 2: 1}
    assert spans("a b", 2) == {1: 1, 2: 1, 3: 1}
    assert 4 not in spans("a b", 5)  # in-order only
    assert spans("a a", 0) == {5: 1}


def test_rank_eval_metric_math(spark):
    """rank_eval (the ES _rank_eval API): hand-checked
    precision/recall/MRR/DCG/NDCG on a corpus whose BM25 ranking is
    forced by term frequency; a query retrieving nothing still
    reports a zero row."""
    import math

    from dump_es_parquet_spark.operators.retrieval import rank_eval

    # docs ranked for 'cat': 1 (tf 3) > 2 (tf 2) > 3 (tf 1); doc 4
    # never matches
    docs = spark.createDataFrame(
        [
            (1, "cat cat cat"),
            (2, "cat cat pad"),
            (3, "cat pad pad"),
            (4, "dog dog dog"),
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [(0, "cat"), (1, "zebra")], "query_id long, query_text string"
    )
    ratings = spark.createDataFrame(
        [(0, 2, 2), (0, 3, 1), (0, 4, 3)],
        "query_id long, doc_id long, rating int",
    )
    rows = {r.query_id: r for r in
            rank_eval(docs, queries, ratings, k=3,
                      relevant_threshold=2).collect()}
    r0 = rows[0]
    # retrieved [1, 2, 3] with ratings [0, 2, 1]: one relevant (doc 2,
    # rank 2) of two total relevant (docs 2 and 4)
    assert (r0.n_retrieved, r0.n_rel_topk, r0.n_relevant) == (3, 1, 2)
    assert r0.precision_r6 == round(1 / 3, 6)
    assert r0.recall_r6 == 0.5
    assert r0.mrr_r6 == 0.5
    dcg = round((2**2 - 1) * round(1 / math.log2(3), 9)
                + (2**1 - 1) * round(1 / math.log2(4), 9), 6)
    assert r0.dcg_r6 == dcg
    # ideal ordering of the judgments: ratings [3, 2, 1]
    idcg = ((2**3 - 1) * round(1 / math.log2(2), 9)
            + (2**2 - 1) * round(1 / math.log2(3), 9)
            + (2**1 - 1) * round(1 / math.log2(4), 9))
    assert r0.ndcg_r6 == round(dcg / idcg, 6)
    # zebra matches nothing: full zero row, present in the output
    assert tuple(rows[1])[1:] == (0, 0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)


def test_standard_analyzer_seam(spark):
    """PARITY #19 first step (VERDICT r09 Next #8): the 'standard'
    analyzer lowercases and splits on non-alphanumeric runs, applied
    identically to documents and query text, shared by retrieval BM25
    and the es_search match query; 'whitespace' stays the default and
    unknown analyzers raise."""
    import pytest as _pytest

    from dump_es_parquet_spark.operators.es_search import compile_query
    from dump_es_parquet_spark.operators.retrieval import (
        _analyze,
        _terms,
        bm25_scores,
    )

    assert _analyze("Dup, FILTER window!", "standard") == [
        "dup", "filter", "window"
    ]
    assert _analyze("Dup, FILTER window!") == ["Dup,", "FILTER", "window!"]
    assert _terms("Cat cat CAT", "standard") == ["cat"]
    with _pytest.raises(ValueError, match="analyzer"):
        _analyze("x", "keyword")

    d = spark.createDataFrame(
        [(1, "The FAST cat. Runs!"), (2, "slow dog")],
        "doc_id long, text string",
    )
    # BM25: messy query matches doc 1 under standard, nothing under
    # whitespace (no literal 'Cat!' token anywhere)
    std = bm25_scores(d, "fast Cat!", analyzer="standard").collect()
    assert [r.doc_id for r in std] == [1] and std[0].n_matched == 2
    assert bm25_scores(d, "fast Cat!").count() == 0

    # es_search match: per-request analyzer in the spec dict
    q_std = {"match": {"text": {"query": "FAST cat?", "operator": "and",
                                "analyzer": "standard"}}}
    assert [r.doc_id for r in d.filter(compile_query(q_std)).collect()] == [1]
    q_ws = {"match": {"text": {"query": "FAST cat?", "operator": "and"}}}
    assert d.filter(compile_query(q_ws)).count() == 0


def test_analyzer_spec_stopwords_and_length_floor(spark):
    """PARITY #19 second step (round 11, VERDICT r10 Next #8): the
    dict analyzer spec filters stopwords (_english_ = the Lucene
    list) and short tokens AFTER tokenization, identically on query
    text and document token streams — document lengths shrink, so
    the filters are score-bearing, not cosmetic."""
    import pytest as _pytest

    from dump_es_parquet_spark.operators.retrieval import (
        STOPWORDS_ANALYZER,
        _analyze,
        _terms,
        _tokens_col,
        bm25_scores,
    )

    spec = STOPWORDS_ANALYZER
    assert _analyze("The DUP of a Filter... into the Window!", spec) == [
        "dup", "filter", "window"
    ]
    # explicit list + floor
    assert _analyze("go to x1 stop", {"type": "standard",
                                      "stopwords": ["stop"],
                                      "min_token_length": 2}) == [
        "go", "to", "x1"
    ]
    assert _terms("the the dup", spec) == ["dup"]
    # round 12: "stemmer" is now a valid key — but only the
    # regexp-expressible minimal_english rule set (Porter needs a UDF)
    # round 13: porter is a valid opt-in stage; unknown names raise
    assert _analyze("generalizations",
                    {"type": "standard", "stemmer": "porter"}) == ["gener"]
    with _pytest.raises(ValueError, match="stemmer"):
        _analyze("x", {"type": "standard", "stemmer": "snowball"})
    with _pytest.raises(ValueError, match="spec key"):
        _analyze("x", {"type": "standard", "lemmatizer": "wordnet"})

    d = spark.createDataFrame(
        [(1, "the fast cat runs a lot"), (2, "fast dog")],
        "doc_id long, text string",
    )
    toks = d.select(_tokens_col("text", spec).alias("t")).collect()
    assert sorted(map(tuple, (r.t for r in toks))) == [
        ("fast", "cat", "runs", "lot"), ("fast", "dog"),
    ] or sorted(r.t for r in toks) == [
        ["fast", "cat", "runs", "lot"], ["fast", "dog"]
    ]
    # dl under the spec excludes 'the'/'a': doc 1 dl=4 not 6
    rows = {r.doc_id: r.dl for r in bm25_scores(d, "fast", analyzer=spec)
            .collect()}
    assert rows == {1: 4, 2: 2}


def test_analyzer_minimal_english_stemmer(spark):
    """PARITY #19 third step (round 12, VERDICT r11 Next #6): the
    Harman S-stemmer (Lucene minimal_english) as three ordered regexp
    rules, identical on query text and document token streams, and
    score-bearing: a pluralized document must re-join the singular
    query's postings."""
    from dump_es_parquet_spark.operators.retrieval import (
        STEMMED_ANALYZER,
        _analyze,
        _s_stem_py,
        _tokens_col,
        bm25_scores,
    )

    # the Lucene EnglishMinimalStemmer rule set, rule by rule
    assert _s_stem_py("ponies") == "pony"      # ies → y
    assert _s_stem_py("beies") == "beies"      # e before ies exempt
    assert _s_stem_py("baies") == "baies"      # a before ies exempt
    assert _s_stem_py("ies") == "ies"          # too short for ies rule
    assert _s_stem_py("tables") == "table"     # es → e
    assert _s_stem_py("goes") == "goes"        # oes exempt
    assert _s_stem_py("sees") == "sees"        # ees exempt
    assert _s_stem_py("windows") == "window"   # plain s strip
    assert _s_stem_py("glass") == "glass"      # ss exempt
    assert _s_stem_py("focus") == "focus"      # us exempt
    assert _s_stem_py("is") == "is"            # < 3 chars unchanged
    assert _s_stem_py("dup") == "dup"          # no trailing s
    assert _analyze("Dups; FILTERS... windows!", STEMMED_ANALYZER) == [
        "dup", "filter", "window"
    ]
    # document side: the Catalyst expression applies the same rules
    d = spark.createDataFrame(
        [(1, "windows and ponies"), (2, "window glass")],
        "doc_id long, text string",
    )
    toks = {
        r.doc_id: list(r.t)
        for r in d.select(
            "doc_id", _tokens_col("text", STEMMED_ANALYZER).alias("t")
        ).collect()
    }
    assert toks == {1: ["window", "and", "pony"], 2: ["window", "glass"]}
    # score-bearing: both docs match the singular query term
    hits = {r.doc_id for r in
            bm25_scores(d, "window", analyzer=STEMMED_ANALYZER).collect()}
    assert hits == {1, 2}


def test_stemmer_column_equals_python_randomized(spark):
    """The Catalyst S-stemmer expression and its driver-side Python
    twin must agree on arbitrary tokens (they analyze documents and
    queries respectively — a divergence silently breaks scoring)."""
    import random

    from dump_es_parquet_spark.operators.retrieval import (
        _s_stem_col,
        _s_stem_py,
    )
    from pyspark.sql import functions as SF

    rnd = random.Random(7)
    alphabet = "abeiousy"  # dense in the rule set's trigger letters
    toks = list({
        "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 7)))
        for _ in range(300)
    })
    # force suffix coverage
    toks += [t + sfx for t in ("pon", "b", "go", "se", "ta", "")
             for sfx in ("ies", "es", "s", "ss", "us", "")]
    toks = sorted(set(t for t in toks if t))
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = {
        r.t: r.s
        for r in df.select("t", _s_stem_col(SF.col("t")).alias("s")).collect()
    }
    for t in toks:
        assert got[t] == _s_stem_py(t), (t, got[t], _s_stem_py(t))


def test_porter_stemmer_vocabulary():
    """Round 13 (VERDICT r12 Next #8): the full Porter stemmer —
    Porter, Program 14(3) 1980 — pinned on the algorithm's own
    vocabulary (per-step paper examples where they are end-to-end
    stable, plus the canonical full-pipeline outputs). DuckDB's fts
    ``stem(w,'porter')`` cannot be installed in this container, so
    this vocabulary — not a cross-engine oracle row — is the pin;
    minimal_english stays the oracle-checked default (PARITY #19)."""
    from dump_es_parquet_spark.operators.retrieval import porter_stem

    cases = {
        # step 1a / 1b / 1c examples (end-to-end stable)
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "plastered": "plaster", "bled": "bled", "motoring": "motor",
        "sing": "sing", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
        "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky",
        # step 2-4 examples that are end-to-end stable
        "relational": "relat", "conditional": "condit",
        "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "hopeful": "hope",
        "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
        # full-pipeline canonical outputs (tartarus reference)
        "generalizations": "gener", "oscillators": "oscil",
        "electricity": "electr", "electrical": "electr",
        "relativity": "rel", "probability": "probabl",
        "agreed": "agre", "homology": "homologi",
    }
    for w, want in cases.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_column_equals_python_randomized(spark):
    """The Arrow-batched Porter stage and the driver-side query path
    call the same function — but the UDF's array plumbing (NULL
    arrays, empty arrays, batch boundaries) must round-trip; also
    the plan must carry ArrowEvalPython, never BatchEvalPython."""
    import random

    from dump_es_parquet_spark.operators.retrieval import (
        _analyze,
        _tokens_col,
        porter_stem,
    )

    rnd = random.Random(13)
    alphabet = "abceilnorstuy"
    words = list({
        "".join(rnd.choice(alphabet) for _ in range(rnd.randint(1, 10)))
        for _ in range(200)
    })
    words += [w + sfx for w in ("rat", "hop", "controll", "feudal")
              for sfx in ("s", "ed", "ing", "ational", "iveness", "e")]
    texts = [
        " ".join(rnd.sample(words, rnd.randint(1, 6)))
        for _ in range(60)
    ] + [None, ""]
    an = {"type": "standard", "stemmer": "porter"}
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.s for r in df.select(
        _tokens_col("text", an).alias("s")).collect()]
    for t, s in zip(texts, got):
        if t is None:
            assert s is None
        else:
            assert s == _analyze(t, an), (t, s)
    # every stemmed token equals the pure-Python stem of its source
    for t, s in zip(texts, got):
        if t:
            raw = [w for w in t.lower().split() if w]
            assert s == [porter_stem(w) for w in raw]
    plan = df.select(
        _tokens_col("text", an)
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_span_near_pathological_doc_bounded(spark):
    """VERDICT r09 What's wrong #1: a doc stuffed with the first term
    (~10⁴ occurrences) must complete in bounded time — the position
    arrays are bound once per row, so per-doc work is
    O(L×|tokens| + |starts|×Σ|pos_j|), never
    O(|starts|×L×|tokens|).  Pre-fix this shape was quadratic in the
    doc's own length."""
    import time

    from dump_es_parquet_spark.operators.retrieval import (
        span_near_occurrences,
    )

    # 10_000 copies of the first term, a single trailing second term:
    # 10_000 start candidates, each probing a 1-element bound array.
    text = ("alpha " * 10_000) + "omega"
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    t0 = time.monotonic()
    rows = span_near_occurrences(d, "alpha omega", slop=0).collect()
    elapsed = time.monotonic() - t0
    # only the last 'alpha' is adjacent to 'omega'
    assert [(r.doc_id, r.n_spans) for r in rows] == [(1, 1)]
    # generous wall bound: the quadratic form blows past this by
    # orders of magnitude; the bound form is sub-second of real work
    assert elapsed < 60, f"span_near took {elapsed:.1f}s on 10k starts"


def test_fuzzy_term_match_edits_and_prefix(spark):
    """fuzzy_term_match: classic-levenshtein radius, prefix_length
    pins the exact-match prefix (ES's knob), occurrence counts are
    token occurrences not doc counts, and max_edits=0 degenerates to
    exact term match."""
    from dump_es_parquet_spark.operators.retrieval import fuzzy_term_match

    d = spark.createDataFrame(
        [
            (1, "hash hash hasp dash cash"),
            (2, "mask task flask"),
            (3, "totally unrelated words"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in fuzzy_term_match(d, "hask", max_edits=1).collect()}
    # doc 1: hash(x2) and hasp are 1 substitution from 'hask'; dash
    # and cash need 2 (both ends differ), so they are out
    assert got[1].n_occurrences == 3
    assert got[1].matched == "hash hasp"
    # doc 2: mask, task (substitution at pos 1-2); flask is 2 edits
    assert got[2].matched == "mask task" and got[2].n_occurrences == 2
    assert 3 not in got

    # prefix_length=2: first two chars must equal 'ha' exactly
    pre = {r.doc_id: r for r in fuzzy_term_match(
        d, "hask", max_edits=1, prefix_length=2).collect()}
    assert pre[1].matched == "hash hasp" and 2 not in pre

    exact = fuzzy_term_match(d, "hash", max_edits=0).collect()
    assert {(r.doc_id, r.n_occurrences) for r in exact} == {(1, 2)}


def test_more_like_this_selects_interesting_terms(spark):
    """more_like_this: query terms are the source doc's top tf×idf
    terms — a term repeated in the source AND rare in the corpus must
    dominate ubiquitous filler; the source doc itself is excluded and
    docs sharing the interesting term outrank docs sharing filler."""
    from dump_es_parquet_spark.operators.retrieval import more_like_this

    rows = [(42, "rareword rareword the the the")]
    rows += [(i, "the common filler text here") for i in range(10)]
    rows += [(90, "rareword elsewhere once"), (91, "rareword again too")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = more_like_this(d, 42, k=5, max_terms=2).collect()
    ids = [r.doc_id for r in got]
    assert 42 not in ids
    # 'rareword' (tf 2, df 3) beats 'the' (tf 3, df 11) on tf×idf, so
    # with max_terms=2 both are query terms but rareword docs score
    # far higher than the filler docs matching only 'the'
    assert set(ids[:2]) == {90, 91}
    assert all(r.score_micro > 0 for r in got)
    with pytest.raises(ValueError):
        more_like_this(d, 9999, k=5)


def test_significant_terms_jlh_semantics(spark):
    """significant_terms: per-doc DISTINCT presence (a term repeated
    inside one doc counts once), min_fg prunes, JLH ranks a term
    concentrated in the foreground above a uniform one, and the
    superset background can never yield fg_df > df."""
    from dump_es_parquet_spark.operators.retrieval import significant_terms

    rows = []
    # 5 foreground docs all contain 'signal signal' (distinct-counts
    # once) and 'common'; 15 background docs contain 'common' only
    for i in range(5):
        rows.append((i, "signal signal common filler%d" % i, "fg"))
    for i in range(5, 20):
        rows.append((i, "common filler%d" % i, "bg"))
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = significant_terms(
        d, F.col("source") == "fg", k=10, min_fg=3
    ).collect()
    by_term = {r.term: r for r in got}
    # 'signal': fg 5/5, bg 5/20 -> JLH (1 - .25) * (1/.25) = 3.0
    assert by_term["signal"].fg_df == 5 and by_term["signal"].df == 5
    assert by_term["signal"].score_micro == 3_000_000
    # 'common' is uniform: fg% == bg% == 1 -> score 0
    assert by_term["common"].score_micro == 0
    assert got[0].term == "signal"
    # fillers have fg_df <= 1 < min_fg: pruned
    assert not any(t.startswith("filler") for t in by_term)
    assert all(r.fg_df <= r.df for r in got)


def test_match_phrase_batch_repeated_term_and_short_docs(spark):
    """Edge pins: a phrase with a REPEATED term ('a b a') needs the
    same posting joined at two offsets; docs shorter than the phrase
    can never match; overlapping occurrences all count."""
    from dump_es_parquet_spark.operators.retrieval import match_phrase_batch

    d = spark.createDataFrame(
        [
            (1, "a b a b a"),   # 'a b a' starts at 0 and 2 → 2
            (2, "a b"),          # shorter than the phrase
            (3, "b a a b a"),   # one start (index 2)
            (4, "c c c"),        # shares no term
        ],
        "doc_id long, text string",
    )
    p = spark.createDataFrame([(0, "a b a")], "phrase_id long, phrase_text string")
    got = {r.doc_id: r.n_occurrences for r in match_phrase_batch(d, p).collect()}
    assert got == {1: 2, 3: 1}


# — Bloom-prefilter decontamination (operators/spans.py) —


def test_bloom_decontaminate_identical_to_exact(spark, sf_dir):
    """The bloom stage is a PREFILTER: verify makes the output
    row-for-row identical to the exact operator on real testdata."""
    from dump_es_parquet_spark.operators.spans import (
        bloom_decontaminate,
        decontaminate,
    )
    from dump_es_parquet_spark.operators.tables import load

    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 10 == 0)
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    exact = sorted(map(tuple, decontaminate(corpus, bench).collect()))
    bloom = sorted(
        map(tuple, bloom_decontaminate(corpus, bench, m_bits=1 << 16).collect())
    )
    assert bloom == exact and len(exact) > 0


def test_bloom_prefilter_never_drops_a_member(spark):
    """No false negatives by construction: every benchmark span
    passes its own bitmap, even at an absurdly undersized m (all-
    collisions regime) — the filter degrades to pass-through, never
    to a miss."""
    from dump_es_parquet_spark.operators.spans import (
        _bloom_member,
        benchmark_span_bloom,
        span_stream,
    )

    rows = [(i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(30)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    spans = span_stream(d).select("span_h").distinct()
    for m_bits in (64, 1 << 12):
        bm = benchmark_span_bloom(spark, spans, m_bits=m_bits, n_hashes=4)
        kept = (
            spans.crossJoin(F.broadcast(bm))
            .filter(_bloom_member(F.col("span_h"), m_bits, 4))
            .count()
        )
        assert kept == spans.count()


def test_bloom_prefilter_actually_prunes_non_members(spark):
    """At a sane m the bitmap rejects the overwhelming majority of
    non-member spans — the property that saves the shuffle at 100 TB."""
    from dump_es_parquet_spark.operators.spans import (
        _bloom_member,
        benchmark_span_bloom,
        span_stream,
    )

    m_bits = 1 << 14
    bench = spark.createDataFrame(
        [(i, " ".join(f"b{i}_{j}" for j in range(12))) for i in range(20)],
        "doc_id long, text string",
    )
    other = spark.createDataFrame(
        [(i, " ".join(f"x{i}_{j}" for j in range(12))) for i in range(200)],
        "doc_id long, text string",
    )
    bm = benchmark_span_bloom(
        spark, span_stream(bench).select("span_h").distinct(), m_bits=m_bits
    )
    o_spans = span_stream(other).select("span_h").distinct()
    survivors = (
        o_spans.crossJoin(F.broadcast(bm))
        .filter(_bloom_member(F.col("span_h"), m_bits, 4))
        .count()
    )
    # ~1000 distinct non-member spans vs 100 benchmark spans in a
    # 16Kbit filter: fp rate is well under 1%; allow 5% slack
    assert survivors <= 0.05 * o_spans.count()


def test_bloom_bitmap_is_dense_and_data_side(spark):
    """The bitmap is ONE row of m/64 longs (data, not plan literals),
    dense even where no benchmark span set any bit in a word."""
    from dump_es_parquet_spark.operators.spans import benchmark_span_bloom

    spans = spark.createDataFrame([("abc",)], "span_h string")
    row = benchmark_span_bloom(spark, spans, m_bits=1 << 10, n_hashes=4).head()
    assert len(row.bm) == (1 << 10) // 64
    assert sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in row.bm) <= 4


def test_suggesters_completion_and_term(spark):
    """ES suggest section: completion ranks prefix-matching vocab by
    document frequency (a term repeated inside one doc counts once);
    term suggest ranks corrections distance-asc then df-desc (the
    Lucene candidate order), excludes the exact input, and respects
    max_edits with the length pre-guard."""
    from dump_es_parquet_spark.operators.retrieval import (
        completion_suggest,
        term_suggest,
    )

    d = spark.createDataFrame(
        [
            (1, "sort sort sort part"),
            (2, "sort part port"),
            (3, "sample part"),
            (4, "other words"),
        ],
        "doc_id long, text string",
    )
    comp = completion_suggest(d, "s", size=10).collect()
    # df is per-doc distinct: sort appears in docs 1,2 (df 2) even
    # though doc 1 repeats it; sample in doc 3 only
    assert [(r.term, r.df) for r in comp] == [("sort", 2), ("sample", 1)]

    sug = term_suggest(d, "port", max_edits=1).collect()
    # 'port' itself (doc 2) is excluded; sort (df 2) and part (df 3)
    # are both distance 1 -> df desc puts part first
    assert [(r.suggestion, r.distance, r.df) for r in sug] == [
        ("part", 1, 3),
        ("sort", 1, 2),
    ]
    # max_edits=2 admits 'sample'? no - levenshtein(sample, port)=4;
    # 'words' is 4 edits too: the radius genuinely gates
    sug2 = term_suggest(d, "port", max_edits=2).collect()
    assert {r.suggestion for r in sug2} == {"part", "sort"}


def test_phrase_suggest_hand_checked(spark):
    """Round 14 (VERDICT r13 Next #6): the phrase suggester on a
    corpus where every LM quantity is hand-countable. Corpus tokens:
    doc1/doc2 'the fast cat', doc3 'a last hat hat' -> T=10;
    c1: the=2 fast=2 cat=2 hat=2 a=1 last=1; bigrams:
    (the,fast)=2 (fast,cat)=2 (a,last)=1 (last,hat)=1 (hat,hat)=1.
    'mast' is one edit from both fast and last, 'cat' from hat ->
    four candidate phrases, every backoff shape exercised, no score
    ties."""
    import math

    from dump_es_parquet_spark.operators.retrieval import (
        phrase_suggest,
    )

    d = spark.createDataFrame(
        [(1, "the fast cat"), (2, "the fast cat"), (3, "a last hat hat")],
        "doc_id long, text string",
    )
    out = phrase_suggest(d, "the mast cat", max_edits=1).collect()
    got = [(r.rank, r.suggestion, r.score_micro) for r in out]
    assert [g[1] for g in got] == [
        "the fast cat",   # real bigrams all the way
        "the fast hat",   # one backoff (fast,hat)
        "the last hat",   # backoff (the,last), real (last,hat)
        "the last cat",   # two backoffs
    ]

    def score(ws, bigrams, c1, t=10):
        s = round(math.log(c1[ws[0]] / t), 12)
        for a, b in zip(ws, ws[1:]):
            if (a, b) in bigrams:
                s += round(math.log(bigrams[(a, b)] / c1[a]), 12)
            else:
                s += round(math.log(0.4 * c1[b] / t), 12)
        return math.floor(1e6 * s)

    c1 = {"the": 2, "fast": 2, "cat": 2, "hat": 2, "a": 1, "last": 1}
    bg = {("the", "fast"): 2, ("fast", "cat"): 2, ("a", "last"): 1,
          ("last", "hat"): 1, ("hat", "hat"): 1}
    for rank, sugg, micro in got:
        assert micro == score(sugg.split(), bg, c1), sugg

    # a position with no candidate within max_edits -> empty frame
    assert phrase_suggest(d, "the zzzzzz cat").count() == 0
    # single-word input raises (that's the term suggester's job)
    with pytest.raises(ValueError, match="multi-word"):
        phrase_suggest(d, "cat")
    # round 15 (the r14 `weak` fix): work is linear in input length
    # via the beam, but each position is one bounded collect — the
    # documented 32-token cap raises loudly instead of grinding
    with pytest.raises(ValueError, match="32"):
        phrase_suggest(d, "cat " * 33)


def test_phrase_suggest_beam_equals_product(spark):
    """Round 15 (VERDICT r14 Next #2): the beam-pruned phrase search
    returns the same top-``size`` as the full candidate product. The
    reference computation enumerates every per_token^L combination
    in pure Python (the shape the r14 driver-side literal built) and
    scores it with the identical 12dp-rounded stupid-backoff chain;
    the beam must reproduce its micro-exact top ranking — here with
    size=2 < candidate count per position, so pruning is LIVE at
    every step (4 positions, ambiguous neighborhoods at three);
    product_cap=1 FORCES the Spark beam (small inputs take the
    driver-scored product path, verified by the hand-checked test,
    so both physical paths stay pinned)."""
    import itertools
    import math

    from dump_es_parquet_spark.operators.retrieval import (
        phrase_suggest,
    )

    rows = [
        (1, "the fast cat ran home"),
        (2, "the fast cat ran away"),
        (3, "a last hat sat here"),
        (4, "the last rat ran home"),
        (5, "a fast rat sat away"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    toks = [r[1].split() for r in rows]
    c1: dict[str, int] = {}
    bg: dict[tuple[str, str], int] = {}
    for ts in toks:
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    t = sum(c1.values())

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    text = "the mast rat rxn"
    per_token, size = 3, 2
    cands = []
    for term in text.split():
        cs = sorted(
            ((w, c) for w, c in c1.items() if lev(w, term) <= 1),
            key=lambda wc: (lev(wc[0], term), -wc[1], wc[0]),
        )[:per_token]
        assert cs, term
        cands.append(cs)

    def score(ws):
        s = round(math.log(c1[ws[0]] / t), 12)
        for a, b in zip(ws, ws[1:]):
            if (a, b) in bg:
                s += round(math.log(bg[(a, b)] / c1[a]), 12)
            else:
                s += round(math.log(0.4 * c1[b] / t), 12)
        return math.floor(1e6 * s)

    full = sorted(
        (
            (score([w for w, _ in pick]), " ".join(w for w, _ in pick))
            for pick in itertools.product(*cands)
        ),
        key=lambda sm: (-sm[0], sm[1]),
    )
    want = [
        (i + 1, sugg, micro)
        for i, (micro, sugg) in enumerate(full[:size])
    ]
    got = [
        (r.rank, r.suggestion, r.score_micro)
        for r in phrase_suggest(
            d, text, max_edits=1, per_token=per_token, size=size,
            product_cap=1
        ).collect()
    ]
    assert got == want


def test_retriever_rrf_dialect(spark, sf_dir):
    """Round 14: the ES 8.14 retriever.rrf request routes to
    hybrid_rrf with the section's knobs; malformed trees raise."""
    from dump_es_parquet_spark.operators.retrieval import (
        DEFAULT_QUERY,
        hybrid_rrf,
        retriever_rrf,
    )

    req = {
        "retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"match": {
                    "text": DEFAULT_QUERY}}}},
                {"knn": {"field": "embedding", "query_vector_id": 2}},
            ],
            "rank_constant": 25,
            "rank_window_size": 20,
        }},
        "size": 5,
    }
    got = retriever_rrf(spark, sf_dir, req).collect()
    want = hybrid_rrf(spark, sf_dir, DEFAULT_QUERY, query_vec_id=2,
                      k=5, pool=20, rrf_k=25).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 5

    for bad in (
        {"retriever": {"knn": {}}},
        {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "x"}}}}]}}},
        {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"term": {"text": "x"}}}},
            {"knn": {"query_vector_id": 0}}]}}},
        {"retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "x"}}}},
            {"knn": {"query_vector": [0.1, 0.2]}}]}}},
    ):
        with pytest.raises(ValueError):
            retriever_rrf(spark, sf_dir, bad)
