"""Round-5 verdict/advice fixes, pinned:

1. Term leaves never run per-leaf existence jobs: the batched dictionary
   prefetch is mandatory (lazily built inside _compute for direct
   callers), so the Spark job count of a search is independent of the
   number of term leaves in the AST.
2. pii_scrub propagates NULL text as NULL counts/scrubbed (Spark's
   size() == -1 on NULL no longer leaks through).
3. KVStorage commits stream via toLocalIterator across many partitions
   and fail fast above the documented max-batch guard.
4. ivf_topk's broadcast-argmax fallback (plan-size-bounded assignment
   above _IVF_LITERAL_MAX_CENTROIDS) returns exactly the literal
   projection's results.
"""

import pytest
from pyspark.sql import functions as F

from phphinder_spark.analysis import Analyzer
from phphinder_spark.engine import SparkSearchEngine, _Ctx
from phphinder_spark.ops import similarity, textstats
from phphinder_spark.query import QueryParser
from phphinder_spark.query.parser import ANY_FIELD
from phphinder_spark.schema import IS_FULLTEXT, IS_INDEXED, IS_STORED, SearchSchema


def _mini_schema():
    return SearchSchema(
        {"text": IS_INDEXED | IS_STORED | IS_FULLTEXT},
        analyzer=Analyzer.lowercase_only(),
        name="r5",
    )


@pytest.fixture(scope="module")
def mini_engine(spark):
    rows = [(i, f"alpha beta doc {i} spark table gamma") for i in range(30)]
    rows += [(100 + i, f"unrelated words only {i}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eng = SparkSearchEngine(spark, _mini_schema())
    eng.index_dataframe(docs)
    eng.index.postings.cache().count()
    eng.index.stats()
    return eng


# ------------------------------------------------------- job-count invariance


_PROBE_SEQ = [0]


def _jobs_for(spark, fn) -> int:
    """Number of Spark ACTIONS fn() issues. AQE is disabled inside the
    probe so one action == one job (with AQE on, every shuffle stage of a
    single action surfaces as its own job id, which would measure plan
    depth, not driver round-trips)."""
    sc = spark.sparkContext
    _PROBE_SEQ[0] += 1
    group = f"jobcount-{_PROBE_SEQ[0]}"
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "job-count probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    tracker = sc.statusTracker()
    return len(tracker.getJobIdsForGroup(group))


def test_search_job_count_independent_of_term_leaf_count(spark, mini_engine):
    """A 3-term AND must cost the same number of Spark jobs as a 1-term
    query: one batched dictionary prefetch + one result collect — never a
    per-leaf existence probe (round-4 verdict 'What's wrong' #5)."""
    # warm both query shapes once (first-run codegen/broadcast jobs vary)
    mini_engine.search_df("alpha").collect()
    mini_engine.search_df("alpha beta gamma").collect()
    n1 = _jobs_for(spark, lambda: mini_engine.search_df("alpha").collect())
    n3 = _jobs_for(
        spark, lambda: mini_engine.search_df("alpha beta gamma").collect()
    )
    assert n1 > 0
    assert n3 == n1


def test_direct_compute_prefetches_whole_subtree(spark, mini_engine):
    """_compute without a search_df-provided prefetch builds its own map
    for the full AST instead of falling back to per-leaf jobs."""
    query = QueryParser(ANY_FIELD).parse("alpha beta gamma")
    ctx = _Ctx()
    assert ctx.term_hits is None
    out = mini_engine._compute(
        query, mini_engine._empty_matches(), ctx, "alpha beta gamma", top=True
    )
    assert ctx.term_hits is not None
    assert ctx.term_hits.get(("alpha", "text")) is True
    assert out.count() > 0


# ----------------------------------------------------------- pii NULL safety


def test_pii_scrub_null_text_yields_null_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a@b.com or call +1 (555) 123-4567"),
            (2, None),
            (3, "no pii here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textstats.pii_scrub(df).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[2]["scrubbed"] is None
    assert out[2]["n_email"] is None
    assert out[2]["n_ipv4"] is None
    assert out[2]["n_phone"] is None
    assert out[3]["n_email"] == 0


# ------------------------------------------------------------ KVStorage bounds


def test_kvstorage_streamed_commit_many_partitions(spark, tmp_path):
    """Commit a deliberately many-partition batch: toLocalIterator must
    reassemble every partition's rows (no single-collect assumption)."""
    from phphinder_spark.index.builder import build_index
    from phphinder_spark.index.storage import KVStorage

    schema = _mini_schema()
    docs = spark.createDataFrame(
        [(i, f"words number{i} alpha") for i in range(200)],
        "doc_id long, text string",
    ).repartition(16)
    idx = build_index(docs, schema)
    store = KVStorage(spark, str(tmp_path / "kv"))
    store.commit(idx.docs.repartition(16), idx.postings.repartition(16), [])
    assert store.docs().count() == 200
    assert (
        store.postings().where(F.col("term") == "alpha").count() == 200
    )
    # round-trip through a fresh engine over the store
    eng = SparkSearchEngine(spark, schema, storage=store)
    assert len(eng.search("number7")) == 1


def test_kvstorage_max_batch_guard(spark, tmp_path, monkeypatch):
    from phphinder_spark.index.builder import build_index
    from phphinder_spark.index.storage import KVStorage

    schema = _mini_schema()
    docs = spark.createDataFrame(
        [(i, f"words number{i}") for i in range(50)],
        "doc_id long, text string",
    )
    idx = build_index(docs, schema)
    store = KVStorage(spark, str(tmp_path / "kv2"))
    monkeypatch.setattr(KVStorage, "_MAX_COMMIT_ROWS", 10)
    with pytest.raises(ValueError, match="ParquetSnapshotStorage"):
        store.commit(idx.docs, idx.postings, [])


# ------------------------------------------- connected components at depth


def test_star_cc_is_logarithmic_on_chains(spark):
    """A diameter-63 chain: min-label propagation needs ~diameter rounds
    (so 10 rounds must NOT converge), the large/small-star alternation
    converges in O(log diameter) rounds, and 'auto' switches over and
    finishes. All three agree with the exact answer where they converge."""
    from phphinder_spark.ops.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "a_id long, b_id long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, algorithm="label", max_iter=10)

    m_star: dict = {}
    star = connected_components(
        chain, algorithm="star", max_iter=12, metrics=m_star
    )
    labels = {r["id"]: r["cluster_id"] for r in star.collect()}
    assert labels == {i: 0 for i in range(64)}
    assert 0 < m_star["star_rounds"] <= 12

    m_auto: dict = {}
    auto = connected_components(
        chain, algorithm="auto", switch_after=3, max_iter=20, metrics=m_auto
    )
    labels = {r["id"]: r["cluster_id"] for r in auto.collect()}
    assert labels == {i: 0 for i in range(64)}
    assert m_auto["label_rounds"] == 3 and m_auto["star_rounds"] > 0


def test_auto_cc_stays_on_label_for_shallow_graphs(spark):
    """LSH-shaped shallow stars converge inside the label-prop budget —
    the auto path must not pay any star rounds there."""
    from phphinder_spark.ops.dedup import connected_components

    pairs = [(c, c + i) for c in (0, 100, 200) for i in (1, 2, 3)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    m: dict = {}
    out = connected_components(df, algorithm="auto", metrics=m)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got == {c + i: c for c in (0, 100, 200) for i in (0, 1, 2, 3)}
    assert m["star_rounds"] == 0 and m["label_rounds"] <= 3


def test_star_cc_handles_high_degree_hubs(spark):
    """Skew shape: one hub connected to 3000 leaves plus a chain tail —
    the star steps must resolve it without materializing any neighbor
    list (the agg+join formulation), and the hub's component label must
    be the global min reached through the tail."""
    from phphinder_spark.ops.dedup import connected_components

    hub = 5000
    pairs = [(hub, 10_000 + i) for i in range(3000)]
    # chain tail hanging off the hub, reaching down to node 0
    pairs += [(i, i + 1) for i in range(0, 8)] + [(8, hub)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    out = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, algorithm="star").collect()
    }
    assert set(out.values()) == {0}
    assert len(out) == 3000 + 9 + 1


# ------------------------------------------------------------ IVF fallback


def test_ivf_broadcast_fallback_matches_literal_projection(spark, monkeypatch):
    import random

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (
        emb.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["vec_id"], r["cosine"])
            for r in similarity.ivf_topk(
                emb, queries, k=5, n_centroids=16, n_probe=4
            ).collect()
        )

    literal = run()
    monkeypatch.setattr(similarity, "_IVF_LITERAL_MAX_CENTROIDS", 4)
    fallback = run()
    assert fallback == literal


# --------------------------------------------------- decontamination op


def test_ngram_contamination_flags_shared_grams_only(spark):
    """Docs sharing an n-gram with the benchmark are flagged with the
    DISTINCT shared-gram count; clean and too-short docs report 0."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox appears"),        # shares 'quick brown fox'
            (3, "entirely different words here now"),
            (4, "fox jumps over the lazy dog again and quick brown fox too"),
            (5, "too short"),                        # < n tokens vs bench grams
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "THE QUICK BROWN FOX JUMPS over nothing")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in textstats.ngram_contamination(docs, bench, n=3).collect()
    }
    # bench 3-grams: {the quick brown, quick brown fox, brown fox jumps,
    #                 fox jumps over, jumps over nothing}
    assert out[1] == (4, True)
    assert out[2] == (1, True)
    assert out[3] == (0, False)
    assert out[4] == (2, True)   # 'fox jumps over' + 'quick brown fox'
    assert out[5] == (0, False)


def test_clean_corpus_decontamination_leg(spark):
    """With a benchmark, clean_corpus additionally drops kept docs that
    share an n-gram with it — and ONLY those (quality/dedup verdicts
    unchanged)."""
    from phphinder_spark.ops import pipeline

    good = "the quick brown fox jumps over lazy dogs and cats with style "
    other = "completely different tokens of that corpus and the long body "
    docs = spark.createDataFrame(
        [
            (1, good * 4),       # keeper, but contaminated (shares grams)
            (2, good * 4),       # exact dup of 1
            (3, other * 4),      # keeper, clean
            (4, "short"),        # quality reject
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox went elsewhere")],
        "doc_id long, text string",
    )
    base = {r["doc_id"] for r in pipeline.clean_corpus(
        docs, jaccard_threshold=0.5, min_words=20, min_stop_hits=2
    ).collect()}
    assert base == {1, 3}
    full = {r["doc_id"] for r in pipeline.clean_corpus(
        docs, jaccard_threshold=0.5, min_words=20, min_stop_hits=2,
        benchmark=bench, decontam_n=3,
    ).collect()}
    assert full == {3}


def test_trained_centroids_are_a_real_drop_in(spark):
    """train_centroids (spherical k-means Lloyd) plugs into ivf_topk and,
    on a corpus with planted clusters, matches or beats the sampled-
    centroid recall vs the exact brute force."""
    import random

    rng = random.Random(7)
    centers = [[1.0 if d == c else 0.0 for d in range(8)] for c in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append(
            (i, [x + rng.uniform(-0.15, 0.15) for x in c])
        )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, queries, k=10).collect()
    }

    def recall(res):
        got = {(r["query_id"], r["vec_id"]) for r in res.collect()}
        return len(got & exact) / len(exact)

    sampled = recall(
        similarity.ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=2)
    )
    cents = similarity.train_centroids(emb, n_centroids=8, n_iter=4)
    assert len(cents) == 8 and all(len(v) == 8 for _, v in cents)
    trained = recall(
        similarity.ivf_topk(
            emb, queries, k=10, n_centroids=8, n_probe=2, centroids=cents
        )
    )
    assert trained >= sampled
    assert trained >= 0.9
