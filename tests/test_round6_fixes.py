"""Round-6 verdict/advice fixes, pinned:

1. ngram_contamination fail-fasts when the benchmark's distinct gram set
   exceeds the broadcast-safe guard (round-5 'What's wrong' #3).
2. Streaming replay runners clean up after themselves: no memory-sink
   temp view and no checkpoint directory survives a replay call
   (round-5 advice on replay.py).
3. connected_components returns the SAME id set for all three algorithms,
   including ids that only appear in self-pairs (a, a) (round-5 advice
   on the star path's silent self-loop drop).
4. KVStorage.commit evaluates each input frame exactly once
   (localCheckpoint at entry) — a non-deterministic input cannot make
   the delete arm diverge from the insert arm (round-5 advice, medium).
"""

import os

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops import textstats


# ------------------------------------------------- contamination broadcast guard


def test_ngram_contamination_guard_trips_on_oversized_benchmark(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(40)],
        "doc_id long, text string",
    )
    monkeypatch.setattr(textstats, "_MAX_BENCH_GRAM_ROWS", 10)
    with pytest.raises(ValueError, match="minhash_lsh_pairs"):
        textstats.ngram_contamination(docs, bench, n=3)


def test_ngram_contamination_under_guard_unchanged(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox sleeps")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in textstats.ngram_contamination(docs, bench, n=3).collect()
    }
    assert out == {1: True, 2: False}


# ------------------------------------------------------- replay cleanup


def test_replay_cleans_checkpoint_and_temp_view(spark, tmp_path):
    from phphinder_spark.streaming import replay

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i}", "en") for i in range(12)],
        "doc_id long, text string, lang string",
    )
    staged = str(tmp_path / "waves")
    schema = replay.stage_batches(spark, docs, staged, n_batches=2)

    views_before = {t.name for t in spark.catalog.listTables()}
    dirs_before = {d for d in os.listdir("/tmp") if d.startswith("phph_replay_tdf_")}
    out = replay.replay_running_term_df(spark, staged, schema)
    # result survives the cleanup (lineage cut before the view drop) ...
    rows = {r["term"]: r["df"] for r in out.collect()}
    assert rows["alpha"] == 12
    # ... but neither the memory-sink view nor the checkpoint dir does
    views_after = {t.name for t in spark.catalog.listTables()}
    assert views_after == views_before
    dirs_after = {d for d in os.listdir("/tmp") if d.startswith("phph_replay_tdf_")}
    assert dirs_after == dirs_before


# ------------------------------------------- KV commit single-evaluation


def test_kvstorage_commit_consistent_under_nondeterministic_input(spark, tmp_path):
    """A genuinely non-deterministic docs frame (per-evaluation random
    filter) must still produce an internally consistent store: the delete
    arm's id set and the insert arm's rows come from ONE materialization,
    so no posting/docpost key can reference a doc that was scanned but
    never inserted (or vice versa)."""
    import random as _random

    from phphinder_spark.index.storage import KVStorage

    base = spark.createDataFrame(
        [(i, f"body tok{i} words") for i in range(60)], "doc_id long, text string"
    )
    flip = F.udf(lambda: _random.random(), "double").asNondeterministic()
    nondet_docs = base.where(flip() < 0.5)
    postings = base.select(
        F.lit("text").alias("field"),
        F.concat(F.lit("tok"), F.col("doc_id")).alias("term"),
        "doc_id",
        F.lit(1).cast("long").alias("tf"),
        F.array(F.lit(1)).alias("positions"),
    )

    store = KVStorage(spark, str(tmp_path / "kvnd"))
    # seed every id so the delete arm has something to diverge on
    store.commit(base, postings, [])
    store.commit(nondet_docs, postings, [])

    with store._open("r") as db:
        doc_ids = {int(k[4:]) for k in db.keys() if k.startswith(b"doc:")}
        docpost_ids = {int(k[8:]) for k in db.keys() if k.startswith(b"docpost:")}
        import json as _json

        posted_ids = {
            int(i)
            for k in db.keys()
            if k.startswith(b"post:")
            for i in _json.loads(db[k])
        }
    # postings were committed for every id, so docs must cover them all:
    # an id scanned-but-not-inserted (the pre-fix divergence) would leave
    # post:/docpost: keys pointing at a missing doc: key
    assert posted_ids <= doc_ids
    assert docpost_ids <= doc_ids
    assert doc_ids == set(range(60))


# --------------------------------------- driver-side dictionary prefetch


def _jobs_for(spark, fn) -> int:
    import itertools

    sc = spark.sparkContext
    group = f"r6jobs-{next(_jobs_for._seq)}"
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "job-count probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(sc.statusTracker().getJobIdsForGroup(group))


_jobs_for._seq = __import__("itertools").count()


@pytest.fixture(scope="module")
def r6_engine(spark):
    from phphinder_spark.analysis import Analyzer
    from phphinder_spark.engine import SparkSearchEngine
    from phphinder_spark.schema import IS_FULLTEXT, IS_INDEXED, IS_STORED, SearchSchema

    schema = SearchSchema(
        {"text": IS_INDEXED | IS_STORED | IS_FULLTEXT},
        analyzer=Analyzer.lowercase_only(),
        name="r6",
    )
    rows = [(i, f"alpha beta doc {i} spark table gamma") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    eng = SparkSearchEngine(spark, schema)
    eng.index_dataframe(docs)
    eng.index.postings.cache().count()
    eng.index.stats()
    return eng


def test_prefetch_is_jobless_once_dictionary_cached(spark, r6_engine):
    """After the one-time driver-side dictionary build, the existence
    prefetch answers from a local dict — ZERO Spark jobs per query
    (round-5 verdict #3: the batched prefetch collect was the last
    structural per-query driver round-trip in memory-mode serving)."""
    from phphinder_spark.query import QueryParser
    from phphinder_spark.query.parser import ANY_FIELD

    q = QueryParser(ANY_FIELD).parse("alpha beta gamma")
    r6_engine._prefetch_term_hits(q)  # one-time cache build
    hits = {}
    n = _jobs_for(spark, lambda: hits.update(r6_engine._prefetch_term_hits(q)))
    assert n == 0
    assert hits[("alpha", "text")] is True
    assert ("nosuchterm", "text") not in hits


def test_prefetch_falls_back_to_batched_job_over_cap(spark, r6_engine, monkeypatch):
    """Dictionary over the cap: the driver cache is skipped and the single
    batched probe job returns the identical map."""
    from phphinder_spark import engine as engine_mod
    from phphinder_spark.query import QueryParser
    from phphinder_spark.query.parser import ANY_FIELD

    q = QueryParser(ANY_FIELD).parse("alpha beta gamma nosuchterm")
    cached = r6_engine._prefetch_term_hits(q)
    monkeypatch.setattr(engine_mod, "_DICT_DRIVER_CACHE_MAX", 0)
    monkeypatch.setattr(r6_engine, "_tf_cache", None)
    monkeypatch.setattr(r6_engine, "_tf_cache_tried", False)
    batched = r6_engine._prefetch_term_hits(q)
    assert r6_engine._term_field_cache() is None
    assert batched == cached
    assert batched[("alpha", "text")] is True


def test_search_results_identical_with_and_without_cache(spark, r6_engine, monkeypatch):
    from phphinder_spark import engine as engine_mod

    with_cache = sorted(
        (r["doc_id"], r["weight"]) for r in r6_engine.search_df("alpha beta").collect()
    )
    monkeypatch.setattr(engine_mod, "_DICT_DRIVER_CACHE_MAX", 0)
    monkeypatch.setattr(r6_engine, "_tf_cache", None)
    monkeypatch.setattr(r6_engine, "_tf_cache_tried", False)
    without = sorted(
        (r["doc_id"], r["weight"]) for r in r6_engine.search_df("alpha beta").collect()
    )
    assert with_cache == without and len(with_cache) == 30


# ------------------------------------------------- duplicate spans (Lee 2021)


def test_duplicate_spans_flags_cross_doc_repeats(spark):
    """A 4-gram span shared verbatim by two docs is duplicated in both;
    unique spans, short docs (< n tokens) and within-threshold docs are
    not. n_spans = token-window count; dup_ratio is exact."""
    shared = "one two three four"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} alpha beta"),          # 3 spans, 1 duplicated
            (2, f"prefix {shared} gamma"),        # 3 spans, 1 duplicated
            (3, "totally different words here"),  # 1 span, unique
            (4, "tiny doc"),                      # < n tokens -> 0 spans
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"], r["dup_ratio"], r["has_dup"])
        for r in textstats.duplicate_spans(docs, n=4).collect()
    }
    assert out[1] == (3, 1, round(1 / 3, 6), True)
    assert out[2] == (3, 1, round(1 / 3, 6), True)
    assert out[3] == (1, 0, 0.0, False)
    assert out[4] == (0, 0, 0.0, False)


def test_duplicate_spans_counts_within_doc_occurrences(spark):
    """min_count counts OCCURRENCES, not distinct docs: a span repeated
    inside one doc is corpus-duplicated too (the Lee et al. rule)."""
    docs = spark.createDataFrame(
        [(1, "a b c d x y z a b c d"), (2, "nothing shared here at all")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_dup_spans"], r["has_dup"])
        for r in textstats.duplicate_spans(docs, n=4).collect()
    }
    assert out[1] == (2, True)   # 'a b c d' occurs twice within doc 1
    assert out[2] == (0, False)


def test_duplicate_spans_hash_path_equivalent(spark):
    """hash_spans=True (xxhash64 longs on the shuffle) returns the exact
    same rows as the string form on a non-degenerate corpus."""
    rows = [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4} common tail span here") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, textstats.duplicate_spans(docs, n=5).collect()))
    b = sorted(
        map(tuple, textstats.duplicate_spans(docs, n=5, hash_spans=True).collect())
    )
    assert a == b


# ------------------------------------------- trained-IVF committed fixture


def test_ivf_centroid_fixture_drives_trained_entry(spark):
    """The committed centroid fixture is well-formed (16 x 64, unit-norm)
    and the ann_ivf_trained driver entry returns full top-k rows over it
    (its value-level certification is the DuckDB oracle row)."""
    import math

    import __spark_entry__ as em

    cents = spark.read.parquet(em._IVF_CENT_FIXTURE).collect()
    assert len(cents) == 16
    for r in cents:
        v = list(r["centv"])
        assert len(v) == 64
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    out = em._q_ann_ivf_trained(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == 50  # 5 queries x k=10
    assert {r["query_id"] for r in out} == {
        r["vec_id"]
        for r in spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .orderBy("vec_id")
        .limit(5)
        .collect()
    }


# --------------------------------------------- CC id-set contract + probe


def test_cc_self_pairs_present_in_all_algorithms(spark):
    """Ids appearing ONLY in self-pairs (a, a) must come back as singleton
    clusters from every algorithm — previously 'star' silently dropped
    them while 'label' kept them."""
    from phphinder_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7), (9, 9), (3, 3)], "a_id long, b_id long"
    )
    expected = {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}
    for algo in ("label", "star", "auto"):
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == expected, algo


def test_cc_all_self_pairs_edgeless_graph(spark):
    """Degenerate input: every pair is a self-loop — no edges survive the
    strip, every id is its own cluster, no algorithm raises."""
    from phphinder_spark.ops.dedup import connected_components

    pairs = spark.createDataFrame([(4, 4), (8, 8)], "a_id long, b_id long")
    for algo in ("label", "star", "auto"):
        got = {
            r["id"]: r["cluster_id"]
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert got == {4: 4, 8: 8}, algo


# -------------------------------------------- span REMOVAL (Lee 2021 form)


def test_remove_duplicate_spans_cuts_covered_tokens(spark):
    """Every token covered by a corpus-duplicated n-gram is cut; the doc
    is rebuilt from the survivors (token-normalized). Overlapping
    duplicated spans union their coverage, NULL propagates, empty stays
    empty."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a quick brown fox leaps far"),
            (3, "totally unique words here indeed"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cleaned"], r["n_tokens"], r["n_removed"])
        for r in textstats.remove_duplicate_spans(docs, n=3).collect()
    }
    assert out[1] == ("the jumps over the lazy dog", 9, 3)
    assert out[2] == ("a leaps far", 6, 3)
    assert out[3] == ("totally unique words here indeed", 5, 0)
    assert out[4] == (None, 0, 0)
    assert out[5] == ("", 0, 0)


def test_remove_duplicate_spans_overlap_union_and_full_removal(spark):
    """Two overlapping duplicated 3-grams cover 4 tokens, not 6; a doc
    that IS a duplicated span comes back empty."""
    docs = spark.createDataFrame(
        [
            (1, "w x y z"),   # both 3-grams duplicated -> whole doc covered
            (2, "w x y z"),
            (3, "unrelated filler text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["cleaned"], r["n_removed"])
        for r in textstats.remove_duplicate_spans(docs, n=3).collect()
    }
    assert out[1] == ("", 4)
    assert out[2] == ("", 4)
    assert out[3] == ("unrelated filler text", 0)


def test_remove_duplicate_spans_agrees_with_flag_op(spark):
    """n_removed > 0 <=> duplicate_spans.has_dup at the same (n,
    min_count); hash_spans form is value-identical."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pyspark.sql import functions as F

    rem = textstats.remove_duplicate_spans(docs, n=8)
    flag = textstats.duplicate_spans(docs, n=8)
    bad = (
        rem.select("doc_id", (F.col("n_removed") > 0).alias("r"))
        .join(flag.select("doc_id", "has_dup"), "doc_id")
        .where(F.col("r") != F.col("has_dup"))
        .count()
    )
    assert bad == 0
    a = sorted(map(tuple, rem.collect()))
    b = sorted(
        map(
            tuple,
            textstats.remove_duplicate_spans(docs, n=8, hash_spans=True).collect(),
        )
    )
    assert a == b


# --------------------------------------------- warm_shapes (cold-path latency)


def test_warm_shapes_covers_all_shapes_and_preserves_results(spark):
    from phphinder_spark.engine import SparkSearchEngine
    from phphinder_spark.schema import test_schema as make_test_schema

    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document({"_id": 1, "title": "Cat", "text": "meow world engine",
                      "description": "d"})
    eng.add_document({"_id": 2, "title": "Dog", "text": "bark world fun",
                      "description": "d"})
    eng.flush()
    timings = eng.warm_shapes()
    assert set(timings) == {
        "term", "and", "or", "not", "prefix", "phrase", "typo", "bm25"
    }
    assert all(t >= 0 for t in timings.values())
    # warming must not perturb query semantics
    assert {r.doc_id for r in eng.search("world")} == {1, 2}
    assert {r.doc_id for r in eng.search("meow")} == {1}
    # idempotent
    assert set(eng.warm_shapes(bm25=False)) == {
        "term", "and", "or", "not", "prefix", "phrase", "typo"
    }


def test_warm_shapes_empty_index_is_safe(spark):
    from phphinder_spark.engine import SparkSearchEngine
    from phphinder_spark.schema import test_schema as make_test_schema

    eng = SparkSearchEngine(spark, make_test_schema())
    assert eng.warm_shapes() == {}
