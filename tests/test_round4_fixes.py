"""Round-4 verdict/advice fixes, pinned:

1. phrase_strategy='auto' picks the contains scan at toy scale and the
   positional index path at segment-serving — with identical results.
2. simhash_pairs(scheme='auto') never re-scans the upstream plan: the
   n_docs hint skips counting entirely; the deferred path counts only the
   CACHED fingerprint frame; all auto outcomes equal 'pairs'/'single'.
3. index.postings is guarded in segment-serving mode (RuntimeWarning on
   direct access; engine query paths never trip it).
4. ivf_topk assigns centroids map-side: no window shuffle keyed on the
   corpus vec_id.
5. mariadb dialect literals double backslashes.
"""

import warnings

import pytest
from pyspark.sql import functions as F

from phphinder_spark.analysis import Analyzer
from phphinder_spark.engine import SparkSearchEngine
from phphinder_spark.ops import dedup, similarity
from phphinder_spark.schema import IS_FULLTEXT, IS_INDEXED, IS_STORED, SearchSchema


def _mini_schema():
    return SearchSchema(
        {"text": IS_INDEXED | IS_STORED | IS_FULLTEXT},
        analyzer=Analyzer.lowercase_only(),
        name="r4",
    )


@pytest.fixture(scope="module")
def mini_docs(spark):
    rows = [(i, f"alpha beta doc {i} spark table gamma") for i in range(30)]
    rows += [(100 + i, f"unrelated words only {i}") for i in range(10)]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------- phrase auto


def test_phrase_auto_picks_scan_at_toy_scale_with_identical_results(
    spark, mini_docs
):
    auto = SparkSearchEngine(spark, _mini_schema())
    auto.index_dataframe(mini_docs)
    forced = SparkSearchEngine(spark, _mini_schema(), phrase_strategy="index")
    forced.index_dataframe(mini_docs)
    assert auto._phrase_use_index() is False  # docs are memory-cached
    assert forced._phrase_use_index() is True
    for q in ['"spark table"', '"beta doc"', '"nomatch phrase"']:
        a = sorted(r["doc_id"] for r in auto.search_df(q).collect())
        b = sorted(r["doc_id"] for r in forced.search_df(q).collect())
        assert a == b, q


def test_phrase_auto_plan_is_single_scan_at_toy_scale(spark, mini_docs):
    """At toy scale the auto phrase plan must be the one-job contains scan
    (no candidate join) — the whole point of the gate."""
    auto = SparkSearchEngine(spark, _mini_schema())
    auto.index_dataframe(mini_docs)
    plan = auto.search_df('"spark table"')._jdf.queryExecution().optimizedPlan().toString()
    # the index path introduces a positions-explode join; the scan path
    # has no positional join at all (only the final docs attach join)
    assert "posexplode" not in plan.lower()


def test_phrase_auto_always_indexes_in_segment_mode(spark, mini_docs, tmp_path):
    import os
    import shutil

    from phphinder_spark.index.manifest import build_resumable_index

    out_dir = str(tmp_path / "r4idx")
    build_resumable_index(spark, mini_docs, _mini_schema(), out_dir, n_chunks=2)
    # postings-from-parquet serving also prefilters (docs NOT memory-cached:
    # a contains scan would re-read the whole text column per query)
    warm = SparkSearchEngine.from_index_dir(
        spark, out_dir, _mini_schema(), serve="postings"
    )
    assert warm._phrase_use_index() is True
    shutil.rmtree(os.path.join(out_dir, "postings"))
    seg = SparkSearchEngine.from_index_dir(
        spark, out_dir, _mini_schema(), serve="segments"
    )
    assert seg._phrase_use_index() is True
    got = sorted(r["doc_id"] for r in seg.search_df('"spark table"').collect())
    assert got == sorted(range(30))


# ------------------------------------------------------------- simhash auto


def test_simhash_auto_hint_never_counts(spark, mini_docs, monkeypatch):
    """With an n_docs hint the auto path must not run ANY count action
    while building the plan (the r03 advice: a full df.count() per call)."""
    from pyspark.sql import DataFrame

    def boom(self):
        raise AssertionError("count() called during simhash auto planning")

    monkeypatch.setattr(DataFrame, "count", boom)
    df = dedup.simhash_pairs(
        mini_docs, "text", max_hamming=6, scheme="auto", n_docs=40
    )
    monkeypatch.undo()
    hinted = sorted((r["a_id"], r["b_id"]) for r in df.collect())
    single = sorted(
        (r["a_id"], r["b_id"])
        for r in dedup.simhash_pairs(
            mini_docs, "text", max_hamming=6, scheme="single"
        ).collect()
    )
    assert hinted == single


def test_simhash_auto_deferred_equals_both_schemes(spark, mini_docs):
    auto = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in dedup.simhash_pairs(
            mini_docs, "text", max_hamming=6, scheme="auto"
        ).collect()
    )
    pairs = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in dedup.simhash_pairs(
            mini_docs, "text", max_hamming=6, scheme="pairs"
        ).collect()
    )
    single = sorted(
        (r["a_id"], r["b_id"], r["hamming"])
        for r in dedup.simhash_pairs(
            mini_docs, "text", max_hamming=6, scheme="single"
        ).collect()
    )
    assert auto == pairs == single


# ------------------------------------------------------------ postings guard


def test_segment_postings_guard(spark, mini_docs, tmp_path):
    import os
    import shutil

    from phphinder_spark.index.manifest import build_resumable_index

    out_dir = str(tmp_path / "r4guard")
    build_resumable_index(spark, mini_docs, _mini_schema(), out_dir, n_chunks=2)
    shutil.rmtree(os.path.join(out_dir, "postings"))
    seg = SparkSearchEngine.from_index_dir(
        spark, out_dir, _mini_schema(), serve="segments"
    )
    # direct access warns — the full-decode invariant is structural now
    with pytest.warns(RuntimeWarning, match="segment store"):
        _ = seg.index.postings
    # engine query paths never trip the guard (cold serving = no full decode)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        seg.search_topk_bm25("spark table", k=5, field="text").collect()
        seg.search_df("spark").collect()
        seg.search_df('"spark table"').collect()
        seg.search_topk_bm25_many(["spark table"], k=3, field="text").collect()
        seg.find_docs_by_index("spark")


# ----------------------------------------------------------------- ivf plan


def test_ivf_assignment_has_no_corpus_window_shuffle(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (int(i), [float(x) for x in rng.randn(8)], int(i % 3)) for i in range(120)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label long"
    )
    queries = (
        emb.orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    out = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the ONLY window left is the final per-query rank; assignment must be
    # a projection (array_max over centroid literals), never a vec_id window
    assert "windowspecdefinition(vec_id" not in plan
    # and it still agrees with brute force on the probed recall contract:
    # every returned row must be the true cosine (verified by rank-1 self)
    top1 = {r["query_id"]: r["vec_id"] for r in out.collect() if r["rank"] == 1}
    assert all(q == v for q, v in top1.items())  # self is always nearest


def test_ivf_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.ivf_topk(emb, emb.select(F.col("vec_id").alias("query_id"), "embedding"))
    assert out.count() == 0


# ------------------------------------------------------- connected components


def test_connected_components_chain_and_singletons(spark):
    """A 5-node chain (diameter 4 — forces multiple propagation rounds),
    a 2-cycle, and corpus singletons."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 10)],
        "a_id long, b_id long",
    )
    comp = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 7, 10, 11]], "doc_id long")
    out = {
        (r["doc_id"], r["cluster_id"], r["is_dup"])
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert (7, 7, False) in out  # singleton keeps itself
    assert (5, 1, True) in out
    assert (1, 1, False) in out
    keepers = {d for d, c, dup in out if not dup}
    assert keepers == {1, 7, 10}


def test_connected_components_empty_pairs(spark):
    pairs = spark.createDataFrame([], "a_id long, b_id long")
    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    out = sorted(
        (r["doc_id"], r["cluster_id"], r["is_dup"])
        for r in dedup.dedup_clusters(docs, pairs).collect()
    )
    assert out == [(1, 1, False), (2, 2, False)]


# ----------------------------------------------------- infix n-gram probe


@pytest.mark.parametrize("phrase", ["ark", "a", "park", "zzz", "spar"])
def test_single_token_phrase_infix_probe_equals_scan(spark, mini_docs, phrase):
    """Forced-index single-token phrases route through the bigram infix
    probe (len>=2) or the dictionary scan (1-char) — results must equal
    the plain contains scan either way."""
    idx_eng = SparkSearchEngine(spark, _mini_schema(), phrase_strategy="index")
    idx_eng.index_dataframe(mini_docs)
    scan_eng = SparkSearchEngine(spark, _mini_schema(), phrase_strategy="scan")
    scan_eng.index_dataframe(mini_docs)
    a = sorted(r["doc_id"] for r in idx_eng.search_df(f'"{phrase}"').collect())
    b = sorted(r["doc_id"] for r in scan_eng.search_df(f'"{phrase}"').collect())
    assert a == b, phrase


def test_infix_candidate_terms_lossless(spark):
    from phphinder_spark.index.typo_ngram import (
        build_ngram_index,
        infix_candidate_terms,
    )

    dict_df = spark.createDataFrame(
        [("text", t) for t in
         ["spark", "sparkle", "parka", "ark", "arc", "karaoke", "kayak"]],
        "field string, term string",
    )
    idx = build_ngram_index(dict_df)
    got = {
        r["term"]
        for r in infix_candidate_terms(idx, "ark", ["text"]).collect()
    }
    assert got == {"spark", "sparkle", "parka", "ark"}


# ------------------------------------------------------------- gopher rules


def test_gopher_quality_rules(spark):
    from phphinder_spark.ops import textstats

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over lazy dogs and cats with " * 5),
            (2, ""),                           # empty: every rule fails
            (3, "zzzz " * 60),                 # no stopwords, repetitive
            (4, "1 2 3 4 5 6 7 8 9 10 " * 6),  # numeric words: alpha rule fails
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           textstats.gopher_quality(docs, min_words=20).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[2]["gopher_pass"] is False and out[2]["n_words"] == 0
    assert out[3]["ok_stopwords"] is False
    assert out[4]["ok_alpha_words"] is False and out[4]["ok_stopwords"] is False


# ------------------------------------------------------------ pii + repeat


def test_pii_scrub_redacts_and_counts(spark):
    from phphinder_spark.ops import textstats

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or bob@corp.io thanks"),
            (2, "server 10.0.255.3 and 192.168.1.12 are up"),
            (3, "call +1 (415) 555-0199 today"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in textstats.pii_scrub(docs).collect()}
    assert out[1]["n_email"] == 2 and "@" not in out[1]["scrubbed"]
    assert "<EMAIL>" in out[1]["scrubbed"]
    assert out[2]["n_ipv4"] == 2 and "<IPV4>" in out[2]["scrubbed"]
    assert out[3]["n_phone"] == 1 and "<PHONE>" in out[3]["scrubbed"]
    assert out[4]["scrubbed"] == "nothing sensitive here"
    assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_phone"] == 0


def test_repetition_stats_values(spark):
    from phphinder_spark.ops import textstats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab -> all dup, top=3/5
            (2, "u v w x y"),     # 4 distinct bigrams, no dups
            (3, "one"),           # no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           textstats.repetition_stats(docs).collect()}
    assert out[1]["n_bigrams"] == 5 and out[1]["dup_bigram_frac"] == 1.0
    assert out[1]["top_bigram_frac"] == 0.6
    assert out[2]["dup_bigram_frac"] == 0.0 and out[2]["top_bigram_frac"] == 0.25
    assert out[3]["n_bigrams"] == 0 and out[3]["dup_bigram_frac"] == 0.0


# --------------------------------------------------------- composed pipeline


def test_clean_corpus_composition(spark):
    """Quality reject, near-dup drop (transitively), PII scrub and keeper
    selection all interact correctly in one call."""
    from phphinder_spark.ops import pipeline

    good = "the quick brown fox jumps over lazy dogs and cats with style "
    docs = spark.createDataFrame(
        [
            (1, good * 4),                          # keeper
            (2, good * 4),                          # exact dup of 1 -> dropped
            (3, good * 4 + "extra tail words here"),  # near-dup of 1 -> dropped
            (4, "short"),                           # quality reject
            (5, "please mail bob@x.io to be kept with all of that and have "
                "the other note sent to the same address again and again "
                "so that the word count clears the gate easily today "
                "with more than enough words to pass the length rule"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pipeline.clean_corpus(
        docs, jaccard_threshold=0.5, min_words=20, min_stop_hits=2
    ).collect()}
    assert set(out) == {1, 5}
    assert out[1]["cluster_id"] == 1
    assert "<EMAIL>" in out[5]["scrubbed"] and "bob@x.io" not in out[5]["scrubbed"]


# -------------------------------------------------------------------- dbal


def test_mariadb_quotes_backslashes():
    from phphinder_spark.index.dbal import upsert_batch_sql

    sql = upsert_batch_sql(
        "mariadb", "t", ["k", "v"], [{"k": 1, "v": "a\\"}]
    )
    assert "'a\\\\'" in sql
    # sqlite/postgres/duckdb drivers treat backslash literally — unchanged
    sql2 = upsert_batch_sql("sqlite", "t", ["k", "v"], [{"k": 1, "v": "a\\"}])
    assert "'a\\'" in sql2
