"""Round-7 punch-list pins (VERDICT r6 + ADVICE r6):

1. the benchmark-gram guard count is paid once per benchmark ARTIFACT —
   repeated decontamination calls over the same frame (and prepared
   BenchmarkGrams artifacts) skip the count job;
2. BenchmarkGrams carries an n/col contract that mismatched calls trip;
3. KVStorage's oversized-batch guard fails fast BEFORE the postings
   frame materializes (lazy checkpoint + bounded limit-probe);
4. connected_components evaluates the upstream pairs DAG exactly once
   (the self-loop probe reads the checkpointed symmetrized frame);
5. duplicate_spans' hot-set prune keeps the flag output identical.
"""

import itertools

import pytest
from pyspark.sql import functions as F


def _jobs_for(spark, fn) -> int:
    sc = spark.sparkContext
    group = f"r7jobs-{next(_jobs_for._seq)}"
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, "job-count probe")
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    return len(sc.statusTracker().getJobIdsForGroup(group))


_jobs_for._seq = itertools.count()


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"alpha beta gamma delta number{i} epsilon zeta eta theta")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------ benchmark-gram guard caching


def test_bench_gram_guard_counts_once_per_frame(spark, docs):
    """Two ngram_contamination calls over the SAME benchmark DataFrame
    object: the second must launch strictly fewer jobs than the first
    (the guard's distinct-gram count job ran only once)."""
    from phphinder_spark.ops.textstats import ngram_contamination

    bench = docs.where("doc_id % 7 = 0")

    def run():
        ngram_contamination(docs, bench, n=3).count()

    first = _jobs_for(spark, run)
    second = _jobs_for(spark, run)
    assert second < first


def test_prepared_benchmark_grams_reuse_and_contract(spark, docs):
    from phphinder_spark.ops.textstats import (
        ngram_contamination,
        prepare_benchmark_grams,
        remove_contaminated_spans,
    )

    bench = docs.where("doc_id % 7 = 0")
    art = prepare_benchmark_grams(bench, n=3)
    assert art.n == 3 and art.n_grams > 0

    # artifact result == raw-frame result, for both consumers
    via_art = sorted(
        map(tuple, ngram_contamination(docs, art, n=3).collect())
    )
    via_df = sorted(
        map(tuple, ngram_contamination(docs, bench, n=3).collect())
    )
    assert via_art == via_df
    cut_art = sorted(
        map(tuple, remove_contaminated_spans(docs, art, n=3).collect())
    )
    cut_df = sorted(
        map(tuple, remove_contaminated_spans(docs, bench, n=3).collect())
    )
    assert cut_art == cut_df

    # the artifact path launches no guard count job beyond the query's own
    def run_art():
        ngram_contamination(docs, art, n=3).count()

    def run_fresh():
        # a FRESH benchmark object pays the guard once
        fresh = docs.where("doc_id % 7 = 0")
        ngram_contamination(docs, fresh, n=3).count()

    assert _jobs_for(spark, run_art) < _jobs_for(spark, run_fresh)

    # n/col contract: a mismatched call must not silently probe with the
    # wrong gram length
    with pytest.raises(ValueError, match="prepared with n=3"):
        ngram_contamination(docs, art, n=8)


def test_guard_still_trips_on_oversized_benchmark(spark, docs, monkeypatch):
    import phphinder_spark.ops.textstats as ts

    monkeypatch.setattr(ts, "_MAX_BENCH_GRAM_ROWS", 2)
    with pytest.raises(ValueError, match="corpus-vs-corpus"):
        ts.prepare_benchmark_grams(docs, n=3)


# ------------------------------------------ KV commit guard fail-fast


def test_kv_guard_trips_before_postings_materialize(spark, tmp_path, monkeypatch):
    """The postings-side cap must trip WITHOUT evaluating every postings
    partition: a poisoned partition past the probe's budget never runs."""
    from phphinder_spark.index.storage import KVStorage

    docs = spark.createDataFrame([(1, "hello")], "doc_id long, text string")

    def poison(it):
        for pdf in it:
            if len(pdf) and int(pdf["doc_id"].iloc[0]) >= 10_000:
                raise RuntimeError("poisoned tail partition was evaluated")
            yield pdf

    big = (
        spark.range(0, 20_000, 1, 64)
        .select(
            F.lit("text").alias("field"),
            F.concat(F.lit("t"), F.col("id")).alias("term"),
            F.col("id").alias("doc_id"),
            F.lit(1).cast("long").alias("tf"),
            F.array().cast("array<int>").alias("positions"),
        )
        .mapInPandas(
            poison,
            "field string, term string, doc_id long, tf long, positions array<int>",
        )
    )
    store = KVStorage(spark, str(tmp_path / "kv7"))
    monkeypatch.setattr(KVStorage, "_MAX_COMMIT_ROWS", 100)
    # the guard must raise the size error, not the poison (which would
    # prove full materialization happened before the check)
    with pytest.raises(ValueError, match="ParquetSnapshotStorage"):
        store.commit(docs, big, [])


# ------------------------------------------ CC single-evaluation contract


def test_cc_evaluates_pairs_dag_once(spark):
    """The pairs plan runs exactly once: a counting accumulator inside
    the pairs DAG must show each input row touched once, self-loops
    included in the probe."""
    from phphinder_spark.ops.dedup import connected_components

    acc = spark.sparkContext.accumulator(0)

    def tick(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 7), (9, 9)], "a_id long, b_id long"
    ).mapInPandas(tick, "a_id long, b_id long")
    out = {r["id"]: r["cluster_id"]
           for r in connected_components(base).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 9: 9}
    assert acc.value == 4


def test_cc_no_self_pairs_still_single_pass(spark):
    from phphinder_spark.ops.dedup import connected_components

    acc = spark.sparkContext.accumulator(0)

    def tick(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    base = spark.createDataFrame(
        [(1, 2), (3, 4)], "a_id long, b_id long"
    ).mapInPandas(tick, "a_id long, b_id long")
    out = {r["id"]: r["cluster_id"]
           for r in connected_components(base).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 3}
    assert acc.value == 2


# ------------------------------------------ pipeline surgical decontam


def test_clean_corpus_cut_mode(spark):
    """decontam_mode='cut': the keeper set is drop-mode's set WITHOUT the
    contamination drop (dedup + quality only), and contaminated keepers
    survive with benchmark-overlapping spans cut from their scrubbed
    text; clean docs keep their full (token-normalized) text."""
    from phphinder_spark.ops.pipeline import clean_corpus
    from phphinder_spark.ops.textstats import remove_contaminated_spans

    base = ("the quick brown fox jumps over the lazy dog and then "
            "rests under a tree with calm easy grace for hours")
    rows = [
        (1, base + " unique tail one"),
        (2, base + " unique tail two secret bench marker phrase here yes"),
        (3, "completely different words compose this document about the "
            "weather and other mundane topics of the day indeed truly"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(99, "secret bench marker phrase")], "doc_id long, text string"
    )
    got = {r.doc_id: r.scrubbed for r in clean_corpus(
        docs, min_words=5, min_stop_hits=1, jaccard_threshold=0.9,
        benchmark=bench, decontam_n=3, decontam_mode="cut",
    ).collect()}
    drop = {r.doc_id for r in clean_corpus(
        docs, min_words=5, min_stop_hits=1, jaccard_threshold=0.9,
        benchmark=bench, decontam_n=3, decontam_mode="drop",
    ).collect()}
    # doc 2 is contaminated: dropped by drop-mode, KEPT (cut) by cut-mode
    assert 2 in got and 2 not in drop
    assert "secret" not in got[2] and "marker" not in got[2]
    assert got[2].startswith("the quick brown fox")
    # clean docs keep every token (token-normalized join)
    assert got[3].startswith("completely different words")
    # cut text matches the op applied directly to the scrubbed text
    direct = {r.doc_id: r.cleaned for r in remove_contaminated_spans(
        docs, bench, n=3).collect()}
    assert got[2] == direct[2]

    with pytest.raises(ValueError, match="decontam_mode"):
        clean_corpus(docs, benchmark=bench, decontam_mode="purge")


# ------------------------------------------ duplicate_spans hot prune


def test_duplicate_spans_hot_prune_same_flags(spark):
    """The pruned-join rewrite must emit the identical per-doc flags as
    the definitional form (join against unpruned counts, flag-sum)."""
    from phphinder_spark.ops.textstats import _word_ngrams, duplicate_spans

    rows = [
        (1, "one two three four five six seven"),
        (2, "one two three four nine ten eleven"),
        (3, "totally different words here entirely now yes"),
        (4, None),
        (5, "one two three four five six seven"),  # exact dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_ratio, r.has_dup)
           for r in duplicate_spans(docs, n=4, min_count=2).collect()}

    # definitional replay: unpruned counts + flag sum
    grams = _word_ngrams("text", 4)
    spans = docs.select("doc_id", F.explode(grams).alias("g"))
    counts = spans.groupBy("g").agg(F.count("*").alias("c"))
    ref_dup = {
        r.doc_id: r.n
        for r in spans.join(counts, "g")
        .groupBy("doc_id")
        .agg(F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).alias("n"))
        .collect()
    }
    for doc_id, (n_spans, n_dup, _, has_dup) in got.items():
        assert n_dup == ref_dup.get(doc_id, 0)
        assert has_dup == (n_dup > 0)
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[4] == (0, 0, 0.0, False)


# ------------------------------------------ new ops: tfidf / bpe / strat


def test_tfidf_keywords_hand_math(spark):
    from phphinder_spark.ops.textstats import tfidf_keywords
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "durian durian durian apple"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = tfidf_keywords(docs, k=2)
    rows = {(r.doc_id, r.rank): (r.token, r.tf, r.df, r.score)
            for r in out.collect()}
    n = 3  # NULL doc excluded from N
    def s(tf, df):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1), 6)
    # doc 1: apple tf2 df2 -> 2*(ln(4/3)+1); banana tf1 df2; cherry tf1 df2
    assert rows[(1, 1)] == ("apple", 2, 2, s(2, 2))
    # banana/cherry tie on score -> token asc
    assert rows[(1, 2)][0] == "banana"
    # doc 3: durian tf3 df1 beats apple
    assert rows[(3, 1)] == ("durian", 3, 1, s(3, 1))
    assert rows[(3, 2)][0] == "apple"
    # k bound respected; NULL doc contributes nothing
    assert {d for d, _ in rows} == {1, 2, 3}
    assert max(r for _, r in rows) == 2
    with pytest.raises(ValueError, match="k must be"):
        tfidf_keywords(docs, k=0)


def test_bpe_pair_counts_hand_math(spark):
    from phphinder_spark.ops.textstats import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "low low lower")], "doc_id long, text string"
    )
    got = {(r.a, r.b): r["count"] for r in bpe_pair_counts(docs).collect()}
    assert got == {
        ("l", "o"): 3, ("o", "w"): 3, ("w", "</w>"): 2,
        ("w", "e"): 1, ("e", "r"): 1, ("r", "</w>"): 1,
    }
    top = bpe_pair_counts(docs, k=2).collect()
    # count desc, then (a, b) asc: (l,o) before (o,w)
    assert [(r.a, r.b, r["count"]) for r in top] == [
        ("l", "o", 3), ("o", "w", 3)
    ]
    assert {(r.a, r.b) for r in
            bpe_pair_counts(docs, min_count=2).collect()} == {
        ("l", "o"), ("o", "w"), ("w", "</w>")
    }


def test_stratified_sample_exact_k_and_brute_force_parity(spark):
    from phphinder_spark.ops.sampling import _hash_prefix, stratified_sample
    from pyspark.sql import Window

    rows = [(i, ["en", "de", "fr"][i % 3] if i % 17 else None)
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    for margin in (4, 1):  # margin=1 exercises the widening loop
        out = stratified_sample(docs, 10, margin=margin)
        got = {(r.doc_id, r.lang, r.rank) for r in out.collect()}
        w = Window.partitionBy("lang").orderBy(
            _hash_prefix("doc_id", "phphinder"), F.col("doc_id")
        )
        brute = {
            (r.doc_id, r.lang, r.rank)
            for r in docs.where(F.col("lang").isNotNull())
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .where("rank <= 10").collect()
        }
        assert got == brute
        per_group = {}
        for _, g, _rk in got:
            per_group[g] = per_group.get(g, 0) + 1
        assert per_group == {"en": 10, "de": 10, "fr": 10}
    # small groups return everything they have
    tiny = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "de")], "doc_id long, lang string"
    )
    out = stratified_sample(tiny, 10)
    assert out.count() == 3
    assert {r.rank for r in out.where("lang = 'en'").collect()} == {1, 2}
    with pytest.raises(ValueError, match="k must be"):
        stratified_sample(tiny, 0)


def test_bpe_pairs_plan_topk_and_single_corpus_pass(spark):
    """Top-k must be TakeOrderedAndProject; exactly two combining
    aggregates' exchanges (word key, pair key) — the corpus is never
    re-scanned for the pair explode (it runs over the distinct words)."""
    import re as _re

    from phphinder_spark.ops.textstats import bpe_pair_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = bpe_pair_counts(docs, k=50)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    tree = plan.split("\n\n")[0]
    assert len(_re.findall(r"Exchange \(\d+\)", tree)) == 2
    # one scan of the documents parquet only
    assert tree.count("Scan parquet") == 1


def test_stratified_sample_window_only_on_survivors(spark):
    """The per-group window's input must be the threshold-FILTERED frame
    (checkpoint scan), never the raw corpus: no full-corpus sort feeds
    Window."""
    from phphinder_spark.ops.sampling import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = stratified_sample(docs, 5, group_col="lang")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the plan reads the checkpointed survivor RDD, not the parquet
    assert "Scan ExistingRDD" in plan or "Scan parquet" not in plan
    assert "Window" in plan


def test_dedup_against_cross_corpus(spark):
    """Incremental-crawl dedup: exact text match flags is_exact_dup,
    LSH+verify flags near-dups with the best reference match, unique
    docs pass clean; the comparison is strictly NEW x REFERENCE."""
    from phphinder_spark.ops.dedup import dedup_against

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    ref = spark.createDataFrame(
        [(100, base), (101, "totally different reference content here "
                            "about nothing in particular at all")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                        # exact dup of ref 100
            (2, base.replace("kappa", "KAPPA-PRIME")),  # near dup
            (3, "completely novel words that no reference document "
                "shares in any shingle whatsoever today"),
            # near-dup of BOTH ref docs impossible here; uniqueness test
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_against(new, ref, threshold=0.5).collect()}
    assert out[1].is_exact_dup and out[1].is_dup
    assert out[1].best_ref_id == 100 and out[1].best_jaccard == 1.0
    assert not out[2].is_exact_dup and out[2].is_dup
    assert out[2].best_ref_id == 100 and 0.5 <= out[2].best_jaccard < 1.0
    assert not out[3].is_dup
    assert out[3].best_ref_id == -1 and out[3].best_jaccard == 0.0
    assert set(out) == {1, 2, 3}
    # two identical NEW docs must NOT flag each other (cross-only):
    within = spark.createDataFrame(
        [(1, "same text repeated here five words more padding tokens"),
         (2, "same text repeated here five words more padding tokens")],
        "doc_id long, text string",
    )
    clean_ref = spark.createDataFrame(
        [(9, "unrelated reference body entirely different vocabulary "
             "nothing shared")],
        "doc_id long, text string",
    )
    res = dedup_against(within, clean_ref, threshold=0.5)
    assert all(not r.is_dup for r in res.collect())


def test_corpus_divergence_hand_math(spark):
    import math

    from phphinder_spark.ops.textstats import corpus_divergence

    a = spark.createDataFrame([(1, "x x y")], "doc_id long, text string")
    b = spark.createDataFrame([(1, "x y y y")], "doc_id long, text string")
    r = corpus_divergence(a, b).collect()[0]
    # union vocab {x, y}; add-0.5: p = [(2.5)/4, (1.5)/4], q = [(1.5)/5, (3.5)/5]
    p = [2.5 / 4, 1.5 / 4]
    q = [1.5 / 5, 3.5 / 5]
    kl_ab = sum(pi * math.log(pi / qi) for pi, qi in zip(p, q))
    kl_ba = sum(qi * math.log(qi / pi) for pi, qi in zip(p, q))
    js = (sum(pi * math.log(pi / ((pi + qi) / 2)) for pi, qi in zip(p, q))
          + sum(qi * math.log(qi / ((pi + qi) / 2)) for pi, qi in zip(p, q))) / 2
    assert (r.vocab_size, r.n_tokens_a, r.n_tokens_b) == (2, 3, 4)
    assert r.kl_ab == pytest.approx(kl_ab, abs=1e-6)
    assert r.kl_ba == pytest.approx(kl_ba, abs=1e-6)
    assert r.js == pytest.approx(js, abs=1e-6)
    # identical corpora -> all zeros; JS is symmetric and bounded
    same = corpus_divergence(a, a).collect()[0]
    assert (same.kl_ab, same.kl_ba, same.js) == (0.0, 0.0, 0.0)
    assert 0 <= r.js <= math.log(2) + 1e-9
    # empty-vs-empty degrades to the zero row
    empty = a.where("doc_id < 0")
    z = corpus_divergence(empty, empty).collect()[0]
    assert (z.vocab_size, z.kl_ab, z.js) == (0, 0.0, 0.0)
    with pytest.raises(ValueError, match="smoothing"):
        corpus_divergence(a, b, smoothing=0)
