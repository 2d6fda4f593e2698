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
