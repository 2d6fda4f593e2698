"""Round-7 expansion ops: C4 quality filter, per-doc chunking,
cross-doc boilerplate line removal, deterministic split assignment."""

import datetime as dt

import pytest

from pyspark.sql import functions as F

from phphinder_spark.ops.dedup import remove_boilerplate_lines
from phphinder_spark.ops.packing import chunk_documents
from phphinder_spark.ops.sampling import assign_splits, deterministic_sample
from phphinder_spark.ops.textstats import c4_quality_filter


# ---------------------------------------------------------------- C4


def test_c4_rules(spark):
    rows = [
        # 3 proper sentences -> kept intact
        (1, "This is a good long sentence here.\n"
            "Another proper full sentence follows right here.\n"
            "And a third complete sentence ends the doc."),
        # short line, unterminated line, javascript banner: only one
        # line survives -> doc dropped (min_lines=3)
        (2, "short line.\n"
            "no punct at the end of this one\n"
            "Please enable javascript to view this page.\n"
            "Only one good long sentence survives in here."),
        # lorem ipsum -> doc dropped even with 3 surviving lines
        (3, "Lorem ipsum dolor sit amet something something here.\n"
            "A second full sentence right here for counting.\n"
            "A third full sentence right here for counting."),
        # curly brace -> doc dropped; the brace LINE also fails min-words
        (4, "function f() { return 1; }\n"
            "A second full sentence right here for counting.\n"
            "A third full sentence right here for counting too."),
        (5, ""),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in c4_quality_filter(df).collect()}
    assert (out[1].n_lines, out[1].n_kept_lines, out[1].keep) == (3, 3, True)
    assert out[1].clean_text == rows[0][1]
    assert (out[2].n_lines, out[2].n_kept_lines, out[2].keep) == (4, 1, False)
    assert out[2].clean_text == "Only one good long sentence survives in here."
    assert not out[3].keep and out[3].n_kept_lines == 3  # lorem ipsum
    assert not out[4].keep and out[4].n_kept_lines == 2  # brace
    assert (out[5].n_lines, out[5].n_kept_lines, out[5].keep) == (0, 0, False)
    assert out[5].clean_text == ""
    assert (out[6].n_lines, out[6].n_kept_lines, out[6].keep) == (0, 0, False)
    assert out[6].clean_text is None


def test_c4_relaxed_punct(spark):
    # padded whitespace around the line break must be trimmed away
    df = spark.createDataFrame(
        [(1, "five words right here now \n four words right here")],
        "doc_id long, text string",
    )
    r = c4_quality_filter(
        df, min_words_per_line=5, min_lines=1, require_terminal_punct=False
    ).collect()[0]
    assert (r.n_lines, r.n_kept_lines, r.keep) == (2, 1, True)
    assert r.clean_text == "five words right here now"


# ---------------------------------------------------------- chunking


def test_chunk_documents_disjoint_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "x y"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens)
        for r in chunk_documents(df, 4).collect()
    )
    assert got == [
        (1, 0, "a b c d", 4),
        (1, 1, "e f g h", 4),
        (1, 2, "i j", 2),
        (2, 0, "x y", 2),
    ]
    over = sorted(
        (r.doc_id, r.chunk_id, r.chunk_text)
        for r in chunk_documents(df, 4, stride=2).collect()
        if r.doc_id == 1
    )
    assert [c for _, _, c in over] == [
        "a b c d", "c d e f", "e f g h", "g h i j", "i j",
    ]
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, 0)
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, 4, stride=0)


def test_chunk_documents_covers_tokens(spark):
    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}t{j}" for j in range(i))) for i in range(1, 9)],
        "doc_id long, text string",
    )
    chunks = chunk_documents(df, 3).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text))
    for i in range(1, 9):
        toks = " ".join(
            c for _, c in sorted(by_doc.get(i, []))
        ).split()
        assert toks == [f"w{i}t{j}" for j in range(i)]


# -------------------------------------------------------- boilerplate


def test_remove_boilerplate_lines(spark):
    rows = [
        (1, "cookie banner\nunique alpha\ncookie banner\nnav menu"),
        (2, "nav menu\nunique beta"),
        (3, "cookie banner"),
        (4, "only unique gamma\nanother unique"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(df, 2).collect()}
    # hot across >= 2 DISTINCT docs removed everywhere (incl. repeats
    # inside one doc); within-doc repetition alone does not qualify
    assert (out[1].text, out[1].n_lines, out[1].n_kept) == ("unique alpha", 4, 1)
    assert out[2].text == "unique beta"
    assert (out[3].text, out[3].n_kept) == ("", 0)
    assert out[4].text == "only unique gamma\nanother unique"
    assert (out[5].text, out[5].n_lines) == ("", 0)
    # min_docs=3: nothing is hot
    intact = {r.doc_id: r for r in remove_boilerplate_lines(df, 3).collect()}
    assert intact[2].text == "nav menu\nunique beta"
    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(df, 0)


def test_remove_boilerplate_hash_key_equivalence(spark):
    docs = spark.createDataFrame(
        [
            (i, "\n".join(
                ["shared header line"] +
                [f"body {i} piece {j}" for j in range(i % 4)] +
                (["shared footer line"] if i % 2 == 0 else [])
            ))
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    a = sorted(tuple(r) for r in remove_boilerplate_lines(docs, 2).collect())
    b = sorted(
        tuple(r)
        for r in remove_boilerplate_lines(docs, 2, hash_key=True).collect()
    )
    assert a == b
    # the hash form's exchanges carry xxhash64 longs, never line bodies:
    # every hashpartitioning on the line key is the hashed long column
    # (suffix L in the simple plan string)
    import re as _re

    df = remove_boilerplate_lines(docs, 2, hash_key=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    line_keys = _re.findall(r"hashpartitioning\(line#\d+(L?)", plan)
    assert line_keys and all(sfx == "L" for sfx in line_keys)
    assert "xxhash64" in plan


# -------------------------------------------------------------- splits


def test_assign_splits(spark):
    df = spark.range(4000).withColumnRenamed("id", "doc_id")
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = assign_splits(df, fr)
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == 4000
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 4000 - 0.8) < 0.05
    # prefix-range stability: the train bucket IS the deterministic
    # 0.8 sample under the same salt (adding docs never reshuffles)
    tr = {r.doc_id for r in out.where("split = 'train'").collect()}
    ds = {
        r.doc_id
        for r in deterministic_sample(df, 0.8, salt="phphinder-split").collect()
    }
    assert tr == ds
    # pure function of (salt, key): replays identically
    again = assign_splits(df, fr)
    assert out.exceptAll(again).isEmpty() and again.exceptAll(out).isEmpty()
    # growing the corpus never moves an existing row between splits
    bigger = assign_splits(
        spark.range(8000).withColumnRenamed("id", "doc_id"), fr
    ).where("doc_id < 4000")
    assert out.exceptAll(bigger).isEmpty()


def test_assign_splits_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(df, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match=">= 0"):
        assign_splits(df, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="at least one"):
        assign_splits(df, {})
    # single bucket: everything lands there
    one = assign_splits(df, {"all": 1.0})
    assert one.where("split <> 'all'").isEmpty()


def test_new_map_only_ops_have_no_exchange(spark):
    """chunk_documents / assign_splits / c4_quality_filter are pure
    map-side projections: zero exchanges, zero joins, no Python in the
    plan — the property that makes them free at 100 TB."""
    df = spark.createDataFrame(
        [(i, f"some text body number {i} with words") for i in range(50)],
        "doc_id long, text string",
    )
    plans = {
        "chunks": chunk_documents(df, 8, stride=4),
        "splits": assign_splits(df, {"train": 0.9, "val": 0.1}),
        "c4": c4_quality_filter(df, require_terminal_punct=False),
    }
    for name, out in plans.items():
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, name
        assert "Join" not in plan, name
        assert "Python" not in plan and "ArrowEval" not in plan, name


# ------------------------------------------------------ ingest pipeline


def test_ingest_increment(spark):
    from phphinder_spark.ops.pipeline import ingest_increment

    base = ("the quick brown fox jumps over the lazy dog while many "
            "other animals watch the scene from their warm burrows "
            "under the old oak tree near the river")
    ref = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )
    twin = base.replace("river", "creek")
    new = spark.createDataFrame(
        [
            (1, base),          # exact archive dup -> dropped
            (2, twin),          # within-increment pair with 3
            (3, twin),          # exact dup of 2 -> cluster rep = 2
            (4, "short junk"),  # fails gopher min_words
            (5, "the tall grey heron waits beside the quiet pond "
                "watching small silver fish move slowly between green "
                "reeds while evening light settles over the water"),
        ],
        "doc_id long, text string",
    )
    # the twin's exact shingle Jaccard vs base is 0.926 — below the
    # 0.95 archive gate here, so it is admitted and deduped WITHIN the
    # increment (at 0.9 it would be an archive near-dup and dropped)
    got = {
        r.doc_id: r
        for r in ingest_increment(
            new, ref, against_threshold=0.95, min_words=20, min_stop_hits=1
        ).collect()
    }
    # doc 1 dropped by the archive pass, 3 by within-increment dedup,
    # 4 by quality; 2 survives as its own cluster representative even
    # though its exact twin 3 was also in the increment
    assert set(got) == {2, 5}
    assert got[2].cluster_id == 2
    # archive-dup removal happens FIRST: with doc 1 dropped before the
    # within-increment dedup, doc 2's cluster excludes 1
    assert got[2].scrubbed == twin


# --------------------------------------------------------------- BPE


def _ref_bpe_train(texts, n_merges, end_marker="</w>"):
    """Reference Sennrich-style trainer: dict word counts, argmax pair
    (count desc, a asc, b asc), left-to-right non-overlapping merge."""
    import collections
    import re

    wc = collections.Counter(
        w for t in texts for w in re.split(r"\W+", t.lower()) if w
    )
    vocab = {tuple(list(w) + [end_marker]): c for w, c in wc.items()}
    merges = []
    for step in range(n_merges):
        pc = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def test_train_bpe_matches_reference(spark):
    from phphinder_spark.ops.textstats import train_bpe

    texts = [
        "the cat sat on the mat with another cat",
        "that hat is the best hat that the rat ever had",
        "low lower lowest newer newest wider wide widest",
        "aaa aaaa aa a banana bandana",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.a, r.b, r["count"])
        for r in train_bpe(df, 12).orderBy("step").collect()
    ]
    assert got == _ref_bpe_train(texts, 12)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe(df, 0)


def test_train_bpe_overlapping_pairs(spark):
    """Runs like 'aaaa' merge left-to-right non-overlapping: (a,a)
    count is 3*freq per 'aaaa'... the engine must agree with the
    reference on every repeated-symbol case."""
    from phphinder_spark.ops.textstats import train_bpe

    texts = ["aaaa aaa aa aaaaa", "abab ababab ba"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.step, r.a, r.b, r["count"])
        for r in train_bpe(df, 8).orderBy("step").collect()
    ]
    assert got == _ref_bpe_train(texts, 8)


def test_apply_bpe_roundtrip(spark):
    from phphinder_spark.ops.textstats import apply_bpe, train_bpe

    texts = [
        "the cat sat on the mat with another cat",
        "that hat is the best hat that the rat ever had",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = train_bpe(df, 30)
    out = {r.doc_id: r for r in apply_bpe(df, merges).collect()}
    # 'the' recurs 5x across 19 words: trained to 30 merges it must
    # have become a single symbol
    assert "the</w>" in out[0].bpe_tokens
    # every doc's symbols re-join to its original words
    for i, t in enumerate(texts):
        words = t.split()
        rejoined = "".join(out[i].bpe_tokens).replace("</w>", " ").split()
        assert rejoined == words
        assert out[i].n_bpe_tokens == len(out[i].bpe_tokens)
    # NULL text -> NULL tokens, 0 count
    nl = apply_bpe(
        spark.createDataFrame([(9, None)], "doc_id long, text string"),
        merges,
    ).collect()[0]
    assert nl.bpe_tokens is None and nl.n_bpe_tokens == 0


def test_apply_bpe_matches_training_tokenization_non_ascii(spark):
    """Encoding must tokenize exactly like training: train_bpe uses the
    JVM \\W+ (ASCII word chars — accents split), so apply_bpe must use
    re.ASCII. With the Unicode default, trained merges never fire on
    accented words and separators leak into the symbol stream."""
    from phphinder_spark.ops.textstats import apply_bpe, train_bpe

    df = spark.createDataFrame(
        [(1, "café café café au lait")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, n_merges=4)
    out = apply_bpe(df, merges).first()
    # the JVM tokenizer saw 'caf' (accent split off); four merges fully
    # collapse it, and the accent NEVER appears as an output symbol
    assert "caf</w>" in out.bpe_tokens
    assert all("é" not in t for t in out.bpe_tokens)


def test_apply_bpe_preserves_string_id_type(spark):
    from phphinder_spark.ops.textstats import apply_bpe

    df = spark.createDataFrame(
        [("src/a.py", "aa ab aa")], "path string, text string"
    )
    out = apply_bpe(df, [("a", "a</w>")], id_col="path")
    r = out.first()
    assert r.path == "src/a.py" and r.n_bpe_tokens > 0


def test_window_counts_excludes_null_ts(spark):
    from phphinder_spark.ops.events import rate_anomalies, window_counts

    rows = [
        (0, None, 1, "x", 1.0),
        (1, dt.datetime(2024, 1, 1, 0, 30), 1, "x", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = window_counts(df, window_minutes=60.0).collect()
    assert len(out) == 1 and out[0].n_events == 1
    # and the phantom NULL bucket cannot seed a trailing baseline
    ra = rate_anomalies(df, window_minutes=60.0, trailing=1).collect()
    assert len(ra) == 1 and ra[0].base_mean == -1.0
