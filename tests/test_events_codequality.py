"""Tests for ops/events.py (sessionize / session_stats /
window_counts), dedup.split_leakage, and textstats.code_quality."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops.dedup import split_leakage
from phphinder_spark.ops.events import (
    sessionize,
    session_stats,
    window_counts,
)
from phphinder_spark.ops.textstats import code_quality

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(eid, user, minutes, etype="click", value=1.0):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, value)


@pytest.fixture()
def events(spark):
    rows = [
        # user 1: two sessions split by a 45-min silence
        _ev(0, 1, 0.0),
        _ev(1, 1, 10.0),
        _ev(2, 1, 55.0),
        _ev(3, 1, 60.0),
        # user 2: gap EXACTLY 30 min stays in the same session
        _ev(4, 2, 0.0),
        _ev(5, 2, 30.0),
        # user 3: tie timestamps break by event_id
        _ev(7, 3, 0.0),
        _ev(6, 3, 0.0),
        # user 4: single event
        _ev(8, 4, 200.0, value=2.5),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def test_sessionize_golden(events):
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(events, gap_minutes=30.0).collect()
    }
    assert got == {
        (1, 0): 1,
        (1, 1): 1,
        (1, 2): 2,  # 45-min silence > 30 -> new session
        (1, 3): 2,
        (2, 4): 1,
        (2, 5): 1,  # exactly 30 min is NOT > gap
        (3, 6): 1,
        (3, 7): 1,
        (4, 8): 1,
    }


def test_sessionize_infinite_gap_one_session_per_user(events):
    out = sessionize(events, gap_minutes=1e9)
    assert out.where("session_seq != 1").count() == 0


def test_sessionize_zero_gap_every_distinct_ts_new_session(events):
    out = sessionize(events, gap_minutes=0.0)
    u1 = {
        r.event_id: r.session_seq
        for r in out.where("user_id = 1").collect()
    }
    assert u1 == {0: 1, 1: 2, 2: 3, 3: 4}
    # tie timestamps (gap 0 us, not > 0) stay together
    u3 = {r.session_seq for r in out.where("user_id = 3").collect()}
    assert u3 == {1}


def test_session_stats_golden(events):
    rows = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_s, r.total_value)
        for r in session_stats(events, gap_minutes=30.0).collect()
    }
    assert rows[(1, 1)] == (2, 600.0, 2.0)
    assert rows[(1, 2)] == (2, 300.0, 2.0)
    assert rows[(2, 1)] == (2, 1800.0, 2.0)
    assert rows[(4, 1)] == (1, 0.0, 2.5)


def test_window_counts_conserves_totals(events):
    out = window_counts(events, window_minutes=60.0).collect()
    assert sum(r.n_events for r in out) == events.count()
    # all bucket starts align to the hour
    assert all(r.window_start_us % 3_600_000_000 == 0 for r in out)
    # user-4 event at +200min lands in the 180-240min bucket
    t200_bucket = int(T0.timestamp() * 1e6) + 3 * 3_600_000_000
    assert any(r.window_start_us == t200_bucket for r in out)


def test_window_counts_no_group_col(events):
    out = window_counts(events, window_minutes=60.0, by=None)
    assert out.columns == ["window_start_us", "n_events", "total_value"]
    assert sum(r.n_events for r in out.collect()) == events.count()


def test_sessionize_plan_single_exchange(events):
    """The two stacked window frames share (partition, order), so the
    physical plan must contain exactly ONE shuffle (hash by user_id) —
    the scale contract in the module docstring."""
    plan = (
        sessionize(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_window_counts_plan_no_window_no_join(events):
    plan = (
        window_counts(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "Join" not in plan, plan


def test_sessionize_bucketed_equivalence_random(spark):
    """The hot-key-safe bucketed form must assign IDENTICAL session
    numbers to every event, for any bucket width — including widths
    smaller than the gap and events straddling bucket edges. The log is
    a deterministic pseudo-random mix: hashes give irregular gaps, two
    hot users own most events, ties included."""
    rows = []
    eid = 0
    for user in range(1, 6):
        n = 200 if user <= 2 else 25  # users 1-2 are hot
        for i in range(n):
            mins = (i * 7919 + user * 104729) % 5000 / 3.7
            rows.append(_ev(eid, user, mins))
            eid += 1
    rows.append((eid, rows[5][1], 1, "click", 1.0))  # a tie timestamp
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    want = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(ev, gap_minutes=30.0).collect()
    }
    for width in (1.0, 7.3, 30.0, 60.0, 1e6):
        got = {
            (r.user_id, r.event_id): r.session_seq
            for r in sessionize(
                ev, gap_minutes=30.0, hot_bucket_minutes=width
            ).collect()
        }
        assert got == want, f"width={width}"


def test_sessionize_bucketed_exact_gap_at_bucket_edge(spark):
    """A gap EXACTLY equal to the threshold whose two events sit in
    different buckets must still merge (the stitch uses the same > rule
    as the local flags), and a gap one microsecond longer must split."""
    t_edge = 60.0  # minutes; bucket width 30 -> events in buckets 1 and 3
    rows = [
        _ev(0, 1, t_edge - 30.0),   # last event of bucket 1
        _ev(1, 1, t_edge),          # first of bucket 2: gap == 30 min
        _ev(2, 2, t_edge - 30.0),
        (3, T0 + dt.timedelta(minutes=t_edge, microseconds=1), 2,
         "click", 1.0),             # gap == 30 min + 1 us
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    got = {
        (r.user_id, r.event_id): r.session_seq
        for r in sessionize(
            ev, gap_minutes=30.0, hot_bucket_minutes=30.0
        ).collect()
    }
    assert got == {(1, 0): 1, (1, 1): 1, (2, 2): 1, (2, 3): 2}


def test_session_stats_bucketed_equivalence(events):
    plain = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_s, r.total_value)
        for r in session_stats(events, gap_minutes=30.0).collect()
    }
    bucketed = {
        (r.user_id, r.session_seq): (r.n_events, r.duration_s, r.total_value)
        for r in session_stats(
            events, gap_minutes=30.0, hot_bucket_minutes=20.0
        ).collect()
    }
    assert plain == bucketed


def test_sessionize_bucketed_plan_partitions_by_bucket(events):
    """The expensive (corpus-scale) window must hash by (user, bucket),
    not by user alone — the point of the hot-key-safe form."""
    plan = (
        sessionize(events, hot_bucket_minutes=30.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning(user_id" in plan and "_bkt" in plan, plan


def test_stream_sessions_boundary_vs_batch(spark, tmp_path):
    """Spark's native session_window MERGES an event whose gap exactly
    equals the threshold (engine-verified here: merge while next <=
    last + gap), which is identical to batch sessionize's delta > gap
    new-session rule — pin both on the same log so any engine change
    surfaces. Also proves state-store session merging: the events of
    user 1's single session arrive across different micro-batch waves
    (event_id parity split) yet emit as ONE row."""
    from phphinder_spark.streaming.replay import (
        replay_session_stats,
        stage_event_batches,
    )

    rows = [
        _ev(0, 1, 0.0),
        _ev(1, 1, 20.0),   # same session either way (20 < 30)
        _ev(2, 1, 50.0),   # gap EXACTLY 30 min: both engines keep it
        _ev(3, 2, 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    # batch rule: delta > gap — the 30-min gap stays in session 1
    batch = {r.user_id: r.session_seq for r in sessionize(ev).collect()
             if r.user_id == 1}
    assert set(batch.values()) == {1}

    out = str(tmp_path / "waves")
    sch = stage_event_batches(spark, ev, out, n_batches=2)
    got = sorted(
        (r.user_id, r.n_events, r.total_value)
        for r in replay_session_stats(spark, out, sch).collect()
    )
    # same boundary as batch: the exact-30-min event merges -> user 1
    # has ONE session of 3 events, assembled from both waves
    assert got == [(1, 3, 3.0), (2, 1, 1.0)]


def test_split_leakage(spark):
    df = spark.createDataFrame(
        [
            (1, "train", "alpha"),
            (2, "train", "alpha"),   # dup inside train: NOT leakage
            (3, "test", "alpha"),    # leaked, 2 train copies
            (4, "val", "beta"),      # no train copy
            (5, "train", "gamma"),
            (6, "test", "gamma"),    # leaked, 1 train copy
            (7, "test", "delta"),    # unique to test
            (8, "train", None),      # NULL text: matches nothing
            (9, "test", None),       # NULL text: never flagged
        ],
        "doc_id long, split string, text string",
    )
    got = {
        (r.doc_id, r.split): r.n_train_copies
        for r in split_leakage(df).collect()
    }
    assert got == {(3, "test"): 2, (6, "test"): 1}


def test_code_quality_rules(spark):
    minified = "x;" * 300  # one 600-char line
    df = spark.createDataFrame(
        [
            (1, "def f(x):\n    return x + 1\n"),
            (2, minified),
            (3, "\x01\x02!!! ### $$$ %%% ^^^\n&&& ***"),  # low alnum
            (4, "# auto-generated by protoc\ndef g():\n    pass\n"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in code_quality(df, max_line_len=500).collect()}
    assert rows[1].keep is True
    assert rows[1].max_line == 16  # "    return x + 1"
    assert rows[2].keep is False and rows[2].max_line == 600
    assert rows[3].keep is False and rows[3].alnum_frac < 0.25
    assert rows[4].keep is False  # autogen marker
    assert (
        code_quality(df, max_line_len=500, drop_autogenerated=False)
        .where("doc_id = 4")
        .first()
        .keep
        is True
    )
    assert rows[5].keep is False
    assert (rows[5].max_line, rows[5].avg_line, rows[5].alnum_frac) == (
        0,
        0.0,
        0.0,
    )


def test_code_quality_on_code_corpus_shape(spark):
    """The op's home table is the (repo, path, commit, lang, content)
    source-code corpus of the north rule — run it over the synthesized
    corpus on its content column."""
    from phphinder_spark.corpus import generate_code_corpus

    docs = generate_code_corpus(spark, n_docs=200, seed=7).withColumn(
        "doc_id", F.xxhash64("repo", "path")
    )
    out = code_quality(docs, col="content", id_col="doc_id")
    assert out.count() == 200
    # synthesized source files are prose-like token lines: all keepable
    assert out.where("NOT keep").count() == 0
