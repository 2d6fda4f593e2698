"""Tests for the round-7 event-analytics additions: funnel,
retention_cohorts, sliding_window_counts."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops.events import (
    funnel,
    retention_cohorts,
    sliding_window_counts,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
US0 = int(T0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
MIN_US = 60_000_000


def _ev(eid, user, minutes, etype):
    return (eid, T0 + dt.timedelta(minutes=minutes), user, etype, 1.0)


@pytest.fixture()
def log(spark):
    rows = [
        # user 1 completes signup -> activate -> purchase in order
        _ev(0, 1, 0.0, "signup"),
        _ev(1, 1, 10.0, "activate"),
        _ev(2, 1, 20.0, "purchase"),
        # user 2: purchase BEFORE activate -> only signup+? ordering
        _ev(3, 2, 0.0, "signup"),
        _ev(4, 2, 5.0, "purchase"),
        _ev(5, 2, 10.0, "activate"),
        # user 3: signup only
        _ev(6, 3, 0.0, "signup"),
        # user 4: never signed up
        _ev(7, 4, 0.0, "purchase"),
        # user 5: activate at the SAME microsecond as signup (no chain),
        # then a later activate that does chain
        _ev(8, 5, 0.0, "signup"),
        _ev(9, 5, 0.0, "activate"),
        _ev(10, 5, 3.0, "activate"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


def test_funnel_golden(log):
    got = {
        r.user_id: (r.steps_completed, r.first_step_us, r.last_step_us)
        for r in funnel(log, ["signup", "activate", "purchase"]).collect()
    }
    assert got[1] == (3, US0, US0 + 20 * MIN_US)
    # user 2's purchase precedes the matched activate -> stops at 2
    assert got[2] == (2, US0, US0 + 10 * MIN_US)
    assert got[3] == (1, US0, US0)
    assert 4 not in got  # no step-1 event, no row
    # same-microsecond activate does not chain; the minute-3 one does
    assert got[5] == (2, US0, US0 + 3 * MIN_US)


def test_funnel_greedy_is_exact_unwindowed(spark):
    """Earliest-anchor matching must still find completions whose
    step-1 event is NOT the earliest one."""
    rows = [
        _ev(0, 1, 0.0, "a"),
        _ev(1, 1, 50.0, "a"),   # the completing sequence starts here
        _ev(2, 1, 60.0, "b"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    r = funnel(df, ["a", "b"]).first()
    # greedy anchors at t=0 and still finds b at 60 (> 0)
    assert r.steps_completed == 2
    assert r.first_step_us == US0 and r.last_step_us == US0 + 60 * MIN_US


def test_funnel_single_step_and_empty_steps(log):
    got = {r.user_id: r.steps_completed
           for r in funnel(log, ["purchase"]).collect()}
    assert got == {1: 1, 2: 1, 4: 1}
    with pytest.raises(ValueError):
        funnel(log, [])


def test_retention_cohorts_golden(spark):
    day = 1440.0
    rows = [
        # users 1, 2 start day 0; user 1 returns day 1 and day 2
        _ev(0, 1, 0.0, "x"),
        _ev(1, 1, day + 1.0, "x"),
        _ev(2, 1, 2 * day + 1.0, "x"),
        _ev(3, 2, 30.0, "x"),
        # user 3 starts day 1, returns day 2
        _ev(4, 3, day + 5.0, "x"),
        _ev(5, 3, 2 * day + 5.0, "x"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    day_us = int(day) * MIN_US
    got = {
        (r.cohort_start_us, r.period_offset): r.n_users
        for r in retention_cohorts(df, cohort_minutes=day).collect()
    }
    assert got == {
        (US0, 0): 2,
        (US0, 1): 1,
        (US0, 2): 1,
        (US0 + day_us, 0): 1,
        (US0 + day_us, 1): 1,
    }


def test_sliding_window_counts(spark):
    rows = [_ev(0, 1, 10.0, "x"), _ev(1, 1, 70.0, "y")]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = sliding_window_counts(
        df, window_minutes=60.0, slide_minutes=15.0, by=None
    ).collect()
    # each event is covered by exactly window/slide = 4 windows
    assert sum(r.n_events for r in out) == 2 * 4
    starts = {r.window_start_us for r in out}
    # the minute-10 event's covering windows: starts -45, -30, -15, 0
    for m in (-45, -30, -15, 0):
        assert US0 + m * MIN_US in starts
    # minute-70 event: starts 15..60; window at 15 covers BOTH? no —
    # [15, 75) covers 70 but not 10 -> count 1 there
    per = {r.window_start_us: r.n_events for r in out}
    assert per[US0 + 15 * MIN_US] == 1
    with pytest.raises(ValueError):
        sliding_window_counts(df, window_minutes=50.0, slide_minutes=15.0)


def test_sliding_equals_tumbling_when_slide_is_window(spark):
    from phphinder_spark.ops.events import window_counts

    rows = [_ev(i, 1 + i % 3, i * 13.7, "x") for i in range(40)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    a = {
        (r.window_start_us, r.n_events, r.total_value)
        for r in sliding_window_counts(
            df, window_minutes=60.0, slide_minutes=60.0, by=None
        ).collect()
    }
    b = {
        (r.window_start_us, r.n_events, r.total_value)
        for r in window_counts(df, window_minutes=60.0, by=None).collect()
    }
    assert a == b


def test_funnel_plan_no_window(log):
    plan = (
        funnel(log, ["signup", "activate", "purchase"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan


def test_rate_anomalies_golden(spark):
    from phphinder_spark.ops.events import rate_anomalies

    # 6 steady hourly buckets of 2 events, then one 10-event spike
    rows = []
    eid = 0
    for h in range(6):
        for j in range(2):
            rows.append(_ev(eid, 1, h * 60.0 + j, "x")); eid += 1
    for j in range(10):
        rows.append(_ev(eid, 1, 6 * 60.0 + j, "x")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    got = {
        r.window_start_us: r
        for r in rate_anomalies(
            df, window_minutes=60.0, trailing=3, z_thresh=3.0
        ).collect()
    }
    spike = got[US0 + 6 * 3_600_000_000 // 60 * 60]  # hour-6 bucket
    # trailing 3 buckets are all 2 -> std 0 -> z undefined, never flags
    assert spike.base_mean == 2.0
    assert spike.z_defined is False and spike.z == 0.0
    assert spike.is_anomaly is False  # std=0 -> undefined z, no flag
    # trailing-short buckets carry the -1.0 sentinel, never flag
    assert got[US0].base_mean == -1.0 and got[US0].z_defined is False
    assert got[US0].is_anomaly is False


def test_rate_anomalies_flags_real_spike(spark):
    from phphinder_spark.ops.events import rate_anomalies

    # varied baseline (1,2,1,2 ...) then a 12-event spike: std > 0
    rows = []
    eid = 0
    for h in range(8):
        for j in range(1 + h % 2):
            rows.append(_ev(eid, 1, h * 60.0 + j, "x")); eid += 1
    for j in range(12):
        rows.append(_ev(eid, 1, 8 * 60.0 + j, "x")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    out = rate_anomalies(df, window_minutes=60.0, trailing=4,
                         z_thresh=3.0)
    flagged = [r for r in out.collect() if r.is_anomaly]
    assert len(flagged) == 1
    assert flagged[0].n_events == 12 and flagged[0].z > 3.0
