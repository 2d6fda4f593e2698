"""Event-stream analytics: sessionization and tumbling-window rollups.

A large-scale ingest pipeline emits telemetry — crawl fetches, indexing
commits, user queries — as an append-only event log ``(event_id, ts,
user_id, event_type, value, ...)``. The two classic reductions over
that log are

``sessionize``
    gap-based session assignment: within one ``user_id``, a new session
    starts whenever the silence since the previous event exceeds
    ``gap``. Implemented as the textbook two-window composition — a
    ``lag`` to compute the inter-event gap, then a running ``sum`` of
    the new-session flags — BOTH over the same ``(user_id)`` partition
    key, so Spark plans exactly ONE shuffle (by ``user_id``) and one
    per-partition sort feeding both window frames.

``session_stats`` / ``window_counts``
    per-session and per-tumbling-window aggregates; plain combining
    ``groupBy``s (map-side partial aggregation, AQE-splittable).

Scale notes (100 TB):

- The sessionize window partitions by ``user_id`` — per-key state is
  one row (the previous timestamp + running count), and keys are
  independent, so the op distributes across however many users the log
  has. The default plan's limit is a single HOT key: one user's events
  time-sort in one task. ``hot_bucket_minutes`` removes it EXACTLY —
  partition by (user, time bucket), then stitch sessions across bucket
  edges with a per-user bucket-summary prefix scan (equivalence-tested
  identical to the default plan, straddling sessions included).
- All timestamp arithmetic is INTEGER microseconds (``unix_micros`` /
  DuckDB ``epoch_us``) — exact, overflow-safe until year ~294k, and
  bit-identical across engines, unlike double epoch seconds which
  round at the 16th significant digit.
- ``window_counts`` buckets by integer division of the micros — a
  map-side projection + one combining aggregate; no window functions,
  no per-key anything.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

MICROS_PER_MIN = 60_000_000


def _micros(df: DataFrame, ts_col: str) -> Column:
    """Epoch microseconds of ``ts_col``. TIMESTAMP is taken as the
    instant it is; TIMESTAMP_NTZ (what parquet event logs usually
    carry) is interpreted as UTC wall time — NOT the session zone — so
    the result is a pure function of the stored value, identical across
    sessions and engines (DuckDB's ``epoch_us`` makes the same naive-
    is-UTC call). The session-zone cast is undone with
    ``from_utc_timestamp``; sub-second precision survives both hops.
    Caveat: if the session zone has DST, the undo uses the offset at
    the shifted instant, so wall times inside a transition window can
    land an hour off — run event analytics with
    ``spark.sql.session.timeZone=UTC`` (any fixed-offset zone is also
    exact), which is the recommended cluster default anyway."""
    c = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        return F.unix_micros(F.from_utc_timestamp(c.cast("timestamp"), tz))
    return F.unix_micros(c)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
    session_col: str = "session_seq",
    hot_bucket_minutes: float | None = None,
) -> DataFrame:
    """Assign a per-user session sequence number (1-based) to every
    event: a new session starts at the user's first event and whenever
    the gap since their previous event EXCEEDS ``gap_minutes``
    (a gap exactly equal to the threshold stays in the same session).

    Ordering inside a user is ``(ts, id_col)`` — the id tiebreak makes
    the assignment total and deterministic when two events share a
    timestamp. Appends ``session_col`` (long) to the input columns.
    Rows with NULL ``ts_col`` are EXCLUDED (see the in-code contract
    note); the other reductions here need no such rule — min/avg
    aggregates ignore NULLs identically across engines.

    One shuffle (hash by ``user_col``), one sort, two stacked window
    frames over the same partitioning — Catalyst plans a single Window
    operator pair with no extra exchange.

    ``hot_bucket_minutes`` switches to the HOT-KEY-SAFE form: the
    default plan must time-sort each user's events in ONE task, so a
    single dominating key (a bot account with billions of events)
    serializes. The bucketed form partitions by (user, time bucket) —
    max task size drops from events-per-user to events-per-(user,
    bucket) — and stitches sessions across bucket edges EXACTLY via a
    per-user bucket-summary scan (the same distributed-prefix-scan
    shape as ops/packing.pack_sequences): result is equivalence-tested
    identical to the default plan, including exact-gap boundaries that
    straddle a bucket edge. Costs one extra (tiny) summary window and
    one join vs the default, so keep it for logs where hot keys are
    real; width tuning only moves the constant, any width is exact.
    """
    # NULL contract: an event without a timestamp cannot be placed in
    # any session — such rows are EXCLUDED from the output (silently
    # keeping them would also diverge across engines: Spark windows
    # sort NULLS FIRST, most SQL engines default NULLS LAST, shifting
    # every subsequent session number for that user).
    df = df.where(F.col(ts_col).isNotNull())
    gap_us = int(round(gap_minutes * MICROS_PER_MIN))
    if hot_bucket_minutes is not None:
        return _sessionize_bucketed(
            df, user_col, ts_col, id_col, gap_us,
            int(round(hot_bucket_minutes * MICROS_PER_MIN)), session_col,
        )
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(_micros(df, ts_col)).over(w)
    # Spark forbids nesting one window function inside another, so the
    # flag is materialized as a column between the two frames; both
    # frames share (partition, order), so there is still ONE exchange.
    flagged = df.withColumn(
        "_new_session",
        F.when(
            prev.isNull() | (_micros(df, ts_col) - prev > F.lit(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        session_col, F.sum("_new_session").over(run).cast("long")
    ).drop("_new_session")


def _sessionize_bucketed(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_us: int,
    width_us: int,
    session_col: str,
) -> DataFrame:
    """Exact segmented-scan sessionization (see :func:`sessionize`).

    Phase 1 — per (user, bucket), in parallel across buckets: local
    lag-gap flags where the bucket's FIRST event is tentatively flagged
    as a new session (``_s_local`` = local running count, 1-based).

    Phase 2 — per user over its NON-EMPTY bucket summaries (a frame of
    |users| x |occupied buckets| rows, each a 4-field aggregate): lag
    over bucket order gives the previous occupied bucket's last
    timestamp, deciding whether each bucket's first event REALLY starts
    a session (``_f``), and a cumulative sum gives ``_base``, the
    number of sessions closed before the bucket. Empty buckets need no
    handling: the lag simply reaches back to the previous occupied one.

    Final seq = ``_base + _s_local - (1 - _f)`` — if the first local
    session continues the previous bucket's last session, every event
    of that local session shifts down by one.

    Ties at a bucket edge cannot split ordering: the bucket is a pure
    function of the timestamp, so equal timestamps share a bucket and
    the (ts, id) order within (user, bucket) equals the global order.
    """
    us = _micros(df, ts_col)
    d = df.withColumn("_us", us).withColumn(
        "_bkt", (F.col("_us") - F.col("_us") % F.lit(width_us))
    )
    w = Window.partitionBy(user_col, "_bkt").orderBy("_us", id_col)
    prev = F.lag("_us").over(w)
    flagged = d.withColumn(
        "_flag",
        F.when(
            prev.isNull() | (F.col("_us") - prev > F.lit(gap_us)), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = flagged.withColumn("_s_local", F.sum("_flag").over(run))
    summary = local.groupBy(user_col, "_bkt").agg(
        F.min("_us").alias("_first_us"),
        F.max("_us").alias("_last_us"),
        F.sum("_flag").alias("_n"),
    )
    wb = Window.partitionBy(user_col).orderBy("_bkt")
    prev_last = F.lag("_last_us").over(wb)
    sm = summary.withColumn(
        "_f",
        F.when(
            prev_last.isNull()
            | (F.col("_first_us") - prev_last > F.lit(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    base_frame = wb.rowsBetween(Window.unboundedPreceding, -1)
    adj = sm.withColumn(
        "_base",
        F.coalesce(
            F.sum(F.col("_n") - (F.lit(1) - F.col("_f"))).over(base_frame),
            F.lit(0),
        ),
    ).select(user_col, "_bkt", "_f", "_base")
    return (
        local.join(adj, [user_col, "_bkt"])
        .withColumn(
            session_col,
            (
                F.col("_base")
                + F.col("_s_local")
                - (F.lit(1) - F.col("_f"))
            ).cast("long"),
        )
        .drop("_us", "_bkt", "_flag", "_s_local", "_f", "_base")
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: float = 30.0,
    value_col: str = "value",
    hot_bucket_minutes: float | None = None,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: event count, span in
    seconds (exact micros arithmetic, reported as ``round(us / 1e6,
    6)``), and the summed ``value_col``. ``hot_bucket_minutes`` passes
    through to :func:`sessionize` (hot-key-safe form, identical
    results).

    Output: ``(user_col, session_seq, n_events, duration_s,
    total_value)`` — one combining groupBy on top of the sessionize
    shuffle; because the groupBy keys start with ``user_col`` (the
    window's partition key), AQE usually folds the aggregate into the
    post-window stage without a second exchange.
    """
    s = sessionize(
        df, user_col, ts_col, id_col, gap_minutes,
        hot_bucket_minutes=hot_bucket_minutes,
    )
    return s.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            (F.max(_micros(s, ts_col)) - F.min(_micros(s, ts_col))) / 1e6, 6
        ).alias("duration_s"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict ordered funnel: for each user, how far through ``steps``
    they progressed, where step k+1 must occur STRICTLY after the
    matched step-k event (same-microsecond events do not chain).
    Matching is greedy-earliest — t1 = the user's first step-1 event,
    t_{k+1} = their first step-{k+1} event after t_k — which is EXACT
    for unwindowed completion semantics (induction: any completing
    sequence has its step-k event no earlier than the greedy t_k, so
    greedy never misses a completion). A within-T-of-anchor windowed
    funnel is deliberately NOT offered by this op: greedy-earliest is
    incomplete for it (a later anchor can succeed where the earliest
    fails), and the exact form needs per-anchor search — a different,
    quadratic-ish operator callers must choose consciously.

    Output: one row per user with >= 1 step-1 event:
    ``(user_col, steps_completed, first_step_us, last_step_us)`` —
    ``last_step_us`` is the matched time of the deepest step reached.

    Scale: one combining min-aggregate per step over that step's
    events, chained by per-user joins — the left side is always the
    per-user frame (|users| rows); no windows, no per-user sort, so a
    hot user costs nothing extra (aggregates combine map-side)."""
    if not steps:
        raise ValueError("steps must name at least one event type")
    us = _micros(df, ts_col)
    ev = df.select(F.col(user_col).alias("_u"), us.alias("_us"),
                   F.col(type_col).alias("_ty"))
    cur = (
        ev.where(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_us").alias("_t1"))
    )
    result = cur.select(
        "_u", F.lit(1).alias("_n"), F.col("_t1"), F.col("_t1").alias("_tk")
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            result.where(F.col("_n") == k - 1)
            .join(ev.where(F.col("_ty") == step), "_u")
            .where(F.col("_us") > F.col("_tk"))
            .groupBy("_u")
            .agg(F.min("_us").alias("_tn"))
        )
        result = (
            result.join(nxt, "_u", "left")
            .select(
                "_u",
                F.when(F.col("_tn").isNotNull(), F.lit(k))
                .otherwise(F.col("_n"))
                .alias("_n"),
                "_t1",
                F.coalesce("_tn", "_tk").alias("_tk"),
            )
        )
    return result.select(
        F.col("_u").alias(user_col),
        F.col("_n").cast("long").alias("steps_completed"),
        F.col("_t1").alias("first_step_us"),
        F.col("_tk").alias("last_step_us"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    cohort_minutes: float = 1440.0,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the tumbling
    bucket of their FIRST event; each (cohort, offset) cell counts the
    distinct cohort users active in the bucket ``offset`` periods after
    their cohort bucket (offset 0 = the cohort period itself).

    Output: ``(cohort_start_us, period_offset, n_users)``.

    Scale: one combining min-per-user aggregate, one user-keyed join
    back (AQE-splittable; the per-user frame is |users| rows), one
    two-phase distinct aggregate. No windows."""
    width_us = int(round(cohort_minutes * MICROS_PER_MIN))
    us = _micros(df, ts_col)
    ev = df.select(F.col(user_col).alias("_u"), us.alias("_us"))
    first = ev.groupBy("_u").agg(F.min("_us").alias("_first_us"))
    cohort = F.col("_first_us") - F.col("_first_us") % F.lit(width_us)
    bucket = F.col("_us") - F.col("_us") % F.lit(width_us)
    # `div` keeps the offset in pure long arithmetic (the / form routes
    # through a double — the exact pattern window_counts' comment
    # forbids for epoch-microsecond magnitudes)
    return (
        ev.join(first, "_u")
        .select(
            "_u",
            cohort.alias("cohort_start_us"),
            bucket.alias("_bucket"),
        )
        .select(
            "_u",
            "cohort_start_us",
            F.expr(
                f"(_bucket - cohort_start_us) div {width_us}L"
            ).alias("period_offset"),
        )
        .groupBy("cohort_start_us", "period_offset")
        .agg(F.count_distinct(F.col("_u")).alias("n_users"))
    )


def sliding_window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_minutes: float = 60.0,
    slide_minutes: float = 15.0,
    by: str | None = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) window rollup: every event lands in the
    ``window/slide`` overlapping windows that cover it (starts aligned
    to the slide, epoch-anchored, integer micros — the batch analogue
    of ``F.window(ts, w, s)`` kept engine-exact). ``window`` must be a
    multiple of ``slide``.

    Output: ``(window_start_us, <by>?, n_events, total_value)``.

    Scale: a map-side explode of exactly k = window/slide bucket ids
    per event + ONE combining aggregate — data volume k x input, no
    windows, no joins; k is a literal, so Catalyst folds the sequence
    bounds into codegen."""
    width_us = int(round(window_minutes * MICROS_PER_MIN))
    slide_us = int(round(slide_minutes * MICROS_PER_MIN))
    if width_us % slide_us != 0:
        raise ValueError("window_minutes must be a multiple of "
                         "slide_minutes")
    k = width_us // slide_us
    us = _micros(df, ts_col)
    last = us - us % F.lit(slide_us)
    starts = F.sequence(
        last - F.lit((k - 1) * slide_us), last, F.lit(slide_us)
    )
    keys = [F.explode(starts).alias("window_start_us")] + (
        [F.col(by)] if by else []
    )
    exploded = df.select(*keys, F.col(value_col).alias("_v"))
    group = ["window_start_us"] + ([by] if by else [])
    return exploded.groupBy(*group).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("_v"), 6).alias("total_value"),
    )


def rate_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "event_type",
    window_minutes: float = 60.0,
    trailing: int = 24,
    z_thresh: float = 3.0,
    value_col: str = "value",
) -> DataFrame:
    """Rolling z-score anomaly flags on per-window event rates — the
    standard ingest-monitoring reduction (did the crawl rate of
    'error' events spike vs its trailing baseline?).

    Buckets events with :func:`window_counts`, then per ``by`` group
    compares each bucket's count against the mean/stddev of the
    previous ``trailing`` OCCUPIED buckets (rows, not wall-clock
    periods: empty buckets produce no row and are skipped by the
    frame — callers monitoring sparse streams should densify first if
    gap periods must count as zero). Buckets with fewer than
    ``trailing`` predecessors, or a zero-variance baseline, have
    ``z_defined`` false and never flag.

    ONE-SIDED by contract: only positive deviations (``z >=
    z_thresh``) flag — the op targets ingest SPIKE detection; a rate
    collapse (strongly negative z) does not set ``is_anomaly``.
    Callers monitoring for drop-outs should additionally alert on the
    reported ``z`` itself (it is in the output precisely so both tails
    are observable).

    Output: ``(window_start_us, <by>, n_events, z_defined, base_mean,
    z, is_anomaly)`` with base_mean/z rounded to 1e-6. base_mean is
    ``-1.0`` when the baseline is short, and z is ``0.0`` whenever
    ``z_defined`` is false (short baseline OR zero variance) —
    SENTINELS, not values (numeric NULLs canonicalize to NaN through
    Arrow/pandas and break cross-engine value comparison; same
    contract as dedup_against's -1 sentinels).

    Scale: the corpus-scale work is the combining window_counts
    aggregate; the rolling window runs over the AGGREGATED frame
    (|groups| x |occupied buckets| rows), partitioned by the group —
    per-partition size is bounded by the time horizon, never by event
    volume."""
    wc = window_counts(df, ts_col, window_minutes, by, value_col)
    w = (
        Window.partitionBy(by)
        .orderBy("window_start_us")
        .rowsBetween(-trailing, -1)
    )
    n_prev = F.count(F.lit(1)).over(w)
    mean = F.avg("n_events").over(w)
    std = F.stddev_pop("n_events").over(w)
    full = n_prev == F.lit(trailing)
    # the flag compares the ROUNDED z: engines disagree on stddev at
    # ~1e-15 (different merge formulas), and an unrounded comparison
    # could flip a knife-edge flag across engines
    defined = full & (std > 0)
    z = F.when(
        defined, F.round((F.col("n_events") - mean) / std, 6)
    ).otherwise(F.lit(0.0))
    return wc.select(
        "window_start_us",
        F.col(by),
        "n_events",
        defined.alias("z_defined"),
        F.when(full, F.round(mean, 6)).otherwise(F.lit(-1.0)).alias(
            "base_mean"
        ),
        z.alias("z"),
        (defined & (z >= F.lit(float(z_thresh)))).alias("is_anomaly"),
    )


def window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window_minutes: float = 60.0,
    by: str | None = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rollup: bucket every event into
    ``floor(unix_micros(ts) / width)`` and aggregate count + summed
    value per (bucket, ``by``) — the batch equivalent of a Structured
    Streaming ``window()`` aggregate, kept as integer bucket ids so the
    result is engine-exact.

    Output: ``(window_start_us, <by>?, n_events, total_value)`` where
    ``window_start_us`` is the bucket's inclusive start in epoch
    microseconds (long). Map-side projection + ONE combining aggregate;
    zero windows, zero joins — the flat-aggregation shape that scales
    to any log size.

    NULL-timestamp events are EXCLUDED (same contract as sessionize;
    a NULL bucket row would otherwise sort NULLS-FIRST into every
    rate_anomalies baseline and count toward its trailing window —
    and engines disagree on NULL ordering, so it would also break the
    cross-engine gate).
    """
    df = df.where(F.col(ts_col).isNotNull())
    width_us = int(round(window_minutes * MICROS_PER_MIN))
    # micros - (micros % width), NOT floor(micros / width) * width: the
    # division form goes through a double, and at 1e15-scale micros a
    # double ULP is ~0.25 us — boundary events could land one bucket
    # off (and disagree with the oracle's exact integer //). All-long
    # arithmetic is exact; event logs are post-1970 so % is the
    # mathematical mod.
    us = _micros(df, ts_col)
    bucket = (us - us % F.lit(width_us)).alias("window_start_us")
    keys = [bucket] + ([F.col(by)] if by else [])
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )
