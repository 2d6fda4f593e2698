"""Deterministic sampling for training-data mixing.

``deterministic_sample`` is a reproducible Bernoulli sample keyed on a
stable column: keep a row iff the leading 60 bits of
``sha256(salt | key)`` fall below ``fraction``. Unlike
``DataFrame.sample`` the decision is a pure function of (salt, key) —
re-runs, retries, different partitionings, and even different engines
agree row-for-row (the oracle replays the identical predicate in DuckDB,
whose ``sha256``/``concat_ws`` match Spark's byte-for-byte on strings).

``mixture_sample`` applies a per-group rate map on top — the data-mixing
step of LLM pipelines (keep common-crawl at 0.2x, code at 1x ...; the
domain-reweighting knob of Gopher/DoReMi-style recipes). Rates fold into
ONE literal ``map`` Column, so the whole op is a map-side projection +
filter: zero shuffles, zero joins, trivially scale-proof at 100 TB.
``mixture_sample`` is strictly a DOWNSAMPLER (rates in [0, 1]; rates
above 1 raise). Upweighting ("sample Wikipedia at 3x") is
``mixture_upsample``: each row is replicated ``floor(r)`` times plus one
more with deterministic probability ``frac(r)`` — a map-side explode,
still zero shuffles, with a ``copy_id`` column disambiguating replicas.

Threshold encoding: the hash prefix is compared as a FIXED-WIDTH (15
hex chars = 60 bits) lowercase hex string, so lexicographic order is
numeric order. fraction >= 1 encodes as ``"g"`` (sorts after every hex
string: keep all) and fraction <= 0 as ``""`` (no string is smaller:
drop all) — the comparison never needs branches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_HEX_WIDTH = 15  # 60 bits of the sha256 prefix
_ONE = 16**_HEX_WIDTH


def threshold_hex(fraction: float) -> str:
    """Fixed-width hex threshold for a keep-fraction (see module doc)."""
    if fraction <= 0.0:
        return ""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * _ONE), f"0{_HEX_WIDTH}x")


def _hash_prefix(key_col: str, salt: str) -> F.Column:
    return F.substring(
        F.sha2(
            F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")), 256
        ),
        1,
        _HEX_WIDTH,
    )


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "phphinder",
) -> DataFrame:
    """Rows whose ``sha256(salt | key)`` prefix < ``fraction`` — a
    reproducible Bernoulli sample. Different ``salt`` values give
    independent samples over the same keys."""
    return df.where(_hash_prefix(key_col, salt) < F.lit(threshold_hex(fraction)))


def _reject_upsample_rates(
    rates: dict[str, float], default_rate: float, op: str
) -> None:
    over = sorted(g for g, r in rates.items() if r > 1.0)
    if default_rate > 1.0:
        over.append(f"default_rate={default_rate}")
    if over:
        raise ValueError(
            f"{op} is downsample-only (a keep-predicate cannot emit a row "
            f"more than once); got rates > 1 for {over}. "
            "Use mixture_upsample for upweighting."
        )


def mixture_upsample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "phphinder",
) -> DataFrame:
    """Per-group deterministic UP/DOWN-sampling by row replication: each
    row is emitted ``floor(r)`` times plus one more iff its
    ``sha256(salt | key)`` prefix falls below ``frac(r)`` — so expected
    multiplicity is exactly ``r`` and kept counts are reproducible across
    engines and re-runs (same predicate family as
    :func:`deterministic_sample`). A ``copy_id`` column (0-based)
    disambiguates replicas; ``r <= 1`` degrades to the same keep-set as
    :func:`mixture_sample` with ``copy_id = 0``.

    Scale: the rate map and thresholds are literal expressions and the
    replication is ``explode(sequence(...))`` — map-side only, zero
    shuffles, zero joins. Output size is sum(n_g * r_g); rates are the
    caller's contract (Gopher-style mixes rarely exceed ~5x).
    """
    if any(r < 0 for r in rates.values()) or default_rate < 0:
        raise ValueError("rates must be >= 0")
    whole_entries: list[F.Column] = []
    frac_entries: list[F.Column] = []
    for group in sorted(rates):
        r = rates[group]
        whole_entries += [F.lit(group), F.lit(int(r))]
        frac_entries += [F.lit(group), F.lit(threshold_hex(r - int(r)))]
    g = F.col(group_col).cast("string")
    if whole_entries:
        whole = F.coalesce(
            F.create_map(*whole_entries)[g], F.lit(int(default_rate))
        )
        frac_thr = F.coalesce(
            F.create_map(*frac_entries)[g],
            F.lit(threshold_hex(default_rate - int(default_rate))),
        )
    else:
        whole = F.lit(int(default_rate))
        frac_thr = F.lit(threshold_hex(default_rate - int(default_rate)))
    n_copies = whole + F.when(
        _hash_prefix(key_col, salt) < frac_thr, F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_n_copies", n_copies)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "copy_id", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "phphinder",
) -> DataFrame:
    """Per-group deterministic sampling: keep each row with the rate its
    ``group_col`` value maps to (``default_rate`` for unlisted groups).
    The rate map becomes a literal in-expression map — map-side only.

    Downsample-only: a rate above 1 cannot be expressed as a keep-
    predicate and raises (use :func:`mixture_upsample` for 3x-style
    upweighting) rather than silently clamping to keep-all."""
    _reject_upsample_rates(rates, default_rate, "mixture_sample")
    entries: list[F.Column] = []
    for group in sorted(rates):
        entries.append(F.lit(group))
        entries.append(F.lit(threshold_hex(rates[group])))
    thr = (
        F.coalesce(
            F.create_map(*entries)[F.col(group_col).cast("string")],
            F.lit(threshold_hex(default_rate)),
        )
        if entries
        else F.lit(threshold_hex(default_rate))
    )
    return df.where(_hash_prefix(key_col, salt) < thr)


def temperature_rates(
    docs: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.3,
    round_to: int = 6,
) -> dict[str, float]:
    """Temperature-based rebalancing rates (the multilingual-corpus
    recipe of mT5 / XLM-R: sample groups proportional to n^alpha so
    head languages stop drowning the tail; alpha=1 keeps the natural
    distribution, alpha->0 approaches uniform).

    Keep-rates are r_g = (n_g / n_min) ** (alpha - 1) — proportional to
    n_g^(alpha-1), normalized so the SMALLEST group keeps everything
    (pure downsampling; no group is upsampled). Kept counts are then
    proportional to n_g^alpha. Rates are rounded to ``round_to`` so the
    returned dict replays identically anywhere.

    Driver-side by design: the aggregate is group-cardinality-sized
    (languages/domains — tens to thousands of rows), and the result
    feeds ``mixture_sample``'s literal rate map, keeping the sampling
    pass itself shuffle-free. One combining count shuffle total.
    """
    if not 0 <= alpha <= 1:
        # alpha <= 1 guarantees every rate is <= 1 (exponent alpha-1 <= 0
        # with n >= n_min), i.e. the output always feeds mixture_sample's
        # downsample contract; alpha > 1 would upweight the HEAD, which
        # inverts the recipe's purpose — reject rather than hand
        # mixture_sample rates it must refuse.
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    counts = {
        r.g: r.n
        for r in docs.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not counts:
        return {}
    n_min = min(counts.values())
    return {
        g: round((n / n_min) ** (alpha - 1.0), round_to)
        for g, n in counts.items()
    }


def stratified_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "phphinder",
    margin: int = 4,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACTLY ``min(k, |group|)`` rows per group — the balanced-eval /
    per-domain-audit selection ("give me 1000 docs per language"),
    deterministic: the kept rows are the k SMALLEST
    ``sha256(salt | key)`` prefixes of each group (ties by key), so the
    result is a pure function of (salt, keys) — partitioning-, retry-,
    and engine-invariant, exactly replayable as a SQL row_number. Rows
    with a NULL group are excluded. Output = input columns + ``rank``
    (1-based within group).

    Scale: a naive per-group window sorts EVERY row of every group in
    one task per group — a 100-TB head group is non-executable. This is
    the two-phase exact form instead:

    1. group sizes: one tiny combining count;
    2. map-side PREFILTER: per-group hash threshold with ``margin``x
       expected survivors (literal map Column, zero shuffle) — the
       corpus pass is a narrow filter;
    3. verify survivor counts (tiny agg); any group that undershot
       min(k, n_g) — P(Binomial(n_g, margin*k/n_g) < k), vanishing for
       margin >= 4 — gets its threshold widened 8x and re-verified
       (driver loop over tiny aggregates, ``max_rounds`` bound; the
       final answer is the exact hash-top-k REGARDLESS of thresholds);
    4. the window runs on the O(margin * k * n_groups) survivor frame
       only.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    sizes = {
        r["g"]: r["n"]
        for r in df.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).cast("string").alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    if not sizes:
        return df.withColumn("rank", F.lit(0).cast("long")).limit(0)
    fracs = {g: min(1.0, margin * k / n) for g, n in sizes.items()}
    need = {g: min(k, n) for g, n in sizes.items()}
    prefix = _hash_prefix(key_col, salt)

    def survivors_for(fr: dict[str, float]) -> DataFrame:
        entries: list[F.Column] = []
        for g in sorted(fr):
            entries.append(F.lit(g))
            entries.append(F.lit(threshold_hex(fr[g])))
        thr = F.coalesce(
            F.create_map(*entries)[F.col(group_col).cast("string")], F.lit("")
        )
        return df.where(prefix < thr)

    for _ in range(max_rounds):
        surv = survivors_for(fracs).localCheckpoint(eager=False)
        got = {
            r["g"]: r["n"]
            for r in surv.groupBy(
                F.col(group_col).cast("string").alias("g")
            ).agg(F.count("*").alias("n")).collect()
        }
        under = [g for g, n in need.items() if got.get(g, 0) < n]
        if not under:
            break
        for g in under:
            fracs[g] = min(1.0, fracs[g] * 8)
    else:
        raise RuntimeError(
            f"stratified_sample did not cover every group in {max_rounds} "
            "threshold-widening rounds (should be impossible: fractions "
            "reach 1.0 within a few x8 steps)"
        )
    w = Window.partitionBy(group_col).orderBy(prefix, F.col(key_col))
    return (
        surv.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= int(k))
    )


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    key_col: str = "doc_id",
    salt: str = "phphinder-split",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in
    exactly one named bucket, decided by where its 60-bit
    ``sha256(salt | key)`` prefix falls among the cumulative fraction
    boundaries (bucket order = dict insertion order). Pure function of
    (salt, key): re-runs, retries, different partitionings, and
    different engines agree row-for-row — and because every bucket is a
    PREFIX-RANGE of the same hash, adding documents later never moves
    an existing document between splits (the stability property naive
    ``randomSplit`` lacks).

    ``fractions`` defaults to ``{"train": .98, "val": .01, "test":
    .01}`` and must sum to 1 (±1e-6); the last bucket absorbs float
    rounding. Appends ``split_col`` to the input columns.

    Scale: the boundaries fold into one literal CASE chain — a map-side
    projection, zero shuffles, zero joins."""
    fractions = (
        {"train": 0.98, "val": 0.01, "test": 0.01}
        if fractions is None
        else fractions
    )
    if not fractions:
        raise ValueError("fractions must name at least one split")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be >= 0")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    h = _hash_prefix(key_col, salt)
    expr = F.lit(names[-1])  # last bucket absorbs rounding
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += fractions[name]
        cases.append((threshold_hex(cum), name))
    for thr, name in reversed(cases):
        expr = F.when(h < F.lit(thr), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)
