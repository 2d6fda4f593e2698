"""Deterministic sampling for training-data mixing.

``deterministic_sample`` is a reproducible Bernoulli sample keyed on a
stable column: keep a row iff the leading 60 bits of
``sha256(salt | key)`` fall below ``fraction``. Unlike
``DataFrame.sample`` the decision is a pure function of (salt, key) —
re-runs, retries, different partitionings, and even different engines
agree row-for-row (the oracle replays the identical predicate in DuckDB,
whose ``sha256``/``concat_ws`` match Spark's byte-for-byte on strings).

``mixture_sample`` applies a per-group rate map on top — the data-mixing
step of LLM pipelines (sample Wikipedia at 3x, common-crawl at 0.2x,
code at 1x ...; the domain-reweighting knob of Gopher/DoReMi-style
recipes). Rates fold into ONE literal ``map`` Column, so the whole op is
a map-side projection + filter: zero shuffles, zero joins, trivially
scale-proof at 100 TB.

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
    The rate map becomes a literal in-expression map — map-side only."""
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
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
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
