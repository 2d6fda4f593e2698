"""Web-crawl ingest primitives: URL canonicalization and URL-level dedup.

The first dedup pass of a crawl pipeline is not content-based at all —
it is URL-level: the same page is fetched under syntactically different
URLs (scheme/host case, default ports, tracking parameters, parameter
order, trailing slashes, fragments), and canonicalizing before fetch /
before content dedup removes the bulk of exact refetches for free.

``normalize_urls`` implements the standard canonicalization rules as
pure JVM column expressions (regexp parses + higher-order array ops —
zero shuffles, zero Python, one map-side projection):

- scheme and host lowercased; userinfo is NOT handled (rare in crawl
  frontiers; rows keep it verbatim in the host and can be filtered on
  ``valid``);
- default ports stripped (``http:80``, ``https:443``), other explicit
  ports kept;
- fragment dropped (never sent to the server);
- query parameters: empties and tracking parameters dropped (entries of
  ``strip_params`` ending in ``_`` match as key PREFIXES, e.g.
  ``utm_``; the rest match keys exactly), the survivors sorted
  byte-lexicographically so parameter order stops mattering;
- path: empty becomes ``/``; trailing slashes stripped except the root.

Deliberately NOT done (they change fetch semantics or need network):
IDN/punycode folding, percent-encoding normalization beyond case,
relative resolution, robots/canonical-tag awareness.

``url_dedup`` then keeps the smallest ``id_col`` per canonical URL —
the deterministic first-seen rule every incremental crawler uses.

Scale: normalization is map-only; dedup is one combining groupBy on the
canonical string + an AQE-splittable join back (hot canonical URLs —
link-farm targets — split under AQE skew handling; nothing ever
shuffles page CONTENT, only URLs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

DEFAULT_STRIP_PARAMS = ("utm_", "fbclid", "gclid", "msclkid", "ref")


def _param_key(x: Column) -> Column:
    return F.regexp_extract(x, "^([^=]*)", 1)


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_params: tuple[str, ...] = DEFAULT_STRIP_PARAMS,
) -> DataFrame:
    """Canonicalize ``url_col`` per the module rules.

    Returns ``(id_col, host, url_norm, valid)``: ``host`` is the
    lowercased hostname (no port), ``url_norm`` the canonical URL
    (NULL when invalid), ``valid`` false when the value has no
    ``scheme://host`` shape (relative references, garbage, NULL)."""
    # strip the fragment FIRST: a '?' inside '#...' must not fabricate
    # a query string (e.g. 'http://h/p#sec?x=1' has no query)
    u = F.regexp_replace(F.col(url_col), "#.*", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.regexp_extract(u, _AUTH_RE, 1)
    host = F.lower(F.regexp_replace(auth, r":\d+$", ""))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    raw_path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)

    def keep(x: Column) -> Column:
        cond = x != ""
        key = _param_key(x)
        for s in strip_params:
            if s.endswith("_"):
                cond = cond & ~key.startswith(F.lit(s))
            else:
                cond = cond & (key != F.lit(s))
        return cond

    qnorm = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), keep)), "&"
    )
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    stripped = F.regexp_replace(raw_path, "/+$", "")
    path_norm = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    valid = u.isNotNull() & (scheme != "") & (host != "")
    url_norm = F.when(
        valid,
        F.concat(
            scheme,
            F.lit("://"),
            host,
            port_part,
            path_norm,
            F.when(qnorm == "", F.lit("")).otherwise(
                F.concat(F.lit("?"), qnorm)
            ),
        ),
    )
    return df.select(
        F.col(id_col),
        F.when(valid, host).alias("host"),
        url_norm.alias("url_norm"),
        valid.alias("valid"),
    )


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_params: tuple[str, ...] = DEFAULT_STRIP_PARAMS,
    hash_key: bool = False,
) -> DataFrame:
    """URL-level dedup: first-seen (smallest ``id_col``) row per
    canonical URL is the keeper. Invalid URLs are never keepers and
    never suppress anything (``keep`` false, NULL canonical).

    Returns ``(id_col, url_norm, keep)``.

    ``hash_key=True`` is the 100-TB form: ONE normalization pass and
    one shuffle of ``xxhash64(url_norm)`` LONGS, with the keeper as an
    unordered window-min per hash (invalid rows get per-row unique
    keys so they can't pile into one NULL partition). Measured 4x at
    20M URLs (BENCH.md) over the default, which pays the regex chain
    twice (keeper-aggregate branch + join-back branch) and sort-merges
    canonical STRINGS. Trades: (a) 64-bit collisions — two distinct
    canonicals colliding share one keeper (expected colliding pairs
    ~ n^2 / 2^65, ~3e4 at 10^12 URLs, a ~3e-8 false-drop rate that
    URL-level dedup can absorb since content dedup runs after it);
    (b) a single canonical URL's rows sort inside one window
    partition, so a link-farm-grade mega-URL bounds one task by its
    own refetch count (the default's combining groupBy handles that
    skew better). The default stays exact and is the oracle path."""
    norm = normalize_urls(df, url_col, id_col, strip_params)
    if hash_key:
        k = F.when(F.col("valid"), F.xxhash64("url_norm")).otherwise(
            F.xxhash64(F.col(id_col).cast("string"), F.lit("invalid"))
        )
        w = Window.partitionBy("_k")
        # only VALID rows compete for keeper: an invalid row's synthetic
        # key colliding with a real group's hash must not capture (and
        # thereby null out) that group's keeper
        return (
            norm.withColumn("_k", k)
            .withColumn(
                "_keeper",
                F.min(F.when(F.col("valid"), F.col(id_col))).over(w),
            )
            .select(
                id_col,
                "url_norm",
                (F.col("valid") & (F.col(id_col) == F.col("_keeper")))
                .alias("keep"),
            )
        )
    keepers = (
        norm.where("valid")
        .groupBy("url_norm")
        .agg(F.min(id_col).alias("_keeper"))
    )
    return (
        norm.join(keepers, "url_norm", "left")
        .select(
            id_col,
            "url_norm",
            (F.col("valid") & (F.col(id_col) == F.col("_keeper"))).alias(
                "keep"
            ),
        )
    )


def domain_stats(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_params: tuple[str, ...] = DEFAULT_STRIP_PARAMS,
    hash_key: bool = False,
) -> DataFrame:
    """Per-host crawl frontier profile: total rows and distinct
    canonical URLs (the refetch ratio is ``n_docs / n_urls``). One
    combining aggregate on host; the distinct runs as the standard
    two-phase partial-distinct plan. Invalid rows are excluded.

    ``hash_key=True`` counts distinct ``xxhash64(url_norm)`` longs
    instead of canonical strings — the same 100-TB trade as
    :func:`url_dedup`: the exchange carries 8-byte keys, at the cost
    of undercounting a host's distinct URLs by its 64-bit collisions
    (~m^2 / 2^65 per host — negligible at any real per-host m).

    Returns ``(host, n_docs, n_urls)``."""
    norm = normalize_urls(df, url_col, id_col, strip_params).where("valid")
    key = (
        F.xxhash64("url_norm") if hash_key else F.col("url_norm")
    )
    return norm.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(key).alias("n_urls"),
    )
