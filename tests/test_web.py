"""Tests for ops/web.py (URL canonicalization + URL-level dedup)."""

from pyspark.sql import functions as F

from phphinder_spark.ops.web import domain_stats, normalize_urls, url_dedup


def _norm(spark, *urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    return {r.doc_id: r for r in normalize_urls(df).collect()}


def test_normalize_case_port_fragment_params(spark):
    rows = _norm(
        spark,
        "HTTPS://WWW.Example.COM:443/path/a/?utm_source=x&b=2&a=1#frag",
    )
    r = rows[0]
    assert r.valid is True
    assert r.host == "www.example.com"
    assert r.url_norm == "https://www.example.com/path/a?a=1&b=2"


def test_normalize_keeps_non_default_port_and_scheme(spark):
    rows = _norm(
        spark,
        "http://site.org:8080//x//",
        "ftp://files.net:21/a",
        "http://site.org:80/y",
    )
    assert rows[0].url_norm == "http://site.org:8080//x"
    # only http:80/https:443 are default — ftp:21 is kept verbatim
    assert rows[1].url_norm == "ftp://files.net:21/a"
    assert rows[2].url_norm == "http://site.org/y"


def test_normalize_empty_path_and_query_edges(spark):
    rows = _norm(
        spark,
        "http://h.com",
        "http://h.com/p?",
        "http://h.com/p?utm_a=1&fbclid=z",
        "http://h.com/p?ref=x&refresh=1",
    )
    assert rows[0].url_norm == "http://h.com/"
    assert rows[1].url_norm == "http://h.com/p"
    assert rows[2].url_norm == "http://h.com/p"  # tracking-only query
    # 'ref' is an exact key match; 'refresh' must survive
    assert rows[3].url_norm == "http://h.com/p?refresh=1"


def test_normalize_question_mark_inside_fragment(spark):
    """A '?' that appears only inside the fragment must not fabricate a
    query string — the fragment is stripped before query extraction."""
    rows = _norm(
        spark,
        "http://h.com/p#sec?x=1",
        "http://h.com/p",
        "http://h.com/p?a=1#frag?b=2",
    )
    assert rows[0].url_norm == "http://h.com/p"
    assert rows[0].url_norm == rows[1].url_norm  # dedup-equal
    # a real query before the fragment survives; the fragment's '?b=2'
    # does not leak into it
    assert rows[2].url_norm == "http://h.com/p?a=1"


def test_normalize_invalid_inputs(spark):
    rows = _norm(spark, "not a url", "/relative/only", "")
    for r in rows.values():
        assert r.valid is False and r.url_norm is None and r.host is None
    df = spark.createDataFrame([(9, None)], "doc_id long, url string")
    r = normalize_urls(df).first()
    assert r.valid is False and r.url_norm is None


def test_url_dedup_first_seen(spark):
    df = spark.createDataFrame(
        [
            (3, "http://A.com/x?b=2&a=1"),
            (1, "HTTP://a.com/x/?a=1&b=2&utm_c=9"),
            (2, "http://a.com/x?a=1&b=2#f"),
            (4, "http://a.com/y"),
            (5, "garbage"),
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.keep for r in url_dedup(df).collect()}
    # ids 1-3 canonicalize identically -> smallest id wins
    assert got == {1: True, 2: False, 3: False, 4: True, 5: False}


def test_url_dedup_hash_key_equivalence(spark):
    rows = [
        (i, f"http://site{i % 7}.com/p/{i % 23}"
            + ("?utm_x=1" if i % 3 == 0 else ""))
        for i in range(200)
    ] + [(999, "garbage")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    plain = {(r.doc_id, r.url_norm, r.keep)
             for r in url_dedup(df).collect()}
    hashed = {(r.doc_id, r.url_norm, r.keep)
              for r in url_dedup(df, hash_key=True).collect()}
    assert plain == hashed
    # and the hashed plan shuffles longs, not canonical strings
    plan = (
        url_dedup(df, hash_key=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "xxhash64" in plan, plan


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "http://a.com/x"),
            (2, "http://A.com/x/"),   # same canonical as 1
            (3, "http://a.com/y"),
            (4, "https://b.org/"),
            (5, "nope"),
        ],
        "doc_id long, url string",
    )
    got = {r.host: (r.n_docs, r.n_urls) for r in domain_stats(df).collect()}
    assert got == {"a.com": (3, 2), "b.org": (1, 1)}


def test_normalize_idempotent_on_generated_frontier(spark):
    """Canonicalization must be a FIXED POINT: re-normalizing every
    canonical URL returns it unchanged. One pass over a generated
    adversarial mix covering the whole rule space (case, ports,
    params in every order, tracking junk, slashes, fragments,
    fragment-embedded '?')."""
    schemes = ["http", "HTTPS", "ftp"]
    hosts = ["A.com", "www.B.org:8080", "c.net:443", "d.io:80"]
    paths = ["", "/", "/x", "/x/", "//y//"]
    queries = ["", "?b=2&a=1", "?utm_s=1", "?a=1&utm_s=2&b=2", "?ref=z"]
    frags = ["", "#f", "#sec?x=1"]
    urls, i = [], 0
    for sc in schemes:
        for h in hosts:
            for p in paths:
                for q in queries:
                    for f in frags:
                        urls.append((i, f"{sc}://{h}{p}{q}{f}"))
                        i += 1
    df = spark.createDataFrame(urls, "doc_id long, url string")
    first = normalize_urls(df).where("valid").select(
        "doc_id", F.col("url_norm").alias("url")
    )
    again = normalize_urls(first).select("doc_id", "url_norm", "valid")
    joined = first.join(again, "doc_id")
    assert joined.count() == len(urls)
    assert joined.where("NOT valid OR url != url_norm").count() == 0


def test_normalize_plan_map_only(spark):
    df = spark.createDataFrame(
        [(1, "http://a.com/x")], "doc_id long, url string"
    )
    plan = (
        normalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan


def test_domain_stats_hash_key_equivalence(spark):
    rows = [
        (i, f"http://site{i % 5}.com/p/{i % 17}"
            + ("#frag" if i % 2 == 0 else ""))
        for i in range(150)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    plain = {(r.host, r.n_docs, r.n_urls)
             for r in domain_stats(df).collect()}
    hashed = {(r.host, r.n_docs, r.n_urls)
              for r in domain_stats(df, hash_key=True).collect()}
    assert plain == hashed
