"""CCNet-style bigram-LM perplexity filtering (ops/lm.py).

Hand-derived add-k math on a 3-doc corpus, held-out backoff/OOV paths,
empty-doc NULL propagation, bucket assignment, and a DuckDB replay of
the whole train+score flow on real sf0.001 documents (the same shape
the driver oracle runs at sf0.01).
"""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops.lm import (
    perplexity_buckets,
    score_perplexity,
    train_bigram_lm,
)

SF_DIR = "/root/testdata/sf0.001"


def _r6(x):
    return round(x, 6)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "")],
        ["doc_id", "text"],
    )


def _lm_rows(lm_df):
    return {(r.w1, r.w2): r.logp for r in lm_df.collect()}


def test_train_bigram_lm_hand_math(spark, tiny):
    # bigrams: d1 -> (<s>,a),(a,b),(b,a); d2 -> (<s>,a),(a,c); d3 none
    # c12: (<s>,a)=2 (a,b)=1 (b,a)=1 (a,c)=1; c1: <s>=2 a=2 b=1
    # V = |{a,b,c}| = 3, k=0.5 -> kV = 1.5
    lm = _lm_rows(train_bigram_lm(tiny, k=0.5))
    assert lm[("<s>", "a")] == _r6(math.log(2.5 / 3.5))
    assert lm[("a", "b")] == _r6(math.log(1.5 / 3.5))
    assert lm[("b", "a")] == _r6(math.log(1.5 / 2.5))
    assert lm[("a", "c")] == _r6(math.log(1.5 / 3.5))
    # per-w1 backoff rows
    assert lm[("<s>", None)] == _r6(math.log(0.5 / 3.5))
    assert lm[("a", None)] == _r6(math.log(0.5 / 3.5))
    assert lm[("b", None)] == _r6(math.log(0.5 / 2.5))
    # one global OOV row
    assert lm[(None, None)] == _r6(math.log(1.0 / 3.0))
    assert len(lm) == 8


def test_score_observed_and_empty(spark, tiny):
    lm = train_bigram_lm(tiny, k=0.5)
    out = {r.doc_id: r for r in score_perplexity(tiny, lm).collect()}
    lp = (
        _r6(math.log(2.5 / 3.5))
        + _r6(math.log(1.5 / 3.5))
        + _r6(math.log(1.5 / 2.5))
    )
    nll = _r6(_r6(-lp) / 3)
    assert out[1].n_bigrams == 3
    assert out[1].nll_total == _r6(-lp)
    assert out[1].nll == nll
    assert out[1].ppl == _r6(math.exp(nll))
    # empty doc: zero bigrams, NULL scores
    assert out[3].n_bigrams == 0
    assert out[3].nll_total is None
    assert out[3].nll is None and out[3].ppl is None
    assert set(out) == {1, 2, 3}


def test_score_heldout_backoff_and_oov(spark, tiny):
    """Held-out doc 'z a': (<s>,z) unseen continuation -> <s> backoff;
    (z,a) unseen history -> global OOV."""
    lm = train_bigram_lm(tiny, k=0.5)
    held = spark.createDataFrame([(9, "z a")], ["doc_id", "text"])
    row = score_perplexity(held, lm).collect()[0]
    lp = _r6(math.log(0.5 / 3.5)) + _r6(math.log(1.0 / 3.0))
    assert row.n_bigrams == 2
    assert row.nll == _r6(_r6(-lp) / 2)


def test_buckets_including_null_tail(spark, tiny):
    lm = train_bigram_lm(tiny, k=0.5)
    scored = score_perplexity(tiny, lm)
    got = {
        r.doc_id: r.bucket
        for r in perplexity_buckets(scored, lo=1.78, hi=2.0).collect()
    }
    # d1 ppl ~1.759 (head), d2 ppl ~1.807 (middle), d3 NULL -> tail
    assert got == {1: "head", 2: "middle", 3: "tail"}


def test_empty_training_corpus(spark):
    """V=0 degenerate LM: one NULL-logp OOV row (no ANSI divide-by-zero),
    and scoring against it yields NULL nll for every doc."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    sch = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    m0 = train_bigram_lm(spark.createDataFrame([], sch))
    rows = m0.collect()
    assert len(rows) == 1
    assert rows[0].w1 is None and rows[0].w2 is None and rows[0].logp is None
    one = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    out = score_perplexity(one, m0).collect()[0]
    assert out.n_bigrams == 1
    assert out.nll_total is None and out.ppl is None


def test_duckdb_parity_real_corpus(spark):
    """Train on the even-doc_id half of sf0.001, score everything —
    exercises obs/backoff/OOV on real data and replays the identical
    computation in DuckDB (the driver-oracle shape)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0), k=0.5)
    got = {
        r.doc_id: (r.n_bigrams, r.nll_total)
        for r in score_perplexity(docs, lm).collect()
    }
    sql = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\W+'),
                     x -> x <> '') AS toks
  FROM read_parquet('{sf}/documents.parquet')
), wi AS (
  SELECT doc_id, list_prepend('<s>', toks) AS ts FROM t
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS b
  FROM wi
), ba AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bi),
c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM ba
  WHERE doc_id % 2 = 0 GROUP BY 1, 2
), c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY 1),
v AS (SELECT count(DISTINCT w2) AS v FROM c12),
obs AS (
  SELECT c12.w1, c12.w2,
         round(ln((c12 + 0.5) / (c1 + 0.5 * v)), 6) AS logp
  FROM c12 JOIN c1 USING (w1), v
), bo AS (
  SELECT w1, round(ln(0.5 / (c1 + 0.5 * v)), 6) AS logp_bo FROM c1, v
), sc AS (
  SELECT ba.doc_id, count(*) AS n_bigrams,
         round(-sum(coalesce(obs.logp, bo.logp_bo,
                             (SELECT round(ln(1.0 / v), 6) FROM v))),
               6) AS nll_total
  FROM ba
  LEFT JOIN obs ON ba.w1 = obs.w1 AND ba.w2 = obs.w2
  LEFT JOIN bo ON ba.w1 = bo.w1
  GROUP BY 1
)
SELECT t.doc_id, CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       sc.nll_total
FROM t LEFT JOIN sc USING (doc_id)
""".format(sf=SF_DIR)
    want = {
        int(d): (int(n), x)
        for d, n, x in duckdb.sql(sql).fetchall()
    }
    assert got == want


def test_dsir_log_weights_semantics(spark):
    """logw = nll_total_raw - nll_total_target (grid-stable difference),
    and a doc resembling the target domain outranks one resembling the
    raw pool."""
    from phphinder_spark.ops.lm import dsir_log_weights, dsir_select_topk

    target = spark.createDataFrame(
        [(1, "spark sql query plan"), (2, "spark query engine")],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [(1, "cat dog fish bird"), (2, "dog cat bird")], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(10, "spark query plan"), (11, "cat dog bird"), (12, "")],
        ["doc_id", "text"],
    )
    lm_t = train_bigram_lm(target, k=0.5)
    lm_r = train_bigram_lm(raw, k=0.5)
    out = {r.doc_id: r for r in dsir_log_weights(docs, lm_t, lm_r).collect()}
    # cross-check against two explicit scoring passes
    nt_t = {
        r.doc_id: r.nll_total for r in score_perplexity(docs, lm_t).collect()
    }
    nt_r = {
        r.doc_id: r.nll_total for r in score_perplexity(docs, lm_r).collect()
    }
    for d in (10, 11):
        assert out[d].logw == _r6(nt_r[d] - nt_t[d])
    assert out[10].logw > 0 > out[11].logw
    assert out[12].logw is None and out[12].n_bigrams == 0
    # top-1 selection picks the target-like doc; NULL logw sorts last
    top = dsir_select_topk(dsir_log_weights(docs, lm_t, lm_r), 2).collect()
    assert [r.doc_id for r in top] == [10, 11]


def test_score_broadcast_lm_equivalent(spark):
    """broadcast_lm=True is a join-strategy hint only — per-doc rows
    must match the shuffle path exactly (same pre-rounded terms)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs.where(F.col("doc_id") % 2 == 0))
    a = sorted(map(tuple, score_perplexity(docs, lm).collect()))
    b = sorted(
        map(
            tuple,
            score_perplexity(docs, lm, broadcast_lm=True).collect(),
        )
    )
    assert a == b


def _plan_of(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_broadcast_lm_plan_has_no_bigram_shuffle(spark):
    """broadcast_lm=True: all three LM joins are broadcast-hash, so the
    only Exchange left is the per-doc rollup (plus the final id
    re-attach) — the corpus is never shuffled on the bigram key."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs).localCheckpoint()
    plan = _plan_of(score_perplexity(docs, lm, broadcast_lm=True))
    # the only sort-merge join allowed is the final doc-id re-attach;
    # no join (hence no exchange) may be keyed on the bigram columns
    assert "SortMergeJoin [w1" not in plan
    assert "hashpartitioning(w1" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # obs + backoff


def test_suggest_cutoffs(spark):
    from phphinder_spark.ops.lm import suggest_cutoffs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lm = train_bigram_lm(docs)
    scored = score_perplexity(docs, lm)
    lo, hi = suggest_cutoffs(scored)
    ppls = sorted(
        r.ppl for r in scored.select("ppl").collect() if r.ppl is not None
    )
    assert ppls[0] <= lo <= hi <= ppls[-1]
    # buckets under the suggested literals split into three non-empty
    # groups on this corpus
    counts = {
        r.bucket: r["count"]
        for r in perplexity_buckets(scored, lo, hi)
        .groupBy("bucket")
        .count()
        .collect()
    }
    assert set(counts) == {"head", "middle", "tail"}
