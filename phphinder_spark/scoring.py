"""Scoring: the reference-compat weight fold and BM25.

Reference weight semantics (src/SearchEngine.php:296-347, :362-375): per
doc, iterate matched fields in first-match order; for each field whose
query-term group exists, ``score <- 2*score + B`` where ``B`` is the summed
boost of that group's query terms if at least one of them matched the doc,
else 0; then +10 if fulltext, then +2 * |distinct matched terms|. Golden
values 16.0 / 10.0 (tests/Integration/SearchEngineTest.php:121-122).

Everything here is a pure Column expression (whole-stage codegen; no UDFs).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

ANY_FIELD = "*"


def reference_score(
    fields_col: Column,
    terms_col: Column,
    groups: dict[str, tuple[list[str], float]],
    field_labels: list[str],
) -> Column:
    """Closed-form fold of the doubling recurrence over ordered fields.

    ``groups``: query-field label ('*' or a field name) -> (term values,
    summed boost). ``field_labels``: all field names that can appear in a
    doc's matched-field list.
    """

    def resolve(fname: str) -> str | None:
        if fname in groups:
            return fname
        if ANY_FIELD in groups:
            return ANY_FIELD
        return None

    def step(acc: Column, f: Column) -> Column:
        expr = acc
        for fname in field_labels:
            g = resolve(fname)
            if g is None:
                continue
            vals, boost = groups[g]
            if vals:
                overlap = F.arrays_overlap(
                    terms_col, F.lit([str(v) for v in vals])
                )
                contrib = F.when(overlap, F.lit(float(boost))).otherwise(F.lit(0.0))
            else:
                contrib = F.lit(0.0)
            expr = F.when(f == F.lit(fname), acc * 2 + contrib).otherwise(expr)
        return expr

    return F.aggregate(fields_col, F.lit(0.0), step)


def bm25_score_components(
    tf: Column, df_: Column, dl: Column, n_docs: int, avgdl: float,
    k1: float = 1.2, b: float = 0.75,
) -> Column:
    """Per-(term, doc) BM25 contribution; sum per doc gives the score.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the standard Robertson/
    Sparck-Jones form (SURVEY.md §7.3); deterministic regardless of
    partitioning because each component is computed per row and summed
    with a fixed grouping.
    """
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - df_ + F.lit(0.5)) / (df_ + F.lit(0.5)))
    denom = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(float(avgdl)))
    return idf * tf * F.lit(k1 + 1.0) / denom


def bm25_idf(n_docs: int, df_: int) -> float:
    return math.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))


def _df_lookup_col(df_by_term: dict[str, int]) -> Column:
    """term -> df as a literal CASE/map expression (dictionary-sized:
    only the query's terms)."""
    mapping = F.create_map(
        *[x for t, v in sorted(df_by_term.items()) for x in (F.lit(t), F.lit(int(v)))]
    )
    return mapping[F.col("term")]


def bm25_topk(
    postings: DataFrame,
    doclens: DataFrame,
    terms: list[str],
    field: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    df_by_term: dict[str, int] | None = None,
) -> DataFrame:
    """Disjunctive (OR) BM25 top-k over one field.

    Plan shape: postings filtered to |terms| dictionary keys (parquet
    min/max skipping prunes segments), df stats attached, one hash
    aggregate, then TakeOrderedAndProject for the global top-k — no full
    sort. Deterministic tie-break (score desc, doc_id asc).

    ``df_by_term`` (term -> document frequency for ``field``, e.g. from
    the engine's driver-side dictionary cache) replaces the per-query
    dfreq aggregation with a literal lookup — one less shuffle + one less
    broadcast per query; the JVM arithmetic is identical (df enters the
    same expression as a double), so scores are bit-identical."""
    hits = postings.where(
        (F.col("field") == field) & F.col("term").isin([str(t) for t in terms])
    )
    if df_by_term:
        # non-empty only: an empty map is untypable (map()[term]), and
        # means no query term exists in this field — the fallback dfreq
        # aggregation over the (empty) hits is free
        scored = hits.withColumn("df", _df_lookup_col(df_by_term))
    else:
        dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
        scored = hits.join(F.broadcast(dfreq), "term")
    scored = (
        scored
        .join(doclens.where(F.col("field") == field).select("doc_id", "dl"), "doc_id")
        .withColumn(
            "contrib",
            bm25_score_components(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("dl").cast("double"),
                n_docs,
                avgdl,
                k1,
                b,
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk_batch(
    postings: DataFrame,
    doclens: DataFrame,
    queries: dict[str, list[str]],
    field: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    df_by_term: dict[str, int] | None = None,
) -> DataFrame:
    """BM25 top-k for a BATCH of queries in one plan.

    Per-query Spark jobs pay fixed scheduling latency; a query batch joins
    all (query_id, term) pairs against the postings once and ranks per
    query with a window — total cost ~= one query's job for the whole
    batch. Returns (query_id, doc_id, score, rank). ``df_by_term``: see
    :func:`bm25_topk` (skips the batch's dfreq aggregation)."""
    spark = postings.sparkSession
    # set semantics per query: a repeated term must contribute once (same as
    # the single-query path, where `isin` dedups), so dedupe the pairs
    pairs = sorted({(qid, str(t)) for qid, ts in queries.items() for t in ts})
    if not pairs:
        return spark.createDataFrame(
            [], "query_id string, doc_id long, score double, rank int"
        )
    qdf = spark.createDataFrame(pairs, "query_id string, term string")
    hits = postings.where(F.col("field") == field).join(
        F.broadcast(qdf.select("term").distinct()), "term"
    )
    if df_by_term:
        # non-empty only: an empty map is untypable (map()[term]), and
        # means no query term exists in this field — the fallback dfreq
        # aggregation over the (empty) hits is free
        scored = hits.withColumn("df", _df_lookup_col(df_by_term))
    else:
        dfreq = hits.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
        scored = hits.join(F.broadcast(dfreq), "term")
    scored = (
        scored
        .join(doclens.where(F.col("field") == field).select("doc_id", "dl"), "doc_id")
        .withColumn(
            "contrib",
            bm25_score_components(
                F.col("tf").cast("double"),
                F.col("df").cast("double"),
                F.col("dl").cast("double"),
                n_docs,
                avgdl,
                k1,
                b,
            ),
        )
        .join(F.broadcast(qdf), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )


def bm25_topk_blockmax(
    postings: DataFrame,
    doclens: DataFrame,
    terms: list[str],
    field: str,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    chunk_span: int | None = None,
    collect_metrics: bool = False,
) -> tuple[DataFrame, dict]:
    """Block-max pruned BM25 top-k — the WAND-style scale path.

    Exact (provably same top-k as ``bm25_topk``; asserted in tests):
    1. Collect the tiny (term, chunk) statistics table (≤ n_terms·~256
       rows) and compute per-chunk upper bounds
       idf·max_tf·(k1+1)/(max_tf+k1(1−b)) — valid since the BM25
       tf-saturation term is increasing in tf and decreasing in dl.
    2. Seed a threshold θ with the exact scores of docs in the few
       HIGHEST-BOUND chunks (descending bound until the chunks provably
       hold ≥ k docs) — bounded seed cost even when a query mixes a
       needle term with corpus-wide hot terms.
    3. Bound every other doc by its per-(term, chunk) block-max sum;
       docs bounded below θ cannot enter the top-k and are never
       exactly scored. Exact-score survivors, merge, take top-k.

    At 100TB the win is step 3: the bound join touches only postings +
    broadcast chunk stats, and the expensive doclen join + per-doc exact
    scoring runs on the pruned survivor set. Returns (topk_df, metrics).
    """
    terms = [str(t) for t in terms]
    if chunk_span is None:
        # ~256 doc-id-range blocks regardless of corpus size: one global
        # block (the old fixed 2^20 default at < 1M docs) makes the bound
        # the global max and prunes nothing
        chunk_span = max(64, 1 << max(0, (n_docs // 256)).bit_length())
    hits = postings.where(
        (F.col("field") == field) & F.col("term").isin(terms)
    ).withColumn("chunk", F.floor(F.col("doc_id") / F.lit(chunk_span)))
    hits = hits.cache()
    dl = doclens.where(F.col("field") == field).select("doc_id", "dl")

    stat_rows = hits.groupBy("term", "chunk").agg(
        F.max("tf").alias("max_tf"), F.count("*").alias("cdf")
    ).collect()
    if not stat_rows:
        empty = postings.sparkSession.createDataFrame([], "doc_id long, score double")
        metrics = {"theta": float("-inf")}
        if collect_metrics:
            metrics.update(candidates=0, scored=0, pruned_fraction=0.0)
        return empty, metrics
    dfreq: dict[str, int] = {}
    for r in stat_rows:
        dfreq[r["term"]] = dfreq.get(r["term"], 0) + r["cdf"]
    idf = {t: bm25_idf(n_docs, dfreq[t]) for t in dfreq}

    def exact_scores(cand_hits: DataFrame) -> DataFrame:
        idf_col = F.create_map(
            *[x for t, v in idf.items() for x in (F.lit(t), F.lit(v))]
        )
        return (
            cand_hits.join(dl, "doc_id")
            .withColumn(
                "contrib",
                idf_col[F.col("term")]
                * F.col("tf")
                * F.lit(k1 + 1.0)
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
                ),
            )
            .groupBy("doc_id")
            .agg(F.round(F.sum("contrib"), 6).alias("score"))
        )

    # per-(term, chunk) upper bounds, driver-side on the tiny stats table
    ub_rows = [
        (
            r["term"],
            r["chunk"],
            float(
                idf[r["term"]]
                * r["max_tf"]
                * (k1 + 1.0)
                / (r["max_tf"] + k1 * (1.0 - b))
            ),
        )
        for r in stat_rows
    ]
    spark = postings.sparkSession
    chunk_stats = spark.createDataFrame(
        ub_rows, "term string, chunk long, ub double"
    )
    # doc-level bounds: one agg over the term-filtered postings — no
    # doclen join, no exact scoring
    bounded_all = (
        hits.join(F.broadcast(chunk_stats), ["term", "chunk"])
        .groupBy("doc_id")
        .agg(F.sum("ub").alias("bound"))
        .cache()
    )

    # 2. seed θ: exact-score the top-4k docs BY BOUND (bound-ordered
    # probing — the docs most likely to set a high threshold, at a cost
    # independent of any term's document frequency)
    seed_ids = [
        (r["doc_id"],)
        for r in bounded_all.orderBy(F.desc("bound"), F.asc("doc_id"))
        .limit(4 * k)
        .collect()
    ]
    # broadcast-join the seed frame rather than embedding up to 4k doc_id
    # literals in the plan twice (isin over thousands of literals bloats
    # the plan and re-parses per use)
    seed_df = spark.createDataFrame(seed_ids, "doc_id long")
    seed_scores = exact_scores(
        hits.join(F.broadcast(seed_df), "doc_id", "left_semi")
    ).cache()
    kth = (
        seed_scores.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .collect()
    )
    theta = kth[-1]["score"] if len(kth) >= k else float("-inf")

    # 3. survivors: unscored docs whose bound clears θ
    bounded = bounded_all.join(F.broadcast(seed_df), "doc_id", "left_anti")
    # 1e-6 slack absorbs the 6-dp rounding of θ (scores are compared rounded)
    survivors = bounded.where(F.col("bound") >= theta - 1e-6).select("doc_id")

    metrics = {"theta": theta}
    if collect_metrics:
        # two extra actions — diagnostics only, keep them out of the hot path
        n_cands = bounded.count()
        n_surv = survivors.count()
        metrics.update(
            candidates=n_cands,
            scored=n_surv,
            pruned_fraction=round(1.0 - n_surv / max(n_cands, 1), 4),
        )

    survivor_scores = exact_scores(
        hits.join(survivors, "doc_id", "left_semi")
    )
    topk = (
        seed_scores.unionByName(survivor_scores)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    # the plan is already eager (θ needs a collect), so materialize the ≤k
    # result rows and release the caches — no cache leak across queries
    rows = topk.collect()
    out = postings.sparkSession.createDataFrame(rows, topk.schema)
    hits.unpersist()
    bounded_all.unpersist()
    seed_scores.unpersist()
    return out, metrics
