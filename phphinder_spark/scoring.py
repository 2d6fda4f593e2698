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

from pyspark.sql import Column, DataFrame, functions as F

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
                    terms_col, F.array(*[F.lit(v) for v in vals])
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
) -> DataFrame:
    """Disjunctive (OR) BM25 top-k over one field.

    Plan shape: postings filtered to |terms| dictionary keys (parquet
    min/max skipping prunes segments), broadcast-joined df stats, one hash
    aggregate, then TakeOrderedAndProject for the global top-k — no full
    sort. Deterministic tie-break (score desc, doc_id asc).
    """
    hits = postings.where(
        (F.col("field") == field) & F.col("term").isin([str(t) for t in terms])
    )
    dfreq = hits.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
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
