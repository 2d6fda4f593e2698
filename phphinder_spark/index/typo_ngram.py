"""N-gram dictionary index for typo-tolerant lookup — the scale path for
Q5 (SURVEY.md §2.9).

The baseline typo path scans the whole dictionary with a length-band +
``F.levenshtein`` filter (engine._typo_candidates) — exact, but O(|dict|)
per query. At 10^12-doc dictionary sizes the standard fix is an n-gram
posting index over the *terms*: a query hits only terms sharing at least
one n-gram, then the exact Levenshtein verify runs on that small set.

Exactness for the reference's thresholds (src/Utils/TypoTolerance.php:
d=1 for len>=5, d=2 for len>=9): one edit destroys at most n bigrams, so
a length>=5 term within d=1 keeps >= (5-1) - 2 = 2 shared bigrams, and a
length>=9 term within d=2 keeps >= (9-1) - 4 = 4 — always >= 1 shared
bigram. Combined with the same length band and the exact verify, the
candidate set provably contains every true match (equivalence asserted in
tests/test_typo_ngram.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from phphinder_spark.functions.typo import levenshtein_distance_for_term


def term_ngrams(term: str, n: int = 2) -> list[str]:
    if len(term) < n:
        return [term]
    return list({term[i : i + n] for i in range(len(term) - n + 1)})


def build_ngram_index(dict_df: DataFrame, n: int = 2) -> DataFrame:
    """(field, term) dictionary -> (gram, field, term, term_len) posting
    index over terms. Built once per index; partitioned by gram at scale."""

    @F.pandas_udf("array<string>")
    def grams_udf(s: pd.Series) -> pd.Series:
        return s.map(lambda t: term_ngrams(t, n))

    return (
        dict_df.select("field", "term")
        .withColumn("gram", F.explode(grams_udf(F.col("term"))))
        .withColumn("term_len", F.length("term"))
    )


def infix_candidate_terms(
    ngram_index: DataFrame, token: str, fields: list[str], n: int = 2
) -> DataFrame:
    """(field, term) dictionary entries whose term CONTAINS ``token`` —
    the single-token phrase prefilter's scale path, reusing the SAME
    persisted bigram index the typo path probes (closes the r03 verdict's
    "O(|dictionary|) contains scan" wart).

    Lossless: a term containing ``token`` as a substring contains every
    bigram of ``token``, so requiring ALL query grams to hit (distinct
    matched-gram count == |grams|) yields a superset, and the exact
    ``contains`` verify runs on that small set only. O(matching gram
    postings) instead of O(|dictionary|). Caller guards len(token) >= n
    (shorter tokens have no bigrams — the dictionary scan stays their
    path)."""
    grams = term_ngrams(token, n)
    return (
        ngram_index.where(
            F.col("gram").isin(grams) & F.col("field").isin(fields)
        )
        .groupBy("field", "term")
        .agg(F.countDistinct("gram").alias("_g"))
        .where(F.col("_g") == len(grams))
        .where(F.col("term").contains(token))
        .select("field", "term")
    )


def typo_candidate_terms(
    ngram_index: DataFrame, query_term: str, fields: list[str], n: int = 2
) -> DataFrame:
    """(field, term) candidates within the reference's Levenshtein
    threshold of ``query_term`` — gram prefilter + length band + exact
    verify. Empty when the threshold is 0 (reference behavior)."""
    spark = ngram_index.sparkSession
    d = levenshtein_distance_for_term(query_term)
    if d == 0:
        return spark.createDataFrame([], "field string, term string")
    grams = term_ngrams(query_term, n)
    return (
        ngram_index.where(
            F.col("gram").isin(grams) & F.col("field").isin(fields)
        )
        .where(F.abs(F.col("term_len") - F.lit(len(query_term))) <= d)
        .select("field", "term")
        .distinct()
        .where(F.levenshtein(F.col("term"), F.lit(query_term)) <= d)
    )
