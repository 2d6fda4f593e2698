"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Built-in Column expressions where possible
(whole-stage codegen); Arrow-vectorized pandas UDFs otherwise.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from phphinder_spark.analysis.stopwords_en import STOPWORDS_EN

# tiny built-in stopword profiles for the language-ID heuristic (public
# common-word lists; deterministic)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "que", "dans"},
}

_TOKEN_SPLIT = r"\W+"


def tokens_col(col: str) -> F.Column:
    """Lowercased word tokens as an array column (empties removed) —
    JVM-side equivalent of the engine's RegexTokenizer + lowercase."""
    return F.filter(F.split(F.lower(F.col(col)), _TOKEN_SPLIT), lambda x: x != "")


def token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — whitespace/\\W tokenization."""
    toks = tokens_col(col)
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


def quality_scores(df: DataFrame, col: str = "text") -> DataFrame:
    """Heuristic quality features per doc, all JVM expressions:
    char length, alpha ratio, punctuation ratio, stopword ratio,
    mean token length — rounded for cross-engine comparability."""
    toks = tokens_col(col)
    raw = F.col(col)
    n_chars = F.length(raw)
    n_alpha = F.length(F.regexp_replace(raw, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(raw, r"[^.,;:!?]", ""))
    stop_arr = F.array(*[F.lit(w) for w in sorted(STOPWORDS_EN)])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_tok = F.size(toks)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("chars_per_token"),
    )


def language_id(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_score) — stopword-profile hit-rate argmax.

    Deterministic tie-break: higher hit count wins, then alphabetical
    language code. Vectorized pandas UDF (Arrow batches)."""

    @F.pandas_udf("string")
    def lang_udf(s: pd.Series) -> pd.Series:
        import re

        def guess(text):
            if text is None:
                return "und"
            toks = set(re.split(r"\W+", text.lower()))
            best = ("und", 0)
            for lang in sorted(_LANG_PROFILES):
                hits = len(toks & _LANG_PROFILES[lang])
                if hits > best[1]:
                    best = (lang, hits)
            return best[0]

        return s.map(guess)

    return df.select("doc_id", lang_udf(F.col(col)).alias("lang_pred"))


def fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, fp64) rolling polynomial hash over word tokens — a cheap,
    order-sensitive document fingerprint (content-defined, whitespace
    insensitive). Vectorized pandas UDF."""

    @F.pandas_udf("long")
    def fp_udf(s: pd.Series) -> pd.Series:
        import re

        mask = (1 << 63) - 1

        def fp(text):
            if text is None:
                return 0
            h = 0
            for tok in re.split(r"\W+", text.lower()):
                if not tok:
                    continue
                h = (h * 1000003 + zlib.crc32(tok.encode())) & mask
            return h

        return s.map(fp)

    return df.select("doc_id", fp_udf(F.col(col)).alias("fp64"))
