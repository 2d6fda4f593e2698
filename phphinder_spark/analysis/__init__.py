from phphinder_spark.analysis.analyzers import (
    Analyzer,
    LowerCaseTransformer,
    RegexTokenizer,
    StemmerTransformer,
    StopWordsFilter,
    SymbolTransformer,
)
from phphinder_spark.analysis.porter2 import stem

__all__ = [
    "Analyzer",
    "LowerCaseTransformer",
    "RegexTokenizer",
    "StemmerTransformer",
    "StopWordsFilter",
    "SymbolTransformer",
    "stem",
]
