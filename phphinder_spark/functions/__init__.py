from phphinder_spark.functions.idencoder import base62_compare, base62_decode, base62_encode
from phphinder_spark.functions.typo import levenshtein_distance_for_term

__all__ = [
    "base62_encode",
    "base62_decode",
    "base62_compare",
    "levenshtein_distance_for_term",
]
