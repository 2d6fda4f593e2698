"""Base62 goldens (reference: tests/Unit/Utils/IDEncoderTest.php:12-54)."""

from phphinder_spark.functions import base62_compare, base62_decode, base62_encode
from phphinder_spark.functions.typo import levenshtein_distance_for_term


def test_encode():
    assert base62_encode(0) == "0"
    assert base62_encode(61) == "z"
    assert base62_encode(62) == "10"
    assert base62_encode(3844) == "100"


def test_decode():
    assert base62_decode("0") == 0
    assert base62_decode("z") == 61
    assert base62_decode("10") == 62
    assert base62_decode("100") == 3844


def test_roundtrip():
    for n in [0, 1, 61, 62, 12345, 10**12]:
        assert base62_decode(base62_encode(n)) == n


def test_compare():
    assert base62_compare("z", "10") < 0
    assert base62_compare("10", "z") > 0
    assert base62_compare("10", "10") == 0


def test_typo_threshold():
    # reference: src/Utils/TypoTolerance.php:23-38
    assert levenshtein_distance_for_term("catt") == 0
    assert levenshtein_distance_for_term("winder") == 1
    assert levenshtein_distance_for_term("phphender") == 2
    assert levenshtein_distance_for_term("gripho") == 1
