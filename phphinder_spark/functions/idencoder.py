"""Base62 document-id rendering (display encoding only; ids stay numeric
inside the engine). Behavioral parity with reference src/Utils/IDEncoder.php:
alphabet 0-9A-Za-z, encode(0)='0', 62->'10'; compare orders by decoded value.
"""

from __future__ import annotations

ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
BASE = 62
_INDEX = {c: i for i, c in enumerate(ALPHABET)}


def base62_encode(number: int) -> str:
    if number == 0:
        return ALPHABET[0]
    out = []
    while number > 0:
        number, rem = divmod(number, BASE)
        out.append(ALPHABET[rem])
    return "".join(reversed(out))


def base62_decode(encoded: str) -> int:
    number = 0
    for ch in encoded:
        number = number * BASE + _INDEX[ch]
    return number


def base62_compare(a: str, b: str) -> int:
    da, db = base62_decode(a), base62_decode(b)
    return (da > db) - (da < db)


def base62_col():
    """Arrow-vectorized Column encoder: long doc_id -> base62 display id
    (the reference renders ids base62 — src/Utils/IDEncoder.php; internal
    ids stay numeric per SURVEY §1.5)."""
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("string")
    def enc(s: pd.Series) -> pd.Series:
        return s.map(lambda v: base62_encode(int(v)))

    return enc
