"""Snowball German stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/german/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the German algorithm for analyzer parity with a
``StemmerTransformer('de')`` chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _mark_regions(word: str) -> tuple[int, int]:
    """(r1, r2) start offsets on the MARKED word (U/Y are consonants);
    r1 is moved to >= 3 per the algorithm."""
    r1 = len(word)
    r2 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    for i in range(r1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    if r1 < 3:
        r1 = 3
    return r1, r2


def stem(word: str) -> str:
    word = word.lower().replace("ß", "ss")

    # u/y between vowels are consonants for region purposes: mark upper
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        elif chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _mark_regions(word)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 1: longest of (a) em ern er | (b) e en es | (c) s
    w = word
    for suf in ("ern", "em", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        for suf in ("en", "es", "e"):
            if w.endswith(suf):
                if in_r1(len(w) - len(suf)):
                    w = w[: -len(suf)]
                    if w.endswith("niss"):
                        w = w[:-1]
                break
        else:
            if (
                w.endswith("s")
                and in_r1(len(w) - 1)
                and len(w) >= 2
                and w[-2].lower() in _S_ENDING
            ):
                w = w[:-1]

    # ---- step 2: longest of (a) est en er | (b) st
    for suf in ("est", "en", "er"):
        if w.endswith(suf):
            if in_r1(len(w) - len(suf)):
                w = w[: -len(suf)]
            break
    else:
        if (
            w.endswith("st")
            and in_r1(len(w) - 2)
            and len(w) >= 6  # valid st-ending preceded by >= 3 letters
            and w[-3].lower() in _ST_ENDING
        ):
            w = w[:-2]

    # ---- step 3: d-suffixes
    if w.endswith(("end", "ung")):
        if in_r2(len(w) - 3):
            w = w[:-3]
            if w.endswith("ig") and in_r2(len(w) - 2) and not w.endswith("eig"):
                w = w[:-2]
    elif w.endswith(("isch",)):
        if in_r2(len(w) - 4) and not w.endswith("eisch"):
            w = w[:-4]
    elif w.endswith(("ig", "ik")):
        if in_r2(len(w) - 2) and not (w.endswith("eig") or w.endswith("eik")):
            w = w[:-2]
    elif w.endswith(("lich", "heit")):
        if in_r2(len(w) - 4):
            w = w[:-4]
            for pre in ("er", "en"):
                if w.endswith(pre) and in_r1(len(w) - 2):
                    w = w[:-2]
                    break
    elif w.endswith("keit"):
        if in_r2(len(w) - 4):
            w = w[:-4]
            if w.endswith("lich") and in_r2(len(w) - 4):
                w = w[:-4]
            elif w.endswith("ig") and in_r2(len(w) - 2):
                w = w[:-2]

    # ---- finally
    w = w.lower()
    return (
        w.replace("ä", "a").replace("ö", "o").replace("ü", "u")
    )
