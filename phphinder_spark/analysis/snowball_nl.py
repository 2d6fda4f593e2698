"""Snowball Dutch stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/dutch/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the Dutch algorithm for a ``StemmerTransformer('nl')`` chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyè")

_FOLD = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _mark(word: str) -> str:
    """Fold umlaut/acute accents, then set initial y, y after a vowel and
    i between vowels to upper case (treated as consonants)."""
    word = word.translate(_FOLD)
    out = list(word)
    for i, ch in enumerate(out):
        if ch == "y" and (i == 0 or out[i - 1] in _VOWELS):
            out[i] = "Y"
        elif (
            ch == "i"
            and 0 < i < len(out) - 1
            and out[i - 1] in _VOWELS
            and out[i + 1] in _VOWELS
        ):
            out[i] = "I"
    return "".join(out)


def _r1_r2(word: str) -> tuple[int, int]:
    r1 = len(word)
    r2 = len(word)
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    # R1 is adjusted so that the region before it contains >= 3 letters
    r1 = max(r1, min(3, len(word)))
    for i in range(r1 + 1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _undouble(word: str) -> str:
    """Remove the last letter if the word ends kk, dd or tt."""
    if word[-2:] in ("kk", "dd", "tt"):
        return word[:-1]
    return word


def _valid_s_ending(word: str, pos: int) -> bool:
    """Char before ``pos`` is a non-vowel other than j."""
    return pos >= 1 and word[pos - 1] not in _VOWELS and word[pos - 1] != "j"


def _valid_en_ending(word: str, pos: int) -> bool:
    """Char before ``pos`` is a non-vowel, and not preceded by gem."""
    return (
        pos >= 1
        and word[pos - 1] not in _VOWELS
        and word[max(0, pos - 3) : pos] != "gem"
    )


def stem(word: str) -> str:
    word = _mark(word.lower())
    r1, r2 = _r1_r2(word)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 1 (longest among heden / ene en / se s)
    if word.endswith("heden"):
        pos = len(word) - 5
        if in_r1(pos):
            word = word[:pos] + "heid"
    elif word.endswith("ene") or word.endswith("en"):
        suf = "ene" if word.endswith("ene") else "en"
        pos = len(word) - len(suf)
        if in_r1(pos) and _valid_en_ending(word, pos):
            word = _undouble(word[:pos])
    elif word.endswith("se") or word.endswith("s"):
        suf = "se" if word.endswith("se") else "s"
        pos = len(word) - len(suf)
        if in_r1(pos) and _valid_s_ending(word, pos):
            word = word[:pos]

    # ---- step 2: delete final e if in R1 and preceded by a non-vowel
    e_removed = False
    if word.endswith("e"):
        pos = len(word) - 1
        if in_r1(pos) and pos >= 1 and word[pos - 1] not in _VOWELS:
            word = _undouble(word[:pos])
            e_removed = True

    # ---- step 3a: heid
    if word.endswith("heid"):
        pos = len(word) - 4
        if in_r2(pos) and (pos < 1 or word[pos - 1] != "c"):
            word = word[:pos]
            if word.endswith("en"):
                pos = len(word) - 2
                if in_r1(pos) and _valid_en_ending(word, pos):
                    word = _undouble(word[:pos])

    # ---- step 3b: d-suffixes (longest among end/ing, ig, lijk, baar, bar)
    if word.endswith("end") or word.endswith("ing"):
        pos = len(word) - 3
        if in_r2(pos):
            word = word[:pos]
            if (
                word.endswith("ig")
                and in_r2(len(word) - 2)
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
            else:
                word = _undouble(word)
    elif word.endswith("lijk"):
        pos = len(word) - 4
        if in_r2(pos):
            word = word[:pos]
            # then repeat step 2
            if word.endswith("e"):
                pos = len(word) - 1
                if in_r1(pos) and pos >= 1 and word[pos - 1] not in _VOWELS:
                    word = _undouble(word[:pos])
    elif word.endswith("baar"):
        pos = len(word) - 4
        if in_r2(pos):
            word = word[:pos]
    elif word.endswith("ig"):
        pos = len(word) - 2
        if in_r2(pos) and (pos < 1 or word[pos - 1] != "e"):
            word = word[:pos]
    elif word.endswith("bar"):
        pos = len(word) - 3
        if in_r2(pos) and e_removed:
            word = word[:pos]

    # ---- step 4: undouble vowel (CVVD, D a non-vowel other than I,
    # VV one of aa ee oo uu -> drop one vowel)
    if len(word) >= 4:
        c, v1, v2, d = word[-4], word[-3], word[-2], word[-1]
        if (
            c not in _VOWELS
            and d not in _VOWELS
            and d != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            word = word[:-2] + word[-1]

    return word.replace("Y", "y").replace("I", "i")
