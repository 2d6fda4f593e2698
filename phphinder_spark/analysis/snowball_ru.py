"""Snowball Russian stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/russian/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the Russian algorithm for a ``StemmerTransformer('ru')`` chain.

All ending searches run inside RV (the region after the first vowel);
group-1 endings require a preceding а/я that itself lies in RV (Snowball's
`setlimit tolimit $pV` constrains the test cursor too).

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("аеиоуыэюя")

# perfective gerund
_PG_G1 = ("вшись", "вши", "в")           # preceded by а/я (kept)
_PG_G2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")

_REFLEXIVE = ("ся", "сь")

_ADJECTIVE = (
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых", "ею",
    "ою", "ую", "юю", "ая", "яя",
)
_PART_G1 = ("ем", "нн", "вш", "ющ", "щ")  # preceded by а/я (kept)
_PART_G2 = ("ивш", "ывш", "ующ")

_VERB_G1 = (
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
)
_VERB_G2 = (
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
)

_NOUN = (
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
    "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам", "ом",
    "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й", "о", "у",
    "ы", "ь", "ю", "я",
)

_DERIVATIONAL = ("ость", "ост")
_SUPERLATIVE = ("ейше", "ейш")


def _rv_r2(word: str) -> tuple[int, int]:
    n = len(word)
    rv = n
    for i, ch in enumerate(word):
        if ch in _VOWELS:
            rv = i + 1
            break
    r1 = n
    for i in range(1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r1 = i + 1
            break
    r2 = n
    for i in range(r1 + 1, n):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return rv, r2


def _match(word: str, limit: int, suffixes: tuple[str, ...], g1: bool = False) -> str | None:
    """Longest suffix lying entirely in the region starting at ``limit``;
    with ``g1`` the preceding char must be а/я and also lie in the region."""
    best = None
    for suf in suffixes:
        pos = len(word) - len(suf)
        if not word.endswith(suf) or pos < limit:
            continue
        if g1 and not (pos - 1 >= limit and word[pos - 1] in "ая"):
            continue
        if best is None or len(suf) > len(best):
            best = suf
    return best


def stem(word: str) -> str:
    word = word.lower().replace("ё", "е")
    rv, r2 = _rv_r2(word)

    # ---- step 1
    # perfective gerund (longest across both groups; group-1 condition)
    g1 = _match(word, rv, _PG_G1, g1=True)
    g2 = _match(word, rv, _PG_G2)
    suf = max((s for s in (g1, g2) if s), key=len, default=None)
    if suf is not None:
        word = word[: -len(suf)]
    else:
        # reflexive
        suf = _match(word, rv, _REFLEXIVE)
        if suf is not None:
            word = word[: -len(suf)]
        # adjectival = adjective, optionally preceded by a participle
        suf = _match(word, rv, _ADJECTIVE)
        if suf is not None:
            word = word[: -len(suf)]
            p1 = _match(word, rv, _PART_G1, g1=True)
            p2 = _match(word, rv, _PART_G2)
            psuf = max((s for s in (p1, p2) if s), key=len, default=None)
            if psuf is not None:
                word = word[: -len(psuf)]
        else:
            v1 = _match(word, rv, _VERB_G1, g1=True)
            v2 = _match(word, rv, _VERB_G2)
            suf = max((s for s in (v1, v2) if s), key=len, default=None)
            if suf is not None:
                word = word[: -len(suf)]
            else:
                suf = _match(word, rv, _NOUN)
                if suf is not None:
                    word = word[: -len(suf)]

    # ---- step 2: final и in RV
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # ---- step 3: derivational in R2
    suf = _match(word, r2, _DERIVATIONAL)
    if suf is not None:
        word = word[: -len(suf)]

    # ---- step 4: нн -> н | superlative (then нн -> н) | final ь
    if word.endswith("нн") and len(word) - 2 >= rv:
        word = word[:-1]
    else:
        suf = _match(word, rv, _SUPERLATIVE)
        if suf is not None:
            word = word[: -len(suf)]
            if word.endswith("нн") and len(word) - 2 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]
    return word
