"""Snowball Danish, Norwegian (Bokmål) and Swedish stemmers, pure Python.

Implemented from the published algorithm descriptions
(https://snowballstem.org/algorithms/{danish,norwegian,swedish}/stemmer.html).
The three algorithms share one skeleton — R1-only regions (with the
"at least 3 letters before R1" adjustment), a main suffix among with a
valid-s-ending side condition, a consonant-pair shortening step, and a
small residual step — so they live in one module.

The reference engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39).

Pure functions, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS_DA_NO = frozenset("aeiouyæåø")
_VOWELS_SV = frozenset("aeiouyäåö")


def _r1(word: str, vowels: frozenset) -> int:
    """Standard R1 start, adjusted so >= 3 letters precede it."""
    r1 = len(word)
    for i in range(1, len(word)):
        if word[i] not in vowels and word[i - 1] in vowels:
            r1 = i + 1
            break
    return max(r1, min(3, len(word)))


def _longest_in_r1(word: str, r1: int, suffixes: tuple[str, ...]) -> str | None:
    """Longest suffix of ``word`` from ``suffixes`` lying entirely in R1
    (Snowball: among under `setlimit tolimit $p1`)."""
    best = None
    for suf in suffixes:
        if (
            word.endswith(suf)
            and len(word) - len(suf) >= r1
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


# --------------------------------------------------------------------- danish

_DA_STEP1 = (
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e",
)
_DA_S_ENDING = frozenset("abcdfghjklmnoprtvyzå")
_DA_STEP3 = ("elig", "lig", "els", "ig")


def _da_consonant_pair(word: str, r1: int) -> str:
    """Step 2 / repeated step 2: gd dt gt kt entirely in R1 -> drop last."""
    if len(word) >= 2 and word[-2:] in ("gd", "dt", "gt", "kt") and len(word) - 2 >= r1:
        return word[:-1]
    return word


def stem_da(word: str) -> str:
    word = word.lower()
    r1 = _r1(word, _VOWELS_DA_NO)

    # step 1: longest among main suffixes vs conditional 's' — a main
    # match is always >= the 1-char 's' (no 1-char main suffix can end a
    # word that also ends 's'), so main-if-any else conditional-s is the
    # among's longest-match semantics
    suf = _longest_in_r1(word, r1, _DA_STEP1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _DA_S_ENDING
    ):
        word = word[:-1]

    # step 2: consonant pair
    word = _da_consonant_pair(word, r1)

    # step 3: igst -> drop st; then ig/lig/elig/els (repeat step 2) or løst
    if word.endswith("igst"):
        word = word[:-2]
    if word.endswith("løst") and len(word) - 4 >= r1:
        word = word[:-1]
    else:
        suf = _longest_in_r1(word, r1, _DA_STEP3)
        if suf is not None:
            word = word[: -len(suf)]
            word = _da_consonant_pair(word, r1)

    # step 4: undouble a final double consonant in R1
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] not in _VOWELS_DA_NO
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word


# ------------------------------------------------------------------ norwegian

_NO_STEP1 = (
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "edes",
    "enes", "ande", "ende", "ane", "ene", "ede", "ens", "ers", "ets",
    "het", "ast", "en", "ar", "er", "as", "es", "et", "a", "e",
)
_NO_STEP1_ERT = ("erte", "ert")  # -> er
_NO_S_ENDING = frozenset("bcdfghjlmnoprtvyz")
_NO_STEP3 = (
    "hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
    "els", "lov", "ig",
)


def stem_no(word: str) -> str:
    word = word.lower()
    r1 = _r1(word, _VOWELS_DA_NO)

    # step 1: longest among delete-list / erte|ert -> er / conditional s
    cands: list[tuple[str, str]] = []
    suf = _longest_in_r1(word, r1, _NO_STEP1)
    if suf is not None:
        cands.append((suf, "delete"))
    suf = _longest_in_r1(word, r1, _NO_STEP1_ERT)
    if suf is not None:
        cands.append((suf, "er"))
    if word.endswith("s") and len(word) - 1 >= r1 and len(word) >= 2:
        prev = word[-2]
        if prev in _NO_S_ENDING or (
            prev == "k" and (len(word) < 3 or word[-3] not in _VOWELS_DA_NO)
        ):
            cands.append(("s", "delete"))
    if cands:
        suf, action = max(cands, key=lambda c: len(c[0]))
        word = word[: -len(suf)] + ("er" if action == "er" else "")

    # step 2: dt / vt entirely in R1 -> delete the t
    if len(word) >= 2 and word[-2:] in ("dt", "vt") and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3: residual suffixes
    suf = _longest_in_r1(word, r1, _NO_STEP3)
    if suf is not None:
        word = word[: -len(suf)]
    return word


# -------------------------------------------------------------------- swedish

_SV_STEP1 = (
    "heterna", "hetens", "anden", "andes", "andet", "arens", "arnas",
    "arna", "erna", "orna", "ande", "arne", "aste", "aren", "heten",
    "heter", "ernas", "ornas", "ades", "erns", "ade", "are", "ern",
    "ens", "het", "ast", "ad", "en", "ar", "er", "or", "as", "es",
    "at", "a", "e",
)
_SV_S_ENDING = frozenset("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_STEP3_DEL = ("lig", "els", "ig")


def stem_sv(word: str) -> str:
    word = word.lower()
    r1 = _r1(word, _VOWELS_SV)

    suf = _longest_in_r1(word, r1, _SV_STEP1)
    s_ok = (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _SV_S_ENDING
    )
    if suf is not None:
        word = word[: -len(suf)]
    elif s_ok:
        word = word[:-1]

    # step 2: consonant pairs entirely in R1 -> drop last letter
    if len(word) >= 2 and word[-2:] in _SV_PAIRS and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3: residuals
    if word.endswith("löst") and len(word) - 4 >= r1:
        word = word[:-1]
    elif word.endswith("fullt") and len(word) - 5 >= r1:
        word = word[:-1]
    else:
        suf = _longest_in_r1(word, r1, _SV_STEP3_DEL)
        if suf is not None:
            word = word[: -len(suf)]
    return word
