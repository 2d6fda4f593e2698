"""Snowball Spanish stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/spanish/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the Spanish algorithm for a ``StemmerTransformer('es')`` chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúü")

_ACCENT = str.maketrans("áéíóú", "aeiou")


def _rv(word: str) -> int:
    """RV start: if 2nd letter is a consonant, after the next vowel; if
    first two letters are vowels, after the next consonant; otherwise
    (consonant-vowel) after the 3rd letter; else end of word."""
    n = len(word)
    if n < 3:
        return n
    if word[1] not in _VOWELS:
        for i in range(2, n):
            if word[i] in _VOWELS:
                return i + 1
        return n
    if word[0] in _VOWELS and word[1] in _VOWELS:
        for i in range(2, n):
            if word[i] not in _VOWELS:
                return i + 1
        return n
    return 3


def _r1_r2(word: str) -> tuple[int, int]:
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
    return r1, r2


_PRONOUNS = (
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
)

_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")  # remove accent after deletion
_PRE_B = ("iendo", "ando", "ar", "er", "ir")

# step 1 suffix classes (longest match across ALL of them)
_S1_DELETE_R2 = (
    "amientos", "imientos", "amiento", "imiento", "anzas", "ismos",
    "ables", "ibles", "istas", "anza", "icos", "icas", "ismo", "able",
    "ible", "ista", "osos", "osas", "ico", "ica", "oso", "osa",
)
_S1_ADOR = (
    "aciones", "adoras", "adores", "ancias", "adora", "ación", "antes",
    "ancia", "ador", "ante",
)
_S1_LOGIA = ("logías", "logía")
_S1_UCION = ("uciones", "ución")
_S1_ENCIA = ("encias", "encia")
_S1_IDAD = ("idades", "idad")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")

_S2A = (
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
)

_S2B_GU = ("emos", "éis", "en", "es")  # delete; if preceded by gu, drop u
_S2B = (
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "eríais", "iríais", "áramos", "ásemos", "ábamos", "aremos",
    "eremos", "iremos", "ierais", "arían", "arías", "aréis", "erían",
    "erías", "eréis", "irían", "irías", "iréis", "aseis", "ieseis",
    "asteis", "isteis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "íamos", "arán", "arás", "aría",
    "erán", "erás", "ería", "irán", "irás", "iría", "iera", "iese",
    "aste", "iste", "aban", "aran", "asen", "aron", "ando", "abas",
    "adas", "idas", "aras", "ases", "íais", "ados", "idos", "amos",
    "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
    "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis", "ía",
    "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís",
)

_S3_RV = ("os", "a", "o", "á", "í", "ó")


def _longest(word: str, *suffix_groups: tuple[str, ...]) -> str | None:
    best = None
    for group in suffix_groups:
        for suf in group:
            if word.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
    return best


def stem(word: str) -> str:
    word = word.lower()
    rv = _rv(word)
    r1, r2 = _r1_r2(word)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 0: attached pronoun (regions stay those of the original
    # word — Snowball computes R1/R2/RV once, up front)
    for pron in _PRONOUNS:
        if word.endswith(pron):
            base = word[: -len(pron)]
            cut = len(base)
            matched = False
            for pre in _PRE_A:
                if base.endswith(pre) and in_rv(cut - len(pre)):
                    # delete the pronoun AND remove the acute accent
                    word = base[: -len(pre)] + pre.translate(_ACCENT)
                    matched = True
                    break
            if not matched:
                for pre in _PRE_B:
                    if base.endswith(pre) and in_rv(cut - len(pre)):
                        word = base
                        matched = True
                        break
            if not matched and base.endswith("uyendo") and in_rv(cut - 5):
                word = base
            break

    # ---- step 1: standard suffix removal (longest match)
    step1_done = False
    suf = _longest(
        word, _S1_DELETE_R2, _S1_ADOR, _S1_LOGIA, _S1_UCION, _S1_ENCIA,
        ("amente",), ("mente",), _S1_IDAD, _S1_IVA,
    )
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
        elif suf in _S1_ADOR:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf in _S1_LOGIA:
            if in_r2(pos):
                word = word[:pos] + "log"
                step1_done = True
        elif suf in _S1_UCION:
            if in_r2(pos):
                word = word[:pos] + "u"
                step1_done = True
        elif suf in _S1_ENCIA:
            if in_r2(pos):
                word = word[:pos] + "ente"
                step1_done = True
        elif suf == "amente":
            if in_r1(pos):
                word = word[:pos]
                step1_done = True
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if word.endswith(pre) and in_r2(len(word) - 2):
                            word = word[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
                for pre in ("ante", "able", "ible"):
                    if word.endswith(pre) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif suf in _S1_IDAD:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
                if word.endswith("abil") and in_r2(len(word) - 4):
                    word = word[:-4]
                else:
                    for pre in ("ic", "iv"):
                        if word.endswith(pre) and in_r2(len(word) - 2):
                            word = word[:-2]
                            break
        elif suf in _S1_IVA:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]

    # ---- step 2a: verb suffixes beginning y (only if step 1 did nothing)
    step2a_done = False
    if not step1_done:
        suf = _longest(word, _S2A)
        if suf is not None:
            pos = len(word) - len(suf)
            if in_rv(pos) and pos >= 1 and word[pos - 1] == "u":
                word = word[:pos]
                step2a_done = True

    # ---- step 2b: other verb suffixes (if step 2a was tried but failed)
    if not step1_done and not step2a_done:
        suf = _longest(word, _S2B_GU, _S2B)
        if suf is not None:
            pos = len(word) - len(suf)
            if in_rv(pos):
                word = word[:pos]
                if suf in _S2B_GU and word.endswith("gu"):
                    word = word[:-1]

    # ---- step 3: residual suffix
    suf = _longest(word, _S3_RV, ("e", "é"))
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _S3_RV:
            if in_rv(pos):
                word = word[:pos]
        else:  # e / é
            if in_rv(pos):
                word = word[:pos]
                if word.endswith("gu") and in_rv(len(word) - 1):
                    word = word[:-1]

    return word.translate(_ACCENT)
