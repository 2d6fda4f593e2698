"""Snowball Portuguese stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/portuguese/stemmer.html). The
reference engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the Portuguese algorithm for a ``StemmerTransformer('pt')``
chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouáéíóúâêô")


def _mark(word: str) -> str:
    """Nasalised vowels ã/õ are treated as vowel + consonant: mark as
    a~ / o~ (restored at the end)."""
    return word.replace("ã", "a~").replace("õ", "o~")


def _unmark(word: str) -> str:
    return word.replace("a~", "ã").replace("o~", "õ")


def _rv(word: str) -> int:
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


# step 1 suffix classes (longest match across ALL of them)
_S1_DELETE_R2 = (
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "adora", "aça~o", "antes", "ância",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa",
)
_S1_LOGIA = ("logias", "logia")
_S1_UCAO = ("uço~es", "uça~o")
_S1_ENCIA = ("ências", "ência")
_S1_IDADE = ("idades", "idade")
_S1_IVA = ("ivas", "ivos", "iva", "ivo")
_S1_IRA = ("iras", "ira")

_S2 = (
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "áveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou",
)

_S4_RV = ("os", "a", "i", "o", "á", "í", "ó")


def _longest(word: str, *suffix_groups: tuple[str, ...]) -> str | None:
    best = None
    for group in suffix_groups:
        for suf in group:
            if word.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
    return best


def stem(word: str) -> str:
    word = _mark(word.lower())
    rv = _rv(word)
    r1, r2 = _r1_r2(word)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    altered = False

    # ---- step 1: standard suffix removal (longest match)
    suf = _longest(
        word, _S1_DELETE_R2, _S1_LOGIA, _S1_UCAO, _S1_ENCIA,
        ("amente",), ("mente",), _S1_IDADE, _S1_IVA, _S1_IRA,
    )
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(pos):
                word = word[:pos]
                altered = True
        elif suf in _S1_LOGIA:
            if in_r2(pos):
                word = word[:pos] + "log"
                altered = True
        elif suf in _S1_UCAO:
            if in_r2(pos):
                word = word[:pos] + "u"
                altered = True
        elif suf in _S1_ENCIA:
            if in_r2(pos):
                word = word[:pos] + "ente"
                altered = True
        elif suf == "amente":
            if in_r1(pos):
                word = word[:pos]
                altered = True
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
                altered = True
                for pre in ("ante", "avel", "ível"):
                    if word.endswith(pre) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif suf in _S1_IDADE:
            if in_r2(pos):
                word = word[:pos]
                altered = True
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
                altered = True
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf in _S1_IRA:
            # replace with ir if in RV and preceded by 'e'
            if in_rv(pos) and pos >= 1 and word[pos - 1] == "e":
                word = word[:pos] + "ir"
                altered = True

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if not altered:
        suf = _longest(word, _S2)
        if suf is not None:
            pos = len(word) - len(suf)
            if in_rv(pos):
                word = word[:pos]
                altered = True

    # ---- step 3: if step 1 or 2 altered, delete final i preceded by c
    if altered:
        if word.endswith("i") and in_rv(len(word) - 1) and word[:-1].endswith("c"):
            word = word[:-1]
    else:
        # ---- step 4: residual suffix (only if neither 1 nor 2 altered)
        suf = _longest(word, _S4_RV)
        if suf is not None:
            pos = len(word) - len(suf)
            if in_rv(pos):
                word = word[:pos]

    # ---- step 5: residual form (always)
    if word and word[-1] in ("e", "é", "ê"):
        if in_rv(len(word) - 1):
            word = word[:-1]
            if (word.endswith("gu") and in_rv(len(word) - 1)) or (
                word.endswith("ci") and in_rv(len(word) - 1)
            ):
                word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    return _unmark(word)
