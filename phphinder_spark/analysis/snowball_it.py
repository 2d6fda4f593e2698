"""Snowball Italian stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/italian/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the Italian algorithm for a ``StemmerTransformer('it')`` chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")


def _mark(word: str) -> str:
    """Replace acute accents by grave; mark u after q and u/i between
    vowels as U/I (non-vowels for the region/vowel tests)."""
    word = word.translate(_ACUTE_TO_GRAVE)
    out = list(word)
    for i, ch in enumerate(out):
        if ch == "u" and i >= 1 and out[i - 1] == "q":
            out[i] = "U"
        elif (
            ch in ("u", "i")
            and 0 < i < len(out) - 1
            and out[i - 1] in _VOWELS
            and out[i + 1] in _VOWELS
        ):
            out[i] = "U" if ch == "u" else "I"
    return "".join(out)


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


_PRONOUNS = (
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
    "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
    "lo", "mi", "ne", "si", "ti", "vi",
)
_PRE_A = ("ando", "endo")  # delete the pronoun
_PRE_B = ("ar", "er", "ir")  # replace the pronoun with e

_S1_DELETE_R2 = (
    "atrice", "atrici", "anza", "anze", "iche", "ichi", "ismo",
    "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste",
    "isti", "istà", "istè", "istì", "mente", "ante", "anti", "ico",
    "ici", "ica", "ice", "oso", "osi", "osa", "ose",
)
_S1_AZIONE = ("azione", "azioni", "atore", "atori")
_S1_LOGIA = ("logia", "logie")
_S1_UZIONE = ("uzione", "uzioni", "usione", "usioni")
_S1_ENZA = ("enza", "enze")
_S1_AMENTO_RV = ("amento", "amenti", "imento", "imenti")
_S1_ITA = ("ità",)
_S1_IVA = ("ivo", "ivi", "iva", "ive")

_S2 = (
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo",
    "enda", "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo",
    "immo", "irai", "irei", "isca", "isce", "isci", "isco", "ano",
    "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà",
    "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò",
    "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
    "ute", "uti", "uto", "ar", "ir",
)

_S3A = ("a", "e", "i", "o", "à", "è", "ì", "ò")


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

    # ---- step 0: attached pronoun (longest pronoun, preceded in RV by
    # ando/endo -> delete, or ar/er/ir -> replace pronoun with e)
    suf = _longest(word, _PRONOUNS)
    if suf is not None:
        base = word[: -len(suf)]
        for pre in _PRE_A:
            if base.endswith(pre) and in_rv(len(base) - len(pre)):
                word = base
                break
        else:
            for pre in _PRE_B:
                if base.endswith(pre) and in_rv(len(base) - len(pre)):
                    word = base + "e"
                    break

    # ---- step 1: standard suffix removal (longest match)
    step1_done = False
    suf = _longest(
        word, _S1_DELETE_R2, _S1_AZIONE, _S1_LOGIA, _S1_UZIONE, _S1_ENZA,
        _S1_AMENTO_RV, ("amente",), _S1_ITA, _S1_IVA,
    )
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
        elif suf in _S1_AZIONE:
            if in_r2(pos):
                word = word[:pos]
                step1_done = True
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf in _S1_LOGIA:
            if in_r2(pos):
                word = word[:pos] + "log"
                step1_done = True
        elif suf in _S1_UZIONE:
            if in_r2(pos):
                word = word[:pos] + "u"
                step1_done = True
        elif suf in _S1_ENZA:
            if in_r2(pos):
                word = word[:pos] + "ente"
                step1_done = True
        elif suf in _S1_AMENTO_RV:
            if in_rv(pos):
                word = word[:pos]
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
                    if word.endswith("abil") and in_r2(len(word) - 4):
                        word = word[:-4]
                    else:
                        for pre in ("os", "ic"):
                            if word.endswith(pre) and in_r2(len(word) - 2):
                                word = word[:-2]
                                break
        elif suf in _S1_ITA:
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
                    if word.endswith("ic") and in_r2(len(word) - 2):
                        word = word[:-2]

    # ---- step 2: verb suffixes (only if step 1 removed nothing)
    if not step1_done:
        suf = _longest(word, _S2)
        if suf is not None:
            pos = len(word) - len(suf)
            if in_rv(pos):
                word = word[:pos]

    # ---- step 3a: final vowel (and a preceding i) in RV
    if word and word[-1] in _S3A and in_rv(len(word) - 1):
        word = word[:-1]
        if word.endswith("i") and in_rv(len(word) - 1):
            word = word[:-1]

    # ---- step 3b: ch -> c, gh -> g (h deletion) in RV
    if (word.endswith("ch") or word.endswith("gh")) and in_rv(len(word) - 2):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")
