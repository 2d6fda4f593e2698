"""Snowball French stemmer, pure Python.

Implemented from the published algorithm description
(https://snowballstem.org/algorithms/french/stemmer.html). The reference
engine stems any Snowball language via wamania/php-stemmer
(reference: src/Transformer/StemmerTransformer.php:30-39); this module
provides the French algorithm for a ``StemmerTransformer('fr')`` chain.

Pure function, no state: safe inside Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyâàëéêèïîôûù")


def _mark(word: str) -> str:
    """u/i between vowels, y next to a vowel, and u after q become
    upper-case marks (treated as consonants by the region logic)."""
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        prev_v = i > 0 and word[i - 1] in _VOWELS
        next_v = i + 1 < n and word[i + 1] in _VOWELS
        if c in ("u", "i") and prev_v and next_v:
            chars[i] = c.upper()
        elif c == "y" and (prev_v or next_v):
            chars[i] = "Y"
        elif c == "u" and i > 0 and word[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _rv(word: str) -> int:
    n = len(word)
    if word[:3] in ("par", "col", "tap"):
        return 3
    if n >= 2 and word[0] in _VOWELS and word[1] in _VOWELS:
        return min(3, n)
    for i in range(1, n):
        if word[i] in _VOWELS:
            return i + 1
    return n


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


_S1_DELETE_R2 = (
    "ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
    "isme", "able", "iste", "eux",
)
_S1_ATION = ("atrices", "atrice", "ateurs", "ations", "ateur", "ation")
_S2A = (
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
)
_S2B_DELETE_RV = (
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
)
_S2B_A = (
    "assions", "assiez", "assent", "aIent", "antes", "asses", "âtes",
    "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai", "as",
    "â", "a",
)


def _longest_end(word: str, groups: list[tuple[str, ...]]) -> str | None:
    best = None
    for g in groups:
        for suf in g:
            if word.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
    return best


def stem(word: str) -> str:  # noqa: C901 — faithful transcription
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
    ment_family = False
    w = word

    # ---------------------------------------------------------- step 1
    suf = _longest_end(
        w,
        [
            _S1_DELETE_R2,
            _S1_ATION,
            ("logies", "logie"),
            ("usions", "utions", "usion", "ution"),
            ("ences", "ence"),
            ("issements", "issement"),
            ("ements", "ement"),
            ("ités", "ité"),
            ("ives", "ifs", "ive", "if"),
            ("eaux",),
            ("aux",),
            ("euses", "euse"),
            ("amment",),
            ("emment",),
            ("ments", "ment"),
        ],
    )
    if suf is not None:
        pos = len(w) - len(suf)
        if suf in _S1_DELETE_R2:
            if in_r2(pos):
                w = w[:pos]
                altered = True
        elif suf in _S1_ATION:
            if in_r2(pos):
                w = w[:pos]
                altered = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logies", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
                altered = True
        elif suf in ("usions", "utions", "usion", "ution"):
            if in_r2(pos):
                w = w[:pos] + "u"
                altered = True
        elif suf in ("ences", "ence"):
            if in_r2(pos):
                w = w[:pos] + "ent"
                altered = True
        elif suf in ("issements", "issement"):
            if in_r1(pos) and pos >= 1 and w[pos - 1] not in _VOWELS:
                w = w[:pos]
                altered = True
        elif suf in ("ements", "ement"):
            if in_rv(pos):
                w = w[:pos]
                altered = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif w.endswith(("abl", "iqU")) and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith(("ièr", "Ièr")) and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif suf in ("ités", "ité"):
            if in_r2(pos):
                w = w[:pos]
                altered = True
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ives", "ifs", "ive", "if"):
            if in_r2(pos):
                w = w[:pos]
                altered = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:pos] + "eau"
            altered = True
        elif suf == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                altered = True
        elif suf in ("euses", "euse"):
            if in_r2(pos):
                w = w[:pos]
                altered = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                altered = True
        elif suf == "amment":
            if in_rv(pos):
                w = w[:pos] + "ant"
                ment_family = True
        elif suf == "emment":
            if in_rv(pos):
                w = w[:pos] + "ent"
                ment_family = True
        elif suf in ("ments", "ment"):
            if pos >= 1 and w[pos - 1] in _VOWELS and in_rv(pos - 1):
                w = w[:pos]
                ment_family = True

    # ------------------------------------------------- steps 2a and 2b
    if not altered or ment_family:
        did_2a = False
        suf = _longest_end(w, [_S2A])
        if suf is not None:
            pos = len(w) - len(suf)
            if (
                in_rv(pos)
                and pos >= 1
                and w[pos - 1] not in _VOWELS
                and in_rv(pos - 1)
            ):
                w = w[:pos]
                did_2a = True
                altered = True
        if not did_2a:
            suf = _longest_end(w, [("ions",), _S2B_DELETE_RV, _S2B_A])
            if suf is not None:
                pos = len(w) - len(suf)
                if suf == "ions":
                    if in_rv(pos) and in_r2(pos):
                        w = w[:pos]
                        altered = True
                elif suf in _S2B_DELETE_RV:
                    if in_rv(pos):
                        w = w[:pos]
                        altered = True
                else:
                    if in_rv(pos):
                        w = w[:pos]
                        altered = True
                        if w.endswith("e") and in_rv(len(w) - 1):
                            w = w[:-1]

    # ------------------------------------------------------ steps 3 / 4
    if altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        if w.endswith("s") and len(w) >= 2 and w[-2] not in "aiouès":
            w = w[:-1]
        suf = _longest_end(w, [("ion",), ("ière", "Ière", "ier", "Ier"), ("e",), ("ë",)])
        if suf == "ion":
            pos = len(w) - 3
            if in_r2(pos) and pos >= 1 and w[pos - 1] in ("s", "t"):
                w = w[:pos]
        elif suf in ("ière", "Ière", "ier", "Ier"):
            pos = len(w) - len(suf)
            if in_rv(pos):
                w = w[:pos] + "i"
        elif suf == "e":
            if in_rv(len(w) - 1):
                w = w[:-1]
        elif suf == "ë":
            if w.endswith("guë") and in_rv(len(w) - 1):
                w = w[:-1]

    # ------------------------------------------------------------ step 5
    if w.endswith(("enn", "onn", "ett", "ell", "eill")):
        w = w[:-1]

    # ---- step 6: é/è followed only by non-vowels to the end -> e
    # (marked U/I/Y are consonants, i.e. non-vowels here)
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        c = w[i]
        if c in ("é", "è"):
            if seen_nonvowel:
                w = w[:i] + "e" + w[i + 1 :]
            break
        if c in _VOWELS:
            break
        seen_nonvowel = True
        i -= 1

    return w.lower()
