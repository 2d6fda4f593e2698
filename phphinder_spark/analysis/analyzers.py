"""Tokenizer + transformer chain with reference-identical semantics.

Mirrors the behavior (not the code) of the reference analyzers:
- RegexTokenizer: split on ``\\W+`` (Unicode), drop empties; non-strings pass
  through as a single token (reference: src/Token/RegexTokenizer.php:19-27).
- LowerCaseTransformer: optional filters, then Unicode lowercase
  (reference: src/Transformer/LowerCaseTransformer.php:27-35).
- SymbolTransformer: strip ``[^a-zA-Z0-9]+`` (src/Transformer/SymbolTransformer.php:25-34).
- StemmerTransformer: Snowball/Porter2 English (src/Transformer/StemmerTransformer.php:30-39).
- StopWordsFilter: drop token when in the per-language list; unknown language
  => allow everything (src/Transformer/StopWordsFilter.php:25-40).
- Chain: transformers run in order; a ``None`` kills the token and stops the
  chain (reference: src/Index/AbstractStorage.php:336-345).

These are pure-Python callables so they can run identically on the driver
(query-term transformation) and inside Arrow-vectorized pandas UDFs
(corpus tokenization) — one code path, byte-identical terms.
"""

from __future__ import annotations

import re
from collections.abc import Iterable

from phphinder_spark.analysis.porter2 import stem
from phphinder_spark.analysis.stopwords_all import STOPWORDS_BY_LANG
from phphinder_spark.analysis.stopwords_en import STOPWORDS_EN

_WORD_SPLIT = re.compile(r"\W+", re.UNICODE)
_SYMBOL = re.compile(r"[^a-zA-Z0-9]+")

STOPWORDS = dict(STOPWORDS_BY_LANG)
STOPWORDS["en"] = STOPWORDS_EN


class RegexTokenizer:
    """Split text on non-word runs; non-strings pass through whole."""

    def apply(self, text: object) -> list:
        if not isinstance(text, str):
            return [text]
        return [t for t in _WORD_SPLIT.split(text) if t != ""]


class _Filtered:
    """Shared filter plumbing (reference filters run before the transform)."""

    def __init__(self, lang_iso: str = "en", filters: Iterable | None = None):
        self.lang_iso = lang_iso
        self.filters = list(filters or [])

    def _allowed(self, term: str) -> bool:
        return all(f.allow(term) for f in self.filters)


class StopWordsFilter:
    def __init__(self, lang_iso: str = "en"):
        self.stop_words = STOPWORDS.get(lang_iso, frozenset())

    def allow(self, term: str) -> bool:
        return term not in self.stop_words


class LowerCaseTransformer(_Filtered):
    def apply(self, term: str) -> str | None:
        if not self._allowed(term):
            return None
        return term.lower()


class SymbolTransformer(_Filtered):
    def apply(self, term: str) -> str | None:
        if not self._allowed(term):
            return None
        return _SYMBOL.sub("", term)


# ISO code -> PyStemmer algorithm name, for languages WITHOUT a pinned
# pure-Python port above (PyStemmer names follow snowballstem.org)
_PYSTEMMER_LANGS = {
    "ar": "arabic",
    "eu": "basque",
    "ca": "catalan",
    "el": "greek",
    "fi": "finnish",
    "ga": "irish",
    "hi": "hindi",
    "hu": "hungarian",
    "id": "indonesian",
    "lt": "lithuanian",
    "ne": "nepali",
    "ro": "romanian",
    "sr": "serbian",
    "ta": "tamil",
    "tr": "turkish",
}


_PYSTEMMER_CACHE: dict = {}


def _pystemmer_fn(lang_iso: str):
    """Upstream-certified stem callable via the optional PyStemmer C
    extension, or None when the language/extension is unavailable.

    The returned callable carries only the ALGORITHM NAME and builds
    its ``Stemmer`` lazily on first use in whatever process runs it:
    the C object is unpicklable (a driver-bound instance would crash
    UDF serialization the moment the analyzer ships to executors —
    the exact path the feature exists for) and not thread-safe (each
    deserialized worker copy builds its own)."""
    algo = _PYSTEMMER_LANGS.get(lang_iso)
    if algo is None:
        return None
    try:
        import Stemmer  # PyStemmer, optional — availability check only
    except ImportError:
        return None
    if algo not in Stemmer.algorithms():
        return None

    # per-PROCESS cache in a module global: the closure captures only
    # the algo string (a default-arg holder would be pickled along
    # WITH a populated Stemmer after any driver-side use and crash
    # serialization anyway); workers re-import this module and build
    # their own instance on first call
    def stem_word(word):
        st = _PYSTEMMER_CACHE.get(algo)
        if st is None:
            import Stemmer as _S

            st = _PYSTEMMER_CACHE[algo] = _S.Stemmer(algo)
        return st.stemWord(word)

    return stem_word


class StemmerTransformer(_Filtered):
    """Snowball stemmer by ISO language code (reference stems any Snowball
    language via wamania/php-stemmer, src/Transformer/StemmerTransformer.php:30-39;
    the pure-Python algorithm ports live in analysis/snowball_*.py +
    porter2.py)."""

    def __init__(self, lang_iso: str = "en", filters: Iterable | None = None):
        super().__init__(lang_iso, filters)
        if lang_iso == "en":
            self._stem = stem
        elif lang_iso == "de":
            from phphinder_spark.analysis.snowball_de import stem as stem_de

            self._stem = stem_de
        elif lang_iso == "es":
            from phphinder_spark.analysis.snowball_es import stem as stem_es

            self._stem = stem_es
        elif lang_iso == "fr":
            from phphinder_spark.analysis.snowball_fr import stem as stem_fr

            self._stem = stem_fr
        elif lang_iso == "pt":
            from phphinder_spark.analysis.snowball_pt import stem as stem_pt

            self._stem = stem_pt
        elif lang_iso == "it":
            from phphinder_spark.analysis.snowball_it import stem as stem_it

            self._stem = stem_it
        elif lang_iso == "nl":
            from phphinder_spark.analysis.snowball_nl import stem as stem_nl

            self._stem = stem_nl
        elif lang_iso in ("da", "no", "sv"):
            from phphinder_spark.analysis import snowball_scand

            self._stem = {
                "da": snowball_scand.stem_da,
                "no": snowball_scand.stem_no,
                "sv": snowball_scand.stem_sv,
            }[lang_iso]
        elif lang_iso == "ru":
            from phphinder_spark.analysis.snowball_ru import stem as stem_ru

            self._stem = stem_ru
        else:
            # optional backend for the remaining Snowball languages:
            # PyStemmer (the snowballstem.org project's own C wrapper)
            # carries upstream-certified outputs for every published
            # algorithm, so environments that ship it get ro/fi/hu/tr/...
            # without a from-memory port (SURVEY §7.5: porting those
            # without the official conformance vocabularies would be a
            # silent-divergence risk). Import-guarded — absent, the
            # documented raise stands.
            self._stem = _pystemmer_fn(lang_iso)
            if self._stem is None:
                raise NotImplementedError(
                    "Snowball stemmers implemented: en, de, es, fr, pt, it, "
                    f"nl, da, no, sv, ru (got {lang_iso!r}); install "
                    "PyStemmer for the remaining Snowball languages"
                )

    def apply(self, term: str) -> str | None:
        if not self._allowed(term):
            return None
        return self._stem(term)


class Analyzer:
    """Tokenizer + ordered transformer chain.

    ``transform`` applies the chain to one token (None = dropped, chain
    stops). ``analyze`` tokenizes then transforms, keeping original token
    positions, which the positional index needs for phrase queries.
    """

    def __init__(self, tokenizer: RegexTokenizer | None = None, transformers: list | None = None):
        self.tokenizer = tokenizer or RegexTokenizer()
        self.transformers = list(transformers or [])

    @staticmethod
    def default(lang_iso: str = "en", with_symbol: bool = False) -> "Analyzer":
        """The reference integration-test chain: lowercase(+stopwords) then
        stem; the Alice/performance chain inserts SymbolTransformer between
        them (reference: tests/Performance/AliceSearchEngineTest.php:109-113).
        """
        chain: list = [LowerCaseTransformer(lang_iso, [StopWordsFilter(lang_iso)])]
        if with_symbol:
            chain.append(SymbolTransformer(lang_iso))
        chain.append(StemmerTransformer(lang_iso))
        return Analyzer(transformers=chain)

    @staticmethod
    def lowercase_only(lang_iso: str = "en") -> "Analyzer":
        """Lowercase without stopwords/stemming — SQL-oracle-friendly chain."""
        return Analyzer(transformers=[LowerCaseTransformer(lang_iso)])

    def positional_faithful(self) -> bool:
        """True when index terms are the original tokens lowercased with
        nothing dropped — the precondition for using the MAIN positional
        index as a fulltext/phrase prefilter (stemming breaks suffix
        matching; stopword/None drops break position alignment). Chains
        that fail this get a lowercase SHADOW positional field instead
        (index/builder.shadow_fields)."""
        return type(self.tokenizer) is RegexTokenizer and all(
            type(t) is LowerCaseTransformer and not t.filters
            for t in self.transformers
        )

    def transform(self, term: object) -> object | None:
        if not isinstance(term, str):
            return term
        for t in self.transformers:
            term = t.apply(term)
            if term is None:
                return None
        return term

    def analyze(self, text: object) -> list[tuple[object, int]]:
        """Return [(transformed_token, original_position)] with drops removed."""
        out = []
        for pos, tok in enumerate(self.tokenizer.apply(text)):
            tok = self.transform(tok)
            if tok is None or tok == "":
                continue
            out.append((tok, pos))
        return out

    def terms(self, text: object) -> list:
        return [t for t, _ in self.analyze(text)]

    def unique_terms(self, text: object) -> list:
        """Order-preserving unique transformed tokens (reference
        AbstractStorage::getTokensFor, src/Index/AbstractStorage.php:350-356)."""
        seen = set()
        out = []
        for t, _ in self.analyze(text):
            if t not in seen:
                seen.add(t)
                out.append(t)
        return out
