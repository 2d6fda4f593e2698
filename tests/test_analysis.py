"""Analyzer parity goldens (reference: tests/Unit/Transformer/*)."""

from phphinder_spark.analysis import (
    Analyzer,
    LowerCaseTransformer,
    RegexTokenizer,
    StemmerTransformer,
    StopWordsFilter,
    stem,
)


class TestStemmer:
    def test_reference_goldens(self):
        # reference: tests/Unit/Transformer/StemmerTransformerTest.php:32-41
        assert stem("accompanied") == "accompani"
        assert stem("witnesses") == "wit"
        assert stem("write") == "write"
        assert stem("test") == "test"
        assert stem("goat") == "goat"

    def test_porter2_known_vectors(self):
        vectors = {
            "caresses": "caress",
            "ponies": "poni",
            "ties": "tie",
            "cats": "cat",
            "feed": "feed",
            "agreed": "agre",
            "agree": "agre",
            "plastered": "plaster",
            "bled": "bled",
            "motoring": "motor",
            "sing": "sing",
            "conflated": "conflat",
            "troubled": "troubl",
            "sized": "size",
            "hopping": "hop",
            "tanned": "tan",
            "falling": "fall",
            "hissing": "hiss",
            "failing": "fail",
            "filing": "file",
            "crying": "cri",
            "happy": "happi",
            "sky": "sky",
            "news": "news",
            "only": "onli",
            "dying": "die",
            "generate": "generat",
            "general": "general",
            "communication": "communic",
            "consignment": "consign",
            "development": "develop",
            "engine": "engin",
            "searching": "search",
            "alice": "alic",
            "gryphon": "gryphon",
            "wonderland": "wonderland",
            "hatter": "hatter",
            "conditional": "condit",
            "rational": "ration",
            "by": "by",
            "say": "say",
            "cry": "cri",
        }
        for w, expected in vectors.items():
            assert stem(w) == expected, f"{w}: {stem(w)} != {expected}"


class TestTokenizer:
    def test_splits_on_non_word(self):
        t = RegexTokenizer()
        assert t.apply("Meow world! This is a PHP search engine.") == [
            "Meow", "world", "This", "is", "a", "PHP", "search", "engine",
        ]

    def test_unicode_and_empties(self):
        t = RegexTokenizer()
        assert t.apply("“I advise you!”") == ["I", "advise", "you"]
        assert t.apply("españa über") == ["españa", "über"]

    def test_non_string_passthrough(self):
        t = RegexTokenizer()
        assert t.apply(42) == [42]
        assert t.apply(1.5) == [1.5]


class TestTransformers:
    def test_lowercase(self):
        # reference: tests/Unit/Transformer/LowerCaseTransformerTest.php:32-40
        t = LowerCaseTransformer("en")
        assert t.apply("Hello") == "hello"
        assert t.apply("ESPAÑA") == "españa"
        assert t.apply("🤗") == "🤗"

    def test_stopwords_filter(self):
        # reference: tests/Unit/Transformer/StopWordsFilterTest.php:40-71
        f = StopWordsFilter("en")
        for w in ["a", "be", "call", "the", "whence", "yourselves"]:
            assert not f.allow(w), w
        for w in ["test", "españa", "🤗", "goat"]:
            assert f.allow(w), w
        # unknown ISO => allow-all
        assert StopWordsFilter("xx").allow("the")

    def test_stopword_filter_runs_before_lowercase(self):
        # Reference quirk: the filter checks the RAW token, so capitalized
        # stopwords pass and get indexed ("The" -> "the"), while the
        # lowercase query term "the" is dropped
        # (src/Transformer/LowerCaseTransformer.php:27-35).
        t = LowerCaseTransformer("en", [StopWordsFilter("en")])
        assert t.apply("The") == "the"
        assert t.apply("the") is None

    def test_chain_null_stops(self):
        a = Analyzer.default("en")
        assert a.transform("the") is None
        assert a.transform("Witnesses") == "wit"
        assert a.transform(42) == 42

    def test_analyze_positions(self):
        a = Analyzer.default("en")
        # 'is'/'a' are stopwords; positions are original token indexes
        assert a.analyze("This is a PHP search engine.") == [
            ("this", 0), ("php", 3), ("search", 4), ("engin", 5),
        ]

    def test_unique_terms(self):
        a = Analyzer.default("en")
        assert a.unique_terms("Bark Bark! PHPhinder makes search") == [
            "bark", "phphinder", "make", "search",
        ]
