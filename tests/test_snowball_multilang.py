"""Snowball de/es/fr stemmer vectors + multilingual analyzer end-to-end.

Vectors are hand-derived step-by-step from the published algorithm
descriptions (snowballstem.org/algorithms/{german,spanish,french}/), the
same source the reference's wamania/php-stemmer implements
(reference: src/Transformer/StemmerTransformer.php:30-39); test layout
models tests/Unit/Transformer/StemmerTransformerTest.php.
"""

import pytest

from phphinder_spark.analysis.analyzers import Analyzer, StemmerTransformer
from phphinder_spark.analysis.snowball_de import stem as stem_de
from phphinder_spark.analysis.snowball_es import stem as stem_es
from phphinder_spark.analysis.snowball_fr import stem as stem_fr


@pytest.mark.parametrize(
    "word,expected",
    [
        ("katzen", "katz"),
        ("hunde", "hund"),
        ("bücher", "buch"),
        ("häuser", "haus"),
        ("geheimnisse", "geheimnis"),  # group (b) + niss -> nis restore
        ("aufeinander", "aufeinand"),
        ("schönheit", "schonheit"),  # heit not in R2 -> kept, umlaut folded
        ("mädchen", "madch"),
        ("gehen", "geh"),
        ("bezeichnungen", "bezeichn"),  # en then ung (R2)
        ("unendlich", "unend"),
        ("freundlichkeit", "freundlich"),  # keit in R2; lich not in R2
        ("haus", "haus"),  # s after u: not a valid s-ending
        ("verständnis", "verstandnis"),
        ("grösse", "gross"),  # ß/ss + e removal
        ("hoffnungen", "hoffnung"),  # en in R1; ung NOT in R2
        ("laufen", "lauf"),
    ],
)
def test_german_stemmer(word, expected):
    assert stem_de(word) == expected


@pytest.mark.parametrize(
    "word,expected",
    [
        ("bailando", "bail"),  # step 2b: ando in RV
        ("canciones", "cancion"),  # step 2b: es
        ("grandioso", "grandios"),  # step 3: o in RV
        ("rápidamente", "rapid"),  # amente in R1, accent folded
        ("guerra", "guerr"),
        ("comiendo", "com"),  # iendo
        ("pronombres", "pronombr"),
        ("atracción", "atraccion"),  # ación does NOT match cción
        ("trabajadores", "trabaj"),  # adores in R2
        ("lógica", "logic"),  # ica not in R2; step 3 a in RV
        ("che", "che"),
        ("haciéndola", "hac"),  # step 0 attached pronoun + accent repair
    ],
)
def test_spanish_stemmer(word, expected):
    assert stem_es(word) == expected


@pytest.mark.parametrize(
    "word,expected",
    [
        ("continuellement", "continuel"),  # ement in RV + undouble ell
        ("jouaient", "jou"),  # mark U/I; 2b aIent in RV
        ("voyaient", "voi"),  # step 3: final Y -> i
        ("majestueux", "majestu"),  # eux in R2
        ("nationale", "national"),  # step 4: e in RV
        ("actions", "action"),  # step 4: s removal; ion kept (not R2)
        ("conditionnellement", "conditionnel"),
        ("franchise", "franchis"),
        ("majestueusement", "majestu"),  # ement in RV then eus in R2
        ("chienne", "chien"),  # step 5 undouble enn
    ],
)
def test_french_stemmer(word, expected):
    assert stem_fr(word) == expected


def test_stemmer_transformer_dispatch():
    assert StemmerTransformer("de").apply("katzen") == "katz"
    assert StemmerTransformer("es").apply("canciones") == "cancion"
    assert StemmerTransformer("fr").apply("nationale") == "national"
    assert StemmerTransformer("en").apply("witnesses") == "wit"
    with pytest.raises(NotImplementedError):
        StemmerTransformer("xx")


@pytest.mark.parametrize("lang", ["de", "es", "fr"])
def test_default_analyzer_chain_non_english(lang):
    """Analyzer.default(lang) now builds a full lowercase+stopword+stem
    chain for non-English languages (previously NotImplementedError)."""
    # lowercase input: the reference's filter-inside-transformer quirk
    # (P7) checks stop words on the RAW term, before lowercasing
    analyzer = Analyzer.default(lang)
    terms = analyzer.terms("der hund und die katzen" if lang == "de"
                           else "el gato y las canciones" if lang == "es"
                           else "le chat et les actions")
    assert terms  # stopwords dropped, remaining terms stemmed
    if lang == "de":
        assert "katz" in terms and "und" not in terms
    elif lang == "es":
        assert "cancion" in terms and "el" not in terms
    else:
        assert "action" in terms and "le" not in terms


def test_multilanguage_stemmed_end_to_end(spark):
    """German schema: stemmed query term matches differently-inflected
    document term through the shared analyzer chain."""
    from phphinder_spark.engine import SparkSearchEngine
    from phphinder_spark.schema import IS_INDEXED, IS_STORED, SearchSchema

    schema = SearchSchema(
        {"text": IS_INDEXED | IS_STORED},
        analyzer=Analyzer.default("de"),
        name="de_schema",
    )
    eng = SparkSearchEngine(spark, schema)
    eng.add_document({"text": "Die Katzen schlafen"})
    eng.flush()
    # query 'Katze' stems to 'katz' == indexed stem of 'Katzen'
    assert eng.find_docs_by_index("Katzen") == {"text": [1]}
    assert eng.find_docs_by_index("katz") == {"text": [1]}
