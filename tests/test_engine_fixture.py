"""End-to-end goldens on the reference 3-doc fixture
(reference: tests/Integration/SearchEngineTest.php — counts, term/field
counts, fulltext flags and exact weights 16.0/10.0).
"""

import pytest

from phphinder_spark.engine import RequiredFieldError, SparkSearchEngine
from phphinder_spark.schema import test_schema as make_test_schema


@pytest.fixture(scope="module")
def engine(spark):
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document(
        {
            "_id": 1,
            "title": "Cat animal",
            "text": "Meow world! This is a PHP search engine.",
            "description": "this is a description",
        }
    ).add_document(
        {
            "_id": 2,
            "title": "Dog",
            "text": "Bark Bark! PHPhinder makes search development fun to the world.",
            "description": "Describe the problems",
        }
    ).add_document(
        {
            "_id": 3,
            "title": "Snake",
            "text": "szee szee! This is the minimal PHP search engine for the animal world.",
            "description": "this is a description",
        }
    )
    eng.flush()
    return eng


def by_doc(results):
    return {r.doc_id: r for r in results}


def test_search_and(engine):
    # reference :22-29
    results = engine.search("search engine")
    assert len(results) == 2
    docs = by_doc(results)
    assert set(docs) == {1, 3}
    for r in results:
        assert len(r.terms) == 2
        assert len(r.indices) == 1
    assert results[0].fulltext is True


def test_search_or(engine):
    # reference :31-41
    results = engine.search("search OR engine")
    assert len(results) == 3
    docs = by_doc(results)
    assert len(docs[1].terms) == 2
    assert len(docs[3].terms) == 2
    assert len(docs[2].terms) == 1
    assert docs[2].fulltext is False
    assert docs[1].fulltext is False


def test_search_parentheses(engine):
    # reference :43-53
    results = engine.search("(search engine) OR fun")
    assert len(results) == 3
    docs = by_doc(results)
    assert len(docs[1].terms) == 2
    assert len(docs[3].terms) == 2
    assert len(docs[2].terms) == 1
    assert all(not r.fulltext for r in results)


def test_search_not(engine):
    # reference :55-64
    results = engine.search("world NOT(engine)")
    assert len(results) == 1
    assert results[0].doc_id == 2
    assert len(results[0].terms) == 1
    assert len(results[0].indices) == 1
    assert results[0].fulltext is False


def test_search_not_at_first(engine):
    # reference :66-74
    results = engine.search("NOT(engine) bark")
    assert len(results) == 1
    assert results[0].doc_id == 2
    assert len(results[0].terms) == 1
    assert len(results[0].indices) == 1
    assert results[0].fulltext is False


def test_find_docs_by_index(engine):
    # reference :76-97
    r = engine.find_docs_by_index("php")
    assert len(r["text"]) == 2 and len(r["title"]) == 0
    r = engine.find_docs_by_index("search")
    assert len(r["text"]) == 3 and len(r["title"]) == 0
    r = engine.find_docs_by_index("engine")
    assert len(r["text"]) == 2
    r = engine.find_docs_by_index("cat")
    assert len(r["text"]) == 0 and len(r["title"]) == 1
    r = engine.find_docs_by_index("description")
    assert len(r["text"]) == 0 and len(r["title"]) == 0


def test_error_on_missing_required(spark):
    # reference :99-107
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document({"text": "hello world!"})
    with pytest.raises(RequiredFieldError) as exc:
        eng.flush()
    assert str(exc.value) == 'No `title` key provided for doc {"text":"hello world!"}'


def test_sorted_results_weights(engine):
    # reference :109-123 — golden weights 16.0 then 10.0
    results = engine.search("animal world")
    assert len(results) == 2
    assert results[0].doc_id == 3
    assert results[1].doc_id == 1
    assert [len(r.terms) for r in results] == [2, 2]
    assert len(results[0].indices) == 1
    assert len(results[1].indices) == 2
    assert results[0].fulltext is True
    assert results[1].fulltext is False
    assert results[0].weight == 16.0
    assert results[1].weight == 10.0


def test_unique_document_replacement(spark):
    # reference :138-154 — re-adding _id=1 replaces postings, reuses id
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document(
        {"_id": 1, "title": "Cat animal", "text": "Meow world! This is a PHP search engine.",
         "description": "this is a description"}
    )
    eng.flush()
    eng.add_document(
        {"_id": 1, "title": "Cow", "text": "Mooh world! This is a PHP search engine.",
         "description": "this is a description"}
    )
    eng.flush()
    assert len(eng.search("meow")) == 0
    results = eng.search("mooh")
    assert len(results) == 1
    assert results[0].doc_id == 1


def test_search_typo(engine):
    # reference :156-172
    results = engine.search("phphender")
    assert len(results) == 1
    assert results[0].doc_id == 2
    assert len(results[0].terms) == 1
    assert len(results[0].indices) == 1
    assert results[0].fulltext is False

    results = engine.search("develep")
    assert len(results) == 1
    assert results[0].doc_id == 2
    assert len(results[0].terms) == 1
    assert len(results[0].indices) == 1
    assert results[0].fulltext is False


def test_search_fulltext_phrase(engine):
    # reference :175-184
    results = engine.search('"search engine"')
    assert len(results) == 2
    docs = by_doc(results)
    assert set(docs) == {1, 3}
    assert all(len(r.terms) == 1 for r in results)
    assert all(len(r.indices) == 1 for r in results)
    assert docs[1].fulltext is True


def test_search_nonexistent_field(engine):
    # reference :188-194
    assert engine.search("color:white") == []


def test_documentation_example(spark):
    # reference :127-136 (DefaultSchema-like flow against our test schema)
    results_engine = SparkSearchEngine(spark, make_test_schema())
    results_engine.add_document({"_id": 1, "title": "Hi", "text": "Hello world!"})
    results_engine.flush()
    results = results_engine.search("Hello")
    assert len(results) == 1
    assert results[0].document["title"] == "Hi"


def test_truncate(spark):
    eng = SparkSearchEngine(spark, make_test_schema())
    eng.add_document({"_id": 1, "title": "Hi", "text": "Hello world!"})
    eng.flush()
    assert len(eng.search("Hello")) == 1
    eng.truncate()
    eng.add_document({"_id": 1, "title": "Hi", "text": "Goodbye!"})
    eng.flush()
    assert eng.search("Hello") == []
    assert len(eng.search("goodbye")) == 1


def test_multilanguage_analyzer_end_to_end(spark):
    from phphinder_spark.analysis import Analyzer, LowerCaseTransformer, StopWordsFilter
    from phphinder_spark.schema import IS_INDEXED, IS_STORED, SearchSchema

    schema = SearchSchema(
        {"text": IS_INDEXED | IS_STORED},
        analyzer=Analyzer(
            transformers=[LowerCaseTransformer("es", [StopWordsFilter("es")])]
        ),
        name="es_schema",
    )
    eng = SparkSearchEngine(spark, schema)
    eng.add_document({"text": "el gato come pescado"})
    eng.flush()
    # 'el' is a Spanish stop word: dropped at index AND query time
    assert eng.find_docs_by_index("el") == {"text": []}
    assert eng.find_docs_by_index("gato") == {"text": [1]}


def test_empty_index_search_schema_is_typed(spark):
    """Empty-index search_df keeps declared stored-field types so unions
    with non-empty results are schema-compatible."""
    from phphinder_spark.schema import IS_INDEXED, IS_STORED, SearchSchema

    schema = SearchSchema(
        {"text": IS_INDEXED | IS_STORED, "stars": IS_STORED},
        types={"stars": "long"},
        name="typed",
    )
    eng = SparkSearchEngine(spark, schema)
    empty = eng.search_df("anything")
    assert dict(empty.dtypes)["stars"] == "bigint"
    eng.add_document({"text": "hello world", "stars": 5})
    eng.flush()
    full = eng.search_df("hello")
    assert dict(full.dtypes)["stars"] == "bigint"
    assert full.unionByName(empty).count() == 1
