"""Query-parser goldens (reference: tests/Unit/Query/QueryParserTest.php)."""

import pytest

from phphinder_spark.query import (
    AndQuery,
    FullTextQuery,
    NotQuery,
    NullQuery,
    OrQuery,
    PrefixQuery,
    QueryParser,
    TermQuery,
)


@pytest.fixture
def parser():
    return QueryParser("*")


def test_simple_and(parser):
    assert parser.parse("hello world fun") == AndQuery(
        [TermQuery("*", "hello"), TermQuery("*", "world"), TermQuery("*", "fun")]
    )


def test_or_with_fields(parser):
    assert parser.parse("hello OR (title:world keyword:fun)") == OrQuery(
        [
            TermQuery("*", "hello"),
            AndQuery([TermQuery("title", "world"), TermQuery("keyword", "fun")]),
        ]
    )
    assert parser.parse("(hello world) OR fun") == OrQuery(
        [
            AndQuery([TermQuery("*", "hello"), TermQuery("*", "world")]),
            TermQuery("*", "fun"),
        ]
    )


def test_prefix(parser):
    assert parser.parse("rend*") == PrefixQuery("*", "rend")


def test_mixed_complex(parser):
    assert parser.parse("title:hello (world OR other:foo*)") == AndQuery(
        [
            TermQuery("title", "hello"),
            OrQuery([TermQuery("*", "world"), PrefixQuery("other", "foo")]),
        ]
    )


def test_empty(parser):
    assert parser.parse("") == NullQuery("Empty Query")


def test_not(parser):
    assert parser.parse("hello NOT(world)") == AndQuery(
        [TermQuery("*", "hello"), NotQuery([TermQuery("*", "world")])]
    )


def test_not_at_first(parser):
    assert parser.parse("NOT(world) hello ") == AndQuery(
        [NotQuery([TermQuery("*", "world")]), TermQuery("*", "hello")]
    )


def test_complex_not(parser):
    assert parser.parse("title:hello NOT(world OR other:foo*)") == AndQuery(
        [
            TermQuery("title", "hello"),
            NotQuery([OrQuery([TermQuery("*", "world"), PrefixQuery("other", "foo")])]),
        ]
    )


def test_fulltext(parser):
    assert parser.parse('"Animal instict"') == FullTextQuery("*", "Animal instict")


def test_string_casts(parser):
    # reference: tests/Unit/Query/QueryParserTest.php:131-169
    assert parser.parse("'hello world'").to_string() == "(*:hello AND *:world)"
    assert parser.parse("NOT(hello) world").to_string() == "(NOT(*:hello) AND *:world)"
    assert (
        parser.parse("(world OR other:foo*) AND NOT(title:hello)").to_string()
        == "((*:world OR other:foo*) AND NOT(title:hello))"
    )
    assert parser.parse("").to_string() == "<null> Empty Query"
    assert parser.parse("hello").to_string() == "*:hello"
    assert parser.parse("hello world").to_string() == "(*:hello AND *:world)"
    assert parser.parse('"hello world"').to_string() == '*:"hello world"'
    assert parser.parse('hello world"').to_string() == "(*:hello AND *:world)"
    assert parser.parse('"hello world').to_string() == "(*:hello AND *:world)"
    assert (
        parser.parse("title:hello (world OR other:foo*)").to_string()
        == "(title:hello AND (*:world OR other:foo*))"
    )
    deep = """
    (
        (
            (
                (
                    (
                        *:world OR
                        other:foo*
                    ) AND NOT(
                        title:hello
                    )
                )
            )
        )
    )
    """
    assert parser.parse(deep).to_string() == "((*:world OR other:foo*) AND NOT(title:hello))"


def test_curly_quote_phrase(parser):
    # Alice phrase query: punctuation is cleaned, phrase survives
    q = parser.parse('"“I advise you to leave off this minute!”"')
    assert q == FullTextQuery("*", "I advise you to leave off this minute")
