from phphinder_spark.query.ast import (
    AndQuery,
    FullTextQuery,
    GroupQuery,
    NotQuery,
    NullQuery,
    OrQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TextQuery,
)
from phphinder_spark.query.parser import ANY_FIELD, QueryParser

__all__ = [
    "AndQuery",
    "FullTextQuery",
    "GroupQuery",
    "NotQuery",
    "NullQuery",
    "OrQuery",
    "PrefixQuery",
    "Query",
    "TermQuery",
    "TextQuery",
    "QueryParser",
    "ANY_FIELD",
]
