"""Query AST — the engine's only IR, mirroring the reference's Query classes
(reference: src/Query/*.php). Semantics, not code: each node knows its
evaluation priority (NOT runs last — src/Query/NotQuery.php:16-17) and its
string form (golden-tested against tests/Unit/Query/QueryParserTest.php).
"""

from __future__ import annotations


class Query:
    priority = 0

    def to_string(self) -> str:  # pragma: no cover - abstract
        raise NotImplementedError

    def __str__(self) -> str:
        return self.to_string()

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.to_string()!r})"

    def __eq__(self, other: object) -> bool:
        return type(self) is type(other) and self.to_string() == other.to_string()

    def __hash__(self) -> int:
        return hash((type(self).__name__, self.to_string()))


class TextQuery(Query):
    """A leaf carrying (field, value, boost); field '*' = all fields."""

    def __init__(self, field: str, value: str, boost: float = 1.0):
        self.field = field
        self.value = value
        self.boost = boost

    def to_string(self) -> str:
        return f"{self.field}:{self.value}"


class TermQuery(TextQuery):
    pass


class PrefixQuery(TextQuery):
    def to_string(self) -> str:
        return f"{self.field}:{self.value}*"


class FullTextQuery(TextQuery):
    def to_string(self) -> str:
        return f'{self.field}:"{self.value}"'


class GroupQuery(Query):
    OPERATOR = "AND"

    def __init__(self, subqueries: list[Query]):
        self.subqueries = list(subqueries)

    def to_string(self) -> str:
        inner = f" {self.OPERATOR} ".join(q.to_string() for q in self.subqueries)
        return f"({inner})"


class AndQuery(GroupQuery):
    OPERATOR = "AND"


class OrQuery(GroupQuery):
    OPERATOR = "OR"


class NotQuery(GroupQuery):
    priority = 1

    def get_subquery(self) -> Query:
        return self.subqueries[0]

    def to_string(self) -> str:
        return f"NOT({self.get_subquery().to_string()})"


class NullQuery(Query):
    def __init__(self, message: str = ""):
        self.message = message

    def to_string(self) -> str:
        return f"<null> {self.message}"
