"""Query-string parser with reference-identical grammar.

Behavioral contract (reference: src/Query/QueryParser.php):
- tokenize with one alternation regex keeping delimiters
  (``\\s+|OR|NOT\\(|AND|\\(|\\)|\\w+\\*|"[^"]+"|\\w+:\\w+\\*|\\w+:\\w+|\\w+:"[^"]+"``),
- clean each token: trim, strip ``[^\\w":()* ]``, drop the last double quote
  when the count is odd,
- drop empty tokens and the literal ``AND`` (AND is implicit),
- recursive descent: ``(`` / ``NOT(`` recurse (consumed tokens are spliced
  out), ``term*`` => prefix, ``"…"`` => fulltext, ``field:value[*|"…"]``
  fielded, bare word => term on field '*'; a single child is unwrapped; any
  ``OR`` seen makes the group an OrQuery, else AndQuery; empty input =>
  NullQuery.

Golden-tested against tests/Unit/Query/QueryParserTest.php:26-169.
"""

from __future__ import annotations

import re

from phphinder_spark.query.ast import (
    AndQuery,
    FullTextQuery,
    NotQuery,
    NullQuery,
    OrQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

ANY_FIELD = "*"

_TOKEN_SPLIT = re.compile(
    r'(\s+|OR|NOT\(|AND|\(|\)|\w+\*|"[^"]+"|\w+:\w+\*|\w+:\w+|\w+:"[^"]+")'
)
_CLEAN = re.compile(r'[^\w":()* ]')
_PREFIX = re.compile(r"^(\w+)\*$")
_QUOTED = re.compile(r'^"([^"]+)"$')
_TRIM_CHARS = " \t\n\r\x00\x0b"


class QueryParser:
    def __init__(self, field_name: str = ANY_FIELD):
        self.field_name = field_name

    def parse(self, text: str) -> Query:
        tokens = self._tokenize(text)
        return self._parse_tokens(tokens)

    def _tokenize(self, query: str) -> list[str]:
        if query.strip(_TRIM_CHARS) == "":
            return []
        parts = [p for p in _TOKEN_SPLIT.split(query) if p]
        cleaned = [self._clean_token(p) for p in parts]
        return [t for t in cleaned if t != "" and t != "AND"]

    @staticmethod
    def _clean_token(token: str) -> str:
        token = token.strip(_TRIM_CHARS)
        token = _CLEAN.sub("", token)
        if token.count('"') % 2 != 0:
            pos = token.rfind('"')
            token = token[:pos] + token[pos + 1 :]
        return token

    def _parse_tokens(self, tokens: list[str], _state: list | None = None) -> Query:
        if not tokens:
            return NullQuery("Empty Query")
        # _state carries the shared pointer through recursion, mirroring the
        # reference's by-reference (&$tokens, &$pointer) splicing.
        state = _state if _state is not None else [0]
        saw_or = False
        subqueries: list[Query] = []
        while state[0] < len(tokens):
            token = tokens[state[0]].strip(_TRIM_CHARS)
            if token in ("(", "NOT("):
                original = state[0]
                state[0] += 1
                sub = self._parse_tokens(tokens, state)
                subqueries.append(NotQuery([sub]) if token == "NOT(" else sub)
                del tokens[original : state[0] + 1]
                state[0] = original
                continue
            if token == ")":
                break
            if token == "OR":
                saw_or = True
            elif _PREFIX.match(token):
                subqueries.append(PrefixQuery(self.field_name, _PREFIX.match(token).group(1)))
            elif _QUOTED.match(token):
                subqueries.append(FullTextQuery(self.field_name, _QUOTED.match(token).group(1)))
            elif ":" in token:
                field, value = token.split(":", 1)
                if m := _PREFIX.match(value):
                    subqueries.append(PrefixQuery(field, m.group(1)))
                elif m := _QUOTED.match(value):
                    subqueries.append(FullTextQuery(field, m.group(1)))
                else:
                    subqueries.append(TermQuery(field, value))
            else:
                subqueries.append(TermQuery(self.field_name, token))
            state[0] += 1

        if len(subqueries) == 1:
            return subqueries[0]
        if saw_or:
            return OrQuery(subqueries)
        return AndQuery(subqueries)
