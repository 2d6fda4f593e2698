"""Schema system: per-field bitmask flags, mirroring the reference's
class-as-schema model (reference: src/Schema/Schema.php:18-22 —
IS_REQUIRED=1, IS_STORED=2, IS_INDEXED=4, IS_FULLTEXT=8, IS_UNIQUE=16).

Spark mapping: a ``StructType`` whose ``StructField.metadata`` carries the
flags (SURVEY.md §1.1). Field declaration order is semantic — the reference
iterates schema variables in declaration order during indexing, lookup and
fulltext assignment — so ``fields`` is an ordered dict.
"""

from __future__ import annotations

from pyspark.sql import types as T

from phphinder_spark.analysis import Analyzer

IS_REQUIRED = 1
IS_STORED = 2
IS_INDEXED = 4
IS_FULLTEXT = 8
IS_UNIQUE = 16

RESERVED_FIELDS = {"id", "doc_id"}

_SPARK_TYPES = {
    "string": T.StringType(),
    "long": T.LongType(),
    "int": T.LongType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
}


class SearchSchema:
    """Ordered mapping field -> flags (+ optional scalar type, default string)."""

    def __init__(
        self,
        fields: dict[str, int],
        analyzer: Analyzer | None = None,
        types: dict[str, str] | None = None,
        name: str = "default",
    ):
        for f in fields:
            if f in RESERVED_FIELDS:
                raise ValueError(f"{f!r} is a reserved field name")
        self.fields = dict(fields)
        self.types = {f: (types or {}).get(f, "string") for f in fields}
        self.analyzer = analyzer or Analyzer.default("en")
        self.name = name
        uniques = [f for f, o in fields.items() if o & IS_UNIQUE]
        if len(uniques) > 1:
            raise ValueError("at most one IS_UNIQUE field is supported")
        self.unique_field = uniques[0] if uniques else None

    def _with(self, flag: int) -> list[str]:
        return [f for f, o in self.fields.items() if o & flag]

    @property
    def indexed_fields(self) -> list[str]:
        return self._with(IS_INDEXED)

    @property
    def stored_fields(self) -> list[str]:
        return self._with(IS_STORED)

    @property
    def required_fields(self) -> list[str]:
        return self._with(IS_REQUIRED)

    @property
    def fulltext_fields(self) -> list[str]:
        return self._with(IS_FULLTEXT)

    def is_unique(self, field: str) -> bool:
        return bool(self.fields[field] & IS_UNIQUE)

    def is_stored(self, field: str) -> bool:
        return bool(self.fields[field] & IS_STORED)

    def spark_type(self, field: str) -> T.DataType:
        return _SPARK_TYPES[self.types[field]]

    def coerce_value(self, field: str, value):
        """Coerce a Python value to this field's declared type — the same
        coercion Spark applies on ingest, so driver-side key lookups (e.g.
        the unique-key upsert probe) compare like with like."""
        if value is None:
            return None
        t = self.types[field]
        if t == "string":
            return value if isinstance(value, str) else str(value)
        if t in ("long", "int"):
            return int(value)
        if t == "double":
            return float(value)
        if t == "bool":
            return bool(value)
        return value

    def to_struct_type(self, include_doc_id: bool = True) -> T.StructType:
        out = []
        if include_doc_id:
            out.append(T.StructField("doc_id", T.LongType(), False))
        for f, flags in self.fields.items():
            out.append(
                T.StructField(
                    f,
                    self.spark_type(f),
                    True,
                    metadata={
                        "required": bool(flags & IS_REQUIRED),
                        "stored": bool(flags & IS_STORED),
                        "indexed": bool(flags & IS_INDEXED),
                        "fulltext": bool(flags & IS_FULLTEXT),
                        "unique": bool(flags & IS_UNIQUE),
                    },
                )
            )
        return T.StructType(out)


def test_schema(analyzer: Analyzer | None = None) -> SearchSchema:
    """The reference integration-test schema
    (reference: tests/Integration/TestSchema.php:12-15)."""
    return SearchSchema(
        {
            "_id": IS_INDEXED | IS_STORED | IS_UNIQUE,
            "title": IS_REQUIRED | IS_STORED | IS_INDEXED,
            "text": IS_INDEXED | IS_STORED | IS_FULLTEXT,
            "description": IS_STORED,
        },
        analyzer=analyzer or Analyzer.default("en"),
        types={"_id": "long"},
        name="test_schema",
    )


def line_schema(analyzer: Analyzer | None = None) -> SearchSchema:
    """The reference performance-test schema
    (reference: tests/Performance/LineSchema.php:12-14)."""
    return SearchSchema(
        {
            "chapter": IS_INDEXED | IS_STORED | IS_FULLTEXT,
            "text": IS_INDEXED | IS_STORED | IS_FULLTEXT,
            "line": IS_INDEXED,
        },
        analyzer=analyzer or Analyzer.default("en", with_symbol=True),
        types={"line": "long"},
        name="line_schema",
    )


def code_schema(analyzer: Analyzer | None = None) -> SearchSchema:
    """Schema for the source-code corpus from BASELINE.json's input_hint:
    (repo, path, commit, lang, content)."""
    return SearchSchema(
        {
            "repo": IS_STORED | IS_INDEXED,
            "path": IS_STORED | IS_INDEXED,
            "commit": IS_STORED,
            "lang": IS_STORED | IS_INDEXED,
            "content": IS_STORED | IS_INDEXED | IS_FULLTEXT,
        },
        analyzer=analyzer or Analyzer.lowercase_only("en"),
        name="code_schema",
    )
