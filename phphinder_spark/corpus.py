"""Deterministic synthetic source-code corpus with the input_hint shape
``(repo:string, path:string, commit:string, lang:string, content:string)``
(BASELINE.json input_hint). Seeded, no wall clock, no unordered iteration —
regenerating with the same seed and size is byte-identical, which the
resume/determinism tests rely on.

Token distribution is Zipf-ish with hot code keywords ("function",
"return", "import", ...) appearing in almost every document — the skew case
the north_rule calls out — plus per-doc rare identifiers for selective
queries.
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession

LANGS = ["py", "php", "js", "go", "md"]

HOT_TERMS = ["function", "return", "import", "class", "def", "value", "data"]

COMMON_TERMS = [
    "parse", "index", "token", "query", "search", "merge", "segment",
    "postings", "score", "rank", "cache", "buffer", "stream", "batch",
    "shuffle", "partition", "broadcast", "filter", "reduce", "map",
    "string", "integer", "vector", "matrix", "engine", "driver",
    "executor", "compress", "encode", "decode", "varint", "delta",
]


def _doc_content(rng: random.Random, doc_idx: int) -> str:
    n_tokens = 40 + rng.randrange(160)
    toks: list[str] = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            toks.append(rng.choice(HOT_TERMS))
        elif r < 0.85:
            toks.append(rng.choice(COMMON_TERMS))
        else:
            toks.append(f"ident_{rng.randrange(5000)}")
    # one globally-unique rare identifier per ~50 docs for selective queries
    if doc_idx % 50 == 0:
        toks.append(f"needle_{doc_idx}")
    lines = []
    for i in range(0, len(toks), 8):
        lines.append(" ".join(toks[i : i + 8]))
    return "\n".join(lines)


def generate_code_corpus_rows(n_docs: int, seed: int = 42) -> list[tuple]:
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org/repo-{i % max(1, n_docs // 100)}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/module_{i % 20}/file_{i}.{lang}"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        content = _doc_content(rng, i)
        rows.append((repo, path, commit, lang, content))
    return rows


def generate_code_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    df = spark.createDataFrame(
        generate_code_corpus_rows(n_docs, seed),
        "repo string, path string, commit string, lang string, content string",
    )
    if partitions:
        df = df.repartition(partitions)
    return df
