"""Deterministic synthetic source-code corpus with the input_hint shape
``(repo:string, path:string, commit:string, lang:string, content:string)``
(BASELINE.json input_hint). Every row is derived from ``(seed, i)`` alone —
no wall clock, no sequential RNG state — so generation is embarrassingly
parallel AND byte-identical at any partitioning/parallelism, which the
resume/determinism/scaling tests rely on.

Token distribution is Zipf-ish with hot code keywords ("function",
"return", "import", ...) appearing in ~every document — the skew case the
north_rule calls out — plus per-doc rare identifiers for selective queries.
"""

from __future__ import annotations

import hashlib
import random
from collections.abc import Iterator

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


def make_row(i: int, seed: int = 42, n_docs: int = 0) -> tuple:
    rng = random.Random(f"{seed}:{i}")
    repo = f"org/repo-{i % max(1, (n_docs or 100) // 100)}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/module_{i % 20}/file_{i}.{lang}"
    commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()

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
    if i % 50 == 0:
        toks.append(f"needle_{i}")
    lines = [" ".join(toks[j : j + 8]) for j in range(0, len(toks), 8)]
    content = "\n".join(lines)
    return (repo, path, commit, lang, content)


def generate_code_corpus_rows(n_docs: int, seed: int = 42) -> list[tuple]:
    return [make_row(i, seed, n_docs) for i in range(n_docs)]


def generate_code_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generation: spark.range -> mapInPandas, one row per id.

    Scales linearly with cores; per-row determinism is independent of the
    partition layout."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_row(int(i), seed, n_docs) for i in pdf["id"]]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    base = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    return base.mapInPandas(
        gen, "repo string, path string, commit string, lang string, content string"
    )
