"""Decompose the Alice warm-window phrase-query latency (round-6 verdict
item #6: the quoted-phrase cell was the warm p95 outlier at 1.43 s vs
~0.5 s typical — attribute it to a leg or to window noise).

Measures, per phrase query, medians over N interleaved warm repetitions:

- ``scan``      — the stored-corpus contains prefilter alone
                  (the physical path Alice takes: docs memory-cached =>
                  ``_phrase_use_index()`` is False);
- ``attach``    — prefilter + the result-assembly tail (attach, fulltext
                  bonus event, weight fold, sort) = the full search_df;
- ``index_path``— the same query forced through phrase_strategy='index'
                  (shadow-prefilter join + candidates-only contains
                  verify), for the structural comparison;
- a non-phrase control query, to separate host noise from shape cost.

Prints one JSON line; with --record appends the attribution to BENCH.md.
"""

import json
import re
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

PG11 = "/root/reference/tests/Performance/pg11.txt"

PHRASES = [
    ('"“I advise you to leave off this minute!”"', 1),
    ('"said poor Alice"', 1),
]
CONTROL = ("Hatter", 57)
REPS = 7


def main() -> None:
    from pyspark.sql import SparkSession

    from phphinder_spark.engine import SparkSearchEngine, apply_interactive_conf
    from phphinder_spark.schema import line_schema

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("phrase-decompose")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    chapter = "unknown"
    with open(PG11, encoding="utf-8") as fh:
        for line_no, raw in enumerate(fh, start=1):
            text = raw.strip()
            if not text:
                continue
            m = re.match(r"^CHAPTER ([MDCLXVI]+)\.$", text)
            if m:
                chapter = m.group(1)
                continue
            rows.append((chapter, text, line_no))

    df = spark.createDataFrame(
        [(i + 1, c, t, l) for i, (c, t, l) in enumerate(rows)],
        "doc_id long, chapter string, text string, line long",
    )
    eng = SparkSearchEngine(spark, line_schema())
    eng.index_dataframe(df)
    eng.index.postings.cache().count()
    eng.index.stats()
    eng.warm_shapes()
    apply_interactive_conf(spark)

    docs = eng.index.docs

    def timed(fn):
        t = time.time()
        fn()
        return time.time() - t

    out = {"reps": REPS, "queries": {}}
    for q, expected in PHRASES:
        raw = q.strip('"')
        legs = {"scan": [], "attach": [], "index_path": [], "control": []}
        # warm each shape once before sampling
        assert docs.where(docs["text"].contains(raw)).count() >= 0
        assert eng.search_df(q).count() == expected
        eng.phrase_strategy = "index"
        assert eng.search_df(q).count() == expected
        eng.phrase_strategy = "auto"
        for _ in range(REPS):
            legs["scan"].append(
                timed(lambda: docs.where(docs["text"].contains(raw)).count())
            )
            legs["attach"].append(timed(lambda: eng.search_df(q).count()))
            eng.phrase_strategy = "index"
            legs["index_path"].append(timed(lambda: eng.search_df(q).count()))
            eng.phrase_strategy = "auto"
            legs["control"].append(
                timed(lambda: eng.search_df(CONTROL[0]).count())
            )
        out["queries"][q] = {
            k: {
                "median_sec": round(statistics.median(v), 3),
                "max_sec": round(max(v), 3),
                "min_sec": round(min(v), 3),
            }
            for k, v in legs.items()
        }

    print(json.dumps(out))

    if "--record" in sys.argv:
        with open("/root/repo/BENCH.md", "a") as fh:
            fh.write("\n## Phrase-query p95 decomposition (round 7)\n\n")
            fh.write(
                "Interleaved warm legs, medians of "
                f"{REPS} reps (local[8], interactive conf):\n\n"
            )
            fh.write(
                "| query | contains scan | full search | forced index path "
                "| control (term) |\n|---|---|---|---|---|\n"
            )
            for q, legs in out["queries"].items():
                fh.write(
                    f"| `{q}` | {legs['scan']['median_sec']} | "
                    f"{legs['attach']['median_sec']} | "
                    f"{legs['index_path']['median_sec']} | "
                    f"{legs['control']['median_sec']} |\n"
                )
    spark.stop()


if __name__ == "__main__":
    main()
