"""Generate tests/fixtures/stem_map_en.parquet — the committed (raw token ->
transformed term) mapping for the reference default analyzer chain
(StopWordsFilter -> lowercase -> Porter2 English; filter runs BEFORE lower,
the reference quirk).

Why a fixture: the driver's oracle harness executes plain SQL strings on its
own DuckDB connection, so a Python scalar UDF registered here would not
exist there. Committing the transform TABLE instead makes the stemmed chain
expressible in pure SQL (a join), extending the value-level oracle to the
parity-critical analyzer chain: the Spark side stems LIVE inside its Arrow
UDFs, the oracle joins raw tokens against this mapping — any divergence
between live stemming and the committed mapping (or anywhere else in the
stemmed pipeline) fails the value hash.

Coverage: the union of raw-token vocabularies of every sf dir under
/root/testdata (sf0.001/sf0.01/sf0.1), so the mapping is total for any
scale the driver gates at. Rows: (tok, stem) with stem NULL when the chain
drops the token (stopword).
"""

import glob
import sys

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.parquet as pq

from phphinder_spark.analysis import Analyzer

OUT = "/root/repo/tests/fixtures/stem_map_en.parquet"


def main() -> None:
    analyzer = Analyzer.default("en")
    vocab: set[str] = set()
    for path in sorted(glob.glob("/root/testdata/sf*/documents.parquet")):
        table = pq.read_table(path, columns=["text"])
        for batch in table.to_batches():
            for text in batch.column(0).to_pylist():
                vocab.update(analyzer.tokenizer.apply(text or ""))
    vocab.discard("")
    toks = sorted(vocab)
    stems = []
    for t in toks:
        s = analyzer.transform(t)
        stems.append(None if s is None or s == "" else str(s))
    out = pa.table({"tok": pa.array(toks, pa.string()), "stem": pa.array(stems, pa.string())})
    pq.write_table(out, OUT, compression="zstd")
    n_drop = sum(1 for s in stems if s is None)
    print(f"wrote {OUT}: {len(toks)} tokens, {n_drop} dropped (stopwords)")


if __name__ == "__main__":
    main()
