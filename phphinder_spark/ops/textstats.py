"""Text-analysis operators: token counting, quality scoring, language ID,
document fingerprinting. Built-in Column expressions where possible
(whole-stage codegen); Arrow-vectorized pandas UDFs otherwise.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, functions as F

from phphinder_spark.analysis.stopwords_en import STOPWORDS_EN

_TOKEN_SPLIT = r"\W+"

_ASCII_WORD = __import__("re").compile(r"^[a-z0-9_]+$")


def lang_profiles(top_n: int = 50) -> dict[str, list[str]]:
    """Deterministic stopword profiles from the 32 shipped reference
    lists, restricted to ASCII-word entries: the JVM/RE2 ``\\W`` used by
    the tokenizer is ASCII-only, so non-Latin-script tokens never survive
    tokenization on this path — languages whose lists keep < 20 ASCII
    words are excluded (full-Unicode lang-id belongs on the Python-
    analyzer path). ``top_n`` words per language, ranked shortest-first
    (function words are short — 'the', 'is', 'el', 'und' — so a length
    ranking approximates a frequency ranking deterministically), bound
    both the Column expression and the generated oracle SQL."""
    from phphinder_spark.analysis.analyzers import STOPWORDS

    out = {}
    for lang in sorted(STOPWORDS):
        words = sorted(
            (w for w in STOPWORDS[lang] if _ASCII_WORD.match(w)),
            key=lambda w: (len(w), w),
        )
        if len(words) >= 20:
            out[lang] = sorted(words[:top_n])
    return out


def tokens_col(col: str) -> F.Column:
    """Lowercased word tokens as an array column (empties removed) —
    JVM-side equivalent of the engine's RegexTokenizer + lowercase."""
    return F.filter(F.split(F.lower(F.col(col)), _TOKEN_SPLIT), lambda x: x != "")


def token_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct) — whitespace/\\W tokenization."""
    toks = tokens_col(col)
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
    )


# GPT-2-style pre-tokenizer pieces, restricted to a dialect shared by
# Java regex (Spark) and RE2 (DuckDB): leftmost-first alternation, no
# lookahead (GPT-2's \s+(?!\S) is RE2-inexpressible — trailing-space
# grouping differs slightly, counts stay equivalent for estimation)
BPE_PIECE_PATTERN = r"'[sdmt]|'ll|'ve|'re| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_estimate(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, n_pieces) — BPE-ish token-count estimate: the number of
    GPT-style pre-tokenizer pieces (contractions, space-prefixed word /
    number / punctuation runs). A byte-pair vocabulary refines each piece
    into >= 1 tokens, so this is the standard cheap lower-bound estimate
    for LLM token budgeting. One JVM regexp per row, no shuffle."""
    pieces = F.regexp_extract_all(F.col(col), F.lit(BPE_PIECE_PATTERN), F.lit(0))
    return df.select(
        "doc_id",
        F.coalesce(F.size(pieces), F.lit(0)).cast("long").alias("n_pieces"),
    )


def quality_scores(df: DataFrame, col: str = "text") -> DataFrame:
    """Heuristic quality features per doc, all JVM expressions:
    char length, alpha ratio, punctuation ratio, stopword ratio,
    mean token length — rounded for cross-engine comparability."""
    toks = tokens_col(col)
    raw = F.col(col)
    n_chars = F.length(raw)
    n_alpha = F.length(F.regexp_replace(raw, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(raw, r"[^.,;:!?]", ""))
    stop_arr = F.lit(sorted(STOPWORDS_EN))
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_tok = F.size(toks)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        F.round(n_alpha / F.greatest(n_chars, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
            / F.greatest(n_tok, F.lit(1)),
            6,
        ).alias("chars_per_token"),
    )


# PII patterns restricted to the Java-regex ∩ RE2 dialect (no lookaround)
# so Spark and the SQL oracle run the IDENTICAL expressions. Word-ish
# boundaries are explicit character classes, not \b (RE2 supports \b but
# Java's \b is Unicode-aware — explicit classes dodge the divergence).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}"),
    ("phone", r"\+?[0-9][0-9()\-\. ]{7,}[0-9]"),
]


def pii_scrub(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact emails / IPv4s / phone-shaped runs with ``<KIND>`` tokens
    and count the hits per kind — the standard pre-training PII pass.
    Pure regexp_replace/regexp chains (JVM, one projection, no shuffle);
    patterns are deliberately lookaround-free so the DuckDB oracle runs
    the same regexes. Returns (doc_id, scrubbed, n_email, n_ipv4,
    n_phone). Replacement order is the PII_PATTERNS order (email first:
    an email must not be half-eaten by the phone digit-run pattern).

    NULL text stays NULL on every output column: Spark's ``size()``
    returns -1 on NULL input (legacy semantics), so the counts are
    guarded with ``isNotNull`` to match SQL's NULL-propagating
    ``len(regexp_extract_all(NULL, ...))``."""
    text = F.col(col)
    scrubbed = text
    counts = []
    for kind, pat in PII_PATTERNS:
        counts.append(
            F.when(
                text.isNotNull(),
                F.size(F.regexp_extract_all(scrubbed, F.lit(pat), F.lit(0))),
            )
            .cast("long")
            .alias(f"n_{kind}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind.upper()}>")
    return df.select(
        F.col(id_col).alias("doc_id"), scrubbed.alias("scrubbed"), *counts
    )


def _word_ngrams(col: str, n: int) -> F.Column:
    """Sliding word n-grams of the lowercased token array (empty array
    when the doc has fewer than n tokens)."""
    toks = tokens_col(col)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# the benchmark gram set is BROADCAST (driver + every executor holds a
# copy): real eval suites are MBs, so a gram set past this row count means
# the caller passed a corpus-sized frame — fail fast with guidance instead
# of an opaque broadcast/driver OOM (mirrors KVStorage._MAX_COMMIT_ROWS)
_MAX_BENCH_GRAM_ROWS = 5_000_000


class BenchmarkGrams:
    """A pre-guarded benchmark n-gram artifact: the distinct gram set is
    checkpoint-materialized and the broadcast-size guard is paid exactly
    ONCE at construction (via :func:`prepare_benchmark_grams`), however
    many decontamination calls reuse it afterwards. Pass this wherever
    ``ngram_contamination`` / ``remove_contaminated_spans`` /
    ``clean_corpus`` accept a ``benchmark`` — repeated calls (and the
    composed pipeline's multi-leg plan) then skip the guard's count job
    entirely."""

    __slots__ = ("grams", "n", "col", "n_grams")

    def __init__(self, grams: DataFrame, n: int, col: str, n_grams: int):
        self.grams = grams
        self.n = n
        self.col = col
        self.n_grams = n_grams


def prepare_benchmark_grams(
    benchmark: DataFrame, n: int = 8, col: str = "text"
) -> BenchmarkGrams:
    """Build the guarded, reusable :class:`BenchmarkGrams` artifact for
    one benchmark frame (count-guarded against corpus-sized inputs — the
    gram set is broadcast to every executor)."""
    grams = (
        benchmark.select(F.explode(_word_ngrams(col, n)).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_bgrams = grams.count()
    if n_bgrams > _MAX_BENCH_GRAM_ROWS:
        raise ValueError(
            f"benchmark side has {n_bgrams} distinct {n}-grams, over "
            f"_MAX_BENCH_GRAM_ROWS={_MAX_BENCH_GRAM_ROWS}: the benchmark "
            "frame is broadcast to every executor, so a corpus-sized "
            "input here is a wrong operator choice — for corpus-vs-corpus "
            "overlap use the dedup operators (minhash_lsh_pairs / "
            "jaccard_ngram_pairs), which shuffle instead of broadcasting"
        )
    return BenchmarkGrams(grams, n, col, n_bgrams)


# per-DataFrame-object memo of prepared gram sets, so repeated calls that
# pass the SAME benchmark frame (the common interactive / composed-
# pipeline shape) pay the guard count once. Weak-keyed: dropping the
# benchmark frame releases the cached artifact. Distinct DataFrame objects
# over identical data do NOT share (object identity is the only mid-
# session-mutation-safe key) — use prepare_benchmark_grams for explicit
# cross-frame reuse.
_BENCH_GRAM_CACHE: "weakref.WeakKeyDictionary[DataFrame, dict]" = None  # type: ignore[assignment]


def _benchmark_gram_set(
    benchmark: "DataFrame | BenchmarkGrams", n: int, col: str
) -> DataFrame:
    """Resolve a benchmark argument to its guarded distinct-gram frame:
    pass-through for a prepared artifact (with an n/col contract check),
    memoized :func:`prepare_benchmark_grams` for a raw DataFrame."""
    global _BENCH_GRAM_CACHE
    if isinstance(benchmark, BenchmarkGrams):
        if benchmark.n != n or benchmark.col != col:
            raise ValueError(
                f"BenchmarkGrams was prepared with n={benchmark.n}, "
                f"col={benchmark.col!r} but the call asked for n={n}, "
                f"col={col!r} — prepare a matching artifact"
            )
        return benchmark.grams
    if _BENCH_GRAM_CACHE is None:
        _BENCH_GRAM_CACHE = weakref.WeakKeyDictionary()
    per_df = _BENCH_GRAM_CACHE.setdefault(benchmark, {})
    key = (n, col)
    if key not in per_df:
        per_df[key] = prepare_benchmark_grams(benchmark, n, col)
    return per_df[key].grams


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame | BenchmarkGrams,
    n: int = 8,
    col: str = "text",
    id_col: str = "doc_id",
    bench_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination — the standard pre-training hygiene pass
    (flag training documents sharing any word ``n``-gram with an
    evaluation/benchmark corpus, so test material is excluded from the
    training set; the n-gram-overlap rule used by the GPT-3 [Brown et
    al. 2020, §C] / Llama data pipelines). Distinct from dedup: the
    comparison is corpus-vs-BENCHMARK, and one shared gram flags a doc.

    Returns one row per ``df`` doc: (doc_id, n_hits = distinct shared
    n-grams, contaminated = n_hits > 0).

    Scale: the benchmark gram set is tiny next to a 100-TB corpus (eval
    suites are MBs), so it is distinct-ed and BROADCAST; corpus grams are
    generated map-side (explode of a projection) and probed against the
    broadcast hash set — the only shuffle is the per-doc count aggregate,
    keyed on uniform doc ids. The corpus is never shuffled by gram. The
    broadcast side is guarded: a benchmark whose distinct gram set exceeds
    ``_MAX_BENCH_GRAM_ROWS`` raises with guidance (that input is a
    corpus-vs-corpus comparison — use the dedup operators' shuffled
    joins, not a broadcast probe). The guard's count job is paid once
    per benchmark ARTIFACT, not per call: pass a
    :func:`prepare_benchmark_grams` result (or reuse the same benchmark
    DataFrame object — gram sets are weak-memoized per object)."""
    grams = _word_ngrams(col, n)
    bgrams = _benchmark_gram_set(benchmark, n, bench_col or col)
    doc_grams = df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
    hits = (
        doc_grams.join(F.broadcast(bgrams), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def duplicate_spans(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    min_count: int = 2,
    hash_spans: bool = False,
) -> DataFrame:
    """Exact substring-duplication signal — the corpus-level repeated-span
    pass of Lee et al. 2021 ("Deduplicating Training Data Makes Language
    Models Better": remove/flag substrings of >= ~50 tokens that repeat in
    the corpus), expressed in the standard distributed approximation:
    fixed-length word ``n``-gram spans instead of a suffix array. Distinct
    from dedup (which scores whole documents) and from repetition_stats
    (within-doc repeats): a span is DUPLICATED when its total occurrence
    count ACROSS THE CORPUS reaches ``min_count``.

    Returns one row per doc: (doc_id, n_spans = the doc's span instances,
    n_dup_spans = how many of them are corpus-duplicated, dup_ratio,
    has_dup). A training pipeline drops/rewrites docs by dup_ratio, or
    feeds has_dup into the cleaning intersect. Docs shorter than ``n``
    tokens (or NULL) report 0 spans.

    Scale: the span explode is map-side; the exploded spans exchange
    twice on the span key (once pruned to ``g`` for the occurrence
    count, once as (doc_id, g) for the flag join — both uniform, span
    content spreads), and the per-doc rollup shuffles on uniform doc
    ids. Deliberately NOT a ``count().over(Window.partitionBy(g))``:
    a window delivers ALL instances of one span to a single task (no
    map-side combine), so a corpus-hot span (a boilerplate license
    block repeated 10^7 times) would OOM that task at 100 TB — the
    groupBy+join shape combines map-side and lets AQE split the hot
    join key. ``hash_spans=True`` is the 100-TB path:
    spans shuffle as xxhash64 LONGS instead of n-word strings (an order
    of magnitude fewer shuffle bytes at n=20); 64-bit collisions can
    over-flag ~(corpus_spans^2 / 2^65) spans — negligible misflag rates
    at real scales, but the value-level DuckDB oracle certifies the
    string form (equivalence between both forms is pytest-pinned)."""
    grams = _word_ngrams(col, n)
    spans = df.select(F.col(id_col).alias("doc_id"), F.explode(grams).alias("g"))
    if hash_spans:
        spans = spans.select("doc_id", F.xxhash64("g").alias("g"))
    # prune the join's right side to the HOT set before joining (at
    # n=20 most spans are unique, so |hot| << |distinct spans| — the
    # same prune remove_duplicate_spans ships); a span that survives the
    # filter is duplicated by definition, so the per-doc rollup just
    # counts matches on the left join
    hot = (
        spans.groupBy("g")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("g")
    )
    per_doc = (
        spans.join(hot, "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_dup_spans"))
    )
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.size(grams).cast("long").alias("n_spans"),
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        )
        .withColumn(
            "dup_ratio",
            F.round(F.col("n_dup_spans") / F.greatest("n_spans", F.lit(1)), 6),
        )
        .withColumn("has_dup", F.col("n_dup_spans") > 0)
    )


def remove_duplicate_spans(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    n: int = 20,
    min_count: int = 2,
    hash_spans: bool = False,
) -> DataFrame:
    """The REMOVAL form of the Lee et al. 2021 repeated-span pass (where
    :func:`duplicate_spans` only flags): every token covered by at least
    one corpus-duplicated ``n``-gram span is cut, and the document is
    rebuilt from the surviving tokens. Returns (doc_id, cleaned,
    n_tokens, n_removed); ``cleaned`` is the space-joined surviving
    tokens (token-normalized — original whitespace/punctuation does not
    survive the fixed-length-span approximation), NULL for NULL input.

    Scale: the span explode, count, and flag join keep
    :func:`duplicate_spans`' shapes (map-side-combining groupBy on the
    span key, never a per-key window); the only additions are a per-doc
    ``collect_set`` of FLAGGED span starts — bounded by doc length, not
    corpus size — and a map-side array rebuild (the in-doc coverage test
    is O(tokens x covered), fine for bounded docs). ``hash_spans=True``
    shuffles xxhash64 longs exactly as in :func:`duplicate_spans`."""
    toks = tokens_col(col)
    grams = _word_ngrams(col, n)
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks"), grams.alias("gs")
    )
    spans = base.select("doc_id", F.posexplode("gs").alias("i0", "g"))
    if hash_spans:
        spans = spans.select("doc_id", "i0", F.xxhash64("g").alias("g"))
    hot = (
        spans.groupBy("g")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("g")
    )
    flagged = (
        spans.join(hot, "g")
        .groupBy("doc_id")
        .agg(F.collect_set("i0").alias("starts"))
    )
    return _cut_flagged_spans(base, flagged, n)


def _cut_flagged_spans(
    base: DataFrame, flagged: DataFrame, n: int
) -> DataFrame:
    """Shared rebuild tail for the span-removal ops: union the flagged
    start positions into covered token indices (overlaps merge via
    array_distinct), cut them, re-join the survivors. ``base`` carries
    (doc_id, toks); ``flagged`` carries (doc_id, starts)."""
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce("starts", F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + (n - 1)),
            )
        )
    )
    joined = base.join(flagged, "doc_id", "left").select(
        "doc_id", "toks", covered.alias("cov")
    )
    kept = F.filter(
        "toks", lambda x, i: ~F.array_contains(F.col("cov"), i.cast("int"))
    )
    return joined.select(
        "doc_id",
        F.when(F.col("toks").isNotNull(), F.concat_ws(" ", kept)).alias(
            "cleaned"
        ),
        F.size(F.coalesce("toks", F.array().cast("array<string>")))
        .cast("long")
        .alias("n_tokens"),
        F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"),
    )


def remove_contaminated_spans(
    df: DataFrame,
    benchmark: DataFrame | BenchmarkGrams,
    n: int = 8,
    col: str = "text",
    id_col: str = "doc_id",
    bench_col: str | None = None,
) -> DataFrame:
    """Surgical benchmark decontamination: instead of DROPPING every
    contaminated document (:func:`ngram_contamination` + filter — the
    GPT-3 §C form, which discards whole docs for one shared gram), cut
    ONLY the tokens covered by an n-gram that appears in the benchmark
    and rebuild the doc — the removal surgery some pipelines prefer
    when contaminated docs are otherwise high-quality.

    Returns (doc_id, cleaned, n_tokens, n_removed) — the same schema
    and overlap-union semantics as :func:`remove_duplicate_spans`.

    Scale: the benchmark gram set is distinct-ed, guarded, and
    BROADCAST (same contract as :func:`ngram_contamination`); corpus
    spans are generated map-side and probed against the broadcast set,
    so the only shuffle is the per-doc collect_set of flagged starts —
    keyed on uniform doc ids, bounded by doc length. The corpus is
    never shuffled by gram."""
    bgrams = _benchmark_gram_set(benchmark, n, bench_col or col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(col).alias("toks"),
        _word_ngrams(col, n).alias("gs"),
    )
    spans = base.select("doc_id", F.posexplode("gs").alias("i0", "g"))
    flagged = (
        spans.join(F.broadcast(bgrams), "g")
        .groupBy("doc_id")
        .agg(F.collect_set("i0").alias("starts"))
    )
    return _cut_flagged_spans(base, flagged, n)


def repetition_stats(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition signals (the Gopher/MassiveText "repetitious content"
    family, §A1.1): fraction of duplicate word-2-grams and the share of
    the single most frequent 2-gram. One JVM projection + one aggregate
    over the exploded grams per doc — grouped by (doc_id, gram) with
    map-side combine, so hot grams inside one doc never skew the shuffle.
    Returns (doc_id, n_bigrams, dup_bigram_frac, top_bigram_frac)."""
    toks = tokens_col(col)
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("doc_id"), grams.alias("gs"))
    per_gram = (
        base.select("doc_id", F.explode("gs").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("ndup"),
        F.max("c").alias("top"),
    )
    # docs with < 2 tokens have no bigrams: re-attach with zeros
    return (
        base.select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(
                F.coalesce("ndup", F.lit(0))
                / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_bigram_frac"),
            F.round(
                F.coalesce("top", F.lit(0))
                / F.greatest(F.coalesce("n_bigrams", F.lit(0)), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
    )


GOPHER_STOPWORDS = ["and", "be", "have", "of", "that", "the", "to", "with"]


def gopher_quality(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_stop_hits: int = 2,
    min_alpha_word_frac: float = 0.8,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 heuristics — public), the standard
    pre-training corpus filter:

    - word count within [min_words, max_words]
    - mean word length within [min_mean_word_len, max_mean_word_len]
    - at least ``min_stop_hits`` DISTINCT hits from the canonical 8-word
      stop list (the, be, to, of, and, that, have, with)
    - fraction of words containing an alphabetic char >= min_alpha_word_frac

    Returns per-doc metrics + per-rule booleans + the conjunctive
    ``gopher_pass``. All JVM column expressions (one projection, zero
    shuffles, codegen'd) — at 100 TB this is a map-only pass that predicate-
    pushes nothing and prunes to two columns."""
    words = F.filter(F.split(F.col(col), r"\W+"), lambda x: x != "")
    n_words = F.size(words)
    n1 = F.greatest(n_words, F.lit(1))
    mean_len = F.round(
        F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n1, 6
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.lit(list(GOPHER_STOPWORDS)),
        )
    )
    alpha_frac = F.round(
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n1, 6
    )
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_len = (mean_len >= min_mean_word_len) & (mean_len <= max_mean_word_len)
    ok_stop = stop_hits >= min_stop_hits
    ok_alpha = alpha_frac >= min_alpha_word_frac
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        stop_hits.cast("long").alias("stop_hits"),
        alpha_frac.alias("alpha_word_frac"),
        ok_words.alias("ok_word_count"),
        ok_len.alias("ok_mean_word_len"),
        ok_stop.alias("ok_stopwords"),
        ok_alpha.alias("ok_alpha_words"),
        (ok_words & ok_len & ok_stop & ok_alpha).alias("gopher_pass"),
    )


def language_id(
    df: DataFrame, col: str = "text", top_n: int = 50
) -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — stopword-profile hit-count argmax
    over the reference's own per-language lists, as pure JVM expressions
    (one array_intersect per language, chained argmax).

    Deterministic tie-break: higher hit count wins, then alphabetical
    language code; zero hits anywhere -> 'und'."""
    profiles = lang_profiles(top_n)
    langs = sorted(profiles)
    toks = F.array_distinct(tokens_col(col))
    # linear-size argmax: one (hits, -lang_index) struct per language,
    # array_max picks lexicographic max = highest hits, then alphabetically
    # first language. (A chained when-fold embeds the running best twice
    # per level -> exponential expression tree -> analyzer OOM.)
    entries = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(
                        toks, F.lit(list(profiles[lang]))
                    )
                ).alias("h"),
                F.lit(-i).alias("ni"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(entries)
    lang_arr = F.lit(list(langs))
    pred = F.when(
        best["h"] > 0, F.element_at(lang_arr, -best["ni"] + 1)
    ).otherwise(F.lit("und"))
    hits = F.when(best["h"] > 0, best["h"]).otherwise(F.lit(0))
    return df.select(
        "doc_id", pred.alias("lang_pred"), hits.cast("long").alias("lang_hits")
    )


def fingerprints(df: DataFrame, col: str = "text") -> DataFrame:
    """(doc_id, fp) rolling polynomial hash over word tokens — a cheap,
    order-sensitive document fingerprint (content-defined, whitespace
    insensitive). Pure JVM fold with the cross-engine token hash, so the
    DuckDB oracle computes the identical value:
    list_reduce([0] || hashes, (acc, h) -> (acc*1000003 + h) % (2^31-1))."""
    from phphinder_spark.functions.hashing import MERSENNE31, hash31

    toks = tokens_col(col)
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 1000003 + hash31(t)) % MERSENNE31,
    )
    # NULL text tokenizes to NULL -> NULL fold; pin to 0 in both engines
    return df.select("doc_id", F.coalesce(fp, F.lit(0).cast("long")).alias("fp"))


def word_vocabulary(
    df: DataFrame,
    k: int | None = None,
    min_count: int = 1,
    col: str = "text",
) -> DataFrame:
    """Corpus word-frequency vocabulary — the precursor artifact for
    tokenizer training (BPE/WordPiece seed vocab, stop-list derivation,
    OOV-rate estimation).

    Returns (token, count) for every distinct lowercased ``\\W+`` token
    with count >= ``min_count``; with ``k`` set, only the k most
    frequent (ties at the boundary broken by token ascending — a total
    order, so the selected set is deterministic and
    partitioning-invariant).

    Scale: one token-keyed count shuffle with map-side combine (Zipfian
    head tokens pre-reduce per partition); the top-k is a
    TakeOrderedAndProject — per-partition heads then a k-sized driver
    merge, never a global sort. min_count prunes the long tail BEFORE
    the top-k heap.
    """
    counts = (
        df.select(F.explode(tokens_col(col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
    )
    if min_count > 1:
        counts = counts.where(F.col("count") >= int(min_count))
    if k is not None:
        counts = counts.orderBy(
            F.col("count").desc(), F.col("token")
        ).limit(int(k))
    return counts


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` highest-TF-IDF tokens
    of each doc — the standard cheap summarizer/labeler for corpus
    exploration, topic routing, and near-dup triage at pipeline scale.

    score = tf * (ln((N + 1) / (df + 1)) + 1) (the smoothed idf of
    scikit-learn's TfidfTransformer, so no term gets a zero/negative
    weight), rounded to 6 dp; ranking is (score desc, token asc) — a
    total order, so the selected set is deterministic, partitioning-
    invariant, and exactly replayable in ANSI SQL. Returns
    (doc_id, token, tf, df, score, rank) with rank 1..k per doc (docs
    with fewer distinct tokens return what they have; NULL/empty docs
    return nothing).

    Scale: tf is one (doc, token)-keyed combining count over the token
    explode; df is one token-keyed combining count over the tf frame
    (distinct (doc, token) pairs are already unique, so df = plain
    count); the tf-df join shuffles on the token key — a Zipf-hot token
    is an AQE-splittable skewed join key, and the join's right side is
    vocabulary-sized, never corpus-sized. The per-doc top-k is a
    doc-keyed window over rows bounded by distinct-tokens-per-doc —
    bounded docs keep every window task bounded (same contract as the
    doc rollups in duplicate_spans)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    n_docs = df.where(F.col(col).isNotNull()).count()
    tf = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens_col(col)).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    scored = tf.join(dfreq, "token").select(
        "doc_id", "token", "tf", "df",
        F.round(F.col("tf") * idf, 6).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("doc_id", "token", F.col("tf").cast("long").alias("tf"),
                F.col("df").cast("long").alias("df"), "score",
                F.col("rank").cast("long").alias("rank"))
    )


def bpe_pair_counts(
    df: DataFrame,
    k: int | None = None,
    min_count: int = 1,
    col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """Adjacent-symbol pair counts over the corpus — the inner-loop
    statistic of BPE tokenizer training (Sennrich et al. 2016: the pair
    with the highest count becomes the next merge). This computes the
    FIRST iteration's counts from characters (each word = its character
    sequence plus a word-end marker), weighted by word frequency; a
    trainer would merge the argmax and re-count.

    Returns (a, b, count): symbol pair -> total occurrences across the
    corpus, optionally pruned to count >= ``min_count`` and/or the top
    ``k`` pairs ((count desc, a asc, b asc) total order).

    Scale: word counts first (ONE token-keyed combining shuffle — the
    Zipf head pre-reduces map-side), then pairs explode over the
    DISTINCT-word frame (vocabulary-sized, orders of magnitude smaller
    than the corpus) weighted by the word count, then one pair-keyed
    combining sum. The corpus is touched exactly once, map-side; top-k
    is TakeOrderedAndProject, never a global sort."""
    words = (
        df.select(F.explode(tokens_col(col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    # symbols = characters + end marker; adjacent pairs via slice
    syms = F.concat(F.split(F.col("w"), ""), F.array(F.lit(end_marker)))
    pairs = words.select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + 1).alias("b"),
                ),
            )
        ).alias("p"),
    )
    counts = (
        pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("wc").alias("count"))
    )
    if min_count > 1:
        counts = counts.where(F.col("count") >= int(min_count))
    if k is not None:
        counts = counts.orderBy(
            F.col("count").desc(), F.col("a"), F.col("b")
        ).limit(int(k))
    return counts


def corpus_divergence(
    a: DataFrame,
    b: DataFrame,
    col: str = "text",
    smoothing: float = 0.5,
) -> DataFrame:
    """Distribution drift between two corpora's word distributions — the
    mixture-tuning / domain-shift diagnostic (is this crawl increment
    like my training mix? how far is the code slice from the prose
    slice?). Returns ONE row: (vocab_size, n_tokens_a, n_tokens_b,
    kl_ab, kl_ba, js) with Kullback-Leibler both ways and the bounded
    Jensen-Shannon divergence (natural log), all over add-``smoothing``
    estimates on the UNION vocabulary (so unseen-in-one-side tokens
    contribute finitely), rounded to 6 dp.

    Scale: one token-keyed combining count per side (Zipf heads
    pre-reduce map-side), a vocabulary-sized full outer join, and a
    single-row aggregate — the corpora are each touched once, map-side;
    nothing downstream is corpus-scale."""
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")

    def _counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens_col(col)).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(name))
        )

    joined = (
        _counts(a, "ca")
        .join(_counts(b, "cb"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.count("*").alias("v"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    ).collect()[0]
    v, na, nb = int(tot["v"]), int(tot["na"] or 0), int(tot["nb"] or 0)
    if v == 0:
        return a.sparkSession.createDataFrame(
            [(0, 0, 0, 0.0, 0.0, 0.0)],
            "vocab_size long, n_tokens_a long, n_tokens_b long, "
            "kl_ab double, kl_ba double, js double",
        )
    # add-k smoothed probabilities over the union vocabulary; the
    # denominators are driver-side literals so the whole reduction is
    # one map-side projection + single-row aggregate
    p = (F.col("ca") + smoothing) / F.lit(na + smoothing * v)
    q = (F.col("cb") + smoothing) / F.lit(nb + smoothing * v)
    m = (p + q) / 2
    return joined.agg(
        F.lit(v).cast("long").alias("vocab_size"),
        F.lit(na).cast("long").alias("n_tokens_a"),
        F.lit(nb).cast("long").alias("n_tokens_b"),
        F.round(F.sum(p * F.log(p / q)), 6).alias("kl_ab"),
        F.round(F.sum(q * F.log(q / p)), 6).alias("kl_ba"),
        F.round(
            (F.sum(p * F.log(p / m)) + F.sum(q * F.log(q / m))) / 2, 6
        ).alias("js"),
    )


def c4_quality_filter(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_lines: int = 3,
    require_terminal_punct: bool = True,
) -> DataFrame:
    """C4-style line-level cleaning heuristics (Raffel et al. 2020
    §2.2 — the rules that produced C4 from Common Crawl):

    - keep only lines with >= ``min_words_per_line`` words;
    - keep only lines ending in terminal punctuation (``. ! ? "``,
      toggleable via ``require_terminal_punct`` for corpora that are
      not sentence-punctuated);
    - drop lines containing the word "javascript" (boilerplate
      "enable javascript" banners);
    - drop the whole DOCUMENT when it contains "lorem ipsum", a curly
      brace (code), or fewer than ``min_lines`` surviving lines.

    The upstream bad-words blocklist rule is intentionally NOT shipped
    (the list is a third-party artifact we will not vendor); compose
    with a caller-supplied term filter if needed. The 3-sentence-span
    dedup rule lives in :func:`duplicate_spans` / CCNet paragraph dedup.

    Returns (doc_id, clean_text, n_lines, n_kept_lines, keep):
    ``clean_text`` joins the surviving lines with newline; ``keep`` is
    the document-level verdict. NULL text -> (NULL, 0, 0, false).

    Scale: one map-side projection — split/filter/join are JVM
    higher-order column exprs, zero shuffles, zero joins."""

    def _line_ok(x: F.Column) -> F.Column:
        words = F.size(
            F.filter(F.split(F.lower(x), _TOKEN_SPLIT), lambda t: t != "")
        )
        ok = words >= F.lit(int(min_words_per_line))
        if require_terminal_punct:
            ok = ok & x.rlike(r'[.!?"]$')
        return ok & ~F.lower(x).rlike(r"\bjavascript\b")

    # NB: transform(col, F.trim) would bind the element INDEX to trim's
    # optional trim-character-set parameter — the lambda is load-bearing
    lines = F.filter(
        F.transform(F.split(F.col(col), r"\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    kept = F.filter(lines, _line_ok)
    low = F.lower(F.col(col))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        lines.alias("ls"),
        kept.alias("ks"),
        (
            ~low.contains("lorem ipsum") & ~low.contains("{")
        ).alias("doc_ok"),
    )
    # guard BOTH size legs: legacy size(NULL) = -1, ANSI size(NULL) = NULL
    def _n(c: str) -> F.Column:
        return (
            F.when(F.col(c).isNotNull(), F.size(c))
            .otherwise(F.lit(0))
            .cast("long")
        )

    return base.select(
        "doc_id",
        F.array_join("ks", "\n").alias("clean_text"),
        _n("ls").alias("n_lines"),
        _n("ks").alias("n_kept_lines"),
        (
            (_n("ks") >= F.lit(int(min_lines)))
            & F.coalesce("doc_ok", F.lit(False))
        ).alias("keep"),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    col: str = "text",
    end_marker: str = "</w>",
) -> DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016) — the iterative
    loop whose single inner statistic :func:`bpe_pair_counts` computes:
    start from characters (+ word-end marker), then ``n_merges`` times
    merge the corpus-frequency-weighted argmax adjacent pair (ties
    broken (count desc, a asc, b asc) — a deterministic total order,
    so training replays identically across partitionings and runs).

    Returns the merge table (step, a, b, count) — the artifact a
    tokenizer ships. Stops early when no adjacent pair remains.

    Scale: the corpus is touched ONCE (one token-keyed combining
    shuffle into the word-frequency table); every training round then
    runs on the DISTINCT-word frame (vocabulary-sized — tens of
    millions of rows at 100 TB, never corpus-scale): one pair-keyed
    combining count + a 1-row TakeOrderedAndProject argmax, and a
    map-side fold applying the merge. The per-round frame is eagerly
    localCheckpoint-ed so plan depth stays constant across rounds
    (the fold expression would otherwise nest ``n_merges`` deep).
    This is an inherently ITERATIVE algorithm (each merge depends on
    the argmax of the previous state), so it carries a pytest oracle
    (exact match vs a reference Python trainer) instead of a
    single-statement SQL oracle."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    words = (
        df.select(F.explode(tokens_col(col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    syms0 = F.concat(F.split(F.col("w"), ""), F.array(F.lit(end_marker)))
    # lazy checkpoints: each round's vocab materializes DURING that
    # round's argmax job instead of in a separate eager job — halves the
    # per-round job count (plan depth is still cut once materialized;
    # round N+1 reads round N's checkpointed blocks)
    vocab = words.select("wc", syms0.alias("syms")).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(int(n_merges)):
        # guard: a fully-merged word has ONE symbol, and
        # sequence(1, 0) DESCENDS ([1, 0]) instead of being empty
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("a"),
                    F.element_at("syms", i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        pairs = vocab.select("wc", F.explode(pair_arr).alias("p"))
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("wc").alias("count"))
            .orderBy(F.col("count").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["count"])
        merges.append((step, a, b, cnt))
        # left-to-right non-overlapping merge: fold the symbol array,
        # joining the last accumulated symbol with the current one when
        # they equal (a, b); a just-merged symbol can never re-merge in
        # the same pass (that would need b == "")
        merged = F.aggregate(
            "syms",
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        vocab = vocab.select("wc", merged.alias("syms")).localCheckpoint(
            eager=False
        )
    return df.sparkSession.createDataFrame(
        merges, "step int, a string, b string, count long"
    )


def apply_bpe(
    df: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    col: str = "text",
    id_col: str = "doc_id",
    end_marker: str = "</w>",
) -> DataFrame:
    """Segment each document with a trained BPE merge table
    (:func:`train_bpe`): every word starts as characters + the word-end
    marker, then merges apply in RANK order (lowest-rank adjacent pair
    first — the standard greedy BPE encoder, e.g. the GPT-2 reference
    encoder), exactly inverting training. Returns (id_col, bpe_tokens,
    n_bpe_tokens) with ``bpe_tokens`` the per-doc symbol sequence.

    Scale: the merge table is a driver-side broadcast (tokenizers are
    tens of thousands of rows); segmentation is a map-only Arrow-batched
    pass (``mapInPandas``) with a per-batch word cache — Python is
    acceptable here because the greedy rank loop is data-dependent
    per word and has no JVM-expressible form; the word cache makes the
    amortized cost per INSTANCE tiny (Zipf: most instances hit the
    cache)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("step").collect()
        merge_list = [(r["a"], r["b"]) for r in rows]
    else:
        merge_list = list(merges)
    ranks = {pair: i for i, pair in enumerate(merge_list)}
    import re as _re

    # ASCII mode is load-bearing: train_bpe tokenizes with the JVM's
    # \W+ (ASCII word chars only — 'cafe\u0301' splits at the accent),
    # while Python's default \W is Unicode-aware and would keep it
    # whole, so encoding would diverge from training on any non-ASCII
    # text (trained merges never firing, separators leaking as
    # symbols)
    token_re = _re.compile(r"\W+", _re.ASCII)

    def encode_word(w: str) -> list[str]:
        syms = list(w) + [end_marker]
        while len(syms) > 1:
            best, best_rank = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            a, b = syms[best], syms[best + 1]
            # merge ALL occurrences of (a, b) left-to-right, as in
            # training's single-pass fold
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def segment(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out, counts = [], []
            for text in pdf["__text"]:
                if text is None:
                    toks_out.append(None)
                    counts.append(0)
                    continue
                toks: list[str] = []
                for w in token_re.split(text.lower()):
                    if not w:
                        continue
                    enc = cache.get(w)
                    if enc is None:
                        enc = encode_word(w)
                        cache[w] = enc
                    toks.extend(enc)
                toks_out.append(toks)
                counts.append(len(toks))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["__id"],
                    "bpe_tokens": toks_out,
                    "n_bpe_tokens": counts,
                }
            )

    base = df.select(
        F.col(id_col).alias("__id"), F.col(col).alias("__text")
    )
    # id type follows the CALLER's column (a code corpus keys by path
    # strings) — hardcoding long would break Arrow conversion
    id_type = df.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        segment,
        f"doc_id {id_type}, bpe_tokens array<string>, n_bpe_tokens long",
    ).withColumnRenamed("doc_id", id_col)


def code_quality(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    max_line_len: int = 1000,
    max_avg_line_len: int = 100,
    min_alnum_frac: float = 0.25,
    drop_autogenerated: bool = True,
) -> DataFrame:
    """Source-code quality heuristics (the SantaCoder/StarCoder
    preprocessing rules — Allal et al. 2023 §3, Li et al. 2023 §3.1),
    for corpora whose documents are FILES rather than prose — the
    (repo, path, lang, content) table of a source-code crawl:

    - drop files with any line longer than ``max_line_len`` chars or an
      average line length above ``max_avg_line_len`` (minified /
      data-blob files);
    - drop files whose alphanumeric-character fraction is below
      ``min_alnum_frac`` (binary blobs, encoded payloads, ASCII art);
    - drop files that self-identify as generated ("auto-generated",
      "autogenerated", "generated by" in the first 512 chars —
      lockfiles, protobuf output, build artifacts), toggleable.

    Returns ``(doc_id, max_line, avg_line, alnum_frac, keep)``; the
    metric columns are kept so callers can re-threshold without a
    second scan. NULL text -> (0, 0.0, 0.0, false).

    Scale: one map-side projection — line splitting and the character
    ratios are JVM higher-order / regexp column exprs; zero shuffles,
    zero joins, zero Python."""
    lens = F.transform(F.split(F.col(col), r"\n"), lambda x: F.length(x))
    n_alnum = F.length(F.regexp_replace(F.col(col), "[^A-Za-z0-9]", ""))
    head = F.lower(F.substring(F.col(col), 1, 512))
    autogen = (
        head.contains("auto-generated")
        | head.contains("autogenerated")
        | head.contains("generated by")
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col(col).isNotNull(), F.array_max(lens))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("max_line"),
        F.when(
            F.col(col).isNotNull(),
            F.round(
                F.aggregate(
                    lens, F.lit(0).cast("long"), lambda acc, x: acc + x
                )
                / F.size(lens),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_line"),
        F.when(
            F.col(col).isNotNull() & (F.length(col) > 0),
            F.round(n_alnum / F.length(col), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("alnum_frac"),
        F.coalesce(autogen, F.lit(False)).alias("_autogen"),
        F.col(col).isNotNull().alias("_ok"),
    )
    keep = (
        F.col("_ok")
        & (F.col("max_line") <= F.lit(int(max_line_len)))
        & (F.col("avg_line") <= F.lit(float(max_avg_line_len)))
        & (F.col("alnum_frac") >= F.lit(float(min_alnum_frac)))
    )
    if drop_autogenerated:
        keep = keep & ~F.col("_autogen")
    return base.withColumn("keep", keep).drop("_autogen", "_ok")
