"""Composed training-data cleaning pipeline — the end-to-end flow the
individual operators exist for:

    raw corpus --gopher quality gate--> --PII scrub--> --minhash-LSH
    pairs--> --connected components--> keep one doc per near-dup cluster
    [--benchmark n-gram decontamination--> drop eval-contaminated docs]

Each stage is one of the independently-oracled operators (ops/dedup.py,
ops/textstats.py); the composition itself carries a value-level DuckDB
oracle too (__spark_entry__ ``pipeline_clean_corpus``), so the JOINED
result — not just the parts — is certified.

Scale shape: quality + scrub are map-only projections; the dedup leg is
the banded LSH self-join + label propagation (see their docstrings); the
final assembly is three id-keyed joins on uniform doc_id — no new
shuffle pattern beyond the parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from phphinder_spark.ops.dedup import dedup_clusters, minhash_lsh_pairs
from phphinder_spark.ops.textstats import (
    BenchmarkGrams,
    gopher_quality,
    ngram_contamination,
    pii_scrub,
    remove_contaminated_spans,
)


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.6,
    min_words: int = 20,
    min_stop_hits: int = 2,
    benchmark: DataFrame | BenchmarkGrams | None = None,
    decontam_n: int = 8,
    decontam_mode: str = "drop",
) -> DataFrame:
    """(doc_id, cluster_id, scrubbed) for every KEPT document: quality
    passes the Gopher rules, text is PII-scrubbed, only the minimum id
    of each near-dup cluster survives, and (when ``benchmark`` is given)
    benchmark overlap is handled per ``decontam_mode`` — the complete
    standard pre-training cleaning flow.

    ``decontam_mode``:

    - ``'drop'`` (default, the GPT-3 §C form): a kept doc sharing any
      word ``decontam_n``-gram with the benchmark is dropped whole.
    - ``'cut'`` (the surgical form): contaminated docs SURVIVE, but the
      tokens covered by benchmark-overlapping spans are cut from their
      ``scrubbed`` text (:func:`remove_contaminated_spans` over the
      PII-scrubbed text — what would actually ship to training).
      ``scrubbed`` is then token-normalized (space-joined surviving
      tokens), matching that op's contract.

    Dedup runs over the FULL corpus (quality rejects must still suppress
    their near-duplicates' content — dropping them before pairing would
    let a low-quality twin's sibling through as "unique"). The quality,
    dedup, and decontamination verdicts then intersect on the keeper
    set — each an id-keyed join on uniform doc ids. In 'cut' mode the
    keeper set is lazily checkpointed so the cut leg's two branches
    read one materialization of the LSH/CC work. ``benchmark`` may be a
    :func:`phphinder_spark.ops.textstats.prepare_benchmark_grams`
    artifact (prepared once per eval suite — skips the broadcast-size
    guard's count job on every call) or a raw DataFrame."""
    if decontam_mode not in ("drop", "cut"):
        raise ValueError(
            f"decontam_mode must be 'drop' or 'cut', got {decontam_mode!r}"
        )
    pairs = minhash_lsh_pairs(df, text_col, id_col, threshold=jaccard_threshold)
    clusters = dedup_clusters(df, pairs, id_col)
    quality = gopher_quality(
        df, text_col, id_col, min_words=min_words, min_stop_hits=min_stop_hits
    )
    scrub = pii_scrub(df, text_col, id_col)
    out = (
        clusters.join(quality.select("doc_id", "gopher_pass"), "doc_id")
        .join(scrub.select("doc_id", "scrubbed"), "doc_id")
        .where(~F.col("is_dup") & F.col("gopher_pass"))
    )
    if benchmark is not None and decontam_mode == "drop":
        decon = ngram_contamination(
            df, benchmark, n=decontam_n, col=text_col, id_col=id_col
        )
        out = out.join(
            decon.select("doc_id", "contaminated"), "doc_id"
        ).where(~F.col("contaminated"))
    elif benchmark is not None:
        kept = out.select("doc_id", "cluster_id", "scrubbed").localCheckpoint(
            eager=False
        )
        cut = remove_contaminated_spans(
            kept, benchmark, n=decontam_n, col="scrubbed", bench_col=text_col
        )
        return kept.drop("scrubbed").join(
            cut.select("doc_id", F.col("cleaned").alias("scrubbed")), "doc_id"
        ).select("doc_id", "cluster_id", "scrubbed")
    return out.select("doc_id", "cluster_id", "scrubbed")


def prepare_training_corpus(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "phphinder",
    **clean_kwargs,
) -> DataFrame:
    """The complete pre-training data-prep flow in one call: clean
    (quality gate + PII scrub + transitive near-dedup, optionally
    decontamination via ``clean_kwargs``), then per-group deterministic
    MIXTURE sampling, then concat-and-chunk SEQUENCE PACKING of the
    surviving docs' scrubbed text.

    Returns (doc_id, cluster_id, <group_col>, n_tokens, seq_id,
    seq_offset) — one row per kept+sampled doc, ready to hand to a
    training data loader. Packing counts tokens of the SCRUBBED text
    (what would actually be trained on), in doc_id order.

    Scale: the cleaning legs keep their own shapes (see
    :func:`clean_corpus`); the kept set is lazily checkpointed so the
    mixture filter and the packing scan read ONE materialization instead
    of re-running the LSH/CC legs per consumer; sampling is map-side;
    packing adds its single range shuffle + Arrow cumsum."""
    from phphinder_spark.ops.packing import pack_sequences
    from phphinder_spark.ops.sampling import mixture_sample

    kept = clean_corpus(df, text_col, id_col, **clean_kwargs)
    kept_g = kept.join(
        df.select(F.col(id_col).alias("doc_id"), F.col(group_col)), "doc_id"
    )
    mixed = mixture_sample(
        kept_g,
        rates,
        group_col=group_col,
        key_col="doc_id",
        default_rate=default_rate,
        salt=salt,
    ).localCheckpoint(eager=False)
    packed = pack_sequences(mixed, max_tokens, id_col="doc_id", text_col="scrubbed")
    return packed.join(
        mixed.select("doc_id", "cluster_id", group_col), "doc_id"
    ).select(
        "doc_id", "cluster_id", group_col, "n_tokens", "seq_id", "seq_offset"
    )


def ingest_increment(
    new_docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    against_threshold: float = 0.6,
    jaccard_threshold: float = 0.6,
    min_words: int = 20,
    min_stop_hits: int = 2,
    benchmark: DataFrame | BenchmarkGrams | None = None,
    decontam_n: int = 8,
    decontam_mode: str = "drop",
) -> DataFrame:
    """Incremental-crawl admission — the flow a continuously-updated
    100-TB training set actually runs per crawl increment:

    1. :func:`phphinder_spark.ops.dedup.dedup_against` drops every new
       doc that duplicates the EXISTING archive (exact sha256 or
       LSH-verified Jaccard >= ``against_threshold``) — the archive is
       never re-deduplicated;
    2. :func:`clean_corpus` runs the standard within-increment clean
       over the survivors (quality gate + PII scrub + transitive
       near-dup dedup + optional benchmark decontamination).

    Returns ``clean_corpus``'s (doc_id, cluster_id, scrubbed) for the
    admitted docs. Order matters and is part of the contract: archive
    duplicates are removed BEFORE the within-increment dedup, so a new
    doc whose only twin was archive-rejected still survives as the
    cluster representative of its own increment.

    Scale: the archive comparison is |new| x band-collision-rate (see
    dedup_against — never archive²); the admission filter is one
    id-keyed semi join on uniform ids; the clean stage then sees only
    the increment."""
    from phphinder_spark.ops.dedup import dedup_against

    flags = dedup_against(
        new_docs,
        reference,
        col=text_col,
        id_col=id_col,
        threshold=against_threshold,
    )
    fresh = new_docs.join(
        flags.where(~F.col("is_dup")).select(F.col("doc_id").alias(id_col)),
        id_col,
        "left_semi",
    )
    return clean_corpus(
        fresh,
        text_col=text_col,
        id_col=id_col,
        jaccard_threshold=jaccard_threshold,
        min_words=min_words,
        min_stop_hits=min_stop_hits,
        benchmark=benchmark,
        decontam_n=decontam_n,
        decontam_mode=decontam_mode,
    )
