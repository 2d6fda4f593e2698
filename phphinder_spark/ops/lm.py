"""N-gram language-model perplexity filtering (the CCNet recipe).

CCNet (Wenzek et al. 2020) filters web corpora by the perplexity of a
small LM trained on a trusted corpus, then keeps the head/middle of the
distribution. This module implements the distributed form with an add-k
bigram model:

- ``train_bigram_lm``: one (w1, w2)-keyed count shuffle with map-side
  combine (Zipfian head bigrams are pre-reduced per partition), one
  w1-keyed count, and a single-row vocab aggregate — the LM is a plain
  DataFrame artifact (observed rows + per-w1 backoff rows + one global
  OOV row), so it can be persisted, broadcast, or committed as a fixture.
- ``score_perplexity``: explode each doc into BOS-prefixed bigrams and
  fold the LM's round-6 log-probs — coalesce(observed, w1-backoff,
  global OOV) — into per-doc NLL and perplexity.
- ``perplexity_buckets``: CCNet's head/middle/tail split at caller-fixed
  literal cutoffs (quantile cutoffs differ across engines; literal
  thresholds replay exactly in SQL); ``suggest_cutoffs`` derives
  candidate literals from the score distribution once, to be pinned.
- ``dsir_log_weights`` / ``dsir_select_topk``: DSIR importance
  resampling (Xie et al. 2023) — log p_target - log p_raw under two LM
  artifacts, plus deterministic top-k selection.

Everything is JVM-side (split/slice/zip_with + joins + aggs — no Python
in any hot path) and every step is deterministic: counts are exact
integers and each log-prob is rounded to 6 decimals BEFORE the per-doc
sum, so the summed terms are bit-identical doubles in any engine and the
sum sits on the 1e-6 decimal grid (association-order noise ~1e-9 ≪ the
5e-7 distance to the nearest rounding midpoint) — ``nll_total`` is
therefore exactly reproducible cross-engine.  The per-bigram mean
``nll`` (and hence ``ppl``) divides that grid sum by the bigram count,
which CAN land exactly on a round-half-to-6 boundary (sum/40 is a
multiple of 2.5e-8), so its LAST decimal is engine-dependent on ~0.5%
of docs; value-level certification pins ``nll_total``, and bucket
cutoffs should be chosen away from any doc's ppl (they are literals
precisely so the caller can do that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_BOS = "<s>"


def _tokens(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
    )


def _bigrams(text_col: str) -> F.Column:
    """BOS-prefixed adjacent pairs: a doc with n tokens yields n bigrams
    (the first conditions on <s>), an empty doc yields none."""
    toks = F.concat(F.array(F.lit(_BOS)), _tokens(text_col))
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def train_bigram_lm(
    docs: DataFrame, k: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Add-k-smoothed bigram conditional log-probs over the corpus.

    Returns one DataFrame with three row kinds (the whole LM artifact):
    - (w1, w2, logp): observed bigrams,  ln((c12 + k) / (c1 + k·V));
    - (w1, NULL, logp): per-w1 backoff for unseen continuations,
      ln(k / (c1 + k·V));
    - (NULL, NULL, logp): global OOV for unseen w1, ln(1 / V).
    V = distinct corpus tokens (BOS excluded — it is never predicted).
    Every logp is rounded to 6 decimals so downstream sums are over
    identical terms in any engine."""
    bi = docs.select(F.explode(_bigrams(text_col)).alias("b")).select(
        "b.w1", "b.w2"
    )
    bi_counts = bi.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = bi.select(F.countDistinct("w2").alias("v"))
    kk = F.lit(float(k))
    obs = (
        bi_counts.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + kk) / (F.col("c1") + kk * F.col("v"))), 6
            ).alias("logp"),
        )
    )
    backoff = (
        uni.crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            F.lit(None).cast("string").alias("w2"),
            F.round(F.log(kk / (F.col("c1") + kk * F.col("v"))), 6).alias(
                "logp"
            ),
        )
    )
    # when-guard: an empty/tokenless training corpus has V=0 — emit a
    # NULL-logp OOV row (scoring against it yields NULL everywhere)
    # instead of tripping ANSI DIVIDE_BY_ZERO
    oov = vocab.select(
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.when(
            F.col("v") > 0, F.round(F.log(F.lit(1.0) / F.col("v")), 6)
        ).alias("logp"),
    )
    return obs.unionByName(backoff).unionByName(oov)


def score_perplexity(
    docs: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-doc (doc_id, n_bigrams, nll_total, nll, ppl) under a
    ``train_bigram_lm`` artifact: nll_total = round(-sum(logp), 6) (the
    cross-engine-stable quantity — see module docstring), nll =
    round(nll_total / n, 6), ppl = round(exp(nll), 6).  Docs with no
    tokens return n_bigrams=0 and NULL nll_total/nll/ppl.

    Scale: with ``broadcast_lm=False`` the doc side shuffles once on
    (w1, w2) for the observed join (bigram keys are Zipf-headed, but
    the LM side is pre-aggregated so the join is many-to-one); the
    backoff side is vocab-sized and the OOV side is one row — both
    broadcastable, and left as equi-joins so AQE broadcasts them when
    they fit.  Set ``broadcast_lm=True`` when the LM artifact fits in
    executor memory (it is vocab²-bounded and usually corpus-dwarfed):
    ALL three joins become broadcast-hash and scoring is MAP-ONLY up to
    the per-doc rollup — the corpus-scale bigram shuffle disappears
    (measured 4M docs / 160M bigrams, local[32]: 117 s SMJ -> map-side
    join; the observed side was ~1.6M rows, past the default 10 MB
    auto-broadcast threshold, which is why AQE alone does not pick it)."""
    obs = lm.where(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    if broadcast_lm:
        obs = F.broadcast(obs)
    backoff = lm.where(F.col("w1").isNotNull() & F.col("w2").isNull()).select(
        "w1", F.col("logp").alias("logp_bo")
    )
    if broadcast_lm:
        backoff = F.broadcast(backoff)
    oov = lm.where(F.col("w1").isNull()).select(
        F.col("logp").alias("logp_oov")
    )
    bi = docs.select(
        F.col(id_col).alias("id"), F.explode(_bigrams(text_col)).alias("b")
    ).select("id", "b.w1", "b.w2")
    scored = (
        bi.join(obs, ["w1", "w2"], "left")
        .join(backoff, "w1", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            "id",
            F.coalesce("logp", "logp_bo", "logp_oov").alias("lp"),
        )
        .groupBy("id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(-F.sum("lp"), 6).alias("nll_total"),
        )
        .withColumn(
            "nll", F.round(F.col("nll_total") / F.col("n_bigrams"), 6)
        )
        .withColumn("ppl", F.round(F.exp("nll"), 6))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(scored, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "nll_total",
            "nll",
            "ppl",
        )
    )


def perplexity_buckets(
    scored: DataFrame, lo: float, hi: float
) -> DataFrame:
    """CCNet's head/middle/tail split at literal perplexity cutoffs:
    head (ppl < lo, most fluent), middle ([lo, hi)), tail (>= hi or
    unscoreable). Map-only; cutoffs are caller-fixed literals because
    cross-engine quantile interpolation differs — compute them once on a
    reference corpus and pin them, as CCNet does."""
    return scored.withColumn(
        "bucket",
        F.when(F.col("ppl") < F.lit(float(lo)), F.lit("head"))
        .when(F.col("ppl") < F.lit(float(hi)), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )


def dsir_log_weights(
    docs: DataFrame,
    lm_target: DataFrame,
    lm_raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_lm: bool = False,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): log w(x) =
    log p_target(x) - log p_raw(x) under two ``train_bigram_lm``
    artifacts — a target LM trained on the trusted/domain corpus and a
    raw LM trained on the general pool. Docs resembling the target
    domain get high weights.

    Returns (id_col, n_bigrams, logw): logw = nll_total_raw -
    nll_total_target, a difference of two 1e-6-grid sums — exactly
    reproducible cross-engine (same argument as ``score_perplexity``'s
    nll_total). Docs with no tokens get NULL logw.

    Scale: two ``score_perplexity`` passes (each one bigram-keyed join
    against a pre-aggregated LM side) and an id-keyed join of two
    doc-sized frames.
    """
    t = score_perplexity(
        docs, lm_target, id_col, text_col, broadcast_lm=broadcast_lm
    ).select(
        F.col(id_col).alias("id"),
        "n_bigrams",
        F.col("nll_total").alias("nt_target"),
    )
    r = score_perplexity(
        docs, lm_raw, id_col, text_col, broadcast_lm=broadcast_lm
    ).select(
        F.col(id_col).alias("id"), F.col("nll_total").alias("nt_raw")
    )
    return t.join(r, "id").select(
        F.col("id").alias(id_col),
        "n_bigrams",
        F.round(F.col("nt_raw") - F.col("nt_target"), 6).alias("logw"),
    )


def dsir_select_topk(weights: DataFrame, k: int) -> DataFrame:
    """Deterministic DSIR selection: the k docs with the highest
    importance weight (NULL logw sorts last; doc_id breaks ties — a
    total order, so the selected set is partitioning-invariant).  The
    paper resamples with Gumbel noise; for a reproducible pipeline the
    hash-seeded variant is ``ops.sampling.deterministic_sample`` over
    the head of this ranking.  Physically a TakeOrderedAndProject —
    per-partition top-k then a k-sized driver merge, never a global
    sort."""
    id_col = weights.columns[0]
    return weights.orderBy(
        F.col("logw").desc_nulls_last(), F.col(id_col)
    ).limit(int(k))


def suggest_cutoffs(
    scored: DataFrame, q: tuple[float, float] = (1 / 3, 2 / 3)
) -> tuple[float, float]:
    """Candidate (lo, hi) perplexity cutoffs at the given quantiles of a
    ``score_perplexity`` result — a one-time helper for picking the
    literals ``perplexity_buckets`` wants (CCNet computes its cutoffs
    once on a reference corpus and pins them; quantile INTERPOLATION is
    engine-specific, which is exactly why the bucket op takes literals
    instead of recomputing quantiles per run). Uses approxQuantile
    (aggregate-sized driver transfer, no collect of the corpus)."""
    lo, hi = scored.where(F.col("ppl").isNotNull()).approxQuantile(
        "ppl", [float(q[0]), float(q[1])], 0.001
    )
    return float(lo), float(hi)
