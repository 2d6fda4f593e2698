"""pack_sequences (concat-and-chunk distributed prefix scan) and the
deterministic sampling ops (hash-Bernoulli + per-group mixture)."""

import re

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops.packing import pack_sequences
from phphinder_spark.ops.sampling import (
    deterministic_sample,
    mixture_sample,
    threshold_hex,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _expected_packing(docs, max_tokens):
    toks = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(F.split(F.lower("text"), r"\W+"), lambda x: x != "")
            ).alias("n"),
        )
        .orderBy("doc_id")
        .collect()
    )
    cum, out = 0, {}
    for t in toks:
        out[t.doc_id] = (t.n, cum // max_tokens, cum % max_tokens)
        cum += t.n
    return out


def test_pack_matches_serial_replay(docs):
    expected = _expected_packing(docs, 256)
    got = pack_sequences(docs, 256).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[r.doc_id] == (r.n_tokens, r.seq_id, r.seq_offset)


def test_pack_partitioning_invariance(docs):
    """seq assignment depends only on the global id order — input
    partitioning and scan parallelism must not change a single row."""
    base = sorted(map(tuple, pack_sequences(docs, 128).collect()))
    for variant in (
        pack_sequences(docs, 128, num_partitions=1),
        pack_sequences(docs, 128, num_partitions=7),
        pack_sequences(docs.repartition(13), 128, num_partitions=3),
    ):
        assert sorted(map(tuple, variant.collect())) == base


def test_pack_precomputed_token_column(docs):
    pre = docs.withColumn(
        "ntok",
        F.size(F.filter(F.split(F.lower("text"), r"\W+"), lambda x: x != "")),
    )
    a = sorted(map(tuple, pack_sequences(docs, 200).collect()))
    b = sorted(
        map(tuple, pack_sequences(pre, 200, tokens_col_name="ntok").collect())
    )
    assert a == b


def test_pack_offsets_within_budget_and_streams_contiguously(docs):
    rows = sorted(pack_sequences(docs, 100).collect(), key=lambda r: r.doc_id)
    pos = 0
    for r in rows:
        assert 0 <= r.seq_offset < 100
        assert r.seq_id * 100 + r.seq_offset == pos
        pos += r.n_tokens


def test_pack_empty_and_zero_token_docs(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "gamma"), (4, None), (5, "delta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset) for r in
           pack_sequences(df, 2).collect()}
    # doc 2 is empty and doc 4 is NULL: both contribute ZERO tokens (not
    # legacy size(NULL) = -1, which would shift every later doc's offset)
    # and attach at the current stream position
    assert got == {1: (2, 0, 0), 2: (0, 1, 0), 3: (1, 1, 0),
                   4: (0, 1, 1), 5: (1, 1, 1)}
    assert pack_sequences(df.where("doc_id < 0"), 2).count() == 0


def test_pack_null_precomputed_count(spark):
    """A NULL in a precomputed token-count column is coalesced to 0
    instead of crashing the Arrow cumsum (to_numpy('int64') on NaN)."""
    df = spark.createDataFrame(
        [(1, 3), (2, None), (3, 2)], "doc_id long, n_tok long"
    )
    got = {r.doc_id: (r.n_tokens, r.seq_id, r.seq_offset) for r in
           pack_sequences(df, 4, tokens_col_name="n_tok").collect()}
    assert got == {1: (3, 0, 0), 2: (0, 0, 3), 3: (2, 0, 3)}


def test_pack_rejects_bad_budget(docs):
    with pytest.raises(ValueError, match="max_tokens"):
        pack_sequences(docs, 0)


def test_pack_plan_single_corpus_shuffle(docs):
    """The corpus side of the plan must be checkpoint-scan -> MapInPandas
    -> broadcast join: every Exchange belongs to the tiny per-partition
    totals branch, and the corpus is never re-shuffled for the window."""
    plan = pack_sequences(docs, 256)._sc._jvm.PythonSQLUtils.explainString(
        pack_sequences(docs, 256)._jdf.queryExecution(), "formatted"
    )
    assert "MapInPandas" in plan
    # the only Window is the per-partition-totals prefix (post-aggregate)
    window_sections = re.findall(r"Window \(\d+\)", plan)
    assert len(window_sections) == 1
    # corpus branch (the join's left side, ':'-prefixed in the tree):
    # MapInPandas over the checkpointed RDD, with NO Exchange
    tree = plan.split("\n\n")[0]
    left_branch = [ln for ln in tree.splitlines() if ln.lstrip().startswith(":")]
    assert any("MapInPandas" in ln for ln in left_branch)
    assert not any("Exchange" in ln for ln in left_branch)


# --- deterministic / mixture sampling ---


def test_threshold_hex_edges():
    assert threshold_hex(0.0) == "" and threshold_hex(-1) == ""
    assert threshold_hex(1.0) == "g" and threshold_hex(2.0) == "g"
    mid = threshold_hex(0.5)
    assert len(mid) == 15 and int(mid, 16) == 16**15 // 2
    # "g" sorts after every hex string; "" before every one
    assert "f" * 15 < "g" and not ("0" * 15 < "")


def test_deterministic_sample_reproducible_and_nested(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.4).select("doc_id").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.4).select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()
    # thresholds nest: the 0.2 sample is a subset of the 0.4 sample
    small = {r.doc_id for r in deterministic_sample(docs, 0.2).select("doc_id").collect()}
    assert small <= a
    # fraction is approximately honored (60-bit uniform hash)
    n = docs.count()
    assert 0.25 * n < len(a) < 0.55 * n


def test_deterministic_sample_salt_gives_different_sample(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.5).select("doc_id").collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs, 0.5, salt="other").select("doc_id").collect()}
    assert a != b


def test_deterministic_sample_extremes(docs):
    assert deterministic_sample(docs, 0.0).count() == 0
    assert deterministic_sample(docs, 1.0).count() == docs.count()


def test_deterministic_sample_matches_duckdb(docs):
    """Engine-portability contract: DuckDB replaying the identical
    predicate selects the identical rows (the oracle-row mechanism)."""
    duckdb = pytest.importorskip("duckdb")
    thr = threshold_hex(0.37)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    duck = {
        r[0]
        for r in con.execute(
            "SELECT doc_id FROM documents WHERE substr(sha256(concat_ws("
            f"'|', 'phphinder', CAST(doc_id AS VARCHAR))), 1, 15) < '{thr}'"
        ).fetchall()
    }
    sparkside = {
        r.doc_id
        for r in deterministic_sample(docs, 0.37).select("doc_id").collect()
    }
    assert sparkside == duck


def test_mixture_sample_rates_and_default(docs):
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert "en" in langs and len(langs) > 1
    m = mixture_sample(docs, {"en": 1.0, "de": 0.0}, group_col="lang")
    counts = {r["lang"]: r["count"] for r in m.groupBy("lang").count().collect()}
    n_en = docs.where("lang = 'en'").count()
    assert counts.get("en") == n_en  # rate 1.0 keeps every row
    assert "de" not in counts  # rate 0.0 drops every row
    # unlisted groups follow default_rate
    assert set(counts) == {"en"}
    m2 = mixture_sample(
        docs, {"en": 0.0}, group_col="lang", default_rate=1.0
    )
    assert m2.count() == docs.count() - n_en


def test_mixture_sample_rejects_upsample_rates(docs):
    """Rates above 1 used to silently clamp to keep-all; a keep-predicate
    cannot upweight, so the op now refuses and points at
    mixture_upsample."""
    with pytest.raises(ValueError, match="mixture_upsample"):
        mixture_sample(docs, {"en": 3.0}, group_col="lang")
    with pytest.raises(ValueError, match="downsample-only"):
        mixture_sample(docs, {"en": 0.5}, group_col="lang", default_rate=1.5)


def test_mixture_upsample_multiplicity_and_downsample_parity(docs):
    from phphinder_spark.ops.sampling import mixture_upsample

    rates = {"en": 2.0, "de": 0.3}
    up = mixture_upsample(docs, rates, group_col="lang", default_rate=1.0)
    rows = up.select("doc_id", "lang", "copy_id").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault((r.doc_id, r.lang), []).append(r.copy_id)
    # integer rate 2.0: every en doc appears exactly twice, copy_id 0 and 1
    n_en = docs.where("lang = 'en'").count()
    en_docs = [k for k in by_doc if k[1] == "en"]
    assert len(en_docs) == n_en
    assert all(sorted(by_doc[k]) == [0, 1] for k in en_docs)
    # fractional rate <= 1 degrades to mixture_sample's exact keep-set
    kept_de = {k[0] for k in by_doc if k[1] == "de"}
    expect_de = {
        r.doc_id
        for r in mixture_sample(
            docs.where("lang = 'de'"), {"de": 0.3}, group_col="lang"
        ).select("doc_id").collect()
    }
    assert kept_de == expect_de
    assert all(by_doc[(d, "de")] == [0] for d in kept_de)
    # unlisted groups follow default_rate=1.0: exactly one copy each
    other = docs.where("lang NOT IN ('en', 'de')")
    assert len([k for k in by_doc if k[1] not in ("en", "de")]) == other.count()


def test_mixture_upsample_fractional_expected_multiplicity(spark):
    from phphinder_spark.ops.sampling import mixture_upsample

    n = 4000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    up = mixture_upsample(df, {"en": 2.5}, group_col="lang")
    total = up.count()
    # every doc gets >= 2 copies; ~half get a 3rd -> total ~ 2.5n
    assert 2 * n <= total <= 3 * n
    assert abs(total - 2.5 * n) < 0.1 * n
    # determinism: replay is row-identical
    assert up.exceptAll(mixture_upsample(df, {"en": 2.5}, group_col="lang")).count() == 0


def test_mixture_upsample_is_map_side_only(docs):
    from phphinder_spark.ops.sampling import mixture_upsample

    q = mixture_upsample(docs, {"en": 2.5}, group_col="lang")
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_mixture_sample_agrees_with_per_group_deterministic(docs):
    """mixture_sample == per-group deterministic_sample union (same salt
    and key -> same hash -> same decisions)."""
    rates = {"en": 0.6, "de": 0.3}
    m = {r.doc_id for r in
         mixture_sample(docs, rates, group_col="lang").select("doc_id").collect()}
    expect = set()
    for g, f in rates.items():
        part = docs.where(F.col("lang") == g)
        expect |= {r.doc_id for r in
                   deterministic_sample(part, f).select("doc_id").collect()}
    assert m == expect


def test_mixture_sample_is_map_side_only(docs):
    plan = mixture_sample(
        docs, {"en": 0.5}, group_col="lang"
    )._sc._jvm.PythonSQLUtils.explainString(
        mixture_sample(docs, {"en": 0.5}, group_col="lang")
        ._jdf.queryExecution(),
        "simple",
    )
    assert "Exchange" not in plan and "Join" not in plan


def test_prepare_training_corpus_composes_the_stages(docs, spark):
    """prepare_training_corpus == clean_corpus -> mixture_sample ->
    pack_sequences(scrubbed), row-for-row."""
    from phphinder_spark.ops.pipeline import clean_corpus, prepare_training_corpus

    rates = {"en": 0.8, "de": 0.5}
    got = sorted(
        map(tuple, prepare_training_corpus(
            docs, rates, group_col="lang", max_tokens=128,
            default_rate=0.25, min_words=20, min_stop_hits=1,
        ).collect())
    )

    kept = clean_corpus(docs, min_words=20, min_stop_hits=1)
    kept_g = kept.join(docs.select("doc_id", "lang"), "doc_id")
    mixed = mixture_sample(kept_g, rates, group_col="lang", default_rate=0.25)
    packed = pack_sequences(mixed, 128, text_col="scrubbed")
    expect = sorted(
        map(tuple, packed.join(
            mixed.select("doc_id", "cluster_id", "lang"), "doc_id"
        ).select(
            "doc_id", "cluster_id", "lang", "n_tokens", "seq_id", "seq_offset"
        ).collect())
    )
    assert got == expect and len(got) > 0
    # packing is over the surviving set only: contiguous token stream
    pos = 0
    for r in sorted(got):
        doc_id, _, _, n_tokens, seq_id, seq_offset = r
        assert seq_id * 128 + seq_offset == pos
        pos += n_tokens


# --- temperature rebalancing ---


def test_temperature_rates_hand_math(spark):
    from phphinder_spark.ops.sampling import temperature_rates

    rows = (
        [(i, "en") for i in range(100)]
        + [(i + 100, "de") for i in range(25)]
        + [(i + 200, "fr") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    r = temperature_rates(docs, alpha=0.5)
    # r_g = (n_g / n_min) ** (alpha - 1); n_min = 5 (fr)
    assert r["fr"] == 1.0
    assert r["de"] == round((25 / 5) ** -0.5, 6)
    assert r["en"] == round((100 / 5) ** -0.5, 6)
    # kept counts proportional to n^alpha: en/de expected ratio 2 = sqrt(4)
    assert abs((100 * r["en"]) / (25 * r["de"]) - 2.0) < 1e-9
    # alpha=1 keeps the natural distribution (all rates 1.0)
    assert set(temperature_rates(docs, alpha=1.0).values()) == {1.0}
    # alpha=0 equalizes expected kept counts across groups
    r0 = temperature_rates(docs, alpha=0.0)
    assert abs(100 * r0["en"] - 5) < 1e-3 and abs(25 * r0["de"] - 5) < 1e-3


def test_temperature_rates_compose_with_mixture(spark):
    from phphinder_spark.ops.sampling import (
        mixture_sample,
        temperature_rates,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = temperature_rates(docs, alpha=0.3)
    kept = mixture_sample(docs, rates, group_col="lang")
    # deterministic: same rates + same hashes => identical re-run
    again = mixture_sample(docs, rates, group_col="lang")
    assert sorted(r.doc_id for r in kept.select("doc_id").collect()) == \
        sorted(r.doc_id for r in again.select("doc_id").collect())
    # the smallest language is never downsampled
    n_by = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    smallest = min(n_by, key=n_by.get)
    assert rates[smallest] == 1.0
    k_by = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert k_by[smallest] == n_by[smallest]


def test_temperature_rates_edges(spark):
    from phphinder_spark.ops.sampling import temperature_rates

    import pytest as _pytest

    docs = spark.createDataFrame([(1, "en")], ["doc_id", "lang"])
    assert temperature_rates(docs) == {"en": 1.0}
    empty = docs.where("doc_id < 0")
    assert temperature_rates(empty) == {}
    with _pytest.raises(ValueError, match="alpha"):
        temperature_rates(docs, alpha=-0.1)
    # alpha > 1 would emit rates > 1 (head upweighting), which
    # mixture_sample must refuse — rejected at the source
    with _pytest.raises(ValueError, match=r"\[0, 1\]"):
        temperature_rates(docs, alpha=1.5)
