"""Dedup / similarity / textstats / multimodal operator tests against the
driver-provided sf0.001 tables, with brute-force cross-checks."""

import os

import pytest
from pyspark.sql import functions as F

from phphinder_spark.ops import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    if not os.path.exists(f"{SF_DIR}/documents.parquet"):
        pytest.skip("testdata not available")
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    if not os.path.exists(f"{SF_DIR}/embeddings.parquet"):
        pytest.skip("testdata not available")
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_exact_duplicates(documents):
    out = dedup.exact_duplicates(documents, "text").cache()
    n = documents.count()
    assert out.count() == n
    # keeper of each group is not a dup; group sizes reconstruct n
    assert out.where(F.col("doc_id") == F.col("keep_id")).where(F.col("is_dup")).count() == 0
    # cross-check: duplicate count == n - distinct texts
    distinct_texts = documents.select("text").distinct().count()
    assert out.where("is_dup").count() == n - distinct_texts


def test_jaccard_pairs_bruteforce(spark, documents):
    sample = documents.limit(60).cache()
    pairs = dedup.jaccard_pairs(sample, "text", threshold=0.5).collect()
    rows = sample.select("doc_id", "text").collect()
    import re

    toks = {r["doc_id"]: set(t for t in re.split(r"\W+", r["text"].lower()) if t) for r in rows}
    # blocking restricts candidates; every reported pair must be correct
    for p in pairs:
        a, b = toks[p["a_id"]], toks[p["b_id"]]
        j = len(a & b) / max(1, len(a | b))
        assert abs(j - p["jaccard"]) < 1e-4
        assert j >= 0.5


def test_minhash_lsh_pairs_exact_verified(spark, documents):
    sample = documents.limit(80)
    pairs = dedup.minhash_lsh_pairs(sample, "text", threshold=0.6, num_perm=64, bands=16)
    rows = pairs.collect()
    assert rows  # non-trivial
    # output jaccard is the EXACT 3-shingle jaccard of LSH-banded candidates
    import re
    texts = {r["doc_id"]: r["text"] for r in sample.select("doc_id", "text").collect()}

    def shingles(t):
        toks = [x for x in re.split(r"\W+", t.lower()) if x]
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in rows:
        a, b = shingles(texts[r["a_id"]]), shingles(texts[r["b_id"]])
        exact = len(a & b) / max(1, len(a | b))
        assert abs(exact - r["jaccard"]) < 1e-4
        assert r["jaccard"] >= 0.6


def test_minhash_lsh_recall_on_planted_near_dups(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    rows = [(1, base), (2, base.replace("tok30", "changed")),
            (3, " ".join(f"other{i}" for i in range(60)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]) for r in
           dedup.minhash_lsh_pairs(df, "text", threshold=0.5).collect()}
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_self_dup(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river banks"),
            (3, "completely different content about spark inverted index construction"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.simhash_pairs(df, "text", max_hamming=12).collect()
    found = {(r["a_id"], r["b_id"]) for r in pairs}
    assert (1, 2) in found
    assert (1, 3) not in found and (2, 3) not in found


def _simhash_fingerprint(text):
    """Reference 64-bit SimHash (unsigned), mirroring ops.dedup.simhash_pairs."""
    import hashlib
    import re

    import numpy as np

    toks = [t for t in re.split(r"\W+", (text or "").lower()) if t]
    if toks:
        hv = np.frombuffer(
            b"".join(hashlib.md5(t.encode()).digest()[8:] for t in toks),
            dtype=np.uint8,
        ).reshape(len(toks), 8)
        bits = np.unpackbits(hv, axis=1, bitorder="little").astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
    else:
        acc = np.full(64, -1, dtype=np.int64)
    pos = (acc > 0).astype(np.uint64)
    return int((pos << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


@pytest.mark.parametrize("scheme", ["single", "pairs"])
def test_simhash_blocking_is_lossless(spark, documents, scheme):
    """BOTH pigeonhole keyings must find EVERY pair with hamming <= h —
    cross-checked against an all-pairs brute force on real docs (so the
    scheme='auto' pick can never change the output)."""
    sample = documents.limit(80).cache()
    got = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in dedup.simhash_pairs(
            sample, "text", max_hamming=6, scheme=scheme
        ).collect()
    }
    rows = sample.select("doc_id", "text").collect()
    fps = {r["doc_id"]: _simhash_fingerprint(r["text"]) for r in rows}
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(fps[a] ^ fps[b]).count("1")
            if d <= 6:
                want[(a, b)] = d
    assert got == want


def test_simhash_two_chunk_bucket_space_beats_single_chunk():
    """Scale property: max bucket occupancy under the two-chunk combo keys
    is far below the old single-chunk (64/(h+1))-bit scheme. At h=6 the
    old scheme has 512 buckets per chunk index — random fingerprints pile
    ~N/512 docs into each; 16-bit combo keys spread the same docs ~128x
    thinner."""
    from collections import Counter

    import numpy as np

    from phphinder_spark.ops.dedup import simhash_chunk_widths

    rng = np.random.RandomState(7)
    fps = rng.randint(0, 2**64, size=20000, dtype=np.uint64)

    # old: 7 chunks x 9 bits (bits 0..62)
    old = Counter()
    for ci in range(7):
        vals = (fps >> np.uint64(ci * 9)) & np.uint64(0x1FF)
        for v, c in zip(*np.unique(vals, return_counts=True)):
            old[(ci, int(v))] += int(c)

    widths = simhash_chunk_widths(6)
    assert widths == [8] * 8 and sum(widths) == 64
    chunks = [(fps >> np.uint64(i * 8)) & np.uint64(0xFF) for i in range(8)]
    new = Counter()
    for i in range(8):
        for j in range(i + 1, 8):
            vals = chunks[i] * np.uint64(256) + chunks[j]
            for v, c in zip(*np.unique(vals, return_counts=True)):
                new[(i, j, int(v))] += int(c)

    # old: ~20000/512 ≈ 39 docs per bucket; new: expected 20000/65536 < 1
    assert max(old.values()) > 25
    assert max(new.values()) <= 5


def test_embedding_dup_pairs(embeddings):
    out = dedup.embedding_dup_pairs(embeddings, threshold=0.99)
    for r in out.limit(5).collect():
        assert r["cosine"] >= 0.99


def test_cosine_topk_matches_bruteforce(spark, embeddings):
    queries = (
        embeddings.orderBy("vec_id").limit(3)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    topk = similarity.cosine_topk(embeddings, queries, k=5).collect()
    import numpy as np

    vecs = {r["vec_id"]: np.array(r["embedding"], dtype="float64") for r in embeddings.collect()}
    for qid in {r["query_id"] for r in topk}:
        q = vecs[qid] / np.linalg.norm(vecs[qid])
        sims = sorted(
            ((float(np.dot(v / np.linalg.norm(v), q)), vid) for vid, v in vecs.items()),
            key=lambda t: (-round(t[0], 6), t[1]),
        )[:5]
        got = sorted(
            [(r["cosine"], r["vec_id"]) for r in topk if r["query_id"] == qid],
            key=lambda t: (-t[0], t[1]),
        )
        assert [v for _, v in got] == [v for _, v in sims]


def test_srp_lsh_recall(spark, embeddings):
    queries = (
        embeddings.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    exact = similarity.cosine_topk(embeddings, queries, k=5)
    approx = similarity.srp_lsh_topk(embeddings, queries, k=5, n_bits=4, n_tables=6)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 6-table 4-bit SRP: OR-amplified recall
    assert recall >= 0.6, recall


def test_ivf_recall_and_cell_structure(spark, embeddings):
    queries = (
        embeddings.orderBy("vec_id").limit(5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )
    exact = similarity.cosine_topk(embeddings, queries, k=5)
    approx = similarity.ivf_topk(embeddings, queries, k=5, n_centroids=16, n_probe=6)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a_rows = approx.collect()
    a = {(r["query_id"], r["vec_id"]) for r in a_rows}
    recall = len(e & a) / len(e)
    # probing 6/16 cells: every reported neighbour is real (subset of the
    # scored candidates), and recall must be well above the 6/16 random
    # floor because queries probe their OWN cells first
    assert recall >= 0.6, recall
    # the query's own vector lives in a probed cell -> rank 1 self-match
    for qid in {r["query_id"] for r in a_rows}:
        best = min((r["rank"], r["vec_id"]) for r in a_rows if r["query_id"] == qid)
        assert best == (1, qid)


def test_jaccard_ngram_is_order_sensitive(spark):
    """Shingle Jaccard separates same-vocabulary different-order docs that
    token-set Jaccard calls identical."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # identical
        (3, "zeta epsilon delta gamma beta alpha"),   # same vocab, reversed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in dedup.jaccard_pairs(df, "text", threshold=0.9).collect()}
    ngr = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in dedup.jaccard_pairs(df, "text", threshold=0.9, shingle_k=3).collect()}
    assert tok[(1, 2)] == 1.0 and tok[(1, 3)] == 1.0  # token sets blind to order
    assert ngr[(1, 2)] == 1.0 and (1, 3) not in ngr   # shingles are not


def test_bpe_token_estimate(spark):
    rows = [
        (1, "Hello world, it's 2026!"),
        (2, None),
        (3, ""),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_pieces"]
           for r in textstats.bpe_token_estimate(df).collect()}
    # Hello| world|,| it|'s| 2026|!  -> 7 pieces
    assert got[1] == 7
    assert got[2] == 0 and got[3] == 0 and got[4] == 1  # whitespace run


def test_token_counts_and_quality(documents):
    tc = textstats.token_counts(documents).cache()
    row = tc.orderBy("doc_id").first()
    first_text = documents.orderBy("doc_id").first()["text"]
    import re

    toks = [t for t in re.split(r"\W+", first_text.lower()) if t]
    assert row["n_tokens"] == len(toks)
    assert row["n_distinct"] == len(set(toks))
    q = textstats.quality_scores(documents).first()
    assert 0.0 <= q["alpha_ratio"] <= 1.0
    assert 0.0 <= q["stopword_ratio"] <= 1.0


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el gato esta en la casa y es un dia"),
            (3, "der Hund ist nicht in der Kueche und das ist gut"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de"}


def test_fingerprints_stable_and_order_sensitive(spark, documents):
    a = {r["doc_id"]: r["fp"] for r in textstats.fingerprints(documents.limit(20)).collect()}
    b = {r["doc_id"]: r["fp"] for r in textstats.fingerprints(documents.limit(20)).collect()}
    assert a == b
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha gamma"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp"] for r in textstats.fingerprints(df).collect()}
    assert fp[1] == fp[3] != fp[2]


def test_multimodal_pipeline(spark):
    media = multimodal.synthetic_media(spark, 32)
    feats = multimodal.extract_features(media).cache()
    assert feats.count() == 32
    row = feats.first()
    assert len(row["features"]) == multimodal.FEATURE_DIM
    assert len(row["sha256"]) == 64
    # deterministic across reruns
    again = multimodal.extract_features(media)
    assert feats.orderBy("media_id").collect() == again.orderBy("media_id").collect()
    # every image row (BMP and PNG alike) decodes for REAL: the
    # undecodable-payload fallback emits a negative marker vector, and
    # channel means of a decoded image are >= 0
    for r in feats.where("kind = 'image'").collect():
        assert r["features"][0] >= 0.0, r["media_id"]


def test_resize_images_pipeline(spark):
    import numpy as np

    media = multimodal.synthetic_media(spark, 12)
    resized = multimodal.resize_images(media, 4, 4).cache()
    rows = {r["media_id"]: r for r in resized.collect()}
    assert len(rows) == 12
    for mid, r in rows.items():
        if r["kind"] == "image":
            assert r["resized"] and r["width"] == 4 and r["height"] == 4
            out = multimodal.decode_png(bytes(r["payload"]))
            assert out.shape == (4, 4, 3)
        else:
            assert not r["resized"]  # non-images pass through untouched
    # nearest-neighbor correctness on a known image
    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    small = multimodal.resize_image_array(img, 4, 4)
    assert np.array_equal(small, img[::2, ::2])


def test_bmp_roundtrip():
    import numpy as np

    rng = np.random.RandomState(7)
    for h, w in [(8, 8), (5, 3), (1, 1), (2, 7)]:  # incl. padded row widths
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = multimodal.decode_bmp(multimodal.encode_bmp(img))
        assert (out == img).all(), (h, w)


def test_png_roundtrip():
    import numpy as np

    rng = np.random.RandomState(5)
    for shape in [(8, 8, 3), (5, 7, 3), (1, 1, 3)]:
        img = rng.randint(0, 256, size=shape, dtype=np.uint8)
        out = multimodal.decode_png(multimodal.encode_png(img))
        assert np.array_equal(out, img), shape


def test_png_decode_all_filter_types():
    """The decoder must undo every scanline filter the spec defines
    (our encoder only emits filter 0, so filter the rows here per spec:
    Sub/Up/Average/Paeth are defined w.r.t. the RECONSTRUCTED bytes)."""
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(6, 4, 3), dtype=np.uint8)
    h, w, nch = img.shape
    stride = w * nch

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    for ftype in range(5):
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int32)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int32)
            line = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(cur[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                if ftype == 0:
                    line[x] = cur[x]
                elif ftype == 1:
                    line[x] = (cur[x] - a) % 256
                elif ftype == 2:
                    line[x] = (cur[x] - b) % 256
                elif ftype == 3:
                    line[x] = (cur[x] - (a + b) // 2) % 256
                else:
                    line[x] = (cur[x] - paeth(a, b, c)) % 256
            raw.append(ftype)
            raw.extend(line.astype(np.uint8).tobytes())
            prev = cur

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        out = multimodal.decode_png(payload)
        assert np.array_equal(out, img), f"filter {ftype}"


def test_png_rgba_alpha_dropped():
    import struct
    import zlib

    import numpy as np

    rng = np.random.RandomState(11)
    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    h, w, _ = rgba.shape
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    out = multimodal.decode_png(payload)
    assert np.array_equal(out, rgba[:, :, :3])


def test_wav_roundtrip_and_features():
    import numpy as np

    t = np.arange(3200) / 16000.0
    samples = (np.sin(2 * np.pi * 440.0 * t) * 10000).astype("<i2")
    back, rate = multimodal.decode_wav(multimodal.encode_wav(samples, 16000))
    assert rate == 16000 and (back == samples).all()
    vec = multimodal.audio_features(back, rate)
    assert abs(vec[0] - 0.2) < 1e-9  # duration
    assert 0.2 < vec[1] < 0.23  # RMS of a (10000/32768)-amp sine = 0.305/sqrt(2)
    # a 440 Hz tone concentrates energy in one FFT band
    bands = vec[4:12]
    assert bands.max() > 0


def test_image_features_real_decode():
    import numpy as np

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :, 0] = 255  # pure red
    vec = multimodal.image_features(multimodal.decode_bmp(multimodal.encode_bmp(img)))
    assert abs(vec[0] - 255.0) < 1e-9 and abs(vec[1]) < 1e-9  # mean RGB
    assert abs(vec[3]) < 1e-9  # zero std


def test_decoder_error_contract_under_truncation_fuzz():
    """Malformed payloads must raise ONLY ValueError/NotImplementedError —
    the two types the per-row degradation handlers catch; a leaked
    struct.error/zlib.error would fail a whole Arrow batch (regression:
    truncated PNG used to leak zlib.error)."""
    import random

    import numpy as np

    valid = [
        multimodal.encode_png(np.zeros((4, 4, 3), dtype="uint8")),
        multimodal.encode_bmp(np.zeros((4, 4, 3), dtype="uint8")),
        multimodal.encode_wav(np.zeros(100, dtype="<i2")),
    ]
    rng = random.Random(1)
    for base in valid:
        for cut in range(0, len(base), max(1, len(base) // 17)):
            payload = base[:cut] + bytes(rng.randrange(256) for _ in range(4))
            for fn in (multimodal.decode_image, multimodal.decode_wav):
                try:
                    fn(payload)
                except (NotImplementedError, ValueError):
                    pass


def test_decode_image_rejects_jpeg_and_malformed_png():
    # JPEG is the remaining externally-coded stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0" + b"0" * 64)
    # PNG decodes natively now; a truncated/garbage body is a ValueError
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n" + b"0" * 64)
    # unsupported PNG shapes (e.g. palette) fail explicitly, not silently
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    palette_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(palette_png)


def test_sample_frames_plan(spark):
    media = multimodal.synthetic_media(spark, 9)
    frames = multimodal.sample_frames(media, every_ms=1000)
    vids = media.where("kind = 'video'").count()
    assert frames.count() == vids * 6  # 0..5000 step 1000


def test_embedding_dedup_srp_autoblocking(spark):
    """No blocking column needed: a planted near-duplicate vector pair is
    found via SRP buckets; an orthogonal vector is not paired."""
    import numpy as np

    rng = np.random.RandomState(5)
    v = rng.normal(size=64)
    v = v / np.linalg.norm(v)
    near = v + rng.normal(scale=0.02, size=64)
    near = near / np.linalg.norm(near)
    w = rng.normal(size=64)
    w = w - (w @ v) * v  # orthogonal to v
    w = w / np.linalg.norm(w)
    df = spark.createDataFrame(
        [(1, [float(x) for x in v]), (2, [float(x) for x in near]),
         (3, [float(x) for x in w])],
        "vec_id long, embedding array<double>",
    )
    pairs = {(r["a_id"], r["b_id"]): r["cosine"]
             for r in dedup.embedding_dup_pairs_srp(df, threshold=0.9).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.97
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_embedding_dedup_srp_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert dedup.embedding_dup_pairs_srp(df).count() == 0


def test_multimodal_corrupt_payload_does_not_fail_batch(spark):
    """A compressed/corrupt payload yields deterministic fallback
    features (negative marker) instead of failing the whole job."""
    rows = [
        (0, "image", bytearray(b"\x89PNG\r\n\x1a\n" + b"0" * 64), "image/png", 8, 8, None),
        (1, "image", bytearray(multimodal.encode_bmp(
            __import__("numpy").zeros((4, 4, 3), dtype="uint8"))), "image/bmp", 4, 4, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert all(v < 0 for v in out[0])  # fallback marker
    assert out[1][0] == 0.0  # real decode: black image mean
    again = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert out == again


def test_dedup_paragraphs_keep_first(spark):
    """CCNet paragraph dedup: the first corpus-wide occurrence of each
    paragraph survives (ordered by doc_id then position), docs are
    rebuilt from survivors, empty pieces are dropped."""
    from phphinder_spark.ops.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha\nboiler plate\ngamma"),
            (2, "boiler plate\ndelta"),
            (3, "delta\n\n  \nboiler plate"),
            (4, ""),
            (5, "epsilon\nepsilon"),  # within-doc repeat dedups too
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert out[1].text == "alpha\nboiler plate\ngamma"
    assert (out[1].n_paragraphs, out[1].n_kept) == (3, 3)
    assert out[2].text == "delta"  # boiler plate lost to doc 1
    assert (out[2].n_paragraphs, out[2].n_kept) == (2, 1)
    # doc 3: delta lost to doc 2, boiler plate to doc 1; blank piece
    # never counted
    assert out[3].text == ""
    assert (out[3].n_paragraphs, out[3].n_kept) == (2, 0)
    assert (out[4].text, out[4].n_paragraphs, out[4].n_kept) == ("", 0, 0)
    assert out[5].text == "epsilon"
    assert (out[5].n_paragraphs, out[5].n_kept) == (2, 1)
    assert set(out) == {1, 2, 3, 4, 5}


def test_dedup_paragraphs_partitioning_invariant(spark):
    """Keep-first is a total order, so the result must not depend on
    input partitioning."""
    from phphinder_spark.ops.dedup import dedup_paragraphs

    rows = [
        (i, "\n".join(f"p{(i + j) % 7}" for j in range(3)))
        for i in range(40)
    ]
    a = spark.createDataFrame(rows, ["doc_id", "text"])
    b = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(13)
    got_a = sorted(map(tuple, dedup_paragraphs(a).collect()))
    got_b = sorted(map(tuple, dedup_paragraphs(b).collect()))
    assert got_a == got_b
    # exactly 7 distinct paragraphs survive corpus-wide
    assert sum(r[3] for r in got_a) == 7


def test_dedup_paragraphs_hash_key_equivalence(spark):
    """hash_key=True (xxhash64 longs in the shuffles, map-side rebuild
    from the original text) must be row-identical to the string form,
    including trim/empty-piece handling and the empty/whitespace docs."""
    from phphinder_spark.ops.dedup import dedup_paragraphs

    rows = [
        (i, "\n".join(f"para {(i + j) % 11} body" for j in range(4)))
        for i in range(60)
    ] + [(100, ""), (101, "  \n \n"), (102, "solo\n\nsolo\nother")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(7)
    got_s = sorted(map(tuple, dedup_paragraphs(docs).collect()))
    got_h = sorted(map(tuple, dedup_paragraphs(docs, hash_key=True).collect()))
    assert got_s == got_h


def test_dedup_paragraphs_hash_key_no_string_shuffle(spark):
    """The hash form's exchanges carry xxhash64 longs + ids/positions;
    no paragraph string column may appear in any hashpartitioning key."""
    from phphinder_spark.ops.dedup import dedup_paragraphs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pview = docs.select(
        "doc_id", F.regexp_replace("text", r"\bline\b", "\n").alias("text")
    )
    df = dedup_paragraphs(pview, hash_key=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re as _re

    shuffles = _re.findall(r"hashpartitioning\((\w+)#\d+", plan)
    # still exactly two shuffles (winner min + doc rollup), and the
    # paragraph key is the hashed long (aliased 'para'), never text
    assert sorted(set(shuffles)) == ["id", "para"]
    assert len(shuffles) == 2
    # the winner exchange's schema at the hash key must be bigint: the
    # xxhash64 call sits in the plan, the raw split column does not
    # reach an Exchange input projection above it
    assert "xxhash64" in plan


def test_word_vocabulary(spark):
    from phphinder_spark.ops.textstats import word_vocabulary

    docs = spark.createDataFrame(
        [(1, "b a a B! c"), (2, "a b. d")], ["doc_id", "text"]
    )
    full = {r.token: r["count"] for r in word_vocabulary(docs).collect()}
    assert full == {"a": 3, "b": 3, "c": 1, "d": 1}
    # min_count prunes before top-k; boundary ties break by token asc
    top = word_vocabulary(docs, k=3).collect()
    assert [(r.token, r["count"]) for r in top] == [
        ("a", 3), ("b", 3), ("c", 1)
    ]
    assert {r.token for r in word_vocabulary(docs, min_count=2).collect()} \
        == {"a", "b"}


def test_dedup_paragraphs_plan_two_exchanges(spark):
    """Exactly two shuffles end-to-end: the paragraph-keyed winner min
    and the doc-keyed rebuild; no third corpus-scale branch."""
    from phphinder_spark.ops.dedup import dedup_paragraphs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pview = docs.select(
        "doc_id", F.regexp_replace("text", r"\bline\b", "\n").alias("text")
    )
    df = dedup_paragraphs(pview)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re as _re

    # formatted mode lists each shuffle Exchange's keys in its
    # "Arguments: hashpartitioning(...)" detail line
    shuffles = _re.findall(r"hashpartitioning\((\w+)#", plan)
    assert sorted(set(shuffles)) == ["id", "para"]
    assert len(shuffles) == 2


def test_word_vocabulary_plan_topk(spark):
    """Top-k selection must be TakeOrderedAndProject (per-partition
    heads + k-sized merge), never a global Sort."""
    from phphinder_spark.ops.textstats import word_vocabulary

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = word_vocabulary(docs, k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort (" not in plan.split("TakeOrderedAndProject")[0]


def test_remove_contaminated_spans(spark):
    """Surgical decontamination: only benchmark-covered tokens are cut
    (overlap-union), clean docs pass through untouched, and agreement
    with the flag op holds (n_removed > 0 <=> contaminated)."""
    from phphinder_spark.ops.textstats import (
        ngram_contamination,
        remove_contaminated_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff"),    # 'bb cc dd' contaminated
            (2, "xx yy zz ww"),          # clean
            (3, "bb cc dd bb cc dd"),    # two overlapping hits
            (4, None),                   # NULL propagates
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "qq bb cc dd rr")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in remove_contaminated_spans(docs, bench, n=3).collect()
    }
    assert out[1].cleaned == "aa ee ff"
    assert (out[1].n_tokens, out[1].n_removed) == (6, 3)
    assert out[2].cleaned == "xx yy zz ww" and out[2].n_removed == 0
    # doc 3: spans at 0 and 3 both match -> all 6 tokens covered
    assert out[3].cleaned == "" and out[3].n_removed == 6
    assert out[4].cleaned is None and out[4].n_removed == 0
    # agreement with the flag op
    flags = {
        r.doc_id: r.contaminated
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    for d in (1, 2, 3):
        assert flags[d] == (out[d].n_removed > 0)
