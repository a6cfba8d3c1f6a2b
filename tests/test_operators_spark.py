"""Operator-level Spark tests: ANN, multimodal plumbing, text ops."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_rust_spark.operators import ann, multimodal, textops


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


class TestANN:
    def test_bruteforce_topk_matches_numpy(self, spark, emb):
        local = emb.toPandas()
        mat = np.array([np.asarray(v, dtype=np.float64) for v in local["embedding"]])
        ids = local["vec_id"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        probe_ids = ids[:3]
        got = (
            ann.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=5)
            .toPandas().sort_values(["probe_id", "rank"])
        )
        for pid in probe_ids:
            pv = mat[ids == pid][0]
            cos = mat @ pv / (norms * np.linalg.norm(pv))
            cos[ids == pid] = -np.inf
            order = np.argsort(np.round(cos, 6) - ids * 1e-12)[::-1][:5]
            expect = [int(ids[j]) for j in order]
            have = got[got.probe_id == pid]["neighbor_id"].tolist()
            assert have == expect, (pid, have, expect)

    def test_lsh_recall_reasonable(self, spark, emb):
        exact = ann.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
        approx = ann.lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 10),
                                     k=5, bits=4, n_tables=8)
        e = {(r.probe_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        # 8 tables x 4-bit SRP: candidate prob ~0.75 for near neighbors
        assert recall >= 0.5, recall

    def test_ivf_exhaustive_probe_equals_bruteforce(self, spark, emb):
        """n_probe = n_cells scans every inverted list — IVF must return
        the exact brute-force top-k (partition completeness)."""
        cents = ann.ivf_train(emb, n_cells=8, iters=2)
        probes = emb.filter(F.col("vec_id") < 5)
        exact = ann.cosine_topk(emb, probes, k=5)
        full = ann.ivf_cosine_topk(emb, probes, cents, k=5, n_probe=8)
        e = [(r.probe_id, r.neighbor_id, r.cosine, r.rank)
             for r in exact.orderBy("probe_id", "rank").collect()]
        f = [(r.probe_id, r.neighbor_id, r.cosine, r.rank)
             for r in full.orderBy("probe_id", "rank").collect()]
        assert e == f

    def test_ivf_partial_probe_recall(self, spark, emb):
        """The 4-of-16-cells operating point keeps useful recall: probed
        cells are the probe's own neighborhoods under the k-means
        quantizer (deterministic corpus + deterministic init => pinned)."""
        cents = ann.ivf_train(emb, n_cells=16, iters=3)
        probes = emb.filter(F.col("vec_id") < 10)
        exact = ann.cosine_topk(emb, probes, k=5)
        approx = ann.ivf_cosine_topk(emb, probes, cents, k=5, n_probe=4)
        e = {(r.probe_id, r.neighbor_id) for r in exact.collect()}
        a = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.5, recall

    def test_ivf_sampled_training_exhaustive_equals_bruteforce(self, spark,
                                                               emb):
        """Sampled Lloyd training (train_sample_mod): partition
        completeness is codebook-independent, so exhaustive probing must
        still return the exact brute-force top-k — and the sampled
        codebook differs from the full one (the sample actually took)."""
        cents_s = ann.ivf_train(emb, n_cells=8, iters=2, train_sample_mod=4)
        cents_f = ann.ivf_train(emb, n_cells=8, iters=2)
        assert cents_s != cents_f  # the 1/4 sample really changed training
        probes = emb.filter(F.col("vec_id") < 5)
        exact = ann.cosine_topk(emb, probes, k=5)
        full = ann.ivf_cosine_topk(emb, probes, cents_s, k=5, n_probe=8)
        e = [(r.probe_id, r.neighbor_id, r.cosine, r.rank)
             for r in exact.orderBy("probe_id", "rank").collect()]
        f = [(r.probe_id, r.neighbor_id, r.cosine, r.rank)
             for r in full.orderBy("probe_id", "rank").collect()]
        assert e == f

    def test_ivf_sampled_training_tiny_sample_falls_back(self, spark, emb):
        """A sample smaller than n_cells must fall back to full-corpus
        training (identical codebook) instead of a degenerate one."""
        cents_tiny = ann.ivf_train(emb, n_cells=8, iters=2,
                                   train_sample_mod=1_000_000)
        cents_full = ann.ivf_train(emb, n_cells=8, iters=2)
        assert cents_tiny == cents_full

    def test_suggest_n_cells_sqrt_sizing(self):
        assert ann.suggest_n_cells(0) == 1
        assert ann.suggest_n_cells(256) == 16
        assert ann.suggest_n_cells(10**9) == 31623 or \
            ann.suggest_n_cells(10**9) == 31622
        assert ann.suggest_n_cells(10**12) == 65536  # clamped

    def test_srp_bucket_deterministic(self, spark, emb):
        b1 = ann.srp_bucket(emb, bits=8).select("vec_id", "bucket").toPandas()
        b2 = ann.srp_bucket(emb, bits=8).select("vec_id", "bucket").toPandas()
        assert b1.equals(b2)

    def test_lsh_pairs_match_bruteforce(self, spark, emb):
        """The bucketed scale path recovers the EXACT brute-force pair set
        at its amplification settings (the lsh_emb_dups oracle contract)."""
        got = {(r.vec_id_a, r.vec_id_b)
               for r in ann.lsh_cosine_pairs(emb, threshold=0.35).collect()}
        local = emb.toPandas()
        mat = np.array([np.asarray(v, dtype=np.float64)
                        for v in local["embedding"]])
        ids = local["vec_id"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        cos = (mat @ mat.T) / np.outer(norms, norms)
        ia, ib = np.where(np.round(cos, 4) >= 0.35)
        expect = {(int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
                  for a, b in zip(ia, ib) if ids[a] != ids[b]}
        assert got == expect


class TestMultimodal:
    PNG = bytes.fromhex("89504e470d0a1a0a0000000d49484452"
                        "00000003" "00000002") + b"payload"
    GIF = b"GIF89a" + (7).to_bytes(2, "little") + (9).to_bytes(2, "little") + b"x"

    # WebP fixtures: hand-built 30-byte headers per the reference's reader
    # (/root/reference/src/dimensions.rs:135-178)
    WEBP_VP8 = (b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00\x00\x00\x00"
                + bytes([0x2A])            # header[20] == 0x2A
                + b"\x00\x00\x00\x00\x00"  # bytes 21-25
                + (640).to_bytes(2, "little") + (480).to_bytes(2, "little"))
    WEBP_VP8L = (b"RIFF\x00\x00\x00\x00WEBPVP8L" + b"\x00\x00\x00\x00"
                 + bytes([0x2F])
                 # 14-bit fields: (w-1)=99, (h-1)=49 packed little-endian
                 + bytes([99 & 0xFF, (99 >> 8) | ((49 & 0x03) << 6),
                          (49 >> 2) & 0xFF, 0, 0]) + b"\x00" * 4)
    WEBP_VP8X = (b"RIFF\x00\x00\x00\x00WEBPVP8X" + b"\x0a\x00\x00\x00"
                 + b"\x00\x00\x00\x00"
                 + (11).to_bytes(3, "little") + (7).to_bytes(3, "little"))
    # minimal ISOBMFF: ftyp(heic) + meta carrying an ispe box (size=20)
    HEIC = ((24).to_bytes(4, "big") + b"ftypheic" + b"\x00\x00\x00\x00"
            + b"mif1heic"
            + (20).to_bytes(4, "big") + b"ispe" + b"\x00\x00\x00\x00"
            + (1920).to_bytes(4, "big") + (1080).to_bytes(4, "big"))

    def test_sniff_dimensions(self):
        assert multimodal.sniff_dimensions(self.PNG) == ("png", 3, 2)
        assert multimodal.sniff_dimensions(self.GIF) == ("gif", 7, 9)
        assert multimodal.sniff_dimensions(b"garbage123") == (None, None, None)
        assert multimodal.sniff_dimensions(None) == (None, None, None)

    def test_sniff_webp_variants(self):
        assert multimodal.sniff_dimensions(self.WEBP_VP8) == ("webp", 640, 480)
        assert multimodal.sniff_dimensions(self.WEBP_VP8L) == ("webp", 100, 50)
        assert multimodal.sniff_dimensions(self.WEBP_VP8X) == ("webp", 12, 8)
        # bad VP8L signature byte -> parse failure, reference semantics
        bad = bytearray(self.WEBP_VP8L)
        bad[20] = 0x00
        assert multimodal.sniff_dimensions(bytes(bad)) == (None, None, None)

    def test_sniff_heic_ispe(self):
        assert multimodal.sniff_dimensions(self.HEIC) == ("heic", 1920, 1080)
        # ftyp with non-heif brand is not claimed
        not_heic = self.HEIC.replace(b"ftypheic", b"ftypmp42")
        assert multimodal.sniff_dimensions(not_heic) == (None, None, None)
        # heic brand but no ispe box -> silent drop
        assert multimodal.sniff_dimensions(
            self.HEIC[:24]) == (None, None, None)

    def test_decode_stub_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image(self.PNG)

    def test_image_features_plumbing(self, spark):
        rows = [("a", self.PNG), ("b", self.GIF), ("c", b"junk")]
        df = spark.createDataFrame(rows, "url string, content binary")
        out = multimodal.image_features(df).toPandas().set_index("content_id")
        assert out.loc["a", "fmt"] == "png" and out.loc["a", "width"] == 3
        assert out.loc["b", "fmt"] == "gif" and out.loc["b", "height"] == 9
        assert out.loc["c", "fmt"] is None and out.loc["c", "feature"] is None
        # deterministic fake features
        f1 = multimodal.image_features(df).toPandas().set_index("content_id")
        assert list(out.loc["a", "feature"]) == list(f1.loc["a", "feature"])

    def test_image_features_webp_heic_through_spark(self, spark):
        """WebP/HEIC header sniffing works through the mapInPandas path."""
        rows = [("w", self.WEBP_VP8X), ("h", self.HEIC)]
        df = spark.createDataFrame(rows, "url string, content binary")
        out = multimodal.image_features(df).toPandas().set_index("content_id")
        assert out.loc["w", "fmt"] == "webp"
        assert (out.loc["w", "width"], out.loc["w", "height"]) == (12, 8)
        assert out.loc["h", "fmt"] == "heic"
        assert (out.loc["h", "width"], out.loc["h", "height"]) == (1920, 1080)
        assert out.loc["h", "n_bytes"] == len(self.HEIC)

    def test_dedupe_by_content_hash(self, spark):
        rows = [("a", b"xxx1"), ("b", b"xxx1"), ("c", b"yyy2"), ("d", b"xxx1")]
        df = spark.createDataFrame(rows, "url string, content binary")
        out = multimodal.dedupe_by_content_hash(df).toPandas()
        assert set(out["content_id"]) == {"a", "b", "d"}
        assert set(out["cluster_id"]) == {"a"}


class TestTextOps:
    def test_quality_columns(self, spark):
        good = ("the quick brown fox jumps over the lazy dog and runs to the "
                "house with a friend for fun in the park on a warm day")
        df = spark.createDataFrame(
            [("g", good), ("bad", "@#$ %^&")], "id string, text string")
        out = textops.quality_columns(df).toPandas().set_index("id")
        assert bool(out.loc["g", "quality_keep"])
        assert not bool(out.loc["bad", "quality_keep"])

    def test_language_id_udf(self, spark):
        df = spark.createDataFrame(
            [("e", "the cat and the dog ran to the house in that city"),
             ("d", "der Hund und die Katze ist nicht in den Haus")],
            "id string, text string")
        out = textops.language_id(df).toPandas().set_index("id")
        assert out.loc["e", "lang_detected"] == "en"
        assert out.loc["d", "lang_detected"] == "de"

    def test_token_counts(self, spark):
        df = spark.createDataFrame([("x", "hello, world 123")],
                                   "id string, text string")
        out = textops.token_counts(df).toPandas()
        assert out["n_tokens_ws"][0] == 3
        assert out["n_tokens_bpe"][0] == 4

    def test_fingerprint_stable(self, spark):
        df = spark.createDataFrame([("x", "y" * 500)], "id string, text string")
        a = textops.fingerprints(df).toPandas()["fingerprint"][0]
        b = textops.fingerprints(df).toPandas()["fingerprint"][0]
        from dedupe_rust_spark.functions.textstats import fingerprint
        assert a == b == fingerprint("y" * 500)

    def test_fingerprint_builtin_matches_python_twin(self, spark):
        """The all-builtin Spark fingerprint (min md5 over 64-char blocks,
        step 32) must agree elementwise with textstats.fingerprint across
        the block-boundary edge cases: empty-ish, < window, == window,
        window+1, non-multiple-of-step lengths, multi-line real-ish text."""
        from dedupe_rust_spark.functions.textstats import fingerprint

        texts = [
            "a", "short text", "x" * 63, "x" * 64, "x" * 65,
            "x" * 96, "x" * 97, "x" * 128, "x" * 129,
            ("the quick brown fox jumps over the lazy dog. " * 9)[:401],
            "line one\nline two\nline three " * 7,
        ]
        rows = [(str(i), t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "id string, text string")
        got = textops.fingerprints(df).toPandas().set_index("id")["fingerprint"]
        for i, t in enumerate(texts):
            assert got[str(i)] == fingerprint(t), (i, len(t))


def test_simhash_band_pairs_pigeonhole_exact(spark):
    """4x16-bit chunk blocking must find EXACTLY the pairs within the
    hamming radius it guarantees (<=3): compare against a brute-force
    O(n^2) hamming computation on constructed 64-bit values, including
    adversarial pairs at hamming 3 spread across 3 different chunks and
    just-miss pairs at hamming 4 across all 4 chunks."""
    from itertools import combinations

    from dedupe_rust_spark.plans.queries import (
        SIMHASH_DUP_HAMMING, _simhash_band_pairs,
    )

    base = 0x0123_4567_89AB_CDEF
    vals = {
        "u00": base,
        "u01": base ^ 0x1,                      # hamming 1 (chunk 0)
        "u02": base ^ (1 << 16) ^ (1 << 32) ^ (1 << 48),  # h3, 3 chunks
        "u03": base ^ 0x3,                      # hamming 2
        "u04": base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48),  # h4
        "u05": 0x7FFF_FFFF_FFFF_FFFF,           # far away
        "u06": base,                            # identical (hamming 0)
    }
    sig = spark.createDataFrame(
        [(u, v - (1 << 64) if v >= (1 << 63) else v)
         for u, v in vals.items()], "url string, simhash long")
    got = {(r.url_a, r.url_b, r.hamming)
           for r in _simhash_band_pairs(sig, SIMHASH_DUP_HAMMING).collect()}
    expect = set()
    for (ua, va), (ub, vb) in combinations(sorted(vals.items()), 2):
        h = bin(va ^ vb).count("1")
        if h <= SIMHASH_DUP_HAMMING:
            expect.add((ua, ub, h))
    assert got == expect
    # sanity: the fixture exercises both sides of the radius
    assert ("u00", "u02", 3) in expect and ("u00", "u06", 0) in expect
    assert not any(a == "u00" and b == "u04" for a, b, _ in got)
