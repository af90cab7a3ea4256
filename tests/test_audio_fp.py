"""Perceptual audio dedup (multimodal.afp64_samples / audio_fp_pairs).

Energy-delta fingerprint over fixed windows, paired through the shared
pigeonhole hamming join — the audio companion of test_image_dhash.
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from dxnn_ocr_cpp_spark.operators.multimodal import (
    AFP_WINDOW, AFP_WINDOWS, afp64_samples, audio_fp_pairs, decode_wav,
    make_wav, synthesize_patterned_audio, with_audio_fp)


def _pattern(g: int) -> np.ndarray:
    w = np.arange(AFP_WINDOWS)
    amp = ((((w + 29 * g) * 73856093)
            ^ ((w * w + g) * 19349663)) >> 8) & 0x3FF
    return np.repeat(amp.astype(np.int16), AFP_WINDOW)


class TestKernel:
    def test_bit_layout(self):
        # strictly rising window energies -> every delta bit set -> -1
        s = np.repeat(np.arange(1, AFP_WINDOWS + 1, dtype=np.int16),
                      AFP_WINDOW)
        assert afp64_samples(s) == -1
        # strictly falling -> no bit set -> 0
        s = np.repeat(np.arange(AFP_WINDOWS, 0, -1, dtype=np.int16),
                      AFP_WINDOW)
        assert afp64_samples(s) == 0

    def test_gain_invariance(self):
        # comparisons survive any positive integer gain
        base = _pattern(5)
        assert afp64_samples(base) == afp64_samples(base * 3)

    def test_polarity_invariance(self):
        # |x| energy: sign flips don't change the fingerprint
        base = _pattern(5)
        assert afp64_samples(base) == afp64_samples(
            (-base.astype(np.int32)).astype(np.int16))

    def test_too_short_raises(self):
        with pytest.raises(ValueError, match="afp64"):
            afp64_samples(np.zeros(AFP_WINDOWS * AFP_WINDOW - 1,
                                   np.int16))

    def test_tail_ignored(self):
        base = _pattern(9)
        padded = np.concatenate([base, np.int16([32767] * 100)])
        assert afp64_samples(base) == afp64_samples(padded)


class TestPlantedSeparation:
    def test_groups_distinct_and_far(self):
        hs = {}
        for g in range(25):
            smp, _r, _w = decode_wav(make_wav(_pattern(g), 8000))
            hs[g] = afp64_samples(smp)
        assert len(set(hs.values())) == 25
        mind = min(
            bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            for a, b in itertools.combinations(range(25), 2))
        assert mind >= 6, f"cross-group margin eroded: {mind}"


class TestSpark:
    @pytest.fixture(scope="class")
    def media(self, spark):
        docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
        return synthesize_patterned_audio(docs).cache()

    def test_fault_containment(self, spark, media):
        got = {r["media_id"]: r for r in with_audio_fp(media).collect()}
        assert got[0]["afp_status"] == "afp-error"
        assert got[0]["afp"] is None
        assert got[1]["afp_status"] == "fingerprinted"

    def test_pairs_exactly_same_group(self, spark, media):
        pairs = audio_fp_pairs(media, max_hamming=2).collect()
        ok = {i for i in range(120) if i % 37 != 0}
        expected = {(a, b) for a in ok for b in ok
                    if a < b and a % 25 == b % 25}
        assert {(r["a"], r["b"]) for r in pairs} == expected
        assert all(r["hamming"] == 0 for r in pairs)

    def test_no_cartesian_in_plan(self, spark, media):
        plan = (audio_fp_pairs(media)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
