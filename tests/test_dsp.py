"""Audio DSP kernel + stage tests (functions/dsp.py).

The oracle queries check the integer metadata contracts; these tests
gate the PCM-level behavior the oracle cannot see: resample fidelity
(SNR), fingerprint invariances, VAD thresholds, band-energy placement.
"""

from __future__ import annotations

import numpy as np
import pytest

from olake_spark.fixtures.audio_clips import (
    generate_dup_clips,
    generate_gapped_clips,
)
from olake_spark.functions.audio import (
    decode_pcm_s16le,
    encode_pcm_s16le,
    snr_db,
    synth_waveform,
)
from olake_spark.functions.dsp import (
    FINGERPRINT_SCHEMA,
    LOUDNESS_SCHEMA,
    VAD_SCHEMA,
    band_energies,
    clip_fingerprint,
    fingerprint_stage,
    frame_rms_dbfs,
    frame_signal,
    loudness_stage,
    peak_dbfs,
    resample_linear,
    rms_dbfs,
    vad_active,
    vad_segments,
    vad_stage,
)


def _tone(f: float, sr: int, n: int) -> np.ndarray:
    return np.sin(2 * np.pi * f * np.arange(n) / sr)


class TestResample:
    def test_identity_rate_is_copy(self):
        w = _tone(440, 16000, 1600)
        r = resample_linear(w, 16000, 16000)
        assert np.array_equal(r, w) and r is not w

    def test_length_contract_exhaustive(self):
        rates = [8000, 16000, 22050, 44100]
        for sr_in in rates:
            for sr_out in rates:
                for n_in in (1, 7, 320, 4411):
                    r = resample_linear(np.zeros(n_in), sr_in, sr_out)
                    want = n_in if sr_in == sr_out else max(1, (n_in * sr_out) // sr_in)
                    assert len(r) == want, (sr_in, sr_out, n_in)

    def test_upsample_snr_gate(self):
        # mid-band tone, 16k -> 44.1k: linear interp must clear 40 dB
        w = _tone(440, 16000, 16000)
        r = resample_linear(w, 16000, 44100)
        ref = _tone(440, 44100, len(r))
        assert snr_db(ref, r) >= 40.0

    def test_downsample_snr_gate(self):
        w = _tone(440, 44100, 44100)
        r = resample_linear(w, 44100, 16000)
        ref = _tone(440, 16000, len(r))
        assert snr_db(ref, r) >= 40.0

    def test_snr_improves_with_oversampling(self):
        # higher input rate relative to the tone -> better interp SNR
        out = []
        for sr_in in (8000, 16000, 32000):
            w = _tone(1000, sr_in, sr_in)
            r = resample_linear(w, sr_in, 48000)
            out.append(snr_db(_tone(1000, 48000, len(r)), r))
        assert out[0] < out[1] < out[2]


class TestFraming:
    def test_matches_naive(self):
        w = np.arange(100, dtype=np.float64)
        for frame, hop in [(10, 10), (10, 5), (7, 3), (100, 10), (101, 10)]:
            got = frame_signal(w, frame, hop)
            naive = [w[s: s + frame] for s in range(0, 101 - frame, hop)] if len(w) >= frame else []
            assert got.shape[0] == len(naive)
            for a, b in zip(got, naive):
                assert np.array_equal(a, b)

    def test_zero_frame_is_floor_dbfs(self):
        w = np.zeros(1000)
        lv = frame_rms_dbfs(w, 16000, frame_ms=20)
        assert np.all(lv == -200.0)


class TestVad:
    def test_threshold(self):
        sr = 16000
        w = np.concatenate([_tone(440, sr, sr // 2) * 0.5, np.zeros(sr // 2)])
        act = vad_active(w, sr, frame_ms=20, thresh_dbfs=-40.0)
        half = len(act) // 2
        assert act[:half].all() and not act[half:].any()

    def test_segments_merge_runs(self):
        act = np.array([1, 1, 0, 0, 1, 0, 1, 1, 1], dtype=bool)
        assert vad_segments(act, 20) == [(0, 40), (80, 100), (120, 180)]
        assert vad_segments(np.zeros(0, dtype=bool), 20) == []

    def test_quiet_tone_below_threshold(self):
        sr = 16000
        w = _tone(440, sr, sr) * 1e-3  # ~ -63 dBFS
        assert not vad_active(w, sr, thresh_dbfs=-40.0).any()
        assert vad_active(w, sr, thresh_dbfs=-70.0).all()


class TestBandEnergies:
    def test_tone_lands_in_expected_band(self):
        sr, n_bands = 16000, 16
        w = _tone(1000, sr, sr)
        be = band_energies(w, sr, n_fft=512, n_bands=n_bands)
        edges = np.geomspace(50.0, sr / 2.0, n_bands + 1)
        want = int(np.searchsorted(edges, 1000.0) - 1)
        assert (be.argmax(axis=1) == want).all()

    def test_shapes(self):
        assert band_energies(np.zeros(100), 16000, n_fft=512).shape == (0, 16)
        be = band_energies(np.zeros(2048), 16000, n_fft=512, hop=256, n_bands=8)
        assert be.shape == (7, 8)


class TestFingerprint:
    def test_amplitude_invariant(self):
        w = synth_waveform(11, 16000, 1000)
        assert clip_fingerprint(w, 16000) == clip_fingerprint(0.25 * w, 16000)

    def test_jitter_and_pcm_roundtrip_invariant(self):
        w = synth_waveform(42, 16000, 1000)
        fps = set()
        for seed in range(5):
            jit = np.random.default_rng(seed).standard_normal(len(w)) * 0.005
            fps.add(clip_fingerprint(decode_pcm_s16le(encode_pcm_s16le(w + jit)), 16000))
        assert len(fps) == 1

    def test_distinct_across_waveforms(self):
        fps = {clip_fingerprint(synth_waveform(i, 16000, 1000), 16000) for i in range(64)}
        assert len(fps) == 64

    def test_cell_quantization_comparable_across_lengths(self):
        # same tones, different clip lengths -> same quantized fingerprint
        sr = 16000
        a = 0.5 * _tone(440, sr, sr) + 0.3 * _tone(1220, sr, sr)
        b = 0.5 * _tone(440, sr, 2 * sr) + 0.3 * _tone(1220, sr, 2 * sr)
        assert clip_fingerprint(a, sr, cell_hz=4.0) == clip_fingerprint(b, sr, cell_hz=4.0)


class TestLoudness:
    def test_full_scale_sine(self):
        w = _tone(100, 16000, 16000)
        assert rms_dbfs(w) == pytest.approx(-3.01, abs=0.02)
        assert peak_dbfs(w) == pytest.approx(0.0, abs=0.01)
        assert rms_dbfs(np.zeros(10)) == -200.0


class TestSparkStages:
    def test_vad_stage_counts(self, spark):
        clips = generate_gapped_clips(spark, 24, partitions=2)
        rows = clips.mapInPandas(vad_stage(20, -40.0), schema=VAD_SCHEMA).collect()
        assert len(rows) == 24
        for r in rows:
            i = int(r.clip_id.rsplit("_", 1)[1])
            zeroed = sum(1 for k in range(r.n_frames) if (k + i) % 3 == 0)
            assert r.n_active == r.n_frames - zeroed

    def test_fingerprint_dedup_end_to_end(self, spark):
        clips = generate_dup_clips(spark, 20, copies=3, partitions=4)
        fp = clips.mapInPandas(fingerprint_stage(k=2), schema=FINGERPRINT_SCHEMA)
        from pyspark.sql import functions as F

        groups = fp.groupBy("fingerprint").agg(
            F.countDistinct("group_idx").alias("ng"), F.count("*").alias("n")
        ).collect()
        assert len(groups) == 20
        assert all(g.ng == 1 and g.n == 3 for g in groups)

    def test_segment_stage_byte_identity(self, spark):
        from collections import defaultdict

        from olake_spark.fixtures.audio_clips import generate_clips
        from olake_spark.functions.dsp import SEGMENT_SCHEMA, segment_stage

        clips = generate_clips(spark, 12, partitions=2)
        orig = {r.clip_id: bytes(r.bytes) for r in clips.collect()}
        rows = clips.mapInPandas(segment_stage(frame_ms=20), schema=SEGMENT_SCHEMA).collect()
        by = defaultdict(list)
        for r in rows:
            by[r.clip_id].append(r)
        assert set(by) == set(orig)
        for cid, segs in by.items():
            segs.sort(key=lambda r: r.seg_idx)
            assert [r.seg_idx for r in segs] == list(range(len(segs)))
            cat = b"".join(bytes(r.bytes) for r in segs)
            # concatenated slices are a byte-identical prefix of the clip
            # (trailing partial window dropped by contract)
            assert orig[cid].startswith(cat)
            assert len(orig[cid]) - len(cat) < 2 * segs[0].n_bytes
            assert all(r.n_bytes == len(bytes(r.bytes)) == segs[0].n_bytes for r in segs)
            # synth clips are tonal everywhere: every segment is loud
            assert all(r.rms_dbfs > -20.0 for r in segs)

    def test_loudness_stage(self, spark):
        from olake_spark.fixtures.audio_clips import generate_clips

        out = (
            generate_clips(spark, 8, partitions=2)
            .mapInPandas(loudness_stage(), schema=LOUDNESS_SCHEMA)
            .collect()
        )
        assert len(out) == 8
        for r in out:
            # synth mix sits well below full scale but far above silence
            assert -20.0 < r.rms_dbfs < -3.0
            assert r.rms_dbfs < r.peak_dbfs <= 0.5


class TestSegmentFingerprint:
    def test_cross_copy_match_and_position_distinctness(self, spark):
        from collections import defaultdict

        from olake_spark.fixtures.audio_clips import generate_chirp_dup_clips
        from olake_spark.functions.dsp import SEG_FP_SCHEMA, segment_fingerprint_stage

        clips = generate_chirp_dup_clips(spark, 12, copies=3, partitions=4)
        rows = clips.mapInPandas(
            segment_fingerprint_stage(seg_ms=250), schema=SEG_FP_SCHEMA
        ).collect()
        assert len(rows) == 12 * 3 * 4
        by_fp = defaultdict(list)
        for r in rows:
            by_fp[r.fingerprint].append((r.group_idx, r.seg_idx))
        # every fingerprint bucket = one (group, position), all 3 copies
        assert len(by_fp) == 12 * 4
        for members in by_fp.values():
            assert len(members) == 3 and len(set(members)) == 1
