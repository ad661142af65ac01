"""Audio payload functions: PCM s16le synth / decode / SNR.

The engine treats audio as opaque ``binary`` + typed metadata
(sr_hz, dur_ms, codec). Synthesis and verification are deterministic
numpy (seeded sine mix + noise per FIXTURES.md §1) so the per-row
invariant — decoded-PCM allclose with SNR ≥ 30 dB vs the generator's
reference waveform — is well-defined without external audio libs.

Real-codec decode (mp3/opus/...) is out of scope for this container:
``decode_clip`` raises NotImplementedError for non-PCM codecs (clearly
marked stub); the Spark-side plumbing (schema, batching, UDF shape) is
real and tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

PCM_CODEC = "pcm_s16le"
_SCALE = 32767.0 * 0.9


def synth_waveform(i: int, sr_hz: int, dur_ms: int) -> np.ndarray:
    """Deterministic float waveform for clip index i (seed derives from i)."""
    n = max(1, int(sr_hz * dur_ms / 1000))
    t = np.arange(n, dtype=np.float64) / sr_hz
    f1 = 100.0 + (i * 13) % 1900
    f2 = 150.0 + (i * 29) % 3000
    phase = ((i * 17) % 628) / 100.0
    rng = np.random.default_rng(1_000_000_007 + i)
    w = (
        0.5 * np.sin(2 * np.pi * f1 * t)
        + 0.3 * np.sin(2 * np.pi * f2 * t + phase)
        + 0.02 * rng.standard_normal(n)
    )
    return w


def encode_pcm_s16le(w: np.ndarray) -> bytes:
    return (np.clip(w, -1.0, 1.0) * _SCALE).astype("<i2").tobytes()


def decode_pcm_s16le(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<i2").astype(np.float64) / _SCALE


def decode_clip(b: bytes, codec: str) -> np.ndarray:
    if codec == PCM_CODEC:
        return decode_pcm_s16le(b)
    # STUB: real codec decode needs audio libs not present in this container.
    raise NotImplementedError(f"codec {codec!r} decode not available; only {PCM_CODEC}")


def snr_db(ref: np.ndarray, got: np.ndarray) -> float:
    """Signal-to-noise ratio of got vs ref in dB (inf if bit-identical)."""
    if ref.shape != got.shape:
        return float("-inf")
    noise = ref - got
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / max(p_noise, 1e-300))


def clip_index(clip_id: str) -> int:
    return int(clip_id.rsplit("_", 1)[1])


def verify_batch(pdf: pd.DataFrame, min_snr_db: float = 30.0) -> pd.DataFrame:
    """Vectorized verifier batch: recompute the reference waveform per
    clip and report SNR. Used inside mapInPandas for distributed
    scan-equivalence checks (per-waveform numpy, Arrow-batched rows)."""
    out = []
    for cid, b, sr, dur, codec in zip(
        pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["dur_ms"], pdf["codec"]
    ):
        i = clip_index(cid)
        ref = synth_waveform(i, int(sr), int(dur))
        got = decode_clip(bytes(b), codec)
        s = snr_db(ref, got)
        out.append((cid, float(s), bool(s >= min_snr_db)))
    return pd.DataFrame(out, columns=["clip_id", "snr_db", "snr_ok"])


VERIFY_SCHEMA = "clip_id string, snr_db double, snr_ok boolean"
