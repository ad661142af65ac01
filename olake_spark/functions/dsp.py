"""Audio DSP kernels: resample, framing, band energies, spectral-peak
fingerprint, energy VAD.

All kernels are pure vectorized numpy over decoded PCM float arrays and
run inside ``mapInPandas`` stages (Arrow-batched) — never per-row Python
inside the JVM plan. The reference moves audio as opaque bytes through
its connectors; these operators add the payload-aware pass a
training-data pipeline needs over the same ``(bytes, sr_hz, dur_ms,
codec)`` column shape (input_hint schema).

Length contracts are kept in exact integer arithmetic so the metadata
side of every stage (sample counts, frame counts) is reproducible by a
SQL oracle while the PCM content is asserted in pytest (SNR gates):

- resample:  n_out   = max(1, (n_in * sr_out) // sr_in)
- framing:   n_frames = n_in // frame_len          (non-overlapping)
             n_frames = 1 + (n_in - frame) // hop  (overlapping, n>=frame)
"""

from __future__ import annotations

import numpy as np

_EPS_DBFS = -200.0  # silence floor for exact-zero frames


# ------------------------------------------------------------------ resample


def resample_linear(w: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resampler (vectorized ``np.interp``).

    Output length is the exact integer contract
    ``max(1, n_in * sr_out // sr_in)`` so downstream metadata is
    oracle-reproducible. Adequate for ratios where the signal is well
    below the target Nyquist; tests gate SNR against a reference
    waveform synthesized directly at ``sr_out``.
    """
    n_in = int(w.shape[0])
    if sr_in == sr_out:
        return w.astype(np.float64, copy=True)
    n_out = max(1, (n_in * sr_out) // sr_in)
    # output sample i sits at time i/sr_out == input position i*sr_in/sr_out
    pos = np.arange(n_out, dtype=np.float64) * (sr_in / sr_out)
    return np.interp(pos, np.arange(n_in, dtype=np.float64), w)


# ------------------------------------------------------------------- framing


def frame_signal(w: np.ndarray, frame_len: int, hop: int | None = None) -> np.ndarray:
    """(n_frames, frame_len) view of complete frames (trailing partial
    frame dropped). ``hop=None`` → non-overlapping (hop = frame_len).
    Zero-copy via stride tricks."""
    hop = frame_len if hop is None else hop
    n = int(w.shape[0])
    if n < frame_len:
        return np.empty((0, frame_len), dtype=w.dtype)
    n_frames = 1 + (n - frame_len) // hop
    return np.lib.stride_tricks.sliding_window_view(w, frame_len)[:: hop][:n_frames]


def frame_rms_dbfs(w: np.ndarray, sr: int, frame_ms: int = 20, hop_ms: int | None = None) -> np.ndarray:
    """Per-frame RMS level in dBFS (full scale = 1.0); exact-zero frames
    clamp to -200 dBFS."""
    frame = max(1, sr * frame_ms // 1000)
    hop = None if hop_ms is None else max(1, sr * hop_ms // 1000)
    fr = frame_signal(w, frame, hop)
    if fr.shape[0] == 0:
        return np.empty(0, dtype=np.float64)
    rms = np.sqrt(np.mean(fr * fr, axis=1))
    out = np.full(rms.shape, _EPS_DBFS, dtype=np.float64)
    nz = rms > 0
    out[nz] = 20.0 * np.log10(rms[nz])
    return out


# ----------------------------------------------------------------------- VAD


def vad_active(
    w: np.ndarray, sr: int, frame_ms: int = 20, thresh_dbfs: float = -40.0
) -> np.ndarray:
    """Energy voice-activity mask over non-overlapping frames: frame is
    active iff RMS level > thresh_dbfs."""
    return frame_rms_dbfs(w, sr, frame_ms=frame_ms) > thresh_dbfs


def vad_segments(active: np.ndarray, frame_ms: int) -> list[tuple[int, int]]:
    """Merge an active-frame mask into (start_ms, end_ms) runs."""
    if active.shape[0] == 0:
        return []
    a = active.astype(np.int8)
    edges = np.diff(np.concatenate(([0], a, [0])))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    return [(int(s) * frame_ms, int(e) * frame_ms) for s, e in zip(starts, ends)]


# ------------------------------------------------------------ band energies


def band_energies(
    w: np.ndarray,
    sr: int,
    n_fft: int = 512,
    hop: int | None = None,
    n_bands: int = 16,
    f_min: float = 50.0,
) -> np.ndarray:
    """(n_frames, n_bands) log-spaced spectral band energies (dB).

    Hann-windowed rFFT per frame, power summed into geometrically
    spaced bands from ``f_min`` to Nyquist — the front end for
    fingerprinting / audio quality features.
    """
    frames = frame_signal(w, n_fft, hop if hop is not None else n_fft // 2)
    if frames.shape[0] == 0:
        return np.empty((0, n_bands), dtype=np.float64)
    spec = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=1)) ** 2
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    edges = np.geomspace(f_min, sr / 2.0, n_bands + 1)
    cut = np.searchsorted(bins, edges)
    cut[-1] = spec.shape[1]
    out = np.empty((spec.shape[0], n_bands), dtype=np.float64)
    for b in range(n_bands):
        lo, hi = cut[b], max(cut[b + 1], cut[b] + 1)
        out[:, b] = spec[:, lo:hi].sum(axis=1)
    return 10.0 * np.log10(np.maximum(out, 1e-20))


# ------------------------------------------------------- peak fingerprint


def spectral_peak_bins(w: np.ndarray, sr: int, k: int = 2, min_sep_hz: float = 20.0) -> list[int]:
    """Top-k dominant-frequency bins of the whole-clip spectrum, in
    descending magnitude order, with ±min_sep_hz suppression around
    each picked peak (Shazam-style spectral landmark; rectangular
    window so on-grid tones have zero leakage). DC is excluded."""
    n = int(w.shape[0])
    mag = np.abs(np.fft.rfft(w))
    mag[0] = 0.0
    sep = max(1, int(round(min_sep_hz * n / sr)))
    peaks: list[int] = []
    m = mag.copy()
    for _ in range(k):
        b = int(np.argmax(m))
        peaks.append(b)
        m[max(0, b - sep): b + sep + 1] = 0.0
    return peaks


def clip_fingerprint(w: np.ndarray, sr: int, k: int = 2, cell_hz: float = 0.0) -> int:
    """Compact audio fingerprint from the k dominant spectral peaks.

    Invariant to amplitude scaling (argmax) and robust to additive
    noise well below the tonal content. ``cell_hz > 0`` quantizes peak
    frequencies into cells of that width (comparable across clips of
    different lengths); ``cell_hz == 0`` uses raw bin indices (exact,
    for cohorts with a common (n, sr))."""
    n = int(w.shape[0])
    vals: list[int] = []
    for b in spectral_peak_bins(w, sr, k=k):
        if cell_hz > 0:
            vals.append(int((b * sr / n) // cell_hz))
        else:
            vals.append(b)
    fp = 0
    for v in vals:
        # 20 bits per peak field: raw bin indices exceed 2^20 for clips
        # longer than ~131 s at 16 kHz (or with very fine cell_hz) —
        # masking would silently alias distinct peaks into colliding
        # fingerprints (false dedup merges), so overflow is an error;
        # callers with longer clips should pass a coarser cell_hz
        if v > 0xFFFFF:
            raise ValueError(
                f"fingerprint peak value {v} exceeds the 20-bit field; "
                "use cell_hz quantization coarse enough for the clip length"
            )
        fp = (fp << 20) | v
    return fp


# ----------------------------------------------------------------- loudness


def rms_dbfs(w: np.ndarray) -> float:
    r = float(np.sqrt(np.mean(w * w))) if w.size else 0.0
    return 20.0 * np.log10(r) if r > 0 else _EPS_DBFS


def peak_dbfs(w: np.ndarray) -> float:
    p = float(np.max(np.abs(w))) if w.size else 0.0
    return 20.0 * np.log10(p) if p > 0 else _EPS_DBFS


# ===================================================================
# Spark stages (mapInPandas batch functions over the clip schema)
# ===================================================================

RESAMPLE_SCHEMA = "clip_id string, sr_hz int, n_in int, sr_out int, n_out int"
VAD_SCHEMA = "clip_id string, n_frames int, n_active int"
FINGERPRINT_SCHEMA = "clip_id string, group_idx int, fingerprint long"
LOUDNESS_SCHEMA = "clip_id string, n_samples int, rms_dbfs double, peak_dbfs double"


def _decode(b, codec: str | None = None) -> np.ndarray:
    from olake_spark.functions.audio import decode_clip

    return decode_clip(bytes(b), codec if codec is not None else "pcm_s16le")


def resample_stage(sr_out: int):
    """mapInPandas stage: decode → linear resample to ``sr_out`` →
    emit length metadata. The resampled length is re-checked against
    the integer contract in-stage so a drifting kernel fails loudly
    rather than producing an oracle mismatch downstream."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, b, sr, codec in zip(pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
                w = _decode(b, codec)
                r = resample_linear(w, int(sr), sr_out)
                want = max(1, (w.shape[0] * sr_out) // int(sr))
                if r.shape[0] != want:
                    raise AssertionError(
                        f"resample length contract broken: {r.shape[0]} != {want}"
                    )
                rows.append((cid, int(sr), int(w.shape[0]), sr_out, int(r.shape[0])))
            yield pd.DataFrame(rows, columns=["clip_id", "sr_hz", "n_in", "sr_out", "n_out"])

    return run


def vad_stage(frame_ms: int = 20, thresh_dbfs: float = -40.0):
    """mapInPandas stage: decode → non-overlapping energy VAD →
    (n_frames, n_active) per clip."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, b, sr, codec in zip(pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
                w = _decode(b, codec)
                act = vad_active(w, int(sr), frame_ms=frame_ms, thresh_dbfs=thresh_dbfs)
                rows.append((cid, int(act.shape[0]), int(act.sum())))
            yield pd.DataFrame(rows, columns=["clip_id", "n_frames", "n_active"])

    return run


def fingerprint_stage(k: int = 2, cell_hz: float = 0.0):
    """mapInPandas stage over the dup-clip schema: decode → dominant-
    peak fingerprint. Carries ``group_idx`` through for grouping."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, g, b, sr in zip(pdf["clip_id"], pdf["group_idx"], pdf["bytes"], pdf["sr_hz"]):
                w = _decode(b)
                rows.append((cid, int(g), clip_fingerprint(w, int(sr), k=k, cell_hz=cell_hz)))
            yield pd.DataFrame(rows, columns=["clip_id", "group_idx", "fingerprint"])

    return run


SEGMENT_SCHEMA = (
    "clip_id string, seg_idx int, start_ms int, n_bytes int, bytes binary, "
    "sr_hz int, rms_dbfs double"
)


def segment_stage(frame_ms: int = 20):
    """mapInPandas stage: split each clip into non-overlapping
    ``frame_ms`` windows and emit ONE ROW PER SEGMENT with the sliced
    PCM payload — fixed-window chunking for training pipelines
    (row-expansion inside the Arrow batch; trailing partial window
    dropped, matching the framing contract ``n_frames = n_in // frame``).
    start_ms = (k · frame · 1000) // sr exactly. Payload slices are cut
    from the RAW PCM buffer (byte-identical to the source clip — a
    decode→re-encode round trip could drift one LSB via int16
    truncation); the decode feeds only the per-segment level."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, b, sr, codec in zip(pdf["clip_id"], pdf["bytes"], pdf["sr_hz"], pdf["codec"]):
                sr = int(sr)
                raw = bytes(b)
                # byte slicing below assumes 2 bytes/sample; a future
                # non-16-bit codec must widen this, not silently misalign
                if codec != "pcm_s16le":
                    raise NotImplementedError(
                        f"segment_stage slices 2-byte samples; codec {codec!r} unsupported"
                    )
                w = _decode(raw, codec)
                frame = max(1, sr * frame_ms // 1000)
                lv = frame_rms_dbfs(w, sr, frame_ms=frame_ms)
                for k in range(lv.shape[0]):
                    seg = raw[k * frame * 2:(k + 1) * frame * 2]
                    rows.append(
                        (
                            cid,
                            k,
                            (k * frame * 1000) // sr,
                            len(seg),
                            seg,
                            sr,
                            round(float(lv[k]), 4),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "seg_idx", "start_ms", "n_bytes", "bytes", "sr_hz", "rms_dbfs"],
            )

    return run


SEG_FP_SCHEMA = "clip_id string, group_idx int, seg_idx int, fingerprint long"


def segment_fingerprint_stage(seg_ms: int = 250):
    """mapInPandas stage over the dup-clip schema: per non-overlapping
    ``seg_ms`` window, a dominant-peak fingerprint of the segment
    ZERO-PADDED to one second. The padding puts integer-Hz tones back
    on the 1 Hz FFT grid (a bare 250 ms window has 4 Hz resolution, so
    an integer frequency can fall mid-grid and let noise flip the
    argmax between the two straddling bins — padded, the Dirichlet
    mainlobe peaks exactly on the tone's bin). Sub-clip repeated-
    content detection: match segments across clips by fingerprint
    equality — a hash join, never pairwise audio comparison."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, g, b, sr in zip(pdf["clip_id"], pdf["group_idx"], pdf["bytes"], pdf["sr_hz"]):
                sr = int(sr)
                w = _decode(b)
                seg = max(1, sr * seg_ms // 1000)
                for k in range(w.shape[0] // seg):
                    pad = np.zeros(sr, dtype=np.float64)
                    pad[:seg] = w[k * seg:(k + 1) * seg]
                    rows.append((cid, int(g), k, clip_fingerprint(pad, sr, k=2)))
            yield pd.DataFrame(rows, columns=["clip_id", "group_idx", "seg_idx", "fingerprint"])

    return run


def loudness_stage():
    """mapInPandas stage: decode → per-clip RMS/peak dBFS."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for cid, b, codec in zip(pdf["clip_id"], pdf["bytes"], pdf["codec"]):
                w = _decode(b, codec)
                rows.append(
                    (cid, int(w.shape[0]), round(rms_dbfs(w), 4), round(peak_dbfs(w), 4))
                )
            yield pd.DataFrame(rows, columns=["clip_id", "n_samples", "rms_dbfs", "peak_dbfs"])

    return run
