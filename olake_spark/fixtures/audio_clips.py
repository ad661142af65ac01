"""Deterministic synthetic audio_clips table + CDC batches (FIXTURES.md §1).

Generated *distributed*: ``spark.range(n)`` → ``mapInPandas`` so a
10^12-row table is synthesized in parallel on executors, never on the
driver. All values are pure functions of the row index — no shared
state, fully reproducible at any scale and any partitioning.

Schema / metadata-column semantics mirror the reference:
- columns per input_hint + drivers/abstract/abstract.go:29-34
- ``_olake_id`` = md5(clip_id) per utils/utils.go:252-273
- ``_op_type`` r/c/u/d per types/data_types.go:69
- ``_cdc_timestamp`` commit-sequence timestamp driving dedup
  (destination/iceberg/iceberg.go:234-266)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olake_spark.functions.audio import encode_pcm_s16le, synth_waveform

CLIP_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, _op_type string, _cdc_timestamp timestamp, "
    "_olake_timestamp timestamp"
)
FULL_SCHEMA = CLIP_SCHEMA + ", _olake_id string"

_SR_CHOICES = np.array([8000, 16000, 22050, 44100], dtype=np.int64)
_VOCAB = (
    "the quick brown fox jumps over lazy dog audio clip speech sound wave "
    "signal noise sample rate hertz frame spectral mel token word model "
    "train eval label gold silver bronze alpha beta gamma delta epsilon "
    "zero one two three four five six seven eight nine north south east "
    "west red green blue cyan magenta yellow black white high low mid "
    "open close start stop"
).split()
_BASE_TS = pd.Timestamp("2026-01-01T00:00:00Z")


def transcript_for(i: int) -> str:
    n_words = 3 + (i * 7) % 18
    return " ".join(_VOCAB[(i * 31 + 7 * k) % len(_VOCAB)] for k in range(n_words))


def clip_row(i: int, op: str = "r", cdc_seq: int | None = None, version: int = 0) -> tuple:
    """One clip row as a tuple matching CLIP_SCHEMA (without _olake_id)."""
    sr = int(_SR_CHOICES[i % 4])
    dur = int(40 + (i * 37) % 361)
    wav = synth_waveform(i, sr, dur)
    transcript = transcript_for(i)
    if version:
        transcript = f"{transcript} v{version}"
    seq = cdc_seq if cdc_seq is not None else i
    return (
        f"clip_{i:012d}",
        encode_pcm_s16le(wav),
        sr,
        dur,
        "pcm_s16le",
        transcript,
        op,
        _BASE_TS + pd.Timedelta(seconds=int(seq)),
        _BASE_TS + pd.Timedelta(seconds=int(i)),
    )


def _rows_to_pdf(rows: list[tuple]) -> pd.DataFrame:
    return pd.DataFrame(
        rows,
        columns=[
            "clip_id",
            "bytes",
            "sr_hz",
            "dur_ms",
            "codec",
            "transcript",
            "_op_type",
            "_cdc_timestamp",
            "_olake_timestamp",
        ],
    )


def generate_clips(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic generation of n clips (op 'r')."""

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            yield _rows_to_pdf([clip_row(int(i)) for i in idx])

    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    df = rng.mapInPandas(gen, schema=CLIP_SCHEMA)
    return df.withColumn("_olake_id", F.md5(F.col("clip_id")))


def generate_gapped_clips(
    spark: SparkSession, n: int, frame_ms: int = 20, gap_mod: int = 3, partitions: int | None = None
) -> DataFrame:
    """Clips with deterministic silence gaps for VAD testing: frame k
    (non-overlapping ``frame_ms`` windows) of clip i is zeroed iff
    ``(k + i) % gap_mod == 0``. Active/silent frame counts are therefore
    pure integer functions of (i, sr, dur) — SQL-oracle reproducible —
    while the PCM itself carries real tonal content in active frames."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                sr = int(_SR_CHOICES[i % 4])
                dur = int(40 + (i * 37) % 361)
                w = synth_waveform(i, sr, dur)
                frame = max(1, sr * frame_ms // 1000)
                for k in range(len(w) // frame):
                    if (k + i) % gap_mod == 0:
                        w[k * frame:(k + 1) * frame] = 0.0
                base = clip_row(i)
                rows.append((base[0], encode_pcm_s16le(w)) + base[2:])
            yield _rows_to_pdf(rows)

    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    df = rng.mapInPandas(gen, schema=CLIP_SCHEMA)
    return df.withColumn("_olake_id", F.md5(F.col("clip_id")))


DUP_SR_HZ = 16000
DUP_DUR_MS = 1000


def generate_dup_clips(
    spark: SparkSession, n_groups: int, copies: int = 2, partitions: int | None = None
) -> DataFrame:
    """Near-duplicate audio cohort for fingerprint dedup: clip j carries
    the waveform of group ``j % n_groups`` plus independent low-level
    jitter (0.005 amplitude, seeded by j) — same audio content, not
    bit-identical bytes. Fixed (sr, dur) = (16 kHz, 1000 ms) puts every
    integer-Hz synth tone exactly on the 1 Hz FFT grid, so dominant-peak
    fingerprints are deterministic under the jitter.

    Schema: ``clip_id string, group_idx int, bytes binary, sr_hz int``.
    """

    def gen(batches):
        for pdf in batches:
            rows = []
            for j in pdf["id"]:
                j = int(j)
                g = j % n_groups
                w = synth_waveform(g, DUP_SR_HZ, DUP_DUR_MS)
                jit = np.random.default_rng(2_000_000_011 + j)
                w = w + 0.005 * jit.standard_normal(w.shape[0])
                rows.append((f"dup_{j:06d}", g, encode_pcm_s16le(w), DUP_SR_HZ))
            yield pd.DataFrame(rows, columns=["clip_id", "group_idx", "bytes", "sr_hz"])

    n = n_groups * copies
    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.mapInPandas(gen, schema="clip_id string, group_idx int, bytes binary, sr_hz int")


def generate_chirp_dup_clips(
    spark: SparkSession,
    n_groups: int,
    copies: int = 2,
    n_segments: int = 4,
    partitions: int | None = None,
) -> DataFrame:
    """Time-VARYING near-duplicate cohort for sub-clip matching: clip j
    belongs to group ``j % n_groups``; its 1 s waveform is
    ``n_segments`` equal stretches, each a distinct tone pair
    (f1 = 100 + (13g)%1900 + 97q, f2 = 150 + (29g)%3000 + 89q for
    segment q — unique per (g, q) for n_groups ≤ 100 since 13∤97Δq).
    Copies share the group waveform (group-seeded noise) plus
    independent per-copy jitter, so segment-level fingerprints must
    match across copies per position but differ across positions."""

    def gen(batches):
        for pdf in batches:
            rows = []
            seg_n = DUP_SR_HZ * DUP_DUR_MS // 1000 // n_segments
            for j in pdf["id"]:
                j = int(j)
                g = j % n_groups
                grng = np.random.default_rng(3_000_000_019 + g)
                parts = []
                for q in range(n_segments):
                    f1 = 100 + (13 * g) % 1900 + 97 * q
                    f2 = 150 + (29 * g) % 3000 + 89 * q
                    t = np.arange(seg_n, dtype=np.float64) / DUP_SR_HZ
                    parts.append(
                        0.5 * np.sin(2 * np.pi * f1 * t)
                        + 0.3 * np.sin(2 * np.pi * f2 * t)
                        + 0.02 * grng.standard_normal(seg_n)
                    )
                w = np.concatenate(parts)
                jit = np.random.default_rng(4_000_000_007 + j)
                w = w + 0.005 * jit.standard_normal(w.shape[0])
                rows.append((f"chirp_{j:06d}", g, encode_pcm_s16le(w), DUP_SR_HZ))
            yield pd.DataFrame(rows, columns=["clip_id", "group_idx", "bytes", "sr_hz"])

    n = n_groups * copies
    rng = spark.range(n, numPartitions=partitions) if partitions else spark.range(n)
    return rng.mapInPandas(gen, schema="clip_id string, group_idx int, bytes binary, sr_hz int")


def cdc_batch(
    spark: SparkSession,
    base_n: int,
    batch_no: int,
    updates: int = 0,
    deletes: int = 0,
    inserts: int = 0,
    dup_keys: int = 0,
) -> DataFrame:
    """Deterministic CDC batch over an existing base of ``base_n`` clips.

    - updates: clip i for i in stride over base → op 'u', transcript
      suffixed " v<batch_no>", bumped commit seq
    - deletes: following stride → op 'd'
    - inserts: brand-new ids at base_n + batch_no*10^6 + k → op 'c'
    - dup_keys: first ``dup_keys`` updated keys appear TWICE in the
      batch with consecutive commit seqs (later wins — dedup test,
      iceberg.go:234-266)
    Mirrors the reference scenario matrix Full-Refresh → insert →
    update → delete (utils/testutils/test_utils.go:323-352).
    """
    seq_base = 1_000_000 * batch_no
    rows: list[tuple] = []
    upd_ids = [(i * 3) % base_n for i in range(updates)]
    # dedupe while preserving order (stride may collide on tiny bases)
    seen: set[int] = set()
    upd_ids = [i for i in upd_ids if not (i in seen or seen.add(i))]
    del_ids = [(i * 5 + 1) % base_n for i in range(deletes)]
    del_ids = [i for i in del_ids if not (i in seen or seen.add(i))]
    for k, i in enumerate(upd_ids):
        rows.append(clip_row(i, op="u", cdc_seq=seq_base + k * 2, version=batch_no))
        if k < dup_keys:
            rows.append(clip_row(i, op="u", cdc_seq=seq_base + k * 2 + 1, version=batch_no + 100))
    off = seq_base + 2 * len(upd_ids) + 10
    for k, i in enumerate(del_ids):
        rows.append(clip_row(i, op="d", cdc_seq=off + k))
    off += len(del_ids)
    for k in range(inserts):
        rows.append(clip_row(base_n + batch_no * 1_000_000 + k, op="c", cdc_seq=off + k))
    pdf = _rows_to_pdf(rows)
    df = spark.createDataFrame(pdf, schema=CLIP_SCHEMA)
    return df.withColumn("_olake_id", F.md5(F.col("clip_id")))
