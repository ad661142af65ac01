"""Space-filling-curve keys: 3D morton (Z-order) and 2D Hilbert.

North-rule mandate: "Z-order keys are computed with vectorized Arrow
UDFs that interleave morton bits of (clip_id hash, dur_ms, sr_hz) and a
Hilbert d2xy mapping". Everything here is lane-parallel numpy over
Arrow batches; the public Spark surface is two pandas UDFs.

Reference has no clustering op (its sort order is identifier-asc,
IcebergUtil.java:221-228) — this is our scale-path addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_BITS = 21  # 3 × 21 = 63 bits → fits signed int64


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x so there are 2 zero bits between each."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton3(a, b, c) -> np.ndarray:
    """Interleave three 21-bit values into a 63-bit Z-order key."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    c = np.asarray(c, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = _spread3(a) | (_spread3(b) << np.uint64(1)) | (_spread3(c) << np.uint64(2))
    return z.view(np.int64)


def _rot(n: np.ndarray, x: np.ndarray, y: np.ndarray, rx: np.ndarray, ry: np.ndarray):
    """Hilbert quadrant rotation (vectorized form of the classic rot())."""
    swap = ry == 0
    flip = swap & (rx == 1)
    x2 = np.where(flip, n - 1 - x, x)
    y2 = np.where(flip, n - 1 - y, y)
    nx = np.where(swap, y2, x2)
    ny = np.where(swap, x2, y2)
    return nx, ny


def hilbert_xy2d(order: int, x, y) -> np.ndarray:
    """Map (x, y) in [0, 2^order)² to distance d along the Hilbert curve."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros(x.shape, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        x, y = _rot(s, x, y, rx, ry)
        s >>= 1
    return d


def hilbert_d2xy(order: int, d) -> tuple[np.ndarray, np.ndarray]:
    """Inverse map: curve distance d → (x, y). Used in tests to prove
    the mapping is a bijection with unit-step locality."""
    t = np.asarray(d, dtype=np.int64).copy()
    x = np.zeros(t.shape, dtype=np.int64)
    y = np.zeros(t.shape, dtype=np.int64)
    s = np.int64(1)
    n = np.int64(1) << order
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        x, y = _rot(s, x, y, rx, ry)
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _scale_to_bits(v: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Min-max scale a column into [0, 2^bits) integer grid coords."""
    span = max(hi - lo, 1e-12)
    g = np.clip((v.astype(np.float64) - lo) / span, 0.0, 1.0)
    return np.minimum((g * (2**bits)).astype(np.int64), (1 << bits) - 1)


# Version of each curve's KEY COMPUTATION. Bump a curve's entry
# whenever its key function changes in a way that makes previously
# persisted __curve_key values/bounds incomparable with newly computed
# ones — incremental clustering (operators/incremental_cluster.py)
# range-joins new keys against manifest bounds from past runs, so
# mixing key spaces silently breaks its overlap detection. PER-CURVE
# so a change to one curve never forces a full re-bootstrap of tables
# clustered by the other. zorder v2: the id lane moved from a Python
# murmur3(seed 0) over the raw string to Spark's JVM F.hash (murmur3
# seed 42) — same curve, different hash values. hilbert keys are
# unchanged since v1.
KEY_VERSIONS = {"zorder": 2, "hilbert": 1}


def zorder_key_udf(dur_lo: int, dur_hi: int, sr_lo: int, sr_hi: int):
    """Z-order key over (murmur3(clip_id), dur_ms, sr_hz).

    The clip_id hash arrives as a PRE-COMPUTED int32 column
    (``F.hash(clip_id)`` — Spark's JVM murmur3, inside whole-stage
    codegen): the curve needs a uniform spreading hash, not a specific
    one, and hashing JVM-side keeps the string column out of the Arrow
    transfer and the per-row encode/pack loop out of Python — the UDF
    is pure fixed-width numpy. dur/sr are min-max scaled into the
    21-bit grid from driver-computed bounds (one agg pass) so the
    interleave weights dimensions evenly.
    """

    @pandas_udf("long")
    def _zkey(h32: pd.Series, dur_ms: pd.Series, sr_hz: pd.Series) -> pd.Series:
        h = h32.to_numpy(dtype=np.int64, na_value=0)
        a = (h & 0xFFFFFFFF) >> (32 - _BITS)  # top 21 bits
        b = _scale_to_bits(dur_ms.to_numpy(dtype=np.int64, na_value=dur_lo), dur_lo, dur_hi, _BITS)
        c = _scale_to_bits(sr_hz.to_numpy(dtype=np.int64, na_value=sr_lo), sr_lo, sr_hi, _BITS)
        return pd.Series(morton3(a, b, c))

    return _zkey


def zorder_key_cols(id_col: str = "clip_id"):
    """The input columns for ``zorder_key_udf`` — hash computed
    JVM-side so only three int columns cross into Arrow."""
    return [F.hash(F.col(id_col)), F.col("dur_ms"), F.col("sr_hz")]


def hilbert_key_udf(dur_lo: int, dur_hi: int, sr_lo: int, sr_hi: int, order: int = 16):
    """Hilbert key over (dur_ms, sr_hz) scaled to a 2^order grid."""

    @pandas_udf("long")
    def _hkey(dur_ms: pd.Series, sr_hz: pd.Series) -> pd.Series:
        x = _scale_to_bits(dur_ms.to_numpy(dtype=np.int64, na_value=dur_lo), dur_lo, dur_hi, order)
        y = _scale_to_bits(sr_hz.to_numpy(dtype=np.int64, na_value=sr_lo), sr_lo, sr_hi, order)
        return pd.Series(hilbert_xy2d(order, x, y))

    return _hkey
