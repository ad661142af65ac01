"""Multimodal binary-column plumbing: typed metadata + vectorized ops.

Images / video are opaque ``binary`` columns with typed metadata,
processed in Arrow-batched ``mapInPandas`` stages — the same plumbing
the audio path uses (functions/audio.py), and the same
schema-fixed/binary-opaque treatment the reference gives payloads it
does not interpret (flatten passthrough, utils/typeutils/flatten.go:
28-41; binary → Iceberg binary, SchemaConvertor.java:168-169).

Real codec decode (JPEG/PNG/H.264) needs libs not present in this
container, so `decode_image` raises NotImplementedError unless the
payload is our deterministic FAKE format; everything Spark-side —
schemas, batch shapes, partitioning, UDF signatures — is real and
tested. The fake format:

    b"FIMG" | u16 width | u16 height | u8 channels | pixels (w*h*c bytes)
    b"FVID" | u16 n_frames | u16 width | u16 height | frames (n*w*h bytes, gray)

Pixel payloads are pure functions of (seed, x, y, c) so any executor
regenerates bit-identical content — verification needs no data motion.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

IMG_MAGIC = b"FIMG"
VID_MAGIC = b"FVID"

IMAGE_META_SCHEMA = (
    "media_id string, width int, height int, channels int, "
    "n_bytes long, mean_px double"
)
FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, width int, height int, mean_px double"


# ------------------------------------------------------------- synth (fake)


def synth_image(seed: int, width: int = 32, height: int = 24, channels: int = 3) -> bytes:
    """Deterministic fake image: gradient + seeded phase, u8 pixels."""
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    px = np.empty((height, width, channels), dtype=np.uint8)
    for c in range(channels):
        px[:, :, c] = ((x * 7 + y * 13 + seed * 31 + c * 101) % 256).astype(np.uint8)
    return IMG_MAGIC + struct.pack("<HHB", width, height, channels) + px.tobytes()


def synth_video(seed: int, n_frames: int = 8, width: int = 16, height: int = 12) -> bytes:
    frames = np.empty((n_frames, height, width), dtype=np.uint8)
    x = np.arange(width, dtype=np.uint32)
    y = np.arange(height, dtype=np.uint32)[:, None]
    for f in range(n_frames):
        frames[f] = ((x * 5 + y * 11 + seed * 17 + f * 29) % 256).astype(np.uint8)
    return VID_MAGIC + struct.pack("<HHH", n_frames, width, height) + frames.tobytes()


# ------------------------------------------------------------- decode


def decode_image(payload: bytes) -> np.ndarray:
    """Decode → HxWxC uint8 array. Real codecs are STUBBED (no image
    libs in this container)."""
    if payload[:4] != IMG_MAGIC:
        raise NotImplementedError(
            "real image codecs (JPEG/PNG) unavailable in this environment; "
            "only the deterministic FIMG fixture format decodes"
        )
    w, h, c = struct.unpack("<HHB", payload[4:9])
    return np.frombuffer(payload[9:], dtype=np.uint8).reshape(h, w, c)


def decode_video(payload: bytes) -> np.ndarray:
    """Decode → NxHxW uint8 frames; real codecs STUBBED."""
    if payload[:4] != VID_MAGIC:
        raise NotImplementedError(
            "real video codecs unavailable; only FVID fixture format decodes"
        )
    n, w, h = struct.unpack("<HHH", payload[4:10])
    return np.frombuffer(payload[10:], dtype=np.uint8).reshape(n, h, w)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy (no PIL in container)."""
    h, w = img.shape[:2]
    yi = (np.arange(out_h) * h // out_h).astype(np.int64)
    xi = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[yi][:, xi]


# ------------------------------------------------------------- Spark stages
# each is a mapInPandas generator: (iter[pd.DataFrame]) -> iter[pd.DataFrame]


def image_meta_stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """binary image column → typed metadata + mean pixel (feature
    extraction plumbing; Arrow batches, zero per-row Python loops over
    pixels)."""
    for pdf in batches:
        metas = []
        for mid, raw in zip(pdf["media_id"], pdf["payload"]):
            img = decode_image(bytes(raw))
            metas.append(
                (
                    mid,
                    img.shape[1],
                    img.shape[0],
                    img.shape[2],
                    len(raw),
                    # exact mean, no rounding: the pixel sum is an exact
                    # integer in float64, so sum/n is bit-identical to a
                    # SQL AVG over the same integers — oracle-safe
                    float(img.mean()),
                )
            )
        yield pd.DataFrame(
            metas, columns=["media_id", "width", "height", "channels", "n_bytes", "mean_px"]
        )


def frame_sample_stage(stride: int = 2):
    """video binary → every ``stride``-th frame's stats (frame-sample
    plumbing for a training pipeline)."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                vid = decode_video(bytes(raw))
                for fi in range(0, vid.shape[0], stride):
                    rows.append(
                        (
                            mid,
                            fi,
                            vid.shape[2],
                            vid.shape[1],
                            float(vid[fi].mean()),  # exact — see image_meta_stage
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "width", "height", "mean_px"]
            )

    return stage


def resize_stage(out_w: int, out_h: int):
    """image binary → resized image binary (same FIMG container) —
    shows binary→binary transform plumbing preserves schema/shape."""

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, raw in zip(pdf["media_id"], pdf["payload"]):
                img = resize_nearest(decode_image(bytes(raw)), out_w, out_h)
                out.append(
                    (
                        mid,
                        IMG_MAGIC
                        + struct.pack("<HHB", out_w, out_h, img.shape[2])
                        + img.tobytes(),
                    )
                )
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return stage


def generate_media(spark, n: int, kind: str = "image", partitions: int = 4):
    """Distributed fake-media table: media_id, payload(binary), kind."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = synth_image(i) if kind == "image" else synth_video(i)
                rows.append((f"{kind}_{i:08d}", payload, kind))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "kind"])

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, schema="media_id string, payload binary, kind string"
    )
