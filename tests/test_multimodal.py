"""Multimodal binary-column plumbing tests (stubs + real Spark stages)."""

from __future__ import annotations

import numpy as np
import pytest

from olake_spark.functions import multimodal as mm


def test_synth_decode_roundtrip():
    img = mm.decode_image(mm.synth_image(7, width=20, height=10, channels=3))
    assert img.shape == (10, 20, 3)
    # decode is deterministic and executor-independent
    assert np.array_equal(img, mm.decode_image(mm.synth_image(7, 20, 10, 3)))
    vid = mm.decode_video(mm.synth_video(3, n_frames=5, width=8, height=6))
    assert vid.shape == (5, 6, 8)


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"\x00\x00\x00 ftypmp42")


def test_resize_nearest():
    img = mm.decode_image(mm.synth_image(1, 32, 24, 3))
    out = mm.resize_nearest(img, 8, 6)
    assert out.shape == (6, 8, 3)
    # corners are preserved by nearest-neighbor with floor mapping
    assert np.array_equal(out[0, 0], img[0, 0])


def test_image_meta_stage_distributed(spark):
    media = mm.generate_media(spark, 40, kind="image", partitions=4)
    meta = media.mapInPandas(mm.image_meta_stage, schema=mm.IMAGE_META_SCHEMA)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == 40
    r = rows["image_00000007"]
    assert (r["width"], r["height"], r["channels"]) == (32, 24, 3)
    img = mm.decode_image(mm.synth_image(7))
    assert r["mean_px"] == float(img.mean())


def test_frame_sample_stage_distributed(spark):
    media = mm.generate_media(spark, 12, kind="video", partitions=3)
    frames = media.mapInPandas(mm.frame_sample_stage(stride=2), schema=mm.FRAME_SAMPLE_SCHEMA)
    got = frames.filter("media_id = 'video_00000003'").orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 2, 4, 6]
    vid = mm.decode_video(mm.synth_video(3))
    assert got[1]["mean_px"] == float(vid[2].mean())


def test_resize_stage_binary_to_binary(spark):
    media = mm.generate_media(spark, 10, kind="image", partitions=2)
    resized = media.mapInPandas(
        mm.resize_stage(8, 6), schema="media_id string, payload binary"
    )
    out = {r["media_id"]: bytes(r["payload"]) for r in resized.collect()}
    img = mm.decode_image(out["image_00000004"])
    assert img.shape == (6, 8, 3)
    ref = mm.resize_nearest(mm.decode_image(mm.synth_image(4)), 8, 6)
    assert np.array_equal(img, ref)
