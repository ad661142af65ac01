"""Unit tests for hashing / curve / transform / audio math.

Murmur3 vectors are the public Iceberg spec Appendix-B test values —
bit-for-bit parity with the reference's transforms
(arrow-writer/transforms.go:51-128)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from olake_spark.functions.audio import (
    decode_clip,
    decode_pcm_s16le,
    encode_pcm_s16le,
    snr_db,
    synth_waveform,
)
from olake_spark.functions.hashing import (
    bucket_int_udf,
    bucket_string_udf,
    iceberg_bucket_int,
    iceberg_bucket_str,
    mmh3_32_bytes,
    mmh3_32_long,
    pk_hash_col,
)
from olake_spark.functions.transforms import (
    day_transform,
    month_transform,
    truncate_int,
    year_transform,
)
from olake_spark.functions.zcurve import hilbert_d2xy, hilbert_xy2d, morton3


def _mmh3_ref(data: bytes, seed: int = 0) -> int:
    """Independent scalar murmur3_x86_32 reference implementation."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[n - n % 4 :]
    for j in reversed(range(len(tail))):
        k = (k << 8) | tail[j]
    if tail:
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


class TestMurmur3:
    def test_iceberg_spec_vectors(self):
        assert mmh3_32_long(np.array([34]))[0] == 2017239379  # int/long 34
        assert mmh3_32_bytes([b"iceberg"])[0] == 1210000089  # string
        assert mmh3_32_long(np.array([17486]))[0] == -653330422  # date 2017-11-16
        assert mmh3_32_long(np.array([1510871468000000]))[0] == -2047944441  # ts µs

    def test_bytes_vs_scalar_reference(self):
        vals = [b"", b"a", b"ab", b"abc", b"abcd", b"hello world", b"x" * 37]
        got = mmh3_32_bytes(vals)
        for v, g in zip(vals, got):
            assert int(g) == _mmh3_ref(v), v

    def test_long_vs_scalar_reference(self):
        vals = np.array([0, 1, -1, 34, 2**40, -(2**40), 123456789])
        got = mmh3_32_long(vals)
        for v, g in zip(vals, got):
            le8 = int(v).to_bytes(8, "little", signed=True)
            assert int(g) == _mmh3_ref(le8), v

    def test_bucket_range(self):
        b = iceberg_bucket_int(np.arange(1000), 16)
        assert b.min() >= 0 and b.max() < 16
        bs = iceberg_bucket_str([f"clip_{i}" for i in range(100)], 8)
        assert bs.min() >= 0 and bs.max() < 8

    def test_bucket_udfs_in_spark(self, spark):
        df = spark.range(100).select(
            F.col("id"), F.format_string("clip_%012d", F.col("id")).alias("cid")
        )
        out = df.select(
            bucket_int_udf(16)(F.col("id")).alias("bi"),
            bucket_string_udf(8)(F.col("cid")).alias("bs"),
        ).toPandas()
        exp_bi = iceberg_bucket_int(np.arange(100), 16)
        exp_bs = iceberg_bucket_str([f"clip_{i:012d}" for i in range(100)], 8)
        assert (out["bi"].to_numpy() == exp_bi).all()
        assert (out["bs"].to_numpy() == exp_bs).all()


class TestPkHash:
    def test_md5_rule(self, spark):
        # single PK: md5 of the raw value (utils/utils.go:252-273)
        df = spark.createDataFrame([("a1", 7)], "k string, v int")
        got = df.select(pk_hash_col("k").alias("h")).first()["h"]
        assert got == hashlib.md5(b"a1").hexdigest()
        # multi PK: sorted column names, '|'-joined
        got2 = df.select(pk_hash_col("v", "k").alias("h")).first()["h"]
        assert got2 == hashlib.md5(b"a1|7").hexdigest()


class TestCurves:
    def test_hilbert_bijection_and_locality(self):
        n = 32
        xs = np.arange(n).repeat(n)
        ys = np.tile(np.arange(n), n)
        d = hilbert_xy2d(5, xs, ys)
        assert len(set(d.tolist())) == n * n
        x2, y2 = hilbert_d2xy(5, d)
        assert (x2 == xs).all() and (y2 == ys).all()
        order = np.argsort(d)
        steps = np.abs(np.diff(xs[order])) + np.abs(np.diff(ys[order]))
        assert steps.max() == 1  # true Hilbert curve: every step is adjacent

    def test_morton_interleave(self):
        assert morton3([0b11], [0], [0])[0] == 0b1001
        assert morton3([0], [0b11], [0])[0] == 0b10010
        assert morton3([0], [0], [0b11])[0] == 0b100100
        z = morton3(np.arange(100), np.arange(100), np.arange(100))
        assert len(set(z.tolist())) == 100
        assert (np.sort(z) == z).all()  # equal coords → monotone keys


class TestTransforms:
    def test_truncate_negative_safe(self, spark):
        df = spark.createDataFrame([(-7,), (-10,), (0,), (7,), (13,)], "v int")
        got = [r[0] for r in df.select(truncate_int("v", 10)).collect()]
        # v - (((v % n) + n) % n): floor-to-bin, negative-safe (transforms.go:130-147)
        assert got == [-10, -10, 0, 0, 10]

    def test_time_transforms(self, spark):
        df = spark.createDataFrame([("2017-11-16 22:31:08",)], "s string").select(
            F.to_timestamp("s").alias("ts")
        )
        r = df.select(
            year_transform("ts").alias("y"),
            month_transform("ts").alias("m"),
            day_transform("ts").alias("d"),
        ).first()
        assert r["y"] == 47  # 2017 - 1970
        assert r["m"] == 47 * 12 + 10
        assert r["d"] == 17486


class TestAudio:
    def test_roundtrip_snr(self):
        for i in [0, 5, 123]:
            w = synth_waveform(i, 16000, 200)
            got = decode_pcm_s16le(encode_pcm_s16le(w))
            assert snr_db(w, got) >= 30.0

    def test_deterministic(self):
        a = synth_waveform(9, 8000, 100)
        b = synth_waveform(9, 8000, 100)
        assert np.array_equal(a, b)

    def test_decode_stub(self):
        with pytest.raises(NotImplementedError):
            decode_clip(b"\x00", "opus")


class TestPartitionPathTemplate:
    """W8 partition-path templates (destination/parquet/parquet.go:397-466)."""

    def test_parse_segments(self):
        from olake_spark.functions.transforms import parse_partition_pattern

        segs = parse_partition_pattern(
            "/{'region','unknown',}/static/{ts, , MM}"
        )
        assert segs == [
            ("lit", "/"),
            ("col", "region", "unknown", ""),
            ("lit", "/static/"),
            ("col", "ts", "default_ts", "MM"),
        ]

    def test_parse_malformed_block_drops(self):
        from olake_spark.functions.transforms import parse_partition_pattern

        # <3 comma parts -> replaced by "" (parquet.go:410-411)
        assert parse_partition_pattern("{just_col}/x") == [("lit", "/x")]

    def test_render_fallbacks_and_granularity(self, spark):
        from olake_spark.functions.transforms import partition_path_template

        df = spark.createDataFrame(
            [
                ("us", "2017-11-16 22:31:08"),
                (None, "2017-01-02 03:04:05"),
                ("eu", "not a date"),
            ],
            "region string, evt string",
        )
        pat = "/{'region','unknown',}/{evt,'no_ts',MM}/{missing,'gone',}"
        got = [
            r[0]
            for r in df.select(
                partition_path_template(pat, df.columns).alias("p")
            ).collect()
        ]
        # month zero-padded for parseable timestamps; raw passthrough
        # otherwise (granularityFunction: failed reformat -> %v of value)
        assert got == [
            "us/11/gone",
            "unknown/01/gone",
            "eu/not a date/gone",
        ]

    def test_render_time_granularities_epoch(self, spark):
        from olake_spark.functions.transforms import partition_path_template

        # epoch seconds int column: 2021-03-07 09:05:00 UTC = 1615107900
        df = spark.createDataFrame([(1615107900,)], "t bigint")
        pat = "{t,'f',YYYY}/{t,'f',MM}/{t,'f',DD}/{t,'f',HH}/{t,'f',WW}"
        got = df.select(partition_path_template(pat, df.columns)).first()[0]
        assert got == "2021/03/07/09/09"  # ISO week 9

    def test_now_column_and_trailing_slash(self, spark):
        from olake_spark.functions.transforms import partition_path_template

        df = spark.createDataFrame([(1,)], "x int")
        pat = "/{now(), 'f', YYYY}/"
        got = df.select(
            partition_path_template(
                pat, df.columns, now=F.lit("2020-06-01 00:00:00").cast("timestamp")
            )
        ).first()[0]
        # leading slashes collapsed (filepath.Join), trailing "/" trimmed
        assert got == "2020"
