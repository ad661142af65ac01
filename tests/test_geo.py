"""WKB → WKT (C4; reformat.go:506-539). Vectors built by hand from
the OGC WKB spec; every case carries the 4-byte SRID prefix the
reference skips."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from olake_spark.functions.geo import wkb_to_wkt, wkb_to_wkt_bytes

SRID = struct.pack("<I", 4326)


def _point(x, y, order="<"):
    tag = b"\x01" if order == "<" else b"\x00"
    return tag + struct.pack(order + "I", 1) + struct.pack(order + "dd", x, y)


def _linestring(pts):
    return b"\x01" + struct.pack("<I", 2) + struct.pack("<I", len(pts)) + b"".join(
        struct.pack("<dd", x, y) for x, y in pts
    )


def _polygon(rings):
    out = b"\x01" + struct.pack("<I", 3) + struct.pack("<I", len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring)) + b"".join(
            struct.pack("<dd", x, y) for x, y in ring
        )
    return out


def _multipoint(pts):
    return (
        b"\x01"
        + struct.pack("<I", 4)
        + struct.pack("<I", len(pts))
        + b"".join(_point(x, y) for x, y in pts)
    )


class TestWkbVectors:
    def test_point(self):
        assert wkb_to_wkt_bytes(SRID + _point(30, 10)) == "POINT (30 10)"

    def test_point_fractional(self):
        assert wkb_to_wkt_bytes(SRID + _point(-1.25, 2.5)) == "POINT (-1.25 2.5)"

    def test_point_big_endian(self):
        assert wkb_to_wkt_bytes(SRID + _point(3, 4, order=">")) == "POINT (3 4)"

    def test_linestring(self):
        got = wkb_to_wkt_bytes(SRID + _linestring([(30, 10), (10, 30), (40, 40)]))
        assert got == "LINESTRING (30 10, 10 30, 40 40)"

    def test_polygon_with_hole(self):
        outer = [(35, 10), (45, 45), (15, 40), (10, 20), (35, 10)]
        hole = [(20, 30), (35, 35), (30, 20), (20, 30)]
        got = wkb_to_wkt_bytes(SRID + _polygon([outer, hole]))
        assert got == (
            "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), "
            "(20 30, 35 35, 30 20, 20 30))"
        )

    def test_multipoint(self):
        got = wkb_to_wkt_bytes(SRID + _multipoint([(10, 40), (40, 30)]))
        assert got == "MULTIPOINT ((10 40), (40 30))"

    def test_junk_falls_back_to_hex(self):
        b = b"\xde\xad\xbe\xef\x99"
        assert wkb_to_wkt_bytes(b) == b.hex()

    def test_truncated_falls_back_to_hex(self):
        b = SRID + _point(1, 2)[:-4]
        assert wkb_to_wkt_bytes(b) == b.hex()

    def test_null(self):
        assert wkb_to_wkt_bytes(None) is None

    @pytest.mark.parametrize("n", [0, 1])
    def test_no_srid_short_buffer(self, n):
        # len <= 4 → no prefix strip (reference guard len(b) > 4)
        b = b"\x01" * n
        assert wkb_to_wkt_bytes(b) == b.hex()


def test_wkb_udf_on_dataframe(spark):
    rows = [
        (1, SRID + _point(30, 10)),
        (2, SRID + _linestring([(0, 0), (1, 1)])),
        (3, b"\x00\x01\x02"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id int, geo binary")
    got = {r["id"]: r["wkt"] for r in df.select("id", wkb_to_wkt("geo").alias("wkt")).collect()}
    assert got[1] == "POINT (30 10)"
    assert got[2] == "LINESTRING (0 0, 1 1)"
    assert got[3] == "000102"
    assert got[4] is None
