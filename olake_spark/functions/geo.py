"""Geo reformat: WKB → WKT (SURVEY.md §2 C4, the round-1 declared gap).

Reference semantics (utils/typeutils/reformat.go:506-539
ReformatGeoType): strings pass through untouched; byte values skip a
4-byte SRID prefix (MySQL's internal geometry layout), WKB-decode the
rest to WKT, and fall back to the hex encoding of the WHOLE buffer
when decoding fails; NULL stays NULL.

No geo library ships in this container, so the WKB reader is
implemented directly (byte order + geometry type + coordinates per
the OGC WKB spec) for the 2D types the reference's go-geom path
covers: Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon, GeometryCollection. It runs as an Arrow-batched pandas
UDF over ``mapInPandas``-style columns — WKB decoding is inherently
per-value, but the transfer stays vectorized and the UDF is off the
hot path (geo columns are rare and narrow).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_TYPES = {
    1: "POINT",
    2: "LINESTRING",
    3: "POLYGON",
    4: "MULTIPOINT",
    5: "MULTILINESTRING",
    6: "MULTIPOLYGON",
    7: "GEOMETRYCOLLECTION",
}


def _fmt(x: float) -> str:
    # go-geom's wkt marshal prints minimal decimal ('30', '1.5')
    return format(x, "g")


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def _take(self, fmt: str, size: int):
        if self.pos + size > len(self.buf):
            raise ValueError("wkb truncated")
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def geometry(self) -> str:
        order = self._take("B", 1)
        if order not in (0, 1):
            raise ValueError("bad byte order")
        e = "<" if order == 1 else ">"
        gtype = self._take(e + "I", 4)
        base = gtype & 0xFF  # mask off Z/M/SRID flag spaces
        if base != gtype or base not in _TYPES:
            raise ValueError(f"unsupported wkb type {gtype}")
        name = _TYPES[base]
        if base == 1:
            return f"{name} ({self._point(e)})"
        if base == 2:
            return f"{name} {self._ring(e)}"
        if base == 3:
            return f"{name} {self._rings(e)}"
        if base in (4, 5, 6):
            n = self._take(e + "I", 4)
            # sub-geometries carry their own full WKB headers
            parts = []
            for _ in range(n):
                sub = self.geometry()
                # strip the sub-type tag: MULTIPOINT ((1 2), (3 4))
                parts.append(sub.split(" ", 1)[1])
            return f"{name} (" + ", ".join(parts) + ")"
        n = self._take(e + "I", 4)  # GEOMETRYCOLLECTION
        return f"{name} (" + ", ".join(self.geometry() for _ in range(n)) + ")"

    def _point(self, e: str) -> str:
        x = self._take(e + "d", 8)
        y = self._take(e + "d", 8)
        return f"{_fmt(x)} {_fmt(y)}"

    def _ring(self, e: str) -> str:
        n = self._take(e + "I", 4)
        return "(" + ", ".join(self._point(e) for _ in range(n)) + ")"

    def _rings(self, e: str) -> str:
        n = self._take(e + "I", 4)
        return "(" + ", ".join(self._ring(e) for _ in range(n)) + ")"


def wkb_to_wkt_bytes(b: bytes | None, strip_srid: bool = True) -> str | None:
    """One value: reference ReformatGeoType for the bytes arm."""
    if b is None:
        return None
    body = b[4:] if strip_srid and len(b) > 4 else b
    try:
        r = _Reader(bytes(body))
        out = r.geometry()
        if r.pos != len(r.buf):
            raise ValueError("trailing bytes")
        return out
    except (ValueError, struct.error):
        return bytes(b).hex()


def wkb_to_wkt(col) -> Column:
    """Column form: binary (SRID-prefixed WKB) → WKT string, hex
    fallback, NULL-safe. The pandas UDF is created at call time (the
    decorator resolves its return type against the active session)."""

    @pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(lambda b: wkb_to_wkt_bytes(b))

    return _udf(col)


def reformat_geo(col: Column) -> Column:
    """String columns pass through (already WKT); binary goes through
    the WKB decoder — callers dispatch on the column's dataType, this
    helper is the binary arm."""
    return wkb_to_wkt(col)
