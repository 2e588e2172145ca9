"""Deterministic synthetic `polygons` table (FIXTURES.md §2).

Build side of the PIP join: (a) a regular 2°x2° grid over the bbox,
(b) 20 convex "urban" polygons centered on the pages city centers
(high point density → join skew), (c) analytic edge cases
(point-on-vertex, point-on-edge, boundary-crossing, concave,
degenerate sliver) — the analytic-fixture test pattern carried over
from the reference (reference tests/test_curvature_analytic.py:16-19,
tests/test_openness_yokoyama.py:7-9).

Small table (hundreds of rows) built driver-side; ring is
array<struct<lon:double, lat:double>> (closed implicitly: last->first).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from .pages import BBOX, CITY_LAT, CITY_LON

RING_SCHEMA = "polygon_id long, name string, kind string, ring array<struct<lon:double,lat:double>>"


def _rect(lon0, lat0, lon1, lat1):
    return [(lon0, lat0), (lon1, lat0), (lon1, lat1), (lon0, lat1)]


def polygon_rows() -> list[tuple]:
    rows: list[tuple] = []
    pid = 0
    # (a) regular 2x2-degree grid
    step = 2.0
    k = int(BBOX * 2 / step)
    for gy in range(k):
        for gx in range(k):
            lon0 = -BBOX + gx * step
            lat0 = -BBOX + gy * step
            rows.append((pid, f"grid_{gx}_{gy}", "cell", _rect(lon0, lat0, lon0 + step, lat0 + step)))
            pid += 1
    # (b) urban hexagons on the city centers (hot polygons)
    for c in range(len(CITY_LAT)):
        ring = []
        for a in range(6):
            ang = math.pi / 3.0 * a
            ring.append((float(CITY_LON[c] + 0.3 * math.cos(ang)), float(CITY_LAT[c] + 0.3 * math.sin(ang))))
        rows.append((pid, f"urban_{c}", "urban", ring))
        pid += 1
    # (c) analytic edge cases
    rows.append((pid, "edge_vertex", "sliver", _rect(0.0, 0.0, 1.0, 1.0))); pid += 1
    rows.append((pid, "edge_concave", "sliver",
                 [(5.0, 5.0), (9.0, 5.0), (9.0, 9.0), (7.0, 9.0), (7.0, 6.5), (5.0, 6.5)])); pid += 1
    rows.append((pid, "edge_sliver", "sliver",
                 [(-10.0, -10.0), (10.0, -10.0), (10.0, -9.999), (-10.0, -9.999)])); pid += 1
    rows.append((pid, "edge_crosscell", "sliver", _rect(-1.5, -1.5, 1.5, 1.5))); pid += 1
    rows.append((pid, "edge_bigband", "sliver", _rect(-BBOX, 14.0, BBOX, 16.0))); pid += 1
    return rows


def polygons(spark: SparkSession) -> DataFrame:
    rows = [
        (pid, name, kind, [{"lon": lon, "lat": lat} for lon, lat in ring])
        for pid, name, kind, ring in polygon_rows()
    ]
    return spark.createDataFrame(rows, RING_SCHEMA)
