"""Metric pixel scales (reference io/raster_info.py:38-99,
core/tile_processor.py:910-932): per-tile (m/px) spacings feed the
gradient kernels, so physically identical terrain produces the same
slope at any latitude — the reference's geographic-parity law
(reference tests/test_geographic_parity.py:46-96)."""

import math

import numpy as np
import pandas as pd
import pytest

from fujishadergpu_spark.functions.spatial import meters_per_degree
from fujishadergpu_spark.functions.tiles import TILE_PX
from fujishadergpu_spark.operators.tile_kernels import (
    np_slope,
    tile_kernel,
    tile_pixel_scales,
)

Z = 6
# plane gradient (elevation units per ground metre), small enough that
# per-PIXEL unit-spacing slopes stay out of arctan saturation
A, B = 0.0001, 0.0002
SLOPE_DEG = math.degrees(math.atan(math.hypot(A, B)))


def test_tile_pixel_scales_pins_web_mercator_resolution():
    """At the equator the x scale must equal the canonical WebMercator
    ground resolution 156543.03.../2^z m/px (z0, 256-px tiles), and the
    two axes are near-isotropic (mercator is conformal)."""
    sx, sy = tile_pixel_scales((1 << Z) // 2, Z)  # tile just below the equator
    want = meters_per_degree(0.0)[0] * 360.0 / ((1 << Z) * TILE_PX)
    assert sx == pytest.approx(want, rel=0.005)
    assert sy == pytest.approx(sx, rel=0.02)
    # z=0 world tile: the textbook 156543 m/px initial resolution
    sx0, _ = tile_pixel_scales(0, 0)
    assert sx0 == pytest.approx(156543.03, rel=0.01)


def test_np_slope_metric_matches_np_gradient_spacing():
    rng = np.random.RandomState(3)
    g = rng.rand(40, 40) * 5
    got = np_slope(g, unit="radian", pixel_scale=(2.0, 3.0))
    gy = np.gradient(g, 3.0, axis=0)
    gx = np.gradient(g, 2.0, axis=1)
    np.testing.assert_allclose(got, np.arctan(np.hypot(gx, gy)), rtol=1e-12)


def _plane_tile_points(tx: int, ty: int, z: int) -> pd.DataFrame:
    """One point per pixel of tile (tx, ty), elevation = a plane in
    LOCAL GROUND METRES (tangent at the tile center) — constant
    physical slope regardless of latitude."""
    n_px = (1 << z) * TILE_PX
    p = np.arange(TILE_PX)
    gx = tx * TILE_PX + p
    gy = ty * TILE_PX + p
    lon = (gx + 0.5) / n_px * 360.0 - 180.0
    lat = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (gy + 0.5) / n_px))))
    lat_c = float(lat[TILE_PX // 2])
    m_lon, m_lat = meters_per_degree(lat_c)
    LON, LAT = np.meshgrid(lon, lat)
    xm = (LON - lon.mean()) * m_lon
    ym = (lat_c - LAT) * m_lat
    elev = A * xm + B * ym + 1000.0
    return pd.DataFrame(
        {"lat": LAT.ravel(), "lon": LON.ravel(), "elev": elev.ravel()}
    )


@pytest.fixture(scope="module")
def plane_slopes(spark):
    """Median in-tile slope for the same physical plane at the equator
    and at ~61°N, with and without metric scales."""
    n_t = 1 << Z
    tiles = {"equator": (n_t // 2, n_t // 2), "north": (n_t // 2, int(n_t * 0.30))}
    out = {}
    for name, (tx, ty) in tiles.items():
        df = spark.createDataFrame(_plane_tile_points(tx, ty, Z))
        for mode in ("metric", "unit"):
            rows = tile_kernel(
                df, Z, kernel="slope", unit="degree", weight_col="elev",
                log_scale=False, metric_scale=(mode == "metric"),
            ).collect()
            grid = {(r["x"], r["y"]): np.asarray(r["result"]).reshape(TILE_PX, TILE_PX)
                    for r in rows}[(tx, ty)]
            out[(name, mode)] = float(np.median(grid[8:-8, 8:-8]))
    return out


def test_metric_slope_is_latitude_invariant(plane_slopes):
    eq, no = plane_slopes[("equator", "metric")], plane_slopes[("north", "metric")]
    assert eq == pytest.approx(SLOPE_DEG, rel=0.05)
    assert no == pytest.approx(SLOPE_DEG, rel=0.10)
    assert eq == pytest.approx(no, rel=0.10)


def test_unit_slope_is_not(plane_slopes):
    """Without metric scales the same physical plane reads differently
    at different latitudes (the bug metric scales fix)."""
    eq, no = plane_slopes[("equator", "unit")], plane_slopes[("north", "unit")]
    assert eq / max(no, 1e-12) > 1.5 or no / max(eq, 1e-12) > 1.5


def test_metric_scale_rejects_non_consumers(spark, points_df):
    with pytest.raises(ValueError, match="metric pixel scales"):
        tile_kernel(points_df, Z, kernel="blur", metric_scale=True)
    with pytest.raises(ValueError, match="not both"):
        tile_kernel(
            points_df, Z, kernel="slope", metric_scale=True, pixel_scale=(2.0, 2.0)
        )
