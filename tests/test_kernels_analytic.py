"""Analytic kernel fixtures (the reference's unit-test pattern:
parabolic cylinder has zero planform curvature,
reference tests/test_curvature_analytic.py:16-54; flat terrain
ordering for openness/shade)."""

import numpy as np

from fujishadergpu_spark.operators.tile_kernels import (
    np_aspect,
    np_curvature,
    np_hillshade,
    np_slope,
)


def _parabolic_cylinder(n=64, a=0.01):
    x = np.arange(n, dtype=np.float64)
    return np.tile(a * (x - n / 2) ** 2, (n, 1))


def test_planform_zero_on_parabolic_cylinder():
    g = _parabolic_cylinder()
    c = np_curvature(g, "planform")[4:-4, 4:-4]
    assert np.abs(c).max() < 1e-9  # straight contours -> zero planform


def test_profile_nonzero_on_parabolic_cylinder():
    g = _parabolic_cylinder()
    c = np_curvature(g, "profile")[4:-4, 4:-4]
    assert np.abs(c).max() > 1e-4


def test_mean_curvature_sign_bowl_vs_dome():
    y, x = np.mgrid[0:32, 0:32]
    bowl = 0.01 * ((x - 16.0) ** 2 + (y - 16.0) ** 2)
    assert np_curvature(bowl, "mean")[10:-10, 10:-10].mean() > 0
    assert np_curvature(-bowl, "mean")[10:-10, 10:-10].mean() < 0


def test_flat_terrain_kernels():
    g = np.full((32, 32), 5.0)
    assert np.allclose(np_slope(g), 0.0)
    assert np.allclose(np_hillshade(g), np.sin(np.radians(45.0)))
    assert np.allclose(np_curvature(g, "planform"), 0.0)


def test_aspect_directions():
    y, x = np.mgrid[0:32, 0:32]
    # elevation increasing southward (grid-down) -> downslope is north (0°)
    g = y.astype(np.float64)
    a = np_aspect(-g)[8:-8, 8:-8]
    assert np.allclose(a % 360.0, 180.0)  # downslope points south
    a2 = np_aspect(g)[8:-8, 8:-8]
    assert np.allclose(a2, 0.0)


def test_curvature_tile_kernel_runs(spark, points_df):
    from fujishadergpu_spark.operators.tile_kernels import tile_kernel_stats

    out = tile_kernel_stats(points_df, 4, kernel="curvature", log_scale=True,
                            lit_threshold=0.0).collect()
    assert len(out) > 0


def test_gaussian_curvature_sphere_vs_cylinder():
    """Gaussian curvature K: positive on a dome, ~zero on a developable
    (parabolic-cylinder) surface, negative on a saddle — the defining
    classification (reference _impl_curvature.py:41-42)."""
    import numpy as np

    from fujishadergpu_spark.operators.tile_kernels import np_curvature

    y, x = np.mgrid[0:61, 0:61].astype(np.float64)
    xc, yc = x - 30, y - 30
    dome = -0.01 * (xc**2 + yc**2)
    cylinder = -0.01 * xc**2
    saddle = 0.01 * (xc**2 - yc**2)
    c = (30, 30)
    assert np_curvature(dome, "gaussian")[c] > 1e-6
    assert abs(np_curvature(cylinder, "gaussian")[c]) < 1e-9
    assert np_curvature(saddle, "gaussian")[c] < -1e-6


def test_slope_units():
    import numpy as np

    from fujishadergpu_spark.operators.tile_kernels import np_slope

    ramp = np.outer(np.ones(32), np.arange(32, dtype=np.float64))  # dz/dx = 1
    c = (16, 16)
    assert abs(np_slope(ramp, "degree")[c] - 45.0) < 1e-9
    assert abs(np_slope(ramp, "percent")[c] - 100.0) < 1e-9
    assert abs(np_slope(ramp, "radian")[c] - np.pi / 4) < 1e-12
