"""Tile pipeline tests: XYZ assignment golden math, rasterization
determinism, the seam-free tiled-vs-whole kernel invariant (the
reference's single most important test pattern,
reference tests/test_visual_saliency_tile_stability.py:6-29), and the
LOD pyramid mass-conservation invariant."""

import math

import numpy as np
from pyspark.sql import functions as F

from fujishadergpu_spark.functions.tiles import TILE_PX, np_tile_pixel, tile_pixel
from fujishadergpu_spark.operators.tile_kernels import (
    build_pyramid,
    np_hillshade,
    rasterize_tiles,
    tile_kernel,
)

Z = 3  # 8x8 tiles -> 2048px world; test data spans tiles 3..4 only


def test_tile_pixel_analytic(spark):
    """Known slippy-map anchor points."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (85.05112877, -179.9999), (-85.05112877, 179.9999)],
        "lat double, lon double",
    )
    x, y, px, py = tile_pixel(F.col("lat"), F.col("lon"), 1)
    rows = df.select(x.alias("x"), y.alias("y")).collect()
    assert (rows[0]["x"], rows[0]["y"]) == (1, 1)  # (0,0) falls in SE quadrant
    assert (rows[1]["x"], rows[1]["y"]) == (0, 0)
    assert (rows[2]["x"], rows[2]["y"]) == (1, 1)


def test_tile_pixel_column_matches_numpy(spark, points_df):
    pdf = points_df.toPandas()
    x, y, px, py = tile_pixel(F.col("lat"), F.col("lon"), 8)
    got = points_df.select(x.alias("x"), y.alias("y"), px.alias("px"), py.alias("py")).toPandas()
    ex, ey, epx, epy = np_tile_pixel(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 8)
    assert (got["x"].to_numpy() == ex).all() and (got["y"].to_numpy() == ey).all()
    assert (got["px"].to_numpy() == epx).all() and (got["py"].to_numpy() == epy).all()


def _global_grid(pdf, z):
    n = (1 << z) * TILE_PX
    gx, gy, px, py = np_tile_pixel(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), z)
    idx = (gy * TILE_PX + py) * n + (gx * TILE_PX + px)
    return np.bincount(idx, minlength=n * n).astype(np.float64).reshape(n, n)


def test_rasterize_deterministic_and_correct(spark, points_df):
    pdf = points_df.toPandas()
    world = _global_grid(pdf, Z)
    tiles = rasterize_tiles(points_df, Z).collect()
    assert sum(np.frombuffer(t["grid"]).sum() for t in tiles) == len(pdf)
    for t in tiles:
        g = np.frombuffer(t["grid"]).reshape(TILE_PX, TILE_PX)
        sl = world[
            t["y"] * TILE_PX : (t["y"] + 1) * TILE_PX, t["x"] * TILE_PX : (t["x"] + 1) * TILE_PX
        ]
        assert (g == sl).all()
    # partition invariance: identical grids from a different layout
    tiles2 = {(t["x"], t["y"]): t["grid"] for t in rasterize_tiles(points_df.repartition(13), Z).collect()}
    for t in tiles:
        assert bytes(t["grid"]) == bytes(tiles2[(t["x"], t["y"])])  # bit-identical payloads


def test_kernel_seam_free(spark, points_df):
    """Tiled hillshade (halo=1) == whole-world hillshade on every core:
    the reference's tile-stability invariant, bit-exact."""
    pdf = points_df.toPandas()
    world = np_hillshade(np.log1p(_global_grid(pdf, Z)))
    tiles = tile_kernel(points_df, Z, kernel="hillshade", log_scale=True).collect()
    assert len(tiles) > 1  # multiple tiles => seams exist to verify
    for t in tiles:
        g = np.asarray(t["result"]).reshape(TILE_PX, TILE_PX)
        sl = world[
            t["y"] * TILE_PX : (t["y"] + 1) * TILE_PX, t["x"] * TILE_PX : (t["x"] + 1) * TILE_PX
        ]
        assert np.array_equal(g, sl), f"seam mismatch in tile {(t['x'], t['y'])}"


def test_new_kernels_seam_free_via_spark(spark, points_df):
    """Three representative ported kernels (ray-march, iterative
    primal-dual, gradient-local) through the real grouped-map tile
    path: tiled == whole-world NumPy, bit-exact — proving the registry
    halo resolution and the halo-exchange shuffle for the extended
    inventory (the per-kernel NumPy seam matrix lives in
    test_np_kernels.py)."""
    from fujishadergpu_spark.operators.np_kernels import (
        np_atmospheric_scattering,
        np_openness,
        np_tv_decomposition,
    )

    pdf = points_df.toPandas()
    logw = np.log1p(_global_grid(pdf, Z))
    cases = [
        ("openness", {"max_distance": 8}, np_openness),
        ("atmospheric_scattering", {}, np_atmospheric_scattering),
        ("tv_decomposition", {"iterations": 12, "tv_scale": 8.0, "global_stats": (0.0, 1.0)}, np_tv_decomposition),
    ]
    for name, params, np_fn in cases:
        world = np_fn(logw, **params)
        tiles = tile_kernel(points_df, Z, kernel=name, log_scale=True, **params).collect()
        assert len(tiles) > 1, name
        for t in tiles:
            g = np.asarray(t["result"]).reshape(TILE_PX, TILE_PX)
            sl = world[
                t["y"] * TILE_PX : (t["y"] + 1) * TILE_PX,
                t["x"] * TILE_PX : (t["x"] + 1) * TILE_PX,
            ]
            assert np.array_equal(g, sl), f"{name}: seam in tile {(t['x'], t['y'])}"


def test_skip_empty_core_drops_halo_only_tiles(spark):
    """A17: one point 2px from a tile edge with a large halo spills
    into the neighbor tile; with skip_empty_core the neighbor (which
    owns nothing) is skipped, the owner is kept with identical
    values."""
    lat, lon = 0.01, (1022.5 / 2048.0) * 360.0 - 180.0  # 2px inside tile 3 in x
    owner = tuple(
        int(v[0]) for v in np_tile_pixel(np.array([lat]), np.array([lon]), Z)[:2]
    )
    pts = spark.createDataFrame([(1, lat, lon)], "id long, lat double, lon double")
    both = {
        (t["x"], t["y"]): t["result"]
        for t in tile_kernel(pts, Z, kernel="hillshade", halo=8).collect()
    }
    kept = {
        (t["x"], t["y"]): t["result"]
        for t in tile_kernel(pts, Z, kernel="hillshade", halo=8, skip_empty_core=True).collect()
    }
    assert len(both) > 1  # halo spill created neighbor tiles
    assert set(kept) == {owner}  # only the owning tile survives
    assert list(both[owner]) == list(kept[owner])  # owner output unchanged


def test_pyramid_mass_conservation(spark, points_df):
    base = rasterize_tiles(points_df, Z)
    pyr = build_pyramid(base, Z, 0, agg="sum")
    totals = {}
    for r in pyr.select("z", "grid").collect():
        totals[r["z"]] = totals.get(r["z"], 0.0) + float(np.frombuffer(r["grid"]).sum())
    n = points_df.count()
    for z_, total in totals.items():
        assert abs(total - n) < 1e-6, f"mass lost at z={z_}"
