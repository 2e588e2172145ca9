"""A21 void fill: enclosed holes get the membrane, the exterior stays
empty, known pixels are untouched, and the fill is seam-free
(reference io/dem_preprocess.py:573-640 + _pyramid_fill.py:24-85
semantics over sparse density rasters)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.functions.tiles import TILE_PX
from fujishadergpu_spark.operators.np_filters import pushpull_fill
from fujishadergpu_spark.operators.tile_kernels import rasterize_tiles, tile_kernel
from fujishadergpu_spark.operators.void_fill import (
    _exterior_voids,
    build_void_fill_surface,
)

Z = 2  # fill surface builds at zc=min(z,2)=2 -> s=0, exact coarse==fine


@pytest.fixture(scope="module")
def ring_points(spark):
    """A dense ring of points enclosing an empty interior, far from the
    map edges: interior void is enclosed, everything else exterior."""
    import pandas as pd

    n = 4000
    t = np.arange(n) * (2 * np.pi / n)
    lat = 20.0 + 12.0 * np.sin(t)
    lon = 30.0 + 12.0 * np.cos(t)
    return spark.createDataFrame(pd.DataFrame({"lat": lat, "lon": lon}))


def test_exterior_voids_classification():
    void = np.ones((16, 16), dtype=bool)
    void[4:12, 4:12] = False          # a solid valid block
    void[6:10, 6:10] = True           # with a hole inside
    ext = _exterior_voids(void)
    assert ext[0, 0] and ext[15, 15]  # border-connected region
    assert not ext[7, 7]              # the hole is enclosed
    assert not ext[5, 5]              # valid cells are never exterior


def test_pushpull_preserves_known_and_fills_membrane():
    g = np.full((32, 32), np.nan)
    g[:, :4] = 1.0
    g[:, -4:] = 3.0
    f = pushpull_fill(g)
    np.testing.assert_array_equal(f[:, :4], 1.0)
    np.testing.assert_array_equal(f[:, -4:], 3.0)
    mid = f[:, 4:-4]
    assert np.isfinite(mid).all()
    assert (mid > 0.5).all() and (mid < 3.5).all()  # between the plates


def test_enclosed_hole_filled_exterior_preserved(spark, ring_points):
    surface = build_void_fill_surface(ring_points, Z, mode="enclosed")
    raw = {
        (r["x"], r["y"]): np.frombuffer(r["grid"]).reshape(TILE_PX, TILE_PX)
        for r in rasterize_tiles(ring_points, Z).collect()
    }
    filled = {
        (r["x"], r["y"]): np.asarray(r["result"]).reshape(TILE_PX, TILE_PX)
        for r in tile_kernel(
            ring_points, Z, kernel="hillshade", halo=0, log_scale=False,
            fill_surface=surface,
        ).collect()
    }
    # identity check needs the raw grid back: run a no-op "kernel" via
    # weight of evidence — hillshade is not identity, so instead verify
    # through the surface directly on each tile's raw grid
    saw_fill = saw_exterior = False
    for (x, y), g in raw.items():
        out = surface.apply(g, x, y, Z, 0)
        known = g > 0
        np.testing.assert_array_equal(out[known], g[known])  # known preserved
        # classify pixels via the surface's own gate at s=0
        n_px = (1 << Z) * TILE_PX
        gx = (np.arange(TILE_PX) + x * TILE_PX) % n_px
        gy = np.arange(TILE_PX) + y * TILE_PX
        gate = surface._bc_fillable.value[gy[:, None], gx[None, :]]
        enclosed_void = (g == 0) & gate
        exterior_void = (g == 0) & ~gate
        if enclosed_void.any():
            assert (out[enclosed_void] > 0).all()  # membrane fill
            saw_fill = True
        if exterior_void.any():
            np.testing.assert_array_equal(out[exterior_void], 0.0)
            saw_exterior = True
    assert saw_fill and saw_exterior  # the fixture exercises both classes
    assert set(filled) == set(raw)  # the Spark path ran with the surface


def test_whole_tile_voids_are_synthesized(spark, ring_points):
    """A tile with NO points produces no shuffle rows and no group —
    before the fix, whole-tile enclosed voids silently vanished from
    the output. At z=6 the ring's 24°-wide hole spans several full
    tiles; they must appear, kernel-evaluated over the membrane."""
    from fujishadergpu_spark.functions.tiles import np_tile_pixel

    z = 6
    surface = build_void_fill_surface(ring_points, z, mode="enclosed")
    out = {
        (r["x"], r["y"]): np.asarray(r["result"])
        for r in tile_kernel(
            ring_points, z, kernel="hillshade", fill_surface=surface
        ).collect()
    }
    present = {
        (r["x"], r["y"]) for r in rasterize_tiles(ring_points, z).collect()
    }
    synthesized = set(out) - present
    assert synthesized, "no point-free fillable tiles were materialized"
    # the hole's center tile is point-free and must be in the output
    cx, cy, _, _ = np_tile_pixel(np.array([20.0]), np.array([30.0]), z)
    center = (int(cx[0]), int(cy[0]))
    assert center not in present and center in out
    assert np.isfinite(out[center]).all()
    # stats path synthesizes the same tile set
    stats_keys = {
        (r["x"], r["y"])
        for r in __import__(
            "fujishadergpu_spark.operators.tile_kernels", fromlist=["tile_kernel_stats"]
        ).tile_kernel_stats(
            ring_points, z, kernel="hillshade", fill_surface=surface
        ).collect()
    }
    assert stats_keys == set(out)


def test_fill_is_partition_invariant(spark, ring_points):
    surface = build_void_fill_surface(ring_points, Z, mode="enclosed")

    def run(df):
        return {
            (r["x"], r["y"]): tuple(np.asarray(r["result"])[:32])
            for r in tile_kernel(
                df, Z, kernel="hillshade", fill_surface=surface
            ).collect()
        }

    assert run(ring_points) == run(ring_points.repartition(13))


def test_render_fill_voids_e2e(spark, ring_points, tmp_path):
    """render --fill-voids end-to-end: pages -> surface -> fill ->
    kernel -> quantize -> lineage sink."""
    from fujishadergpu_spark.cli import run_render

    pages = ring_points.select(
        F.format_string(
            "https://r.example/p?lat=%s&lon=%s&id=%d",
            F.format_number("lat", 5), F.format_number("lon", 5),
            F.monotonically_increasing_id(),
        ).alias("url"),
        F.current_timestamp().alias("warc_ts"),
        F.lit(b"<p>x</p>").alias("html"),
        F.lit("").alias("text"),
        F.lit("en").alias("lang"),
    )
    src = str(tmp_path / "pages")
    pages.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "out")
    s = run_render(spark, src, out, "hillshade", zoom=Z, fill_voids="enclosed")
    assert s["keys_processed"] > 0
    back = spark.read.parquet(f"{out}/tiles_hillshade_z{Z}")
    # keys_processed counts lineage BUCKETS (hash buckets of tiles),
    # not tiles: assert tiles exist AND bucket accounting is exact
    n_tiles = back.count()
    n_buckets = back.select(
        F.pmod(F.xxhash64(F.col("x"), F.col("y")), F.lit(64))
    ).distinct().count()
    assert n_tiles > 0
    assert n_buckets == s["keys_processed"]


def test_deep_zoom_default_zc_bounded(spark, ring_points):
    """Advice r3: --fill-voids at z>12 used to hard-fail inside
    fillable_tile_keys with advice the CLI user couldn't follow. The
    default zc now tracks max(2, z-10) so the guard always holds, and
    auto-derivation refuses (with the --fill-zc pointer) once the
    driver grid would exceed the bounded budget."""
    import pytest

    from fujishadergpu_spark.operators.void_fill import build_void_fill_surface

    s = build_void_fill_surface(ring_points, 13, mode="enclosed")
    assert s.zc == 3
    assert s.fillable_tile_keys(13) is not None  # guard holds by construction
    with pytest.raises(ValueError, match="--fill-zc"):
        build_void_fill_surface(ring_points, 15, mode="enclosed")
    # explicit zc opts in / overrides
    s2 = build_void_fill_surface(ring_points, 5, zc=2, mode="enclosed")
    assert s2.zc == 2


def test_skip_empty_core_rejects_fill_surface(spark, ring_points):
    """Advice r3: the combination silently dropped fillable tiles whose
    window held only halo spill-ins; it is now refused at plan time."""
    import pytest

    from fujishadergpu_spark.operators.tile_kernels import tile_kernel
    from fujishadergpu_spark.operators.void_fill import build_void_fill_surface

    surface = build_void_fill_surface(ring_points, 5, mode="enclosed")
    with pytest.raises(ValueError, match="skip_empty_core"):
        tile_kernel(ring_points, 5, kernel="hillshade",
                    skip_empty_core=True, fill_surface=surface)
