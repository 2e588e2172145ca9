"""Raster<->vector tile pipeline: rasterize points onto the XYZ grid,
run per-tile window kernels as grouped-map pandas UDFs, build LOD
pyramids.

This is the direct re-expression of the reference's tile engine:

- tile enumeration + core/halo windows
  (reference core/tile_processor.py:1609-1627) becomes *halo
  duplication*: each point is exploded into every tile whose
  halo-expanded window contains it, then ``groupBy(tile)`` — the
  shuffle IS the halo exchange (SURVEY.md §2.A A3/A5).
- ``map_overlap(kernel, depth)`` stencils (reference
  algorithms/_impl_hillshade.py:133-139) become
  ``applyInPandas(kernel)`` over (256+2*halo)^2 NumPy grids; the
  kernel crops the core exactly like the reference's GPU-side core
  crop (reference core/tile_processor.py:944-971).
- the COG overview pyramid (reference algorithms/_nan_utils.py:836-871)
  becomes LOD tables built by ``groupBy(parent_tile)`` aggregation.

Determinism (SURVEY.md §7.3 hard part 3): rasterization accumulates
integer counts (order-free) or sorts rows by (pixel, value) before
accumulating weights, so tile grids are bit-identical for any
partitioning/parallelism — the engine's analog of the reference's
seam-free/backend-parity guarantees.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import TILE_PX, merc_xy_norm


def _kernel_parallelism(df: DataFrame) -> int:
    """Partition count for CPU-bound grouped-map stages.

    AQE's byte-based coalescing would pack a small-but-CPU-heavy
    kernel stage into one partition (bytes are tiny, work is not); an
    explicit user repartition is exempt from coalescing, so kernel
    stages pin partitions to a multiple of the cluster parallelism —
    the analog of the reference's worker-throttling-by-compute (not
    by bytes) sizing (reference config/auto_tune.py:159-192).

    2 waves: measured per-partition grouped-map overhead (Arrow stream
    + python eval setup) makes 4 waves ~1.5x slower than 1 at bench
    scale, while heavy-tailed per-tile cost (dense urban tiles) still
    wants more than one task per core for balance.
    """
    return df.sparkSession.sparkContext.defaultParallelism * 2


# ------------------------- halo explosion ---------------------------

def explode_to_tiles(
    points: DataFrame,
    z: int,
    halo: int = 0,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Adds (tile_x, tile_y, gx, gy): one row per (point, owning or
    halo-adjacent tile). halo is in pixels (kernel support depth, the
    analog of the reference's per-algorithm padding,
    reference core/tile_processor.py:207-383).

    A point duplicates into a neighbor tile iff it falls inside that
    tile's halo window — at halo<=255 that is at most the 8-neighbors,
    expressed as a static array of candidate offsets + filter (JVM-
    side; the groupBy shuffle then routes duplicates to their tiles).
    Tile x wraps (antimeridian); tile y clamps at the mercator edge.
    """
    if not 0 <= halo < TILE_PX:
        raise ValueError("halo must be in [0, 256)")
    n_tiles = 1 << z
    n_px = n_tiles * TILE_PX
    xn, yn = merc_xy_norm(F.col(lat_col), F.col(lon_col))
    gx = F.least(F.lit(n_px - 1), F.greatest(F.lit(0), F.floor(xn * F.lit(float(n_px))))).cast("long")
    gy = F.least(F.lit(n_px - 1), F.greatest(F.lit(0), F.floor(yn * F.lit(float(n_px))))).cast("long")
    df = points.withColumns({"gx": gx, "gy": gy})

    if halo == 0:
        return df.withColumns(
            {"tile_x": F.shiftright(F.col("gx"), 8), "tile_y": F.shiftright(F.col("gy"), 8)}
        )

    tx = F.shiftright(F.col("gx"), 8)
    ty = F.shiftright(F.col("gy"), 8)
    pxl = F.col("gx").bitwiseAND(F.lit(255))
    pyl = F.col("gy").bitwiseAND(F.lit(255))
    cands = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            cond = F.lit(True)
            if dx == -1:
                cond = cond & (pxl < halo)
            elif dx == 1:
                cond = cond & (pxl >= TILE_PX - halo)
            if dy == -1:
                cond = cond & (pyl < halo)
            elif dy == 1:
                cond = cond & (pyl >= TILE_PX - halo)
            ntx = F.pmod(tx + dx, F.lit(n_tiles))
            nty = ty + dy
            cand = F.when(cond & (nty >= 0) & (nty < n_tiles), F.struct(ntx.alias("tx"), nty.alias("ty")))
            cands.append(cand)
    df = df.withColumn("_t", F.explode(F.filter(F.array(*cands), lambda c: c.isNotNull())))
    return df.withColumns(
        {"tile_x": F.col("_t.tx"), "tile_y": F.col("_t.ty")}
    ).drop("_t")


# ------------------------- rasterization ----------------------------

_MASK32 = (1 << 32) - 1


def _packed_tiles(points: DataFrame, z: int, halo: int, weight_col: str | None) -> DataFrame:
    """Explode to tiles, then pack (tile_x, tile_y) and (gx, gy) into
    one long each: the halo-exchange shuffle row shrinks to 16 bytes
    (+ optional weight) — shuffle volume is the scaling bottleneck of
    the tile path at high core counts."""
    pts = explode_to_tiles(points, z, halo)
    cols = {
        "_tk": F.shiftleft(F.col("tile_x"), 32) + F.col("tile_y"),
        "_gk": F.shiftleft(F.col("gx"), 32) + F.col("gy"),
    }
    sel = pts.withColumns(cols).select(*["_tk", "_gk"] + ([weight_col] if weight_col else []))
    return sel.repartition(_kernel_parallelism(points), "_tk")


# A17 skip-filter note: the reference skips all-NoData tile windows
# before running the kernel (reference core/tile_processor.py:864-874).
# Here that case is structurally free — a tile with zero points in
# core+halo has no shuffle rows, so no group exists and the kernel
# never runs. ``skip_empty_core`` extends the skip to tiles whose CORE
# is empty (only halo spill-ins): their output is pure boundary bleed
# of neighbors, the analog of the reference's nodata-tile shortcut.
_CORE_FLAG = "_core"


def _with_core_flag(packed: DataFrame) -> DataFrame:
    own = F.shiftleft(F.shiftright(F.col("_gk"), 32 + 8), 32) + F.shiftright(
        F.col("_gk").bitwiseAND(F.lit(_MASK32)), 8
    )
    return packed.withColumn(_CORE_FLAG, own == F.col("_tk"))


def _accumulate_grid(
    pdf: pd.DataFrame, z: int, halo: int, weight_col: str | None, dtype=np.float64
) -> np.ndarray:
    """Deterministic (W=256+2h)^2 accumulation grid for one tile group.

    gx/gy are global pixel coords; the tile origin is shifted by -halo.
    For wrapped halos (antimeridian) the offset is fixed up mod world
    width. Counts are order-free; weights are accumulated in sorted
    (pixel, value) order for bit-reproducibility.
    """
    w = TILE_PX + 2 * halo
    n_px = (1 << z) * TILE_PX
    tk = int(pdf["_tk"].iloc[0])
    tx, ty = tk >> 32, tk & _MASK32
    gk = pdf["_gk"].to_numpy(dtype=np.int64)
    lx = ((gk >> 32) - (tx * TILE_PX - halo)) % n_px
    ly = (gk & _MASK32) - (ty * TILE_PX - halo)
    keep = (lx >= 0) & (lx < w) & (ly >= 0) & (ly < w)
    lx, ly = lx[keep], ly[keep]
    idx = ly * w + lx
    if weight_col is None:
        grid = np.bincount(idx, minlength=w * w).astype(dtype)
    else:
        # float64 accumulation in sorted order regardless of output
        # dtype (bit-reproducible), downcast after
        vals = pdf[weight_col].to_numpy(dtype=np.float64)[keep]
        order = np.lexsort((vals, idx))
        grid = np.zeros(w * w, dtype=np.float64)
        np.add.at(grid, idx[order], vals[order])
        grid = grid.astype(dtype, copy=False)
    return grid.reshape(w, w)


def pack_grid(a: np.ndarray) -> bytes:
    """Grid transport encoding: raw little-endian float64 bytes. One
    binary cell per row instead of a 65k-element array<double> — the
    repo's measured allocator lesson (list-columns through Arrow
    materialize ~65k tiny objects per batch; see README design rules)
    applied to every internal grid column."""
    return np.ascontiguousarray(a, dtype=np.float64).tobytes()


def unpack_grid(buf: bytes, w: int) -> np.ndarray:
    """Inverse of pack_grid. Returns a READ-ONLY (w, w) view over the
    Arrow buffer — zero-copy; consumers that mutate must copy()."""
    return np.frombuffer(buf, dtype=np.float64).reshape(w, w)


def rasterize_tiles(
    points: DataFrame,
    z: int,
    halo: int = 0,
    weight_col: str | None = None,
    log_scale: bool = False,
) -> DataFrame:
    """points -> one row per tile: (z, x, y, grid: binary).

    grid is the packed (256+2*halo)^2 float64 accumulation raster
    (counts, or summed weight_col) — decode with ``unpack_grid``.
    log_scale applies log1p — the density->elevation transform used
    before terrain-style kernels.
    """
    pts = _packed_tiles(points, z, halo, weight_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = _accumulate_grid(pdf, z, halo, weight_col)
        if log_scale:
            grid = np.log1p(grid)
        return pd.DataFrame(
            {
                "z": [z],
                "x": [int(pdf["_tk"].iloc[0]) >> 32],
                "y": [int(pdf["_tk"].iloc[0]) & _MASK32],
                "grid": [pack_grid(grid)],
            }
        )

    schema = "z int, x long, y long, grid binary"
    return pts.groupBy("_tk").applyInPandas(fn, schema)


# --------------------------- window kernels --------------------------

def np_metric_gradient(
    grid: np.ndarray,
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    z_factor: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(gy, gx) per METRIC spacing: gradient / (m per pixel), scaled by
    z_factor (vertical exaggeration) — the reference's sign-aware
    metric derivative (reference algorithms/_nan_utils.py:50-74,
    io/raster_info.py pixel scales). Unit spacing (1, 1) is the exact
    pre-metric behavior."""
    gy, gx = np.gradient(grid)
    sx, sy = float(pixel_scale[0]), float(pixel_scale[1])
    zf = float(z_factor)
    if (sx, sy, zf) != (1.0, 1.0, 1.0):
        gx = gx * (zf / sx)
        gy = gy * (zf / sy)
    return gy, gx


def np_hillshade(
    grid: np.ndarray,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    z_factor: float = 1.0,
) -> np.ndarray:
    """Lambertian hillshade of a 2-D field (classic Horn formula).

    Same semantics as the reference's local hillshade (reference
    algorithms/_impl_hillshade.py:20-54: gradient -> surface normal ->
    clamped dot product with the light vector), implemented fresh on
    np.gradient. Output in [0, 1]. pixel_scale carries per-tile metric
    m/px spacings into the gradient (reference
    core/tile_processor.py:910-932).
    """
    gy, gx = np_metric_gradient(grid, pixel_scale, z_factor)
    az = math.radians(azimuth_deg)
    alt = math.radians(altitude_deg)
    slope = np.arctan(np.hypot(gx, gy))
    aspect = np.arctan2(-gx, gy)
    shade = math.sin(alt) * np.cos(slope) + math.cos(alt) * np.sin(slope) * np.cos(az - aspect)
    return np.clip(shade, 0.0, 1.0)


def np_slope(
    grid: np.ndarray,
    unit: str = "degree",
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    z_factor: float = 1.0,
) -> np.ndarray:
    """Slope magnitude in degree / percent / radian (reference
    algorithms/_impl_slope.py:19-35's unit switch), metric when
    pixel_scale is given."""
    gy, gx = np_metric_gradient(grid, pixel_scale, z_factor)
    rad = np.arctan(np.hypot(gx, gy))
    if unit == "degree":
        return np.degrees(rad)
    if unit == "percent":
        return np.tan(rad) * 100.0
    if unit == "radian":
        return rad
    raise ValueError(f"unknown slope unit {unit!r} (degree/percent/radian)")


def np_curvature(
    grid: np.ndarray,
    mode: str = "planform",
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    z_factor: float = 1.0,
) -> np.ndarray:
    """Second-order surface curvature (reference
    algorithms/_impl_curvature.py:19-57 semantics: mean / gaussian /
    planform / profile from the Hessian + gradient, fresh NumPy
    implementation). pixel_scale puts the Hessian in metric units
    (1/m curvatures).

    planform curvature is zero along straight contours (a parabolic
    cylinder has zero planform curvature — the reference's analytic
    fixture, tests/test_curvature_analytic.py).
    """
    gy, gx = np_metric_gradient(grid, pixel_scale, z_factor)
    sx, sy = float(pixel_scale[0]), float(pixel_scale[1])
    gyy, gyx = np.gradient(gy)
    gxy, gxx = np.gradient(gx)
    if (sx, sy) != (1.0, 1.0):
        gyy = gyy / sy
        gyx = gyx / sx
        gxy = gxy / sy
        gxx = gxx / sx
    p = gx * gx + gy * gy
    eps = 1e-12
    if mode == "mean":
        num = (1 + gy * gy) * gxx - 2 * gx * gy * gxy + (1 + gx * gx) * gyy
        den = 2.0 * np.power(1 + p, 1.5)
        return num / np.maximum(den, eps)
    if mode == "gaussian":
        # K = (z_xx z_yy - z_xy^2) / (1 + |∇z|^2)^2 — positive on
        # domes/bowls, negative on saddles, zero on developable
        # surfaces (reference _impl_curvature.py:41-42)
        return (gxx * gyy - gxy * gxy) / np.power(1 + p, 2)
    if mode == "planform":
        num = gy * gy * gxx - 2 * gx * gy * gxy + gx * gx * gyy
        return np.where(p > eps, num / np.maximum(np.power(p, 1.5), eps), 0.0)
    if mode == "profile":
        num = gx * gx * gxx + 2 * gx * gy * gxy + gy * gy * gyy
        return np.where(p > eps, num / np.maximum(p * np.power(1 + p, 1.5), eps), 0.0)
    raise ValueError(f"unknown curvature mode {mode}")


def np_curvature_display(
    grid: np.ndarray,
    mode: str = "mean",
    pixel_scale: tuple[float, float] = (1.0, 1.0),
    z_factor: float = 1.0,
) -> np.ndarray:
    """Display-ready curvature: tanh(100c) -> [0,1] + gamma (the
    reference's visualization transform, _impl_curvature.py:55-58);
    np_curvature returns the raw quantitative field."""
    c = np_curvature(grid, mode, pixel_scale, z_factor)
    return np.power((np.tanh(c * 100.0) + 1.0) / 2.0, 1 / 2.2)


def np_aspect(
    grid: np.ndarray, pixel_scale: tuple[float, float] = (1.0, 1.0)
) -> np.ndarray:
    """Downslope direction in degrees [0, 360) (0 = north)."""
    gy, gx = np_metric_gradient(grid, pixel_scale)
    return np.degrees(np.arctan2(-gx, gy)) % 360.0


from .np_kernels import EXT_KERNEL_DEFAULTS, EXT_KERNELS  # noqa: E402  (registry merge below)

# §2.D declared per-kernel parameter defaults (reference
# get_default_params contract); the local kernels' surfaces first
KERNEL_DEFAULTS: dict[str, dict] = {
    "hillshade": {"azimuth_deg": 315.0, "altitude_deg": 45.0,
                  "pixel_scale": (1.0, 1.0), "z_factor": 1.0},
    "slope": {"unit": "degree", "pixel_scale": (1.0, 1.0), "z_factor": 1.0},
    "curvature": {"mode": "planform", "pixel_scale": (1.0, 1.0), "z_factor": 1.0},
    "curvature_display": {"mode": "mean", "pixel_scale": (1.0, 1.0), "z_factor": 1.0},
    "aspect": {"pixel_scale": (1.0, 1.0)},
    **EXT_KERNEL_DEFAULTS,
}

# kernels that consume per-tile METRIC pixel scales (gradient spacing /
# ray distances); tile_kernel(metric_scale=True) injects pixel_scale
# per tile for exactly these (reference core/tile_processor.py:910-932)
METRIC_SCALE_KERNELS = frozenset(
    {"hillshade", "slope", "curvature", "curvature_display", "aspect", "openness"}
)

KERNELS = {
    "hillshade": (np_hillshade, 1),  # name -> (fn, halo depth | halo(params))
    "slope": (np_slope, 1),
    "curvature": (np_curvature, 2),  # 2nd-order stencil -> depth 2
    "curvature_display": (np_curvature_display, 2),
    "aspect": (np_aspect, 1),
    # the full reference algorithm inventory (np_kernels.py): blur,
    # multiscale_terrain, openness, ambient_occlusion, specular,
    # atmospheric_scattering, npr_edges, structure_tensor, frangi, lic,
    # phase_congruency, tv_decomposition, scale_drift,
    # scale_space_surprise, multi_light_uncertainty, visual_saliency,
    # fractal_anomaly (reference algorithms/dask_registry.py:27-49)
    **EXT_KERNELS,
}


def tile_pixel_scales(tile_y: int, z: int) -> tuple[float, float]:
    """(m/px x, m/px y) at a tile's center latitude — the per-tile
    geographic pixel scales the reference injects into every kernel
    (reference io/raster_info.py:38-99, core/tile_processor.py:910-932),
    from the shared WGS84 metres-per-degree series.

    On the WebMercator grid: deg-lon per pixel is constant 360/n_px;
    deg-lat per pixel is (360/n_px)·cos(lat) (the exact inverse-mercator
    derivative), so the two scales come out near-isotropic — mercator
    is conformal — but not identical, exactly like the reference's
    per-axis series approach."""
    from ..functions.spatial import meters_per_degree

    n_px = (1 << z) * TILE_PX
    yn = (tile_y + 0.5) * TILE_PX / n_px  # tile-center in normalized y
    lat = math.degrees(math.atan(math.sinh(math.pi * (1.0 - 2.0 * yn))))
    m_lon, m_lat = meters_per_degree(lat)
    deg_per_px = 360.0 / n_px
    sx = m_lon * deg_per_px
    sy = m_lat * deg_per_px * math.cos(math.radians(lat))
    return sx, sy


def kernel_halo(kernel: str, params: dict | None = None) -> int:
    """Resolve a kernel's required halo depth for the given params —
    the analog of the reference's per-algorithm map_overlap depth rules
    (reference core/tile_processor.py:207-383). Halos are capped just
    under TILE_PX (the explode_to_tiles 8-neighbour bound); kernels
    whose support exceeds that run coarsened via the multiscale
    overview path instead (reference Constants.MAX_DEPTH analogue)."""
    _, spec = KERNELS[kernel]
    h = spec(params or {}) if callable(spec) else int(spec)
    return min(int(h), TILE_PX - 1)


def tile_kernel(
    points: DataFrame,
    z: int,
    kernel: str = "hillshade",
    halo: int | None = None,
    weight_col: str | None = None,
    log_scale: bool = True,
    skip_empty_core: bool = False,
    fill_surface=None,
    metric_scale: bool = False,
    **kernel_params,
) -> DataFrame:
    """Rasterize + stencil: one row per tile (z, x, y, result 256²).

    metric_scale=True injects per-tile (m/px x, m/px y) pixel scales
    into the kernel (METRIC_SCALE_KERNELS only) so gradients and ray
    distances are metric — the reference's geographic-CRS handling
    (reference core/tile_processor.py:910-932). Like the reference,
    the scales are a per-tile center-latitude scalar, so metric
    outputs are exactly seam-free in x but only approximately so
    across y tile boundaries (adjacent tile rows differ by the
    latitude step's cos factor — the documented approximation).

    The grouped-map UDF receives the halo-expanded grid, applies the
    kernel, and crops the core — seam-free by the same construction as
    the reference's map_overlap/tile pipeline (test-enforced: tiled
    output == whole-raster output on the core, the reference's
    tile-stability pattern tests/test_visual_saliency_tile_stability.py).

    skip_empty_core (A17): drop tiles that own no points (only halo
    spill-ins) before running the kernel.

    fill_surface (A21): a void_fill.VoidFillSurface — zero-count pixels
    in fillable regions take their broadcast membrane value before
    log_scale + kernel (applied to the full halo-expanded grid, so the
    fill is seam-free like everything else).
    """
    fn_kernel, _ = KERNELS[kernel]
    if metric_scale:
        if kernel not in METRIC_SCALE_KERNELS:
            raise ValueError(
                f"kernel {kernel!r} does not consume metric pixel scales; "
                f"supported: {sorted(METRIC_SCALE_KERNELS)}"
            )
        if "pixel_scale" in kernel_params:
            raise ValueError("pass either metric_scale=True or an explicit pixel_scale, not both")
    if skip_empty_core and fill_surface is not None:
        # the skip path returns empty for groups holding only halo
        # spill-ins, and _synth_filled_tiles excludes those tiles as
        # "present" — the membrane would silently never materialize
        # for exactly the tiles whose window holds only neighbors'
        # points. The combination is contradictory (skip wants to drop
        # sparse tiles, fill wants to repair them), so refuse it.
        raise ValueError("skip_empty_core=True cannot be combined with fill_surface")
    h = kernel_halo(kernel, kernel_params) if halo is None else halo
    pts = _packed_tiles(points, z, h, weight_col)
    if skip_empty_core:
        pts = _with_core_flag(pts)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if skip_empty_core:
            if not pdf[_CORE_FLAG].to_numpy().any():
                return pd.DataFrame(
                    {
                        "z": pd.Series(dtype="int32"),
                        "x": pd.Series(dtype="int64"),
                        "y": pd.Series(dtype="int64"),
                        "result": pd.Series(dtype="object"),
                    }
                )
            pdf = pdf.drop(columns=[_CORE_FLAG])
        tk = int(pdf["_tk"].iloc[0])
        grid = _accumulate_grid(pdf, z, h, weight_col)
        if fill_surface is not None:
            grid = fill_surface.apply(grid, tk >> 32, tk & _MASK32, z, h)
        if log_scale:
            grid = np.log1p(grid)
        params = kernel_params
        if metric_scale:
            params = dict(kernel_params, pixel_scale=tile_pixel_scales(tk & _MASK32, z))
        out = fn_kernel(grid, **params)
        core = out[h : h + TILE_PX, h : h + TILE_PX] if h else out
        return pd.DataFrame(
            {
                "z": [z],
                "x": [tk >> 32],
                "y": [tk & _MASK32],
                "result": [core.ravel()],
            }
        )

    schema = "z int, x long, y long, result array<double>"
    out = pts.groupBy("_tk").applyInPandas(fn, schema)
    if fill_surface is None:
        return out
    return out.unionByName(
        _synth_filled_tiles(
            points, pts, z, h, fill_surface, log_scale, metric_scale,
            fn_kernel, kernel_params, schema, stats=False,
        )
    )


def _synth_filled_tiles(
    points, pts, z, h, fill_surface, log_scale, metric_scale,
    fn_kernel, kernel_params, schema, stats, lit_threshold=0.75,
):
    """Kernel output for fillable tiles that own NO points (core or
    halo): such tiles have no shuffle rows, so no group ever forms and
    the membrane would silently not materialize there (whole-tile
    enclosed voids). Candidates come from the broadcast surface
    (driver-enumerated, bounded), minus the tiles the point path
    already produced — deterministic, partition-independent."""
    spark = points.sparkSession
    tks = fill_surface.fillable_tile_keys(z)
    if tks.size == 0:
        return spark.createDataFrame([], schema)
    cand = spark.createDataFrame(pd.DataFrame({"_tk": tks}))
    present = pts.select("_tk").distinct()
    missing = cand.join(present, "_tk", "left_anti").repartition(
        max(2, spark.sparkContext.defaultParallelism)
    )

    def fn_missing(it):
        for pdf in it:
            cols: dict[str, list] = (
                {"z": [], "x": [], "y": [], "shade_sum": [], "shade_max": [], "lit_pixels": []}
                if stats
                else {"z": [], "x": [], "y": [], "result": []}
            )
            for tk in pdf["_tk"].astype("int64"):
                tk = int(tk)
                tx, ty = tk >> 32, tk & _MASK32
                w_ = TILE_PX + 2 * h
                grid = fill_surface.apply(np.zeros((w_, w_)), tx, ty, z, h)
                if log_scale:
                    grid = np.log1p(grid)
                params = kernel_params
                if metric_scale:
                    params = dict(kernel_params, pixel_scale=tile_pixel_scales(ty, z))
                o = fn_kernel(grid, **params)
                core = o[h : h + TILE_PX, h : h + TILE_PX] if h else o
                cols["z"].append(z)
                cols["x"].append(tx)
                cols["y"].append(ty)
                if stats:
                    cols["shade_sum"].append(float(core.sum(dtype=np.float64)))
                    cols["shade_max"].append(float(core.max()))
                    cols["lit_pixels"].append(int((core > lit_threshold).sum()))
                else:
                    cols["result"].append(core.ravel())
            yield pd.DataFrame(cols)

    return missing.mapInPandas(fn_missing, schema)


def tile_kernel_stats(
    points: DataFrame,
    z: int,
    kernel: str = "hillshade",
    halo: int | None = None,
    weight_col: str | None = None,
    log_scale: bool = True,
    lit_threshold: float = 0.75,
    fill_surface=None,
    metric_scale: bool = False,
    grid_dtype=None,
    **kernel_params,
) -> DataFrame:
    """Like tile_kernel but reduces each tile to scalar stats inside
    the UDF (sum / mean / lit-pixel count / max), avoiding the 65k-
    element array transfer + interpreted fold when only summaries are
    consumed — the reference's quantize-on-GPU-before-transfer
    discipline (reference core/tile_processor.py:983-996).

    grid_dtype: the accumulation/kernel dtype — float32 by default
    (the production bandwidth choice; stats never leave the UDF).
    The ORACLE-ONLY alternative is float64: the cross-engine hash
    gate's DuckDB twin computes in float64, and float32 kernel noise
    (~1e-7 relative) would leak above the quantized-sum tolerance;
    production renders never need it (cf. normalize_acctbal's
    oracle-only exact percentile)."""
    fn_kernel, _ = KERNELS[kernel]
    if metric_scale:
        if kernel not in METRIC_SCALE_KERNELS:
            raise ValueError(
                f"kernel {kernel!r} does not consume metric pixel scales; "
                f"supported: {sorted(METRIC_SCALE_KERNELS)}"
            )
        if "pixel_scale" in kernel_params:
            raise ValueError("pass either metric_scale=True or an explicit pixel_scale, not both")
    h = kernel_halo(kernel, kernel_params) if halo is None else halo
    pts = _packed_tiles(points, z, h, weight_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # float32 end-to-end: the stats path never leaves the UDF, so
        # halving memory traffic is free accuracy-wise (sums are done
        # in float64) — the reference's quantize-before-transfer
        # discipline applied to bandwidth instead of PCIe
        tk = int(pdf["_tk"].iloc[0])
        dt = np.float32 if grid_dtype is None else grid_dtype
        grid = _accumulate_grid(pdf, z, h, weight_col, dtype=dt)
        if fill_surface is not None:
            grid = fill_surface.apply(grid, tk >> 32, tk & _MASK32, z, h).astype(dt)
        if log_scale:
            grid = np.log1p(grid)
        params = kernel_params
        if metric_scale:
            params = dict(kernel_params, pixel_scale=tile_pixel_scales(tk & _MASK32, z))
        out = fn_kernel(grid, **params)
        core = out[h : h + TILE_PX, h : h + TILE_PX] if h else out
        return pd.DataFrame(
            {
                "z": [z],
                "x": [tk >> 32],
                "y": [tk & _MASK32],
                "shade_sum": [float(core.sum(dtype=np.float64))],
                "shade_max": [float(core.max())],
                "lit_pixels": [int((core > lit_threshold).sum())],
            }
        )

    schema = "z int, x long, y long, shade_sum double, shade_max double, lit_pixels long"
    out = pts.groupBy("_tk").applyInPandas(fn, schema)
    if fill_surface is None:
        return out
    return out.unionByName(
        _synth_filled_tiles(
            points, pts, z, h, fill_surface, log_scale, metric_scale,
            fn_kernel, kernel_params, schema, stats=True, lit_threshold=lit_threshold,
        )
    )


# ------------------- halo-contract census operators ------------------
# These two reduce the REAL halo machinery (explode_to_tiles -> packed
# shuffle -> _accumulate_grid, i.e. A3+A5's transport layer) to exact
# integers, so the driver's DuckDB hash gate can check the halo
# exchange end-to-end — the per-kernel float math stays on the pytest
# tiled==whole matrix (reference analog: the tile-stability tests,
# reference tests/test_visual_saliency_tile_stability.py:6-29).

def tile_halo_census(points: DataFrame, z: int, halo: int) -> DataFrame:
    """Per tile: points in the halo-expanded window vs points owned.

    (z, x, y, win_pts, core_pts) — win_pts counts every point whose
    global pixel lands in [x*256-halo, (x+1)*256+halo) × same-for-y
    (x wrapped at the antimeridian, y clipped at the world edge);
    core_pts counts the owned points. Both exact BIGINTs.
    """
    pts = _packed_tiles(points, z, halo, None)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = _accumulate_grid(pdf, z, halo, None)
        core = grid[halo : halo + TILE_PX, halo : halo + TILE_PX] if halo else grid
        return pd.DataFrame(
            {
                "z": [z],
                "x": [int(pdf["_tk"].iloc[0]) >> 32],
                "y": [int(pdf["_tk"].iloc[0]) & _MASK32],
                "win_pts": [int(grid.sum())],
                "core_pts": [int(core.sum())],
            }
        )

    return pts.groupBy("_tk").applyInPandas(fn, "z int, x long, y long, win_pts long, core_pts long")


def tile_weighted_census(
    points: DataFrame, z: int, halo: int, weight_col: str
) -> DataFrame:
    """Per tile: halo-window and core SUMS of an integer weight column
    — puts the weighted-rasterization path (sorted-order float
    accumulation, _accumulate_grid's weight branch) under the exact
    hash gate: integer-valued weights accumulate exactly in float64,
    so the sums cast to BIGINT bit-stably on any engine."""
    pts = _packed_tiles(points, z, halo, weight_col)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = _accumulate_grid(pdf, z, halo, weight_col)
        core = grid[halo : halo + TILE_PX, halo : halo + TILE_PX] if halo else grid
        return pd.DataFrame(
            {
                "z": [z],
                "x": [int(pdf["_tk"].iloc[0]) >> 32],
                "y": [int(pdf["_tk"].iloc[0]) & _MASK32],
                "win_weight": [int(grid.sum())],
                "core_weight": [int(core.sum())],
            }
        )

    return pts.groupBy("_tk").applyInPandas(
        fn, "z int, x long, y long, win_weight long, core_weight long"
    )


def tile_box_total(points: DataFrame, z: int, r: int) -> DataFrame:
    """Per tile: Σ over core pixels of the (2r+1)² window COUNT total —
    the multiscale box filter's numerator in the exact integer domain
    (the box MEAN is this divided by (2r+1)²; division is the one step
    that can't cross the engine boundary bit-exactly, so the oracle
    checks the window sums). Exercises rasterize-with-halo + SAT
    windowing end-to-end.
    """
    from .multiscale import np_box_total

    pts = _packed_tiles(points, z, r, None)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grid = _accumulate_grid(pdf, z, r, None)
        tot = np_box_total(grid, r)[r : r + TILE_PX, r : r + TILE_PX]
        core = grid[r : r + TILE_PX, r : r + TILE_PX]
        return pd.DataFrame(
            {
                "z": [z],
                "x": [int(pdf["_tk"].iloc[0]) >> 32],
                "y": [int(pdf["_tk"].iloc[0]) & _MASK32],
                "box_total": [int(tot.sum())],
                "core_pts": [int(core.sum())],
            }
        )

    return pts.groupBy("_tk").applyInPandas(fn, "z int, x long, y long, box_total long, core_pts long")


# ----------------------------- LOD pyramid ---------------------------

def pyramid_level(tiles: DataFrame, agg: str = "sum") -> DataFrame:
    """One LOD step: (z, x, y, grid 256²) -> (z-1, x>>1, y>>1, grid 256²).

    Children downsample 2x (2x2-block sum or mean) into their parent
    quadrant — the reference's COG overview build re-expressed as a
    groupBy(parent) aggregation (reference io/cog_builder.py overviews;
    NaN-aware coarsen algorithms/_nan_utils.py:604-668).
    """
    half = TILE_PX // 2

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = np.zeros((TILE_PX, TILE_PX), dtype=np.float64)
        z = int(pdf["z"].iloc[0]) - 1
        px_ = int(pdf["x"].iloc[0]) >> 1
        py_ = int(pdf["y"].iloc[0]) >> 1
        for cx_, cy_, buf in zip(pdf["x"], pdf["y"], pdf["grid"]):
            g = unpack_grid(buf, TILE_PX)
            d = g.reshape(half, 2, half, 2)
            d = d.sum(axis=(1, 3)) if agg == "sum" else d.mean(axis=(1, 3))
            qx = (int(cx_) & 1) * half
            qy = (int(cy_) & 1) * half
            parent[qy : qy + half, qx : qx + half] = d
        return pd.DataFrame({"z": [z], "x": [px_], "y": [py_], "grid": [pack_grid(parent)]})

    schema = "z int, x long, y long, grid binary"
    return (
        tiles.withColumns({"_px": F.shiftright(F.col("x"), 1), "_py": F.shiftright(F.col("y"), 1)})
        .groupBy("_px", "_py")
        .applyInPandas(fn, schema)
    )


def build_pyramid(tiles: DataFrame, z_from: int, z_to: int, agg: str = "sum") -> DataFrame:
    """Full LOD pyramid z_from down to z_to (inclusive), unioned."""
    levels = [tiles]
    cur = tiles
    for _ in range(z_from - z_to):
        cur = pyramid_level(cur, agg=agg)
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
