"""Generic spatial mode: multi-radius integration for ANY registered
kernel, with the reference's large-radius-from-overview rewrite.

The reference gives every spatial-capable algorithm the same
machinery (reference algorithms/_nan_utils.py: multiscale_response_
fields + coarse_large_radius_response; per-radius response via the
algorithm's own radius param, or a sigma = radius/2 pre-smooth for
radius-less kernels, _nan_utils.py:527-547):

- small radii: response computed at full resolution with a bounded
  halo;
- large radii (halo would blow the tile budget): response computed on
  a 2^s-decimated overview — where the radius is r >> s, so the halo
  is bounded again — then bilinearly upsampled;
- the per-radius responses combine with the shared weights/agg rule.

Spark shape (the same split multiscale.multiscale_usm pioneered for
box means, generalized to every kernel):

- fine tiles rasterized once with halo = max small-radius support; the
  finish UDF computes ALL small-radius responses from that one grid;
- one coarse LOD level per decimation exponent (independent
  rasterization at z-s = exact block sums), kernel run per coarse
  tile, broadcast-joined back on the ancestor key, upsampled in the
  finish UDF. Catalyst broadcasts the coarse side (4^s× smaller).

No halo ever exceeds the tile size and no shuffle grows with the
radius — the same scaling law as the reference's rewrite (its
fractal_anomaly went "~hours -> minutes" on this split,
reference ARCHITECTURE.md:556-560).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spatial import auto_spatial_profile
from ..functions.tiles import TILE_PX
from .multiscale import coarse_sample_coords, np_bilinear_sample
from .np_filters import nan_gaussian, restore_nan
from .np_kernels import _halo_gauss
from .tile_kernels import KERNELS, kernel_halo, pack_grid, rasterize_tiles, unpack_grid

# kernels whose response takes the radius as a named param; everything
# else uses the pre-smooth convention (sigma = radius/2). specular's
# radius drives its roughness WINDOW — the reference keeps specular's
# per-radius loop bespoke for exactly this (the coarse path then runs
# with the 2^s-rescaled window, reference _impl_specular.py:146-191)
# instead of the generic pre-smooth.
SPATIAL_RADIUS_KW: dict[str, str] = {
    "openness": "max_distance",
    "ambient_occlusion": "radius",
    "blur": "scale",
    "specular": "roughness_scale",
}

# intrinsically multi-scale kernels: their result is undefined at a
# single external radius (they carry their own scales/radii banks), so
# radius-driven spatial mode does not apply — the reference's same
# classification (reference algorithms/common/spatial_mode.py:35-53,
# MULTISCALE_REQUIRED_ALGOS)
MULTISCALE_INTRINSIC = frozenset({
    "multiscale_terrain", "visual_saliency", "scale_space_surprise",
    "scale_drift", "phase_congruency", "fractal_anomaly",
})


def np_spatial_response(field: np.ndarray, kernel: str, radius: float, **params) -> np.ndarray:
    """One radius' response on a plain 2-D field (NumPy; used by both
    the Spark UDFs and the world-oracle tests)."""
    fn, _ = KERNELS[kernel]
    kw = SPATIAL_RADIUS_KW.get(kernel)
    if kw is not None:
        p = dict(params)
        p[kw] = int(round(radius)) if kw == "max_distance" else float(radius)
        return fn(field, **p)
    if radius <= 1.0:
        return fn(field, **params)
    sm, nan_mask = nan_gaussian(field, max(0.5, float(radius) / 2.0))
    return fn(restore_nan(sm, nan_mask), **params)


def spatial_response_halo(kernel: str, radius: float, params: dict) -> int:
    """Halo support of one radius' response (smoothing support + the
    kernel's own halo rule)."""
    kw = SPATIAL_RADIUS_KW.get(kernel)
    if kw is not None:
        p = dict(params)
        p[kw] = int(round(radius)) if kw == "max_distance" else float(radius)
        return kernel_halo(kernel, p)
    base = kernel_halo(kernel, params)
    if radius <= 1.0:
        return base
    return _halo_gauss(float(radius) / 2.0) + base


def _combine(responses: list[tuple[float, np.ndarray]], agg: str) -> np.ndarray:
    """Per-pixel combine across radii (reference _nan_utils.py:182-213)."""
    if agg == "mean":
        tot = sum(w for w, _ in responses)
        out = np.zeros_like(responses[0][1])
        for w, r in responses:
            out += (w / tot) * r
        return out
    if agg == "sum":
        out = np.zeros_like(responses[0][1])
        for _, r in responses:
            out += r
        return out
    op = np.minimum if agg == "min" else np.maximum
    out = responses[0][1]
    for _, r in responses[1:]:
        out = op(out, r)
    return out


def _plan_radii(
    radii: list[float], threshold: float, max_s: int | None = None
) -> tuple[list[float], dict[float, int]]:
    """(small, {radius: decimation exponent}) — same rule as
    multiscale._plan_scales (reference radius->factor heuristic).
    ``max_s`` caps the decimation so the coarse zoom z-s never goes
    negative at low zooms (a capped level just runs with a larger,
    still halo-bounded coarse radius)."""
    small, large = [], {}
    for r in sorted(radii):
        if r <= threshold:
            small.append(r)
        else:
            s = 0
            while (r / (1 << (s + 1))) > threshold / 2 and (1 << (s + 1)) <= TILE_PX:
                s += 1
            if max_s is not None:
                s = min(s, max_s)
            large[r] = s
    return small, large


def spatial_kernel(
    points: DataFrame,
    z: int,
    kernel: str,
    radii: tuple[float, ...] | None = None,
    weights: tuple[float, ...] | None = None,
    agg: str = "mean",
    overview_threshold: float = 24.0,
    log_scale: bool = True,
    output: str = "stats",
    **kernel_params,
) -> DataFrame:
    """Multi-radius spatial-mode run of any registered kernel at zoom
    z: per-tile combined response (output='grid': (z,x,y,result 256²);
    'stats': (z,x,y,resp_sum,resp_min,resp_max)). agg='stack' emits the
    raw per-radius responses as one row per (tile, radius) with a
    ``radius`` column instead of combining — the reference's multi-band
    stack output as rows (reference _nan_utils.py:182-213,
    core/dask_processor.py:1594-1599)."""
    if agg not in ("mean", "min", "max", "sum", "stack"):
        raise ValueError(f"unknown agg {agg!r} (mean/min/max/sum/stack)")
    if kernel not in KERNELS:
        raise KeyError(kernel)
    if kernel in MULTISCALE_INTRINSIC:
        raise ValueError(
            f"{kernel!r} is intrinsically multi-scale (it carries its own "
            f"scales/radii params) — run it via tile_kernel with those params "
            f"instead of radius-driven spatial mode"
        )
    if radii is None:
        auto_r, auto_w = auto_spatial_profile(float((1 << z) * TILE_PX))
        radii = tuple(float(r) for r in auto_r)
        if weights is None:
            weights = tuple(auto_w)
    radii = [float(r) for r in radii]
    if weights is not None and len(weights) != len(radii):
        raise ValueError(
            f"{len(weights)} weights for {len(radii)} radii — counts must match"
        )  # silent uniform fallback would render something the user did not ask for
    if weights is None:
        weights = [1.0 / len(radii)] * len(radii)
    w_by_r = dict(zip(radii, weights))

    small, large = _plan_radii(radii, overview_threshold, max_s=max(0, z))
    rkey = {r: f"r{i}" for i, r in enumerate(sorted(radii))}  # SQL-safe column token per radius
    halo = max((spatial_response_halo(kernel, r, kernel_params) for r in small), default=0)
    if halo > TILE_PX - 1:
        # clamping would silently truncate the kernel's support and
        # seam every tile edge; the caller must lower the overview
        # threshold (routing the radius via the coarse path) or shrink
        # the kernel's own support params
        raise ValueError(
            f"fine-path halo {halo} exceeds the tile budget {TILE_PX - 1} for kernel "
            f"{kernel!r} at radii {small}; lower overview_threshold or the kernel's support"
        )
    fine = rasterize_tiles(points, z, halo=halo)

    # one coarse response level per decimation exponent
    joined = fine
    coarse_cols: dict[float, str] = {}
    for s in sorted({v for v in large.values()}):
        rcs = [(r, r / (1 << s)) for r, rs in large.items() if rs == s]
        h_c = min(
            max(spatial_response_halo(kernel, rc, kernel_params) for _, rc in rcs) + 1,
            TILE_PX - 1,
        )
        coarse = rasterize_tiles(points, z - s, halo=h_c)

        def mk_resp(rcs=tuple(rcs), h_c=h_c, s=s):
            def fn(pdf: pd.DataFrame) -> pd.DataFrame:
                out = {"x": pdf["x"], "y": pdf["y"]}
                for r, rc in rcs:
                    rows = []
                    for g in pdf["grid"]:
                        gg = unpack_grid(g, TILE_PX + 2 * h_c)
                        # coarse counts are block SUMS; the field is the
                        # block-mean density (then the display transform)
                        gg = gg * 0.25 ** s
                        if log_scale:
                            gg = np.log1p(gg)
                        resp = np_spatial_response(gg, kernel, rc, **kernel_params)
                        rows.append(
                            pack_grid(resp[h_c - 1 : h_c + TILE_PX + 1, h_c - 1 : h_c + TILE_PX + 1])
                        )
                    out[rkey[r]] = rows
                return pd.DataFrame(out)

            return fn

        schema = "x long, y long, " + ", ".join(f"{rkey[r]} binary" for r, _ in rcs)
        resp_df = (
            coarse.select("x", "y", "grid")
            .repartition(max(2, points.sparkSession.sparkContext.defaultParallelism), "x", "y")
            .groupBy("x", "y")
            .applyInPandas(mk_resp(), schema)
        )
        ren = resp_df.select(
            F.col("x").alias(f"_cx{s}"), F.col("y").alias(f"_cy{s}"),
            *[F.col(rkey[r]).alias(f"resp{s}_{rkey[r]}") for r, _ in rcs],
        )
        joined = joined.join(
            F.broadcast(ren),
            (F.shiftright(joined["x"], s) == ren[f"_cx{s}"])
            & (F.shiftright(joined["y"], s) == ren[f"_cy{s}"]),
            "left",
        ).drop(f"_cx{s}", f"_cy{s}")
        for r, rs in large.items():
            if rs == s:
                coarse_cols[r] = f"resp{s}_{rkey[r]}"

    large_items = sorted(large.items())

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = {k: [] for k in ("z", "x", "y")}
        if agg == "stack":
            out_rows["radius"] = []
        payload = []
        for _, row in pdf.iterrows():
            g = unpack_grid(row["grid"], TILE_PX + 2 * halo)
            if log_scale:
                g = np.log1p(g)
            responses: list[tuple[float, np.ndarray]] = []
            rads: list[float] = []
            for r in small:
                resp = np_spatial_response(g, kernel, r, **kernel_params)
                core = resp[halo : halo + TILE_PX, halo : halo + TILE_PX] if halo else resp
                responses.append((w_by_r[r], core))
                rads.append(r)
            for r, s in large_items:
                cg = row[coarse_cols[r]]
                if cg is None:
                    continue
                cgrid = unpack_grid(cg, TILE_PX + 2)
                cy, cx = coarse_sample_coords(int(row["x"]), int(row["y"]), s)
                up = np_bilinear_sample(cgrid, cy[:, None], cx[None, :])
                responses.append((w_by_r[r], up))
                rads.append(r)
            if agg == "stack":
                for r, (_, resp) in zip(rads, responses):
                    out_rows["z"].append(z)
                    out_rows["x"].append(int(row["x"]))
                    out_rows["y"].append(int(row["y"]))
                    out_rows["radius"].append(float(r))
                    payload.append(resp)
                continue
            combined = _combine(responses, agg)
            out_rows["z"].append(z)
            out_rows["x"].append(int(row["x"]))
            out_rows["y"].append(int(row["y"]))
            payload.append(combined)
        if output == "grid":
            return pd.DataFrame({**out_rows, "result": [c.ravel() for c in payload]})
        return pd.DataFrame(
            {
                **out_rows,
                "resp_sum": [float(c.sum()) for c in payload],
                "resp_min": [float(c.min()) for c in payload],
                "resp_max": [float(c.max()) for c in payload],
            }
        )

    rad_col = "radius double, " if agg == "stack" else ""
    schema = (
        f"z int, x long, y long, {rad_col}result array<double>"
        if output == "grid"
        else f"z int, x long, y long, {rad_col}resp_sum double, resp_min double, resp_max double"
    )
    return joined.mapInPandas(lambda it: (finish(pdf) for pdf in it), schema)
