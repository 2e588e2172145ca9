"""Multiscale unsharp mask with the large-radius-from-overview
rewrite — the reference's signature optimization re-expressed in
Spark (SURVEY.md §4.1 row 1).

The reference computes ``Σᵢ wᵢ·(z − mean_rᵢ(z))`` over box means
(reference algorithms/_impl_topousm_fast.py:49-100) and rewrites any
radius whose halo would exceed the tile budget to run on one global
decimated overview, bilinearly sampled back per block — seam-free and
halo-free (reference _impl_topousm_fast.py:103-186,
algorithms/_nan_utils.py:328-524).

Here the same split:

- **small radii** (r <= overview_threshold): summed-area-table box
  means computed in the per-tile grouped-map UDF on a halo-expanded
  grid (halo = max small radius, so every core pixel sees its full
  window — no seams by construction);
- **large radii**: a coarse LOD level (2^s-decimated tiles built by
  independent rasterization at z−s — which equals an exact 2^s-block
  mean of the fine density, so no cross-level drift) is box-mean
  smoothed per coarse tile, then **broadcast-joined** back to the fine
  tiles on the ancestor key and bilinearly upsampled inside the UDF.
  Catalyst broadcasts the coarse level because it is 4^s× smaller —
  exactly the pre-aggregate + broadcast-join shape SURVEY.md maps the
  reference rewrite onto.

The field is the raw per-pixel point count (linear), so the coarse
level is bit-exactly the block mean of the fine level; display
transforms happen after the USM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import TILE_PX
from .tile_kernels import pack_grid, rasterize_tiles, unpack_grid


def np_box_total(g: np.ndarray, r: int) -> np.ndarray:
    """(2r+1)² window SUM via summed-area table. Over integer-valued
    counts this is exact in float64 (cumsums and differences of
    integers < 2^53) — the hash-oracle queries rely on that.

    Valid for pixels whose window lies inside g — callers guarantee a
    halo >= r around every pixel they keep; edge windows clip.
    """
    h, w = g.shape
    s = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(g, axis=0, out=s[1:, 1:])
    np.cumsum(s[1:, 1:], axis=1, out=s[1:, 1:])
    y0 = np.clip(np.arange(h) - r, 0, h)
    y1 = np.clip(np.arange(h) + r + 1, 0, h)
    x0 = np.clip(np.arange(w) - r, 0, w)
    x1 = np.clip(np.arange(w) + r + 1, 0, w)
    return s[y1[:, None], x1[None, :]] - s[y0[:, None], x1[None, :]] \
        - s[y1[:, None], x0[None, :]] + s[y0[:, None], x0[None, :]]


def np_box_mean(g: np.ndarray, r: int) -> np.ndarray:
    """(2r+1)² box mean, constant-area (interior) normalization."""
    return np_box_total(g, r) / float((2 * r + 1) ** 2)


def np_bilinear_sample(coarse: np.ndarray, cy: np.ndarray, cx: np.ndarray) -> np.ndarray:
    """Bilinear sample of `coarse` at fractional (cy, cx) grids —
    canonical clamped implementation (identical results in-range; the
    previous local copy extrapolated for out-of-range coordinates
    because it took fractional parts before clipping)."""
    from .np_filters import bilinear_sample

    return bilinear_sample(coarse, cy, cx)


def coarse_sample_coords(tile_x: int, tile_y: int, s: int) -> tuple[np.ndarray, np.ndarray]:
    """Fine-pixel-center coordinates of tile (tile_x, tile_y) in its
    2^s-coarse ancestor's local grid (+1 for the 1-px crop ring the
    coarse response carries). THE alignment contract between the
    overview path's build and sample sides — shared by multiscale_usm,
    spatial_kernel, and the world-oracle tests so it cannot drift."""
    p = np.arange(TILE_PX)
    gx = tile_x * TILE_PX + p
    gy = tile_y * TILE_PX + p
    cx = (gx + 0.5) / (1 << s) - 0.5 - (tile_x >> s) * TILE_PX + 1.0
    cy = (gy + 0.5) / (1 << s) - 0.5 - (tile_y >> s) * TILE_PX + 1.0
    return cy, cx


def _plan_scales(
    radii: list[int], threshold: int, max_s: int | None = None
) -> tuple[list[int], dict[int, int]]:
    """Split radii into (small, {radius: s}) where s is the overview
    decimation exponent chosen so the effective coarse radius lands in
    (threshold/2, threshold] — the reference's radius→factor heuristic
    (reference algorithms/_nan_utils.py:555-601), deterministic and
    shape-independent. max_s caps s (callers pass the zoom, so the
    coarse level z−s never goes negative at low zooms)."""
    small, large = [], {}
    for r in sorted(radii):
        if r <= threshold:
            small.append(r)
        else:
            s = 0
            while (
                (r >> (s + 1)) > threshold // 2
                and (1 << (s + 1)) <= TILE_PX
                and (max_s is None or s + 1 <= max_s)
            ):
                s += 1
            large[r] = s
    return small, large


def multiscale_usm(
    points: DataFrame,
    z: int,
    radii: tuple[int, ...] | None = (2, 8, 32, 128),
    weights: tuple[float, ...] | None = None,
    overview_threshold: int = 16,
    output: str = "stats",
    agg: str = "mean",
) -> DataFrame:
    """Per-tile multi-scale response combine at zoom z.

    agg='mean' (default): Σ wᵢ (density − box_meanᵢ(density)) — the
    reference's weighted mean; 'min'/'max'/'sum' combine the
    per-radius responses elementwise instead; 'stack' emits the RAW
    (unweighted) per-radius responses as one row per (tile, radius)
    with a ``radius`` column — the row-wise re-expression of the
    reference's multi-band (C,H,W) stack output (reference
    algorithms/_nan_utils.py:182-213 combine modes,
    core/dask_processor.py:1594-1599; SURVEY.md §1.2 maps the stack to
    per-scale rows).

    output='stats' → (z, x, y[, radius], usm_sum, usm_min, usm_max);
    output='grid'  → (z, x, y[, radius], usm: array<double> 256²).
    """
    if agg not in ("mean", "min", "max", "sum", "stack"):
        raise ValueError(f"unknown agg {agg!r} (mean/min/max/sum/stack)")  # fail at plan time, not in executors
    if radii is None:
        # the shared size-aware auto rule (reference
        # algorithms/common/spatial_mode.py:21-101): the world raster
        # at zoom z is the DEM, short side 2^z * 256 px
        from ..functions.spatial import auto_spatial_profile

        radii_l, weights_l = auto_spatial_profile(float((1 << z) * TILE_PX))
        radii = tuple(radii_l)
        if weights is None:
            weights = tuple(weights_l)
    if weights is None:
        weights = tuple(1.0 / len(radii) for _ in radii)
    w_by_r = dict(zip(radii, weights))
    small, large = _plan_scales(list(radii), overview_threshold, max_s=z)
    halo = max(small) if small else 0

    fine = rasterize_tiles(points, z, halo=halo)  # (z,x,y,grid (256+2h)²)

    # one smoothed coarse level per distinct decimation exponent
    joined = fine
    coarse_cols: dict[int, str] = {}
    for s in sorted({s for s in large.values()}):
        r_cs = [r >> s for r, rs in large.items() if rs == s]
        # the max_s=z cap can leave a coarse radius > 255 at extreme
        # (low-zoom, huge-radius) configs; clamp like spatial_mode does
        # — the SAT clips edge windows, so the clamped run is
        # approximate only in that degenerate regime instead of raising
        h_c = min(max(r_cs) + 1, TILE_PX - 1)
        coarse = rasterize_tiles(points, z - s, halo=h_c)

        def mk_smooth(r_cs=tuple(r_cs), h_c=h_c, s=s):
            def fn(pdf: pd.DataFrame) -> pd.DataFrame:
                out = {"x": pdf["x"], "y": pdf["y"]}
                for r_c in r_cs:
                    rows = []
                    for g in pdf["grid"]:
                        gg = unpack_grid(g, TILE_PX + 2 * h_c)
                        # coarse counts are block SUMS of the fine
                        # grid; the field is the block MEAN
                        gg = gg * 0.25 ** s  # unpack_grid views are read-only
                        sm = np_box_mean(gg, r_c)
                        rows.append(pack_grid(sm[h_c - 1 : h_c + TILE_PX + 1, h_c - 1 : h_c + TILE_PX + 1]))
                    out[f"sm_{r_c}"] = rows
                return pd.DataFrame(out)
            return fn

        sm_schema = "x long, y long, " + ", ".join(f"sm_{rc} binary" for rc in r_cs)
        smooth_fn = mk_smooth()
        smoothed = coarse.select("x", "y", "grid").repartition(
            max(2, points.sparkSession.sparkContext.defaultParallelism), "x", "y"
        ).groupBy("x", "y").applyInPandas(smooth_fn, sm_schema)
        ren = smoothed.select(
            F.col("x").alias(f"_cx{s}"), F.col("y").alias(f"_cy{s}"),
            *[F.col(f"sm_{rc}").alias(f"sm{s}_{rc}") for rc in r_cs],
        )
        joined = joined.join(
            F.broadcast(ren),
            (F.shiftright(joined["x"], s) == ren[f"_cx{s}"])
            & (F.shiftright(joined["y"], s) == ren[f"_cy{s}"]),
            "left",
        ).drop(f"_cx{s}", f"_cy{s}")
        for r, rs in large.items():
            if rs == s:
                coarse_cols[r] = f"sm{s}_{r >> s}"

    large_items = sorted(large.items())

    def finish(pdf: pd.DataFrame) -> pd.DataFrame:
        out_rows = {k: [] for k in ("z", "x", "y")}
        if agg == "stack":
            out_rows["radius"] = []
        payload = []
        # precomputed fine-pixel center coordinates per s
        for _, row in pdf.iterrows():
            g = unpack_grid(row["grid"], TILE_PX + 2 * halo)
            core = g[halo : halo + TILE_PX, halo : halo + TILE_PX] if halo else g
            responses = []
            for r in small:
                sm = np_box_mean(g, r)
                smc = sm[halo : halo + TILE_PX, halo : halo + TILE_PX] if halo else sm
                responses.append((r, core - smc))
            for r, s in large_items:
                cg = row[coarse_cols[r]]
                if cg is None:
                    continue
                cgrid = unpack_grid(cg, TILE_PX + 2)
                cy, cx = coarse_sample_coords(int(row["x"]), int(row["y"]), s)
                up = np_bilinear_sample(cgrid, cy[:, None], cx[None, :])
                responses.append((r, core - up))
            # combine modes (reference _nan_utils.py:182-213): weighted
            # mean (default), elementwise min/max/sum over scales, or
            # stack = one output row per (tile, radius), raw response
            if agg == "stack":
                for r, resp in responses:
                    out_rows["z"].append(z)
                    out_rows["x"].append(int(row["x"]))
                    out_rows["y"].append(int(row["y"]))
                    out_rows["radius"].append(float(r))
                    payload.append(resp)
                continue
            usm = np.zeros((TILE_PX, TILE_PX), dtype=np.float64)
            if agg == "mean":
                for r, resp in responses:
                    usm += w_by_r[r] * resp
            elif agg == "sum":
                for _, resp in responses:
                    usm += resp
            elif agg in ("min", "max"):
                op = np.minimum if agg == "min" else np.maximum
                usm = responses[0][1]
                for _, resp in responses[1:]:
                    usm = op(usm, resp)
            else:
                raise ValueError(f"unknown agg {agg!r}")
            out_rows["z"].append(z)
            out_rows["x"].append(int(row["x"]))
            out_rows["y"].append(int(row["y"]))
            payload.append(usm)
        if output == "grid":
            return pd.DataFrame({**out_rows, "usm": [u.ravel() for u in payload]})
        return pd.DataFrame(
            {
                **out_rows,
                "usm_sum": [float(u.sum()) for u in payload],
                "usm_min": [float(u.min()) for u in payload],
                "usm_max": [float(u.max()) for u in payload],
            }
        )

    rad_col = "radius double, " if agg == "stack" else ""
    schema = (
        f"z int, x long, y long, {rad_col}usm array<double>"
        if output == "grid"
        else f"z int, x long, y long, {rad_col}usm_sum double, usm_min double, usm_max double"
    )
    return joined.mapInPandas(lambda it: (finish(pdf) for pdf in it), schema)


def overview_box_total(
    points: DataFrame,
    z: int,
    r: int,
    overview_threshold: int = 16,
) -> DataFrame:
    """The large-radius overview rewrite in the EXACT integer domain —
    the hash-oracle companion of multiscale_usm's coarse path (r3
    verdict #2; reference analog algorithms/_nan_utils.py:328-524).

    Runs the REAL s>=1 machinery end-to-end — _plan_scales radius→
    factor, independent coarse rasterization at z−s with halo, per-
    coarse-tile SAT windowing, the 1-px crop ring, broadcast join on
    the ancestor key, coarse_sample_coords + np_bilinear_sample — but
    in the box-TOTAL domain instead of box-mean: coarse window totals
    are integers, bilinear weights at dyadic pixel-center offsets are
    exact in IEEE-754 (multiples of 2^-(2s+2)), so the per-tile sum of
    upsampled totals ×4^(s+1) is an exact BIGINT on any engine and any
    summation order. Output: (z, x, y, up_total_q, core_pts).
    """
    small, large = _plan_scales([int(r)], overview_threshold, max_s=z)
    if not large:
        raise ValueError(
            f"r={r} <= overview_threshold={overview_threshold} takes the small-radius "
            f"path; this oracle exercises the s>=1 coarse rewrite"
        )
    s = large[int(r)]
    r_c = int(r) >> s
    h_c = min(r_c + 1, TILE_PX - 1)
    fine = rasterize_tiles(points, z, halo=0)
    coarse = rasterize_tiles(points, z - s, halo=h_c)

    def bt_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {"x": pdf["x"], "y": pdf["y"], "bt": []}
        w_ = TILE_PX + 2 * h_c
        for g in pdf["grid"]:
            gg = unpack_grid(g, w_)
            bt = np_box_total(gg, r_c)
            out["bt"].append(pack_grid(bt[h_c - 1 : h_c + TILE_PX + 1, h_c - 1 : h_c + TILE_PX + 1]))
        return pd.DataFrame(out)

    btc = (
        coarse.select("x", "y", "grid")
        .repartition(max(2, points.sparkSession.sparkContext.defaultParallelism), "x", "y")
        .groupBy("x", "y")
        .applyInPandas(bt_fn, "x long, y long, bt binary")
    )
    ren = btc.select(F.col("x").alias("_cx"), F.col("y").alias("_cy"), "bt")
    joined = fine.join(
        F.broadcast(ren),
        (F.shiftright(fine["x"], s) == ren["_cx"]) & (F.shiftright(fine["y"], s) == ren["_cy"]),
        "left",
    )
    qscale = float(1 << (2 * s + 2))

    def finish(it):
        for pdf in it:
            rows = {"z": [], "x": [], "y": [], "up_total_q": [], "core_pts": []}
            for _, row in pdf.iterrows():
                g = unpack_grid(row["grid"], TILE_PX)
                # the ancestor always exists: the fine tile's own points
                # sit inside the ancestor's core
                bt = unpack_grid(row["bt"], TILE_PX + 2)
                cy, cx = coarse_sample_coords(int(row["x"]), int(row["y"]), s)
                up = np_bilinear_sample(bt, cy[:, None], cx[None, :])
                rows["z"].append(z)
                rows["x"].append(int(row["x"]))
                rows["y"].append(int(row["y"]))
                rows["up_total_q"].append(int(round(float(up.sum()) * qscale)))
                rows["core_pts"].append(int(g.sum()))
            yield pd.DataFrame(rows)

    return joined.mapInPandas(finish, "z int, x long, y long, up_total_q long, core_pts long")


def global_abs_p99(tiles_grid_df: DataFrame, value_col: str = "usm", sample_mod: int = 4) -> float:
    """Sampled global |p99| — the stats pre-pass -> broadcast pattern
    (reference algorithms/_norm_stats.py:176-350): sample a stable
    subset of tiles, explode values, one approx-percentile aggregate."""
    sampled = tiles_grid_df.filter(F.pmod(F.xxhash64("x", "y"), F.lit(sample_mod)) == 0)
    return (
        sampled.select(F.explode(value_col).alias("v"))
        .agg(F.percentile_approx(F.abs(F.col("v")), 0.99, 10000).alias("p"))
        .first()["p"]
    )
