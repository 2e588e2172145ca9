"""Global normalization statistics: the reference's per-algorithm
stats pre-pass re-expressed as Spark aggregations.

The reference computes one global (lo, scale) pair per algorithm from
stratified full-resolution windows, then injects it into every block
so normalization is seam-free (reference algorithms/_norm_stats.py:
29-61,301-350, _global_stats.py:123-178). Here the same three pieces:

- ``kernel_global_stats`` — run the kernel on a hash-sampled subset of
  tiles (stats mode: no injected stats), pool an approx percentile
  pair. One aggregate over exploded pixels; the sample is chosen by a
  deterministic tile hash so the pre-pass is reproducible and scans a
  bounded fraction of the data at any scale (A9).
- central-window fallback (A10): when the sample is empty/degenerate
  (sparse SF, all-NoData sample), rerun over the tiles nearest the
  data centroid — the reference's bounded central-crop fallback
  (reference algorithms/_global_stats.py:65-120).
- ``stretch`` (A11): the display-stretch column op mapping
  [lo, lo+scale] -> [0, 1], dark tail clamped, bright tail unclipped
  (reference _global_stats.py:156-178, _normalization.py:22-41).

At 100 TB the pre-pass reads sample_frac of the tiles once and
broadcasts two doubles — the same shape as the reference's
stats-then-stream design, with no second full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tiles import TILE_PX, merc_xy_norm
from .tile_kernels import tile_kernel

# Kernels whose ``global_stats`` kwarg is a pure POST-OUTPUT stretch of
# the same quantity the no-stats run emits raw — the only kernels for
# which pooling the no-stats output's percentiles and injecting them
# back is domain-correct. Everything else interprets global_stats in a
# different domain (frangi: structure-energy c, phase_congruency: noise
# median, tv_decomposition: texture tanh scale, fractal_anomaly:
# (mean, std), multiscale_terrain: pre-gamma detail band), mirroring the
# reference's per-algorithm _norm_stats dispatch (reference
# algorithms/_norm_stats.py:29-61) — those need bespoke raw-stat
# extractors, not this generic path; base kernels (hillshade/slope/...)
# have no global_stats param at all and would TypeError in executors.
# Value: predicate over kernel_params gating mode-dependent outputs.
STATS_STRETCH_KERNELS: dict = {
    "openness": lambda p: True,
    "ambient_occlusion": lambda p: True,
    "structure_tensor": lambda p: str(p.get("st_output", "coherence")).lower() == "coherence",
    "scale_drift": lambda p: str(p.get("drift_output", "magnitude")).lower() == "magnitude",
}


def _check_stretch_domain(kernel: str, kernel_params: dict) -> None:
    ok = STATS_STRETCH_KERNELS.get(kernel)
    if ok is None or not ok(kernel_params):
        raise ValueError(
            f"kernel {kernel!r} (params {kernel_params!r}) is not a stretch-domain kernel: "
            f"its global_stats parameter is not a post-output [lo, lo+scale] stretch, so "
            f"injecting pooled output percentiles would mis-normalize. Supported: "
            f"{sorted(STATS_STRETCH_KERNELS)} (structure_tensor only for st_output="
            f"'coherence', scale_drift only for drift_output='magnitude'); kernels with a "
            f"bespoke raw-stat pre-pass (kernel_raw_stats) route automatically via "
            f"tile_kernel_normalized."
        )


# Per-kernel RAW-field pre-passes — the reference's per-algorithm
# _norm_stats dispatch (reference algorithms/_norm_stats.py:29-61) for
# kernels whose global_stats lives in a DIFFERENT domain than their
# output: each spec names the raw field whose global percentile IS the
# kernel's stat, and how the pooled value injects into kernel params.
# The field functions are the same ones the kernels' per-block
# fallbacks use, so pre-pass and fallback can never drift.
def _p95_agg(vdf):
    row = vdf.agg(F.percentile_approx("v", 0.95, 10000).alias("p")).first()
    if row is None or row["p"] is None:
        return None
    v = float(row["p"])
    return v if v > 1e-12 else None


def _grad_stats_agg(vdf):
    """(base=p50, range=p90−p50, mean) of the gradient field — npr's
    threshold triple (reference _impl_npr_edges.py:276-379)."""
    row = vdf.agg(
        F.percentile_approx("v", [0.5, 0.9], 10000).alias("p"),
        F.avg("v").alias("m"),
    ).first()
    if row is None or row["p"] is None or row["m"] is None or float(row["m"]) <= 1e-12:
        return None
    base, p90 = float(row["p"][0]), float(row["p"][1])
    return (base, p90 - base, float(row["m"]))


def _raw_stats_specs() -> dict:
    from .np_kernels import (
        frangi_energy_field,
        npr_gradient_field,
        specular_roughness_field,
    )

    return {
        # c = p95(S)/2 over the structure-energy field
        # (reference _impl_frangi.py:154-162)
        # injection floors sit strictly ABOVE the kernels' `>` gates
        # (np_frangi checks > 1e-12, np_specular > 1e-9): a boundary or
        # degenerate-default injection must still be CONSUMED — falling
        # through to the per-block fallback would seam exactly the
        # tiles the pre-pass exists to protect
        "frangi": {
            "field": lambda g, p: frangi_energy_field(g, p.get("radii", (2.0, 4.0, 8.0, 16.0))),
            "agg": _p95_agg,
            "inject": lambda v: {"global_stats": (0.0, max(0.5 * v, 2e-12))},
            "default": 0.0,
        },
        # roughness_norm_scale = p95 of the raw windowed-std roughness
        # (reference _impl_specular.py:228-308); NaN-masked so the pool
        # matches the kernel's own roughness[~nan_mask] percentile
        "specular": {
            "field": lambda g, p: _mask_like(
                specular_roughness_field(g, p.get("roughness_scale", 20.0)), g
            ),
            "agg": _p95_agg,
            "inject": lambda v: {"roughness_norm_scale": max(v, 2e-9)},
            "default": 0.0,
        },
        # grad_stats = (p50, p90−p50, mean) of the smoothed Sobel
        # magnitude (reference _impl_npr_edges.py:276-379); the default
        # triple matches the kernel's own degenerate fallback
        "npr_edges": {
            "field": lambda g, p: _npr_gmag(npr_gradient_field, g, p),
            "agg": _grad_stats_agg,
            "inject": lambda v: {"grad_stats": tuple(v)},
            "default": (0.1, 0.2, 0.1),
        },
    }


def _npr_gmag(field_fn, g, p):
    gmag, _, _, nan_mask = field_fn(g, p.get("edge_sigma", 1.0))
    return _mask_like(gmag, g, nan_mask)


def _mask_like(field, grid, nan_mask=None):
    """NaN out the field wherever the source grid is NaN, so pooled
    stats match the kernels' own valid-only percentiles."""
    import numpy as np

    if nan_mask is None:
        nan_mask = np.isnan(grid)
    if nan_mask.any():
        field = field.copy()
        field[nan_mask] = np.nan
    return field


def kernel_raw_stats(
    points: DataFrame,
    z: int,
    kernel: str,
    sample_mod: int = 4,
    log_scale: bool = True,
    **kernel_params,
):
    """Pooled raw-field stat(s) over a deterministic tile sample, with
    the A10 central-window fallback — the per-algorithm analog of
    kernel_global_stats for non-stretch-domain kernels. Returns a
    float (frangi/specular) or the kernel's stat tuple (npr_edges)."""
    spec = _raw_stats_specs().get(kernel)
    if spec is None:
        raise ValueError(
            f"no raw-stat extractor for kernel {kernel!r}; "
            f"available: {sorted(_raw_stats_specs())}"
        )
    return _staged_pool(points, z, kernel, spec, sample_mod, log_scale, kernel_params)


def _staged_pool(points, z, kernel, spec, sample_mod, log_scale, kernel_params):
    """Sampled pool -> A10 central-window fallback -> spec default.

    NOTE: kernel_global_stats carries its own copy of this
    sample/centroid/±2-tile policy (it pools KERNEL OUTPUT via
    tile_kernel, not a raw field via rasterize+mapInPandas, and its
    A10 test pins exact equality with _pool_stats) — keep the two
    policies in sync if either changes."""
    pts = _owning_tile(points, z)
    sampled = pts.filter(F.pmod(F.xxhash64("_otx", "_oty"), F.lit(sample_mod)) == 0).drop("_otx", "_oty")
    v = _pool_field(sampled, z, kernel, spec, log_scale, kernel_params)
    if v is not None:
        return v
    center = pts.agg(F.avg("_otx").alias("cx"), F.avg("_oty").alias("cy")).first()
    if center is None or center["cx"] is None:
        return spec["default"]
    cx, cy = int(center["cx"]), int(center["cy"])
    central = pts.filter(
        (F.abs(F.col("_otx") - cx) <= 2) & (F.abs(F.col("_oty") - cy) <= 2)
    ).drop("_otx", "_oty")
    v = _pool_field(central, z, kernel, spec, log_scale, kernel_params)
    return v if v is not None else spec["default"]


def _relief_agg(vdf):
    row = vdf.agg(F.percentile_approx("v", [0.10, 0.75], 10000).alias("p")).first()
    if row is None or row["p"] is None:
        return None
    p10, p75 = float(row["p"][0]), float(row["p"][1])
    return (p10, p75) if p75 > p10 else None


def _median_dev_agg(vdf):
    """(median, p99|v − median|) — fractal's global_stats pair; the
    pooled field is checkpointed so the two aggregates scan it once."""
    v = vdf.localCheckpoint(eager=False)
    r1 = v.agg(F.percentile_approx("v", 0.5, 10000).alias("m")).first()
    if r1 is None or r1["m"] is None:
        return None
    med = float(r1["m"])
    r2 = v.agg(F.percentile_approx(F.abs(F.col("v") - med), 0.99, 10000).alias("d")).first()
    if r2 is None or r2["d"] is None:
        return None
    dev = float(r2["d"])
    return (med, dev) if dev > 1e-6 else None


def fractal_global_stats(
    points: DataFrame,
    z: int,
    sample_mod: int = 4,
    log_scale: bool = True,
    **kernel_params,
) -> dict:
    """Fractal anomaly's ORDERED two-stage pre-pass (the reference runs
    its stats in dependency order — fractal relief BEFORE norm stats,
    reference core/dask_processor.py:1327, _impl_fractal_anomaly.py:
    359-445): stage 1 pools the relief field's (p10, p75); stage 2
    pools the FEATURE field — computed WITH those relief stats — for
    (median, p99|dev|). Returns the kernel-param dict to inject."""
    from .np_kernels import fractal_feature_field, fractal_roughness_field

    from .tile_kernels import kernel_halo, rasterize_tiles

    relief_spec = {
        "field": lambda g, p: fractal_roughness_field(g, **p),
        "agg": _relief_agg,
    }
    feat_spec = {
        "field": lambda g, p: fractal_feature_field(g, **p),
        "agg": _median_dev_agg,
    }
    h = kernel_halo("fractal_anomaly", kernel_params)
    pts = _owning_tile(points, z)
    sampled = pts.filter(
        F.pmod(F.xxhash64("_otx", "_oty"), F.lit(sample_mod)) == 0
    ).drop("_otx", "_oty")
    # ONE rasterization serves both stages (checkpointed): the two
    # pools read the same sampled windows, like the reference computing
    # all fractal stats from one set of stratified reads
    tiles = rasterize_tiles(sampled, z, halo=h, log_scale=log_scale).localCheckpoint(eager=False)
    relief = _pool_tiles(tiles, h, relief_spec, kernel_params)
    if relief is None:
        # A10 central-window fallback, again rasterized once
        center = pts.agg(F.avg("_otx").alias("cx"), F.avg("_oty").alias("cy")).first()
        if center is not None and center["cx"] is not None:
            cx, cy = int(center["cx"]), int(center["cy"])
            central = pts.filter(
                (F.abs(F.col("_otx") - cx) <= 2) & (F.abs(F.col("_oty") - cy) <= 2)
            ).drop("_otx", "_oty")
            tiles = rasterize_tiles(central, z, halo=h, log_scale=log_scale).localCheckpoint(eager=False)
            relief = _pool_tiles(tiles, h, relief_spec, kernel_params)
    p10, p75 = relief if relief is not None else (0.0, 1.0)
    feat = _pool_tiles(
        tiles, h, feat_spec, dict(kernel_params, relief_p10=p10, relief_p75=p75)
    )
    med, dev = feat if feat is not None else (0.0, 1.0)
    return {
        "relief_p10": p10,
        "relief_p75": p75,
        # floor strictly above np_fractal_anomaly's > 1e-6 gate so the
        # injection is always consumed (seam-free even when degenerate)
        "global_stats": (med, max(dev, 2e-6)),
    }


def _pool_field(points, z, kernel, spec, log_scale, kernel_params):
    """spec agg of the kernel's raw field over core pixels of
    halo-expanded sampled tiles."""
    from .tile_kernels import kernel_halo, rasterize_tiles

    h = kernel_halo(kernel, kernel_params)
    tiles = rasterize_tiles(points, z, halo=h, log_scale=log_scale)
    return _pool_tiles(tiles, h, spec, kernel_params)


def _pool_tiles(tiles, h, spec, kernel_params):
    import numpy as np
    import pandas as pd

    from .tile_kernels import unpack_grid

    field_fn, params = spec["field"], dict(kernel_params)
    w = TILE_PX + 2 * h

    def ffn(it):
        for pdf in it:
            out = []
            for g in pdf["grid"]:
                gg = unpack_grid(g, w)
                f = field_fn(gg, params)
                core = f[h : h + TILE_PX, h : h + TILE_PX] if h else f
                out.append(core[np.isfinite(core)].ravel())
            yield pd.DataFrame({"v": np.concatenate(out) if out else np.empty(0)})

    return spec["agg"](tiles.mapInPandas(ffn, "v double"))


def stretch(col: Column, lo: float, scale: float) -> Column:
    """A11 display stretch: max((v - lo) / scale, 0) — p99 maps to 1,
    the bright tail passes through unclipped (reference
    _global_stats.py:173-174)."""
    if not scale > 1e-12:
        return col
    return F.greatest((col - F.lit(float(lo))) / F.lit(float(scale)), F.lit(0.0))


def _owning_tile(points: DataFrame, z: int, lat_col="lat", lon_col="lon") -> DataFrame:
    n_px = (1 << z) * TILE_PX
    xn, yn = merc_xy_norm(F.col(lat_col), F.col(lon_col))
    gx = F.least(F.lit(n_px - 1), F.greatest(F.lit(0), F.floor(xn * F.lit(float(n_px))))).cast("long")
    gy = F.least(F.lit(n_px - 1), F.greatest(F.lit(0), F.floor(yn * F.lit(float(n_px))))).cast("long")
    return points.withColumns({"_otx": F.shiftright(gx, 8), "_oty": F.shiftright(gy, 8)})


def kernel_global_stats(
    points: DataFrame,
    z: int,
    kernel: str,
    lo_p: float = 1.0,
    hi_p: float = 99.0,
    sample_mod: int = 4,
    log_scale: bool = True,
    exact: bool = False,
    **kernel_params,
) -> tuple[float, float]:
    """(lo, scale) of the kernel's raw output pooled over a
    deterministic 1/sample_mod tile sample; central-window fallback
    (A10) when the sample is degenerate. Restricted to stretch-domain
    kernels (STATS_STRETCH_KERNELS) — see _check_stretch_domain.

    ``exact=True`` is the ORACLE-ONLY plan choice (the normalize_
    acctbal pattern, queries.normalize_acctbal): exact ``percentile``
    (a full sort of the pooled pixels) solely for bit-parity with
    DuckDB ``quantile_cont``. Production always uses the default
    ``percentile_approx`` sketch — the plan to run at 10^12 rows."""
    _check_stretch_domain(kernel, kernel_params)
    pts = _owning_tile(points, z)
    sampled = pts.filter(F.pmod(F.xxhash64("_otx", "_oty"), F.lit(sample_mod)) == 0).drop("_otx", "_oty")
    stats = _pool_stats(sampled, z, kernel, lo_p, hi_p, log_scale, kernel_params, exact)
    if stats is not None:
        return stats

    # A10: central full-resolution window around the data centroid
    # (reference _global_stats.py:65-120's bounded central crop)
    center = pts.agg(
        F.avg("_otx").alias("cx"), F.avg("_oty").alias("cy")
    ).first()
    if center is None or center["cx"] is None:
        return (0.0, 0.0)  # no points at all: nothing to recover from
    cx, cy = int(center["cx"]), int(center["cy"])
    central = pts.filter(
        (F.abs(F.col("_otx") - cx) <= 2) & (F.abs(F.col("_oty") - cy) <= 2)
    ).drop("_otx", "_oty")
    stats = _pool_stats(central, z, kernel, lo_p, hi_p, log_scale, kernel_params, exact)
    return stats if stats is not None else (0.0, 0.0)


def _pool_stats(points, z, kernel, lo_p, hi_p, log_scale, kernel_params, exact=False):
    tiles = tile_kernel(points, z, kernel=kernel, log_scale=log_scale, **kernel_params)
    pctl = (
        F.expr(f"percentile(v, array({lo_p / 100.0!r}, {hi_p / 100.0!r}))")
        if exact  # oracle-only full sort; see kernel_global_stats
        else F.percentile_approx("v", [lo_p / 100.0, hi_p / 100.0], 10000)
    )
    row = (
        tiles.select(F.explode("result").alias("v"))
        .filter(~F.isnan("v"))
        .agg(pctl.alias("p"))
        .first()
    )
    if row is None or row["p"] is None:
        return None
    lo, hi = float(row["p"][0]), float(row["p"][1])
    if not hi - lo > 1e-12:
        return None
    return (lo, hi - lo)


def tile_kernel_normalized(
    points: DataFrame,
    z: int,
    kernel: str,
    lo_p: float = 1.0,
    hi_p: float = 99.0,
    sample_mod: int = 4,
    log_scale: bool = True,
    **kernel_params,
) -> DataFrame:
    """Stats pre-pass + stats-injected kernel run: the reference's
    seam-free normalization pipeline (pre-pass -> broadcast -> every
    tile normalizes identically). The stats land in the kernel's
    declared stat parameter, so the per-tile UDF does no
    data-dependent normalization of its own.

    Two routes, mirroring the reference's per-algorithm dispatch:
    stretch-domain kernels (STATS_STRETCH_KERNELS) pool the output's
    own percentiles into ``global_stats``; raw-stat kernels (frangi,
    specular) pool their RAW field's percentile and inject it in that
    kernel's domain (structure-energy c, roughness p95). Anything
    else raises."""
    if kernel == "fractal_anomaly":
        inj = fractal_global_stats(
            points, z, sample_mod=sample_mod, log_scale=log_scale, **kernel_params
        )
        return tile_kernel(points, z, kernel=kernel, log_scale=log_scale,
                           **dict(kernel_params, **inj))
    if kernel in _raw_stats_specs():
        spec = _raw_stats_specs()[kernel]
        v = kernel_raw_stats(
            points, z, kernel, sample_mod=sample_mod, log_scale=log_scale,
            **kernel_params,
        )
        inj = spec["inject"](v)
        return tile_kernel(points, z, kernel=kernel, log_scale=log_scale,
                           **dict(kernel_params, **inj))
    _check_stretch_domain(kernel, kernel_params)
    stats = kernel_global_stats(
        points, z, kernel, lo_p=lo_p, hi_p=hi_p, sample_mod=sample_mod,
        log_scale=log_scale, **kernel_params,
    )
    return tile_kernel(points, z, kernel=kernel, log_scale=log_scale,
                       global_stats=stats, **kernel_params)
