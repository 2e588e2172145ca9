"""A9/A10/A11 stats pre-pass contracts (reference algorithms/
_norm_stats.py, _global_stats.py):

- the generic stats path is restricted to stretch-domain kernels
  (injecting pooled output percentiles into a kernel that interprets
  global_stats in another domain would silently mis-normalize);
- injection exactness: tile_kernel_normalized == stretch(raw kernel
  output) with the pre-pass stats, bit-for-bit per pixel;
- the sampled percentile tracks an exact NumPy percentile oracle;
- the A10 central-window fallback fires on an empty sample and
  provably recovers the central-crop stats.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators import norm_stats as ns
from fujishadergpu_spark.operators.tile_kernels import tile_kernel

Z = 4


def test_generic_stats_rejects_non_stretch_kernels(points_df):
    for kernel, params in [
        ("hillshade", {}),               # no global_stats param at all
        ("frangi", {}),                  # structure-energy c domain
        ("phase_congruency", {}),        # noise-median domain
        ("tv_decomposition", {}),        # texture tanh-scale domain
        ("fractal_anomaly", {}),         # (mean, std) domain
        ("multiscale_terrain", {}),      # pre-gamma detail band
        ("structure_tensor", {"st_output": "orientation"}),  # mode-gated
        ("scale_drift", {"drift_output": "divergence"}),
    ]:
        with pytest.raises(ValueError, match="stretch-domain"):
            ns.tile_kernel_normalized(points_df, Z, kernel, **params)
        with pytest.raises(ValueError, match="stretch-domain"):
            ns.kernel_global_stats(points_df, Z, kernel, **params)


def test_injection_is_exact_stretch_of_raw_output(spark, points_df):
    """The whole point of the pre-pass: every tile normalizes with the
    SAME (lo, scale), i.e. the normalized output is exactly
    max((raw - lo)/scale, 0) pixel-for-pixel."""
    stats = ns.kernel_global_stats(points_df, Z, "openness", sample_mod=1)
    lo, scale = stats
    assert scale > 0.0
    raw = {
        (r["x"], r["y"]): np.asarray(r["result"])
        for r in tile_kernel(points_df, Z, kernel="openness").collect()
    }
    norm = {
        (r["x"], r["y"]): np.asarray(r["result"])
        for r in ns.tile_kernel_normalized(points_df, Z, "openness", sample_mod=1).collect()
    }
    assert raw.keys() == norm.keys() and raw
    for k, rv in raw.items():
        want = np.maximum((rv - lo) / scale, 0.0)
        np.testing.assert_array_equal(norm[k], want)


def test_stats_track_exact_percentile_oracle(spark, points_df):
    """percentile_approx(accuracy=10000) over the pooled pixels vs
    np.percentile over the identical pool (sample_mod=1 -> every
    tile)."""
    lo, scale = ns.kernel_global_stats(points_df, Z, "openness", sample_mod=1)
    pool = np.concatenate(
        [np.asarray(r["result"]) for r in tile_kernel(points_df, Z, kernel="openness").collect()]
    )
    pool = pool[~np.isnan(pool)]
    p1, p99 = np.percentile(pool, [1.0, 99.0])
    span = float(pool.max() - pool.min())
    assert abs(lo - p1) <= 0.02 * span
    assert abs((lo + scale) - p99) <= 0.02 * span


def test_a10_central_window_fallback_recovers(spark, points_df):
    """Force an empty stratified sample (sample_mod so large no tile
    hash hits 0) -> the A10 bounded central-crop fallback must produce
    exactly the stats of the ±2-tile window around the data centroid
    (reference _global_stats.py:65-120)."""
    huge_mod = 1_000_003
    pts = ns._owning_tile(points_df, Z)
    n_sampled = pts.filter(
        F.pmod(F.xxhash64("_otx", "_oty"), F.lit(huge_mod)) == 0
    ).count()
    assert n_sampled == 0, "fixture drifted: pick another prime for huge_mod"

    got = ns.kernel_global_stats(points_df, Z, "openness", sample_mod=huge_mod)

    center = pts.agg(F.avg("_otx").alias("cx"), F.avg("_oty").alias("cy")).first()
    cx, cy = int(center["cx"]), int(center["cy"])
    central = pts.filter(
        (F.abs(F.col("_otx") - cx) <= 2) & (F.abs(F.col("_oty") - cy) <= 2)
    ).drop("_otx", "_oty")
    want = ns._pool_stats(central, Z, "openness", 1.0, 99.0, True, {})
    assert want is not None and want[1] > 0.0, "central window must recover real stats"
    assert got == want


def test_degenerate_everywhere_returns_zero_stats(spark):
    """Zero points -> empty sample AND an empty central fallback (the
    centroid aggregate returns NULL) -> the documented (0.0, 0.0)
    sentinel, not a crash (callers treat scale 0 as no-op)."""
    spark_pts = spark.range(0).select(
        F.lit(10.0).alias("lat"), F.lit(10.0).alias("lon")
    )
    got = ns.kernel_global_stats(spark_pts, Z, "openness", sample_mod=1)
    assert got == (0.0, 0.0)
