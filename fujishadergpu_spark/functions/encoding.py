"""Output quantization + NoData normalization (SURVEY.md §2.A A4/A13).

The reference encodes float results into integer DNs with a linear
``value = scale*DN + offset`` map, reserving DN 0 for NoData
(reference io/output_encoding.py:130-190), and normalizes declared/
inferred NoData sentinels to NaN on ingest (reference
core/dask_processor.py:1154-1162, io/dem_preprocess.py:191-275).

Spark mapping: NULL plays NaN's role; all of it is plain column
arithmetic (codegen; DuckDB-oracle expressible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DTYPES = {"uint8": (1, 255, "int"), "int16": (-32767, 32767, "int")}


def quantize(value: Column, lo: float, hi: float, dtype: str = "uint8") -> Column:
    """value in [lo, hi] -> integer DN; NULL -> 0 (the NoData DN).

    DN = clip(round((v - lo) / (hi - lo) * (dn_max - dn_min) + dn_min))
    """
    dn_min, dn_max, sql_t = DTYPES[dtype]
    scaled = (value - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(dn_max - dn_min)) + F.lit(float(dn_min))
    dn = F.least(F.lit(float(dn_max)), F.greatest(F.lit(float(dn_min)), F.round(scaled)))
    return F.when(value.isNull(), F.lit(0)).otherwise(dn.cast(sql_t))


def dequantize(dn: Column, lo: float, hi: float, dtype: str = "uint8") -> Column:
    """DN -> approximate value; DN 0 -> NULL."""
    dn_min, dn_max, _ = DTYPES[dtype]
    v = (dn.cast("double") - dn_min) / float(dn_max - dn_min) * (hi - lo) + lo
    return F.when(dn == 0, F.lit(None)).otherwise(v)


def quantize_sql(value_expr: str, lo: float, hi: float, dtype: str = "uint8") -> str:
    """DuckDB/ANSI twin of quantize (same op order)."""
    dn_min, dn_max, _ = DTYPES[dtype]
    scaled = f"(({value_expr}) - {lo}) / {hi - lo} * {float(dn_max - dn_min)} + {float(dn_min)}"
    dn = f"least({float(dn_max)}, greatest({float(dn_min)}, round({scaled})))"
    return f"CASE WHEN ({value_expr}) IS NULL THEN 0 ELSE CAST({dn} AS INTEGER) END"


def normalize_nodata(df: DataFrame, col: str, sentinels: list[float]) -> DataFrame:
    """Declared-sentinel -> NULL rewrite (the --nodata override path)."""
    c = F.col(col)
    cond = None
    for s in sentinels:
        t = c == F.lit(s)
        cond = t if cond is None else (cond | t)
    return df.withColumn(col, F.when(cond, F.lit(None)).otherwise(c))


def infer_sentinels(df: DataFrame, col: str, min_share: float = 0.05, candidates: list[float] | None = None) -> list[float]:
    """NoData auto-detection rule 1: suspicious constants that dominate
    the value distribution (the reference's sentinel-share heuristic,
    reference io/dem_preprocess.py:244-275, re-expressed as one
    aggregation over a candidate list instead of a value scan)."""
    cands = candidates or [-9999.0, -32767.0, -32768.0, 0.0, 255.0, 3.4028234663852886e38]
    c = F.col(col)
    aggs = [F.avg(F.when(c == F.lit(s), 1.0).otherwise(0.0)).alias(f"s{i}") for i, s in enumerate(cands)]
    row = df.agg(*aggs).first()
    return [s for i, s in enumerate(cands) if (row[f"s{i}"] or 0.0) >= min_share]


def infer_border_sentinel(
    df: DataFrame,
    col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    border_frac: float = 0.02,
    min_border_fraction: float = 0.5,
    min_total_fraction: float = 0.02,
    sample_mod: int = 1,
) -> float | None:
    """NoData auto-detection rule 2 — the BORDER heuristic the share
    rule misses (reference io/dem_preprocess.py:191-229): a constant
    value dominating the dataset's outer frame (ocean / dataset
    exterior around a cropped raster) is a forgotten sentinel even
    when its global share sits under the 5% threshold.

    Point-table re-expression of the reference's outer-ring scan: the
    "ring" is every row within ``border_frac`` of the data bbox edge;
    the most common value there is the candidate, accepted when it
    holds >= ``min_border_fraction`` of the ring AND >=
    ``min_total_fraction`` of all rows (so a thin genuine coastal
    strip on one edge is not mistaken for a NoData frame — same two
    gates as the reference).

    Exactly two bounded driver jobs: a bbox aggregate, then ONE
    grouped aggregate whose argmax rides a struct-ordered max (no
    per-value collect). At 10^12 rows pass ``sample_mod`` > 1 to run
    both on a deterministic hash sample (the analog of the
    reference's bounded coarse NEAREST overview — sampling preserves
    exact values, which averaging would not).
    """
    d = df.filter(F.col(col).isNotNull())
    if sample_mod > 1:
        d = d.filter(F.pmod(F.xxhash64(lat_col, lon_col), F.lit(sample_mod)) == 0)
    bb = d.agg(
        F.min(lat_col).alias("lat0"), F.max(lat_col).alias("lat1"),
        F.min(lon_col).alias("lon0"), F.max(lon_col).alias("lon1"),
    ).first()
    if bb is None or bb["lat0"] is None:
        return None
    if not (bb["lat1"] > bb["lat0"] and bb["lon1"] > bb["lon0"]):
        # degenerate bbox (transect/single-point data): every row would
        # classify as "border" and a genuine majority value would be
        # reported as NoData — no frame exists to detect (the
        # reference's h<8/w<8 bail-out, io/dem_preprocess.py:211-212)
        return None
    mlat = (bb["lat1"] - bb["lat0"]) * border_frac
    mlon = (bb["lon1"] - bb["lon0"]) * border_frac
    la, lo = F.col(lat_col), F.col(lon_col)
    is_border = (
        (la <= bb["lat0"] + mlat) | (la >= bb["lat1"] - mlat)
        | (lo <= bb["lon0"] + mlon) | (lo >= bb["lon1"] - mlon)
    ).cast("long")
    g = d.groupBy(col).agg(F.count("*").alias("n"), F.sum(is_border).alias("nb"))
    row = g.agg(
        F.sum("n").alias("tot"),
        F.sum("nb").alias("totb"),
        # lexicographic struct max = argmax by (ring count, value, n):
        # deterministic tie-break, single reduction, no value collect
        F.max(F.struct(F.col("nb"), F.col(col).alias("v"), F.col("n"))).alias("top"),
    ).first()
    if row is None or row["totb"] is None or row["totb"] == 0:
        return None
    top = row["top"]
    if top["nb"] / row["totb"] < min_border_fraction:
        return None
    if top["n"] / row["tot"] < min_total_fraction:
        return None
    return float(top["v"])


def infer_sentinels_auto(
    df: DataFrame,
    col: str,
    lat_col: str = "lat",
    lon_col: str = "lon",
    min_share: float = 0.05,
    candidates: list[float] | None = None,
    sample_mod: int = 1,
    **border_kw,
) -> list[float]:
    """--nodata auto: union of the share rule and the border rule —
    the reference runs BOTH and masks either hit (reference
    io/dem_preprocess.py:230-243)."""
    out = infer_sentinels(df, col, min_share, candidates)
    b = infer_border_sentinel(df, col, lat_col, lon_col, sample_mod=sample_mod, **border_kw)
    if b is not None and b not in out:
        out.append(b)
    return out
