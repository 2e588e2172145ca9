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
    """NoData auto-detection: suspicious constants that dominate the
    value distribution (the reference's sentinel heuristics,
    reference io/dem_preprocess.py:191-275, re-expressed as one
    aggregation over a candidate list instead of a value scan)."""
    cands = candidates or [-9999.0, -32767.0, -32768.0, 0.0, 255.0, 3.4028234663852886e38]
    c = F.col(col)
    aggs = [F.avg(F.when(c == F.lit(s), 1.0).otherwise(0.0)).alias(f"s{i}") for i, s in enumerate(cands)]
    row = df.agg(*aggs).first()
    return [s for i, s in enumerate(cands) if (row[f"s{i}"] or 0.0) >= min_share]
