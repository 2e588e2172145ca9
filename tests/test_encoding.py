"""Quantize / NoData-normalize tests (reference output-encoding +
sentinel-detection policies, io/output_encoding.py, dem_preprocess)."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions import encoding


def test_quantize_roundtrip(spark):
    df = spark.range(1000).select((F.col("id") * 0.01 - 2.0).alias("v"))
    q = df.select("v", encoding.quantize(F.col("v"), -2.0, 8.0, "uint8").alias("dn"))
    rows = q.collect()
    assert all(1 <= r["dn"] <= 255 for r in rows)
    back = q.select("v", encoding.dequantize(F.col("dn"), -2.0, 8.0, "uint8").alias("v2")).collect()
    step = 10.0 / 254
    assert all(abs(r["v"] - r["v2"]) <= step / 2 + 1e-9 for r in back)


def test_quantize_null_is_dn0(spark):
    df = spark.createDataFrame([(None,), (0.5,)], "v double")
    rows = df.select(encoding.quantize(F.col("v"), 0.0, 1.0).alias("dn")).collect()
    assert rows[0]["dn"] == 0 and rows[1]["dn"] > 0


def test_normalize_nodata_and_inference(spark):
    df = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, -9999.0).otherwise(F.col("id") * 1.0).alias("v")
    )
    sent = encoding.infer_sentinels(df, "v", min_share=0.05)
    assert sent == [-9999.0]
    out = encoding.normalize_nodata(df, "v", sent)
    assert out.filter("v IS NULL").count() == 100
    assert out.filter("v = -9999.0").count() == 0


def _grid_pts(spark, n=40, sentinel_edges=None, sentinel=-32767.0):
    """n×n unit-grid point table; rows on the listed bbox edges get the
    sentinel, everything else a smooth value."""
    import pandas as pd

    rows = []
    for i in range(n):
        for j in range(n):
            on_edge = i == 0 or i == n - 1 or j == 0 or j == n - 1
            edge_name = (
                "w" if j == 0 else "e" if j == n - 1 else "s" if i == 0 else "n" if i == n - 1 else None
            )
            v = float(i + j)
            if on_edge and sentinel_edges and edge_name in sentinel_edges:
                v = sentinel
            rows.append((float(i), float(j), v))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["lat", "lon", "v"]))


def test_border_sentinel_detected_under_share_threshold(spark):
    """A constant frame on all four bbox edges is reported by the
    border rule, value-exact. (The under-5%-share case — where ONLY
    the border rule can fire — is pinned end-to-end by the
    nodata_border_infer_normalize hash oracle.)"""
    from fujishadergpu_spark.functions.encoding import infer_border_sentinel

    df = _grid_pts(spark, 40, sentinel_edges={"w", "e", "s", "n"})
    got = infer_border_sentinel(df, "v", border_frac=0.02)
    assert got == -32767.0


def test_border_sentinel_rejects_single_edge_strip(spark):
    """The reference's min_border_fraction gate: a genuine constant
    strip on ONE edge (a coast) holds only ~25% of the ring and must
    NOT be reported as NoData."""
    from fujishadergpu_spark.functions.encoding import infer_border_sentinel

    df = _grid_pts(spark, 40, sentinel_edges={"w"})
    assert infer_border_sentinel(df, "v", border_frac=0.02) is None


def test_border_sentinel_rejects_tiny_total_share(spark):
    """The min_total_fraction gate: a dominant ring constant that is a
    negligible share of the whole dataset is rejected (thin-frame
    artifact, reference io/dem_preprocess.py:224-228)."""
    from fujishadergpu_spark.functions.encoding import infer_border_sentinel

    df = _grid_pts(spark, 40, sentinel_edges={"w", "e", "s", "n"})
    assert infer_border_sentinel(df, "v", border_frac=0.02, min_total_fraction=0.2) is None


def test_infer_sentinels_auto_unions_both_rules(spark):
    from pyspark.sql import functions as F

    from fujishadergpu_spark.functions.encoding import infer_sentinels_auto

    # border frame -32767 (under 5% share on a 60x60 grid: 236/3600 ≈ 6.6%...
    # use interior -9999 plant at >5% for the share rule instead)
    df = _grid_pts(spark, 60, sentinel_edges={"w", "e", "s", "n"})
    df = df.withColumn(
        "v",
        F.when((F.col("lat") % 10 == 3) & (F.col("lat") > 0) & (F.col("lat") < 59),
               F.lit(-9999.0)).otherwise(F.col("v")),
    )
    got = set(infer_sentinels_auto(df, "v", border_frac=0.02))
    assert -9999.0 in got  # share rule (interior plant ~10%)
    assert -32767.0 in got  # border rule (frame)
