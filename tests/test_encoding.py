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
