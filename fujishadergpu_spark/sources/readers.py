"""Schema-enforced pages readers across lakehouse formats.

The reference reads COG and Zarr through one normalization layer
(reference core/dask_io.py:28-73 — both land in the same canonical
float32/NaN model). Here the canonical model is the pages row
(BASELINE.json input_hint: url, warc_ts, html, text, lang) and the
formats are the lakehouse ones: parquet (the Iceberg file layout),
JSONL (the Common-Crawl-adjacent interchange form), and CSV. Every
reader enforces the SAME explicit schema — no inference job, no
per-format drift; downstream operators cannot tell the formats apart
(test-pinned: identical geoparse output from all three).

Note the binary `html` column: JSON/CSV cannot carry raw bytes, so
those writers/readers transport it hex-encoded and decode back to
binary on read (Spark's base64() emits MIME-chunked output with
embedded newlines, which breaks single-line CSV/JSONL records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
_TEXT_SCHEMA = "url string, warc_ts timestamp, html_hex string, text string, lang string"


def read_pages(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a pages table in parquet / json (JSONL) / csv with the
    canonical schema enforced."""
    if fmt == "parquet":
        return spark.read.schema(PAGES_SCHEMA).parquet(path)
    if fmt == "json":
        df = spark.read.schema(_TEXT_SCHEMA).json(path)
    elif fmt == "csv":
        # multiLine: the CSV writer quotes embedded newlines in
        # text/url fields; without it the reader splits such records at
        # line boundaries and silently corrupts rows (real crawl text
        # routinely contains newlines)
        df = (
            spark.read.schema(_TEXT_SCHEMA)
            .option("header", "true")
            .option("multiLine", "true")
            .option("quote", '"')
            .option("escape", '"')
            .csv(path)
        )
    else:
        raise ValueError(f"unknown pages format {fmt!r} (parquet/json/csv)")
    return df.select(
        "url", "warc_ts", F.unhex("html_hex").alias("html"), "text", "lang"
    )


def write_pages(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a canonical pages table in the chosen interchange format."""
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path)
        return
    out = df.select(
        "url", "warc_ts", F.hex("html").alias("html_hex"), "text", "lang"
    )
    if fmt == "json":
        out.write.mode("overwrite").json(path)
    elif fmt == "csv":
        out.write.mode("overwrite").option("header", "true").option("escape", '"').csv(path)
    else:
        raise ValueError(f"unknown pages format {fmt!r} (parquet/json/csv)")
