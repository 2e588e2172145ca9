"""Bucketed storage layout: pre-shuffled tables for co-located
aggregation and joins.

At 10^12 rows the dominant recurring cost of the key-driven operators
(per-user sessionization, exact dedup on text hash, per-cell rollups,
repeated cell-equi-joins) is re-shuffling the same table on the same
key for every query. Writing the table BUCKETED on that key pays the
shuffle once at ingest: Spark records the hash-partitioned layout in
the catalog, and every later groupBy/join on the bucket key (or a
superset of it) runs with ZERO Exchange on that side — the lakehouse
analog of the reference persisting its chunked scratch layout between
pipeline phases (reference core/tile_processor.py:1748-1819 reuses
per-tile scratch files rather than recutting tiles).

Bucket-count sizing follows the same rule as shuffle partitions:
~2 buckets per expected executor core at the target scale, so a full
scan is 2 waves (the bucket count is baked into the layout — size it
for the CLUSTER, not the laptop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    buckets: int = 64,
    sort_col: str | None = None,
) -> None:
    """Write ``df`` hash-bucketed (and optionally sorted) on
    ``bucket_col`` as a catalog table backed by ``path``.

    Sorting within buckets additionally removes the Sort from
    sort-merge joins/aggregations on the same key.
    """
    w = df.write.bucketBy(buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").option("path", path).format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only survives via the catalog
    (a plain spark.read.parquet(path) forgets the layout)."""
    return spark.table(table)
