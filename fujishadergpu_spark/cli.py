"""spark-submit entry point (BASELINE.json: `spark-submit --py-files`).

Usage (cluster):
    tools/make_pyfiles.sh                       # -> dist/fujishadergpu_spark.zip
    spark-submit --py-files dist/fujishadergpu_spark.zip \
        dist/cli_main.py pipeline --pages s3://.../pages --out s3://.../out

Usage (sandbox):
    python -m fujishadergpu_spark.cli generate --n 1000000 --out /tmp/pages
    python -m fujishadergpu_spark.cli pipeline --pages /tmp/pages --out /tmp/out

The `pipeline` subcommand is the engine's production job: geoparse ->
cell index -> PIP join -> XYZ tile kernels, every stage checkpointed
to the lineage log partition-by-partition so a killed run resumes
idempotently (reference --cog-only resume,
reference core/tile_processor.py:1748-1819).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from .functions import cells, geoparse
from .operators.pip_join import pip_join
from .operators.tile_kernels import tile_kernel_stats
from .plans.lineage import LineageLog, run_stage_idempotent
from .session import get_spark
from .sources.pages import pages as gen_pages
from .sources.polygons import polygons as gen_polygons

N_BUCKETS = 64  # lineage partition-key buckets per stage


def run_pipeline(spark, pages_path: str, out_root: str, zoom: int = 8, run_id: str | None = None) -> dict:
    """The resumable 3-stage pipeline. Each stage's partition key is a
    stable hash bucket so resume granularity is independent of data
    volume (10^12 rows / 64 buckets each resume unit)."""
    lineage = LineageLog(spark, f"{out_root}/_lineage")
    summary = {}

    pg = spark.read.parquet(pages_path)
    pts = geoparse.geoparse(pg).select(
        F.xxhash64("url").alias("id"), F.col("url"), "lat", "lon",
        cells.cell_of(F.col("lat"), F.col("lon"), 7).alias("cell_id"),
    )
    pts_keyed = pts.withColumn("bucket", F.pmod(F.xxhash64("url"), F.lit(N_BUCKETS)))
    summary["points"] = run_stage_idempotent(
        spark, pts_keyed, "bucket", f"{out_root}/points", lineage, "points", run_id
    )

    pts_back = spark.read.parquet(f"{out_root}/points")
    pol = gen_polygons(spark)
    joined = pip_join(pts_back, pol).select("id", "polygon_id", "lat", "lon")
    joined_keyed = joined.withColumn("bucket", F.pmod(F.xxhash64("id"), F.lit(N_BUCKETS)))
    summary["pip"] = run_stage_idempotent(
        spark, joined_keyed, "bucket", f"{out_root}/pip", lineage, "pip", run_id
    )

    tiles = tile_kernel_stats(pts_back, zoom, kernel="hillshade", log_scale=True)
    tiles_keyed = tiles.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col("x"), F.col("y")), F.lit(N_BUCKETS))
    )
    summary["tiles"] = run_stage_idempotent(
        spark, tiles_keyed, "bucket", f"{out_root}/tiles", lineage, "tiles", run_id
    )
    return summary


def main(argv=None):
    ap = argparse.ArgumentParser(prog="fujishadergpu_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write the deterministic synthetic pages table")
    g.add_argument("--n", type=int, default=1_000_000)
    g.add_argument("--out", required=True)
    g.add_argument("--partitions", type=int, default=None)

    p = sub.add_parser("pipeline", help="geoparse -> PIP -> tiles with lineage resume")
    p.add_argument("--pages", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--zoom", type=int, default=8)
    p.add_argument("--run-id", default=None)

    args = ap.parse_args(argv)
    # under spark-submit the master comes from the submitter; local
    # runs fall back to local[$SPARK_GRAFT_CPUS]
    spark = get_spark(app_name=f"fujishadergpu-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd == "generate":
            gen_pages(spark, args.n, args.partitions).write.mode("overwrite").parquet(args.out)
            print(f"wrote {args.n} pages to {args.out}")
        elif args.cmd == "pipeline":
            summary = run_pipeline(spark, args.pages, args.out, args.zoom, args.run_id)
            for stage, s in summary.items():
                print(f"stage {stage}: {s}")
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
