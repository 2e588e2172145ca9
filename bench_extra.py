"""Extra bench harness (round 7): noop-isolated per-query timing.

NOT the driver's bench — `bench.py` is frozen for measurement. This
file reproduces bench.py's exact methodology (same session factory,
same warmup recipe, same noop sink, min-of-N reps) for an arbitrary
subset of declared queries, so optimization work can time one query
without paying the full suite. Used for every per-query number cited
in OPTIMIZATION_r07.md.

Usage:
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [--reps N] query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fujishadergpu_spark import queries as Q  # noqa: E402
from fujishadergpu_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="fujishadergpu-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's warmup recipe: one JVM-only and one pandas-UDF query
    materialize(Q.QUERIES["q6_revenue_delta"](spark, sf_dir))
    materialize(Q.QUERIES["geo_cells_r7"](spark, sf_dir).limit(10))
    materialize(Q.QUERIES["tile_hillshade_z6"](spark, sf_dir).limit(1))

    out = {}
    for name in args.queries:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        reps = []
        for _ in range(args.reps):
            t0 = time.time()
            materialize(fn(spark, sf_dir))
            reps.append(round(time.time() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps}
        print(f"{name} min={min(reps)} reps={reps}", file=sys.stderr, flush=True)
    print(json.dumps({"sf": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
