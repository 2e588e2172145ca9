import os

import numpy as np
import pytest

# Tests measure semantics, not perf: skip the 24 GB heap pre-touch
# (session.py) here and in every CLI subprocess the e2e tests spawn —
# it would add ~40 s per JVM. Respect an explicit caller override.
os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "0")

from fujishadergpu_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fujishadergpu-tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "8"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_df(spark, tmp_path_factory):
    """3k deterministic pages, materialized once (parquet) so the huge
    generator expression is planned once."""
    from fujishadergpu_spark.sources.pages import pages

    path = str(tmp_path_factory.mktemp("data") / "pages.parquet")
    pages(spark, 3000).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@pytest.fixture(scope="session")
def points_df(spark, pages_df):
    from pyspark.sql import functions as F

    from fujishadergpu_spark.functions import geoparse

    return geoparse.geoparse(pages_df).select(
        F.regexp_extract("url", r"id=(\d+)", 1).cast("long").alias("id"), "lat", "lon"
    )


def raycast_oracle(px, py, ring):
    """Brute-force boundary-inclusive even-odd ray cast (NumPy oracle)."""
    rx = np.array([p[0] for p in ring])
    ry = np.array([p[1] for p in ring])
    inside = np.zeros(px.shape, bool)
    onedge = np.zeros(px.shape, bool)
    j = len(rx) - 1
    for i in range(len(rx)):
        xi, yi, xj, yj = rx[i], ry[i], rx[j], ry[j]
        cond = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(cond, (xj - xi) * (py - yi) / (yj - yi) + xi, 0.0)
        inside ^= cond & (px < t)
        cross = (xj - xi) * (py - yi) - (yj - yi) * (px - xi)
        within = (
            (px >= np.minimum(xi, xj)) & (px <= np.maximum(xi, xj))
            & (py >= np.minimum(yi, yj)) & (py <= np.maximum(yi, yj))
        )
        onedge |= (cross == 0.0) & within
        j = i
    return inside | onedge
