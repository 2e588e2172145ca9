"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over fujishadergpu_spark.queries — the engine's operator
registry (SURVEY.md §2 coverage). Each queries() entry is a
(spark, sf_dir) -> DataFrame callable; oracle_sql() carries the
DuckDB-runnable ANSI twin for every SQL-expressible operator.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fujishadergpu_spark.queries import ORACLES, QUERIES, flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
