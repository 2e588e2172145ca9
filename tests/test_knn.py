"""kNN ring expansion vs brute-force O(n²) oracle (FIXTURES.md §4.3),
including sparse-region queries that force ring growth / fallback."""

import numpy as np
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.knn import knn


def _oracle(qpdf, px, py, ids, k, exclude_self=True):
    exp = {}
    for _, row in qpdf.iterrows():
        d = (py - row.lat) ** 2 + (px - row.lon) ** 2
        order = sorted(zip(d, ids))
        nn = [int(i) for _, i in order if not (exclude_self and int(i) == int(row.id))][:k]
        for r, n in enumerate(nn, 1):
            exp[(int(row.id), r)] = n
    return exp


def test_knn_matches_oracle(spark, points_df):
    pdf = points_df.toPandas()
    px, py, ids = pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), pdf["id"].to_numpy()
    q = points_df.filter(F.col("id") % 50 == 0)
    got = {
        (r["id"], r["rank"]): r["neighbor_id"]
        for r in knn(points_df, q, k=5, res=6, point_id="id", query_id="id", exclude_self=True).collect()
    }
    exp = _oracle(q.toPandas(), px, py, ids, 5)
    assert got == exp


def test_knn_sparse_forces_expansion(spark):
    """3 far-apart points at a fine res: rings must expand (or fall
    back) yet still return the true neighbors."""
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 20.0, 20.0), (3, -25.0, 10.0), (4, 0.001, 0.001)],
        "id long, lat double, lon double",
    )
    got = {
        (r["id"], r["rank"]): r["neighbor_id"]
        for r in knn(pts, pts, k=2, res=10, point_id="id", query_id="id",
                     exclude_self=True, max_rounds=3).collect()
    }
    assert got[(1, 1)] == 4
    assert got[(4, 1)] == 1
    assert len(got) == 8  # every query got its full k=2


def test_knn_k_larger_than_points(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 1.0)], "id long, lat double, lon double"
    )
    rows = knn(pts, pts, k=5, res=7, point_id="id", query_id="id", exclude_self=True).collect()
    # only 1 neighbor exists per query
    assert len(rows) == 2 and all(r["rank"] == 1 for r in rows)


def test_knn_fallback_never_cartesian(spark):
    """The straggler fallback is a coarse-LOD ring probe + terminal
    full-cell enumeration — the plan must contain no CartesianProduct
    / BroadcastNestedLoopJoin at any recursion level (the round-1
    fallback was broadcast(pending).crossJoin(points))."""
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 20.0, 20.0), (3, -25.0, 10.0)],
        "id long, lat double, lon double",
    )
    out = knn(pts, pts, k=2, res=10, point_id="id", query_id="id",
              exclude_self=True, max_rounds=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and it still returns the true neighbors
    got = {(r["id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    assert got[(1, 1)] in (2, 3) and len(got) == 6


def test_knn_rejects_degenerate_res(spark):
    import pytest

    pts = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lat double, lon double")
    with pytest.raises(ValueError):
        knn(pts, pts, k=1, res=1)
