"""SemDeDup — semantic deduplication by embedding clustering (Abbas
et al. 2023): k-means-cluster the embedding space, then search for
near-duplicate pairs ONLY within each cluster, and keep one
representative per duplicate group. The cluster pass turns the
intractable all-pairs O(n²) into Σ O(n_c²) with n_c ≈ n/m — the
paper's approximation: cross-cluster duplicates are deliberately
forfeited (recall is measured, tests/test_semdedup.py, and the
m=1 configuration is provably exhaustive, the IVF-gate technique).

Spark-first shape:

- clustering reuses the deterministic bounded-sample k-means of the
  IVF index (ann.train_centroids: hash-ordered sample, greedy
  max-min seeding, Lloyd refinement — one corpus pass);
- assignment is one broadcast-closure pandas-UDF matmul per Arrow
  batch (ann.assign_bucket_udf);
- the per-cluster pairwise search + union-find + keeper run in ONE
  ``groupBy(bucket).applyInPandas`` pass — the paper's per-cluster
  GPU matmul becomes a per-cluster Arrow/NumPy matmul, BLOCKED in
  1024-row strips so memory stays O(n_c·block), never O(n_c²); only
  above-threshold pairs materialize (sparse);
- at 100 TB: rows shuffle once, keyed by cluster; cluster sizes are
  k-means-balanced (≈n/m), m scales with the corpus so n_c stays
  bounded; output is (id, bucket, root, keep) — two longs, a short
  and a bool per row, never the embeddings.

Keeper policies (deterministic both ways):

- ``min_id`` — the canonical-assignment discipline shared with
  components.py: keep the minimum id of each duplicate group. This
  is the SQL-stateable policy the oracle gates (at m=1 the group
  structure equals the exact-cosine transitive closure, so the
  recursive-CTE twin of queries.SEMDEDUP_SQL reproduces root + keep
  bit-for-bit on the planted fixture);
- ``farthest`` — the paper's §3 choice: per group keep the member
  with the LOWEST cosine to its cluster centroid (retains the least
  prototypical example). Ties break on the quantized
  (round(cos·1e12), id) struct, so the choice is reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ann import assign_bucket_udf, train_centroids

_BLOCK = 1024


def _find(parent: np.ndarray, i: int) -> int:
    while parent[i] != i:
        parent[i] = parent[parent[i]]
        i = parent[i]
    return i


def _cluster_dedup(pdf: pd.DataFrame, threshold: float, keep: str, cn: np.ndarray, block: int = _BLOCK):
    ids = pdf["_cid"].to_numpy()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    X = np.stack(pdf["_ce"].to_numpy()[order]).astype(np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = len(ids)
    parent = np.arange(n)
    for s in range(0, n, block):
        blk = Xn[s : s + block]
        sims = blk @ Xn.T  # (block, n) strip — memory O(n·block)
        bi, bj = np.nonzero(sims >= threshold)
        for i, j in zip(bi + s, bj):
            if i < j:  # upper triangle only
                ri, rj = _find(parent, int(i)), _find(parent, int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)  # root = min index = min id
    roots = np.array([_find(parent, i) for i in range(n)])
    bucket = int(pdf["_cb"].iloc[0])
    if keep == "min_id":
        keep_mask = roots == np.arange(n)
    else:  # farthest-from-centroid per group, (cos_q, id) tie-break
        cos_q = np.round(Xn @ cn[bucket] * 1e12).astype(np.int64)
        keep_mask = np.zeros(n, bool)
        best: dict[int, int] = {}
        for i in range(n):  # ids ascending → first minimal cos_q wins
            r = int(roots[i])
            if r not in best or cos_q[i] < cos_q[best[r]]:
                best[r] = i
        keep_mask[list(best.values())] = True
    return pd.DataFrame(
        {
            "vec_id": ids,
            "bucket": np.full(n, bucket, dtype=np.int32),
            "root": ids[roots],
            "keep": keep_mask,
        }
    )


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    m: int = 8,
    threshold: float = 0.9,
    keep: str = "min_id",
    centroids: np.ndarray | None = None,
    block: int = _BLOCK,
) -> DataFrame:
    """(vec_id, bucket, root, keep) for every input row: its cluster,
    the canonical (minimum) id of its within-cluster duplicate group,
    and the keeper verdict. Total over the input; singletons keep
    themselves."""
    if keep not in ("min_id", "farthest"):
        raise ValueError(f"keep must be 'min_id' or 'farthest', got {keep!r}")
    if centroids is None:
        centroids = train_centroids(df, m, id_col, emb_col)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    assign = assign_bucket_udf(centroids)
    assigned = df.select(
        F.col(id_col).alias("_cid"),
        F.col(emb_col).alias("_ce"),
    ).withColumn("_cb", assign(F.col("_ce")))
    out_schema = "vec_id long, bucket int, root long, keep boolean"
    return (
        assigned.repartition("_cb")  # exempt from AQE coalescing (perf memory)
        .groupBy("_cb")
        .applyInPandas(
            lambda pdf: _cluster_dedup(pdf, threshold, keep, cn, block), out_schema
        )
        .withColumnRenamed("vec_id", id_col)
    )
