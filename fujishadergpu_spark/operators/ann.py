"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY.md training-data mandate):

- brute_force_topk: exact cosine top-k — the correctness baseline.
  Queries broadcast against the corpus; the dot product is built-in
  zip_with + aggregate (JVM-side, no Python), ranking is one window.
  This is exactly the kNN-over-cells pattern with "one cell".
- ivf_topk: IVF-style scale path — corpus bucketed by nearest
  centroid (Arrow pandas UDF, one matmul per batch), queries probe
  the nprobe nearest centroid buckets only. Centroids are a
  deterministic seeded sample of the corpus (id % stride), refined by
  a fixed number of Lloyd iterations computed distributedly; the
  centroid table is collected (it is tiny: m x dim) and broadcast —
  the reference's scatter-coarse-field pattern
  (reference core/dask_processor.py:1011-1025).

Ranking ties break on vec_id for determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda v: v * v), F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) exact top-k."""
    q = F.broadcast(
        queries.select(F.col(query_id_col).alias("_qid"), F.col(emb_col).alias("_qemb"))
    )
    c = corpus.select(F.col(id_col).alias("_nid"), F.col(emb_col).alias("_nemb"))
    j = q.crossJoin(c)
    if exclude_self:
        j = j.filter(F.col("_nid") != F.col("_qid"))
    w = Window.partitionBy("_qid").orderBy(F.desc("_cos"), F.asc("_nid"))
    return (
        j.withColumn("_cos", cosine_col(F.col("_qemb"), F.col("_nemb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_nid").alias("neighbor_id"),
            "rank",
            F.col("_cos").alias("cosine"),
        )
    )


# ------------------------------ IVF ----------------------------------

def train_centroids(
    corpus: DataFrame, m: int, id_col: str = "vec_id", emb_col: str = "embedding",
    iters: int = 2, sample_target: int = 65536,
) -> np.ndarray:
    """Deterministic k-means-lite over a BOUNDED sample, ONE corpus
    pass total: TakeOrdered on the id hash keeps the sample_target
    lowest-hash rows (per-partition top-K heaps + one merge — no full
    sort, no corpus.count() pre-scan; round 2 opened with a full count
    solely to size a stride). Seeds are the sample's m lowest-hash
    rows; ``iters`` Lloyd steps refine over the materialized sample, so
    training cost is O(sample) regardless of corpus size. Assignment
    via pandas-UDF matmul, means via groupBy on the posexploded
    embedding — aggregation JVM-side."""
    hkey = F.xxhash64(F.col(id_col))
    sample = (
        corpus.select(F.col(emb_col), hkey.alias("_hk"))
        .orderBy("_hk").limit(sample_target)
        .localCheckpoint()  # materialize once; seeds + Lloyd steps reuse it
    )
    # greedy max-min (k-center) seeding over a bounded sub-sample:
    # deterministic, and spreads seeds across the vector space (random
    # hash seeds can clump -> poor buckets -> recall loss)
    sub = np.stack(
        sample.orderBy("_hk").limit(min(4096, sample_target)).toPandas()[emb_col].to_numpy()
    ).astype(np.float64)
    sn = sub / np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
    chosen = [0]
    dmin = 1.0 - sn @ sn[0]
    for _ in range(1, min(m, len(sub))):
        nxt = int(np.argmax(dmin))
        chosen.append(nxt)
        dmin = np.minimum(dmin, 1.0 - sn @ sn[nxt])
    cents = sub[chosen]
    for _ in range(iters):
        assign = assign_bucket_udf(cents)
        assigned = sample.select(F.col(emb_col), assign(F.col(emb_col)).alias("_b"))
        means = (
            assigned.select("_b", F.posexplode(emb_col).alias("_i", "_v"))
            .groupBy("_b", "_i").agg(F.avg("_v").alias("_m"))
            .groupBy("_b").agg(F.array_sort(F.collect_list(F.struct("_i", "_m"))).alias("_row"))
            .select("_b", F.transform("_row", lambda s: s["_m"]).alias("_mean"))
            .collect()
        )
        for r in means:
            cents[r["_b"]] = np.asarray(r["_mean"], dtype=np.float64)
    return cents


def assign_bucket_udf(centroids: np.ndarray):
    """embedding -> nearest-centroid bucket (cosine), one matmul per
    Arrow batch; centroid matrix rides the UDF closure (broadcast)."""
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)

    @pandas_udf(IntegerType())
    def assign(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cn.T
        return pd.Series(np.argmax(sims, axis=1).astype(np.int32))

    return assign


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    m: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the IVF index on disk: vectors partitioned into
    ``_b=<bucket>/`` directories plus the tiny centroid table. A probe
    then reads ONLY the probed buckets' files — real partition pruning
    at the scan (the 10^12-row posture the bucket equi-join of
    ``ivf_topk`` only approximates in-memory). Returns the centroids."""
    if centroids is None:
        centroids = train_centroids(corpus, m, id_col, emb_col)
    assign = assign_bucket_udf(centroids)
    bucketed = corpus.select(
        F.col(id_col), F.col(emb_col), assign(F.col(emb_col)).alias("_b")
    )
    bucketed.write.mode("overwrite").partitionBy("_b").parquet(f"{path}/vectors")
    corpus.sparkSession.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centroids)],
        "_b int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def ivf_probe_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Probe a written IVF index with file-level partition pruning.

    The query batch is collected (the ANN search pattern: queries are
    tiny vs the corpus — for corpus-sized query sets use ``ivf_topk``'s
    equi-join instead); its union of probed buckets becomes a LITERAL
    ``_b IN (...)`` predicate, which Catalyst turns into
    PartitionFilters on the parquet scan — only the probed bucket
    directories are read (plan-pinned in tests/test_ann.py).
    """
    cents_rows = spark.read.parquet(f"{path}/centroids").orderBy("_b").collect()
    centroids = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in cents_rows])
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    qpdf = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(emb_col).alias("_qemb")
    ).toPandas()
    qm = np.stack(qpdf["_qemb"].to_numpy()).astype(np.float64)
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    order = np.argsort(-(qm @ cn.T), axis=1)[:, :nprobe]
    probe_rows = [
        (int(qpdf["_qid"].iloc[i]), [float(v) for v in qpdf["_qemb"].iloc[i]], int(b))
        for i in range(len(qpdf))
        for b in order[i]
    ]
    q = spark.createDataFrame(probe_rows, "_qid long, _qemb array<float>, _b int")
    buckets = sorted({int(b) for b in order.ravel()})
    vec = spark.read.parquet(f"{path}/vectors").filter(F.col("_b").isin(buckets))
    j = F.broadcast(q).join(
        vec.select(F.col(id_col).alias("_nid"), F.col(emb_col).alias("_nemb"), "_b"), "_b"
    )
    if exclude_self:
        j = j.filter(F.col("_nid") != F.col("_qid"))
    w = Window.partitionBy("_qid").orderBy(F.desc("_cos"), F.asc("_nid"))
    return (
        j.withColumn("_cos", cosine_col(F.col("_qemb"), F.col("_nemb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_nid").alias("neighbor_id"),
            "rank",
            F.col("_cos").alias("cosine"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: np.ndarray | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF ANN: probe the nprobe nearest buckets per query.

    At 10^12 scale the bucketed corpus is written partitioned by
    bucket so probes prune partitions; here the bucket equi-join
    expresses the same pruning.
    """
    if centroids is None:
        centroids = train_centroids(corpus, m, id_col, emb_col)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    assign = assign_bucket_udf(centroids)
    bucketed = corpus.select(
        F.col(id_col).alias("_nid"), F.col(emb_col).alias("_nemb"), assign(F.col(emb_col)).alias("_b")
    )

    @pandas_udf("array<int>")
    def probe_udf(emb: pd.Series) -> pd.Series:
        mm = np.stack(emb.to_numpy()).astype(np.float64)
        mm = mm / np.maximum(np.linalg.norm(mm, axis=1, keepdims=True), 1e-12)
        sims = mm @ cn.T
        order = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(emb_col).alias("_qemb"),
        F.explode(probe_udf(F.col(emb_col))).alias("_b"),
    )
    j = F.broadcast(q).join(bucketed, "_b")
    if exclude_self:
        j = j.filter(F.col("_nid") != F.col("_qid"))
    w = Window.partitionBy("_qid").orderBy(F.desc("_cos"), F.asc("_nid"))
    return (
        j.withColumn("_cos", cosine_col(F.col("_qemb"), F.col("_nemb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_nid").alias("neighbor_id"),
            "rank",
            F.col("_cos").alias("cosine"),
        )
    )
