"""SemDeDup (operators/semdedup): pruned-config recall vs the exact
pair ground truth, keeper-policy semantics, blocking correctness, and
layout invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import fujishadergpu_spark.operators.semdedup as sd

SF = "/root/testdata/sf0.01"


def _planted(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    tw = (
        a.join(b, F.col("a.vec_id") + 1 == F.col("b.vec_id"))
        .filter(F.col("a.vec_id") % 5 == 0)
        .select(
            (-F.col("a.vec_id") - 1).alias("vec_id"),
            F.zip_with(
                "a.embedding", "b.embedding", lambda x, y: x * 0.97 + y * 0.08
            ).alias("embedding"),
        )
    )
    return e.unionByName(tw)


def _dup_ids(df):
    return {r["vec_id"] for r in df.collect() if not r["keep"]}


def test_pruned_recall_on_planted_twins(spark):
    c = _planted(spark)
    exact = _dup_ids(
        sd.semdedup(c, m=1, threshold=0.9, centroids=np.eye(1, 64))
    )
    pruned = _dup_ids(sd.semdedup(c, m=8, threshold=0.9))
    assert exact, "fixture must contain planted duplicates"
    # a planted twin at cos ~0.97 lands in its source's cluster almost
    # always; SemDeDup's forfeited recall is only cross-cluster pairs
    recall = len(pruned & exact) / len(exact)
    assert recall >= 0.9, recall
    assert pruned <= exact or len(pruned - exact) == 0  # no false dups


def test_total_and_singletons_keep_themselves(spark):
    c = _planted(spark)
    rows = sd.semdedup(c, m=1, threshold=0.9, centroids=np.eye(1, 64)).collect()
    assert len(rows) == c.count()
    for r in rows:
        if r["root"] == r["vec_id"]:
            assert r["keep"] is True


def test_farthest_policy_keeps_one_least_prototypical(spark):
    c = _planted(spark)
    cents = np.eye(1, 64)
    out = sd.semdedup(
        c, m=1, threshold=0.9, keep="farthest", centroids=cents
    ).collect()
    by_root = {}
    for r in out:
        by_root.setdefault(r["root"], []).append(r)
    for members in by_root.values():
        assert sum(1 for r in members if r["keep"]) == 1
    # group structure identical to min_id policy; only the keeper moves
    minid = sd.semdedup(c, m=1, threshold=0.9, keep="min_id", centroids=cents)
    a = sorted((r["vec_id"], r["root"]) for r in out)
    b = sorted((r["vec_id"], r["root"]) for r in minid.collect())
    assert a == b


def test_blocked_strips_match_unblocked(spark):
    c = _planted(spark).limit(300)
    cents = np.eye(1, 64)
    full = sorted(
        (r["vec_id"], r["root"], r["keep"])
        for r in sd.semdedup(c, m=1, threshold=0.9, centroids=cents).collect()
    )
    blocked = sorted(
        (r["vec_id"], r["root"], r["keep"])
        for r in sd.semdedup(
            c, m=1, threshold=0.9, centroids=cents, block=37  # force many strips
        ).collect()
    )
    assert full == blocked


def test_layout_invariance(spark):
    c = _planted(spark)
    a = sorted(
        (r["vec_id"], r["root"], r["keep"])
        for r in sd.semdedup(c, m=1, threshold=0.9, centroids=np.eye(1, 64)).collect()
    )
    b = sorted(
        (r["vec_id"], r["root"], r["keep"])
        for r in sd.semdedup(
            c.repartition(11, "vec_id"), m=1, threshold=0.9, centroids=np.eye(1, 64)
        ).collect()
    )
    assert a == b


def test_rejects_bad_keep_policy(spark):
    with pytest.raises(ValueError):
        sd.semdedup(_planted(spark), keep="random")
