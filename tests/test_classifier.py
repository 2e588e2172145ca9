"""Hashed-LR quality classifier (operators/classifier): the trained
model must separate the label it was fit on far above the base rate,
train deterministically on any layout, stay bounded, and score
totally."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.classifier import (
    hashed_tf,
    poly31_py,
    score_lr,
    train_lr,
    train_stats,
)

SF = "/root/testdata/sf0.01"
B = 512
KW_BUCKETS = sorted(poly31_py(t) % B for t in ("spark", "data", "query"))


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _labeled(spark):
    d = _docs(spark)
    kw = (
        hashed_tf(d, buckets=B)
        .where(F.col("bucket").isin(KW_BUCKETS))
        .groupBy("_id")
        .agg(F.sum("tf_q").alias("s"))
        .select(F.col("_id").alias("doc_id"), "s")
    )
    return d.join(kw, "doc_id", "left").withColumn(
        "label", (F.coalesce("s", F.lit(0)) >= 95000).cast("int")
    )


def test_training_separates_the_label(spark):
    d = _labeled(spark)
    model = train_lr(d, "label", buckets=B, lr=2.0, steps=3)
    scored = score_lr(d, model, buckets=B)
    joined = scored.join(d.select("doc_id", "label"), "doc_id")
    acc = joined.select(
        F.avg((F.col("pred") == (F.col("label") == 1)).cast("double")).alias("a")
    ).collect()[0]["a"]
    base = joined.select(F.avg(F.col("label").cast("double"))).collect()[0][0]
    base = max(base, 1 - base)
    # standardized full-batch GD separates the keyword-frequency rule
    # far above the ~0.51 base rate in three steps (raw-count GD
    # provably stalls at base on this fixture — the A9 pre-pass is
    # what makes the loop converge)
    assert acc > 0.9, (acc, base)
    assert base < 0.6


def test_training_is_layout_invariant(spark):
    d = _labeled(spark)
    a = train_lr(d, "label", buckets=256, steps=2)
    b = train_lr(d.repartition(17, "doc_id"), "label", buckets=256, steps=2)
    assert a == b  # exact int64 model equality, any partitioning


def test_model_is_bounded_and_scoring_total(spark):
    d = _labeled(spark)
    model = train_lr(d, "label", buckets=64, steps=1)
    w, w0 = model
    assert 0 < len(w) <= 64
    stats = train_stats(d, buckets=64)
    extra = d.sparkSession.createDataFrame(
        [(10_001, ""), (10_002, "   ")], "doc_id long, text string"
    )
    scored = {
        r["doc_id"]: r
        for r in score_lr(
            _docs(d.sparkSession).unionByName(extra), model, stats=stats, buckets=64
        ).collect()
    }
    assert len(scored) == 502  # token-less docs keep a row
    # token-less docs get the pure bias margin, identical for both
    assert scored[10_001]["score_q12"] == scored[10_002]["score_q12"]


def test_rejects_bad_steps(spark):
    with pytest.raises(ValueError):
        train_lr(_labeled(spark), "label", steps=0)


def test_features_are_quantized_frequencies(spark):
    d = _docs(spark).limit(20)
    occ = hashed_tf(d, buckets=32).collect()
    assert all(0 <= r["bucket"] < 32 for r in occ)
    assert all(1 <= r["tf_q"] <= 1_000_000 for r in occ)
    # per-doc frequencies sum to ~1e6 (quantization slack < 1 per bucket)
    by_doc = {}
    for r in occ:
        by_doc.setdefault(r["_id"], []).append(r["tf_q"])
    for vals in by_doc.values():
        assert abs(sum(vals) - 1_000_000) <= len(vals)


def test_scoring_corpus_missing_trained_buckets(spark):
    """Scoring a corpus that lacks some trained buckets with the
    default (corpus-own) stats must not crash: an absent bucket's
    moments default to what _bucket_stats would report for an all-zero
    feature (mu 0, sigma at the floor)."""
    model = train_lr(_labeled(spark), "label", buckets=B, steps=1)
    tiny = spark.createDataFrame(
        [(900001, "zzqy"), (900002, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["score_q12"] for r in score_lr(tiny, model, buckets=B).collect()}
    assert set(out) == {900001, 900002}  # total, no KeyError
