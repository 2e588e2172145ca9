"""Dedup-operator tests: planted duplicates must be found, clean
corpora must stay clean, pair outputs deterministic."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # plant: exact dup of doc 0, near-dup of doc 1 (one token changed)
    base = {r["doc_id"]: r["text"] for r in docs.filter("doc_id IN (0, 1)").collect()}
    near = base[1].split()
    near[len(near) // 2] = "CHANGED"
    extra = spark.createDataFrame(
        [(100000, base[0]), (100001, " ".join(near))], "doc_id long, text string"
    )
    return docs.unionByName(extra)


def test_exact_dedup(spark, docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups, "doc_id")
    n_in = docs_with_dups.count()
    rows = out.collect()
    assert sum(r["dup_count"] for r in rows) == n_in
    dups = [r for r in rows if r["dup_count"] > 1]
    assert len(dups) == 1 and dups[0]["canonical_id"] == 0 and dups[0]["dup_count"] == 2


def test_minhash_lsh_finds_near_dup(spark, docs_with_dups):
    pairs = dedup.minhash_lsh_pairs(docs_with_dups, "doc_id", threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100000) in got  # exact dup (jaccard 1.0)
    assert (1, 100001) in got  # near dup
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_simhash_finds_near_dup(spark, docs_with_dups):
    pairs = dedup.simhash_pairs(docs_with_dups, "doc_id", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 100000) in got
    ham = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert ham[(0, 100000)] == 0


def test_embedding_near_dup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dup = emb.filter("vec_id = 0").select(
        F.lit(999999).cast("long").alias("vec_id"), "embedding", "label"
    )
    both = emb.unionByName(dup)
    pairs = dedup.embedding_near_dup(both, "vec_id", dim=64, threshold=0.999).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 999999) in got
