"""Incremental cross-snapshot dedup (operators/increment.py): the
exact / near / in-batch verdicts, totality, exact-only mode, and the
order-invariance property that makes the reversed-token plant a
guaranteed near hit."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.increment import (
    exact_snapshot,
    incremental_dedup,
    simhash_snapshot,
)

SEEN = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "spark shuffles data between stages when keys move around"),
    (4, "entirely different corpus content sits right here today"),
]


@pytest.fixture(scope="module")
def snaps(spark):
    seen = spark.createDataFrame(SEEN, ["doc_id", "text"])
    return exact_snapshot(seen), simhash_snapshot(seen)


def _verdicts(spark, snaps, batch):
    df = spark.createDataFrame(batch, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in incremental_dedup(df, snaps[0], snaps[1]).collect()
    }


def test_exact_copy_is_seen(spark, snaps):
    out = _verdicts(spark, snaps, [(11, SEEN[0][1])])
    r = out[11]
    assert r["exact_seen"] and not r["batch_dup"] and not r["keep"]
    # exact copy is also a hamming-0 near hit
    assert r["near_seen"]


def test_normalization_catches_case_and_whitespace(spark, snaps):
    out = _verdicts(spark, snaps, [(11, "  THE quick   brown fox jumps over the lazy dog tonight ")])
    assert out[11]["exact_seen"]


def test_reversed_tokens_near_but_not_exact(spark, snaps):
    rev = " ".join(reversed(SEEN[1][1].split()))
    r = _verdicts(spark, snaps, [(11, rev)])[11]
    assert not r["exact_seen"] and r["near_seen"] and not r["keep"]


def test_batch_dup_flags_higher_id_only(spark, snaps):
    out = _verdicts(
        spark, snaps, [(11, "novel text alpha beta"), (12, "novel text alpha beta")]
    )
    assert not out[11]["batch_dup"] and out[11]["keep"]
    assert out[12]["batch_dup"] and not out[12]["keep"]


def test_novel_doc_keeps(spark, snaps):
    r = _verdicts(spark, snaps, [(11, "zq xw vv uu tt ss rr qq pp oo nn mm")])[11]
    assert not (r["exact_seen"] or r["near_seen"] or r["batch_dup"])
    assert r["keep"]


def test_exact_only_mode(spark, snaps):
    df = spark.createDataFrame(
        [(11, " ".join(reversed(SEEN[0][1].split())))], ["doc_id", "text"]
    )
    r = incremental_dedup(df, snaps[0], None).collect()[0]
    assert not r["near_seen"] and r["keep"]  # near gate off


def test_totality_over_batch(spark, snaps):
    batch = [(i, f"doc number {i} words here") for i in range(20)]
    out = incremental_dedup(
        spark.createDataFrame(batch, ["doc_id", "text"]), snaps[0], snaps[1]
    )
    assert out.count() == 20
    assert out.select("doc_id").distinct().count() == 20


def test_empty_doc_covered_by_exact_gate(spark, snaps):
    # zero-token docs get no SimHash (module contract) but still get a
    # total verdict; two empty docs in one batch dedup against each other
    out = _verdicts(spark, snaps, [(11, ""), (12, "   ")])
    assert not out[11]["near_seen"] and out[11]["keep"]
    assert out[12]["batch_dup"]  # "" and "   " normalize identically


def test_snapshot_tables_are_compact(spark):
    seen = spark.createDataFrame(SEEN + [(6, SEEN[0][1])], ["doc_id", "text"])
    ex, sh = exact_snapshot(seen), simhash_snapshot(seen)
    assert ex.columns == ["_h", "_len"] and ex.count() == 3  # distinct texts
    assert sh.columns == ["_sh"] and sh.count() == 3


def test_corpus_diff_statuses(spark):
    from fujishadergpu_spark.operators.increment import corpus_diff

    old = spark.createDataFrame(
        [(0, "gone"), (1, "same text"), (2, "will change")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "  Same   TEXT "), (2, "did change"), (3, "brand new")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # normalization makes 1 unchanged despite case/whitespace noise
    assert out == {0: "removed", 1: "unchanged", 2: "changed", 3: "added"}
    # raw mode sees the byte difference
    raw = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, normalize=False).collect()
    }
    assert raw[1] == "changed"
