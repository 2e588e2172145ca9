"""Edit-distance candidate verification (operators/editsim.py):
planted near-dups pass, unrelated docs don't pair, the length-band
prefilter is sound, and the ASCII precondition the DuckDB oracle
depends on holds in the fixture."""

import pytest

from fujishadergpu_spark.operators.editsim import (
    edit_similarity_pairs,
    verify_pairs_edit_similarity,
)

BASE = "the quick brown fox jumps over the lazy dog again and again today"
DOCS = [
    (0, BASE),
    (1, BASE.replace("lazy", "hazy")),      # 1-char edit: near-dup
    (2, "completely different words about spark partitions and shuffles"),
    (3, BASE + " " + BASE + " " + BASE),    # shares grams, 3x length: band-excluded
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_near_dup_confirmed_and_unrelated_rejected(spark):
    rows = {
        (r["id_a"], r["id_b"]): r.asDict()
        for r in edit_similarity_pairs(_df(spark), sim_threshold=0.8).collect()
    }
    assert (0, 1) in rows
    assert rows[(0, 1)]["dist"] == 1
    assert rows[(0, 1)]["edit_sim"] == 1.0 - 1.0 / len(BASE)
    assert all(2 not in pair for pair in rows)


def test_length_band_excludes_before_dp(spark):
    # doc 3 shares every gram of doc 0 (jaccard well above the
    # candidate threshold) but is 3x its length: at sim 0.8 the band
    # |la-lb| <= 0.2*max rules it out, so it must not appear
    pairs = {
        (r["id_a"], r["id_b"])
        for r in edit_similarity_pairs(
            _df(spark), sim_threshold=0.8, candidate_threshold=0.1
        ).collect()
    }
    assert (0, 3) not in pairs and (1, 3) not in pairs
    # the band is sound, not just convenient: edit_sim(0,3) is
    # genuinely below 0.8 (lev >= len diff = 2*len(BASE)+2)
    lo = edit_similarity_pairs(
        _df(spark), sim_threshold=0.3, candidate_threshold=0.1
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["edit_sim"] for r in lo}
    assert got[(0, 3)] < 0.8


def test_verify_accepts_external_candidates(spark):
    cands = spark.createDataFrame([(0, 2)], "id_a long, id_b long")
    out = verify_pairs_edit_similarity(_df(spark), cands, 0.1).collect()
    # unrelated pair still gets a row at a permissive threshold:
    # verification is of the CANDIDATE SET, it doesn't re-filter inputs
    assert len(out) == 1 and out[0]["id_a"] == 0 and out[0]["id_b"] == 2


def test_threshold_validation(spark):
    with pytest.raises(ValueError, match="sim_threshold"):
        verify_pairs_edit_similarity(
            _df(spark), _df(spark).select("doc_id"), 0.0
        )


def test_fixture_is_ascii_so_the_oracle_unit_matches(spark):
    """Spark levenshtein counts code points, DuckDB bytes; the driver
    oracle for edit_sim_pairs_docs is valid because the fixture text
    is pure ASCII — pin that precondition."""
    from pyspark.sql import functions as F

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = d.filter(F.octet_length("text") != F.length("text")).count()
    assert n == 0
