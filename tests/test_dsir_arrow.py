"""The DSIR arrow fast path must be row-identical to the expr plan.

The arrow path removes the interpreted poly31 char fold (and the
per-gram concat HOFs) from the hot path; the expr plan remains the
cross-engine oracle statement. Equality here is exact — same rows,
same weights — over a corpus that exercises the edge cases: empty
text, single-token docs (no bigrams), repeated grams, NULL text,
multi-space/newline separators, and non-ASCII BMP characters.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.dedup import poly31_hash_np
from fujishadergpu_spark.operators.dsir import dsir_weights


def _poly31_ref(s: str) -> int:
    import numpy as np

    acc = 0
    for u in np.frombuffer(s.encode("utf-16-le"), dtype="<u2"):
        acc = (acc * 1000003 + int(u)) % ((1 << 31) - 1)
    return acc


def test_poly31_np_matches_scalar_fold():
    strs = ["", "a", "spark", "héllo wörld", "中文 token", "x" * 300,
            "a b", " ", "é中"]
    h, lens = poly31_hash_np(strs)
    for s, hv, lv in zip(strs, h, lens):
        assert hv == _poly31_ref(s), s
        assert lv == len(s.encode("utf-16-le")) // 2


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "dup dup dup dup"),
        (6, "a  b\n\nc d  "),
        (7, "héllo wörld héllo wörld tokens everywhere"),
        (8, "one two three four five six seven eight nine ten"),
        (10, "the quick brown fox jumps over the lazy dog"),
        (15, "target like text with the and of grams"),
        (20, "another target slice document with shared grams"),
        (25, "shared grams with the raw side of the corpus"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_arrow_equals_expr(spark, corpus):
    tgt = corpus.where(F.col("doc_id") % 5 == 0)
    expr = dsir_weights(corpus, tgt, impl="expr").orderBy("doc_id").collect()
    arrow = dsir_weights(corpus, tgt, impl="arrow").orderBy("doc_id").collect()
    assert [tuple(r) for r in expr] == [tuple(r) for r in arrow]
    # sanity: every doc present, empty/null docs weigh 0
    by_id = {r["doc_id"]: r for r in arrow}
    assert set(by_id) == {1, 2, 3, 4, 5, 6, 7, 8, 10, 15, 20, 25}
    assert by_id[3]["n_grams"] == 0 and by_id[3]["weight_q6"] == 0
    assert by_id[4]["n_grams"] == 0 and by_id[4]["weight_q6"] == 0
    # single-token doc: exactly one gram (no bigram)
    assert by_id[2]["n_grams"] == 1
