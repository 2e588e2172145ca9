"""Winnowing fingerprints (operators/winnow.py) vs an independent
pure-Python reference: selection parity, the w+k-1 local match
guarantee, rightmost tie-break, density, and plan shape."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.winnow import winnow_fingerprints

P31 = (1 << 31) - 1


def _poly31(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * 1000003 + ord(c)) % P31
    return acc


def _ref_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    """Reference winnowing: (pos, hash) of the min-hash gram of each
    w-window, rightmost on ties. pos is 1-based."""
    n = len(text) - k + 1
    if n < 1:
        return set()
    hs = [(_poly31(text[i : i + k]), i + 1) for i in range(n)]
    out = set()
    for j in range(0, n - w + 1):
        win = hs[j : j + w]
        m = min(h for h, _ in win)
        pos = max(p for h, p in win if h == m)  # rightmost minimal
        out.add((pos, m))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "aaaaaaaaaaaa"),   # constant text: every gram hash ties
    (3, "tiny"),           # shorter than k: zero grams
    (4, ""),               # empty
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_matches_reference(spark):
    got = {}
    for r in winnow_fingerprints(_df(spark), k=5, w=4).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["gram_hash"]))
    for doc_id, text in DOCS:
        assert got.get(doc_id, set()) == _ref_winnow(text, 5, 4), doc_id


def test_rightmost_tie_break(spark):
    """Constant text: all gram hashes equal, so each window selects
    its RIGHTMOST gram — positions w..n."""
    rows = winnow_fingerprints(_df(spark), k=3, w=4).where("doc_id = 2").collect()
    n = len("aaaaaaaaaaaa") - 3 + 1  # 10 grams
    assert sorted(r["pos"] for r in rows) == list(range(4, n + 1))
    assert len({r["gram_hash"] for r in rows}) == 1


def test_short_docs_have_zero_fingerprints(spark):
    rows = winnow_fingerprints(_df(spark), k=5, w=4).where("doc_id >= 3").collect()
    assert rows == []


def test_local_match_guarantee(spark):
    """Two docs sharing a substring of length w + k - 1 must share at
    least one fingerprint hash (Schleimer Theorem: guarantee t=w+k-1)."""
    k, w = 5, 4
    shared = "zqxjkvbwpm"  # length 10 >= w + k - 1 = 8, distinctive
    df = spark.createDataFrame(
        [(0, f"left context {shared} tail one"), (1, f"other {shared} trailer")],
        "doc_id long, text string",
    )
    fp = winnow_fingerprints(df, k=k, w=w)
    h0 = {r["gram_hash"] for r in fp.where("doc_id = 0").collect()}
    h1 = {r["gram_hash"] for r in fp.where("doc_id = 1").collect()}
    assert h0 & h1


def test_density_bound(spark):
    """Fingerprints per doc <= number of windows, and >= 1 per
    disjoint window span (selection can't skip w consecutive grams)."""
    rows = winnow_fingerprints(_df(spark), k=5, w=4).where("doc_id = 0").collect()
    n = len(DOCS[0][1]) - 5 + 1
    n_windows = n - 4 + 1
    assert 1 <= len(rows) <= n_windows
    # no gap of w or more between consecutive selected positions
    pos = sorted(r["pos"] for r in rows)
    assert all(b - a <= 4 for a, b in zip(pos, pos[1:]))


def test_rejects_bad_params(spark):
    with pytest.raises(ValueError, match="positive"):
        winnow_fingerprints(_df(spark), k=0, w=4)


def test_single_doc_bounded_exchange(spark):
    """The only shuffle is the per-document window partition (doc_id,
    high-cardinality) — exactly one Exchange in the plan."""
    plan = (
        winnow_fingerprints(_df(spark), 5, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") <= 2  # window + distinct reuse
    assert "hashpartitioning(doc_id" in plan


# ---------------------- MOSS match pairs -------------------------------

def test_match_pairs_guarantee_detects_long_shared_substring(spark):
    from fujishadergpu_spark.operators.winnow import winnow_match_pairs

    shared = "abcdefghijk"  # length k + w - 1 = 11 -> guaranteed hit
    docs = spark.createDataFrame(
        [(1, "xxxx" + shared + "yyyy"), (2, "qqq" + shared + "zzzzz")],
        ["doc_id", "text"],
    )
    out = winnow_match_pairs(docs, k=8, w=4, min_shared=1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2) and r["n_shared"] >= 1


def test_match_pairs_disjoint_docs_no_pair(spark):
    from fujishadergpu_spark.operators.winnow import winnow_match_pairs

    docs = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd eeee"), (2, "vvvv wwww xxxx yyyy zzzz")],
        ["doc_id", "text"],
    )
    assert winnow_match_pairs(docs, k=8, w=4, min_shared=1).count() == 0


def test_match_pairs_max_df_drops_boilerplate_hash(spark):
    from fujishadergpu_spark.operators.winnow import winnow_match_pairs

    boiler = "common boilerplate footer line"
    docs = spark.createDataFrame(
        [(i, f"unique{i}content{i}here{i} " + boiler) for i in range(6)],
        ["doc_id", "text"],
    )
    # without the cap every pair matches on the footer
    assert winnow_match_pairs(docs, k=8, w=4, min_shared=1, max_df=None).count() == 15
    # a df cap below the corpus size kills the footer hashes
    assert winnow_match_pairs(docs, k=8, w=4, min_shared=1, max_df=3).count() == 0


def test_match_pairs_min_shared_threshold(spark):
    from fujishadergpu_spark.operators.winnow import winnow_match_pairs

    shared = "abcdefghijk"
    docs = spark.createDataFrame(
        [(1, shared + " tail one"), (2, shared + " other ending")],
        ["doc_id", "text"],
    )
    n = winnow_match_pairs(docs, k=8, w=4, min_shared=1).collect()[0]["n_shared"]
    assert winnow_match_pairs(docs, k=8, w=4, min_shared=n).count() == 1
    assert winnow_match_pairs(docs, k=8, w=4, min_shared=n + 1).count() == 0


# ---------------------- arrow fast path ---------------------------------

def test_arrow_impl_row_identical_to_expr(spark):
    from fujishadergpu_spark.operators.winnow import winnow_fingerprints

    import random

    rng = random.Random(7)
    docs = [
        (i, " ".join(rng.choice("abcdefg hij klmno päge ünïcode".split())
                      for _ in range(rng.randint(0, 60))))
        for i in range(40)
    ] + [(100, ""), (101, "short")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    a = set(map(tuple, winnow_fingerprints(df, k=8, w=4).collect()))
    b = set(map(tuple, winnow_fingerprints(df, k=8, w=4, impl="arrow").collect()))
    assert a == b and len(a) > 0


def test_arrow_impl_zero_exchange_plan(spark):
    from fujishadergpu_spark.operators.winnow import winnow_fingerprints

    df = spark.createDataFrame([(1, "abcdefghijkl")], ["doc_id", "text"])
    plan = (
        winnow_fingerprints(df, impl="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange hashpartitioning" not in plan  # per-doc local work


def test_winnow_impl_validation(spark):
    from fujishadergpu_spark.operators.winnow import winnow_fingerprints

    import pytest as _pt

    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        winnow_fingerprints(df, impl="nope").collect()
