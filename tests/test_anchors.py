"""anchor_topk gate: Spark top-k anchor terms must match a pure-Python
reference exactly (count DESC, term ASC determinism), plus the
boundary behaviors — occurrence (not link) counting, empty/garbage
anchors dropped, fewer-than-k targets emit fewer rows."""

import pytest

from fujishadergpu_spark.operators.anchors import anchor_topk

import re


def _py_topk(links, k):
    counts = {}
    for _src, dst, anchor in links:
        for t in re.split(r"[^a-z0-9]+", anchor.lower()):
            if t:
                counts[(dst, t)] = counts.get((dst, t), 0) + 1
    out = []
    for dst in sorted({d for d, _ in counts}):
        terms = sorted(
            ((t, n) for (d, t), n in counts.items() if d == dst),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        out += [(dst, i + 1, t, n) for i, (t, n) in enumerate(terms)]
    return sorted(out)


def _run(spark, links, k=3):
    df = spark.createDataFrame(links, "src long, dst long, anchor string")
    rows = anchor_topk(df, k=k).collect()
    return sorted((r["target"], r["rank"], r["term"], r["n"]) for r in rows)


LINKS = [
    (1, 10, "Home Page"),
    (2, 10, "home"),
    (3, 10, "best home DEALS deals"),
    (4, 10, "deals"),
    (5, 11, "Contact-Us!"),
    (6, 11, ""),
    (7, 12, "   ...   "),
]


def test_matches_reference_exactly(spark):
    assert _run(spark, LINKS, k=2) == _py_topk(LINKS, 2)
    assert _run(spark, LINKS, k=10) == _py_topk(LINKS, 10)


def test_tie_breaks_lexicographic(spark):
    got = _run(spark, [(1, 5, "beta alpha"), (2, 5, "alpha beta")], k=1)
    assert got == [(5, 1, "alpha", 2)]


def test_occurrences_not_links(spark):
    got = _run(spark, [(1, 5, "x x x y")], k=2)
    assert got == [(5, 1, "x", 3), (5, 2, "y", 1)]


def test_garbage_only_anchor_emits_nothing(spark):
    assert _run(spark, [(1, 9, "!!! ---"), (2, 9, "")]) == []


def test_bad_k_raises(spark):
    df = spark.createDataFrame([(1, 2, "a")], "src long, dst long, anchor string")
    with pytest.raises(ValueError):
        anchor_topk(df, k=0)
