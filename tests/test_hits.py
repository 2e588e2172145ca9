"""HITS operator gate: the Spark exact-integer L1-normalized power
iteration must match a pure-Python big-int reference recurrence
exactly (the pagerank.py test discipline) — plus the structural
invariants Kleinberg 1999 predicts: bipartite graphs separate hubs
from authorities, nodes outside the link structure score 0, and a
zero-total side renormalizes to all-zero instead of dividing."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from fujishadergpu_spark.operators.hits import hits


def _py_hits(edges, node_ids, iters, scale=10**9):
    """Reference recurrence over Python ints (exact)."""
    e = sorted({(int(u), int(v)) for u, v in edges if u != v})
    ids = sorted(set(node_ids))
    n = len(ids)
    h = {i: scale // n for i in ids}
    a = {i: 0 for i in ids}
    for _ in range(iters):
        raw = {i: 0 for i in ids}
        for u, v in e:
            raw[v] += h[u]
        t = sum(raw.values())
        a = {i: ((raw[i] * scale) // t if t else 0) for i in ids}
        raw = {i: 0 for i in ids}
        for u, v in e:
            raw[u] += a[v]
        t = sum(raw.values())
        h = {i: ((raw[i] * scale) // t if t else 0) for i in ids}
    return {i: (a[i], h[i]) for i in ids}


def _run(spark, edges, node_ids=None, iters=6, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        None
        if node_ids is None
        else spark.createDataFrame([(int(i),) for i in node_ids], "id long")
    )
    rows = hits(e, nodes=nodes, iters=iters, **kw).collect()
    return {r["id"]: (r["auth_q9"], r["hub_q9"]) for r in rows}


def test_matches_reference_exactly(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (4, 2), (4, 3), (1, 4)]
    ids = list(range(6))  # node 5 isolated
    got = _run(spark, edges, node_ids=ids, iters=7)
    want = _py_hits(edges, ids, iters=7)
    assert got == want
    assert got[5] == (0, 0)


def test_bipartite_separates_hubs_from_authorities(spark):
    # 0..2 only point, 10..11 are only pointed at.
    edges = [(u, v) for u in (0, 1, 2) for v in (10, 11)]
    got = _run(spark, edges, iters=5)
    assert all(got[u][0] == 0 and got[u][1] > 0 for u in (0, 1, 2))
    assert all(got[v][1] == 0 and got[v][0] > 0 for v in (10, 11))
    # symmetric hubs tie exactly; symmetric authorities tie exactly
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]


def test_no_edges_all_zero(spark):
    got = _run(spark, [(0, 0)], node_ids=[0, 1, 2], iters=4)
    assert got == {0: (0, 0), 1: (0, 0), 2: (0, 0)}


def test_duplicate_and_self_links_dropped(spark):
    base = [(0, 1), (1, 2), (2, 0)]
    noisy = base + [(0, 1), (0, 0), (2, 2), (1, 2)]
    assert _run(spark, noisy, iters=5) == _run(spark, base, iters=5)


def test_iter_zero_is_initial_state(spark):
    got = _run(spark, [(0, 1)], node_ids=[0, 1, 2], iters=0)
    assert got == {i: (0, 10**9 // 3) for i in (0, 1, 2)}


def test_l1_mass_bound(spark):
    # After any round each side sums to <= scale (floor losses only).
    edges = [(u, (u * 5 + 2) % 11) for u in range(11)]
    got = _run(spark, edges, iters=6)
    assert 0 < sum(v[0] for v in got.values()) <= 10**9
    assert 0 < sum(v[1] for v in got.values()) <= 10**9


def test_bad_params_raise(spark):
    e = [(0, 1)]
    with pytest.raises(ValueError):
        _run(spark, e, iters=-1)
    with pytest.raises(ValueError):
        _run(spark, e, iters=1, scale=10**10)
    with pytest.raises(ValueError):
        _run(spark, e, iters=1, scale=0)


def test_node_universe_beyond_scale_loud_fails(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    with pytest.raises(ValueError, match="exceeds scale"):
        hits(e, nodes=nodes, iters=1, scale=10).collect()
