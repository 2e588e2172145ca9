"""Integer fixed-point PageRank (operators/pagerank.py).

Oracle: a driver-side pure-Python implementation of the SAME exact
integer recurrence (floor divisions over Python ints). Because the
operator's arithmetic is order-independent by construction, equality
here is EXACT row equality, not approximate — any drift is a bug.
The gate twin (web_pagerank in queries.py) re-states the recurrence
as a DuckDB unrolled-CTE chain; here we pin the operator itself on
adversarial topologies: dangling sinks, isolated nodes, hubs, and
partitioning invariance.
"""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.pagerank import pagerank


def _py_pagerank(edges, node_ids, iters, num=85, den=100, scale=10**12, seeds=None):
    """Reference recurrence over Python ints (exact); ``seeds``
    switches to TrustRank exactly as the operator does."""
    e = sorted({(int(u), int(v)) for u, v in edges if u != v})
    ids = sorted(set(node_ids))
    seed = set(ids) if seeds is None else {i for i in ids if i in set(seeds)}
    out = {i: 0 for i in ids}
    adj = {}
    for u, v in e:
        out[u] += 1
        adj.setdefault(u, []).append(v)
    s = len(seed)
    r = {i: (scale // s if i in seed else 0) for i in ids}
    base = ((den - num) * scale) // (den * s)
    for _ in range(iters):
        dt = sum(r[i] for i in ids if out[i] == 0)
        dang = (num * dt) // (den * s)
        nxt = {i: (base + dang if i in seed else 0) for i in ids}
        for u in ids:
            if out[u]:
                c = (num * r[u]) // (den * out[u])
                for v in adj[u]:
                    nxt[v] += c
        r = nxt
    return {i: (out[i], r[i]) for i in ids}


def _run(spark, edges, node_ids=None, iters=6, seeds=None, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        None
        if node_ids is None
        else spark.createDataFrame([(int(i),) for i in node_ids], "id long")
    )
    tele = (
        None
        if seeds is None
        else spark.createDataFrame([(int(i),) for i in seeds], "id long")
    )
    rows = pagerank(e, nodes=nodes, iters=iters, teleport=tele, **kw).collect()
    return {r["id"]: (r["out_deg"], r["rank_q12"]) for r in rows}


def test_matches_python_reference_exactly(spark):
    # 12 nodes, pseudo-random-ish deterministic edges, one dangling
    # node (9), one isolated node (11, via the explicit universe).
    edges = [
        (u, (u * 7 + j * 5) % 11)
        for u in range(11)
        for j in (1, 2)
        if u != 9 and u != (u * 7 + j * 5) % 11
    ]
    ids = list(range(12))
    got = _run(spark, edges, node_ids=ids, iters=7)
    want = _py_pagerank(edges, ids, iters=7)
    assert got == want


def test_dangling_sink_collects_mass(spark):
    # Star into a sink: 0..4 all link to 5; 5 links nowhere. The sink
    # must outrank every spoke, and the result must match the
    # reference exactly (dangling redistribution path exercised).
    edges = [(u, 5) for u in range(5)]
    ids = list(range(6))
    got = _run(spark, edges, node_ids=ids, iters=8)
    assert got == _py_pagerank(edges, ids, iters=8)
    sink = got[5][1]
    assert all(sink > got[u][1] for u in range(5))


def test_isolated_nodes_hold_teleport_mass(spark):
    # Nodes 10, 11 have no edges at all: they still appear, with
    # out_deg 0 and the base + dangling share only.
    edges = [(0, 1), (1, 0)]
    got = _run(spark, edges, node_ids=[0, 1, 10, 11], iters=4)
    assert set(got) == {0, 1, 10, 11}
    assert got[10] == got[11]
    assert got[10][0] == 0
    assert got[0][1] > got[10][1]


def test_partitioning_invariance(spark):
    # The exact-integer contract: identical output whatever the input
    # partitioning (order-free integer sums, no float path).
    edges = [(u, (u * 13 + 3) % 40) for u in range(40)] + [
        (u, (u * 29 + 7) % 40) for u in range(40)
    ]
    e1 = spark.createDataFrame(edges, "src long, dst long").repartition(1)
    e17 = spark.createDataFrame(edges, "src long, dst long").repartition(17, "dst")
    r1 = {r["id"]: r["rank_q12"] for r in pagerank(e1, iters=5).collect()}
    r17 = {r["id"]: r["rank_q12"] for r in pagerank(e17, iters=5).collect()}
    assert r1 == r17


def test_duplicate_and_self_links_ignored(spark):
    edges = [(0, 1), (0, 1), (0, 0), (1, 2), (2, 0)]
    got = _run(spark, edges, iters=3)
    want = _py_pagerank([(0, 1), (1, 2), (2, 0)], [0, 1, 2], iters=3)
    assert got == want


def test_hub_authority_ordering(spark):
    # Everyone links to 0; 0 links to 1. At the damped fixed point 0
    # ranks first, 1 second — the 2-cycle 0<->1 oscillates early, so
    # this needs ~20 rounds to settle (0.85^20 ~ 0.04 residual).
    edges = [(u, 0) for u in range(1, 8)] + [(0, 1)]
    got = _run(spark, edges, iters=20)
    ranked = sorted(got, key=lambda i: -got[i][1])
    assert ranked[0] == 0 and ranked[1] == 1


def test_zero_iters_is_uniform_start(spark):
    got = _run(spark, [(0, 1), (1, 2)], node_ids=[0, 1, 2, 3], iters=0)
    assert {v for _, v in got.values()} == {10**12 // 4}


def test_bad_params_raise(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iters=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping_num=100, damping_den=100)


def test_trustrank_matches_reference_exactly(spark):
    # Two components: seeds {0} in the first; the second (10-11-12
    # cycle) is unreachable from any seed. Node 9 dangling.
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 9), (10, 11), (11, 12), (12, 10)]
    ids = list(range(13))
    got = _run(spark, edges, node_ids=ids, iters=7, seeds=[0])
    want = _py_pagerank(edges, ids, iters=7, seeds=[0])
    assert got == want


def test_trustrank_unreachable_nodes_get_zero(spark):
    edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    got = _run(spark, edges, node_ids=list(range(12)), iters=6, seeds=[0])
    # Trust flows only along links out of the seed component.
    assert got[10][1] == 0 and got[11][1] == 0
    assert all(got[i][1] > 0 for i in (0, 1, 2))
    # Nodes 3..9 have no in-links at all: zero.
    assert all(got[i][1] == 0 for i in range(3, 10))


def test_trustrank_seeds_outside_universe_ignored(spark):
    edges = [(0, 1), (1, 0)]
    got = _run(spark, edges, node_ids=[0, 1], iters=4, seeds=[0, 999])
    want = _py_pagerank(edges, [0, 1], iters=4, seeds=[0])
    assert got == want
    with pytest.raises(ValueError):
        _run(spark, edges, node_ids=[0, 1], iters=2, seeds=[999])


def test_trustrank_all_seeds_equals_plain(spark):
    edges = [(u, (u * 3 + 1) % 9) for u in range(9)]
    ids = list(range(9))
    assert _run(spark, edges, node_ids=ids, iters=5, seeds=ids) == _run(
        spark, edges, node_ids=ids, iters=5
    )


def test_mass_conservation_bound(spark):
    # Total mass can only drift DOWN by floor losses, bounded by
    # (|E| + n + 1) units per round — eleven orders under scale.
    edges = [(u, (u * 3 + 1) % 20) for u in range(20)]
    iters = 6
    got = _run(spark, edges, iters=iters)
    total = sum(v for _, v in got.values())
    scale = 10**12
    assert total <= scale
    assert total >= scale - iters * (len(edges) + len(got) + 1)
