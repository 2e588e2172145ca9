"""seed_distance gate: Spark bounded BFS must match a pure-Python
reference exactly, plus the semantics the crawl-frontier use depends
on — seeds at 0, horizon cutoff to -1, directionality, off-universe
seeds harmless, frontier pruning not changing results."""

import pytest

from fujishadergpu_spark.operators.bfs import seed_distance


def _py_bfs(edges, seeds, node_ids, max_hops):
    e = sorted({(int(u), int(v)) for u, v in edges if u != v})
    dist = {int(s): 0 for s in seeds}
    frontier = set(dist)
    for r in range(1, max_hops + 1):
        nxt = {v for u, v in e if u in frontier and v not in dist}
        for v in nxt:
            dist[v] = r
        frontier = nxt
    return {i: dist.get(i, -1) for i in node_ids}


def _run(spark, edges, seeds, node_ids=None, max_hops=6):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(int(i),) for i in seeds], "id long")
    nodes = (
        None
        if node_ids is None
        else spark.createDataFrame([(int(i),) for i in node_ids], "id long")
    )
    rows = seed_distance(e, s, max_hops=max_hops, nodes=nodes).collect()
    return {r["id"]: r["hops"] for r in rows}


def test_matches_reference_exactly(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (9, 0)]
    ids = list(range(10))  # 6,7,8 isolated; 9 upstream of seed
    got = _run(spark, edges, seeds=[0], node_ids=ids, max_hops=4)
    assert got == _py_bfs(edges, [0], ids, 4)
    assert got[0] == 0 and got[1] == 1 and got[3] == 2
    assert got[9] == -1  # directed: in-link to the seed, not reachable


def test_horizon_cutoff(spark):
    chain = [(i, i + 1) for i in range(8)]
    got = _run(spark, chain, seeds=[0], max_hops=3)
    assert got[3] == 3 and got[4] == -1 and got[8] == -1


def test_multi_seed_takes_min(spark):
    chain = [(i, i + 1) for i in range(6)]
    got = _run(spark, chain, seeds=[0, 5], max_hops=6)
    assert got[4] == 4 and got[5] == 0 and got[6] == 1


def test_off_universe_seed_harmless(spark):
    got = _run(spark, [(0, 1)], seeds=[99], node_ids=[0, 1], max_hops=3)
    assert got == {0: -1, 1: -1}


def test_zero_hops_is_seeds_only(spark):
    got = _run(spark, [(0, 1), (1, 2)], seeds=[0], max_hops=0)
    assert got == {0: 0, 1: -1, 2: -1}


def test_cycle_terminates_and_min_wins(spark):
    got = _run(spark, [(0, 1), (1, 2), (2, 0)], seeds=[0], max_hops=6)
    assert got == {0: 0, 1: 1, 2: 2}


def test_bad_hops_raise(spark):
    e = [(0, 1)]
    with pytest.raises(ValueError):
        _run(spark, e, seeds=[0], max_hops=-1)
