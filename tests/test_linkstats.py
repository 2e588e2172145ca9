"""link_stats gate: Spark degrees/reciprocity must match a pure-Python
reference exactly, plus the structural invariants the signal is built
on — reciprocity bounded by out-degree, isolated nodes total zero,
symmetric edges fully reciprocated, duplicate/self links dropped."""

from fujishadergpu_spark.operators.linkstats import link_stats


def _py_stats(edges, node_ids):
    e = sorted({(int(u), int(v)) for u, v in edges if u != v})
    es = set(e)
    ids = sorted(set(node_ids))
    out = {}
    for i in ids:
        o = [(u, v) for u, v in e if u == i]
        r = sum(1 for u, v in o if (v, u) in es)
        out[i] = (
            len(o),
            sum(1 for u, v in e if v == i),
            r,
            (r * 10**6) // len(o) if o else 0,
        )
    return out


def _run(spark, edges, node_ids=None):
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = (
        None
        if node_ids is None
        else spark.createDataFrame([(int(i),) for i in node_ids], "id long")
    )
    rows = link_stats(e, nodes=nodes).collect()
    return {
        r["id"]: (r["out_deg"], r["in_deg"], r["recip_out"], r["recip_q6"])
        for r in rows
    }


def test_matches_reference_exactly(spark):
    edges = [(0, 1), (1, 0), (0, 2), (2, 3), (3, 0), (4, 2), (2, 4), (1, 4)]
    ids = list(range(6))  # node 5 isolated
    assert _run(spark, edges, node_ids=ids) == _py_stats(edges, ids)


def test_isolated_node_all_zero(spark):
    got = _run(spark, [(0, 1)], node_ids=[0, 1, 9])
    assert got[9] == (0, 0, 0, 0)
    assert got[0] == (1, 0, 0, 0)
    assert got[1] == (0, 1, 0, 0)


def test_symmetric_pair_fully_reciprocal(spark):
    got = _run(spark, [(0, 1), (1, 0)])
    assert got[0] == (1, 1, 1, 10**6)
    assert got[1] == (1, 1, 1, 10**6)


def test_duplicates_and_self_loops_dropped(spark):
    base = [(0, 1), (1, 0), (1, 2)]
    noisy = base + [(0, 1), (0, 0), (2, 2), (1, 0)]
    assert _run(spark, noisy) == _run(spark, base)


def test_recip_bounded_by_out_degree(spark):
    edges = [(u, (u * 3 + 1) % 7) for u in range(7)] + [(1, 4), (4, 1), (2, 0)]
    for out_deg, _in, recip, q6 in _run(spark, edges).values():
        assert 0 <= recip <= out_deg
        assert q6 == ((recip * 10**6) // out_deg if out_deg else 0)
