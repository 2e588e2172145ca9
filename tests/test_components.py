"""Connected components + canonical dedup assignment.

Oracle: a driver-side union-find over the same edge list. The gate
twin (dedup_cluster_components / dedup_canonical_docs in queries.py)
re-states the closure as a DuckDB recursive CTE; here we pin the
operator itself on adversarial topologies — in particular a long
path, which alternating-star must collapse in O(log^2 n) rounds where
plain min-label propagation would need diameter rounds.
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.components import (
    canonical_assignment,
    connected_components,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["component"])
        for r in connected_components(df, **kw).collect()
    }
    want = set(_uf_components(edges).items())
    assert got == want


def test_single_edge(spark):
    _run(spark, [(7, 3)])


def test_random_graph_matches_union_find(spark):
    rnd = random.Random(42)
    edges = [
        (rnd.randrange(300), rnd.randrange(300))
        for _ in range(260)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, edges)


def test_long_path_converges_in_log_rounds(spark):
    # Path 0-1-2-...-96: diameter 96. max_iter=12 << 96 proves the
    # star alternation is doing its O(log^2 n) job, not label-prop.
    edges = [(i, i + 1) for i in range(96)]
    _run(spark, edges, max_iter=12)


def test_duplicate_and_reversed_pairs_are_harmless(spark):
    _run(spark, [(1, 2), (2, 1), (1, 2), (5, 4), (4, 5), (2, 3)])


def test_no_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(df, max_iter=1)


def test_canonical_assignment_covers_full_corpus(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 4), (4, 8), (2, 9)], "id_a long, id_b long"
    )
    rows = {r["doc_id"]: (r["canonical_id"], r["keep"])
            for r in canonical_assignment(docs, pairs).collect()}
    assert len(rows) == 10
    assert rows[1] == (1, True)
    assert rows[4] == (1, False)
    assert rows[8] == (1, False)
    assert rows[2] == (2, True)
    assert rows[9] == (2, False)
    for d in (0, 3, 5, 6, 7):
        assert rows[d] == (d, True)


def test_corpus_join_shuffles_ids_only(spark):
    # The components side is NOT broadcastable by contract (dup
    # membership can be a large corpus fraction), so the pinned shape
    # is an id-equi-join over id-only rows: no cartesian/BNLJ, and the
    # corpus side enters the join pruned to its id column.
    docs = spark.createDataFrame(
        [(i, "x" * 10) for i in range(50)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = canonical_assignment(docs, pairs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # The corpus side is projected to the bare id before its exchange
    # (the ExistingRDD scan node itself always prints every column).
    assert re.search(r"Project \[doc_id#\d+L\]", plan)


def test_canonical_reanchors_when_pair_graph_has_ghost_ids(spark):
    # Pair graph computed BEFORE the corpus was pruned: id 3 connects
    # 5 and 6 but is gone from docs. The cluster must stay together
    # and keep its minimum PRESENT member, never a dangling canonical.
    docs = spark.createDataFrame([(5,), (6,), (9,)], "doc_id long")
    pairs = spark.createDataFrame([(3, 5), (3, 6)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["canonical_id"], r["keep"])
            for r in canonical_assignment(docs, pairs).collect()}
    assert rows == {5: (5, True), 6: (5, False), 9: (9, True)}


def test_canonical_prefer_col_argmax_with_tie(spark):
    # cluster {1,4,8}: quality 3/9/9 -> tie at 9 between 4 and 8,
    # min id wins -> canonical 4. Singleton 2 keeps itself.
    docs = spark.createDataFrame(
        [(1, 3), (4, 9), (8, 9), (2, 5)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame([(1, 4), (4, 8)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["canonical_id"], r["keep"])
            for r in canonical_assignment(docs, pairs, prefer_col="q").collect()}
    assert rows == {1: (4, False), 4: (4, True), 8: (4, False), 2: (2, True)}


def test_empty_pair_graph(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    rows = {r["doc_id"]: (r["canonical_id"], r["keep"])
            for r in canonical_assignment(docs, pairs).collect()}
    assert rows == {i: (i, True) for i in range(5)}


def test_soft_dedup_weights_laws(spark):
    from fujishadergpu_spark.operators.components import soft_dedup_weights

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # clusters {0,1,2} (via chain) and {3,4}; 5 is a singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(docs, pairs).collect()}
    assert len(out) == 6  # total
    assert [out[i]["cluster_size"] for i in range(6)] == [3, 3, 3, 2, 2, 1]
    assert out[0]["weight_q6"] == 333333 and out[3]["weight_q6"] == 500000
    assert out[5]["weight_q6"] == 1000000
    # conservation: each cluster contributes ~1 unit of mass
    total = sum(r["weight_q6"] for r in out.values())
    assert abs(total - 3 * 1000000) <= 3  # 3 content units, rounding slack
