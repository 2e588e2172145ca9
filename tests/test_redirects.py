"""resolve_redirects gate: pointer doubling must match a pure-Python
chain walk exactly — terminals resolve, cycles and over-long chains
surface unresolved, self-redirects are degenerate cycles, and a
non-functional relation loud-fails."""

import pytest

from fujishadergpu_spark.operators.redirects import resolve_redirects


def _py_resolve(pairs, rounds):
    r = dict(pairs)
    out = {}
    for u in r:
        cur, steps = r[u], 1
        # doubling reaches chain length 2^rounds
        while cur in r and steps < 2 ** rounds:
            cur, steps = r[cur], steps + 1
        out[u] = (cur, cur not in r)
    return out


def _run(spark, pairs, rounds=6):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {
        r["src"]: (r["final"], r["resolved"])
        for r in resolve_redirects(df, rounds=rounds).collect()
    }


def test_matches_reference(spark):
    pairs = [(0, 1), (1, 2), (2, 3),          # chain -> terminal 3
             (10, 11), (11, 10),              # 2-cycle
             (20, 20),                        # self-redirect
             (30, 3)]                         # short hop onto a terminal
    got = _run(spark, pairs)
    assert got == _py_resolve(pairs, 6)
    assert got[0] == (3, True) and got[30] == (3, True)
    assert got[10][1] is False and got[20] == (20, False)


def test_long_chain_within_doubling_budget(spark):
    n = 40  # chain of 40 < 2^6
    pairs = [(i, i + 1) for i in range(n)]
    got = _run(spark, pairs, rounds=6)
    assert all(got[i] == (n, True) for i in range(n))


def test_chain_beyond_budget_unresolved(spark):
    pairs = [(i, i + 1) for i in range(5)]
    got = _run(spark, pairs, rounds=1)  # 2^1 = 2 hops max
    assert got[4] == (5, True)          # 1 hop: fine
    assert got[0][1] is False           # 5 hops: beyond budget


def test_non_function_loud_fails(spark):
    with pytest.raises(ValueError, match="not a function"):
        _run(spark, [(0, 1), (0, 2)])


def test_bad_rounds_raise(spark):
    with pytest.raises(ValueError):
        _run(spark, [(0, 1)], rounds=-1)
