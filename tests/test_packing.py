"""Sequence packing (operators/packing.py): next-fit invariants on a
hand-built corpus plus the maximality property — no sequence could
have accepted the document that opened the next one."""

import pytest
from pyspark.sql import functions as F

from fujishadergpu_spark.operators.packing import pack_sequences, packing_stats

BUDGET = 10


def _plan(spark, counts, groups=1):
    # n tokens -> a doc of n single-letter tokens
    rows = [(i, " ".join("t" * 1 for _ in range(c)) if c else "") for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return pack_sequences(docs, budget=BUDGET, groups=groups).orderBy("doc_id")


def test_next_fit_assignment(spark):
    # counts 4,4,4 -> [4,4],[4]; then 10 fills alone; 11 overflows alone
    out = _plan(spark, [4, 4, 4, 10, 11]).collect()
    assert [(r.seq_id, r.seq_pos) for r in out] == [(0, 0), (0, 4), (1, 0), (2, 0), (3, 0)]
    assert [r.overflow for r in out] == [False, False, False, False, True]


def test_sequences_respect_budget_and_maximality(spark):
    counts = [3, 7, 2, 9, 1, 5, 5, 6, 4, 10, 2, 2, 2, 2, 3]
    out = _plan(spark, counts).collect()
    seqs = {}
    for r in out:
        seqs.setdefault(r.seq_id, []).append(r)
    for sid, rows in seqs.items():
        total = sum(r.n_tokens for r in rows)
        if not any(r.overflow for r in rows):
            assert total <= BUDGET, sid
        # maximality: the first doc of the NEXT sequence wouldn't fit
        nxt = seqs.get(sid + 1)
        if nxt is not None:
            opener = min(nxt, key=lambda r: r.doc_id)
            assert total + opener.n_tokens > BUDGET, sid
    # seq_pos is the running offset in doc order
    for rows in seqs.values():
        rows = sorted(rows, key=lambda r: r.doc_id)
        off = 0
        for r in rows:
            assert r.seq_pos == off
            off += r.n_tokens


def test_groups_pack_independently(spark):
    out = _plan(spark, [6, 6, 6, 6], groups=2).collect()
    # group 0 gets docs 0,2; group 1 gets docs 1,3 — each pair needs
    # two sequences (6+6 > 10), seq ids restart per group
    by_doc = {r.doc_id: r for r in out}
    assert by_doc[0].pack_group != by_doc[1].pack_group
    for i in range(4):
        assert by_doc[i].seq_pos == 0
    assert by_doc[0].seq_id == 0 and by_doc[2].seq_id == 1
    assert by_doc[1].seq_id == 0 and by_doc[3].seq_id == 1


def test_packing_stats_fill_ratio(spark):
    plan = _plan(spark, [4, 4, 4])
    stats = packing_stats(plan, BUDGET).collect()
    assert len(stats) == 1
    s = stats[0]
    assert s.n_sequences == 2 and s.n_tokens == 12
    assert s.fill_ratio == pytest.approx(12 / 20)
    assert s.n_overflow == 0


def test_packing_stats_overflow_count(spark):
    # docs of 11 and 15 tokens each overflow the budget of 10 alone;
    # the 4+4 pair packs normally -> 3 sequences, 2 overflows
    plan = _plan(spark, [11, 4, 4, 15])
    s = packing_stats(plan, BUDGET).collect()[0]
    assert s.n_sequences == 3 and s.n_overflow == 2


def test_pack_group_scaling_smoke(spark):
    """One group's next-fit pass over 10^5 ints must stay cheap —
    pins the per-group sequential-loop cost the module docstring
    budgets (~10^6 ints per task at production sizing)."""
    import time

    import numpy as np
    import pandas as pd

    from fujishadergpu_spark.operators.packing import _pack_group

    n = 100_000
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "pack_group": np.zeros(n, dtype=np.int32),
            "n_tokens": (np.arange(n, dtype=np.int64) * 37 % 900) + 1,
        }
    )
    t0 = time.monotonic()
    out = _pack_group(pdf, 2048)
    dt = time.monotonic() - t0
    assert len(out) == n and dt < 5.0
    # spot invariant: every sequence's fill <= budget (no overflows here)
    fills = out.groupby("seq_id")["n_tokens"].sum()
    assert (fills <= 2048).all()


def _ffd_reference(items, budget):
    """Pure-Python FFD: list of (doc_id, n) -> {doc_id: (seq, pos)}."""
    out = {}
    bins = []  # remaining capacity per bin
    for did, n in sorted(items, key=lambda x: (-x[1], x[0])):
        for b, cap in enumerate(bins):
            if n <= cap:
                out[did] = (b, budget - cap)
                bins[b] = cap - n
                break
        else:
            out[did] = (len(bins), 0)
            bins.append(max(budget - n, 0))
    return out, len(bins)


def test_ffd_matches_pure_python_reference(spark):
    from fujishadergpu_spark.operators.packing import pack_sequences

    sizes = [7, 5, 5, 4, 3, 2, 2, 1, 12, 6]  # includes one overflow (12 > 10)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)],
        "doc_id long, text string",
    )
    plan = {
        r["doc_id"]: r.asDict()
        for r in pack_sequences(docs, budget=10, groups=1, strategy="ffd").collect()
    }
    want, n_bins = _ffd_reference(list(enumerate(sizes)), 10)
    for did, (seq, pos) in want.items():
        assert (plan[did]["seq_id"], plan[did]["seq_pos"]) == (seq, pos), did
    assert plan[8]["overflow"] is True and all(
        plan[d]["seq_id"] != plan[8]["seq_id"] for d in plan if d != 8
    )
    # non-overflow bins respect the budget
    fill = {}
    for d, r in plan.items():
        fill.setdefault(r["seq_id"], 0)
        fill[r["seq_id"]] += r["n_tokens"]
    assert all(v <= 10 for s, v in fill.items() if s != plan[8]["seq_id"])


def test_ffd_uses_no_more_sequences_than_nextfit(spark):
    from fujishadergpu_spark.operators.packing import pack_sequences

    # adversarial-for-nextfit mix: alternating big/small
    sizes = [9, 2, 9, 2, 9, 2, 9, 2]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * s)) for i, s in enumerate(sizes)],
        "doc_id long, text string",
    )
    def n_seqs(strategy):
        plan = pack_sequences(docs, budget=11, groups=1, strategy=strategy)
        return plan.select("seq_id").distinct().count()
    assert n_seqs("ffd") <= n_seqs("nextfit")
    assert n_seqs("ffd") == 4  # 4x(9+2) fits exactly


def test_unknown_strategy_rejected(spark):
    from fujishadergpu_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    import pytest as _pt
    with _pt.raises(ValueError, match="unknown strategy"):
        pack_sequences(docs, budget=10, strategy="bestfit")
