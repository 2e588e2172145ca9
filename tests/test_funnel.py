"""Filter-attribution funnel (operators/funnel.py): removal and
unique-removal accounting on a hand-built verdict relation where the
expected table is countable by eye."""

import pytest

from fujishadergpu_spark.operators.funnel import filter_attribution

# (doc, rule_a, rule_b, keep)  — keep = a AND b
ROWS = [
    (0, True, True, True),     # kept
    (1, False, True, False),   # removed by a only  (unique to a)
    (2, False, True, False),   # removed by a only  (unique to a)
    (3, True, False, False),   # removed by b only  (unique to b)
    (4, False, False, False),  # removed by both    (unique to neither)
]


def _df(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, rule_a boolean, rule_b boolean, keep boolean"
    )


def test_attribution_counts(spark):
    out = {
        r["rule"]: r.asDict()
        for r in filter_attribution(_df(spark), ["rule_a", "rule_b"]).collect()
    }
    assert out["rule_a"]["n_removed"] == 3
    assert out["rule_a"]["n_unique_removed"] == 2
    assert out["rule_b"]["n_removed"] == 2
    assert out["rule_b"]["n_unique_removed"] == 1
    for r in out.values():
        assert r["n_docs"] == 5 and r["n_kept"] == 1
        assert r["removal_share"] == r["n_removed"] / 5


def test_keep_col_none_derives_from_rules(spark):
    out = filter_attribution(
        _df(spark).drop("keep"), ["rule_a", "rule_b"], keep_col=None
    ).collect()
    assert all(r["n_kept"] == 1 for r in out)


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="rule_cols"):
        filter_attribution(_df(spark), [])
