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


def test_threshold_sweep_counts_and_null_policy(spark):
    from fujishadergpu_spark.operators.funnel import threshold_sweep

    rows = [(0, 0.1, 10), (1, 0.5, 20), (2, 0.9, 30), (3, None, 40)]
    df = spark.createDataFrame(rows, "doc_id long, score double, n_tokens long")
    out = {r["threshold"]: r.asDict() for r in threshold_sweep(
        df, [0.0, 0.5, 1.0], weight_col="n_tokens"
    ).collect()}
    assert out[0.0]["n_kept"] == 3          # NULL score never kept
    assert out[0.5]["n_kept"] == 2 and out[0.5]["kept_weight"] == 50
    assert out[1.0]["n_kept"] == 0 and out[1.0]["kept_weight"] == 0
    assert out[0.5]["kept_share"] == 2 / 4
    assert out[0.5]["weight_share"] == 50 / 100


def test_threshold_sweep_without_weight_and_validation(spark):
    from fujishadergpu_spark.operators.funnel import threshold_sweep

    df = spark.createDataFrame([(0, 0.7)], "doc_id long, score double")
    out = threshold_sweep(df, [0.5]).collect()[0]
    assert out["n_kept"] == 1 and "kept_weight" not in out.asDict()
    with pytest.raises(ValueError, match="non-empty"):
        threshold_sweep(df, [])
    with pytest.raises(ValueError, match="ascending"):
        threshold_sweep(df, [0.9, 0.1])
