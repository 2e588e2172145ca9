"""Deterministic stratified sampling (operators/sampling): the
reproducible data-mixing contract — layout-invariance, nesting, rate
accuracy — that Spark's partition-seeded sampleBy cannot give."""

from pyspark.sql import functions as F

from fujishadergpu_spark.operators.sampling import sample_hash, stratified_sample

SF = "/root/testdata/sf0.01"


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_selection_is_layout_invariant(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    rates = {"en": 0.4, "de": 0.2}
    a = _ids(stratified_sample(d, "lang", rates, "doc_id"))
    b = _ids(stratified_sample(d.repartition(7, "lang"), "lang", rates, "doc_id"))
    c = _ids(stratified_sample(d.coalesce(1), "lang", rates, "doc_id"))
    assert a == b == c
    assert len(a) > 0


def test_lower_rate_is_nested_subset(spark):
    # shrinking a mix must never churn the retained set
    d = spark.read.parquet(f"{SF}/documents.parquet")
    big = set(_ids(stratified_sample(d, "lang", {"en": 0.6}, "doc_id", default_rate=0.5)))
    small = set(_ids(stratified_sample(d, "lang", {"en": 0.3}, "doc_id", default_rate=0.25)))
    assert small < big


def test_rates_are_approximately_honored(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    out = stratified_sample(d, "lang", {"en": 0.5}, "doc_id", default_rate=0.1)
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en = got.get("en", 0) / tot["en"]
    assert 0.35 < en < 0.65, en
    rest_tot = sum(v for k, v in tot.items() if k != "en")
    rest_got = sum(v for k, v in got.items() if k != "en")
    assert 0.02 < rest_got / rest_tot < 0.2, rest_got / rest_tot


def test_rate_bounds_validated(spark):
    import pytest

    d = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        stratified_sample(d, "lang", {"en": 1.5}, "doc_id")
    with pytest.raises(ValueError):
        stratified_sample(d, "lang", {}, "doc_id", default_rate=-0.1)


def test_draw_is_nonnegative_for_negative_keys(spark):
    # canonical twin ids are negative longs; the draw must stay in range
    df = spark.createDataFrame([(-5,), (-1,), (0,), (7,)], "k long")
    vals = [r["h"] for r in df.select(sample_hash(F.col("k")).alias("h")).collect()]
    assert all(0 <= v < 1_000_000 for v in vals), vals


def test_zero_and_one_rates_are_exact(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    none = stratified_sample(d, "lang", {"en": 0.0}, "doc_id", default_rate=0.0)
    assert none.count() == 0
    all_en = stratified_sample(d, "lang", {"en": 1.0}, "doc_id", default_rate=0.0)
    n_en = d.filter(F.col("lang") == "en").count()
    assert all_en.count() == n_en


def test_full_range_keys_do_not_overflow(spark):
    # xxhash64-derived keys span the full long range; the pre-multiply
    # fold must keep the draw ANSI-safe at both extremes
    df = spark.createDataFrame(
        [(-(1 << 63),), ((1 << 63) - 1,), ((1 << 40) + 17,)], "k long"
    )
    vals = [r["h"] for r in df.select(sample_hash(F.col("k")).alias("h")).collect()]
    assert all(0 <= v < 1_000_000 for v in vals), vals


# ----------------------- mixture allocation ---------------------------

import pytest  # noqa: E402

from fujishadergpu_spark.operators.sampling import (  # noqa: E402
    DENOM,
    mixture_sample,
    mixture_thresholds,
)


def _tokens(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    return d.select(
        "doc_id",
        "lang",
        F.size(F.filter(F.split("text", " +"), lambda t: t != "")).cast("long").alias(
            "n_tokens"
        ),
    )


def test_mixture_thresholds_match_hand_computation(spark):
    from fujishadergpu_spark.operators.classifier import _rhalf

    d = _tokens(spark)
    targets = {"en": 0.5, "de": 0.2}
    thrs = mixture_thresholds(d, "lang", "n_tokens", targets, 15000)
    totals = {
        r["lang"]: r["ts"]
        for r in d.groupBy("lang").agg(F.sum("n_tokens").alias("ts")).collect()
    }
    for lang, ts in totals.items():
        share = targets.get(lang, 0.0)
        want = (
            min(DENOM, _rhalf(((15000 * share) / ts) * float(DENOM)))
            if share > 0
            else 0
        )
        assert thrs[lang] == want, lang


def test_mixture_budget_is_nested(spark):
    d = _tokens(spark)
    targets = {"en": 0.5, "de": 0.2, "zh": 0.3}
    small = {r["doc_id"] for r in mixture_sample(d, "lang", "n_tokens", targets, 8000, "doc_id").collect()}
    big = {r["doc_id"] for r in mixture_sample(d, "lang", "n_tokens", targets, 16000, "doc_id").collect()}
    assert small < big  # shrinking the budget never churns the subset


def test_mixture_steers_token_mass(spark):
    d = _tokens(spark)
    targets = {"en": 0.5, "de": 0.5}
    out = mixture_sample(d, "lang", "n_tokens", targets, 10000, "doc_id")
    got = {
        r["lang"]: r["ts"]
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("ts")).collect()
    }
    assert set(got) <= {"en", "de"}  # zero-share strata excluded
    # each selected stratum lands near its 5000-token allocation
    for lang, ts in got.items():
        assert 3000 < ts < 7000, (lang, ts)


def test_mixture_oversubscription_clamps_to_keep_all(spark):
    d = _tokens(spark)
    thrs = mixture_thresholds(d, "lang", "n_tokens", {"de": 1.0}, 10_000_000)
    assert thrs["de"] == DENOM  # budget >> stratum mass -> keep all
    kept = mixture_sample(d, "lang", "n_tokens", {"de": 1.0}, 10_000_000, "doc_id")
    assert kept.count() == d.where(F.col("lang") == "de").count()


def test_mixture_rejects_bad_params(spark):
    d = _tokens(spark)
    with pytest.raises(ValueError):
        mixture_thresholds(d, "lang", "n_tokens", {"en": -0.1}, 1000)
    with pytest.raises(ValueError):
        mixture_thresholds(d, "lang", "n_tokens", {"en": 0.5}, 0)


# ------------------- epoch-weighted replication ------------------------

def _docs_lang(spark, n=200):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_epoch_integer_weight_exact_copies(spark):
    from fujishadergpu_spark.operators.sampling import epoch_replicate

    out = epoch_replicate(_docs_lang(spark), "lang", {"de": 2.0}, "doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["epoch"])
    for did, eps in per.items():
        want = 2 if did % 3 == 1 else 1
        assert sorted(eps) == list(range(want)), (did, eps)


def test_epoch_fractional_weight_expected_mass_and_determinism(spark):
    from fujishadergpu_spark.operators.sampling import epoch_replicate

    df = _docs_lang(spark, 600)
    out1 = epoch_replicate(df, "lang", {"en": 1.5}, "doc_id")
    n_en = out1.where("lang = 'en'").count()
    assert 250 <= n_en <= 350  # 200 en docs x ~1.5
    # partition-invariance: identical multiset on a different layout
    out2 = epoch_replicate(df.repartition(7), "lang", {"en": 1.5}, "doc_id")
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_epoch_below_one_matches_stratified_sample(spark):
    from fujishadergpu_spark.operators.sampling import (
        epoch_replicate,
        stratified_sample,
    )

    df = _docs_lang(spark)
    rep = epoch_replicate(df, "lang", {"en": 0.5}, "doc_id", default_weight=0.0)
    kept = {r["doc_id"] for r in rep.collect()}
    samp = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.5}, "doc_id").collect()
    }
    assert kept == samp  # same draw, same threshold -> same set
    assert rep.where("epoch != 0").count() == 0


def test_epoch_fractional_sets_are_nested(spark):
    from fujishadergpu_spark.operators.sampling import epoch_replicate

    df = _docs_lang(spark)
    low = {
        r["doc_id"]
        for r in epoch_replicate(df, "lang", {"en": 1.25}, "doc_id").where("epoch = 1").collect()
    }
    high = {
        r["doc_id"]
        for r in epoch_replicate(df, "lang", {"en": 1.75}, "doc_id").where("epoch = 1").collect()
    }
    assert low <= high  # raising a weight never churns earlier extras


def test_epoch_weight_validation(spark):
    from fujishadergpu_spark.operators.sampling import epoch_replicate

    import pytest as _pt

    with _pt.raises(ValueError):
        epoch_replicate(_docs_lang(spark), "lang", {"en": -1.0}, "doc_id")
    with _pt.raises(ValueError):
        epoch_replicate(_docs_lang(spark), "lang", {"en": 1000.0}, "doc_id")


# ------------------- leakage-safe split assignment ----------------------

def test_split_assign_groups_stay_together(spark):
    from fujishadergpu_spark.operators.sampling import split_assign

    rows = [(i, f"dom{i % 17}.com") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = split_assign(df, {"train": 0.8, "valid": 0.2}, "doc_id", group_col="source")
    per_group = out.groupBy("source").agg(
        F.count_distinct("split").alias("n")
    ).collect()
    assert all(r["n"] == 1 for r in per_group)  # no group straddles splits


def test_split_assign_masses_and_determinism(spark):
    from fujishadergpu_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = split_assign(df, {"train": 0.9, "valid": 0.05, "test": 0.05}, "doc_id")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert 0.85 * 5000 <= counts["train"] <= 0.95 * 5000
    assert counts["valid"] > 0 and counts["test"] > 0
    # partition invariance
    out2 = split_assign(df.repartition(13), {"train": 0.9, "valid": 0.05, "test": 0.05}, "doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, out2.collect()))


def test_split_assign_stable_under_reweighting(spark):
    from fujishadergpu_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in split_assign(df, {"test": 0.05, "train": 0.90, "valid": 0.05}, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df, {"test": 0.05, "train": 0.93, "valid": 0.02}, "doc_id").collect()}
    # growing train only converts valid rows; test never churns
    for did, sa in a.items():
        if sa == "test":
            assert b[did] == "test"
        if sa == "train":
            assert b[did] == "train"


def test_split_assign_validation(spark):
    from fujishadergpu_spark.operators.sampling import split_assign

    import pytest as _pt

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pt.raises(ValueError):
        split_assign(df, {}, "doc_id")
    with _pt.raises(ValueError):
        split_assign(df, {"a": -0.1, "b": 1.1}, "doc_id")


def test_unimax_allocation_hand_computed():
    """Waterfill on paper: caps ascend until the budget stops fitting,
    the rest split equally with name-ordered remainder."""
    from fujishadergpu_spark.operators.sampling import unimax_allocation

    # ascending caps: a=10, b=20, c=100, d=100; budget 80
    # a: 10*4=40<=80 -> cap 10 (rem 70); b: 20*3=60<=70 -> cap 20
    # (rem 50); c: 100*2>50 -> c,d split 50 = 25 each
    a = unimax_allocation({"c": 100, "a": 10, "d": 100, "b": 20}, 80)
    assert a == {"a": 10, "b": 20, "c": 25, "d": 25}
    # remainder: budget 81 -> 25/26 with the extra token to 'c' (name
    # order among uncapped)
    a = unimax_allocation({"c": 100, "a": 10, "d": 100, "b": 20}, 81)
    assert a == {"a": 10, "b": 20, "c": 26, "d": 25}
    # budget covers everything -> all capped at max_epochs
    a = unimax_allocation({"a": 10, "b": 20}, 1000, max_epochs=2)
    assert a == {"a": 20, "b": 40}
    # epoch cap participates in the fit test
    a = unimax_allocation({"a": 10, "b": 100}, 60, max_epochs=2)
    assert a == {"a": 20, "b": 40}


def test_unimax_allocation_validation():
    from fujishadergpu_spark.operators.sampling import unimax_allocation

    with pytest.raises(ValueError):
        unimax_allocation({"a": 1}, -1)
    with pytest.raises(ValueError):
        unimax_allocation({"a": 1}, 10, max_epochs=0)
    assert unimax_allocation({}, 10) == {}


def test_unimax_sample_thresholds_and_subset(spark):
    """Thresholds honor the allocation; the head stratum is throttled
    to its fair share while tail strata keep everything; a smaller
    budget selects a nested subset."""
    from fujishadergpu_spark.operators.sampling import (
        unimax_sample,
        unimax_thresholds,
    )

    rows = [(i, "en" if i < 400 else "mi", 10) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tok int")
    # masses: en 4000, mi 1000; budget 2000 -> mi capped (1000*2<=2000),
    # en gets 1000 -> thr en 0.25, mi keep-all
    thr = unimax_thresholds(df, "lang", "n_tok", 2000)
    assert thr == {"mi": 1_000_000, "en": 250_000}
    big = {r["doc_id"] for r in unimax_sample(df, "lang", "n_tok", 2000, "doc_id").collect()}
    small = {r["doc_id"] for r in unimax_sample(df, "lang", "n_tok", 1200, "doc_id").collect()}
    assert {i for i in big if i >= 400} == set(range(400, 500))  # tail intact
    assert small <= big  # budget nesting
