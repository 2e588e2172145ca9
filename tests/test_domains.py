"""Domain-level curation (operators/domains.py): aggregate exactness,
decimal-domain mean thresholding, filter totality for unknown domains,
and the broadcast-back plan shape."""

from decimal import Decimal

from pyspark.sql import functions as F

from fujishadergpu_spark.operators.domains import domain_filter, domain_stats

DOCS = [
    (0, "good solid prose with many words here", "en", "siteA"),
    (1, "more reasonable text content for training", "en", "siteA"),
    (2, "x", "de", "siteB"),            # tiny junk doc
    (3, "", "de", "siteB"),             # empty doc
    (4, "one lonely but decent document right here", "fr", "siteC"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string, source string")


def test_stats_counts(spark):
    st = {r["domain"]: r.asDict() for r in domain_stats(_df(spark)).collect()}
    assert set(st) == {"siteA", "siteB", "siteC"}
    assert st["siteA"]["n_docs"] == 2 and st["siteA"]["n_langs"] == 1
    assert st["siteB"]["n_docs"] == 2
    assert st["siteA"]["n_tokens"] == 13 and st["siteB"]["n_tokens"] == 1
    assert st["siteA"]["avg_tokens"] == 6.5
    assert isinstance(st["siteA"]["sum_quality"], Decimal)


def test_filter_thresholds_in_decimal_domain(spark):
    d = _df(spark)
    st = domain_stats(d)
    # min_docs=2 drops siteC; quality threshold drops siteB (its two
    # docs are junk: one char + empty -> mean quality far below 0.5)
    got = {
        r["doc_id"]: r["domain_keep"]
        for r in domain_filter(d, st, min_docs=2, min_avg_quality=0.5).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: False, 4: False}


def test_filter_total_for_unknown_domain(spark):
    d = _df(spark)
    st = domain_stats(d.where("source != 'siteC'"))
    got = {
        r["doc_id"]: r["domain_keep"]
        for r in domain_filter(d, st, min_docs=1, min_avg_quality=0.0).collect()
    }
    # siteC never reached the stats relation: verdict defaults False,
    # the row itself is never dropped
    assert got[4] is False and set(got) == {0, 1, 2, 3, 4}


def test_filter_joins_broadcast(spark):
    d = _df(spark)
    plan = (
        domain_filter(d, domain_stats(d))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stats_sum_quality_partition_invariant(spark):
    """The decimal quality sum must be identical under different
    partitionings (the exact-domain discipline)."""
    d = _df(spark)
    a = {r["domain"]: r["sum_quality"] for r in domain_stats(d.repartition(1)).collect()}
    b = {r["domain"]: r["sum_quality"] for r in domain_stats(d.repartition(7, F.col("doc_id"))).collect()}
    assert a == b


def test_domain_keywords_surfaces_distinctive_terms(spark):
    from fujishadergpu_spark.operators.domains import domain_keywords

    docs = spark.createDataFrame(
        [
            (0, "the cooking site bakes bread and cakes daily", "food.com"),
            (1, "the cooking site roasts bread and soup here", "food.com"),
            (2, "the racing site tunes engines and wheels fast", "cars.com"),
            (3, "the racing site paints engines and spoilers", "cars.com"),
        ],
        ["doc_id", "text", "source"],
    )
    out = domain_keywords(docs, k=3).collect()
    top = {r["domain"]: [] for r in out}
    for r in sorted(out, key=lambda r: (r["domain"], r["rank"])):
        top[r["domain"]].append(r["word"])
    # corpus-wide words (the/site/and) score ln(3/3)=0; class words win
    assert "cooking" in top["food.com"] and "racing" in top["cars.com"]
    assert "the" not in top["food.com"] and "the" not in top["cars.com"]
    # exactly k rows per domain, ranks 1..k
    assert all(len(v) == 3 for v in top.values())


def test_domain_keywords_rank_is_quantized_and_tiebroken(spark):
    from fujishadergpu_spark.operators.domains import domain_keywords

    docs = spark.createDataFrame(
        [(0, "zebra apple zebra apple", "d.com"), (1, "other words", "e.com")],
        ["doc_id", "text", "source"],
    )
    out = [r for r in domain_keywords(docs, k=2).collect() if r["domain"] == "d.com"]
    out.sort(key=lambda r: r["rank"])
    # equal scores (same tf, same df): word-ascending tie-break
    assert [r["word"] for r in out] == ["apple", "zebra"]
