"""url_templates / crawl_trap_hosts gates: the fold rules (hex before
digits, query names sorted values dropped), the rollup counts, the
deterministic top-template tie-break, and the trap rule arms."""

import pytest

from fujishadergpu_spark.operators.urltemplates import crawl_trap_hosts, url_templates


def _tmpl(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {
        (r["host"], r["template"]): r["n_urls"]
        for r in url_templates(df).collect()
    }


def test_fold_rules(spark):
    got = _tmpl(spark, [
        "http://a.com/article/123",
        "http://a.com/article/9981",
        "http://A.com/cal/2024/7",
        "http://a.com/s/deadbeef01234567/x",      # 16-hex run -> H
        "http://a.com/s/DEADBEEF99887766/y",      # uppercase hex folds too
        "http://a.com/item?b=2&a=1&a=3",          # names sorted, dup kept
        "http://a.com/item?a=9&b=0",              # same template
        "http://a.com/plain",
    ])
    assert got[("a.com", "/article/N")] == 2
    assert got[("a.com", "/cal/N/N")] == 1
    assert got[("a.com", "/s/H/x")] == 1 and got[("a.com", "/s/H/y")] == 1
    assert got[("a.com", "/item?a,a,b")] == 1 and got[("a.com", "/item?a,b")] == 1
    assert got[("a.com", "/plain")] == 1


def test_trap_rule_and_top_template(spark):
    urls = [f"http://trap.com/cal/{y}/{m}" for y in range(2000, 2006) for m in range(12)]
    urls += [f"http://trap.com/about", "http://trap.com/contact"]
    urls += [f"http://ok.com/post/{i}" for i in range(5)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = {r["host"]: r for r in crawl_trap_hosts(df, min_urls=30, min_ratio=10).collect()}
    t = rows["trap.com"]
    assert t["n_urls"] == 74 and t["n_templates"] == 3
    assert t["top_template"] == "/cal/N/N" and t["top_n"] == 72
    assert t["trap"] is True
    ok = rows["ok.com"]
    assert ok["n_templates"] == 1 and ok["trap"] is False  # below min_urls
    assert ok["urls_per_template_q6"] == 5_000_000


def test_top_template_tie_breaks_lexicographic(spark):
    urls = ["http://h/x/1", "http://h/x/2", "http://h/y/1", "http://h/y/2"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    r = crawl_trap_hosts(df).collect()[0]
    assert r["top_template"] == "/x/N" and r["top_n"] == 2


def test_bad_thresholds_raise(spark):
    df = spark.createDataFrame([("http://h/x",)], "url string")
    with pytest.raises(ValueError):
        crawl_trap_hosts(df, min_urls=0)
