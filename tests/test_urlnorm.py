"""URL canonicalization unit cases (the oracle gate covers the
generated-variant corpus; these pin hand-written adversarial forms)."""

from pyspark.sql import functions as F

from fujishadergpu_spark.functions.urlnorm import normalize_url

CASES = [
    # case noise + default port + trailing slash + utm + unsorted + fragment
    ("HTTPS://WWW.Example.COM:443/Shop/?utm_source=a&b=2&a=1#frag",
     "https://www.example.com/Shop?a=1&b=2"),
    # root slash + default http port
    ("http://example.com:80/", "http://example.com"),
    # root path with EVERYTHING: case, default https port, utm-only
    # query, fragment — folds to the bare host-only canonical form
    ("https://Host:443/?utm_x=1#f", "https://host"),
    # bare host, nothing to do
    ("https://example.com", "https://example.com"),
    # query vanishes entirely after utm filtering
    ("https://example.com/a?utm_x=1", "https://example.com/a"),
    # NON-default port survives; params sort
    ("http://Host.com:8080/p/?z=1&utm_medium=m&a=2",
     "http://host.com:8080/p?a=2&z=1"),
    # '?' inside the fragment must not resurrect a query
    ("https://h.com/p?b=1&a=2#x?y=3", "https://h.com/p?a=2&b=1"),
    # :443 on http is NOT a default port
    ("http://h.com:443/p", "http://h.com:443/p"),
    # empty params from && are dropped
    ("https://h.com/p?&b=1&&a=2", "https://h.com/p?a=2&b=1"),
]


def test_normalize_url_cases(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "u string")
    got = [r["n"] for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [want for _, want in CASES]


def test_normalize_url_is_idempotent(spark):
    # canonical form must be a fixed point — a second pass through the
    # normalizer (e.g. re-ingesting already-canonical URLs) is a no-op
    df = spark.createDataFrame([(raw,) for raw, _ in CASES], "u string")
    once = df.select(normalize_url(F.col("u")).alias("n"))
    twice = once.select("n", normalize_url(F.col("n")).alias("n2"))
    assert all(r["n"] == r["n2"] for r in twice.collect())


# ------------------------ URL / domain filter ---------------------------

def _urls(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "url"])


def _blocked(spark, hosts):
    return spark.createDataFrame([(h,) for h in hosts], ["host"])


def test_url_filter_domain_and_subdomain_match(spark):
    from fujishadergpu_spark.functions.urlnorm import url_filter

    df = _urls(spark, [
        (0, "https://badnet.com/x"),          # apex hit
        (1, "https://a.b.badnet.com/x"),      # deep subdomain hit
        (2, "https://notbadnet.com/x"),       # suffix must be label-aligned
        (3, "https://fine.org/x"),
    ])
    out = {r["doc_id"]: r for r in url_filter(df, _blocked(spark, ["badnet.com"])).collect()}
    assert out[0]["blocked_domain"] and out[1]["blocked_domain"]
    assert not out[2]["blocked_domain"] and not out[3]["blocked_domain"]
    assert not out[2]["keep"] is True or out[2]["keep"]  # verdict total


def test_url_filter_word_rules(spark):
    from fujishadergpu_spark.functions.urlnorm import url_filter

    df = _urls(spark, [
        (0, "https://ok.org/CASINO-bonus"),    # soft 1.5 + 1.0 = 2.5
        (1, "https://ok.org/casino-only"),     # soft 1.5 < 2.0
        (2, "https://ok.org/free-money-now"),  # strict hit
        (3, "https://ok.org/plain"),
    ])
    out = {
        r["doc_id"]: r
        for r in url_filter(
            df, None, strict_words=["free-money"],
            soft_words={"casino": 1.5, "bonus": 1.0}, soft_threshold=2.0,
        ).collect()
    }
    assert out[0]["word_score"] == 2.5 and not out[0]["keep"]
    assert out[1]["word_score"] == 1.5 and out[1]["keep"]
    assert out[2]["blocked_word"] and not out[2]["keep"]
    assert out[3]["keep"]


def test_url_filter_host_column_and_port_strip(spark):
    from fujishadergpu_spark.functions.urlnorm import url_filter

    df = _urls(spark, [(0, "HTTPS://Shop.Example.COM:443/a")])
    r = url_filter(df, None).collect()[0]
    assert r["host"] == "shop.example.com" and r["keep"]


def test_host_suffixes_bounded_and_ordered(spark):
    from fujishadergpu_spark.functions.urlnorm import host_suffixes

    from pyspark.sql import functions as F

    out = spark.range(1).select(host_suffixes(F.lit("a.b.c.d")).alias("s")).collect()[0]["s"]
    assert out == ["a.b.c.d", "b.c.d", "c.d", "d"]


def test_surt_key_grammar(spark):
    from fujishadergpu_spark.functions.urlnorm import surt_key

    cases = {
        "http://www.Example.com/a/B?b=2&a=1#f": "com,example,www)/a/B?a=1&b=2",
        "https://sub.shop.example.co.uk:443/x": "uk,co,example,shop,sub)/x",
        "http://host/": "host)",              # root fold then reverse
        "http://h.io/p?utm_source=x": "io,h)/p",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    got = {r["u"]: r["s"] for r in df.select("u", surt_key(F.col("u")).alias("s")).collect()}
    assert got == cases
