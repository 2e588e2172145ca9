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
