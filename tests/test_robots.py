"""robots.txt (RFC 9309) gates: parse/render roundtrip is exact,
parser implements RFC group/ignore semantics, and the evaluator
matches a pure-Python reference on longest-match, allow-wins ties,
wildcard/anchor metacharacters, and group exclusivity."""

import re

from pyspark.sql import functions as F  # noqa: F401

from fujishadergpu_spark.functions.robots import (
    parse_robots,
    render_robots,
    robots_eval,
)

RULES = [
    ("h0", "*", "disallow", "/private"),
    ("h0", "*", "allow", "/private/ok"),
    ("h0", "*", "disallow", "/tmp*"),
    ("h0", "*", "disallow", "/exact$"),
    ("h0", "fetchbot", "disallow", "/bot"),
    ("h1", "*", "disallow", "/"),
]


def _py_eval(rules, host, path, ua):
    grp = [r for r in rules if r[0] == host and r[1] == ua]
    if not grp:
        grp = [r for r in rules if r[0] == host and r[1] == "*"]
    best = None
    for _h, _a, rule, rpath in grp:
        anchored = rpath.endswith("$")
        body = rpath[:-1] if anchored else rpath
        rx = "^" + ".*".join(re.escape(p) for p in body.split("*"))
        if anchored:
            rx += "$"
        if re.search(rx, path):
            key = (len(rpath), rule == "allow")
            if best is None or key > best:
                best = key
    return True if best is None else best[1]


def _rules_df(spark):
    return spark.createDataFrame(RULES, "host string, agent string, rule string, path string")


def test_roundtrip_exact(spark):
    out = parse_robots(render_robots(_rules_df(spark))).collect()
    got = {(r["host"], r["agent"], r["rule"], r["path"]) for r in out}
    assert got == set(RULES)


def test_parser_rfc_semantics(spark):
    txt = "\n".join([
        "# banner comment",
        "Disallow: /orphan",            # rule before any group: ignored
        "User-agent: A",
        "User-agent: B",                # stacked agents share the rules
        "Disallow: /x",
        "Allow:",                       # empty value: no-op
        "Crawl-delay: 10",              # unrelated field: ignored
        "not a field line",             # unparseable: ignored
        "User-agent: C",                # after rules -> NEW group
        "Disallow: /y   # trailing",
    ])
    df = spark.createDataFrame([("h", txt)], "host string, text string")
    got = {(r["agent"], r["rule"], r["path"]) for r in parse_robots(df).collect()}
    assert got == {("a", "disallow", "/x"), ("b", "disallow", "/x"), ("c", "disallow", "/y")}


def test_eval_matches_reference(spark):
    paths = ["/private/x", "/private/ok/y", "/public", "/tmp/z", "/exact",
             "/exact/more", "/bot/q", "/"]
    urls = [(h, p) for h in ("h0", "h1", "h9") for p in paths]
    df = spark.createDataFrame(urls, "host string, path string")
    for ua in ("fetchbot", "otherbot"):
        got = {
            (r["host"], r["path"]): r["allowed"]
            for r in robots_eval(df, _rules_df(spark), ua).collect()
        }
        want = {(h, p): _py_eval(RULES, h, p, ua) for h, p in urls}
        assert got == want, ua


def test_eval_key_cases(spark):
    df = spark.createDataFrame(
        [("h0", "/private/ok/y"), ("h0", "/exact"), ("h0", "/exact/more"),
         ("h0", "/bot/q"), ("h9", "/anything")],
        "host string, path string",
    )
    star = {  # generic agent: '*' group applies (h0 has no 'crawler' group... it has fetchbot only)
        (r["host"], r["path"]): r["allowed"]
        for r in robots_eval(df, _rules_df(spark), "crawler").collect()
    }
    assert star[("h0", "/private/ok/y")] is True    # longer allow overrides
    assert star[("h0", "/exact")] is False          # $ anchor hits
    assert star[("h0", "/exact/more")] is True      # $ anchor misses
    assert star[("h0", "/bot/q")] is True           # fetchbot group not merged
    assert star[("h9", "/anything")] is True        # no rules -> allowed
    bot = {
        (r["host"], r["path"]): r["allowed"]
        for r in robots_eval(df, _rules_df(spark), "FetchBot").collect()
    }
    # exact group is exclusive: '*' rules do NOT apply to fetchbot
    assert bot[("h0", "/private/ok/y")] is True
    assert bot[("h0", "/bot/q")] is False


def test_render_text_is_deterministic(spark):
    """Rendered robots.txt must be a pure function of the rules
    RELATION — identical text under different partitionings."""
    a = render_robots(_rules_df(spark)).collect()
    b = render_robots(_rules_df(spark).repartition(7)).collect()
    assert {(r["host"], r["text"]) for r in a} == {(r["host"], r["text"]) for r in b}


def test_longest_match_uses_octets(spark):
    """RFC 9309 longest-OCTET match: 'café' is 5 octets but 4
    chars — an ASCII rule of 5 chars must NOT outrank it."""
    rules = spark.createDataFrame(
        [("h", "*", "disallow", "/café"), ("h", "*", "allow", "/caf")],
        "host string, agent string, rule string, path string",
    )
    urls = spark.createDataFrame([("h", "/café-menu")], "host string, path string")
    r = robots_eval(urls, rules, "bot").collect()[0]
    assert r["allowed"] is False  # 5-octet disallow beats 4-octet allow
