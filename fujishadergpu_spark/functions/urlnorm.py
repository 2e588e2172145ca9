"""URL canonicalization for URL-level crawl dedup.

Rules (the common-crawl-style canonical form):

1. drop the fragment (``#...``);
2. scheme and host lowercase;
3. strip the scheme's default port (``:443`` for https, ``:80`` for
   http);
4. strip one trailing slash from the path — including the root path,
   which folds to the host-only form (``https://host/`` →
   ``https://host``);
5. drop ``utm_*`` tracking parameters, sort the survivors, re-join.

Everything is built from JVM expressions (regexp_extract /
regexp_replace / split / filter / array_sort) — no Python in the
path — and every regex is lookaround-free so the DuckDB oracle twin
(RE2) evaluates the identical pattern text (`queries.URL_CANON_SQL`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def normalize_url(u: Column) -> Column:
    u0 = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u0, SCHEME_RE, 1))
    rest = F.regexp_replace(u0, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    host = _strip_port(scheme, hostport)
    pathquery = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathquery, "^([^?]*)", 1)
    path = F.regexp_replace(path, "/$", "")
    query = F.regexp_replace(pathquery, "^[^?]*\\??", "")
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.startswith("utm_"),
        )
    )
    qcanon = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon == "", "").otherwise(F.concat(F.lit("?"), qcanon)),
    )


def surt_key(u: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform — the Internet
    Archive / Heritrix key CDX indexes sort by): the canonical URL's
    host reversed into comma-joined segments, then ``)`` and the
    path+query, e.g. ``http://www.Example.com/a?b=1`` ->
    ``com,example,www)/a?b=1``. Builds ON TOP of normalize_url, so
    fragment/port/utm/case handling is inherited from one place.
    Deliberate variant vs pywb: path case is preserved (case-distinct
    paths are distinct resources) and ``www`` is kept (host identity,
    not site identity — host rollup is urlnorm's registered-domain
    job). All JVM expressions; lookaround-free regexes shared with
    the DuckDB twin."""
    canon = normalize_url(u)
    rest = F.regexp_replace(canon, SCHEME_RE, "")
    host = F.regexp_extract(rest, "^([^/?]*)", 1)
    pathquery = F.regexp_replace(rest, "^[^/?]*", "")
    return F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.lit(")"),
        pathquery,
    )


def _strip_port(scheme: Column, hostport: Column) -> Column:
    no443 = F.substring(hostport, 1, F.length(hostport) - F.lit(4))
    no80 = F.substring(hostport, 1, F.length(hostport) - F.lit(3))
    return (
        F.when((scheme == "https") & hostport.endswith(":443"), no443)
        .when((scheme == "http") & hostport.endswith(":80"), no80)
        .otherwise(hostport)
    )


# ------------------- URL / domain filtering ---------------------------
# RefinedWeb-style URL filtering (Penedo et al. 2023, §G.1): a domain
# blocklist (with subdomain matching) plus URL keyword scoring —
# strict words drop on any hit, soft words drop when their weighted
# sum crosses a threshold. The lexicons are caller arguments (the c4
# blocklist discipline: the repo ships the mechanism, not the words).


def url_host(u: Column) -> Column:
    """Lowercased host of a URL, default ports stripped (the
    normalize_url host rule, exposed standalone)."""
    u0 = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(u0, SCHEME_RE, 1))
    rest = F.regexp_replace(u0, SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    return _strip_port(scheme, hostport)


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host — ``a.b.c`` -> [a.b.c, b.c, c] — the
    bounded explode key for scalable subdomain matching (a host has a
    handful of labels; matching 10^12 urls against a multi-million-
    domain blocklist is then one string equi-join, never a
    nested-loop contains scan)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(labels, i, n), ".")
    )


def url_filter(
    df,
    blocked_hosts=None,
    url_col: str = "url",
    id_col: str = "doc_id",
    strict_words: list[str] | None = None,
    soft_words: dict[str, float] | None = None,
    soft_threshold: float = 2.0,
):
    """Adds (host, blocked_domain, blocked_word, word_score, keep) to
    every row — total, pure verdicts.

    ``blocked_hosts``: a DataFrame with a ``host`` column (exact
    hosts or registrable domains; subdomains match by suffix). The
    match plan is explode(host_suffixes) -> equi-join -> distinct ids
    back-join: at 100 TB the blocklist relation joins on short string
    keys (broadcast when it fits, shuffle join beyond), and the urls
    relation only ships (id, suffix) pairs. ``strict_words`` /
    ``soft_words``: bounded lexicons folded into literal contains
    expressions — no shuffle, no join.
    """
    host = url_host(F.col(url_col))
    low = F.lower(F.col(url_col))
    out = df.withColumn("host", host)
    if blocked_hosts is not None:
        ex = out.select(
            F.col(id_col).alias("_id"), F.explode(host_suffixes(F.col("host"))).alias("_sfx")
        )
        hits = (
            ex.join(
                blocked_hosts.select(F.lower(F.col("host")).alias("_sfx")).distinct(),
                "_sfx",
                "left_semi",
            )
            .select("_id")
            .distinct()
            .withColumn("_bd", F.lit(True))
        )
        out = out.join(hits, out[id_col] == hits["_id"], "left").drop("_id")
        bd = F.coalesce(F.col("_bd"), F.lit(False))
    else:
        bd = F.lit(False)
    bw = F.lit(False)
    for w in sorted(set(strict_words or [])):
        bw = bw | F.contains(low, F.lit(w.lower()))
    score = F.lit(0.0)
    for w, wt in sorted((soft_words or {}).items()):
        score = score + F.when(F.contains(low, F.lit(w.lower())), F.lit(float(wt))).otherwise(
            F.lit(0.0)
        )
    out = out.withColumns(
        {
            "blocked_domain": bd,
            "blocked_word": bw,
            "word_score": score,
        }
    )
    if "_bd" in out.columns:
        out = out.drop("_bd")
    return out.withColumn(
        "keep",
        ~F.col("blocked_domain")
        & ~F.col("blocked_word")
        & (F.col("word_score") < F.lit(float(soft_threshold))),
    )
