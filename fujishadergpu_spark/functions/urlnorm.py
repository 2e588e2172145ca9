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


def _strip_port(scheme: Column, hostport: Column) -> Column:
    no443 = F.substring(hostport, 1, F.length(hostport) - F.lit(4))
    no80 = F.substring(hostport, 1, F.length(hostport) - F.lit(3))
    return (
        F.when((scheme == "https") & hostport.endswith(":443"), no443)
        .when((scheme == "http") & hostport.endswith(":80"), no80)
        .otherwise(hostport)
    )
