"""URL-template rollup and crawler-trap detection — the frontier
hygiene signal (Lee 2009 IRLbot: calendar pages, session ids and
faceted navigation generate unbounded URL spaces that starve a crawl;
Bar-Yossef 2007 "DUST": different URLs with similar text collapse
under exactly this kind of rule normalization).

A URL's TEMPLATE is its path with identifier runs folded — long hex
runs (>= 8, uuid/session-hash shaped) to ``H`` first, then digit runs
to ``N`` — plus the SORTED SET of query parameter NAMES (values
dropped: faceted navigation varies values, not names). Hosts whose
URL mass collapses onto few templates are trap/faceted candidates:

    url_templates     (host, template, n_urls)      the rollup
    crawl_trap_hosts  (host, n_urls, n_templates,
                       urls_per_template_q6, top_template, top_n,
                       trap)                        the per-host audit

``trap`` fires when the host has at least ``min_urls`` URLs AND
averages at least ``min_ratio`` URLs per template — both caller
parameters (heuristic thresholds are policy, not mechanism).

All normalization is fused codegen regexp rewrites (lookaround-free,
'g'-equivalent on both engines); the rollup is ONE map-side-partial
(host, template) COUNT — the corpus exchange — and the host audit
aggregates the template-rolled relation (bounded by templates-per-
host) with a min-struct argmax for the top template (n DESC, template
ASC — the repetition.py deterministic-keeper discipline).

Reference analog: none; crawl-hygiene side of the web graft per
SURVEY.md §2.E.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urlnorm import SCHEME_RE


def url_template(u: Column) -> tuple[Column, Column]:
    """(host, template) for a URL column — the fold every trap/DUST
    rule reasons over. Hex runs fold before digit runs so a 32-char
    session hash becomes one ``H``, not a HNHN... alternation."""
    rest = F.regexp_replace(u, SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    query = F.regexp_replace(pathq, "^[^?]*\\??", "")
    norm = F.regexp_replace(path, "(?i)[0-9a-f]{8,}", "H")
    norm = F.regexp_replace(norm, "[0-9]+", "N")
    names = F.array_sort(
        F.filter(
            F.transform(F.split(query, "&"), lambda p: F.regexp_extract(p, "^([^=]*)", 1)),
            lambda x: x != "",
        )
    )
    template = F.concat(
        norm,
        F.when(F.size(names) > 0, F.concat(F.lit("?"), F.array_join(names, ","))).otherwise(
            ""
        ),
    )
    return host, template


def url_templates(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """(host, template, n_urls) — the template rollup (URL occurrence
    counts; callers wanting distinct-URL counts dedup upstream)."""
    host, template = url_template(F.col(url_col))
    return (
        urls.select(host.alias("host"), template.alias("template"))
        .groupBy("host", "template")
        .agg(F.count("*").alias("n_urls"))
    )


def crawl_trap_hosts(
    urls: DataFrame,
    url_col: str = "url",
    min_urls: int = 30,
    min_ratio: int = 10,
) -> DataFrame:
    """Per-host trap audit over the template rollup; see module
    docstring for columns and the trap rule."""
    if min_urls < 1 or min_ratio < 1:
        raise ValueError(
            f"crawl_trap_hosts: thresholds must be >= 1, got "
            f"min_urls={min_urls}, min_ratio={min_ratio}"
        )
    t = url_templates(urls, url_col)
    # min over (-n, template): largest count first, lexicographically
    # smallest template on ties — deterministic cross-engine
    best = F.min(F.struct(F.negate(F.col("n_urls")).alias("_neg"), "template", "n_urls"))
    agg = t.groupBy("host").agg(
        F.sum("n_urls").alias("n_urls"),
        F.count("*").alias("n_templates"),
        best.alias("_best"),
    )
    return agg.select(
        "host",
        "n_urls",
        "n_templates",
        F.expr("(n_urls * 1000000) div n_templates").cast("long").alias(
            "urls_per_template_q6"
        ),
        F.col("_best.template").alias("top_template"),
        F.col("_best.n_urls").alias("top_n"),
        (
            (F.col("n_urls") >= min_urls)
            & (F.expr("n_urls div n_templates") >= min_ratio)
        ).alias("trap"),
    )
