"""Robots Exclusion Protocol (RFC 9309) — the crawl-policy component
every fetch pipeline evaluates before a page may even enter the
corpus. Three pieces:

* ``parse_robots`` — mapInPandas line parser: RFC group semantics
  (stacked User-agent lines share the following rules; a User-agent
  line after rules starts a NEW group; rules before any group and
  unparseable lines are ignored per RFC §2.2.2; empty Allow/Disallow
  values are no-ops per §2.3.1.4 and are dropped).
* ``render_robots`` — one robots.txt text per host from a rules
  relation (grouped map, one small text per host) — with the parser
  it forms the roundtrip contract gate.
* ``robots_eval`` — pure DataFrame evaluation: per (host, path), the
  matching group is the exact-agent group when the host defines one,
  else the ``*`` group (groups do NOT merge, §2.2.1); within the
  group the LONGEST-octet matching rule wins and an Allow beats a
  Disallow of equal length (§2.2.2); no matching rule -> allowed.
  Rule paths support the two RFC metacharacters: ``*`` (any span)
  and a trailing ``$`` (end anchor), compiled to RE2-safe regexes by
  quoting every other metacharacter — identical semantics in Java
  regex and DuckDB's RE2, so the evaluator is twin-gateable.

Scale shape: robots.txt files are per-host and small (Google caps
fetches at 500 KiB), so parse/render groups are bounded; evaluation
is ONE equi-join on host (AQE-splittable — the hot host is a join
key) with the regex condition residual, then ONE map-side-partial
max-struct argmax per URL. Agent resolution is a broadcast-sized
distinct of hosts-with-specific-groups. Nothing collects.

Reference analog: none (the reference reads rasters); crawl-policy
side of the web graft per SURVEY.md §2.E.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = "host string, agent string, rule string, path string"


def parse_robots(
    files: DataFrame, host: str = "host", text: str = "text"
) -> DataFrame:
    """(host, agent, rule, path) rows from robots.txt texts — one
    input row per host. Agents lowercase; rule is 'allow'/'disallow';
    ignored content (comments, unparseable lines, group-less rules,
    empty-value rules, unrelated fields like Crawl-delay) never
    emits."""
    src = files.select(files[host].alias("_h"), files[text].alias("_t"))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"host": [], "agent": [], "rule": [], "path": []}
            for h, txt in zip(pdf["_h"], pdf["_t"]):
                agents: list[str] = []
                in_rules = False
                for raw in (txt or "").split("\n"):
                    line = raw.split("#", 1)[0].strip()
                    if not line:
                        continue
                    key, sep, val = line.partition(":")
                    if not sep:
                        continue  # unparseable -> ignored (RFC 9309 §2.2.2)
                    key, val = key.strip().lower(), val.strip()
                    if key == "user-agent":
                        if in_rules:
                            agents, in_rules = [], False
                        agents.append(val.lower())
                    elif key in ("allow", "disallow"):
                        if not agents or not val:
                            continue  # group-less or empty-value: no-op
                        in_rules = True
                        for a in agents:
                            out["host"].append(h)
                            out["agent"].append(a)
                            out["rule"].append(key)
                            out["path"].append(val)
            yield pd.DataFrame(out)

    return src.mapInPandas(fn, RULES_SCHEMA)


def render_robots(
    rules: DataFrame,
    host: str = "host",
    agent: str = "agent",
    rule: str = "rule",
    path: str = "path",
) -> DataFrame:
    """(host, text) — one robots.txt per host, one group per agent
    (agents sorted; rules sorted by (path, rule) within each group —
    RFC evaluation is longest-match, not first-match, so rule order
    is free and pinning it makes the rendered TEXT a pure function of
    the input relation, the repo-wide determinism rule, rather than
    of the shuffle's arrival order). With parse_robots this
    roundtrips exactly: parse(render(R)) == R as a (host, agent,
    rule, path) set."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        blocks = []
        for a in sorted(pdf[agent].unique()):
            grp = pdf[pdf[agent] == a].sort_values([path, rule])
            lines = [f"User-agent: {a}"]
            lines += [
                f"{r.capitalize()}: {p}" for r, p in zip(grp[rule], grp[path])
            ]
            blocks.append("\n".join(lines))
        return pd.DataFrame({"host": [pdf[host].iloc[0]], "text": ["\n\n".join(blocks)]})

    return rules.select(host, agent, rule, path).groupBy(host).applyInPandas(
        fn, "host string, text string"
    )


def robots_match_regex(path: Column) -> Column:
    """RFC 9309 rule path -> anchored RE2-safe regex: a trailing
    ``$`` end-anchors, ``*`` spans anything, every other regex
    metacharacter is quoted. The same three regexp_replace steps run
    in the DuckDB twin (RE2), so match semantics are engine-equal."""
    anchored = path.endswith("$")
    body = F.when(
        anchored, F.substring(path, 1, F.length(path) - F.lit(1))
    ).otherwise(path)
    quoted = F.regexp_replace(body, r"([.^$|?+()\[\]{}\\])", r"\\$1")
    wild = F.regexp_replace(quoted, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(anchored, "$").otherwise(""))


def robots_eval(
    urls: DataFrame,
    rules: DataFrame,
    user_agent: str,
    host: str = "host",
    path: str = "path",
) -> DataFrame:
    """urls (host, path) -> ONE row per distinct (host, path) with an
    ``allowed`` boolean under ``user_agent`` (extra caller columns are
    not carried — join the verdict back on (host, path), the
    crawl_frontier composition pattern). Group selection, longest-
    OCTET match and the allow-wins tie-break per RFC 9309 §2.2; hosts
    with no rules (or no matching rule) are allowed."""
    ua = user_agent.lower()
    r = rules.select(
        F.col("host"),
        F.lower(F.col("agent")).alias("_agent"),
        (F.col("rule") == "allow").cast("int").alias("_allow"),
        # OCTET length per RFC 9309 §2.2.2 — also the only length both
        # engines agree on (Spark length counts UTF-16 units, DuckDB
        # codepoints; octet_length == strlen everywhere)
        F.octet_length("path").alias("_plen"),
        robots_match_regex(F.col("path")).alias("_re"),
    )
    # the applicable group per host: exact agent if the host defines
    # one, else '*' (groups never merge)
    spec = (
        r.where(F.col("_agent") == ua)
        .select("host")
        .distinct()
        .withColumn("_has_spec", F.lit(True))
    )
    grp = (
        r.join(F.broadcast(spec), "host", "left")
        .where(
            (F.col("_agent") == ua)
            | ((F.col("_agent") == "*") & F.col("_has_spec").isNull())
        )
        .drop("_agent", "_has_spec")
    )
    u = urls.select(F.col(host).alias("host"), F.col(path).alias("path"))
    matched = (
        u.join(
            grp,
            (u["host"] == grp["host"]) & F.expr("path rlike _re"),
            "left",
        )
        .select(u["host"], u["path"], "_plen", "_allow")
        .groupBy("host", "path")
        .agg(F.max(F.struct("_plen", "_allow")).alias("_best"))
    )
    return matched.select(
        "host",
        "path",
        F.coalesce(F.col("_best._allow") == 1, F.lit(True)).alias("allowed"),
    )
