"""Redirect-chain resolution by pointer doubling — the canonical-URL
step a crawler runs BEFORE dedup and link analysis: 301/308 chains
mean the fetched URL is not the page's identity, so every URL must
resolve to its chain's terminal target (and redirect cycles — which
real crawls do contain — must be detected, not looped on; crawlers
cap chains the same way, e.g. curl's default 50, browsers ~20).

The redirect relation is a FUNCTION (one outgoing redirect per
source; duplicates are a producer bug and loud-fail here). Resolution
uses pointer DOUBLING, the components.py discipline:

    p_0(u)     = r(u)
    p_{i+1}(u) = p_i(p_i(u)) if p_i(u) is itself a source, else p_i(u)

so ``rounds`` doubling steps resolve chains up to 2^rounds long — 6
rounds cover length-64 chains, far past any crawler's own cap — in
log, not linear, join depth. After the last round a source is
``resolved`` iff its pointer left the source set (reached a terminal
URL); unresolved survivors are exactly the nodes on cycles or on
chains longer than 2^rounds, surfaced with resolved=false rather than
dropped (the validation-gate discipline).

Scale shape (10^9 redirects): per round ONE self-equi-join of the
two-long pointer state with itself plus a coalesce projection — no
aggregates, no windows; ``localCheckpoint`` per round truncates
lineage. The one driver scalar is the duplicate-source validation
count (the A20 check, same budget as nodes.count()).

Reference analog: none; extends the link-graph family per SURVEY §2.E.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(
    redirects: DataFrame,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(src, final, resolved) for every redirect source: the chain's
    terminal URL id, or the furthest pointer reached with
    resolved=false for cycles / chains beyond 2^``rounds``.
    Self-redirects (src == dst) are degenerate cycles and report
    themselves unresolved. Raises ValueError if any source carries
    more than one redirect (the relation must be a function)."""
    if rounds < 0:
        raise ValueError(f"resolve_redirects: rounds must be >= 0, got {rounds}")
    r = (
        redirects.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("p")
        )
        .distinct()
        .localCheckpoint()
    )
    dup = r.groupBy("u").agg(F.count("*").alias("_c")).where(F.col("_c") > 1)
    if dup.limit(1).count() > 0:
        bad = dup.limit(3).collect()
        raise ValueError(
            f"resolve_redirects: redirect relation is not a function — "
            f"sources with multiple targets, e.g. {[b['u'] for b in bad]}"
        )
    p = r
    for _ in range(rounds):
        # p(u) <- p(p(u)) where the pointer is still a source
        nxt = p.alias("a").join(
            p.select(F.col("u").alias("_pu"), F.col("p").alias("_pp")).alias("b"),
            F.col("a.p") == F.col("b._pu"),
            "left",
        )
        p = nxt.select(
            F.col("a.u").alias("u"), F.coalesce("_pp", "a.p").alias("p")
        ).localCheckpoint()
    # resolved iff the final pointer is NOT itself a redirect source
    srcs = r.select(F.col("u").alias("_s")).distinct()
    return (
        p.join(srcs, p["p"] == srcs["_s"], "left")
        .select(
            F.col("u").alias("src"),
            F.col("p").alias("final"),
            F.col("_s").isNull().alias("resolved"),
        )
    )
